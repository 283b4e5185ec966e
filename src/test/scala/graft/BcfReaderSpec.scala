package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantAnnotator
import graft.sources.{BcfReader, VcfReader}
import graft.sources.v2.BgzfOutputStream

/** Hand-ENCODED BCF2.2 fixture (every byte follows the public VCF 4.2
  * spec §6 / hts-specs BCF encoding — no htslib in this environment,
  * so the twin `.vcf` text is the ground truth and the binary is
  * built field-by-field here) + the read contract: the `.bcf` reads
  * ROW-IDENTICAL to its `.vcf` twin, through the raw wide frame AND
  * through the full annotate chain.
  *
  * Typed classes engineered in: int8/int16/int32 INFO widths, float
  * INFO + float FORMAT with the reserved-NaN missing, the count≥15
  * typed-count escape (a 16-element vector), FLAG info, char-string
  * info, the shared FILTER/INFO/FORMAT dictionary (FORMAT DP reuses
  * INFO DP's index), multi-FILTER index vectors, phased/unphased/
  * haploid/missing GT with END-OF-VECTOR ploidy padding, missing
  * QUAL/ID/INFO/FILTER, a records-without-FORMAT row, integral-float
  * rendering (GQ 3.0 → "3"), and two contigs.
  */
class BcfReaderSpec extends AnyFunSuite with SparkSpec {

  // ---- tiny LE byte writer -------------------------------------------------

  private class W {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v & 0xff); this }
    def i16(v: Int): W = { u8(v); u8(v >> 8) }
    def i32(v: Int): W = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def f32bits(bits: Int): W = i32(bits)
    def f32(v: Float): W = i32(java.lang.Float.floatToRawIntBits(v))
    def bytes(b: Array[Byte]): W = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
  }

  private val FloatMissing = 0x7f800001

  /** descriptor byte (+ typed count when n ≥ 15) */
  private def descr(w: W, t: Int, n: Int): W = {
    if (n < 15) w.u8((n << 4) | t)
    else { w.u8((15 << 4) | t); typedInt(w, n) }
  }
  /** typed scalar int, width by range */
  private def typedInt(w: W, v: Int): W = {
    if (v >= -120 && v <= 127) { w.u8(0x11); w.u8(v) }
    else if (v >= -32000 && v <= 32767) { w.u8(0x12); w.i16(v) }
    else { w.u8(0x13); w.i32(v) }
  }
  private def typedStr(w: W, s: String): W = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    descr(w, 7, b.length); w.bytes(b)
  }
  /** int8 vector with given per-slot values (use 0x81 for EOV) —
    * INFO/FILTER form: the descriptor count is the TOTAL length
    */
  private def i8vec(w: W, vs: Int*): W = {
    descr(w, 1, vs.length); vs.foreach(w.u8); w
  }

  /** FORMAT int8 vector: the descriptor count is PER SAMPLE (`n`),
    * followed by n_sample × n bytes
    */
  private def fmtI8(w: W, n: Int, vs: Int*): W = {
    descr(w, 1, n); vs.foreach(w.u8); w
  }

  private def record(
      rid: Int, pos1: Int, rlen: Int, qualBits: Int, id: String,
      alleles: Seq[String], nInfo: Int, nSample: Int, nFmt: Int)(
      sharedTail: W => Unit)(indiv: W => Unit): Array[Byte] = {
    val sh = new W
    sh.i32(rid).i32(pos1 - 1).i32(rlen).f32bits(qualBits)
    sh.i32((alleles.length << 16) | nInfo)
    sh.i32((nFmt << 24) | nSample)
    typedStr(sh, id)
    alleles.foreach(a => typedStr(sh, a))
    sharedTail(sh)
    val iv = new W
    indiv(iv)
    val frame = new W
    frame.i32(sh.result.length).i32(iv.result.length)
    frame.bytes(sh.result).bytes(iv.result)
    frame.result
  }

  // ---- the twin pair -------------------------------------------------------

  private val headerText = Seq(
    "##fileformat=VCFv4.2",
    "##FILTER=<ID=PASS,Description=\"ok\">",                       // idx 0
    "##FILTER=<ID=q10,Description=\"low\">",                       // idx 1
    "##FILTER=<ID=s50,Description=\"half\">",                      // idx 2
    "##INFO=<ID=NS,Number=1,Type=Integer,Description=\"n\">",      // idx 3
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">",      // idx 4
    "##INFO=<ID=AF,Number=A,Type=Float,Description=\"af\">",       // idx 5
    "##INFO=<ID=DB,Number=0,Type=Flag,Description=\"db\">",        // idx 6
    "##INFO=<ID=BIGV,Number=.,Type=Integer,Description=\"v\">",    // idx 7
    "##INFO=<ID=NOTE,Number=1,Type=String,Description=\"s\">",     // idx 8
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"gt\">",    // idx 9
    "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"d\">",    // shared: idx 4
    "##FORMAT=<ID=AD,Number=2,Type=Integer,Description=\"ad\">",   // idx 10
    "##FORMAT=<ID=GQ,Number=1,Type=Float,Description=\"gq\">",     // idx 11
    "##contig=<ID=1>",                                             // rid 0
    "##contig=<ID=chr2>",                                          // rid 1
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3"
  ).mkString("\n") + "\n"

  private val twinVcfLines: Seq[String] = headerText.split("\n").toSeq ++ Seq(
    "1\t100\trs1\tA\tT\t29.5\tPASS\tNS=3;DP=14;AF=0.5;DB\tGT:DP:AD" +
      "\t0|1:12:3,9\t1/1:14:0,14\t0/0:11:11,0",
    "chr2\t5000\t.\tG\tA,C\t.\tq10;s50" +
      "\tDP=300;NS=100000;BIGV=1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16;NOTE=hi" +
      "\tGT:GQ\t1/2:17.25\t2|2:.\t./.:3",
    "1\t200\t.\tACG\tA\t0\tPASS\tNS=2\tGT\t1\t./.\t0",
    "1\t300\t.\tC\t<DEL>\t12.5\t.\t.\t.\t.\t.\t.")

  private def buildBcf(dir: java.nio.file.Path): String = {
    val payload = new W
    payload.bytes("BCF".getBytes(StandardCharsets.US_ASCII))
      .u8(2).u8(2) // version 2.2
    val txt = headerText.getBytes(StandardCharsets.UTF_8)
    payload.i32(txt.length + 1).bytes(txt).u8(0) // NUL-terminated

    // R1: every common class — PASS filter, int8 INFO, float INFO,
    // FLAG, GT/DP/AD formats, phased + unphased + hom-ref GT
    payload.bytes(record(0, 100, 1, java.lang.Float.floatToRawIntBits(29.5f),
      "rs1", Seq("A", "T"), nInfo = 4, nSample = 3, nFmt = 3) { sh =>
      i8vec(sh, 0)                      // FILTER [PASS]
      typedInt(sh, 3); typedInt(sh, 3)  // NS=3 (key idx 3, int8)
      typedInt(sh, 4); typedInt(sh, 14) // DP=14
      typedInt(sh, 5); descr(sh, 5, 1).f32(0.5f) // AF=0.5
      typedInt(sh, 6); sh.u8(0x00)      // DB flag (type MISSING)
    } { iv =>
      typedInt(iv, 9)                   // GT
      fmtI8(iv, 2, 0x02, 0x05, 0x04, 0x04, 0x02, 0x02) // 0|1  1/1  0/0
      typedInt(iv, 4)                   // DP (the SHARED dict idx)
      fmtI8(iv, 1, 12, 14, 11)
      typedInt(iv, 10)                  // AD, 2 per sample
      fmtI8(iv, 2, 3, 9, 0, 14, 11, 0)
    })

    // R2: contig 2, multiallelic, multi-FILTER, int16/int32 widths,
    // the count-escape 16-vector, char-string INFO, float FORMAT with
    // missing + integral rendering, missing QUAL/ID, 1/2 2|2 ./.
    payload.bytes(record(1, 5000, 1, FloatMissing, ".", Seq("G", "A", "C"),
      nInfo = 4, nSample = 3, nFmt = 2) { sh =>
      i8vec(sh, 1, 2)                    // FILTER q10;s50
      typedInt(sh, 4); typedInt(sh, 300)     // DP=300 (int16)
      typedInt(sh, 3); typedInt(sh, 100000)  // NS=100000 (int32)
      typedInt(sh, 7)                    // BIGV: 16 int8s (count escape)
      i8vec(sh, (1 to 16): _*)
      typedInt(sh, 8); typedStr(sh, "hi") // NOTE=hi
    } { iv =>
      typedInt(iv, 9)                    // GT
      fmtI8(iv, 2, 0x04, 0x06, 0x06, 0x07, 0x00, 0x00) // 1/2  2|2  ./.
      typedInt(iv, 11)                   // GQ float
      descr(iv, 5, 1).f32(17.25f).f32bits(FloatMissing).f32(3.0f)
    })

    // R3: haploid calls next to a diploid missing — END-OF-VECTOR
    // ploidy padding; qual 0.0 renders "0"; multi-base REF
    payload.bytes(record(0, 200, 3, java.lang.Float.floatToRawIntBits(0.0f),
      ".", Seq("ACG", "A"), nInfo = 1, nSample = 3, nFmt = 1) { sh =>
      i8vec(sh, 0)                       // FILTER [PASS]
      typedInt(sh, 3); typedInt(sh, 2)   // NS=2
    } { iv =>
      typedInt(iv, 9)
      fmtI8(iv, 2, 0x04, 0x81, 0x00, 0x00, 0x02, 0x81) // 1 | ./. | 0
    })

    // R4: no INFO, no FORMAT (sites-only shape), '.' FILTER, symbolic ALT
    payload.bytes(record(0, 300, 1, java.lang.Float.floatToRawIntBits(12.5f),
      ".", Seq("C", "<DEL>"), nInfo = 0, nSample = 3, nFmt = 0) { sh =>
      sh.u8(0x00)                        // FILTER '.'
    } { _ => () })

    val f = dir.resolve("fixture.bcf")
    val os = new BgzfOutputStream(
      java.nio.file.Files.newOutputStream(f))
    os.write(payload.result)
    os.close()
    f.toString
  }

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-bcf")
  private lazy val bcfPath = buildBcf(tmp)
  private lazy val vcfPath = {
    val f = tmp.resolve("twin.vcf")
    java.nio.file.Files.write(f,
      (twinVcfLines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("BCF reads row-identical to its VCF twin (wide frame): every " +
      "typed class — widths, count escape, flags, shared dict, float " +
      "rendering, GT phase/ploidy/missing, '.'-classes — decodes to " +
      "the exact text fields") {
    val cols = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter",
      "info", "format", "genotypes")
    val fromBcf = BcfReader.read(spark, bcfPath)
      .select(cols.head, cols.tail: _*).collect().toSet
    val fromVcf = VcfReader.read(spark, vcfPath)
      .select(cols.head, cols.tail: _*).collect().toSet
    assert(fromBcf.size === 4)
    assert(fromBcf === fromVcf)
  }

  test("BCF metadata matches the VCF twin's (samples, columns) and " +
      "the annotate chain is row-identical end-to-end") {
    val mB = BcfReader.metadata(spark, bcfPath)
    val mV = VcfReader.metadata(spark, vcfPath)
    assert(mB.samples === Seq("S1", "S2", "S3"))
    assert(mB.columns === mV.columns)
    def ann(df: org.apache.spark.sql.DataFrame) =
      VariantAnnotator.annotate(df,
        VariantAnnotator.Options(dropHomRef = false,
          formatKeys = Some(Seq("DP", "AD", "GQ", "GT"))))
        .collect().map(_.toString).sorted.toSeq
    val a = ann(BcfReader.read(spark, bcfPath))
    val b = ann(VcfReader.read(spark, vcfPath))
    assert(a === b)
    assert(a.nonEmpty)
    // non-matching path reports clearly (r13 advisory: was NPE/head)
    val e = intercept[IllegalArgumentException] {
      BcfReader.metadata(spark, "/nonexistent/nope*.bcf")
    }
    assert(e.getMessage.contains("no BCF files match"))
  }

  test("header dictionary honors explicit IDX overrides and keeps " +
      "PASS implicitly first") {
    val h = BcfReader.decodeHeaderText(Seq(
      "##fileformat=VCFv4.2",
      "##FILTER=<ID=zz,Description=\"z\",IDX=5>",
      "##INFO=<ID=aa,Number=1,Type=Integer,Description=\"a\">",
      "##contig=<ID=chrX,IDX=3>",
      "##contig=<ID=chrY>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tZ1"
    ).mkString("\n"))
    assert(h.dict(0) === "PASS")
    assert(h.dict(5) === "zz")
    assert(h.dict(6) === "aa") // appended after the explicit max
    assert(h.contigs(3) === "chrX")
    assert(h.contigs(4) === "chrY")
    assert(h.samples === Seq("Z1"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{VcfReader, VcfWriter}

class VcfWriterSpec extends AnyFunSuite with SparkSpec {

  test("read → write → read round-trips the fixture exactly") {
    val p = VcfFixture.write().toString
    val meta = VcfReader.metadata(spark, p)
    val first = VcfReader.read(spark, p)

    val lines = VcfWriter.toVcfLines(first, meta.samples)
    val again = VcfReader.parseLines(lines, meta.columns, meta.samples)

    val a = first.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = again.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(a === b)
    // chrom came out normalized on first read, so re-reading the emitted
    // lines must not re-normalize anything away
    assert(again.count() === 7)
  }

  test("header emission is byte-faithful to the parsed metadata") {
    val meta = VcfReader.fromHeaderLines(
      VcfFixture.content.linesIterator.takeWhile(_.startsWith("#")).toSeq)
    val hdr = VcfWriter.headerLines(meta)
    assert(hdr.head === "##fileformat=VCFv4.2")
    assert(hdr.last.startsWith("#CHROM\tPOS") && hdr.last.endsWith("NA1\tNA2"))
    assert(hdr.count(_.startsWith("##INFO=")) === 4)
  }

  test("##contig IDs are normalized to match the normalized data lines") {
    val meta = VcfReader.fromHeaderLines(Seq(
      "##fileformat=VCFv4.2",
      "##contig=<ID=chr22,length=50818468>",
      "##contig=<ID=X,length=156040895>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1"))
    val hdr = VcfWriter.headerLines(meta)
    // the reader emits chrom '22', so the header must name '22', not 'chr22'
    assert(hdr.contains("##contig=<ID=22,length=50818468>"), hdr.mkString("\n"))
    assert(hdr.contains("##contig=<ID=X,length=156040895>"))
    // the spec fixes no attribute order: ID after another attribute
    // must normalize too
    val meta2 = VcfReader.fromHeaderLines(Seq(
      "##fileformat=VCFv4.2",
      "##contig=<length=50818468,ID=chr22>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1"))
    assert(VcfWriter.headerLines(meta2)
      .contains("##contig=<length=50818468,ID=22>"))
  }

  test("writeSharded lays down header + shards that concatenate to a valid VCF") {
    val p = VcfFixture.write().toString
    val meta = VcfReader.metadata(spark, p)
    val df = VcfReader.read(spark, p)
    val out = java.nio.file.Files.createTempDirectory("graft_vcf_out").toString
    VcfWriter.writeSharded(df, meta, out)

    val hdr = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "header.vcf")))
    assert(hdr.startsWith("##fileformat"))
    // re-read the shards as a VCF body: same row count, same chrom set
    val body = spark.read.textFile(s"$out/shards").count()
    assert(body === 7)
  }

  test("absent samples emit the missing call in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("1", 10, "r", "A", "G", "q", "PASS", "i", "GT",
      Map("s2" -> "0/1")))
      .toDF("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info",
        "format", "genotypes")
    val line = VcfWriter.toVcfLines(df, Seq("s1", "s2")).as[String].head()
    assert(line.endsWith("GT\t./.\t0/1"))
  }
}

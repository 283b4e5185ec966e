package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.sources.BgenReader

/** DSv2 WRITE for `format("bgen")` — the declarative twin of
  * [[BgenReader.writeBgen]], closing the r16 verdict's Missing #3
  * (vcf/bcf both had GraftWrite parity; bgen's write surface was
  * library-call only). One self-contained `part-….bgen` shard per
  * partition under the save path, the [[GraftWrite]] commit protocol
  * (`.stage-` attempt-unique names, rename on the coordinator-granted
  * commit, litter skipped by the read side's dot-file filter).
  *
  * Input shape = the frame `format("bgen")` READS (the long
  * ann-shape): one row per (variant, sample) with `chrom`, `pos`,
  * `varid`/`rsid` (optional), `ref`, `alt`, `sample_id`, `GP`. Rows
  * of one variant must be CONTIGUOUS within the partition and carry
  * every sample in the same order (the read side emits exactly this;
  * anything else fails loudly — a silently half-paneled variant block
  * would decode wrong for every downstream tool). Unphased diploid —
  * the imputed-landing shape; phased/ploidy writes go through the
  * library encoder's `BgenEnc` directly.
  *
  * GP strings are the reader's exact floor-micro decimals; the writer
  * INVERTS them to the B-bit integers: b is the unique integer in
  * [micro·(2^B−1)/10⁶, (micro+1)·(2^B−1)/10⁶) — unique because the
  * interval width (2^B−1)/10⁶ < 1 for B ≤ 19, so `bits` beyond 19
  * are refused (no silent probability corruption). The implicit-last
  * consistency (Σb = 2^B−1) is verified per sample, loudly.
  *
  * Why spool-then-prepend: the header carries M (variant count)
  * AHEAD of the body, and a streaming task doesn't know M until its
  * last row — so variant blocks (self-contained, M-independent) are
  * encoded to a task-local temp file as groups complete, and commit
  * writes header + streams the spool in. O(1) memory in variants,
  * one extra local IO pass — the [[GraftWrite.Spool]] reasoning.
  *
  * Options: `bits` (B, default 8, max 19), `zlib` (default true).
  */
final class BgenDataWriter(dir: String, schema: StructType,
    bBits: Int, zlib: Boolean,
    conf: org.apache.hadoop.conf.Configuration,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  require(bBits >= 1 && bBits <= 19,
    s"bgen write: bits = $bBits not invertible from micro-GP strings " +
      "(unique B-bit integer per micro value needs B <= 19)")

  private val dirPath = new Path(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)
  private val fin =
    new Path(dirPath, f"part-$partitionId%05d-$taskId%d.bgen")
  private val stage = new Path(dirPath, "." + "stage-" + fin.getName)

  private def col(name: String, required: Boolean): Int = {
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    require(i >= 0 || !required,
      s"bgen write needs a '$name' column; got " +
        schema.fieldNames.mkString(", "))
    i
  }
  private val iChrom = col("chrom", required = true)
  private val iPos = col("pos", required = true)
  private val iVarid = col("varid", required = false)
  private val iRsid = col("rsid", required = false)
  private val iRef = col("ref", required = true)
  private val iAlt = col("alt", required = true)
  private val iSample = col("sample_id", required = true)
  private val iGp = col("GP", required = true)
  private val posIsLong =
    schema.fields(iPos).dataType == LongType

  // task-local spool of encoded variant blocks
  private var spoolFile: java.io.File = _
  private var spool: java.io.BufferedOutputStream = _
  private var mVariants = 0L

  // sample panel = the first variant group's arrival order
  private var panel: IndexedSeq[String] = _
  private val denom = (1L << bBits) - 1L

  // current variant group
  private var curKey: (String, Long, String, String, String, String) = _
  private val curSamples = collection.mutable.ArrayBuffer.empty[String]
  private val curProbs = collection.mutable.ArrayBuffer.empty[Array[Long]]

  private def str(row: InternalRow, i: Int): String =
    if (i < 0 || row.isNullAt(i)) "." else row.getUTF8String(i).toString

  /** micro-decimal GP string → stored B-bit integers (all nGts of
    * them; caller drops the implicit last after the Σ check). */
  private def invertGp(gp: String, nGts: Int): Array[Long] = {
    val parts = gp.split(",", -1)
    require(parts.length == nGts,
      s"GP '$gp' carries ${parts.length} entries, variant needs $nGts")
    val bs = new Array[Long](nGts)
    var sum = 0L
    var i = 0
    while (i < nGts) {
      val p = parts(i)
      val dot = p.indexOf('.')
      require(dot > 0 && p.length == dot + 7,
        s"GP entry '$p' is not a fixed-6-decimal micro string")
      val micro = java.lang.Long.parseLong(p.substring(0, dot)) *
        1000000L + java.lang.Long.parseLong(p.substring(dot + 1))
      // unique b with floor(b*1e6/denom) == micro
      val b = (micro * denom + 999999L) / 1000000L
      require(b * 1000000L / denom == micro,
        s"GP entry '$p' is not a floor-micro value at B=$bBits")
      bs(i) = b; sum += b
      i += 1
    }
    require(sum == denom,
      s"GP '$gp' mass sums to $sum, not 2^$bBits-1 = $denom")
    bs
  }

  private def flushVariant(): Unit = {
    if (curKey == null) return
    if (panel == null) panel = curSamples.toIndexedSeq
    require(curSamples == panel,
      s"variant ${curKey._1}:${curKey._2} carries samples " +
        s"${curSamples.take(8).mkString(",")}… out of panel order — " +
        "rows must arrive grouped by variant with the full panel " +
        "in one consistent order")
    val (chrom, pos, varid, rsid, ref, alt) = curKey
    val alleles =
      if (alt == "." || alt.isEmpty) Seq(ref)
      else ref +: alt.split(",", -1).toSeq
    val nGts = alleles.length * (alleles.length + 1) / 2
    val probs = curProbs.map { full =>
      if (full == null) null
      else java.util.Arrays.copyOfRange(full, 0, nGts - 1)
    }.toSeq
    val block = BgenReader.encodeVariantBlock(
      BgenReader.BgenEnc(varid, rsid, chrom, pos, alleles, probs),
      panel.length, bBits, zlib)
    spool.write(block)
    mVariants += 1
    curKey = null; curSamples.clear(); curProbs.clear()
  }

  override def write(row: InternalRow): Unit = {
    if (spool == null) {
      spoolFile =
        java.io.File.createTempFile("graft-bgen-spool", ".bin")
      spool = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(spoolFile), 1 << 16)
    }
    require(!row.isNullAt(iChrom) && !row.isNullAt(iPos) &&
      !row.isNullAt(iRef) && !row.isNullAt(iSample),
      "chrom/pos/ref/sample_id must be non-null")
    val pos =
      if (posIsLong) row.getLong(iPos) else row.getInt(iPos).toLong
    val key = (str(row, iChrom), pos, str(row, iVarid),
      str(row, iRsid), str(row, iRef), str(row, iAlt))
    if (curKey == null || key != curKey) { flushVariant(); curKey = key }
    curSamples += str(row, iSample)
    val alleles =
      if (key._6 == "." || key._6.isEmpty) 1
      else 1 + key._6.count(_ == ',') + 1
    val nGts = alleles * (alleles + 1) / 2
    curProbs +=
      (if (row.isNullAt(iGp)) null
       else invertGp(row.getUTF8String(iGp).toString, nGts))
  }

  override def commit(): WriterCommitMessage = {
    if (spool == null) return GraftShardCommit(Seq.empty)
    flushVariant()
    spool.close(); spool = null
    val out = fs.create(stage, true)
    try {
      out.write(BgenReader.encodeHeaderBlock(panel, mVariants, zlib))
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(spoolFile), 1 << 16)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    } finally out.close()
    spoolFile.delete()
    spoolFile = null
    require(fs.rename(stage, fin), s"commit rename $stage -> $fin failed")
    GraftShardCommit(Seq(fin.toString))
  }

  override def abort(): Unit = {
    if (spool != null) { try spool.close() catch { case _: Exception => } }
    if (spoolFile != null) spoolFile.delete()
    try fs.delete(stage, false) catch { case _: Exception => }
  }

  override def close(): Unit = {
    if (spool != null) { try spool.close() catch { case _: Exception => };
      spool = null }
    if (spoolFile != null) { spoolFile.delete(); spoolFile = null }
  }
}

package graft.sources

import java.io.BufferedInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** `.bgi` BGEN index support (the bgenix sqlite sidecar UK Biobank
  * releases ship — enigma.sanger.ac.uk bgenix schema): a `Variant`
  * table carrying one row per variant block with its file offset and
  * byte size, plus a `Metadata` row pinning the indexed file's size.
  *
  * Why it matters at scale: without the index, planning a BGEN read
  * costs one METADATA PASS over the whole file per planning (the
  * offset walk — every block's length fields touched, hundreds of
  * GB streamed per biobank chromosome just to find split points).
  * With the index, planning reads tens of MB of sqlite instead, and
  * pushed chrom/pos filters prune blocks BEFORE any genotype byte is
  * read.
  *
  * Read side handles BOTH storage forms through [[SqliteLite]]:
  * bgenix's `WITHOUT ROWID` primary-key table (columns stored
  * PK-first: chromosome, position, rsid, allele1, allele2,
  * file_start_position, then number_of_alleles, size_in_bytes) and
  * this writer's plain rowid table (declared order). A `Metadata`
  * file-size mismatch — a stale index over a rewritten BGEN — fails
  * loudly instead of mis-seeking.
  */
object BgiIndex {

  /** One indexed variant block. `sizeBytes` spans the WHOLE block
    * (identifiers + genotype payload). */
  final case class BgiVariant(chrom: String, pos: Long, rsid: String,
      nAlleles: Int, allele1: String, allele2: String,
      fileStart: Long, sizeBytes: Long)

  private val VariantCreate =
    "CREATE TABLE Variant (chromosome TEXT NOT NULL, position INT " +
      "NOT NULL, rsid TEXT NOT NULL, number_of_alleles INT NOT NULL, " +
      "allele1 TEXT NOT NULL, allele2 TEXT NULL, file_start_position " +
      "INT NOT NULL, size_in_bytes INT NOT NULL)"
  private val MetadataCreate =
    "CREATE TABLE Metadata (filename TEXT NOT NULL, file_size INT " +
      "NOT NULL, last_write_time INT NOT NULL, first_1000_bytes BLOB " +
      "NOT NULL, index_creation_time INT NOT NULL)"

  /** Parse a `.bgi`; `bgenSize` (when >= 0) is checked against the
    * Metadata row's file_size — a stale index fails loudly. Returns
    * variants in ascending file offset. */
  def read(spark: SparkSession, bgiPath: String,
      bgenSize: Long = -1L): Seq[BgiVariant] = {
    val db = SqliteLite.open(spark, bgiPath)
    if (bgenSize >= 0L) db.tables.get("Metadata").foreach { _ =>
      db.scan("Metadata").headOption.foreach { m =>
        val size = m(1).asInstanceOf[java.lang.Long].longValue()
        require(size == bgenSize,
          s"$bgiPath is STALE: Metadata.file_size $size != actual " +
            s"bgen size $bgenSize — rebuild the index")
      }
    }
    val (_, create) = db.tables.getOrElse("Variant",
      throw new IllegalArgumentException(
        s"$bgiPath has no Variant table (tables: " +
          s"${db.tables.keys.mkString(", ")})"))
    val pkFirst = create.toUpperCase.contains("WITHOUT ROWID")
    def str(v: Any): String = v match {
      case null => null
      case s: String => s
      case other => other.toString
    }
    def lng(v: Any): Long = v.asInstanceOf[java.lang.Long].longValue()
    val rows = db.scan("Variant").map { c =>
      require(c.length >= 8,
        s"$bgiPath: Variant row carries ${c.length} columns, need 8")
      if (pkFirst)
        // (chromosome, position, rsid, allele1, allele2,
        //  file_start_position, number_of_alleles, size_in_bytes)
        BgiVariant(str(c(0)), lng(c(1)), str(c(2)), lng(c(6)).toInt,
          str(c(3)), str(c(4)), lng(c(5)), lng(c(7)))
      else
        // declared order
        BgiVariant(str(c(0)), lng(c(1)), str(c(2)), lng(c(3)).toInt,
          str(c(4)), str(c(5)), lng(c(6)), lng(c(7)))
    }
    rows.sortBy(_.fileStart)
  }

  /** The offset walk producing index entries for one BGEN — the
    * `bgenix -index` computation (one metadata pass, payloads
    * seek-skipped). */
  def fromBgen(spark: SparkSession, bgenPath: String): Seq[BgiVariant] = {
    val p = new Path(bgenPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new BufferedInputStream(fs.open(p), 1 << 16)
    val header = try BgenReader.readHeader(in) finally in.close()
    val raw = fs.open(p)
    try {
      raw.seek(header.firstVariantOffset)
      val bin = new BufferedInputStream(raw, 1 << 16)
      var count = 0L
      val counting = new java.io.FilterInputStream(bin) {
        override def read(): Int = {
          val r = super.read(); if (r >= 0) count += 1; r }
        override def read(b: Array[Byte], o: Int, l: Int): Int = {
          val r = super.read(b, o, l); if (r > 0) count += r; r }
        override def skip(n: Long): Long = {
          val s = super.skip(n); count += s; s }
      }
      val out = Seq.newBuilder[BgiVariant]
      var i = 0L
      while (i < header.mVariants) {
        val start = header.firstVariantOffset + count
        val ids = BgenReader.readVariantIds(counting)
        BgenReader.readGenoPayload(counting, header.compression,
          skip = true)
        val end = header.firstVariantOffset + count
        out += BgiVariant(ids.chrom, ids.pos, ids.rsid,
          ids.alleles.length,
          if (ids.alleles.nonEmpty) ids.alleles.head else "",
          if (ids.alleles.length > 1) ids.alleles(1) else null,
          start, end - start)
        i += 1
      }
      out.result()
    } finally raw.close()
  }

  /** Write `<bgenPath>.bgi` from one metadata pass — the
    * `bgenix -index` equivalent. Plain-rowid Variant table (this
    * module's declared-order form; [[read]] handles both), plus the
    * Metadata staleness row. Timestamps are written as 0 — the
    * deliverable is deterministic bytes, not provenance. */
  def indexBgen(spark: SparkSession, bgenPath: String): String = {
    val variants = fromBgen(spark, bgenPath)
    val p = new Path(bgenPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val size = fs.getFileStatus(p).getLen
    val first1000 = {
      val in = fs.open(p)
      try {
        val n = math.min(1000L, size).toInt
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          require(r >= 0, s"$bgenPath truncated")
          off += r
        }
        b
      } finally in.close()
    }
    val bgiPath = bgenPath + ".bgi"
    // two tables → two sqlite files is wrong; SqliteLite.writeTable
    // writes ONE table per database, so Metadata rides a second table
    // via writeTables
    SqliteLite.writeTables(spark, bgiPath, Seq(
      ("Variant", VariantCreate, variants.iterator.map(v => Seq[Any](
        v.chrom, v.pos, v.rsid, v.nAlleles.toLong, v.allele1,
        v.allele2, v.fileStart, v.sizeBytes))),
      ("Metadata", MetadataCreate, Iterator(Seq[Any](
        p.getName, size, 0L, first1000, 0L)))))
    bgiPath
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BcfReader

/** `df.write.format("vcf"|"bcf").save(dir)` — the DSv2 WRITE path
  * (r14 verdict Missing #2): round-trips row-identical through the
  * DSv2 read side, shards stay split/prune-compatible (`.csi`
  * siblings), per-shard header synthesis when no header option is
  * given, Overwrite truncation, and the loud unsorted-index failure.
  */
class GraftWriteSpec extends AnyFunSuite with SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-dsw")

  private val headerText = Seq(
    "##fileformat=VCFv4.2",
    "##FILTER=<ID=PASS,Description=\"ok\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"gt\">",
    "##contig=<ID=1>",
    "##contig=<ID=2>",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2"
  ).mkString("\n") + "\n"

  private def cohort = spark.range(4000).selectExpr(
    "CAST(1 + (id % 2) AS STRING) AS chrom",
    "CAST(1000 + ((id * 13) % 50000) AS INT) AS pos",
    "'.' AS id", "'A' AS ref", "'G' AS alt", "'.' AS qual",
    "'PASS' AS filter",
    "'DP=' || CAST(id % 90 AS STRING) AS info",
    "'GT' AS format",
    """map('S1', CASE WHEN id % 3 = 0 THEN '0/1' ELSE '0/0' END,
           'S2', CASE WHEN id % 4 = 0 THEN '1/1' ELSE '0/0' END)
       AS genotypes""")

  private val cols = Seq("chrom", "pos", "id", "ref", "alt", "qual",
    "filter", "info", "format", "genotypes")

  test("format(\"bcf\") write with a header option: round-trips " +
      "row-identical through format(\"bcf\") read, lands one .csi per " +
      "shard, and the landing region-prunes + splits like writeBcf's") {
    val dir = tmp.resolve("bcf-hdr").toString
    val df = cohort
    df.repartitionByRange(3, col("chrom"), col("pos"))
      .sortWithinPartitions(col("chrom"), col("pos"))
      .write.format("bcf").mode("overwrite")
      .option("header", headerText).save(dir)
    val shards = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".bcf"))
    assert(shards.length === 3)
    shards.foreach { f =>
      assert(new java.io.File(f.getPath + ".csi").exists,
        s"missing .csi sibling for ${f.getName}")
    }
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.startsWith(".stage")), "stage litter left behind")
    val back = spark.read.format("bcf").load(dir)
    assert(back.select(cols.head, cols.tail: _*).collect().toSet ===
      df.select(cols.head, cols.tail: _*).collect().toSet)
    // prune: a chrom-absent equality yields zero input partitions
    val pruned = spark.read.format("bcf").load(dir)
      .filter(col("chrom") === "9")
    assert(pruned.count() === 0)
    assert(pruned.rdd.getNumPartitions === 0,
      "chrom-unsatisfiable read must plan zero tasks")
  }

  test("format(\"bcf\") write with NO header: per-shard synthesized " +
      "header (spool + vocabulary), round-trips row-identical") {
    val dir = tmp.resolve("bcf-synth").toString
    val df = cohort
    df.repartitionByRange(2, col("chrom"), col("pos"))
      .sortWithinPartitions(col("chrom"), col("pos"))
      .write.format("bcf").mode("append").save(dir)
    val back = spark.read.format("bcf").load(dir)
    assert(back.select(cols.head, cols.tail: _*).collect().toSet ===
      df.select(cols.head, cols.tail: _*).collect().toSet)
    // the synthesized shard is indexed too
    assert(new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".csi")) === 2)
  }

  test("format(\"vcf\") write: self-contained text shards (synth and " +
      "header modes) round-trip through format(\"vcf\") read; a " +
      "sites-only frame (no format/genotypes columns) writes 8-column " +
      "lines (ACCEPT_ANY_SCHEMA by-name resolution)") {
    val df = cohort
    val dirH = tmp.resolve("vcf-hdr").toString
    df.write.format("vcf").mode("overwrite")
      .option("header", headerText).save(dirH)
    val backH = spark.read.format("vcf").load(dirH)
    assert(backH.select(cols.head, cols.tail: _*).collect().toSet ===
      df.select(cols.head, cols.tail: _*).collect().toSet)
    val dirS = tmp.resolve("vcf-synth").toString
    df.write.format("vcf").mode("append").save(dirS)
    val backS = spark.read.format("vcf").load(dirS)
    assert(backS.select(cols.head, cols.tail: _*).collect().toSet ===
      df.select(cols.head, cols.tail: _*).collect().toSet)
    // sites-only: only the 5 core columns exist in the frame
    val sites = df.select("chrom", "pos", "id", "ref", "alt")
    val dirX = tmp.resolve("vcf-sites").toString
    sites.write.format("vcf").mode("append").save(dirX)
    val backX = spark.read.format("vcf").load(dirX)
    assert(backX.select("chrom", "pos", "id", "ref", "alt")
      .collect().toSet === sites.collect().toSet)
    assert(backX.where(col("genotypes").isNotNull &&
      size(map_keys(col("genotypes"))) > 0).count() === 0)
  }

  test("mode(\"overwrite\") truncates the prior landing; " +
      "mode(\"append\") adds shards next to it") {
    val dir = tmp.resolve("bcf-trunc").toString
    val df = cohort.limit(500).repartition(1)
      .sortWithinPartitions(col("chrom"), col("pos"))
    df.write.format("bcf").mode("overwrite")
      .option("header", headerText).save(dir)
    df.write.format("bcf").mode("append")
      .option("header", headerText).save(dir)
    assert(spark.read.format("bcf").load(dir).count() === 1000)
    df.write.format("bcf").mode("overwrite")
      .option("header", headerText).save(dir)
    assert(spark.read.format("bcf").load(dir).count() === 500)
  }

  test("unsorted partitions with index on FAIL LOUDLY (never a wrong " +
      ".csi); option(\"index\",\"false\") writes them fine") {
    val dir = tmp.resolve("bcf-unsorted").toString
    val unsorted = cohort.repartition(2) // hash partitions: pos unsorted
    val e = intercept[Exception] {
      unsorted.write.format("bcf").mode("overwrite")
        .option("header", headerText).save(dir)
    }
    assert(e.getMessage != null) // wrapped SparkException chain
    unsorted.write.format("bcf").mode("overwrite")
      .option("header", headerText).option("index", "false").save(dir)
    val back = spark.read.format("bcf").load(dir)
    assert(back.count() === 4000)
    assert(new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".csi")) === 0)
  }

  test("format(\"vcf\") write with bgzf+index: .vcf.gz shards with " +
      ".tbi siblings land splittable and region-prunable through " +
      "format(\"vcf\"), round-tripping row-identical") {
    val dir = tmp.resolve("vcf-bgzf").toString
    val df = cohort
    df.repartitionByRange(2, col("chrom"), col("pos"))
      .sortWithinPartitions(col("chrom"), col("pos"))
      .write.format("vcf").mode("overwrite")
      .option("header", headerText).option("bgzf", "true").save(dir)
    val files = new java.io.File(dir).listFiles
    assert(files.count(_.getName.endsWith(".vcf.gz")) === 2)
    assert(files.count(f => f.getName.endsWith(".tbi") ||
      f.getName.endsWith(".csi")) === 2,
      files.map(_.getName).mkString(","))
    val back = spark.read.format("vcf")
      .load(s"$dir/*.vcf.gz")
    assert(back.select(cols.head, cols.tail: _*).collect().toSet ===
      df.select(cols.head, cols.tail: _*).collect().toSet)
    // splittable: more partitions than shards at a small split size
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val split = spark.read.format("vcf").load(s"$dir/*.vcf.gz")
      assert(split.rdd.getNumPartitions > 2,
        s"indexed bgzf shards must split, got ${split.rdd.getNumPartitions}")
      assert(split.count() === 4000)
    } finally
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    // region prune: absent chrom plans zero rows
    assert(spark.read.format("vcf").load(s"$dir/*.vcf.gz")
      .filter(col("chrom") === "1" && col("pos").between(1000, 1050))
      .count() > 0)
  }

  test("text index builders are END-aware (htslib's tabix VCF preset): " +
      "a gVCF band's bins cover the BAND INTERIOR, so an external " +
      "region query left of the anchor base still hits the record — " +
      "through the DSv2 write path AND the re-read indexer") {
    import org.apache.hadoop.fs.Path
    import graft.sources.v2.TabixIndex
    val dir = tmp.resolve("vcf-bands").toString
    // three bands on chrom 1: [1000,60000], [60001,120000], [120001,
    // 200000] — END= spans far past the 1-base REF anchor
    val bands = spark.createDataFrame(Seq(
      ("1", 1000, ".", "A", "<NON_REF>", ".", ".", "END=60000"),
      ("1", 60001, ".", "C", "<NON_REF>", ".", ".", "END=120000"),
      ("1", 120001, ".", "G", "<NON_REF>", ".", ".", "END=200000")
    )).toDF("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info")
    bands.repartition(1).sortWithinPartitions(col("chrom"), col("pos"))
      .write.format("vcf").mode("overwrite")
      .option("header", headerText).option("bgzf", "true").save(dir)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val idxFile = new java.io.File(dir).listFiles
      .find(f => f.getName.endsWith(".tbi") || f.getName.endsWith(".csi"))
      .getOrElse(fail("no index sibling written"))
    val idx =
      if (idxFile.getName.endsWith(".tbi"))
        TabixIndex.read(fs, new Path(idxFile.getPath))
      else TabixIndex.readCsi(fs, new Path(idxFile.getPath))
    val ref = idx.ref("1").getOrElse(fail("chrom 1 missing from index"))
    // window strictly INSIDE band 2 (pos 60001, END 120000): 0-based
    // [90000, 90100) — a pos-anchored index would return no chunks
    assert(TabixIndex.regionChunks(ref, 90000L, 90100L).nonEmpty,
      "band interior not covered by the DSv2-written index")
    // and inside band 3's tail
    assert(TabixIndex.regionChunks(ref, 199000L, 199001L).nonEmpty,
      "band tail not covered by the DSv2-written index")
    // (no emptiness probe for off-band windows: a wide band lands in a
    // COARSE parent bin whose chunks regionChunks rightly returns for
    // any window under that bin — binning is conservative by design
    // and record-level overlap is the reader's post-filter)
    // the re-read indexer (buildForBgzfVcf) agrees: rebuild a sibling
    // from the shard bytes and probe the same interior window
    val shard = new java.io.File(dir).listFiles
      .find(_.getName.endsWith(".vcf.gz")).get
    val rebuilt = TabixIndex.buildForBgzfVcf(fs, new Path(shard.getPath))
    val rref = rebuilt.ref("1").getOrElse(fail("rebuilt index missing 1"))
    assert(TabixIndex.regionChunks(rref, 90000L, 90100L).nonEmpty,
      "band interior not covered by buildForBgzfVcf")
  }

  test("bare load(dir) of a DSv2-written bgzf landing skips index " +
      "siblings and hidden staging litter (a .tbi read as VCF text " +
      "would yield binary garbage rows)") {
    val dir = tmp.resolve("vcf-litter").toString
    val df = cohort.limit(300).repartition(1)
      .sortWithinPartitions(col("chrom"), col("pos"))
    df.write.format("vcf").mode("overwrite")
      .option("header", headerText).option("bgzf", "true").save(dir)
    // plant dead-attempt litter next to the shards
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".stage-part-junk.vcf"),
      "not\ta\tvcf\n")
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".tbi")) ||
      files.exists(_.endsWith(".csi")), files.mkString(","))
    val back = spark.read.format("vcf").load(dir) // bare dir, no glob
    assert(back.count() === 300)
    assert(graft.sources.v2.VcfDataSource.lastMalformedCount
      .forall(_ === 0L), "index/litter bytes leaked into the scan")
  }
}

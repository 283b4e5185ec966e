package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VcfReader

/** The 100 TB landing paths: text VCF → parquet. The landing shuffle
  * must fan each chromosome over MANY writers (hashing on chrom alone
  * serializes a multi-TB chromosome through one reducer task), and the
  * bucketed-table variant must let downstream site-keyed aggregation
  * plan with zero exchanges — the SURVEY §4 co-location promise.
  */
class LandingSpec extends AnyFunSuite with SparkSpec {

  /** Two chroms × 40 records spread over ~12 Mb so positions span many
    * 2^20 pos buckets.
    */
  private def writeWideVcf(): java.nio.file.Path = {
    val header = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    val records = for {
      c <- Seq("1", "2")
      i <- 1 to 40
    } yield s"$c\t${i * 300000}\trs${c}_$i\tA\tG\t50\tPASS\tDP=$i\tGT\t0/1"
    val p = Files.createTempFile("graft-landing", ".vcf")
    Files.writeString(p, (header ++ records).mkString("", "\n", "\n"))
    p.toFile.deleteOnExit()
    p
  }

  test("toParquet fans one chromosome over multiple writer tasks") {
    val vcf = writeWideVcf()
    val out = Files.createTempDirectory("graft_landing").resolve("landed")
    // AQE rightly coalesces this KB-sized fixture into one reducer; at
    // landing scale each (chrom, pos_bucket) shard is GBs and stays its
    // own task — pin coalescing off so the test sees the scale shape
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try VcfReader.toParquet(spark, vcf.toString, out.toString)
    finally spark.conf.set(key, old)

    // one parquet part-file per (reducer, chrom) pair: with the
    // (chrom, pos_bucket) shuffle a 12 Mb chromosome lands from >1
    // reducer; the old repartition(chrom) wrote exactly one
    val chr1Files = Files.list(out.resolve("chrom=1")).iterator()
    var parts = 0
    while (chr1Files.hasNext) {
      if (chr1Files.next().getFileName.toString.endsWith(".parquet")) parts += 1
    }
    assert(parts > 1,
      s"chrom=1 landed as $parts file(s) — per-chrom repartition straggler is back")

    // and the landed table is lossless + chrom-pruned
    val landed = spark.read.parquet(out.toString)
    assert(landed.count() === 80)
    assert(landed.filter(col("chrom") === "1").count() === 40)
    assert(landed.select(sum("pos")).head().getLong(0) ===
      2L * (1 to 40).map(_ * 300000L).sum)
  }

  test("bucketed landing: site-keyed aggregation over the table plans zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS g_vcf_bucketed")
    val wh = java.nio.file.Paths.get("/tmp/graft-test-warehouse/g_vcf_bucketed")
    if (Files.exists(wh)) {
      import scala.jdk.CollectionConverters._
      Files.walk(wh).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val vcf = writeWideVcf()
    VcfReader.toBucketedTable(spark, vcf.toString, "g_vcf_bucketed", buckets = 8)

    val agg = spark.table("g_vcf_bucketed")
      .groupBy("chrom", "pos_bucket", "pos")
      .agg(count(lit(1)).as("n_sites"), max("qual").as("max_qual"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"site-keyed agg over the bucketed landing still shuffles:\n$plan")
    assert(agg.count() === 80)

    // the bucket column is derived, not invented: pos_bucket == pos >> 20
    val bad = spark.table("g_vcf_bucketed")
      .filter(col("pos_bucket") =!= shiftright(col("pos"), 20).cast("int"))
    assert(bad.count() === 0)
  }

  test("compactBucketedTable: one file per bucket, layout and zero-exchange plans preserved") {
    import scala.jdk.CollectionConverters._
    val table = "g_vcf_frag"
    Seq(table, s"${table}__compacting").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq(table, s"${table}__compacting").foreach { t =>
      val wh = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (Files.exists(wh))
        Files.walk(wh).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    // simulate multi-batch/multi-writer ingest: 5 round-robin input
    // tasks, each writing its own file into every bucket it touches
    val vcf = writeWideVcf()
    VcfReader.read(spark, vcf.toString)
      .withColumn("pos_bucket", VcfReader.posBucket(col("pos")))
      .repartition(5)
      .write.mode("overwrite")
      .bucketBy(4, "chrom", "pos_bucket")
      .sortBy("chrom", "pos_bucket")
      .format("parquet")
      .saveAsTable(table)

    // bucketed part files carry their bucket id as the _NNNNN suffix
    def filesPerBucket(): Map[Int, Int] = {
      val loc = java.nio.file.Paths.get(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
      val re = ".*_(\\d{5})(?:\\..*)?\\.parquet$".r
      Files.list(loc).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case re(b) => b.toInt }
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
    }
    val before = filesPerBucket()
    assert(before.values.exists(_ > 1),
      s"fixture failed to fragment the table: $before")
    val nBefore = spark.table(table).count()
    val sumBefore = spark.table(table).select(sum("pos")).head().getLong(0)

    VcfReader.compactBucketedTable(spark, table)

    val after = filesPerBucket()
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file buckets: $after")
    // lossless
    assert(spark.table(table).count() === nBefore)
    assert(spark.table(table).select(sum("pos")).head().getLong(0) === sumBefore)
    // the zero-exchange site-keyed plan survives the rewrite
    val agg = spark.table(table)
      .groupBy("chrom", "pos_bucket", "pos")
      .agg(count(lit(1)).as("n_sites"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"site-keyed agg shuffles after compaction:\n$plan")
  }

  test("compactBucketedTable: partitioned+bucketed compacts to one file per (partition, bucket)") {
    import scala.jdk.CollectionConverters._
    // r6 verdict gap: the chrom-partitioned landing — the layout most
    // likely to accumulate per-batch small files — had no compaction
    // path. One global bucket shuffle + the dynamic-partition writer
    // now compacts it without per-partition jobs.
    val table = "g_vcf_part_frag"
    Seq(table, s"${table}__compacting", s"${table}__old").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (Files.exists(wh))
        Files.walk(wh).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val vcf = writeWideVcf()
    (1 to 3).foreach { _ =>
      VcfReader.appendToPartitionedBucketedTable(spark, vcf.toString, table, buckets = 4)
    }
    def filesPerPartBucket(): Map[(String, Int), Int] = {
      val loc = java.nio.file.Paths.get(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
      val re = ".*_(\\d{5})(?:\\..*)?\\.parquet$".r
      Files.list(loc).iterator().asScala.filter(Files.isDirectory(_))
        .flatMap { dir =>
          Files.list(dir).iterator().asScala
            .map(_.getFileName.toString)
            .collect { case re(b) => (dir.getFileName.toString, b.toInt) }
        }.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    }
    val before = filesPerPartBucket()
    assert(before.values.exists(_ > 1),
      s"fixture failed to fragment the partitioned table: $before")
    val nBefore = spark.table(table).count()
    val sumBefore = spark.table(table).select(sum("pos")).head().getLong(0)

    VcfReader.compactBucketedTable(spark, table)

    val after = filesPerPartBucket()
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction left multi-file (partition, bucket)s: $after")
    // lossless, and the chrom partition column survives as STRING (the
    // rewrite must not let directory-name type inference turn "1" into
    // an int and corrupt the schema)
    assert(spark.table(table).count() === nBefore)
    assert(spark.table(table).select(sum("pos")).head().getLong(0) === sumBefore)
    assert(spark.table(table).schema("chrom").dataType ===
      org.apache.spark.sql.types.StringType)
    // partition + bucket spec preserved
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.partitionColumnNames === Seq("chrom"))
    assert(meta.bucketSpec.map(b => (b.numBuckets, b.bucketColumnNames)) ===
      Some((4, Seq("pos_bucket"))))
    // directory pruning still plans: a chrom slice reads one partition
    val q = spark.table(table).filter(col("chrom") === "1")
    assert(q.count() === nBefore / 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition pruning:\n$scan")
  }

  test("appendToBucketedTable: multi-batch ingest keeps the layout queryable") {
    import scala.jdk.CollectionConverters._
    val table = "g_vcf_append"
    Seq(table, s"${table}__compacting").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (Files.exists(wh))
        Files.walk(wh).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val vcf = writeWideVcf()
    VcfReader.appendToBucketedTable(spark, vcf.toString, table, buckets = 4)
    VcfReader.appendToBucketedTable(spark, vcf.toString, table, buckets = 4)
    assert(spark.table(table).count() === 160)
    // a drifted bucket count fails loudly instead of corrupting layout
    intercept[Exception] {
      VcfReader.appendToBucketedTable(spark, vcf.toString, table, buckets = 8)
    }
    // the appended table still plans site-keyed work with zero exchanges
    val agg = spark.table(table)
      .groupBy("chrom", "pos_bucket", "pos").agg(count(lit(1)).as("n"))
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    // and compaction collapses the accumulated batch files
    VcfReader.compactBucketedTable(spark, table)
    assert(spark.table(table).count() === 160)
  }
}

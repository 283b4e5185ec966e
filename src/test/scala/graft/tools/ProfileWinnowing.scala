package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile for the WINNOWING sketch vs the full shared-span
  * substrate it competes with: near-dup pairs from
  * `winnowingPairs(n=3, w)` (per-window minimum fingerprints — stores
  * ~2/(w+1) of the shingles) vs `sharedSpanPairs` (every span hashed
  * and joined). The structural claim under test: winnowing shrinks the
  * JOIN INPUT (the table that shuffles, the cost that multiplies by
  * corpus size at 100 TB) by ~w/2 while keeping the shared-run
  * guarantee. Reports per-path median-of-3 wall plus the exact join
  * input sizes so the compression is measured, not asserted. Run:
  * `sbt "Test/runMain graft.tools.ProfileWinnowing [sfDir] [w]"`.
  */
object ProfileWinnowing {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val w = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    // the q31/q141 near-dup corpus: docs ∪ perturbed copies
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val canon = lower(graft.functions.TextFunctions.cleanAscii(col("text")))
    val docs = d.select(col("doc_id").as("id"), canon.as("text"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(canon, lit(" zz yy xx")).as("text")))
    docs.persist().count()

    def median(f: => Long): (Double, Long) = {
      val rows = f // warm + row count
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      (samples(1), rows)
    }

    // join-input sizes: what actually shuffles into the pair join
    val nShingles = Dedup.shingleTable(docs, "id", "text", 3).count()
    val nFps = Dedup.winnowingFingerprints(docs, "id", "text", 3, w).count()

    val (tSpan, nSpanPairs) = median(
      Dedup.sharedSpanPairs(docs, "id", "text", 12, 3).count())
    val (tWin, nWinPairs) = median(
      Dedup.winnowingPairs(docs, "id", "text", 3, w, minShared = 2).count())

    println(f"join input: shingles=$nShingles fingerprints=$nFps " +
      f"compression=${nShingles.toDouble / nFps}%.1fx (w=$w, theory ~${(w + 1) / 2.0}%.1fx)")
    println(f"sharedSpanPairs: wall=$tSpan%.2fs pairs=$nSpanPairs")
    println(f"winnowingPairs:  wall=$tWin%.2fs pairs=$nWinPairs")
    spark.stop()
  }
}

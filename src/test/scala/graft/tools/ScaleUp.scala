package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe data builder: replicate a testdata table `factor`× with
  * shifted derivation keys, so the synthetic-variants substrate grows
  * `factor`× in SITES (the 4-sample panel stays fixed — exactly how a
  * callset grows along the genome axis). Usage:
  *   Test/runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  * Writes <outDir>/lineitem.parquet. The shift is in l_orderkey space
  * (k = l_orderkey·8 + l_linenumber), so every replica derives a
  * disjoint site set with the same per-row statistics.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0) + 1L
    val copies = (0 until factor).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxKey))
    }.reduce(_ unionAll _)
    copies.repartition(16).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")
    println(s"wrote ${factor}x lineitem (${li.count() * factor} rows) to $out")
    // documents grows the same way (doc_id shift) so the text-corpus
    // operators (q209 KN-LM, dedup family) get honest scale probes;
    // the shift keeps doc_id % k class membership ONLY for classes
    // dividing the shift — shift by a multiple of 100 so the
    // q203/q209-style % 50 / % 100 gate splits replicate cleanly
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$src/documents.parquet"))) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val m = docs.agg(max("doc_id")).head().getLong(0)
      val shift = ((m / 100L) + 1L) * 100L
      val dcopies = (0 until factor).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * shift))
      }.reduce(_ unionAll _)
      dcopies.repartition(16).write.mode("overwrite")
        .parquet(s"$out/documents.parquet")
      println(s"wrote ${factor}x documents to $out (shift $shift)")
    }
    spark.stop()
  }
}

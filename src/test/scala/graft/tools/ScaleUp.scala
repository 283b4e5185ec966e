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
    spark.stop()
  }
}

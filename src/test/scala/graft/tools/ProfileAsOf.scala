package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.queries.QueryUtil._

/** Head-to-head of the two as-of join implementations on the q09 data
  * shape (events × orders at a given SF), 3 runs each, median wall.
  */
object ProfileAsOf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ev = events(spark, dir)
      .withColumn("uk", col("user_id") % 1500 + 1)
      .select("event_id", "uk", "ts")
    def orders = t(spark, dir, "orders")

    def run(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[asof] $name%-10s median=${walls(1)}%6.2f s  runs=${walls.map(w => f"$w%.2f").mkString(",")}")
    }

    run("join+agg")(AsOfJoin.lastBefore(
      ev, orders, col("uk"), col("o_custkey"), col("ts"), col("o_orderdate"),
      col("o_orderkey"), Seq((col("o_totalprice"), "price"))))
    run("sorted")(AsOfJoin.lastBeforeSorted(
      ev, orders, col("uk"), col("o_custkey"), col("ts"), col("o_orderdate"),
      col("o_orderkey"), Seq((col("o_totalprice"), "price"))))
    spark.stop()
  }
}

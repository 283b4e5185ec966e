package graft.tools

import org.apache.spark.sql.SparkSession

/** Drive the production extensions path: spark.sql.extensions config. */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[ext] " + spark.sql(
      "SELECT vartype('TTC','TAG') AS vt, rolling_hash('AB') AS rh").head())
    // probe: wrong arity
    try { spark.sql("SELECT vartype('A')").head(); println("[ext] PROBE-MISS") }
    catch { case e: Exception => println(s"[ext] arity error → ${e.getMessage.take(70)}") }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Manual drive: stream the driver's real events table through the
  * windowed aggregation and sessionization paths; compare the streaming
  * window result against the batch q50 oracle semantics.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // QueryUtil.events handles both nanos-parquet read behaviors (raw
    // int64 under the legacy conf vs native TIMESTAMP_NTZ)
    val ev = graft.queries.QueryUtil.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id", "event_type", "value").as[Event]
      .collect().toSeq
    println(s"[stream] loaded ${ev.size} real events")

    // streaming windowed agg over the real events
    val win = EventStreams.runBoundedWindowed(spark, ev)
    println(s"[stream] windowed rows=${win.count()}")

    // batch twin for comparison
    val batch = spark.createDataset(ev).toDF()
      .groupBy(window(col("ts"), "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    println(s"[stream] batch rows=${batch.count()}")
    val diff = win.select("win_start", "event_type", "n")
      .exceptAll(batch.select(col("window.start").as("win_start"), col("event_type"), col("n")))
    println(s"[stream] stream-vs-batch diff rows=${diff.count()} (expect 0)")

    // stateful sessionization on a second bounded stream
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    mem.addData(ev)
    val q = EventStreams.sessionize(mem.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("real_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table("real_sessions")
    println(s"[stream] closed sessions=${sessions.count()}")
    sessions.orderBy(desc("n_events")).show(3, false)
    spark.stop()
  }
}

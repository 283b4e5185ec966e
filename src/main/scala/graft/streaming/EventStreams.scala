package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the event analytics: the batch
  * q50 tumbling-window aggregation as a real stream, plus stateful
  * sessionization via flatMapGroupsWithState.
  *
  * At scale these run unchanged on a Kafka/file source: state is
  * partitioned by the grouping key across executors, watermarks bound
  * state size, and output is append-only.
  */
object EventStreams {

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Internal running-session state (public: the encoder's generated code
    * must reach the accessors).
    */
  final case class SessionState(start: Long, last: Long, n: Long, acc: Double)

  /** Tumbling-window counts/sums per event type with a watermark — the
    * streaming twin of q50_event_window (same window alignment, so batch
    * results are the oracle for the stream).
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization: a session closes after `gapSeconds` of
    * inactivity per user. Works identically on a stream (state timeout
    * driven) and, for testing, on a bounded stream drained to completion.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1, acc = s.acc + e.value))
              case Some(s) =>
                closed += Session(userId, new Timestamp(s.start),
                  new Timestamp(s.last), s.n, s.acc)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (state.hasTimedOut) {
            state.getOption.foreach { s =>
              closed += Session(userId, new Timestamp(s.start),
                new Timestamp(s.last), s.n, s.acc)
            }
            state.remove()
          } else {
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
          }
          closed.result().iterator
      }
  }

  /** Batch-mode sessionization with identical semantics (window lag +
    * cumulative session ids) — the oracle for the stateful stream and
    * the shape used in backfills. One shuffle on user_id. The gap
    * compares MILLISECOND timestamps exactly as the stream's
    * `t - s.last <= gapMs` does: a floored-second comparison would
    * merge sessions the stream splits when the gap is crossed by a
    * sub-second margin.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val newSession = when(
      unix_millis(col("ts")) -
        unix_millis(lag("ts", 1).over(byUser)) > gapSeconds * 1000L, 1)
      .otherwise(0)
    events
      .withColumn("new_s", coalesce(newSession, lit(1)))
      .withColumn("session_seq", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
  }

  /** Drive a bounded memory stream of `events` through [[windowedCounts]]
    * and return the completed result — used by specs to prove the
    * streaming path agrees with the batch oracle.
    */
  def runBoundedWindowed(spark: SparkSession, events: Seq[Event]): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    mem.addData(events)
    val q = windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("graft_win_test")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_win_test")
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenCount
import graft.operators.TextAnalysis

/** Streaming ingestion cleaning for a document corpus: the
  * arrival-time twin of the batch q36 funnel. Stateless stages (quality
  * gate, PII redaction) stream trivially; exact dedup is the stateful
  * one — dropDuplicatesWithinWatermark keys state by content digest,
  * so state is partitioned across executors by digest and BOUNDED by
  * the watermark horizon (a digest seen again after the horizon is
  * admitted — at 100 TB/day retention-unbounded exact dedup belongs in
  * the batch layer; the stream layer de-dups the near-in-time copies
  * that dominate crawl traffic).
  */
object DocStreams {

  final case class Doc(ts: Timestamp, doc_id: Long, text: String)

  /** Content-hash exact dedup on a stream: first arrival of a digest
    * within the watermark passes, later copies drop.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Full ingestion pipeline: dedup → quality gate → PII redaction.
    * Order matters at scale: dedup first so the quality/redact work runs
    * once per distinct doc, not once per copy.
    */
  def ingestClean(
      docs: DataFrame,
      minTokens: Int = 5,
      watermark: String = "1 hour"): DataFrame =
    dedupStream(docs, watermark)
      .filter(tokenCount(col("text")) >= minTokens)
      .withColumn("text", TextAnalysis.redactPii(col("text")))

  /** Drain a bounded memory stream through [[ingestClean]] — spec
    * harness proving the streaming path agrees with its batch twin.
    */
  def runBoundedClean(
      spark: SparkSession, docs: Seq[Doc], minTokens: Int = 5): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    mem.addData(docs)
    val q = ingestClean(mem.toDF(), minTokens)
      .writeStream.format("memory").queryName("graft_clean_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_clean_test")
  }

  /** Batch twin of [[ingestClean]] (keep the earliest copy per digest). */
  def ingestCleanBatch(docs: DataFrame, minTokens: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("digest").orderBy(col("ts"), col("doc_id"))
    docs
      .withColumn("digest", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .filter(tokenCount(col("text")) >= minTokens)
      .withColumn("text", TextAnalysis.redactPii(col("text")))
  }
}

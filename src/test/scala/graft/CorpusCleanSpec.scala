package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.tokenCount

/** q36 pins the composed-pipeline contract: the whole funnel (union →
  * exact dedup → quality gate → 3 counts) is ONE lazy plan. Round 2 ran
  * three driver count() actions inside the builder, recomputing the
  * union+dedup lineage three times — 3× the corpus I/O at 100 TB.
  */
class CorpusCleanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q36 builder is lazy — no more jobs than a bare table read") {
    // spark.read.parquet legitimately runs a footer/schema job; what the
    // round-2 version did wrong was count() ACTIONS inside the builder.
    // Baseline = jobs fired by reading the one table the builder reads;
    // the builder itself must not exceed it (a count() would).
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.read.parquet(s"$dir/documents.parquet")
      Thread.sleep(300)
      val baseline = jobs.getAndSet(0)
      val df = SparkEntry.queries("q36_corpus_clean")(spark, dir)
      Thread.sleep(300) // let any stray job-start events land
      assert(jobs.get() <= baseline,
        s"q36 builder fired ${jobs.get()} jobs (baseline table read: $baseline) " +
          "— the funnel must stay one lazy plan with no driver actions")
      assert(df.columns.toSeq === Seq("n_total", "n_after_dedup", "n_after_quality"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q36 funnel counts match independently computed stages") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val both = d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("id"), col("text")))
    val expectedTotal = both.count()
    val dedup = both.groupBy(md5(col("text"))).agg(first(col("text")).as("text"))
    val expectedDedup = dedup.count()
    val expectedKept = dedup.filter(tokenCount(col("text")) >= 30).count()

    val row = SparkEntry.queries("q36_corpus_clean")(spark, dir).head()
    assert(row.getLong(0) === expectedTotal)
    assert(row.getLong(1) === expectedDedup)
    assert(row.getLong(2) === expectedKept)
    assert(expectedTotal > expectedDedup && expectedDedup >= expectedKept)
  }

  test("dropBoilerplateLines: hot lines deleted, order kept, empties restored") {
    import spark.implicits._
    import graft.operators.Dedup
    val footer = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha body one\n$footer\nalpha body two"),
      (2L, s"$footer\nbeta body"),
      (3L, s"gamma body\n$footer"),
      (4L, footer),                       // all-boilerplate → empty
      (5L, "delta body\ndelta extra"),    // untouched
      // a line shared by exactly maxDocs docs SURVIVES (> not >=)
      (6L, "rare shared line\nzeta body"),
      (7L, "rare shared line\neta body"))
      .toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "alpha body one\nalpha body two")
    assert(out(2L) === "beta body")
    assert(out(3L) === "gamma body")
    assert(out(4L) === "")
    assert(out(5L) === "delta body\ndelta extra")
    assert(out(6L) === "rare shared line\nzeta body")
    assert(out(7L) === "rare shared line\neta body")
    assert(out.size === 7)
    // a repeated line INSIDE one doc is one doc's evidence, not many
    val selfRep = Seq((1L, "x\nx\nx\nbody"), (2L, "other")).toDF("doc_id", "text")
    val o2 = Dedup.dropBoilerplateLines(selfRep, "doc_id", "text", maxDocs = 1)
      .as[(Long, String)].collect().toMap
    assert(o2(1L) === "x\nx\nx\nbody")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lastBefore picks the latest right row at or before left time") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 11:00:00"), 2L, 110.0),
      ("A", ts("2024-01-01 12:00:00"), 3L, 120.0),
      ("B", ts("2024-01-01 10:30:00"), 4L, 200.0))
      .toDF("sym", "qts", "qid", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 11:30:00"), "t1"),
      ("A", ts("2024-01-01 09:00:00"), "t2"), // before any quote → dropped
      ("B", ts("2024-01-01 23:00:00"), "t3"))
      .toDF("sym", "tts", "tid")

    val out = AsOfJoin.lastBefore(
      trades, quotes,
      leftKey = col("sym"), rightKey = col("sym"),
      leftTime = col("tts"), rightTime = col("qts"),
      tiebreak = col("qid"),
      payload = Seq((col("px"), "px")))
      .select("tid", "asof_tiebreak", "px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    assert(out === Set(("t1", 2L, 110.0), ("t3", 4L, 200.0)))
  }

  test("fully-duplicate left rows each keep their own output row") {
    // two byte-identical left rows: an as-of join must emit two rows
    // (round-2 regression: grouping without a row id collapsed them)
    val left = Seq(
      ("A", ts("2024-01-01 12:00:00"), "same"),
      ("A", ts("2024-01-01 12:00:00"), "same"))
      .toDF("sym", "tts", "tag")
    val right = Seq(("A", ts("2024-01-01 10:00:00"), 1L, 100.0))
      .toDF("sym", "qts", "qid", "px")
    val out = AsOfJoin.lastBefore(
      left, right, col("sym"), col("sym"), col("tts"), col("qts"),
      tiebreak = col("qid"), payload = Seq((col("px"), "px")))
    assert(out.count() === 2)
    assert(out.select("px").collect().map(_.getDouble(0)).toSeq === Seq(100.0, 100.0))
  }

  test("lastBeforeSorted ≡ lastBefore on random data (dups, ties, no-match, nulls)") {
    val rnd = new scala.util.Random(42)
    // small key/time domains force collisions: duplicate left rows, tied
    // right times, keys with no history, null keys/times
    def key() = if (rnd.nextInt(20) == 0) null else s"k${rnd.nextInt(8)}"
    def t() = if (rnd.nextInt(25) == 0) null
      else ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:00:00")
    val left = Seq.fill(300)((key(), t(), rnd.nextInt(5).toLong))
      .toDF("k", "lt", "attr")
    val right = Seq.fill(200)((key(), t(), rnd.nextInt(10).toLong, rnd.nextInt(3) * 1.5))
      .toDF("k", "rt", "tb", "px")

    def run(f: AsOfJoin.type => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        Seq[(org.apache.spark.sql.Column, String)]) => org.apache.spark.sql.DataFrame) =
      f(AsOfJoin)(left, right, col("k"), col("k"), col("lt"), col("rt"),
        col("tb"), Seq((col("px"), "px")))
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    val a = run(_.lastBefore)
    val b = run(_.lastBeforeSorted)
    assert(a === b) // same multiset of rows, multiplicities included
  }

  test("lastBefore plans deterministically (no synthetic row ids)") {
    val left = Seq(("A", ts("2024-01-01 12:00:00"), "x")).toDF("k", "lt", "id")
    val right = Seq(("A", ts("2024-01-01 10:00:00"), 1L, 100.0))
      .toDF("k", "rt", "tb", "px")
    val analyzed = AsOfJoin.lastBefore(
      left, right, col("k"), col("k"), col("lt"), col("rt"),
      tiebreak = col("tb"), payload = Seq((col("px"), "px")))
      .queryExecution.analyzed
    // a monotonically_increasing_id row tag shifts under AQE re-planning
    // / stage retry and blocks pushdown; multiplicity now rides a
    // dedupe-count + posexplode restore, all deterministic data columns
    val nondet = analyzed.collect {
      case p if p.expressions.exists(!_.deterministic) => p.nodeName }
    assert(nondet.isEmpty && !analyzed.toString.contains("monotonically_increasing_id"),
      s"lastBefore plan carries a nondeterministic expression in: $nondet")
  }

  test("lastBeforeSorted widens date vs timestamp and plans one exchange") {
    val left = Seq(("A", ts("2024-03-02 00:00:00"), "x")).toDF("k", "lt", "id")
    val right = Seq(("A", java.sql.Date.valueOf("2024-03-01"), 1L, 9.0))
      .toDF("k", "rd", "tb", "px")
    val out = AsOfJoin.lastBeforeSorted(
      left, right, col("k"), col("k"), col("lt"), col("rd"),
      tiebreak = col("tb"), payload = Seq((col("px"), "px")))
    assert(out.select("px").head().getDouble(0) === 9.0)
    val exchanges = out.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, "sorted as-of must shuffle exactly once")
  }

  test("time ties break on the tiebreak column, deterministically") {
    val right = Seq(
      (1, ts("2024-01-01 10:00:00"), 7L, "low"),
      (1, ts("2024-01-01 10:00:00"), 9L, "high"))
      .toDF("k", "rt", "tb", "tag")
    val left = Seq((1, ts("2024-01-01 10:00:00"), "x")).toDF("k", "lt", "id")
    val out = AsOfJoin.lastBefore(
      left, right, col("k"), col("k"), col("lt"), col("rt"),
      tiebreak = col("tb"), payload = Seq((col("tag"), "tag")))
      .select("asof_tiebreak", "tag").head()
    assert((out.getLong(0), out.getString(1)) === (9L, "high"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Hand-computed truth for the nearest-feature join (q83's operator) —
  * the oracled gate aggregates distances per chrom, so the pairwise
  * contract (who matched whom, radius drops, exactly-once emission
  * across straddled buckets) is pinned here.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // bucketShift 4 → 16 bp buckets: small enough that intervals straddle
  // several buckets and the radius expansion crosses bucket lines
  private val shift = 4

  private lazy val intervals = Seq(
    ("1", 10, 40, "g_a"),   // buckets 0..2
    ("1", 100, 120, "g_b"),
    ("1", 100, 130, "g_c"), // same start as g_b, longer
    ("2", 50, 60, "g_d"))
    .toDF("chrom", "start", "end", "gene")

  test("nearestInterval: containment wins at dist 0, exactly once") {
    val points = Seq(("1", 25, "p_in")).toDF("chrom", "pos", "id")
    val got = RangeJoin.nearestInterval(points, intervals, maxDist = 50L,
      bucketShift = shift).collect()
    // the interval spans buckets 0,1,2 and its ±50 expansion many more;
    // the contained point must still emit exactly ONE row
    assert(got.length === 1)
    assert(got.head.getAs[String]("gene") === "g_a")
    assert(got.head.getAs[Long]("dist") === 0L)
  }

  test("nearestInterval: out-of-radius points drop; nearest-by-distance wins") {
    val points = Seq(
      ("1", 70, "p_mid"),   // 30 from g_a's end, 30 from g_b/g_c's start
      ("1", 95, "p_near"),  // 5 from g_b and g_c (tie), 55 from g_a
      ("1", 500, "p_far"),  // nothing within 50
      ("2", 45, "p_c2"),    // 5 from g_d; chrom 1 intervals must not leak
      ("3", 55, "p_c3"))    // right pos, wrong chrom
      .toDF("chrom", "pos", "id")
    val got = RangeJoin.nearestInterval(points, intervals, maxDist = 50L,
      bucketShift = shift)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("gene"), r.getAs[Long]("dist"))).toMap
    assert(!got.contains("p_far"), "out-of-radius point leaked through")
    assert(!got.contains("p_c3"), "nearest join crossed chromosomes")
    assert(got("p_c2") === ("g_d", 5L))
    // p_mid ties g_a/g_b/g_c at 30?  g_a end=40 → dist 30; g_b start=100
    // → dist 30; tiebreak (dist, start, end) picks the smaller start: g_a
    assert(got("p_mid") === ("g_a", 30L))
    // p_near: g_b and g_c tie at dist 5 with equal start; (dist, start,
    // end) picks the shorter interval g_b; dist is the true minimum
    // either way
    assert(got("p_near")._2 === 5L)
    assert(got("p_near")._1 === "g_b")
  }

  test("nearestInterval: every point emits at most one row (no bucket dup)") {
    // points sprayed across bucket lines near a long interval's
    // expansion: each must emit 0 or 1 rows, never more
    val points = (0 until 200).map(i => ("1", i * 3, s"p$i"))
      .toDF("chrom", "pos", "id")
    val out = RangeJoin.nearestInterval(points, intervals, maxDist = 40L,
      bucketShift = shift)
      .groupBy("id").count().filter(col("count") > 1).collect()
    assert(out.isEmpty, s"duplicate emissions: ${out.mkString(",")}")
  }
}

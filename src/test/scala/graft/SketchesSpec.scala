package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, group: String, offset: Long = 0L) =
    spark.range(n).select(lit(group).as("g"), (col("id") + offset).as("k"))

  test("distinctSketch estimates within HLL error bounds per group") {
    val df = fixture(5000, "a").unionAll(fixture(300, "b"))
      // duplicates must not inflate the estimate
      .unionAll(fixture(300, "b"))
    val est = Sketches.estimateDistinct(
        Sketches.distinctSketch(df, "k", Seq("g")), Seq("g"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("a") - 5000.0) / 5000.0 < 0.03, est)
    assert(math.abs(est("b") - 300.0) / 300.0 < 0.03, est)
  }

  test("sketch merge ≈ single-pass over the union; order-insensitive; monotone") {
    val b1 = fixture(4000, "a")                 // keys [0, 4000)
    val b2 = fixture(4000, "a", offset = 2000L) // keys [2000, 6000) → union 6000
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketches.distinctSketch(df, "k", Seq("g"))
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.estimateDistinct(df, Seq("g")).as[(String, Long)].collect().toMap
    val merged = est(Sketches.mergeSketches(Seq(sk(b1), sk(b2)), Seq("g")))("a")
    val direct = est(sk(b1.unionAll(b2)))("a")
    assert(math.abs(merged - 6000.0) / 6000.0 < 0.03, s"merged=$merged")
    // merged state ≈ single-pass state (internal mode promotions may
    // differ — bounded, not bit-equal)
    assert(math.abs(merged - direct).toDouble / direct < 0.01,
      s"merged=$merged direct=$direct")
    val swapped = est(Sketches.mergeSketches(Seq(sk(b2), sk(b1)), Seq("g")))("a")
    assert(math.abs(merged - swapped).toDouble / merged < 0.005,
      s"merge must be order-insensitive: $merged vs $swapped")
    // monotone: the union estimate dominates each part's
    val part = est(sk(b1))("a")
    assert(merged >= part * 0.99, s"merged=$merged part=$part")
  }

  test("sketch tables stay tiny and merge through partial aggregation") {
    val df = fixture(20000, "a").unionAll(fixture(20000, "b")).repartition(8)
    val sk = Sketches.distinctSketch(df, "k", Seq("g"), lgK = 12)
    val rows = sk.collect()
    assert(rows.length === 2)
    // sketch bytes bounded by ~2^lgK (+ header) regardless of input size
    rows.foreach(r => assert(r.getAs[Array[Byte]]("sketch").length < 5000))
    val p = sk.queryExecution.executedPlan.toString
    assert(p.contains("partial_hll_sketch_agg") || p.contains("partial"),
      s"sketch agg must partial-aggregate map-side:\n$p")
  }
}

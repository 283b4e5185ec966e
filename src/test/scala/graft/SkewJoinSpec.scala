package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join preserves exact join multiplicity") {
    // hot key 'a' on the left, dimension-style right side
    val left = (Seq.fill(500)("a") ++ Seq("b", "b", "c")).zipWithIndex
      .toDF("k", "row_id")
    val right = Seq(("a", 10), ("b", 20), ("d", 40)).toDF("k", "v")

    val plain = left.join(right, Seq("k"))
    val salted = SkewJoin.saltedJoin(left, right, "k", "k", buckets = 8)

    assert(salted.count() === plain.count()) // 500 a's + 2 b's
    assert(salted.count() === 502)
    val sums = salted.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums === Map("a" -> 5000L, "b" -> 40L))
    // salt spreads the hot key across partitions: right side replicated 8x
    assert(salted.filter(col("k") === "c").count() === 0)
  }

  test("left joins keep unmatched rows exactly once") {
    val left = Seq(("a", 1), ("x", 2)).toDF("k", "row_id")
    val right = Seq(("a", 10)).toDF("k", "v")
    val out = SkewJoin.saltedJoin(left, right, "k", "k",
      buckets = 4, joinType = "left")
    assert(out.count() === 2)
    assert(out.filter(col("k") === "x").head().isNullAt(2))
  }
}

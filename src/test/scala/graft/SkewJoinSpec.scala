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

  test("right/full join types are rejected; left_anti is allowed and exact") {
    val left = Seq(("a", 1), ("x", 2), ("x", 3)).toDF("k", "row_id")
    val right = Seq(("a", 10)).toDF("k", "v")
    // right-preserving types would emit unmatched right rows once per
    // salt replica — the guard must refuse them
    for (bad <- Seq("right", "right_outer", "full", "full_outer", "cross")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(left, right, "k", "k", buckets = 4, joinType = bad)
      }
      assert(e.getMessage.contains("saltedJoin"), e.getMessage)
    }
    // anti join is left-preserving: every (key, salt) bucket holds a full
    // right replica, so a left row survives iff its key is absent
    val anti = SkewJoin.saltedJoin(left, right, "k", "k",
      buckets = 4, joinType = "left_anti")
    assert(anti.select("row_id").collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
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

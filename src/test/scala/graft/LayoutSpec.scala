package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zValue2: hand-computed interleave — x even bits, y odd bits") {
    val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 2L))
      .toDF("x", "y")
    val out = df.select(Layout.zValue2(col("x"), col("y"))).as[Long].collect()
    assert(out(0) === 7L)           // spread(3)=0b101, spread(1)<<1=0b10
    assert(out(1) === 0L)
    assert(out(2) === 0x55555555L)  // all even bits
    assert(out(3) === 0xAAAAAAAAL)  // all odd bits
    assert(out(4) === 9L)           // spread(1)=1 | spread(2)<<1=8
  }

  // 64×64 grid in ROW order — the layout a naive writer would land
  private lazy val grid =
    spark.range(64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))

  test("zorder files are bounded in BOTH dims at once") {
    // zShift 4: each file = 16 consecutive z values = one aligned 4×4
    // block — both dimensions bounded; a row-order chunk of 16 rows
    // spans 16 x-values (and a lexicographic layout prunes only its
    // leading column)
    val stats = Layout.zorderStats(grid, "x", "y", zShift = 4).collect()
    assert(stats.length === 256)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_rows") === 16L)
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3L, r)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3L, r)
    }
  }

  test("pruneFraction: a narrow x probe skips all but one block column") {
    val stats = Layout.zorderStats(grid, "x", "y", zShift = 4)
    // x ∈ [0,3] lies in block column 0: 16 of 256 files intersect
    val row = Layout.pruneFraction(stats, "x", 0L, 3L).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((256L, 240L, 937500L)))
    // and the same probe against y prunes symmetrically
    val rowY = Layout.pruneFraction(stats, "y", 60L, 63L).collect().head
    assert((rowY.getLong(0), rowY.getLong(1), rowY.getLong(2)) ===
      ((256L, 240L, 937500L)))
  }

  test("zValue2: out-of-range dimensions RAISE instead of aliasing") {
    // a negative long sets high bits straight through the spread masks
    // and 65536 aliases with 0 — both used to corrupt pruning stats
    // silently; now the row raises
    for (bad <- Seq(-1L, 65536L, 1L << 40)) {
      val e = intercept[Exception] {
        Seq((bad, 1L)).toDF("x", "y")
          .select(Layout.zValue2(col("x"), col("y"))).collect()
      }
      assert(e.getMessage.contains("65536"), s"for $bad: ${e.getMessage}")
    }
    // boundary values still pass
    val ok = Seq((0L, 65535L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"))).as[Long].collect()
    assert(ok.head === 0xAAAAAAAAL)
    // NULL dimensions pass through as NULL z (sparse/outer-joined
    // columns must not abort the stats job) — the pre-guard behavior
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(2L)))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y")).as("z"))
      .collect()
    assert(!withNull(0).isNullAt(0))
    assert(withNull(1).isNullAt(0))
  }

  test("pruneFraction: empty stats frame yields a defined 0, not NULL") {
    val empty = Layout.zorderStats(grid.filter(lit(false)), "x", "y", 4)
    val row = Layout.pruneFraction(empty, "x", 0L, 3L).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((0L, 0L, 0L)))
  }

  test("zorderEqualRowStats: balanced z-contiguous files, bounded both " +
      "dims, reproducible boundaries on a fixed landing") {
    // SKEWED input — 80% of rows crowd x ∈ [0, 8): fixed-width cells
    // would pile those into a handful of files; range boundaries adapt
    val skewed = spark.range(4096).select(
      when(col("id") % 5 < 4, col("id") % 8)
        .otherwise(col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"))
    val stats = Layout.zorderEqualRowStats(skewed, "x", "y", nFiles = 16)
      .collect()
    assert(stats.length === 16)
    // balance: every file within 2× of the ideal 256 rows despite skew
    stats.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(n >= 128L && n <= 512L, s"file imbalance: $r")
    }
    // z-contiguity: file z-ranges never overlap → both dims bounded
    val byZ = stats.sortBy(_.getAs[Long]("min_z"))
    byZ.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_z") <= b.getAs[Long]("min_z"),
          s"overlapping z ranges: $a / $b")
      case _ =>
    }
    // reproducibility: the SAME landing (data + partitioning) samples
    // the same boundaries — identical stats run over run
    val again = Layout.zorderEqualRowStats(skewed, "x", "y", nFiles = 16)
      .collect()
    assert(stats.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("mergeZorderStats: batch-split stats merge EXACTLY to the " +
      "single-pass table — the incremental pruning-stats update") {
    val batches = Seq(
      grid.filter(col("x") < 20), grid.filter(col("x") >= 20 && col("y") < 40),
      grid.filter(col("x") >= 20 && col("y") >= 40))
    val merged = Layout.mergeZorderStats(
        batches.map(Layout.zorderStats(_, "x", "y", zShift = 4)))
      .collect().map(_.toSeq).toSet
    val single = Layout.zorderStats(grid, "x", "y", zShift = 4)
      .collect().map(_.toSeq).toSet
    assert(merged === single)
  }

  test("zorderStats plan: one exchange, no sort, no window") {
    val plan = Layout.zorderStats(grid, "x", "y", zShift = 4)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"stats must be one partial-agg groupBy:\n$plan")
    assert(!plan.contains("Sort ") && !plan.contains("Window"),
      s"fixed-width cells need no global sort:\n$plan")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-ORDER
  * (Morton-curve) clustering behind Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order rewrite: interleave the bits of two dimension
  * keys so rows close in EITHER dimension land close in ONE linear
  * order, then land files along that order — per-file min/max ranges
  * come out narrow in BOTH dimensions at once, and a predicate on any
  * single dimension prunes most files. A lexicographic sort only ever
  * prunes its LEADING column; at 100 TB the difference is "read 2% of
  * files" vs "read everything" for the second dimension's queries.
  *
  * Everything here is exact int64 bit arithmetic (shift/and/or — fully
  * codegen'd, engine-portable for the oracles); no sampling, no
  * floating point, no data-dependent boundaries.
  */
object Layout {

  /** Morton z-value of two 16-bit dimension keys: bits of `x` on even
    * positions, bits of `y` on odd. Inputs must lie in [0, 65536) —
    * normalize upstream (mod, bucket, or rank). A Column can't be
    * range-checked at plan time, so the check rides the row: an
    * out-of-range dimension RAISES rather than silently aliasing into
    * another file cell (a negative long would set high bits straight
    * through the spread masks; ≥ 2^16 would collide with its low 16
    * bits — either corrupts min/max pruning stats invisibly).
    * The classic magic-number spread: 4 shift-and steps per operand,
    * one narrow projection — scan-speed at any scale.
    */
  def zValue2(x: Column, y: Column): Column =
    spread16(ranged(x)).bitwiseOR(shiftleft(spread16(ranged(y)), 1))

  /** Row-level range gate: NULL passes through as NULL (an unknown
    * dimension yields an unknown z — the pre-guard behavior; a sparse
    * or outer-joined column must not abort the whole stats job), in-
    * range values pass, anything else raises with the offending value
    * in the message. One comparison per dimension on the valid path —
    * the error branch never executes for in-contract data, so the
    * oracle SQL replays the unguarded arithmetic unchanged.
    */
  private def ranged(c: Column): Column = {
    val v = c.cast("long")
    when(v.isNull, lit(null).cast("long"))
      .when(v >= 0L && v < 65536L, v)
      .otherwise(
        raise_error(concat(
          lit("zValue2: dimension value "), v.cast("string"),
          lit(" outside [0, 65536) — normalize upstream"))).cast("long"))
  }

  /** Spread the low 16 bits of `c` to the even positions of a 32-bit
    * value: 0b1111 → 0b01010101.
    */
  private def spread16(c: Column): Column = {
    val v0 = c.cast("long")
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Assign each row to a z-contiguous FILE by fixed-width z-range
    * (file = z >> zShift) and report the per-file clustering stats a
    * data-skipping reader consults: (file_id, n_rows, min/max of both
    * dimensions). Fixed-width cells rather than equal-row-count
    * quantiles ON PURPOSE: the assignment is a narrow projection + ONE
    * partial-aggregated groupBy — no global sort, no sampled
    * boundaries, bit-deterministic for the oracle. In production the
    * equal-size variant is `df.withColumn("z", zValue2(x, y))
    * .repartitionByRange(nFiles, col("z")).write...` — same curve,
    * boundaries from Spark's range sampler; use it when file-size
    * uniformity matters more than replayable assignment (skewed
    * dimensions can crowd a fixed-width cell).
    */
  def zorderStats(
      df: DataFrame, xCol: String, yCol: String,
      zShift: Int): DataFrame = {
    require(zShift >= 0 && zShift < 32,
      s"zShift must be in [0, 32), got $zShift")
    df.withColumn("__z", zValue2(col(xCol), col(yCol)))
      .groupBy(shiftright(col("__z"), zShift).as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
  }

  /** The EQUAL-ROW-COUNT variant of [[zorderStats]] — the production
    * landing shape when file-size uniformity matters more than
    * replayable assignment: same Morton curve, but file boundaries
    * come from `repartitionByRange`'s reservoir sample over the
    * z-value instead of fixed-width cells, so a skewed dimension
    * can't crowd one cell (each output partition ≈ |df| / nFiles rows,
    * and `.write` after this repartition lands exactly one file per
    * range). Returns the per-file audit stats (file_id = the range
    * partition id): row count, z range, min/max of both dimensions.
    * Files are Z-CONTIGUOUS — their z ranges never overlap
    * (spec-pinned), so both dimensions stay bounded per file and a
    * data-skipping reader prunes on either.
    *
    * Determinism story, spec-pinned: the range sampler's seed derives
    * from the input partition index, so the SAME input (data AND
    * partitioning) yields the SAME boundaries run over run — the
    * layout is reproducible for a fixed landing. It is NOT invariant
    * under input repartitioning (a different partitioning resamples
    * different rows), which is why the fixed-width [[zorderStats]]
    * remains the engine-replayable oracle path and THIS is the
    * spec-gated production path — the trade documented at
    * [[zorderStats]].
    *
    * Shape: one narrow z projection, one range exchange (the write's
    * own repartition — the stats agg adds only an nFiles-row
    * exchange on top of per-partition partial aggregation).
    */
  def zorderEqualRowStats(
      df: DataFrame, xCol: String, yCol: String, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__z", zValue2(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .withColumn("file_id", spark_partition_id())
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__z")).as("min_z"), max(col("__z")).as("max_z"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
  }

  /** Merge [[zorderStats]] tables cell-by-cell — the mergeable-metrics
    * property the fixed-width layout gets FOR FREE (counts add,
    * min/max compose; the equal-row variant can't merge — its
    * boundaries are per-landing): per-batch stats tables union +
    * re-aggregate to exactly the single-pass table over everything
    * (spec-pinned identity, the histogram-sketch precedent). Old
    * state ∪ new batch is the incremental update — a 100 TB landing
    * keeps its pruning stats current per batch without ever
    * re-scanning data files.
    */
  def mergeZorderStats(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeZorderStats needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy("file_id")
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("min_x")).as("min_x"), max(col("max_x")).as("max_x"),
        min(col("min_y")).as("min_y"), max(col("max_y")).as("max_y"))
  }

  /** How much a one-dimension predicate could SKIP under this layout:
    * the fraction (in micro) of files whose [min, max] range on
    * `dimCol` ("x" or "y") misses the probe interval entirely. The
    * stats table is |files| rows — this is a driver-side-size
    * aggregation over it, the same check a reader's pruning pass does
    * per query.
    */
  def pruneFraction(
      stats: DataFrame, dim: String, lo: Long, hi: Long): DataFrame = {
    require(dim == "x" || dim == "y", s"dim must be 'x' or 'y', got $dim")
    require(lo <= hi, s"empty probe interval [$lo, $hi]")
    stats.agg(
      count(lit(1)).as("n_files"),
      // sum over zero rows is NULL — an empty stats frame must read as
      // 0 skipped, same as the division guard below
      coalesce(
        sum(when(col(s"max_$dim") < lo || col(s"min_$dim") > hi, 1L)
          .otherwise(0L)), lit(0L)).as("n_skipped"))
      .select(col("n_files"), col("n_skipped"),
        // an empty stats frame has nothing to prune: 0/0 is defined as
        // 0 skipped rather than a NULL (or an ANSI divide error)
        expr("CASE WHEN n_files = 0 THEN 0L" +
          " ELSE n_skipped * 1000000 DIV n_files END").as("skip_micro"))
  }
}

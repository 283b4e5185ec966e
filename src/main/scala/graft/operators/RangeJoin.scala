package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed genomic RANGE join (point-in-interval) — the operator
  * behind "which gene/regulatory region does each variant fall in".
  * Spark has no index nested-loop join, and a naive
  * `chrom = chrom AND pos BETWEEN start AND end` plans the inequality
  * as a per-chromosome broadcast-nested-loop — quadratic per chrom at
  * 100 TB. The standard distributed reduction: decompose intervals into
  * the fixed-width position buckets they span (explode — intervals are
  * the small side and grow by span/width rows only), bucket the point
  * side's position, and EQUI-join on (chrom, bucket) with the exact
  * range predicate applied in-join. Candidates per point are bounded by
  * interval-density × (width/bucket + 1); both sides shuffle once on
  * (chrom, bucket) — or zero times when the points land pre-bucketed
  * (`VcfReader.toBucketedTable`'s (chrom, pos_bucket) layout uses the
  * same `pos >> 20` bucket function at the default shift).
  */
object RangeJoin {

  /** Join `points` (chromCol, posCol, …) to every row of `intervals`
    * (chromCol, startCol, endCol, …) whose closed interval contains the
    * point. Output carries the point columns plus the interval's
    * non-join columns. `bucketShift` sets the bucket width (2^shift bp)
    * — match it to interval width (width ≈ bucket ⇒ ≤2 buckets per
    * interval); the default 20 (~1 Mb) matches the landing layout.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      chromCol: String = "chrom", posCol: String = "pos",
      startCol: String = "start", endCol: String = "end",
      bucketShift: Int = 20): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 32,
      s"bucketShift must be in [0, 32), got $bucketShift")
    val iv = intervals.withColumn("__b",
      explode(sequence(
        shiftright(col(startCol), bucketShift),
        shiftright(col(endCol), bucketShift))))
      .alias("i")
    val p = points
      .withColumn("__b", shiftright(col(posCol), bucketShift))
      .alias("p")
    p.join(iv,
        col(s"p.$chromCol") === col(s"i.$chromCol") &&
          col("p.__b") === col("i.__b") &&
          col(s"p.$posCol").between(col(s"i.$startCol"), col(s"i.$endCol")))
      .drop(col(s"i.$chromCol"))
      .drop(col("p.__b")).drop(col("i.__b"))
  }
}

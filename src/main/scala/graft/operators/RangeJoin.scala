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

  /** Interval-interval OVERLAP join (closed intervals; `left` carries
    * `startCol`/`endCol`, `right` carries `rStartCol`/`rEndCol` — the
    * caller renames so output columns cannot collide). Same bucket
    * decomposition as [[pointInInterval]], both sides exploded; each
    * overlapping pair is emitted EXACTLY once because only the bucket
    * containing `max(start_l, start_r)` emits it — that bucket lies in
    * both spans precisely when the intervals overlap (max(start) ≤
    * min(end)), so no downstream distinct is needed (a distinct would
    * be a second shuffle of the full pair stream).
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      chromCol: String = "chrom",
      startCol: String = "start", endCol: String = "end",
      rStartCol: String = "r_start", rEndCol: String = "r_end",
      bucketShift: Int = 20): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 32,
      s"bucketShift must be in [0, 32), got $bucketShift")
    def burst(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(
        shiftright(col(s), bucketShift), shiftright(col(e), bucketShift))))
    val l = burst(left, startCol, endCol).alias("l")
    val r = burst(right, rStartCol, rEndCol).alias("r")
    l.join(r,
        col(s"l.$chromCol") === col(s"r.$chromCol") &&
          col("l.__b") === col("r.__b") &&
          col(s"l.$startCol") <= col(s"r.$rEndCol") &&
          col(s"r.$rStartCol") <= col(s"l.$endCol") &&
          col("l.__b") === shiftright(
            greatest(col(s"l.$startCol"), col(s"r.$rStartCol")), bucketShift))
      .drop(col(s"r.$chromCol"))
      .drop(col("l.__b")).drop(col("r.__b"))
  }
}

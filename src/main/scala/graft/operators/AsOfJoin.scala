package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** As-of join: for each left row, the single most recent right row with
  * matching key and right_time <= left_time.
  *
  * Implementation: equi-join on the key with the time inequality as a
  * join predicate, then ONE aggregation taking max(struct(time, tiebreak,
  * payload…)) — lexicographic struct ordering makes the pick
  * deterministic under time ties, and the aggregate partial-merges
  * map-side (no window operator, no second shuffle). At warehouse scale
  * both sides hash-shuffle once on the key; AQE handles key skew.
  */
object AsOfJoin {

  /** @param payload (column, outName) right-side values to carry along
    *                with the picked row; emitted under outName.
    * @return left rows (only those with ≥1 match) + asof_time,
    *         asof_tiebreak + payload columns.
    */
  def lastBefore(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tiebreak: Column,
      payload: Seq[(Column, String)] = Seq.empty): DataFrame = {
    // Fully-duplicate left rows must each produce their own output row
    // (a multiplicity change an as-of join must not make), but a
    // `monotonically_increasing_id` row tag is NONDETERMINISTIC lineage:
    // the ids shift under AQE re-planning / partial stage retry, and the
    // nondeterministic marking blocks pushdown through the plan. So:
    // join + pick once per DISTINCT left row, then restore multiplicity
    // by joining the ORIGINAL left back on a null-safe equality over
    // every left column (<=> is a hash-join key, and groupBy already
    // treats nulls as equal, so the two passes agree on row identity).
    // Every key in the plan is a real data column; no per-row array of
    // duplicates is ever materialized, so a billion-copy hot row costs
    // a join fan-out, not one task's memory.
    val l = left.dropDuplicates()
      .withColumn("__lk", leftKey).withColumn("__lt", leftTime)
    val r = right.select(
      rightKey.as("__rk") +: rightTime.as("__rt") +: tiebreak.as("__tb") +:
        payload.map { case (c, n) => c.as(s"__p_$n") }: _*)
    val joined = l.join(r, col("__lk") === col("__rk") && col("__rt") <= col("__lt"))
    val pick = max(struct(
      col("__rt") +: col("__tb") +: payload.map { case (_, n) => col(s"__p_$n") }: _*))
      .as("__best")
    val leftCols = left.columns.map(col) :+ col("__lt")
    val picks = joined
      .groupBy(col("__lk") +: leftCols: _*)
      .agg(pick)
      .select(left.columns.map(col) ++ Seq(
        col("__best.__rt").as("asof_time"),
        col("__best.__tb").as("asof_tiebreak")) ++
        payload.map { case (_, n) => col(s"__best.__p_$n").as(n) }: _*)
      .alias("__pick")
    val orig = left.alias("__orig")
    val backCond = left.columns
      .map(c => col(s"__orig.$c") <=> col(s"__pick.$c")).reduce(_ && _)
    orig.join(picks, backCond, "inner")
      .select(left.columns.map(c => col(s"__orig.$c")) ++ Seq(
        col("__pick.asof_time"), col("__pick.asof_tiebreak")) ++
        payload.map { case (_, n) => col(s"__pick.$n") }: _*)
  }

  /** Same contract as [[lastBefore]], sort-based: union both sides tagged,
    * ONE shuffle on the key, then a running `last(right_value)` over
    * (key, time, tag) order. The join+agg variant materializes every
    * (left, earlier-right) pair before aggregating — O(left × history)
    * rows through the join; this variant is O(left + right) rows through
    * one sort, the scale-safe shape when right histories are long (the
    * 100 TB case: years of orders per customer). Right rows sort before
    * left rows at equal times (inclusive `<=`), and among tied right
    * rows ascending struct order makes `last` pick exactly
    * `max(struct(time, tiebreak, payload…))` — bit-identical to
    * [[lastBefore]] (AsOfJoinSpec proves equivalence on random data).
    */
  def lastBeforeSorted(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tiebreak: Column,
      payload: Seq[(Column, String)] = Seq.empty): DataFrame = {
    def dt(df: DataFrame, c: Column): DataType = df.select(c).schema.head.dataType
    // union needs one exact type per slot; date/timestamp/timestamp_ntz
    // mixes widen to timestamp (what the join version's `<=` coercion
    // does implicitly, interpreting NTZ wall-clock in the session TZ)
    val temporal = Set[DataType](DateType, TimestampType, TimestampNTZType)
    def widen(a: DataType, b: DataType): DataType =
      if (a == b) a
      else if (temporal(a) && temporal(b)) TimestampType
      else throw new IllegalArgumentException(
        s"asOf sorted variant needs union-compatible types, got $a vs $b")
    val keyT = widen(dt(left, leftKey), dt(right, rightKey))
    val timeT = widen(dt(left, leftTime), dt(right, rightTime))

    val rv = struct(
      rightTime.as("__rt") +: tiebreak.as("__tb") +:
        payload.map { case (c, n) => c.as(s"__p_$n") }: _*)
    // null-key/time rows can never match (SQL `<=`/`=` semantics); drop
    // them up front so the null partition can't cross-match in the window
    val l = left
      .where(leftKey.isNotNull && leftTime.isNotNull)
      .select(left.columns.map(col) ++ Seq(
        leftKey.cast(keyT).as("__k"), leftTime.cast(timeT).as("__t"),
        lit(1).as("__tag"), lit(null).cast(l_rvType(right, rv)).as("__rv")): _*)
    val r = right
      .where(rightKey.isNotNull && rightTime.isNotNull)
      .select(left.schema.fields.map(f =>
        lit(null).cast(f.dataType).as(f.name)) ++ Seq(
        rightKey.cast(keyT).as("__k"), rightTime.cast(timeT).as("__t"),
        lit(0).as("__tag"), rv.as("__rv")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__best", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1 && col("__best").isNotNull)
      .select(left.columns.map(col) ++ Seq(
        col("__best.__rt").as("asof_time"),
        col("__best.__tb").as("asof_tiebreak")) ++
        payload.map { case (_, n) => col(s"__best.__p_$n").as(n) }: _*)
  }

  private def l_rvType(right: DataFrame, rv: Column): DataType =
    right.select(rv).schema.head.dataType
}

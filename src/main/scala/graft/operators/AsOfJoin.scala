package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // Unique per-row id so fully-duplicate left rows each produce their
    // own output row (grouping by the left columns alone would collapse
    // them — a multiplicity change an as-of join must not make).
    val l = left.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__lk", leftKey).withColumn("__lt", leftTime)
    val r = right.select(
      rightKey.as("__rk") +: rightTime.as("__rt") +: tiebreak.as("__tb") +:
        payload.map { case (c, n) => c.as(s"__p_$n") }: _*)
    val joined = l.join(r, col("__lk") === col("__rk") && col("__rt") <= col("__lt"))
    val pick = max(struct(
      col("__rt") +: col("__tb") +: payload.map { case (_, n) => col(s"__p_$n") }: _*))
      .as("__best")
    val leftCols = left.columns.map(col) :+ col("__lt")
    joined
      .groupBy(col("__rid") +: col("__lk") +: leftCols: _*)
      .agg(pick)
      .select(left.columns.map(col) ++ Seq(
        col("__best.__rt").as("asof_time"),
        col("__best.__tb").as("asof_tiebreak")) ++
        payload.map { case (_, n) => col(s"__best.__p_$n").as(n) }: _*)
  }
}

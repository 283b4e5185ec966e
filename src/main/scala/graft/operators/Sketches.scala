package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the incremental-metrics layer of a
  * 100 TB pipeline: distinct counts you can keep updating WITHOUT ever
  * re-scanning history. A sketch table is (group keys, binary HLL
  * sketch); each new batch contributes its own (tiny) sketch rows, and
  * the union of sketches estimates the union of the underlying sets —
  * the algebraic property exact distinct counting lacks (counts don't
  * merge; sets would have to be re-unioned).
  *
  * Built on Spark's native Apache DataSketches HLL aggregates
  * (hll_sketch_agg / hll_union_agg / hll_sketch_estimate) — codegen'd
  * typed aggregates with map-side partial aggregation: one exchange of
  * per-group sketch bytes (≤ ~2^lgK per group), never the raw keys.
  *
  * Accuracy: standard HLL relative standard error ≈ 1.04/√2^lgK
  * (~1.6% at the lgK = 12 default); estimates are APPROXIMATE and the
  * merged estimate can differ slightly from the single-pass estimate
  * of the unioned data (the sketches pass through internal mode
  * promotions in a different order) — both bounds are spec-asserted.
  */
object Sketches {

  /** One batch → its per-group sketch rows: (byCols*, sketch binary).
    * Persist this next to the batch; it IS the incremental state.
    */
  def distinctSketch(
      df: DataFrame, keyCol: String, byCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    df.groupBy(byCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sketch"))
  }

  /** Union sketch tables group-by-group — the MERGE step: old state ∪
    * new batch (or N per-partition/per-day tables) in one aggregation
    * of sketch bytes. Output schema = input schema; merging is
    * associative, so any tree of merges lands on the same state.
    */
  def mergeSketches(tables: Seq[DataFrame], byCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeSketches needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(byCols.map(col): _*)
      .agg(expr("hll_union_agg(sketch, true)").as("sketch"))
  }

  /** Read the estimates off a sketch table: (byCols*, n_distinct). */
  def estimateDistinct(sketches: DataFrame, byCols: Seq[String]): DataFrame =
    sketches.select(byCols.map(col) :+
      expr("hll_sketch_estimate(sketch)").as("n_distinct"): _*)
}

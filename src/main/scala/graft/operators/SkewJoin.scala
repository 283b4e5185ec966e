package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose hot keys overwhelm a single
  * reducer (AQE's skew-join handles sort-merge cases at runtime; this
  * is the explicit variant for when you KNOW the hot keys — e.g. the
  * `chr1` partition of a genome, or a viral document's shingle).
  *
  * Left rows get a random salt in [0, buckets); the (small) right side
  * is replicated across all salt values. The join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers.
  * Row-multiplicity is preserved exactly (each left row joins the one
  * replica matching its salt).
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // Salting replicates the right side once per salt value, so only
    // left-preserving join types keep multiplicity exact; a right/full
    // outer join would emit unmatched right rows once per replica.
    // left_anti is exact too: each (key, salt) bucket sees a full right
    // replica, so a left row survives iff its key is absent from right.
    require(Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti join types, got '$joinType'")
    val salted = left
      .withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val replicated = right
      .withColumnRenamed(rightKey, leftKey)
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(leftKey, "__salt"), joinType)
      .drop("__salt")
  }
}

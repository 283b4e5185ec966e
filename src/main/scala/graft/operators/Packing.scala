package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: assign documents to
  * fixed token-budget packs (context windows) in a deterministic order.
  * A doc's pack is decided by where its shard-local running token count
  * STARTS (`cum_before div capacity`), so assignment is a pure function
  * of the data — stable across retries and partitioning, like
  * [[Sampling]]'s hash gate.
  *
  * Scale shape: the running sum windows WITHIN a shard key (language,
  * source, hash-bucket — whatever the caller shards by), so each shard
  * sorts independently — the same per-shard layout real packing jobs
  * use. A single global pack order would serialize the corpus through
  * one task; sharding is the distribution lever, and the shard key's
  * cardinality bounds parallelism.
  */
object Packing {

  def packByBudget(
      docs: DataFrame, shardCol: String, orderCol: String,
      tokens: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(!docs.columns.contains("n_tok") && !docs.columns.contains("pack_id"),
      "packByBudget emits n_tok and pack_id columns; rename the existing ones first")
    // NOTE: orderCol must be unique within a shard — a tied running-sum
    // order would make pack assignment partitioning-dependent
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__tok", tokens)
      .withColumn("__cum_before", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__cum_before div $capacity"))
      .drop("__cum_before")
      .withColumnRenamed("__tok", "n_tok")
  }
}

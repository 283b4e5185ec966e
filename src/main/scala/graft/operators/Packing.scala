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

  /** Mixing multiplier for [[packSequences]]' global token-stream
    * order (L'Ecuyer 1999's MRG32k3a component constant 40014 —
    * decorrelated from every other mixing round in [[Sampling]];
    * (p−1)·40014 ≈ 4.0e13 ≪ 2^63, exact in any engine). */
  val PackMult = 40014L

  /** The seed-selected second-round multiplier:
    * [[PackMult]]^((seed mod (p−1)) + 1) mod p, exact driver-side
    * modpow. seed = 0 degrades to plain [[PackMult]]; every value is
    * coprime to the prime modulus and < p, so the per-row products
    * stay < (p−1)² ≈ 1e18 < 2^63 — exact in any engine.
    */
  def seedMultiplier(seed: Long): Long = {
    val pm1 = Sampling.HashPrime - 1L
    val e = ((seed % pm1) + pm1) % pm1 + 1L
    BigInt(PackMult).modPow(BigInt(e), BigInt(Sampling.HashPrime)).toLong
  }

  /** PACK the tokenized corpus into FIXED-LENGTH training sequences —
    * the causal-LM data collator (the GPT-2/3 "concatenate and chunk"
    * layout; Brown et al. 2020 §2.3, Raffel et al. 2020 "pack until
    * full"): lay every doc's tokens end to end in a deterministic
    * seeded shuffle order and cut the stream every `seqLen` tokens.
    * Docs SPAN cuts — a doc contributes one slice to every sequence
    * it overlaps — so no sequence carries padding except the final
    * partial one. Returns the sequence-assembly INDEX, one row per
    * (sequence, doc slice):
    *
    *   seq_id   which training sequence (0-based)
    *   id       the contributing doc
    *   doc_off  0-based token offset of the slice within the doc
    *   seq_off  0-based token offset of the slice within the sequence
    *   len      slice length in tokens (≥ 1)
    *
    * Per sequence, slices tile [0, seqLen) exactly (the last sequence
    * tiles a prefix); per doc, slices tile [0, n_tokens) exactly —
    * both invariants spec-pinned. A training reader joins this index
    * back to the token store and assembles each sequence with zero
    * data movement beyond the slice reads. Zero-token docs carry no
    * tokens and are excluded.
    *
    * Determinism: the global order is an MCG chain over the id whose
    * second-round MULTIPLIER is seed-selected — [[PackMult]]^(seed+1)
    * mod p, a driver-side modpow — so every engine, retry, and
    * partitioning lays the same stream and a new seed gives an
    * unrelated epoch order (the multi-epoch reshuffle is
    * `seed = epoch`). The multiplier position is load-bearing: an
    * ADDITIVE seed (`(m1 + seed) * M`) shifts every key by the same
    * constant, and a constant shift mod p only ROTATES the circular
    * key order — consecutive seeds would replay the same stream cut
    * at a different point (caught by the seed spec on a fixture small
    * enough to miss the wrap). Changing the multiplier composes
    * multiplicatively and scrambles the order. Every power of
    * [[PackMult]] is coprime to the prime modulus, so each seed's
    * chain stays a bijection of [0, p) — distinct ids keep distinct
    * keys, no engine-dependent ties. Ids must be UNIQUE below
    * [[Sampling.HashPrime]] (the [[Sampling.shardShuffle]] contract):
    * duplicate ids share a key and their relative order — hence the
    * whole downstream layout — would be partitioning-dependent.
    *
    * Scale shape: the global token offset — the one inherently
    * sequential piece — is the [[Sampling.materializeMix]] TWO-PHASE
    * distributed prefix sum: docs land in `blocks` hash-order blocks,
    * block totals partial-aggregate (one small exchange), block
    * offsets are ONE window over the ≤`blocks`-row totals frame (the
    * only unpartitioned window, bounded by the parameter), and the
    * doc-level cumsum windows only within a block — partitions are
    * corpus/blocks-bounded, no single-task funnel. The sequence
    * fan-out is one generator whose width is the doc's own
    * ⌈n/seqLen⌉+1 bound; output size is Σn/seqLen + n_docs rows.
    */
  def packSequences(
      docs: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, seed: Long = 0L, blocks: Int = 1024): DataFrame = {
    require(seqLen >= 1L, s"seqLen must be >= 1, got $seqLen")
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    val blockWidth = (Sampling.HashPrime + blocks - 1) / blocks
    val m1 = pmod(pmod(col(idCol), lit(Sampling.HashPrime)) * lit(Sampling.HashMult),
      lit(Sampling.HashPrime))
    val key = pmod(m1 * lit(seedMultiplier(seed)), lit(Sampling.HashPrime))
    val d = docs
      .select(col(idCol), col(tokensCol).cast("long").as("__n"))
      .filter(col("__n") > 0L)
      .withColumn("__k", key)
      .withColumn("__blk", expr(s"__k DIV $blockWidth"))
    val blockTotals = d.groupBy(col("__blk"))
      .agg(sum(col("__n")).as("__bt"))
      .withColumn("__boff", coalesce(
        sum(col("__bt")).over(
          Window.orderBy(col("__blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bt")
    val wDoc = Window.partitionBy(col("__blk"))
      .orderBy(col("__k"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(blockTotals), Seq("__blk"))
      .withColumn("__off",
        col("__boff") + coalesce(sum(col("__n")).over(wDoc), lit(0L)))
      .select(col(idCol), col("__n"), col("__off"),
        explode(sequence(expr(s"__off DIV $seqLen"),
          expr(s"(__off + __n - 1) DIV $seqLen"))).as("seq_id"))
      .select(
        col("seq_id"),
        col(idCol),
        greatest(lit(0L), col("seq_id") * seqLen - col("__off"))
          .as("doc_off"),
        greatest(lit(0L), col("__off") - col("seq_id") * seqLen)
          .as("seq_off"),
        (least((col("seq_id") + 1L) * seqLen, col("__off") + col("__n")) -
          greatest(col("seq_id") * seqLen, col("__off"))).as("len"))
  }
}

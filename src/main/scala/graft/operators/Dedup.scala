package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, designed around
  * one principle: never compare all pairs. Every strategy reduces the
  * O(n²) problem to an equi-join on a derived key (content hash, shared
  * shingle, LSH band), which Spark executes as one shuffle each side —
  * linear in data size, and AQE handles the skewed-key tail.
  */
object Dedup {

  /** Stable content hash for exact dedup (md5 of the canonical text). */
  def contentHash(text: Column): Column = md5(text)

  /** Exact dedup: one row kept per distinct content hash (min of idCol
    * for determinism). Hash-shuffle on the digest — uniformly
    * distributed, no skew, scales linearly.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__h", contentHash(col(textCol)))
      .groupBy("__h")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__h")

  /** (id, shingle-hash) long table: the join substrate for jaccard and
    * minhash. Long form on purpose: explode the n-grams FIRST, then hash
    * each as a scalar codegen expression — hashing inside nested array
    * HOFs falls back to interpreted evaluation and was the dominant
    * bench cost. Distinct per doc.
    */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(wordNgrams(wsTokens(lower(cleanAscii(col(textCol)))), n)).as("s"))
      .select(col("id"), rollingHash(col("s")).as("sh"))
      .distinct()

  /** n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold).
    * Pairs are generated ONLY for docs sharing ≥1 shingle (equi-join on
    * the shingle hash), then |∩| counted and |∪| derived from per-doc
    * set sizes — no quadratic blowup; hot shingles are the skew to watch
    * (AQE skew-join handles, or cap shingle doc-frequency upstream).
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash + LSH candidate pairs: signature of 16 permutation-mins,
    * split into `bands` bands of 16/bands rows; docs sharing any band key
    * are candidates. One shuffle to group by (band index, band key) —
    * the classic sub-quadratic near-dup path at corpus scale.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int): DataFrame = {
    val rows = MinhashA.size / bands
    // long form: one aggregation computes all 16 permutation-mins as
    // scalar arithmetic over the exploded shingle table (fully codegen'd,
    // one shuffle) — the array-HOF formulation recomputed the shingle
    // pipeline per permutation, interpreted.
    val sig = shingleTable(df, idCol, textCol, n)
      .groupBy("id")
      .agg(
        min((col("sh") * MinhashA.head + MinhashB.head) % HashMod).as("m0"),
        MinhashA.indices.tail.map(j =>
          min((col("sh") * MinhashA(j) + MinhashB(j)) % HashMod).as(s"m$j")): _*)
    val banded = sig.select(
      col("id"),
      posexplode(array((0 until bands).map(b =>
        concat_ws("_", (0 until rows).map(r =>
          col(s"m${b * rows + r}")): _*)): _*))
        .as(Seq("band", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash per doc (token-level). Near-dup = hamming ≤ k over
    * candidate pairs; candidates at scale come from banding the simhash
    * bytes (same LSH-join shape as minhash).
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // long form again: explode tokens, hash scalar, one aggregation with
    // 32 conditional sums (bit votes), then assemble the bits.
    val tok = df
      .select(col(idCol).as("id"),
        explode(wsTokens(lower(cleanAscii(col(textCol))))).as("t"))
      .select(col("id"), rollingHash(col("t")).as("x"))
      .distinct()
    val votes = tok.groupBy("id").agg(
      sum(when(shiftright(col("x"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("v0"),
      (1 until 32).map(b =>
        sum(when(shiftright(col("x"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")): _*)
    votes.select(
      col("id"),
      (0 until 32).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32-bit hash into 4 bytes — two
    * docs within hamming ≤ 4-ish must share at least one byte-band
    * (pigeonhole) — equi-join on (band, byte), then exact hamming
    * filter. Same sub-quadratic join shape as minhash-LSH.
    */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sim = simhashTable(df, idCol, textCol)
    val banded = sim.select(
      col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(0xff)): _*))
        .as(Seq("band", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs within a blocking key (e.g. label,
    * LSH bucket): join on the block, cosine in-line, threshold filter.
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"), col(blockCol).as("blk"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col(blockCol).as("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over embedding columns (Array[Float]/Array[Double]).
  *
  * Dot/cosine/L2 are strict left-to-right folds in DOUBLE — deterministic
  * and engine-portable (the DuckDB oracle reproduces them exactly) —
  * implemented as native codegen expressions (graft.expressions
  * .VectorExprs). The previous HOF form (`aggregate(zip_with(...))`) was
  * NOT codegen'd — array HOFs are CodegenFallback — so every probe
  * comparison ran an interpreted fold; the native kernels are one static
  * call inside WholeStageCodegen, and cosine fuses its three sums into a
  * single pass.
  */
object Similarity {

  /** Σ a_i·b_i with a double accumulator in element order. */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExprs.cosine(a, b)

  /** Brute-force cosine top-k: every probe against the whole corpus.
    * The probe side is small by construction and broadcast, so the scan
    * side never shuffles — at 100 TB this is one pass over the corpus
    * per probe batch. Rank ties break on candidate id (deterministic).
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("cand_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cosine", cosine(col("cv"), col("pv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "cand_id", "rnk", "cosine")
  }

  /** HARD-NEGATIVE MINING for retrieval/embedding training (the
    * DPR/ANCE data step — Karpukhin et al. 2020, Xiong et al. 2021):
    * for each probe, the top-k most-similar candidates whose LABEL
    * DIFFERS from the probe's — the near-miss examples a contrastive
    * loss needs (random negatives are trivially separable; the model
    * only learns from negatives that LOOK like positives). Same-label
    * candidates and the probe itself are excluded BEFORE ranking, so
    * the k slots are all true negatives.
    *
    * This is the exact (brute-force) form — the auditable baseline
    * and the oracle target. At corpus scale the label filter composes
    * unchanged into the bucketed paths (IVF cell-restricted probes
    * [[ivfAssignTopN]] / LSH buckets): filter after the candidate
    * join, before the per-probe top-k. Probes are parameter-small
    * (the training batch being mined), so the broadcast side is the
    * probe set — the [[bruteForceTopK]] shape; the per-probe top-k
    * compiles to WindowGroupLimit (partial per-partition pre-reduce).
    * Determinism: cosine folds in index order (VectorExprs.dot) —
    * bit-identical doubles across engines; ties break by cand_id.
    */
  def hardNegatives(
      corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(labelCol).as("cand_label"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      col(labelCol).as("probe_label"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("cand_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("cand_id") =!= col("probe_id") &&
        col("cand_label") =!= col("probe_label"))
      .withColumn("cosine", cosine(col("cv"), col("pv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "probe_label", "cand_id", "cand_label", "rnk",
        "cosine")
  }

  /** MAXIMAL MARGINAL RELEVANCE reranking (Carbonell & Goldstein
    * 1998) — the diversity pass between retrieval and consumption
    * (RAG context assembly, dedup of a result page): a plain top-k
    * returns k paraphrases of the best hit; MMR greedily picks
    *
    *   argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * so each pick is relevant AND far from what is already chosen.
    * λ = 10⁶ is plain top-k by relevance; λ = 0 is pure diversity.
    *
    * Input is the per-probe CANDIDATE pool from a first-stage
    * retriever (parameter-small by contract — m ≈ tens per probe, the
    * [[bruteForceTopK]]/IVF/LSH output), NOT the corpus: the greedy
    * loop is k ROUNDS of candidate-pool-sized joins (each round one
    * co-keyed join to the selected set, one partial-agg max-penalty
    * groupBy, one per-probe WindowGroupLimit pick), so cost is
    * O(k·|probes|·m) rows — the corpus is never touched.
    *
    * Determinism: scores are exact int64 (λ_micro·rel_micro −
    * (10⁶−λ_micro)·pen_micro; penalties micro-floored cosines whose
    * doubles fold in index order), ties break by cand_id. Round 1 has
    * an empty penalty set and maximizes λ·rel alone (at λ = 0 that
    * degenerates to the id tiebreak — documented, spec-pinned).
    * Probes with fewer than k candidates return them all.
    */
  def mmrRerank(
      cands: DataFrame, k: Int, lambdaMicro: Long,
      probeCol: String = "probe_id", candCol: String = "cand_id",
      relCol: String = "rel_micro", vecCol: String = "cv",
      cutEvery: Int = 8, reliable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1000000], got $lambdaMicro")
    require(cutEvery >= 1, s"cutEvery must be >= 1, got $cutEvery")
    require(!reliable ||
      cands.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable = true needs spark.sparkContext.setCheckpointDir(...)")
    // k rounds each append joins to BOTH running frames — past
    // `cutEvery` rounds the lineage is cut (localCheckpoint, or the
    // checkpoint dir with reliable = true), the pageRankMicro
    // contract: deep reranks get bounded plans instead of an
    // analyzer blowup at k ≈ 64. r17: the candidate POOL is also cut
    // on every run (see below) — short runs are otherwise pure
    // declarative. localCheckpoint blocks live on executors, so any
    // cut run is non-recomputable after executor loss; reliable=true
    // remains the restartable path (the connectedComponents
    // contract).
    // r17 (guide §5.2): LAZY cuts — plan truncation is immediate but
    // materialization rides the caller's one action (no eager job per
    // cut)
    def cp(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(false) else df.localCheckpoint(false)
    val deep = k > cutEvery
    // the candidate pool is re-referenced by EVERY round's penalty +
    // score joins, so an un-cut pool subtree (q183: bruteForceTopK's
    // crossJoin + window + embedding join) re-ran once per reference —
    // cut it unconditionally; it is parameter-small by contract
    val base = cp(cands.select(col(probeCol).as("probe_id"),
      col(candCol).as("cand_id"), col(relCol).cast("long").as("rel_micro"),
      col(vecCol).as("__v")))
    val wPick = Window.partitionBy("probe_id")
      .orderBy(col("__score").desc, col("cand_id").asc)
    def top1(scored: DataFrame, rnk: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("probe_id"), col("cand_id"), col("rel_micro"), col("__v"),
        lit(rnk).as("rnk"))
    var selected = top1(
      base.withColumn("__score", col("rel_micro") * lit(lambdaMicro)), 1)
    var remaining = base.join(selected.select("probe_id", "cand_id"),
      Seq("probe_id", "cand_id"), "left_anti")
    for (r <- 2 to k) {
      val pen = remaining
        .join(selected.select(col("probe_id"), col("__v").as("__sv")),
          Seq("probe_id"))
        .groupBy("probe_id", "cand_id")
        .agg(max(floor(cosine(col("__v"), col("__sv")) * lit(1000000.0))
          .cast("long")).as("__pen"))
      val scored = remaining.join(pen, Seq("probe_id", "cand_id"))
        .withColumn("__score",
          col("rel_micro") * lit(lambdaMicro) -
            lit(1000000L - lambdaMicro) * col("__pen"))
      val picked = top1(scored, r)
      selected = selected.unionAll(picked)
      remaining = remaining.join(picked.select("probe_id", "cand_id"),
        Seq("probe_id", "cand_id"), "left_anti")
      // cut mid-run only — the final round stays lazy so the caller's
      // downstream plan composes (prior checkpoint blocks released by
      // the ContextCleaner as references drop)
      if (deep && r % cutEvery == 0 && r < k) {
        selected = cp(selected)
        remaining = cp(remaining)
      }
    }
    selected.select("probe_id", "cand_id", "rnk", "rel_micro")
  }

  /** Squared L2 distance, deterministic ordered fold. */
  def l2sq(a: Column, b: Column): Column = graft.expressions.VectorExprs.l2sq(a, b)

  /** IVF cell assignment: nearest centroid (L2, centroid-id tiebreak)
    * per vector — the coarse quantizer of an IVF index. Search = assign
    * the probe, scan only its cell (`nprobe=1`; widen by taking top-n
    * cells).
    *
    * The centroid set is collected to the driver (it is small by
    * definition — the same rows a join would broadcast) and the argmin
    * becomes ONE narrow projection: `least` over per-centroid
    * (distance, cid) structs, lexicographic struct order giving the
    * L2-then-cid tiebreak. Zero shuffle, fully codegen. The previous
    * cross-join + row_number-window formulation hash-shuffled the ENTIRE
    * corpus on the vector id just to reduce k rows back to one — a full
    * 100 TB exchange the plan gate now forbids.
    */
  /** Above this centroid count the inlined-literal plan gets unwieldy
    * (codegen method size, plan bytes shipped per task) and the
    * broadcast-join path wins despite its shuffle.
    */
  private[graft] val InlineCentroidLimit = 256

  def ivfAssign(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): DataFrame = {
    // NOTE: counting/collecting the centroid side runs a (tiny) job at
    // plan-build time — the training-loop semantics callers want:
    // centroid values freeze when the assignment is built.
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "ivfAssign needs at least one centroid")
    assignPlan(vecs, cents, centroids, idCol, vecCol, centIdCol, centVecCol,
      keepDist = false)
  }

  /** The shared assignment plan behind [[ivfAssign]] and the fused
    * training scan: inline argmin below [[InlineCentroidLimit]],
    * broadcast-join + per-physical-row top-1 above it. `keepDist = true`
    * additionally retains the winning squared distance as `__dist` —
    * the WCSS term [[kmeansStepWithObjective]] folds into its
    * aggregation so training needs no separate objective scan.
    */
  private def assignPlan(
      vecs: DataFrame, cents: Seq[(Long, Seq[Double])], centroids: DataFrame,
      idCol: String, vecCol: String, centIdCol: String, centVecCol: String,
      keepDist: Boolean): DataFrame = {
    if (cents.length <= InlineCentroidLimit) {
      val best = cents.map { case (cid, cv) =>
        struct(l2sq(col(vecCol), typedLit(cv)).as("d"), lit(cid).as("cid"))
      }.reduceLeft((a, b) => least(a, b))
      val base = Seq(col(idCol), col(vecCol), best.getField("cid").as("cell"))
      vecs.select(
        (if (keepDist) base :+ best.getField("d").as("__dist") else base): _*)
    } else {
      // big-nlist fallback: dedupe on the (id, vector) VALUE with a
      // multiplicity count, broadcast-join the centroids, take the
      // argmin as ONE grouped min over (d, cid) structs (same (dist,
      // cid) tiebreak as before), and restore each duplicate row by
      // exploding the count — one row per input row, exactly the
      // inline path's multiset. Row identity is never a synthetic
      // monotonically_increasing_id: a retry-shifted id can drop or
      // double rows through the top-1 filter, and downstream TRAINING
      // aggregations (kmeansStep means) would silently corrupt. The
      // exchange moves ~|vecs| (id, vec) rows — never |vecs|×k — and
      // the argmin agg reuses the dedupe's partitioning. (The count
      // casts to int: >2^31 copies of one exact (id, vector) pair is a
      // degenerate corpus whose group would OOM far earlier.)
      val grouped = vecs
        .groupBy(col(idCol), col(vecCol)).agg(count(lit(1)).as("__n"))
        .crossJoin(broadcast(centroids))
        .withColumn("__d", l2sq(col(vecCol), col(centVecCol)))
        .groupBy(col(idCol), col(vecCol), col("__n"))
        .agg(min(struct(col("__d").as("d"), col(centIdCol).as("cid"))).as("__best"))
        .withColumn("__dup", explode(array_repeat(lit(1), col("__n").cast("int"))))
      val base = Seq(col(idCol), col(vecCol), col("__best.cid").as("cell"))
      grouped.select((if (keepDist) base :+ col("__best.d").as("__dist") else base): _*)
    }
  }

  /** SemDeDup within-cell near-duplicate PAIRS (Abbas et al. 2023 —
    * the pair step of the q235 composition): over an [[ivfAssign]]ed
    * corpus, the (a, b) id pairs (a < b) whose cosine clears
    * `minCosMicro` (micro-floored — the engines' exact comparison
    * convention), joined ONLY within a cell — no all-pairs path
    * exists at any scale.
    *
    * `cellCap` (0 = off, the default — bit-identical to the inline
    * q235 spelling): within-cell pairs are QUADRATIC in cell size, so
    * ONE skewed giant cell (a near-duplicate-saturated crawl cluster,
    * or a too-small nlist) can dominate the whole job. Production
    * SemDeDup caps cluster size for exactly this reason; with
    * `cellCap = c > 0` each cell is split into deterministic id-order
    * sub-cells of at most `c` vectors (row_number over the cell, id
    * order) and pairs are restricted to a sub-cell — bounding
    * per-join-key work at c·(c−1)/2 at the documented cost of
    * MISSING cross-sub-cell duplicates (the same recall trade the
    * capped production variant makes; rows keep their `cell` so the
    * caller sees the split). Cost of the cap: the ranking window adds
    * one cell-keyed exchange+sort ahead of the (cell, sub)-keyed pair
    * join — worth it exactly when one cell's quadratic pair cost
    * dominates, which is when you reach for the cap.
    */
  def semDeDupPairs(
      assigned: DataFrame, minCosMicro: Long, cellCap: Int = 0,
      idCol: String = "vec_id", vecCol: String = "v",
      cellCol: String = "cell"): DataFrame = {
    require(cellCap >= 0, s"cellCap must be >= 0, got $cellCap")
    val withSub =
      if (cellCap == 0) assigned.withColumn("__sub", lit(0))
      else assigned.withColumn("__sub",
        ((row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(cellCol)).orderBy(col(idCol))) - 1)
          / cellCap).cast("int"))
    val a = withSub.select(col(cellCol), col("__sub"),
      col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = withSub.select(col(cellCol), col("__sub"),
      col(idCol).as("b_id"), col(vecCol).as("bv"))
    a.join(b, Seq(cellCol, "__sub"))
      .filter(col("a_id") < col("b_id"))
      .filter(floor(cosine(col("av"), col("bv")) * lit(1000000.0))
        .cast("long") >= lit(minCosMicro))
      .select(col(cellCol), col("a_id"), col("b_id"))
  }

  /** Scale path: random-hyperplane LSH bucket id (sign bits of `planes`
    * dot products packed into a long). Equal buckets → candidate set;
    * probe only its bucket instead of the corpus. Planes are fixed
    * literals so bucketing is reproducible.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      // same strict left-to-right fold as the old aggregate(zip_with(…))
      // form, but codegen'd (HOFs are CodegenFallback; this was the last
      // interpreted fold in the ANN path)
      val d = dot(vec, array(p.map(lit): _*))
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Top-n cell assignment for PROBES (`nprobe > 1` search): each input
    * row fans out to its n nearest cells. Narrow like [[ivfAssign]] —
    * per-centroid distances are inlined, ranked in a sorted struct
    * array, and the top n explode. Meant for the probe side (small);
    * corpus rows keep single-cell assignment.
    */
  def ivfAssignTopN(
      vecs: DataFrame, centroids: DataFrame, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): DataFrame = {
    require(nprobe > 0)
    val cents = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "ivfAssignTopN needs at least one centroid")
    val ranked = array_sort(array(cents.map { case (cid, cv) =>
      struct(l2sq(col(vecCol), typedLit(cv)).as("d"), lit(cid).as("cid"))
    }: _*))
    vecs
      .select(col(idCol), col(vecCol),
        explode(slice(ranked, 1, math.min(nprobe, cents.length))).as("__c"))
      .select(col(idCol), col(vecCol), col("__c.cid").as("cell"))
  }

  /** One Lloyd (k-means) iteration — how IVF centroids are actually
    * learned before [[ivfAssign]] serves queries: assign every vector to
    * its nearest centroid, re-estimate each centroid as the per-cell
    * per-dimension mean. Emitted long-form (cell, dim, n, c): the shape
    * that aggregates distributedly with ONE shuffle (groupBy cell+dim
    * after a narrow posexplode) and no array rebuild on the hot path.
    *
    * Determinism at scale: per-dim values are projected to decimal(18,6)
    * BEFORE summing (exact decimal addition — aggregation order can't
    * flip bits), and the mean is one IEEE divide of the rounded sum —
    * the same avg6 contract the relational oracles use, so the result is
    * bit-identical on any partitioning and in DuckDB.
    */
  def kmeansStep(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): DataFrame = {
    import graft.queries.QueryUtil.{avg6, dec}
    ivfAssign(vecs, centroids, idCol, vecCol, centIdCol, centVecCol)
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("cell"), (col("__p") + 1).as("dim"))
      .agg(count(lit(1)).as("n"), sum(dec(col("__x"))).as("__s"))
      .select(col("cell"), col("dim"), col("n"),
        avg6(col("__s"), col("n")).as("c"))
  }

  /** Widen a [[kmeansStep]] result back to (cid, cv) centroid vectors —
    * the feedback edge of the training loop. Small output (k rows); the
    * sort-by-dim array rebuild happens per cell, off the hot path.
    */
  def kmeansCentroids(step: DataFrame): DataFrame =
    step.groupBy(col("cell").as("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c")))),
        s => s("c")).as("cv"))

  /** [[kmeansStep]] fused with the k-means objective — ONE corpus scan
    * yields both. The same assignment the step aggregates over also
    * knows each vector's winning squared distance (the WCSS term of the
    * centroids it was assigned against); parking it on that vector's
    * dim-1 row counts it exactly once, so
    * `Σ qe  =  ivfQuantError(vecs, centroids)` up to double-summation
    * order (the identity [[kmeansTrain]] uses to halve its training
    * scans: the objective of round i's centroids falls out of round i's
    * step scan — no separate objective pass). Output is kmeansStep's
    * (cell, dim, n, c) plus `qe`, null off the dim-1 rows;
    * [[kmeansCentroids]] consumes it unchanged.
    */
  def kmeansStepWithObjective(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): DataFrame = {
    import graft.queries.QueryUtil.{avg6, dec}
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "kmeansStepWithObjective needs at least one centroid")
    assignPlan(vecs, cents, centroids, idCol, vecCol, centIdCol, centVecCol,
      keepDist = true)
      .select(col("cell"), col("__dist"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("cell"), (col("__p") + 1).as("dim"))
      .agg(count(lit(1)).as("n"), sum(dec(col("__x"))).as("__s"),
        sum(when(col("__p") === 0, col("__dist"))).as("qe"))
      .select(col("cell"), col("dim"), col("n"),
        avg6(col("__s"), col("n")).as("c"), col("qe"))
  }

  /** Total IVF quantization error `Σ_v min_c ‖v − c‖²` — the k-means
    * objective. Below [[InlineCentroidLimit]] it is ONE narrow codegen
    * scan (`least` over inlined per-centroid distances, the
    * [[ivfAssign]] shape with the distance kept instead of the id);
    * above it the same broadcast-join fallback as ivfAssign applies —
    * the per-(vec, centroid) distances min-aggregate on the vector id
    * (16-byte rows, one exchange, once per training round). Empty
    * input scores 0 (an empty set is perfectly quantized).
    */
  def ivfQuantError(
      vecs: DataFrame, centroids: DataFrame,
      vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): Double = {
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "ivfQuantError needs at least one centroid")
    val summed =
      if (cents.length <= InlineCentroidLimit) {
        val mind = cents.map { case (_, cv) => l2sq(col(vecCol), typedLit(cv)) }
          .reduceLeft((a, b) => least(a, b))
        vecs.select(mind.as("qe")).agg(sum(col("qe"))).collect()(0)
      } else {
        // dedupe on the vector VALUE with a multiplicity count and
        // weight each min term (duplicate vectors contribute qe × n,
        // every copy's term, exactly as the inline per-row sum) — a
        // synthetic row id here shifts under stage retry and silently
        // drops or doubles objective terms
        val centsDf = centroids.select(col(centVecCol).as("__cv"))
        vecs.groupBy(col(vecCol)).agg(count(lit(1)).as("__n"))
          .crossJoin(broadcast(centsDf))
          .select(col(vecCol), col("__n"), l2sq(col(vecCol), col("__cv")).as("__d"))
          .groupBy(col(vecCol), col("__n")).agg(min(col("__d")).as("__q"))
          .select((col("__q") * col("__n")).as("qe"))
          .agg(sum(col("qe"))).collect()(0)
      }
    if (summed.isNullAt(0)) 0.0 else summed.getDouble(0)
  }

  /** Train IVF centroids to CONVERGENCE — the production loop upstream
    * of [[ivfAssign]] serving: iterate [[kmeansStep]], freezing each
    * round's (driver-small) centroids, until the objective's relative
    * improvement drops below `relTol` or `maxIters` is hit. Returns the
    * BEST-objective centroids seen and the full objective history (seed
    * value first), so callers can log the curve and gate on it like the
    * specs do: a final round whose decimal-rounding drift nudges the
    * objective up is recorded in the history but its centroids are not
    * adopted. A cell that captures no vectors in a round keeps its
    * previous centroid (same contract as [[pqTrainStep]]'s empty
    * codewords) — k never silently shrinks. Each iteration costs ONE
    * fused corpus scan ([[kmeansStepWithObjective]]): the WCSS identity
    * means round i's scan yields both the objective of round i's
    * centroids (history entry i) and the re-estimation that becomes
    * round i+1's — maxIters+1 scans total where a separate
    * [[ivfQuantError]] pass per round paid 2·maxIters+1. Nothing
    * iterative lives on the executors.
    */
  def kmeansTrain(
      vecs: DataFrame, seeds: DataFrame,
      maxIters: Int = 10, relTol: Double = 1e-3,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): (DataFrame, Seq[Double]) = {
    require(maxIters >= 0 && relTol >= 0)
    val spark = vecs.sparkSession
    import spark.implicits._
    def freeze(cs: Seq[(Long, Seq[Double])]): DataFrame =
      cs.toDF(centIdCol, centVecCol)
    var cents = collectCents(seeds, centIdCol, centVecCol)
    require(cents.nonEmpty, "kmeansTrain needs at least one seed centroid")
    var cdf = freeze(cents)
    val hist = scala.collection.mutable.ListBuffer.empty[Double]
    var best = cdf
    var bestErr = Double.NaN
    var it = 0
    var stop = false
    while (!stop) {
      // one fused scan: objective of the CURRENT centroids + the Lloyd
      // re-estimation under them, collected together (k×d rows,
      // driver-small — the same rows kmeansCentroids would widen)
      val rows = kmeansStepWithObjective(
        vecs, cdf, idCol, vecCol, centIdCol, centVecCol)
        .select(col("cell"), col("dim"), col("c"), col("qe")).collect()
      val err = rows.iterator.filterNot(_.isNullAt(3)).map(_.getDouble(3)).sum
      if (it == 0) { bestErr = err; hist += err }
      else {
        if (err < bestErr) { best = cdf; bestErr = err }
        // decimal-rounded means can drift the objective by ~1e-6/dim, so
        // "no meaningful improvement" is the stop, not strict decrease
        stop = hist.last - err <= relTol * math.max(hist.last, Double.MinPositiveValue)
        hist += err
      }
      if (it == maxIters) stop = true
      if (!stop) {
        // widen the step rows driver-side (sort-by-dim per cell — what
        // kmeansCentroids does distributedly, on ≤ k×d collected rows)
        val learned = rows.groupBy(_.getLong(0)).map { case (cell, rs) =>
          cell -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        // empty cells keep their previous centroid — k never shrinks
        cents = cents.map { case (cid, cv) => cid -> learned.getOrElse(cid, cv) }
        cdf = freeze(cents)
        it += 1
      }
    }
    (best, hist.toSeq)
  }

  // ---- scalar (int8) quantization ------------------------------------

  /** Train per-dimension INT8 scalar-quantization bounds (the SQ8
    * compression rung BELOW the PQ family — 4× over float32 with a
    * trivially vectorizable decode; what FAISS calls
    * `ScalarQuantizer(QT_8bit)`): per-dim corpus min/max. Returns
    * (mins, maxs) — driver-small by PARAMETER (2·dim doubles, the
    * centroid/codebook class), and pure SELECTION (no arithmetic), so
    * the bounds are exact floats identical on any engine. One explode +
    * one partial-aggregated groupBy over the corpus; at 100 TB train on
    * a sample exactly as with k-means seeds.
    */
  def sqTrain(vecs: DataFrame, vecCol: String = "v"): (Seq[Double], Seq[Double]) = {
    val mm = vecs
      .select(posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .groupBy("__i")
      .agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(mm.nonEmpty, "sqTrain over an empty corpus")
    (mm.map(_._2).toSeq, mm.map(_._3).toSeq)
  }

  /** INT8 scalar-quantize a vector column against trained bounds:
    * code_d = clamp₂₅₅ ⌊(x − min_d)/scale_d + ½⌋ with
    * scale_d = (max_d − min_d)/255 (a constant-dim collapses to code
    * 0, reconstructing to min_d). Appends `code` (int64 array),
    * `recon` (the dequantized vector) and `err` (squared L2
    * reconstruction error via the codegen [[l2sq]] kernel — summed in
    * index order, engine-identical doubles).
    *
    * Scale shape: NARROW — the bounds ride as broadcast literals, the
    * encode is one projection (zero shuffles at any corpus size),
    * pushdown-transparent; recon/err exist for auditing and are
    * droppable columns, the stored artifact is (id, code) at 1/4 the
    * vector bytes. Half-up rounding is spelled ⌊x+½⌋ explicitly —
    * `round()`'s half-even vs half-away semantics differ across
    * engines (§5).
    */
  def sqEncode(
      vecs: DataFrame, idCol: String, vecCol: String,
      mins: Seq[Double], maxs: Seq[Double]): DataFrame = {
    require(mins.nonEmpty && mins.length == maxs.length,
      s"bad bounds: ${mins.length} mins vs ${maxs.length} maxs")
    require(mins.zip(maxs).forall { case (mn, mx) => mx >= mn },
      "max < min in sq bounds")
    val scales = mins.zip(maxs).map { case (mn, mx) => (mx - mn) / 255.0 }
    val minsL = typedLit(mins)
    val scalesL = typedLit(scales)
    val codes = transform(col(vecCol), (x, i) => {
      val mn = element_at(minsL, i + 1)
      val sc = element_at(scalesL, i + 1)
      when(sc === 0.0, lit(0L)).otherwise(
        least(lit(255L), floor((x - mn) / sc + lit(0.5)).cast("long")))
    })
    val recon = transform(col("code"), (c, i) =>
      element_at(minsL, i + 1) + c.cast("double") * element_at(scalesL, i + 1))
    vecs.select(col(idCol), col(vecCol), codes.as("code"))
      .withColumn("recon", recon)
      .withColumn("err",
        graft.expressions.VectorExprs.l2sq(col(vecCol), col("recon")))
  }

  // ---- product quantization ------------------------------------------

  /** PQ codebooks from a driver-small seed frame: codeword k of
    * subspace m = the m-th subvector of the k-th seed (sorted by id).
    * Real systems train each subspace with k-means ([[kmeansStep]] runs
    * per subspace unchanged); the seed form keeps the gate queries
    * deterministic, exactly like ivfAssign's seeded centroids.
    * Result shape: codebooks(m)(k) = codeword vector.
    */
  def pqCodebooks(
      seeds: DataFrame, m: Int,
      idCol: String = "vec_id", vecCol: String = "v"): Seq[Seq[Seq[Double]]] = {
    val rows = seeds
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).map(_._2)
    require(rows.nonEmpty, "pqCodebooks needs at least one seed vector")
    val d = rows.head.length
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = d / m
    (0 until m).map(mi => rows.map(v => v.slice(mi * sub, (mi + 1) * sub)).toSeq)
  }

  private def subVec(vec: Column, mi: Int, sub: Int): Column =
    slice(vec, mi * sub + 1, sub)

  /** Shared re-estimation step of every PQ Lloyd iteration: from
    * (m, k, dim, __r[, __n]) residual-component rows, decimal-exact
    * per-codeword means (per-dim values to decimal(18,6) before
    * summing, one IEEE divide — bit-deterministic and
    * oracle-replicable, the [[kmeansStep]] discipline); codewords that
    * captured no vectors keep their previous value. A `__n` column is
    * a row MULTIPLICITY weight (the vector-dedupe paths emit one row
    * per DISTINCT vector): decimal × integer is exact, so the weighted
    * sum equals the per-copy sum bit for bit.
    */
  private def booksFromResidRows(
      residRows: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] = {
    import graft.queries.QueryUtil.{avg6, dec}
    val m = codebooks.length
    val w: Column =
      if (residRows.columns.contains("__n")) col("__n") else lit(1L)
    val learned = residRows
      .groupBy("m", "k", "dim")
      .agg(sum(w).as("n"), sum(dec(col("__r")) * w).as("__s"))
      .select(col("m"), col("k"), col("dim"), avg6(col("__s"), col("n")).as("c"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues(_.map(r => r.getInt(2) -> r.getDouble(3)).sortBy(_._1).map(_._2).toSeq)
      .toMap
    (0 until m).map { mi =>
      codebooks(mi).zipWithIndex.map { case (old, k) =>
        learned.getOrElse((mi, k), old)
      }
    }
  }

  /** One Lloyd iteration over ALL PQ subspaces in a SINGLE corpus scan.
    *
    * The plan is LITERAL-FREE: the current books ride in as a broadcast
    * (m, k, codeword) frame, per-subspace argmins are a grouped
    * lexicographic `min` over (d, k) structs, and the vector posexplodes
    * ONCE into (subspace, codeword, dim, x) rows for one grouped
    * re-estimation — so every training iteration reuses the SAME
    * generated code (codebook VALUES change, the plan doesn't). The
    * previous inline formulation ([[pqTrainStepInline]], kept for the
    * parity spec) embedded each iteration's books as `typedLit`s: every
    * step was a fresh Catalyst analysis + Janino compile that could
    * never hit the generated-code cache — measured as the r7 driver
    * bench's q66/q69/q70 wall inflation (SURVEY §8 round-8). The price
    * is one bounded exchange of the TRAINING SAMPLE per iteration (a
    * vector-value dedupe whose partitioning the argmin agg reuses,
    * pre-reduced map-side) — training runs on a sample at 100 TB, so
    * cacheable plans win. Encode and search keep
    * their inline codegen shapes ([[pqEncode]], [[pqAdcTopK]]): their
    * books are fixed, so they compile once. Results are bit-identical
    * to the inline step (same distance fold, same (d, k) tiebreak, same
    * decimal means — spec-pinned).
    */
  def pqTrainStep(
      vecs: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "v"): Seq[Seq[Seq[Double]]] = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val spark = vecs.sparkSession
    import spark.implicits._
    val bdf = codebooks.zipWithIndex.flatMap { case (bk, mi) =>
      bk.zipWithIndex.map { case (cw, k) => (mi, k, cw) }
    }.toDF("__bm", "__bk", "__bcw")
    val aggs = (0 until m).map(mi =>
      min(when(col("__bm") === mi, struct(col("__d"), col("__bk"))))
        .getField("__bk").as(s"__c$mi"))
    val mCol = (col("__p") / sub).cast("int")
    // Per-vector identity = the vector VALUE plus a multiplicity count,
    // never a monotonically_increasing_id row tag: a synthetic id can
    // shift across partial stage retries, double-counting or splitting
    // a vector's contribution to the trained means — silent codebook
    // corruption. The dedupe groupBy is the plan's one sample exchange
    // (the argmin agg below reuses its partitioning), and the weighted
    // mean (decimal × integer, exact) restores each duplicate's full
    // influence bit for bit.
    val residRows = vecs
      .groupBy(col(vecCol)).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(bdf))
      .withColumn("__d", joinedSubDist(vecCol, sub))
      .groupBy(col(vecCol), col("__n"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), posexplode(col(vecCol)).as(Seq("__p", "__x")),
        array((0 until m).map(mi => col(s"__c$mi")): _*).as("__codes"))
      .select(mCol.as("m"),
        element_at(col("__codes"), mCol + 1).as("k"),
        (col("__p") % sub + 1).as("dim"), col("__x").as("__r"), col("__n"))
    booksFromResidRows(residRows, codebooks)
  }

  /** The original inlined-literal formulation of [[pqTrainStep]] — M
    * `least` chains over `typedLit` codewords in one narrow projection,
    * zero pre-aggregation shuffle. Retained ONLY as the parity oracle:
    * its plan embeds the books as literals, so a training LOOP pays a
    * fresh Janino compile per iteration (see [[pqTrainStep]]).
    */
  private[graft] def pqTrainStepInline(
      vecs: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "v"): Seq[Seq[Seq[Double]]] = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codeCols = (0 until m).map { mi =>
      codebooks(mi).zipWithIndex.map { case (cw, k) =>
        struct(l2sq(subVec(col(vecCol), mi, sub), typedLit(cw)).as("d"),
          lit(k).as("k"))
      }.reduceLeft((a, b) => least(a, b)).getField("k").as(s"__c$mi")
    }
    val mCol = (col("__p") / sub).cast("int")
    val residRows = vecs
      .select(col(vecCol) +: codeCols: _*)
      .select(posexplode(col(vecCol)).as(Seq("__p", "__x")),
        array((0 until m).map(mi => col(s"__c$mi")): _*).as("__codes"))
      .select(mCol.as("m"),
        element_at(col("__codes"), mCol + 1).as("k"),
        (col("__p") % sub + 1).as("dim"), col("__x").as("__r"))
    booksFromResidRows(residRows, codebooks)
  }

  /** PQ encoding — the 100 TB ANN memory story: each vector compresses
    * to M small codes (M bytes at K ≤ 256), so a billion-vector index
    * fits where raw floats never would. Per subspace the nearest
    * codeword is an inlined-literal argmin (`least` over (dist, k)
    * structs — the same narrow zero-shuffle shape as [[ivfAssign]]);
    * output carries only (id, code_0..code_{M-1}).
    */
  def pqEncode(
      vecs: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "v",
      keep: Seq[String] = Nil): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codeCols = (0 until m).map { mi =>
      codebooks(mi).zipWithIndex.map { case (cw, k) =>
        struct(l2sq(subVec(col(vecCol), mi, sub), typedLit(cw)).as("d"),
          lit(k).as("k"))
      }.reduceLeft((a, b) => least(a, b)).getField("k").as(s"code_$mi")
    }
    // `keep` carries index metadata (e.g. the IVF cell) through the
    // encode projection — still one narrow select, no join needed
    vecs.select(col(idCol) +: keep.map(col) ++: codeCols: _*)
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each
    * probe precomputes its M×K distance table ONCE (narrow, broadcast
    * with the probe), and the corpus scan reduces to M array lookups +
    * (M-1) adds per row — no float vector is ever read at search time.
    * Approximate L2 ranking; ties break on candidate id. The probe
    * side is broadcast, and the `rnk <= k` filter over row_number
    * triggers Spark's PARTIAL WindowGroupLimit below the exchange
    * (PlanSpec-pinned), so each map partition pre-reduces to k rows
    * per probe before the shuffle — the exchange moves at most
    * k·|probes| rows per input partition, never the cross-join.
    */
  def pqAdcTopK(
      codes: DataFrame, probes: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      k: Int, idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val dtCols = (0 until m).map { mi =>
      array(codebooks(mi).map(cw =>
        l2sq(subVec(col(vecCol), mi, sub), typedLit(cw))): _*).as(s"__dt$mi")
    }
    val p = probes.select(col(idCol).as("probe_id") +: dtCols: _*)
    // fixed left-to-right add order — deterministic, oracle-replicable
    val adc = (0 until m).map(mi =>
      element_at(col(s"__dt$mi"), col(s"code_$mi") + 1)).reduce(_ + _)
    val w = Window.partitionBy("probe_id").orderBy(col("adc").asc, col("cand_id").asc)
    codes.withColumnRenamed(idCol, "cand_id")
      .crossJoin(broadcast(p))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "cand_id", "rnk", "adc")
  }

  // ---- residual IVF+PQ ------------------------------------------------

  /** Per-cell SHIFTED codebooks — how residual PQ stays codegen-narrow:
    * encoding the residual `v − c[cell]` against codeword `r` minimizes
    * `‖(v − c) − r‖²  =  ‖v − (c + r)‖²`, so instead of materializing
    * residual vectors (an array-HOF subtraction on the corpus path —
    * CodegenFallback, the engine's banned pattern) each cell gets its
    * codewords PRE-SHIFTED by its centroid, and both encode and ADC run
    * the same inlined-literal argmin/table shapes as plain PQ on the
    * ORIGINAL vectors. Driver-side, tiny (nlist × M × K codewords).
    */
  private def shiftedBooks(
      cents: Seq[(Long, Seq[Double])],
      books: Seq[Seq[Seq[Double]]]): Map[Long, Seq[Seq[Seq[Double]]]] = {
    val sub = books.head.head.length
    cents.map { case (cid, cv) =>
      cid -> books.zipWithIndex.map { case (bk, mi) =>
        bk.map(cw => cw.zipWithIndex.map { case (x, d) => cv(mi * sub + d) + x })
      }
    }.toMap
  }

  private def collectCents(centroids: DataFrame, centIdCol: String,
      centVecCol: String): Seq[(Long, Seq[Double])] =
    centroids
      .select(col(centIdCol).cast("long"), col(centVecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** Collect a (small-by-contract) centroid frame to the driver ONCE —
    * the hoist for pipelines that feed the same centroids into several
    * operators. Every operator in this family re-collects its centroid
    * argument at plan-build time (the freeze-the-values training-loop
    * contract), and when that argument is a SOURCE-derived frame each
    * re-collect is a separate tiny job re-scanning the source: the
    * r17-measured q70 gate paid ~8 such jobs (assign, 3 train steps,
    * encode, probe assign, ADC — pure driver/scheduling wall, exec
    * ~4 core-s). Collect here once, re-wrap with [[centroidFrame]], and
    * every downstream plan-build collect resolves against the
    * LocalRelation driver-side — no job, no source re-scan, identical
    * values (this is also the freeze semantics made explicit).
    */
  def collectCentroids(centroids: DataFrame,
      centIdCol: String = "cid", centVecCol: String = "cv"): Seq[(Long, Seq[Double])] =
    collectCents(centroids, centIdCol, centVecCol)

  /** Re-wrap an already-collected centroid seq as a driver-local frame
    * (LocalRelation): the operators' internal plan-build collects and
    * broadcast fallbacks read it without launching a job. Column types
    * are the collected (long, array<double>) — what [[collectCentroids]]
    * casts to and what every inline path emits.
    */
  def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Long, Seq[Double])],
      centIdCol: String = "cid", centVecCol: String = "cv"): DataFrame = {
    import spark.implicits._
    cents.toDF(centIdCol, centVecCol)
  }

  /** The shifted codebooks as a broadcastable (cell, __bm, __bk, __bcw)
    * frame — the big-nlist twin of [[shiftedBooks]]' literal map.
    * nlist × M × K rows of sub-dim codewords: driver-small relative to
    * any corpus (a few MB even at nlist 65536, M 8, K 256), so it always
    * broadcasts. Above [[InlineCentroidLimit]] cells, the residual
    * family equi-joins this on `cell` instead of inlining a when-chain
    * whose generated code grows as nlist × M × K (the exact
    * codegen/constant-pool blowup the limit exists to prevent in
    * [[ivfAssign]]).
    */
  private def shiftedBookDf(
      spark: org.apache.spark.sql.SparkSession,
      sb: Map[Long, Seq[Seq[Seq[Double]]]]): DataFrame = {
    import spark.implicits._
    sb.toSeq.sortBy(_._1).flatMap { case (cid, books) =>
      books.zipWithIndex.flatMap { case (bk, mi) =>
        bk.zipWithIndex.map { case (cw, k) => (cid, mi, k, cw) }
      }
    }.toDF("cell", "__bm", "__bk", "__bcw")
  }

  /** Per joined (vector row × codeword row) subspace distance:
    * ‖v[sub m] − shifted codeword‖², with the subspace picked by the
    * codeword row's own `__bm`. Same fold (and bits) as the inline
    * path's `l2sq(subVec(v, mi, sub), literal)`; `slice` with a column
    * start stays codegen'd.
    */
  private def joinedSubDist(vecCol: String, sub: Int): Column =
    graft.expressions.VectorExprs.l2sq(
      slice(col(vecCol), col("__bm") * sub + 1, lit(sub)), col("__bcw"))

  /** RESIDUAL PQ encoding: vectors (already carrying their [[ivfAssign]]
    * `cell`) encode against their cell's shifted codebooks. The codes
    * approximate `v ≈ c[cell] + r[code]`, the layout every production
    * IVF+PQ index uses because residuals cluster far tighter than raw
    * vectors (quantization error drops at the same M×K budget).
    *
    * Up to `inlineLimit` cells this is one narrow projection — a
    * `when`-chain over cells of inlined argmins, zero shuffle. Above it
    * (production nlist ≥ 1024) the shifted codewords become a BROADCAST
    * (cell, m, k, codeword) frame equi-joined on `cell`, and the
    * per-subspace argmin a grouped `min` over (d, k) structs — the same
    * lexicographic distance-then-k tiebreak as the inline `least`, and
    * the same fallback shape as [[ivfAssign]]'s. One bounded exchange
    * (the per-row argmin aggregation, pre-reduced map-side); the corpus
    * never shuffles before the join.
    */
  def pqEncodeResidual(
      vecsWithCell: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv",
      inlineLimit: Int = InlineCentroidLimit): DataFrame = {
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "pqEncodeResidual needs at least one centroid")
    val sb = shiftedBooks(cents, codebooks)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    if (cents.length <= inlineLimit) {
      val codeCols = (0 until m).map { mi =>
        def argmin(cid: Long): Column =
          sb(cid)(mi).zipWithIndex.map { case (cw, k) =>
            struct(l2sq(subVec(col(vecCol), mi, sub), typedLit(cw)).as("d"),
              lit(k).as("k"))
          }.reduceLeft((a, b) => least(a, b)).getField("k")
        cents.tail.foldLeft(
          when(col("cell") === cents.head._1, argmin(cents.head._1))) {
          case (w, (cid, _)) => w.when(col("cell") === cid, argmin(cid))
        }.as(s"code_$mi")
      }
      vecsWithCell.select(col(idCol) +: col("cell") +: codeCols: _*)
    } else {
      val aggs = (0 until m).map(mi =>
        min(when(col("__bm") === mi, struct(col("__d"), col("__bk"))))
          .getField("__bk").as(s"code_$mi"))
      // (id, cell, vector)-value dedupe with multiplicity restore — no
      // synthetic row id (see ivfAssign's fallback for the retry
      // argument); duplicates re-emit as identical code rows, the
      // inline path's exact multiset
      vecsWithCell
        .groupBy(col(idCol), col("cell"), col(vecCol))
        .agg(count(lit(1)).as("__n"))
        // LEFT join: a row whose cell is not in the centroid set keeps
        // its row with null codes, exactly like the inline when-chain
        // (an inner join would silently drop it)
        .join(broadcast(shiftedBookDf(vecsWithCell.sparkSession, sb)),
          Seq("cell"), "left")
        .withColumn("__d", joinedSubDist(vecCol, sub))
        .groupBy(col(idCol), col("cell"), col(vecCol), col("__n"))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("__dup", explode(array_repeat(lit(1), col("__n").cast("int"))))
        .select(col(idCol) +: col("cell") +:
          (0 until m).map(mi => col(s"code_$mi")): _*)
    }
  }

  /** One Lloyd iteration over RESIDUAL PQ codebooks, all subspaces in a
    * SINGLE corpus scan — [[pqTrainStep]]'s shape lifted into residual
    * space without ever materializing a residual vector: the per-subspace
    * assignment argmins run against each cell's SHIFTED codewords
    * (`‖(v−c)−r‖ = ‖v−(c+r)‖`, the [[pqEncodeResidual]] trick) on the
    * ORIGINAL vectors, and the re-estimation mean subtracts the centroid
    * component per exploded scalar (`x − c[cell][p]`, a when-chain over
    * inlined centroid literals) — both stay inside WholeStageCodegen.
    * Decimal-exact means as everywhere (per-dim residuals to
    * decimal(18,6) before summing, one IEEE divide) so the trained books
    * are bit-deterministic and the DuckDB oracle replays every iteration.
    * Codewords that captured no vectors keep their previous value.
    *
    * `inlineLimit` DEFAULTS TO 0 — training always runs the broadcast
    * shifted-codeword frame, whose plan is literal-free and therefore
    * identical across iterations (one Janino compile for the whole
    * training loop; the inline when-chains embed each iteration's books
    * as literals and recompile every step — the r7 q69/q70 driver-bench
    * wall inflation, SURVEY §8 round-8). Encode/search keep the inline
    * default ([[InlineCentroidLimit]]): their books are fixed per index.
    * Both branches are bit-identical (spec-pinned); pass a large
    * `inlineLimit` to force the inline path.
    */
  def pqTrainStepResidual(
      vecsWithCell: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv",
      inlineLimit: Int = 0): Seq[Seq[Seq[Double]]] = {
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "pqTrainStepResidual needs at least one centroid")
    val sb = shiftedBooks(cents, codebooks)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val mCol = (col("__p") / sub).cast("int")
    // both branches produce the same residual rows — inline via
    // when-chains of literals, big-nlist via the broadcast
    // shifted-codeword frame (argmin as a grouped min over (d, k)
    // structs after a (cell, vector)-value dedupe with multiplicity
    // counts) plus a broadcast centroid join for the `x − c[cell][p]`
    // component; the grouped decimal mean below is shared (weighted by
    // the counts), so trained books are bit-identical across paths
    val residRows = if (cents.length <= inlineLimit) {
      val codeCols = (0 until m).map { mi =>
        def argmin(cid: Long): Column =
          sb(cid)(mi).zipWithIndex.map { case (cw, k) =>
            struct(l2sq(subVec(col(vecCol), mi, sub), typedLit(cw)).as("d"),
              lit(k).as("k"))
          }.reduceLeft((a, b) => least(a, b)).getField("k")
        cents.tail.foldLeft(
          when(col("cell") === cents.head._1, argmin(cents.head._1))) {
          case (w, (cid, _)) => w.when(col("cell") === cid, argmin(cid))
        }.as(s"__c$mi")
      }
      // residual component at exploded position __p: x − centroid[cell][p]
      val centComp = cents.tail.foldLeft(
        when(col("cell") === cents.head._1,
          element_at(typedLit(cents.head._2), col("__p") + 1))) {
        case (w, (cid, cv)) =>
          w.when(col("cell") === cid, element_at(typedLit(cv), col("__p") + 1))
      }
      vecsWithCell
        .select(col(vecCol) +: col("cell") +: codeCols: _*)
        .select(col("cell"),
          posexplode(col(vecCol)).as(Seq("__p", "__x")),
          array((0 until m).map(mi => col(s"__c$mi")): _*).as("__codes"))
        .select(mCol.as("m"),
          element_at(col("__codes"), mCol + 1).as("k"),
          (col("__p") % sub + 1).as("dim"),
          (col("__x") - centComp).as("__r"))
    } else {
      val aggs = (0 until m).map(mi =>
        min(when(col("__bm") === mi, struct(col("__d"), col("__bk"))))
          .getField("__bk").as(s"__c$mi"))
      // from the already-collected driver-small seq, NOT the centroids
      // DataFrame — re-planning that would re-scan its source per
      // iteration (and the values are already in hand)
      val spark0 = vecsWithCell.sparkSession
      import spark0.implicits._
      val centDf = cents.toDF("cell", "__ccv")
      // vector-value + multiplicity identity, not a synthetic row id —
      // see pqTrainStep: retry-shifted ids silently corrupt the means.
      // `cell` is a deterministic function of the vector, so grouping
      // on (cell, vector) is the per-distinct-vector dedupe.
      vecsWithCell
        .groupBy(col("cell"), col(vecCol)).agg(count(lit(1)).as("__n"))
        .join(broadcast(shiftedBookDf(vecsWithCell.sparkSession, sb)), "cell")
        .withColumn("__d", joinedSubDist(vecCol, sub))
        .groupBy(col("cell"), col(vecCol), col("__n"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("cell"), col("__n"),
          posexplode(col(vecCol)).as(Seq("__p", "__x")),
          array((0 until m).map(mi => col(s"__c$mi")): _*).as("__codes"))
        .join(broadcast(centDf), "cell")
        .select(mCol.as("m"),
          element_at(col("__codes"), mCol + 1).as("k"),
          (col("__p") % sub + 1).as("dim"),
          (col("__x") - element_at(col("__ccv"), col("__p") + 1)).as("__r"),
          col("__n"))
    }
    booksFromResidRows(residRows, codebooks)
  }

  /** Total residual quantization error `Σ_v Σ_m min_k ‖(v−c[cell])−r_k‖²`
    * under the given residual books — the Lloyd training objective,
    * computed via shifted codewords on the ORIGINAL vectors (no residual
    * materialization). The training diagnostic: each
    * [[pqTrainStepResidual]] must not increase it (assignment and mean
    * steps each minimize it; the decimal-rounded mean can drift it by at
    * most ~1e-6 per dim). Like the train step, `inlineLimit` defaults to
    * 0: the diagnostic runs inside training loops against CHANGING books,
    * so the literal-free broadcast-frame plan (one compile, reused every
    * iteration) beats the inline scan that recompiles per call.
    */
  def pqResidualQuantError(
      vecsWithCell: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]],
      vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv",
      inlineLimit: Int = 0): Double = {
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "pqResidualQuantError needs at least one centroid")
    val sb = shiftedBooks(cents, codebooks)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val summed =
      if (cents.length <= inlineLimit) {
        val dCols = (0 until m).map { mi =>
          def mind(cid: Long): Column =
            sb(cid)(mi).map(cw => l2sq(subVec(col(vecCol), mi, sub), typedLit(cw)))
              .reduceLeft((a, b) => least(a, b))
          cents.tail.foldLeft(
            when(col("cell") === cents.head._1, mind(cents.head._1))) {
            case (w, (cid, _)) => w.when(col("cell") === cid, mind(cid))
          }
        }
        vecsWithCell.select(dCols.reduce(_ + _).as("qe"))
          .agg(sum(col("qe"))).collect()(0)
      } else {
        // big-nlist fallback: per-(vector × codeword) distances via the
        // broadcast shifted-codeword frame, min per subspace grouped on
        // the vector VALUE with a multiplicity count (duplicate vectors
        // contribute qe × count — each copy's full term, like the
        // inline path; a synthetic row id here would shift under stage
        // retry and drop/double terms)
        val aggs = (0 until m).map(mi =>
          min(when(col("__bm") === mi, col("__d"))).as(s"__q$mi"))
        vecsWithCell
          .groupBy(col("cell"), col(vecCol)).agg(count(lit(1)).as("__n"))
          .join(broadcast(shiftedBookDf(vecsWithCell.sparkSession, sb)), "cell")
          .select(col("cell"), col(vecCol), col("__n"), col("__bm"),
            joinedSubDist(vecCol, sub).as("__d"))
          .groupBy(col("cell"), col(vecCol), col("__n"))
          .agg(aggs.head, aggs.tail: _*)
          .select(((0 until m).map(mi => col(s"__q$mi")).reduce(_ + _) *
            col("__n")).as("qe"))
          .agg(sum(col("qe"))).collect()(0)
      }
    if (summed.isNullAt(0)) 0.0 else summed.getDouble(0)
  }

  /** Seed residual codebooks — the residual-space analogue of
    * [[pqCodebooks]], shared by the q69/q70 gates and their specs so
    * the construction cannot drift between operator, oracle, and spec:
    * each seed vector's codeword is its residual vs its OWN cell's
    * centroid (`seed − c[cell]`), seeds ordered by id, M subspaces.
    */
  def seedResidualBooks(
      seeds: DataFrame, centroids: DataFrame, m: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv"): Seq[Seq[Seq[Double]]] = {
    val centMap = collectCents(centroids, centIdCol, centVecCol).toMap
    val seedRows = ivfAssign(seeds, centroids, idCol, vecCol, centIdCol, centVecCol)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
      .sortBy(_._1)
    require(seedRows.nonEmpty, "seedResidualBooks needs at least one seed vector")
    val d = seedRows.head._2.length
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = d / m
    (0 until m).map { mi =>
      seedRows.toSeq.map { case (_, v, cell) =>
        val c = centMap(cell)
        (mi * sub until (mi + 1) * sub).map(i => v(i) - c(i)): Seq[Double]
      }
    }
  }

  /** ADC top-k over a RESIDUAL-encoded corpus, restricted to each
    * probe's cells: per (probe, cell) row the M×K distance table is
    * computed against that cell's shifted codewords, so the looked-up
    * sum approximates `‖probe − (c[cell] + r[code])‖²` — true IVF+PQ
    * asymmetric distance. Same broadcast equi-join on `cell` and
    * partial-WindowGroupLimit shape as [[pqAdcTopKInCells]]; the corpus
    * never re-shuffles.
    */
  def pqAdcTopKResidual(
      codes: DataFrame, probes: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], k: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv",
      inlineLimit: Int = InlineCentroidLimit): DataFrame = {
    val cents = collectCents(centroids, centIdCol, centVecCol)
    require(cents.nonEmpty, "pqAdcTopKResidual needs at least one centroid")
    val sb = shiftedBooks(cents, codebooks)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val nK = codebooks.head.length
    // both branches build the same per-(probe, cell) ADC tables; above
    // inlineLimit they come from joining the probe side (tiny) against
    // the broadcast shifted-codeword frame and aggregating into one
    // map<m·K + k, d> per (probe, cell) — the corpus-side lookup and
    // everything below the broadcast is identical, so ranks match the
    // inline path bit for bit
    val p = if (cents.length <= inlineLimit) {
      val dtCols = (0 until m).map { mi =>
        def dt(cid: Long): Column =
          array(sb(cid)(mi).map(cw =>
            l2sq(subVec(col(vecCol), mi, sub), typedLit(cw))): _*)
        cents.tail.foldLeft(
          when(col("cell") === cents.head._1, dt(cents.head._1))) {
          case (w, (cid, _)) => w.when(col("cell") === cid, dt(cid))
        }.as(s"__dt$mi")
      }
      probes.select(col(idCol).as("probe_id") +: col("cell") +: dtCols: _*)
    } else {
      probes
        .select(col(idCol).as("probe_id"), col("cell"), col(vecCol))
        .join(broadcast(shiftedBookDf(probes.sparkSession, sb)), "cell")
        .select(col("probe_id"), col("cell"),
          (col("__bm") * nK + col("__bk")).as("__mk"),
          joinedSubDist(vecCol, sub).as("__d"))
        .groupBy(col("probe_id"), col("cell"))
        .agg(map_from_entries(collect_list(struct(col("__mk"), col("__d"))))
          .as("__dt"))
    }
    val adc =
      if (cents.length <= inlineLimit)
        (0 until m).map(mi =>
          element_at(col(s"__dt$mi"), col(s"code_$mi") + 1)).reduce(_ + _)
      else
        (0 until m).map(mi =>
          element_at(col("__dt"), lit(mi * nK) + col(s"code_$mi"))).reduce(_ + _)
    val w = Window.partitionBy("probe_id").orderBy(col("adc").asc, col("cand_id").asc)
    codes.withColumnRenamed(idCol, "cand_id")
      .join(broadcast(p), "cell")
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "cand_id", "rnk", "adc")
  }

  /** End-to-end trained IVF+PQ index build — the one-call production
    * recipe composing the trained pieces in order: [[kmeansTrain]] the
    * coarse quantizer from `seeds` to convergence, [[ivfAssign]] the
    * corpus, seed ([[seedResidualBooks]]) and Lloyd-train
    * ([[pqTrainStepResidual]]) the residual codebooks, then
    * [[pqEncodeResidual]] the corpus. Returns
    * (centroids, residual books, encoded corpus) — everything search
    * needs: probes go through [[ivfAssignTopN]] + [[pqAdcTopKResidual]].
    * Every stage is the individually-gated operator; this is only the
    * composition. Train on a SAMPLE at 100 TB (centroids and books are
    * driver-small either way); only the final encode scans the corpus.
    */
  def ivfPqBuild(
      vecs: DataFrame, seeds: DataFrame, bookSeeds: DataFrame, m: Int,
      kmeansIters: Int = 5, pqIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "v",
      centIdCol: String = "cid", centVecCol: String = "cv",
      persistCodes: Boolean = true)
      : (DataFrame, Seq[Seq[Seq[Double]]], DataFrame) = {
    val (cents, _) = kmeansTrain(vecs, seeds, kmeansIters,
      idCol = idCol, vecCol = vecCol, centIdCol = centIdCol, centVecCol = centVecCol)
    // the assignment is scanned by EVERY training iteration and the
    // final encode — persisted once here so pqIters iterations cost
    // pqIters aggregations over the cached (id, v, cell) rows, not
    // pqIters+1 recomputations of the assignment over `vecs` (spills to
    // disk if the corpus outgrows executor memory; it stays cached for
    // the returned encode's consumer to materialize from)
    val asg = ivfAssign(vecs, cents, idCol, vecCol, centIdCol, centVecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var books = seedResidualBooks(bookSeeds, cents, m,
      idCol, vecCol, centIdCol, centVecCol)
    for (_ <- 0 until pqIters)
      books = pqTrainStepResidual(asg, cents, books,
        idCol, vecCol, centIdCol, centVecCol)
    // Release the assignment cache either way — it is a build-time
    // intermediate, not an output, and repeated builds in one session
    // must not accumulate cached corpora. persistCodes=true (default):
    // the encode materializes through the still-warm assignment and
    // the returned `codes` frame IS the persisted index — the ONE
    // handle a caller holds for the index's lifetime and unpersists to
    // release (an index is built to be probed repeatedly; a throwaway
    // build should pass false). persistCodes=false: nothing stays
    // cached — the lazy encode recomputes the assignment once when the
    // consumer materializes it (the narrow ivfAssign argmin, no
    // shuffle), and the training-loop caching win is unaffected.
    val lazyCodes = pqEncodeResidual(asg, cents, books,
      idCol, vecCol, centIdCol, centVecCol)
    val codes = if (persistCodes) {
      val c = lazyCodes
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    } else lazyCodes
    asg.unpersist(blocking = false)
    (cents, books, codes)
  }

  /** IVF+PQ composed search — the standard billion-vector production
    * layout: IVF bounds the SCAN (only the probe's `nprobe` cells of
    * the corpus are touched), PQ bounds the MEMORY (M code bytes per
    * corpus vector at search time). `codes` is the PQ-encoded corpus
    * carrying its [[ivfAssign]] `cell`; `probes` is one row per
    * (probe, cell) from [[ivfAssignTopN]]. The probe side — with its
    * per-probe M×K ADC distance tables — broadcasts into an equi-join
    * ON `cell`, so the corpus never re-shuffles (same zero-corpus-
    * exchange shape as the plain IVF search), and the `rnk <= k`
    * row_number filter pre-reduces below the one probe-keyed exchange
    * via partial WindowGroupLimit (same as [[pqAdcTopK]]).
    */
  def pqAdcTopKInCells(
      codes: DataFrame, probes: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      k: Int, idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val dtCols = (0 until m).map { mi =>
      array(codebooks(mi).map(cw =>
        l2sq(subVec(col(vecCol), mi, sub), typedLit(cw))): _*).as(s"__dt$mi")
    }
    val p = probes.select(
      col(idCol).as("probe_id") +: col("cell") +: dtCols: _*)
    val adc = (0 until m).map(mi =>
      element_at(col(s"__dt$mi"), col(s"code_$mi") + 1)).reduce(_ + _)
    val w = Window.partitionBy("probe_id").orderBy(col("adc").asc, col("cand_id").asc)
    // a corpus vector lives in exactly ONE cell, so the equi-join emits
    // each (probe, candidate) pair at most once — no dedup needed
    codes.withColumnRenamed(idCol, "cand_id")
      .join(broadcast(p), "cell")
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "cand_id", "rnk", "adc")
  }

  /** Trained PCA basis: per-dim mean, orthonormal components (rows,
    * descending eigenvalue), and the eigenvalues — all driver-small
    * (d + k·d + k doubles, the centroid/codebook class).
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Distributed PCA training — the dimensionality-reduction stage in
    * front of the ANN ladder (PCA→IVF/PQ is the classic recipe for
    * high-d embeddings; OPQ's initialization is exactly this): ONE
    * corpus pass accumulates the d per-dim means and the d(d+1)/2
    * upper-triangle second moments as DECIMAL-EXACT sums (the
    * [[kmeansStep]] pattern — aggregation order can't flip bits, so
    * the covariance, and therefore the whole model, is bit-identical
    * under any partitioning), then the d×d eigenproblem is solved
    * DRIVER-SIDE by cyclic Jacobi — d is a model parameter (64–1024),
    * never data-scale, the same driver-smallness argument as
    * centroids/codebooks. Components are sign-normalized (largest-
    * magnitude entry positive) so the basis is unique. Covariance is
    * the biased (1/n) form. Like k-means/PQ training, run this on a
    * SAMPLE at 100 TB: the moment pass's explode is d² rows per vector
    * — a training-set cost, never a corpus cost; [[pcaProject]] is the
    * narrow corpus-scale path.
    */
  def pcaTrain(
      vecs: DataFrame, k: Int,
      vecCol: String = "v"): PcaModel = {
    import graft.queries.QueryUtil.dec
    require(k > 0, s"k must be positive, got $k")
    val moments = vecs
      .select(posexplode(col(vecCol)).as(Seq("__i", "__xi")),
        col(vecCol).as("__v"))
      .select(col("__i"), col("__xi"),
        posexplode(col("__v")).as(Seq("__j", "__xj")))
      .filter(col("__j") >= col("__i"))
      .groupBy("__i", "__j")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__xi"))).as("si"),
        sum(dec(col("__xi") * col("__xj"))).as("sij"))
      .collect()
    require(moments.nonEmpty, "pcaTrain over an empty corpus")
    val d = moments.map(_.getInt(0)).max + 1
    require(k <= d, s"k=$k exceeds dimensionality d=$d")
    val n = moments.head.getAs[Long]("n") // identical in every group
    val mean = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val sij = r.getDecimal(4).doubleValue()
      if (i == j) mean(i) = r.getDecimal(3).doubleValue() / n
      cov(i)(j) = sij / n
    }
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = cov(i)(j) - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // order by descending eigenvalue (index tiebreak), sign-normalize
    val order = values.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }.map(_._2)
    val comps = order.take(k).map { ix =>
      val c = vectors.map(_(ix))
      val m = c.indices.maxBy(p => (math.abs(c(p)), -p))
      if (c(m) < 0) c.map(x => -x) else c
    }
    PcaModel(mean, comps, order.take(k).map(values(_)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — fixed
    * sweep order and threshold, so the result is a pure function of the
    * (decimal-exact) covariance. Returns (eigenvalues, column-eigvecs).
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** OPQ-lite dimension ALLOCATION (Ge et al. 2013's parametric
    * initialization, eigenvalue-interleaved): reorder a full-rank PCA
    * basis so that consecutive components land in DIFFERENT PQ
    * subspaces — subspace s gets components s, s+m, s+2m, … in
    * descending-eigenvalue order. The rotation decorrelates
    * cross-subspace structure (each rotated subspace is effectively
    * low-dimensional → the quantizer gets the 1-d error rate), and the
    * interleave balances per-subspace energy (PQ's fixed per-subspace
    * codebook budget is spent worst on unbalanced variance). Feed the
    * result to [[pcaProject]] and PQ-train in the projected space —
    * the composition spec measures the error drop on cross-boundary
    * correlated data.
    */
  def opqOrder(model: PcaModel, m: Int): PcaModel = {
    val d = model.components.length
    require(m > 0 && d % m == 0,
      s"component count $d must divide into $m subspaces")
    val sub = d / m
    val perm = (0 until m).flatMap(si => (0 until sub).map(j => j * m + si))
    PcaModel(model.mean,
      perm.map(model.components).toArray,
      perm.map(model.eigenvalues).toArray)
  }

  /** Project vectors onto a trained PCA basis — the CORPUS-scale path:
    * k codegen'd dot products per row against literal component vectors
    * (one compile per index, the encode/search amortization), centering
    * folded into a precomputed scalar offset per component
    * (proj = ⟨x, c⟩ − ⟨μ, c⟩ — the vector never materializes x−μ).
    * Narrow end to end: zero shuffles at any scale.
    */
  def pcaProject(
      vecs: DataFrame, model: PcaModel,
      vecCol: String = "v", outCol: String = "pv"): DataFrame = {
    import graft.expressions.VectorExprs
    val comps = model.components.map { c =>
      val offset = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      (c, offset)
    }
    vecs.withColumn(outCol, array(comps.map { case (c, off) =>
      VectorExprs.dot(col(vecCol), typedLit(c.toSeq)) - lit(off)
    }: _*))
  }

  /** EMBEDDING-SPACE DRIFT between two corpus snapshots — the
    * embedding-side complement of the token-distribution JSD
    * ([[graft.operators.Drift.vocabularyDrift]]/q187): per group
    * (source, language, label), the COSINE between the two snapshots'
    * centroid vectors, plus both centroid norms and member counts.
    * A drifting encoder, an injected cluster, or a scraper regression
    * moves a group's centroid long before per-pair near-dup rates
    * notice; this is the standing monitor an embedding pipeline runs
    * between snapshot builds (the drift alarm in front of ANN-index
    * rebuilds — a moved centroid invalidates IVF cell assignments).
    *
    * Determinism: per-dimension sums accumulate in decimal(38,12)
    * (the [[pcaTrain]] posture — exact, order-free under any
    * partitioning), means are ONE decimal→double cast + ONE double
    * division per dimension, and the per-group dot/norm folds run
    * LEFT-TO-RIGHT over the dimension-sorted mean arrays (the q34
    * dot-product spelling — a fixed double-add sequence both engines
    * replay bit-for-bit); cosine is one expression over those folds,
    * micro-floored; a zero centroid on either side reports 0 by
    * contract.
    *
    * A group present in only ONE snapshot (appeared or vanished —
    * itself a strong drift signal) is REPORTED, not dropped: the
    * centroid tables meet in a FULL OUTER join, the one-sided group's
    * counterpart count reads 0, its counterpart norm 0, and the cosine
    * 0 by the zero-centroid contract. Ragged vector lengths within a
    * group take the MAX per-dim member count as the group's n
    * (deterministic, unlike first()).
    *
    * Shape: per snapshot ONE posexplode + partial-aggregated
    * groupBy(group, dim) — the exchange carries |groups|·d rows per
    * partition after map-side combine, never the vector corpus — then
    * a (group, dim)-keyed join of two parameter-small centroid tables
    * and one |groups|-row rollup. Zero corpus-side joins.
    */
  def centroidDrift(
      a: DataFrame, b: DataFrame,
      groupCol: String, vecCol: String): DataFrame = {
    def cent(df: DataFrame, side: String) = df
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("g", "d")
      .agg(
        sum(col("x").cast("decimal(38,12)")).as(s"__s_$side"),
        count(lit(1)).as(s"__n_$side"))
    // full outer: one-sided groups surface with 0-count/0-norm
    // counterparts; their missing side's mean coalesces to 0.0 so the
    // folds stay null-free and the zero-centroid contract fires
    val j = cent(a, "a").join(cent(b, "b"), Seq("g", "d"), "full_outer")
      .select(col("g"), col("d"),
        coalesce(col("__s_a").cast("double") / col("__n_a").cast("double"),
          lit(0.0)).as("ma"),
        coalesce(col("__s_b").cast("double") / col("__n_b").cast("double"),
          lit(0.0)).as("mb"),
        col("__n_a"), col("__n_b"))
    val folded = j.groupBy("g")
      .agg(
        sort_array(collect_list(struct(col("d"), col("ma"), col("mb"))))
          .as("__v"),
        coalesce(max(col("__n_a")), lit(0L)).as("n_a"),
        coalesce(max(col("__n_b")), lit(0L)).as("n_b"))
      // fixed left-to-right double folds over the d-sorted means —
      // one aggregate HOF each, referenced once (§8 staging rule)
      .withColumn("__dot", aggregate(col("__v"), lit(0.0),
        (acc, e) => acc + e.getField("ma") * e.getField("mb")))
      .withColumn("__na", aggregate(col("__v"), lit(0.0),
        (acc, e) => acc + e.getField("ma") * e.getField("ma")))
      .withColumn("__nb", aggregate(col("__v"), lit(0.0),
        (acc, e) => acc + e.getField("mb") * e.getField("mb")))
    folded.select(
      col("g").as(groupCol), col("n_a"), col("n_b"),
      floor(sqrt(col("__na")) * lit(1000000.0)).cast("long")
        .as("norm_a_micro"),
      floor(sqrt(col("__nb")) * lit(1000000.0)).cast("long")
        .as("norm_b_micro"),
      when(col("__na") === 0.0 || col("__nb") === 0.0, 0L)
        .otherwise(floor(col("__dot") /
          (sqrt(col("__na")) * sqrt(col("__nb"))) * lit(1000000.0))
          .cast("long")).as("centroid_cos_micro"))
  }
}

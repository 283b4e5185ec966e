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

  // ---- heavy hitters (Misra-Gries / space-saving) ---------------------

  /** Per-group MISRA-GRIES heavy-hitter summary of one batch — the
    * frequent-items member of the mergeable-metrics layer (Misra &
    * Gries 1982; mergeability per Agarwal et al. 2012, "Mergeable
    * Summaries", PODS): at most `capacity` rows
    * (byCols*, item, cnt_lo) per group, where cnt_lo is the exact count
    * MINUS the (capacity+1)-th largest count in the group — the batch
    * form of the streaming decrement. Guarantees, spec-asserted:
    * cnt_lo ≤ true count ≤ cnt_lo + N_g/(capacity+1) (N_g = the
    * group's total item count), so every item with frequency >
    * N_g/(capacity+1) SURVIVES. Ties at the cut boundary subtract to
    * ≤ 0 and drop — the summary is deterministic with no tie-break
    * judgement call.
    *
    * Unlike the HLL sketches there is no opaque binary: the summary IS
    * a relational table, so it lands/merges/queries with ordinary
    * operators, and the oracle can replay it exactly (integer counts,
    * total-ordered window).
    *
    * Scale shape: one partial-aggregated (group, item) count exchange;
    * the top-(capacity+1) rank filter compiles to WindowGroupLimit
    * (partial per-partition top-k BEFORE the window exchange — the
    * q83 pre-reduce), so the full item distribution never funnels
    * through one task; the boundary-count lookup is a second window on
    * the ≤ capacity+1 surviving rows over the SAME partitioning — no
    * new exchange.
    */
  def heavyHitters(
      df: DataFrame, itemCol: String, byCols: Seq[String],
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    summarize(
      df.groupBy((byCols.map(col) :+ col(itemCol).as("item")): _*)
        .agg(count(lit(1)).as("cnt")),
      byCols, capacity)
  }

  /** Merge heavy-hitter summaries group-by-group: union, sum counts
    * per item, re-summarize at the same capacity. Associative and
    * order-independent (spec-pinned); per the mergeable-summaries
    * theorem the merged error stays ≤ ΣN_i/(capacity+1) = N/(capacity
    * +1) — merging loses nothing over a single pass at the same
    * capacity. Old state ∪ new batch is the incremental update.
    */
  def mergeHeavyHitters(
      tables: Seq[DataFrame], byCols: Seq[String],
      capacity: Int): DataFrame = {
    require(tables.nonEmpty, "mergeHeavyHitters needs at least one table")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    summarize(
      tables.reduce(_ unionByName _)
        .groupBy((byCols.map(col) :+ col("item")): _*)
        .agg(sum(col("cnt_lo")).as("cnt")),
      byCols, capacity)
  }

  // ---- count-min (mergeable frequencies) ------------------------------

  /** Per-group COUNT-MIN sketch of one batch — the FREQUENCY member of
    * the mergeable-metrics layer (Cormode & Muthukrishnan 2005, "An
    * improved data stream summary: the count-min sketch"): a
    * depth × width grid of counters stored TALL as (byCols*, r, c, cnt)
    * with absent cells implicit zeros — at most depth·width rows per
    * group regardless of item cardinality. Row r hashes the item text
    * through the shared rolling hash, then the fixed affine bank
    * h_r(x) = ((a_r·x + b_r) mod 1e9+7) mod width — the MinHash
    * parameter bank, so ONE set of pinned constants serves every
    * engine-portable oracle. Counters ADD, so the merge is LOSSLESS
    * (any merge tree ≡ the single pass over the union — same algebra
    * as the histogram sketch, spec-pinned); the estimate read off the
    * grid is an UPPER bound on the true count (collisions only inflate
    * — spec-pinned), within ε·N with probability 1−δ at
    * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
    *
    * Scale shape: one partial-aggregated groupBy — the explode fans
    * each occurrence to `depth` cell rows, but map-side partial
    * aggregation collapses them to ≤ depth·width rows per group per
    * task BEFORE the exchange, so the shuffle carries the grid, never
    * the item stream. That bound (parameters, not data) is what lets a
    * 100 TB corpus's token-frequency state live in kilobytes and keep
    * absorbing batches without ever re-scanning history.
    */
  def cmsSketch(
      df: DataFrame, itemCol: String, byCols: Seq[String],
      depth: Int = 4, width: Int = 64): DataFrame = {
    import graft.functions.TextFunctions.MinhashA
    require(depth >= 1 && depth <= MinhashA.size,
      s"depth must be in [1, ${MinhashA.size}] (the hash bank size), got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(byCols.map(col) :+ cmsCells(col(itemCol), depth, width): _*)
      .select(byCols.map(col) :+ posexplode(col("__cells")).as(Seq("r", "c")): _*)
      .groupBy(byCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min tables group-by-group: union + per-cell sum.
    * Exact — counters add, so old state ∪ new batch is the incremental
    * update and any merge tree lands on the same grid.
    */
  def mergeCms(tables: Seq[DataFrame], byCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeCms needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(byCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query a count-min table for a probe set: for each probe row
    * (byCols*, itemCol) the estimate min_r cell(r, h_r(item)), absent
    * cells read as 0. The grid is bounded by PARAMETERS
    * (groups · depth · width rows), so it broadcasts — the probe side
    * never shuffles, whatever its size.
    */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, itemCol: String,
      byCols: Seq[String], depth: Int = 4, width: Int = 64): DataFrame = {
    val cells = probes
      .select((byCols.map(col) :+ col(itemCol) :+
        cmsCells(col(itemCol), depth, width)): _*)
      .select(byCols.map(col) :+ col(itemCol) :+
        posexplode(col("__cells")).as(Seq("r", "c")): _*)
    cells
      .join(broadcast(sketch), byCols ++ Seq("r", "c"), "left")
      .groupBy(byCols.map(col) :+ col(itemCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** INLINE point-query — the grid (parameter-bounded: ≤ depth·width
    * rows after any merge) collected driver-side becomes a literal
    * per-row lookup map, and the estimate ONE narrow projection:
    * `least` over depth map lookups, absent cells 0. This is the
    * STATELESS shape the streaming path needs (a join + groupBy(min)
    * would be a stateful aggregation on a stream) and the §8
    * driver-small-set inline rule (the kmeans-centroid precedent):
    * zero shuffle, zero state, composes inside array lambdas.
    * `grid` rows are (r, c, cnt) for ONE group.
    */
  def cmsEstimateCol(
      grid: Seq[(Int, Int, Long)], item: org.apache.spark.sql.Column,
      depth: Int = 4, width: Int = 64): org.apache.spark.sql.Column = {
    require(grid.forall(g => g._1 >= 0 && g._1 < depth),
      "grid rows outside [0, depth) — depth mismatch with the build")
    // a width mismatch is as silent-wrong as a depth mismatch: probe
    // cells land in [0, width), miss every grid column built at the
    // other width, coalesce to 0, and the estimate quietly loses its
    // upper-bound guarantee — fail loudly instead
    require(grid.forall(g => g._2 >= 0 && g._2 < width),
      "grid columns outside [0, width) — width mismatch with the build")
    require(grid.forall(_._3 >= 0L),
      "negative grid counter — corrupted sketch state")
    val cells = cmsCells(item, depth, width)
    (0 until depth).map { r =>
      val m = grid.filter(_._1 == r).map { case (_, c, n) => (c, n) }.toMap
      if (m.isEmpty) lit(0L)
      else coalesce(
        element_at(typedLit(m), element_at(cells, r + 1)), lit(0L))
    }.reduce(least(_, _))
  }

  /** INLINE heavy-hitter membership — the Misra-Gries read path in the
    * shape the streaming layer needs (the [[cmsEstimateCol]] /
    * kmeans-centroid precedent): a [[heavyHitters]]/[[mergeHeavyHitters]]
    * summary is parameter-bounded (≤ capacity rows per group), so ONE
    * group's summary collected driver-side becomes a literal lookup map
    * and membership is one narrow projection — zero shuffle, zero
    * state, composes inside array lambdas. Returns the item's cnt_lo
    * lower bound, 0 when absent. MG counts are lower bounds, so a
    * nonzero read GUARANTEES the item is frequent (≥ cnt_lo true
    * occurrences) — the conservative direction for hot-key routing
    * (CMS errs the other way: over-counts, never under).
    * `summary` rows are (item, cnt_lo) for ONE group.
    */
  def mgCountCol(
      summary: Seq[(String, Long)],
      item: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(summary.forall(_._2 > 0L),
      "non-positive cnt_lo — not a Misra-Gries summary (the cut drops them)")
    require(summary.map(_._1).distinct.size == summary.size,
      "duplicate items — not a single group's summary")
    if (summary.isEmpty) lit(0L)
    else coalesce(element_at(typedLit(summary.toMap), item), lit(0L))
  }

  /** The one definition of an item's depth cell columns, shared by the
    * build and probe sides so the hash spelling cannot drift.
    *
    * The affine bank alone is DEGENERATE here: for short items the
    * rolling hash x is small, a_r·x + b_r never reaches 1e9+7, the
    * mod p is inert, and (a_r·x + b_r) mod w depends only on x mod w
    * — so all depth rows collide TOGETHER and depth buys nothing. The
    * Knuth-multiplier wrap after the affine step forces the mod p to
    * act (inner < p, inner·2654435761 < 2^63 — no overflow), mixing
    * the low bits per row. Caught by the exact-recovery spec.
    */
  private def cmsCells(item: org.apache.spark.sql.Column, depth: Int,
      width: Int): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.{rollingHash, MinhashA, MinhashB, HashMod}
    val x = rollingHash(item)
    array((0 until depth).map { r =>
      val inner = (x * MinhashA(r) + MinhashB(r)) % HashMod
      (inner * 2654435761L % HashMod % width).cast("int")
    }: _*).as("__cells")
  }

  // ---- histograms (mergeable quantiles) -------------------------------

  /** Per-group fixed-width HISTOGRAM of a non-negative value column —
    * the QUANTILE member of the mergeable-metrics layer: at most
    * range/binWidth rows (byCols*, bin, cnt) per group, bin =
    * value DIV binWidth (exact integer division — no floats in the
    * binning). Histograms are the one summary here that merges
    * LOSSLESSLY (counts add): the merged estimate is IDENTICAL to the
    * single-pass estimate, not merely within a bound — spec-pinned.
    * Quantile error is bounded by the bin: the true q-quantile lies in
    * [est, est + binWidth). One partial-aggregated groupBy.
    */
  def histogramSketch(
      df: DataFrame, valueCol: String, byCols: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    df.groupBy(byCols.map(col) :+
        expr(s"CAST($valueCol AS BIGINT) DIV $binWidth").as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram tables group-by-group: union + per-bin sum.
    * Exact — any merge tree lands on the same table as one pass over
    * the union. Old state ∪ new batch is the incremental update.
    */
  def mergeHistograms(tables: Seq[DataFrame], byCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeHistograms needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy(byCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Read quantile ESTIMATES off a histogram table: for each group and
    * each requested micro-quantile q, the LOWER EDGE of the bin holding
    * the ⌈q·n⌉-th value (rank arithmetic exact integers — ⌈q·n⌉ =
    * (q·n + 999999) DIV 10⁶ — so the pick is engine-identical).
    * Returns (byCols*, q_micro, n, est); the true quantile lies in
    * [est, est + binWidth). One window cumsum + one agg per group,
    * both on the group partitioning.
    */
  def histogramQuantiles(
      hist: DataFrame, byCols: Seq[String],
      qMicros: Seq[Long], binWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(qMicros.nonEmpty &&
      qMicros.forall(q => q >= 1L && q <= 1000000L),
      s"quantiles must be micro-fractions in [1, 1e6]: $qMicros")
    val w = Window.partitionBy(byCols.map(col): _*).orderBy(col("bin"))
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("cnt")).over(
        Window.partitionBy(byCols.map(col): _*)))
    val qDf = cum.withColumn("q_micro", explode(typedLit(qMicros)))
    // ⌈q·n⌉ in exact integer arithmetic — q·n reaches 1e18 at a 1e12
    // count, past double's 2^53 mantissa, so DIV not floor(/)
    val target = expr("(q_micro * __n + 999999) DIV 1000000")
    qDf
      .groupBy(byCols.map(col) :+ col("q_micro"): _*)
      .agg(
        max(col("__n")).as("n"),
        (min(when(col("__cum") >= target, col("bin")))
          * binWidth).as("est"))
  }

  /** Shared cut: keep top-`capacity` items per group by (cnt desc,
    * item asc), counts decremented by the (capacity+1)-th count.
    */
  private def summarize(
      counts: DataFrame, byCols: Seq[String], capacity: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col("cnt").desc, col("item").asc)
    val wAll = Window.partitionBy(byCols.map(col): _*)
    counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capacity + 1)
      .withColumn("__sub",
        max(when(col("__rn") === capacity + 1, col("cnt")).otherwise(0L))
          .over(wAll))
      .filter(col("__rn") <= capacity && col("cnt") - col("__sub") > 0L)
      .select(byCols.map(col) :+ col("item") :+
        (col("cnt") - col("__sub")).as("cnt_lo"): _*)
  }
}

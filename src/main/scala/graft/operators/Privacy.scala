package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-ANONYMITY over quasi-identifiers (Sweeney 2002; Samarati 2001) —
  * the privacy gate a training-data pipeline runs over document
  * metadata before release: any combination of quasi-identifier values
  * (language, source, length band, region, …) must describe at least k
  * rows, or an adversary joins the "anonymous" corpus back to
  * individuals on exactly those columns. The q24 PII pass scrubs
  * identifiers INSIDE the text; this operator closes the metadata side
  * channel.
  *
  * Model: LOCAL RECODING up a caller-supplied generalization ladder.
  * Every row starts at level 0 (its raw quasi values). For each ladder
  * step l in order: rows still at level l whose (level, quasi-tuple)
  * equivalence class holds fewer than k rows are PROMOTED — the step's
  * transforms rewrite their quasi columns (widen a length band, mask a
  * source, coarsen a region) and they move to level l+1. After the
  * last step, rows whose class still misses k are SUPPRESSED (quasi
  * columns nulled). The level is PART of the equivalence key, so a
  * generalized tuple never aliases a raw one even if the spellings
  * collide — every reported class is ≥ k rows of the SAME level, the
  * k-anonymity invariant in its sharpest form (spec-pinned; the final
  * frame carries `anon_level` and `suppressed` for auditability).
  * Local recoding generalizes only the rows that need it — full-domain
  * recoding (one level for everyone) loses strictly more data for the
  * same k.
  *
  * Determinism: promotion depends only on class COUNTS — no
  * tie-breaks, no ordering, no randomness; bit-stable across
  * partitionings and engines (DuckDB replays the ladder as a window
  * chain).
  *
  * Scale shape: one aggregate-then-join per ladder step — the groupBy
  * count is partial-aggregated (hot classes combine map-side; a hot
  * class is exactly one that trivially passes k), and the join back is
  * an equi-join on the same key the aggregation just partitioned, so
  * each step costs one corpus exchange. |ladder| is small (2–4 rungs)
  * and parameter-chosen. A per-level WINDOW would funnel each
  * equivalence class through one task — the exact skew trap the
  * aggregate-then-join avoids (the q96 posture).
  */
object Privacy {

  /** One ladder step: for each quasi column it rewrites, the NEW value
    * as an expression over the CURRENT columns. Columns not in the map
    * pass through unchanged. */
  type Step = Map[String, Column]

  /** K-anonymity, optionally strengthened to DISTINCT-l-DIVERSITY
    * (Machanavajjhala et al. 2007): with `sensitive = Some(col)` and
    * `l > 1`, a class must ALSO contain at least l distinct sensitive
    * values — k alone fails the homogeneity attack (a class of 50 rows
    * that all share one diagnosis re-identifies the attribute even
    * though no row is singled out). Promotion/suppression then fires
    * on EITHER shortfall. countDistinct is an exact two-phase
    * aggregate, so the scale shape is unchanged.
    */
  def kAnonymize(
      df: DataFrame, quasi: Seq[String], ladder: Seq[Step],
      k: Int, sensitive: Option[String] = None, l: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    require(sensitive.nonEmpty || l == 1,
      "l-diversity (l > 1) needs a sensitive column")
    require(quasi.nonEmpty, "no quasi-identifier columns given")
    sensitive.foreach(sc => require(!quasi.contains(sc),
      s"sensitive column $sc cannot be a quasi-identifier"))
    ladder.foreach(step => require(
      step.keySet.subsetOf(quasi.toSet),
      s"ladder step rewrites non-quasi columns: ${step.keySet -- quasi.toSet}"))

    val key = "anon_level" +: quasi
    def classCounts(cur: DataFrame): DataFrame = cur
      .groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("__c"),
        sensitive.map(sc => countDistinct(col(sc)))
          .getOrElse(lit(1L)).as("__d"))
    val violating = col("__c") < k || col("__d") < l

    var cur = df.withColumn("anon_level", lit(0))
    ladder.zipWithIndex.foreach { case (step, lv) =>
      val joined = cur.join(classCounts(cur), key)
      val promote = col("anon_level") === lv && violating
      val rewritten = quasi.foldLeft(joined) { (d, q) =>
        step.get(q) match {
          case Some(next) => d.withColumn(q, when(promote, next).otherwise(col(q)))
          case None => d
        }
      }
      cur = rewritten
        .withColumn("anon_level",
          when(promote, lit(lv + 1)).otherwise(col("anon_level")))
        .drop("__c", "__d")
    }
    // terminal suppression for classes the ladder could not save
    val fin = cur.join(classCounts(cur), key)
    quasi.foldLeft(fin) { (d, q) =>
        d.withColumn(q, when(violating, lit(null)).otherwise(col(q)))
      }
      .withColumn("suppressed", violating)
      .drop("__c", "__d")
  }

  /** Sixth and seventh mixing multipliers (L'Ecuyer 1988/1996 MRG
    * components 40014 and 45991) — the two DP noise legs, decorrelated
    * from every sampling round in [[Sampling]] so a pipeline that both
    * samples and releases never reuses a stream. */
  val DpMult1 = 40014L
  val DpMult2 = 45991L

  /** ε-DIFFERENTIALLY-PRIVATE count release (discrete Laplace / two-
    * sided geometric mechanism — Ghosh, Roughgarden & Sundararajan
    * 2012, the universally-optimal mechanism for counts): the third
    * member of the privacy family. [[kAnonymize]] coarsens classes
    * below k and l-diversity closes the homogeneity attack, but any
    * EXACT released count still leaks membership under a differencing
    * attack (release the histogram before and after one person's
    * document is added and subtract). Per-cell integer noise from the
    * discrete Laplace distribution gives ε-DP for a unit-sensitivity
    * count: noise = G₁ − G₂ with G ~ Geometric(1 − e^(−ε)), via the
    * inverse-CDF identity G = ⌊ln(u)/ln(α)⌋, α = e^(−ε).
    *
    * Determinism: u comes from MCG mixing rounds of (seed, cell RANK,
    * leg index) — the rank is row_number over the sorted cell keys,
    * the same no-rand() posture as every sampler here, so retries,
    * repartitionings, and engines release the SAME noisy table for
    * one recorded seed (a re-run that re-drew noise would leak ε per
    * run; fixing the draw spends the budget once). The two legs hash
    * DISTINCT inputs (2·rank and 2·rank+1) through their own full
    * mixing chains — not two multiples of one shared state — so they
    * are independent draws, not correlated ones. The privacy claim is
    * honest about the seed: with the DEFAULT (public) seed the
    * mechanism offers reproducibility and plausible noise, NOT ε-DP —
    * an adversary who knows the implementation recomputes and
    * subtracts the noise exactly. ε-DP against an informed adversary
    * requires `seed` drawn secretly once per release and kept with
    * the release audit record, exactly as production DP pipelines
    * record (and protect) their seeds. ln(u) is micro-quantized
    * before the one IEEE divide by −ε_micro (exact long over exact
    * long — the q110/q161 precedent), so G is bit-identical in any
    * engine; ln(α)·10⁶ is EXACTLY −ε_micro by construction
    * (α := e^(−ε_micro/10⁶)) — no second libm call enters the
    * denominator.
    *
    * Released cells are the observed groups only (cells the data does
    * not contain are not enumerated — callers needing closed-universe
    * release join a domain table first and get noise on its zeros).
    * Negative noisy counts clamp to 0 (post-processing, DP-safe).
    *
    * Shape: one partial-aggregated groupBy over the corpus; everything
    * after runs on the |cells| histogram — the single-partition rank
    * window is parameter-small by construction (a released histogram
    * IS small; the kmeans-centroid rule). */
  def dpCountRelease(
      df: DataFrame, keys: Seq[String], epsilonMicro: Long,
      seed: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "no release keys given")
    require(epsilonMicro > 0L,
      s"epsilonMicro must be positive, got $epsilonMicro")
    val p = Sampling.HashPrime
    val seedMod = math.floorMod(seed, p)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(keys.map(col(_).asc): _*)
    // each leg hashes its OWN input (2·rk + leg, plus the seed)
    // through a full mixing chain — decorrelated draws, no shared m1
    def geom(legIx: Long, mult: Long): Column = {
      val x0 = pmod(col("__rk") * lit(2L) + lit(legIx + seedMod), lit(p))
      val m1 = pmod(x0 * lit(Sampling.HashMult), lit(p))
      val m2 = pmod(m1 * lit(mult), lit(p))
      val u = (m2 + lit(1L)).cast("double") / lit((p + 1L).toDouble)
      val lnuMicro = floor(log(u) * lit(1000000.0)).cast("long")
      floor(lnuMicro.cast("double") / lit((-epsilonMicro).toDouble))
        .cast("long")
    }
    counts
      .withColumn("__rk", row_number().over(w).cast("long"))
      .select(keys.map(col) :+
        greatest(col("__n") + geom(0L, DpMult1) - geom(1L, DpMult2), lit(0L))
          .as("noisy_n"): _*)
  }
}

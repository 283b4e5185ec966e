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
}

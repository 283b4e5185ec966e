package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CORPUS DRIFT monitoring — Jensen-Shannon divergence between two
  * corpus snapshots' token distributions (Lin 1991; the
  * distribution-shift alarm every standing training-data pipeline
  * runs between crawls: a JSD spike on a source flags a scraper
  * regression, a language flip, or an injection before any model
  * sees the data). The symmetric, bounded (≤ ln 2) cousin of KL —
  * defined even when either snapshot has tokens the other lacks,
  * exactly the case corpus updates produce.
  *
  *   JSD(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2
  *
  * Determinism (the q180 micro-floor pattern): with integer counts
  * c₁(t), c₂(t) and totals T₁, T₂, each log ratio is a ratio of EXACT
  * int64 products — p/m = 2·c₁·T₂ / (c₁·T₂ + c₂·T₁) — micro-floored
  * once per (token, side) after one IEEE ln of one IEEE divide, then
  * weighted by the exact count and summed order-free in int64; the
  * two final divisions by 2·T are exact FLOOR divisions (the signed
  * pmod-adjusted spelling — per-term floors can leave a near-zero
  * sum slightly negative, and truncation would round it the other
  * way than DuckDB's floor `//`). Int64-exact while c·T < 2⁶³
  * (~10⁶-count tokens against 10¹²-token snapshots); shard bigger
  * corpora by group first. Absent-side tokens contribute ln 2 on
  * their present side and 0 on the absent one (0·ln 0 := 0, the
  * standard convention).
  *
  * Shape: two partial-aggregated token groupBys + ONE co-keyed
  * full-outer equi-join on the token key + one per-group totals agg
  * BROADCAST back (group cardinality is dashboard-small by contract;
  * a per-group window here would funnel every group through one
  * task — the q96 skew trap) + one partial-agg rollup. Hot tokens
  * are single join rows, not fan-outs. Returns per-group rows when
  * `groupCols` is non-empty, one global row otherwise.
  */
object Drift {

  def vocabularyDrift(
      a: DataFrame, b: DataFrame,
      tokenCol: String = "token",
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = groupCols :+ tokenCol
    def counts(df: DataFrame, n: String) = df
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(n))
    val joined = counts(a, "__c1")
      .join(counts(b, "__c2"), keys, "full")
      .na.fill(0L, Seq("__c1", "__c2"))
    val totals = joined
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__c1")).as("__t1"), sum(col("__c2")).as("__t2"))
    val withTotals =
      if (groupCols.isEmpty) joined.crossJoin(broadcast(totals))
      else joined.join(broadcast(totals), groupCols)
    // per-(token, side) micro-floored log ratios over exact products
    val num1 = lit(2L) * col("__c1") * col("__t2")
    val num2 = lit(2L) * col("__c2") * col("__t1")
    val den = col("__c1") * col("__t2") + col("__c2") * col("__t1")
    def lnMicro(num: Column) =
      floor(log(num.cast("double") / den.cast("double")) * lit(1000000.0))
        .cast("long")
    val s1 = sum(when(col("__c1") > 0L, col("__c1") * lnMicro(num1))
      .otherwise(0L))
    val s2 = sum(when(col("__c2") > 0L, col("__c2") * lnMicro(num2))
      .otherwise(0L))
    val agg = withTotals
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("__t1")).as("n_tokens_a"),
        max(col("__t2")).as("n_tokens_b"),
        sum(when(col("__c1") > 0L, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("__c2") > 0L, 1L).otherwise(0L)).as("vocab_b"),
        sum(when(col("__c1") > 0L && col("__c2") > 0L, 1L).otherwise(0L))
          .as("vocab_shared"),
        s1.as("__s1"), s2.as("__s2"))
    // exact signed FLOOR division in pure int64 (DIV truncates toward
    // zero; DuckDB's // floors — subtracting pmod first makes the
    // value exactly divisible, so both agree and stay exact)
    agg
      .withColumn("__d1", greatest(lit(2L) * col("n_tokens_a"), lit(1L)))
      .withColumn("__d2", greatest(lit(2L) * col("n_tokens_b"), lit(1L)))
      .withColumn("jsd_micro",
        expr("(__s1 - pmod(__s1, __d1)) DIV __d1 + " +
          "(__s2 - pmod(__s2, __d2)) DIV __d2"))
      .drop("__s1", "__s2", "__d1", "__d2")
  }
}

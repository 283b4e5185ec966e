package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-relatedness QC over the annotated long genotype frame (the
  * [[VariantAnnotator]] output) — the cohort-level checks downstream of
  * the reference's per-sample annotate/zygosity surface
  * (variant_annotations.py:15-768 derives the per-call columns these
  * pairwise statistics aggregate).
  */
object VariantQc {

  /** KING-robust pairwise kinship counts (Manichaikul et al. 2010,
    * Bioinformatics 26(22) — the between-family estimator): over the
    * sites where BOTH samples of a pair carry a called diploid
    * genotype,
    *
    *   φ̂ = (N_het,het − 2·N_opp) / (N_het_a + N_het_b)
    *
    * with N_opp the opposite-homozygote count (both hom, different
    * alleles). Duplicates/MZ twins sit near 0.5, parent-offspring near
    * 0.25, unrelated pairs near (often below) 0 — the standard cohort
    * screen for sample swaps, unexpected relatedness, and contamination
    * (which depresses het counts asymmetrically). Returns the integer
    * evidence counts per (sample_a, sample_b); callers derive the ratio
    * (keeping division out of the operator keeps every output column
    * exact).
    *
    * Scale shape: one self-join of the long frame on the site key —
    * both sides are the SAME annotate plan (ReusedExchange; zero
    * exchanges on a site-bucketed landing) — then ONE aggregation on
    * the pair key. Per-site fan-out is S·(S−1)/2 pairs: quadratic in
    * cohort width, linear in sites — run cohort batches or a pruned
    * SNP panel at biobank width, exactly as production KING does.
    * Sites with any uncalled/haploid member ('.'-padded by the
    * annotator) are excluded per pair, as in practice.
    */
  def kinshipCounts(
      ann: DataFrame,
      sampleCol: String = "sample_id",
      siteKey: Seq[String] = Seq("chrom", "pos", "ref", "alt"),
      a1Col: String = "a1", a2Col: String = "a2"): DataFrame = {
    def calledDiploid(c: String) = col(c).isNotNull && col(c) =!= "."
    val g = ann
      .filter(calledDiploid(a1Col) && calledDiploid(a2Col))
      .select(siteKey.map(col) ++ Seq(
        col(sampleCol).as("__s"),
        (col(a1Col) =!= col(a2Col)).as("__het"),
        when(col(a1Col) === col(a2Col), col(a1Col)).as("__hom")): _*)
    def side(p: String) = g.select(siteKey.map(col) ++ Seq(
      col("__s").as(s"sample_$p"), col("__het").as(s"het_$p"),
      col("__hom").as(s"hom_$p")): _*)
    side("a").join(side("b"), siteKey)
      .filter(col("sample_a") < col("sample_b"))
      .groupBy("sample_a", "sample_b")
      .agg(
        count(lit(1)).as("n_sites"),
        sum(when(col("het_a"), 1L).otherwise(0L)).as("n_het_a"),
        sum(when(col("het_b"), 1L).otherwise(0L)).as("n_het_b"),
        sum(when(col("het_a") && col("het_b"), 1L).otherwise(0L)).as("n_hethet"),
        sum(when(col("hom_a").isNotNull && col("hom_b").isNotNull &&
          col("hom_a") =!= col("hom_b"), 1L).otherwise(0L)).as("n_opp"))
  }

  /** Hardy-Weinberg equilibrium counts + chi-square per BIALLELIC site
    * — the standard site-QC filter (HWE-violating sites flag genotyping
    * artifacts: allele dropout, paralogous mapping, batch effects).
    * Over called DIPLOID genotypes only (haploid and any-'.' calls
    * excluded, multi-allelic sites excluded — classical HWE is
    * biallelic; run [[VariantNorm.splitMultiallelic]] first if needed):
    * n0/n1/n2 = hom-ref/het/hom-alt counts, and the 1-df chi-square in
    * its EXACT closed form
    *
    *   χ² = n·D² / (A²·B²),  D = n1² − 4·n0·n2, A = 2n0+n1, B = n1+2n2
    *
    * (algebraically identical to Σ(obs−exp)²/exp with p̂ = A/2n: the
    * residuals are −D/4n, D/2n, −D/4n) — every term an exact int64
    * until ONE final division, micro-floored, so the statistic is
    * bit-identical across engines and partitionings. Monomorphic sites
    * (A = 0 or B = 0) define χ² = 0. Int64 is exact to ~3000 diploid
    * samples per site (n·D² ≤ 16n⁵); biobank-width cohorts should lift
    * the products to decimal(38,0).
    *
    * Shape: ONE partial-aggregated site-keyed groupBy — zero exchanges
    * on a (chrom, pos_bucket)-bucketed landing, the §4 contract.
    */
  def hweBySite(
      ann: DataFrame,
      siteKey: Seq[String] = Seq("chrom", "pos", "ref", "alt")): DataFrame = {
    def called(c: String) = col(c).isNotNull && col(c) =!= "."
    val counted = ann
      .filter(col("multiallele") === 0 && called("gt1") && called("gt2"))
      .groupBy(siteKey.map(col): _*)
      .agg(
        sum(when(col("zygosity") === "hom-ref", 1L).otherwise(0L)).as("n0"),
        sum(when(col("zygosity") === "het-ref", 1L).otherwise(0L)).as("n1"),
        sum(when(col("zygosity") === "hom-alt", 1L).otherwise(0L)).as("n2"))
    val a = lit(2L) * col("n0") + col("n1")
    val b = col("n1") + lit(2L) * col("n2")
    val d = col("n1") * col("n1") - lit(4L) * col("n0") * col("n2")
    val n = col("n0") + col("n1") + col("n2")
    counted.withColumn("hwe_micro",
      when(a === 0L || b === 0L, 0L).otherwise(
        floor((n * d * d).cast("double") / ((a * a) * (b * b)).cast("double")
          * lit(1000000.0)).cast("long")))
  }
}

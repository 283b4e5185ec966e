package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VariantFunctions

/** Deterministic VCF-shaped data derived from the driver's lineitem table,
  * written once as SQL text that BOTH Spark SQL and DuckDB evaluate
  * identically (functions restricted to the common dialect: substr, ||,
  * CASE, CAST, %). The correctness gate then has DuckDB independently
  * recompute the derivation AND reimplement the reference's annotation
  * semantics in portable SQL — a true oracle for the VCF operators.
  *
  * Case coverage engineered in: `chr`-prefixed chroms, multi-base REF
  * (del/indel/mnp), multiallelic ALT, missing ALT (`.`), phased/unphased,
  * haploid calls, half-missing (`./1`) and fully-missing calls, hom/het
  * ref/alt, and `GT:DP:AD` FORMAT payloads.
  */
object SyntheticVariants {

  val refLenSql = "CASE WHEN k % 11 = 0 THEN 3 WHEN k % 7 = 3 THEN 2 ELSE 1 END"

  val chromRawSql: String =
    "CASE WHEN k % 7 = 0 THEN 'chr' || CAST(1 + (k % 22) AS STRING) " +
      "ELSE CAST(1 + (k % 22) AS STRING) END"

  val posSql = "CAST(1000 + (k % 100000) AS INT)"

  val refSql = s"substr('ACGTACG', CAST(1 + (k % 4) AS INT), $refLenSql)"

  val altSql: String =
    s"""CASE
        WHEN k % 17 = 0 THEN '.'
        WHEN k % 13 = 0 THEN substr('TGCA', CAST(1 + (k % 4) AS INT), 1) || ',' || substr('GTAC', CAST(1 + (k % 4) AS INT), 1)
        WHEN k % 11 = 0 THEN substr('ACGTACG', CAST(1 + (k % 4) AS INT), 1)
        WHEN k % 9 = 0 THEN substr('ACGTACG', CAST(1 + (k % 4) AS INT), 1) || 'TT'
        WHEN k % 5 = 0 THEN substr('TTTTT', 1, $refLenSql)
        ELSE substr('TGCA', CAST(1 + (k % 4) AS INT), 1)
      END"""

  val idSql = "'rs' || CAST(k AS STRING)"
  val qualSql = "CAST(k % 100 AS STRING)"
  val filtSql = "CASE WHEN k % 2 = 0 THEN 'PASS' ELSE 'q10' END"
  /** INFO string; AF is `Number=A` (one value per ALT allele — comma
    * list on the multiallelic k%13 sites), the substrate for per-allele
    * alignment (q62).
    */
  val infoSql: String =
    "'NS=' || CAST(k % 100 AS STRING) || ';DP=' || CAST(k % 1000 AS STRING) || " +
      "';AF=0.' || CAST(k % 97 AS STRING) || " +
      "CASE WHEN k % 17 <> 0 AND k % 13 = 0 " +
      "THEN ',0.' || CAST(k % 89 AS STRING) ELSE '' END"

  /** Genotype call for sample term `g` (an SQL int expression). */
  private def gtSql(g: String): String =
    s"""CASE
        WHEN ($g) % 23 = 0 THEN './.'
        WHEN ($g) % 19 = 0 THEN '.'
        WHEN ($g) % 29 = 0 THEN './1'
        WHEN ($g) % 17 = 0 THEN '1|1'
        WHEN k % 13 = 0 AND ($g) % 4 = 1 THEN '1/2'
        WHEN k % 13 = 0 AND ($g) % 4 = 2 THEN '2|2'
        WHEN ($g) % 7 = 0 THEN '0/0'
        WHEN ($g) % 5 = 0 THEN '0|1'
        WHEN ($g) % 3 = 0 THEN '1/1'
        WHEN ($g) % 2 = 0 THEN '0/1'
        ELSE '0'
      END"""

  /** Full `GT:DP:AD` sample call for sample term `si`; `withDs` appends
    * a planted `Number=1 Float` imputation dosage subfield (format
    * becomes `GT:DP:AD:DS`) — a fixed-6-decimal string in [0, 2]
    * built from integer digits so BOTH engines replay the micro value
    * exactly, with a `.`-missing class every 37th (k+si) to exercise
    * the GT-hard-call fallback.
    */
  def callSql(si: String, withDs: Boolean = false,
      withGp: Boolean = false): String = {
    val g = s"k + ($si) * 31"
    val base = s"${gtSql(g)} || ':' || CAST(($g) % 100 AS STRING) || ':' || " +
      s"CAST(($g) % 50 AS STRING) || ',' || CAST(($g) % 30 AS STRING)"
    val withDsPart = if (!withDs) base else s"$base || ':' || ${dsSql(si)}"
    if (!withGp) withDsPart else s"$withDsPart || ':' || ${gpSql(si)}"
  }

  /** Planted DS string for sample term `si`: micro value
    * m = (k·13 + si·29) % 2000001 rendered as `d.dddddd` (integer-digit
    * construction — the common Spark/DuckDB dialect has no integer
    * division, so the units digit is a 3-way CASE on m's band), or `.`
    * when (k+si) % 37 = 0. [[dsMicroSql]] is the replay of the PARSED
    * value.
    */
  def dsSql(si: String): String = {
    val m = s"((k * 13 + ($si) * 29) % 2000001)"
    s"""CASE WHEN (k + ($si)) % 37 = 0 THEN '.' ELSE
        (CASE WHEN $m >= 2000000 THEN '2' WHEN $m >= 1000000 THEN '1'
              ELSE '0' END)
        || '.' || lpad(CAST($m % 1000000 AS STRING), 6, '0') END"""
  }

  /** DuckDB-side replay of the planted DS *micro* value (NULL on the
    * `.`-missing class) — what [[graft.operators.VariantQc]]'s
    * dosage parse recovers from [[dsSql]]'s string.
    */
  def dsMicroSql(si: String): String =
    s"""CASE WHEN (k + ($si)) % 37 = 0 THEN NULL
        ELSE CAST((k * 13 + ($si) * 29) % 2000001 AS BIGINT) END"""

  /** Planted GP triple for sample term `si` — the GP-ONLY imputed
    * callset class (minimac/Beagle outputs that ship genotype
    * probabilities without DS, the r13 verdict's Missing #1):
    * `P(0/0),P(0/1),P(1/1)` with the het/hom-alt micro values
    * m1 = (k·7 + si·17) % 1000001 and m2 = (k·11 + si·23) % 1000001
    * rendered as fixed-6-decimal strings (exact on both engines), a
    * `.`-missing class every 37th (k+si) — same cadence as [[dsSql]]
    * so the GT fallback is exercised — and a 7-DECIMAL REFUSAL class
    * every 41st (the parse must hand sub-micro precision to the next
    * rung, never round it engine-differently).
    */
  def gpSql(si: String): String = {
    def p(m: String): String =
      s"""(CASE WHEN $m >= 1000000 THEN '1' ELSE '0' END)
          || '.' || lpad(CAST($m % 1000000 AS STRING), 6, '0')"""
    val m1 = s"((k * 7 + ($si) * 17) % 1000001)"
    val m2 = s"((k * 11 + ($si) * 23) % 1000001)"
    s"""CASE WHEN (k + ($si)) % 37 = 0 THEN '.'
        WHEN (k + ($si)) % 41 = 0 THEN '0.1234567,0.1,0.1'
        ELSE '0.000000,' || ${p(m1)} || ',' || ${p(m2)} END"""
  }

  /** DuckDB-side replay of the planted GP-derived *micro* dosage
    * DS = P(het) + 2·P(hom-alt) (NULL on the missing AND the
    * 7-decimal refusal classes — both fall to the GT rung).
    */
  def gpMicroSql(si: String): String =
    s"""CASE WHEN (k + ($si)) % 37 = 0 OR (k + ($si)) % 41 = 0 THEN NULL
        ELSE CAST((k * 7 + ($si) * 17) % 1000001 AS BIGINT)
             + 2 * CAST((k * 11 + ($si) * 23) % 1000001 AS BIGINT) END"""

  val sampleIds: Seq[String] = (1 to 4).map(i => s"g$i")

  /** Planted SYMBOLIC-ALT variant of [[altSql]] (VCF 4.2 §5): `<DEL>`
    * / `<CN2>` / `<DUP:TANDEM>` symbolic SVs, both breakend
    * orientations anchored on the row's REF base, the `*` spanning
    * allele, and two MIXED multiallelic rows (base,SV and *,base) —
    * interleaved with the base-allele derivation. Restricted to rows
    * where the base derivation is single-allele non-missing
    * (k%17≠0, k%13≠0) so planted rows never carry GT indices beyond
    * their new allele count. Same SQL text evaluates on both engines.
    */
  val svAltSql: String =
    s"""CASE
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 1 THEN '<DEL>'
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 2 THEN '<CN2>'
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 3 THEN '<DUP:TANDEM>'
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 4
          THEN substr($refSql, 1, 1) || '[chr9:' || CAST(1000 + (k % 5000) AS STRING) || '['
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 5
          THEN ']13:' || CAST(2000 + (k % 7000) AS STRING) || ']' || substr($refSql, 1, 1)
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 6 THEN '*'
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 7
          THEN substr('TGCA', CAST(1 + (k % 4) AS INT), 1) || ',<DEL>'
        WHEN k % 17 <> 0 AND k % 13 <> 0 AND k % 23 = 8
          THEN '*,' || substr('GTAC', CAST(1 + (k % 4) AS INT), 1)
        ELSE ($altSql)
      END"""

  /** Planted VEP-style CSQ machinery (q217): per row up to 1 + (k%3)
    * pipe-delimited transcript records with Format
    * `Allele|Consequence|IMPACT|SYMBOL|ALLELE_NUM`, appended to INFO as
    * `;CSQ=rec0[,rec1[,rec2]]` on rows with a real ALT (k%17≠0) except
    * a no-CSQ class (k%19=0 — split-vep emits nothing for them).
    * Classes engineered in: `&`-joined multi-consequence strings (the
    * record split must not trip on them), an EMPTY SYMBOL every
    * (k+j)%6=0 (→ NULL), and 1-based ALLELE_NUM cycling the row's ALT
    * count so multiallelic rows exercise the per-allele alignment.
    * Same SQL text on both engines.
    */
  val csqNAltsSql = "(CASE WHEN k % 17 <> 0 AND k % 13 = 0 THEN 2 ELSE 1 END)"

  def csqConsSql(t: String): String =
    s"""(CASE WHEN ($t) % 5 = 0 THEN 'missense_variant'
         WHEN ($t) % 5 = 1 THEN 'stop_gained'
         WHEN ($t) % 5 = 2 THEN 'synonymous_variant'
         WHEN ($t) % 5 = 3 THEN 'intron_variant&splice_region_variant'
         ELSE 'upstream_gene_variant' END)"""

  def csqImpactSql(t: String): String =
    s"""(CASE WHEN ($t) % 4 = 0 THEN 'HIGH' WHEN ($t) % 4 = 1 THEN 'MODERATE'
         WHEN ($t) % 4 = 2 THEN 'LOW' ELSE 'MODIFIER' END)"""

  def csqSymbolSql(t: String): String =
    s"""(CASE WHEN ($t) % 6 = 0 THEN ''
         ELSE 'G' || CAST(($t) % 50 AS STRING) END)"""

  def csqRecSql(j: Int): String = {
    val t = s"(k + $j)"
    s"""substr(($altSql), 1, 1) || '|' || ${csqConsSql(t)} || '|' ||
        ${csqImpactSql(t)} || '|' || ${csqSymbolSql(t)} || '|' ||
        CAST(1 + ($t % $csqNAltsSql) AS STRING)"""
  }

  val csqInfoSql: String =
    s"""CASE WHEN k % 17 <> 0 AND k % 19 <> 0 THEN ($infoSql) || ';CSQ='
          || ${csqRecSql(0)}
          || (CASE WHEN k % 3 >= 1 THEN ',' || ${csqRecSql(1)} ELSE '' END)
          || (CASE WHEN k % 3 = 2 THEN ',' || ${csqRecSql(2)} ELSE '' END)
        ELSE ($infoSql) END"""

  /** Spark side: the wide graft-VCF frame (plus k and chrom_raw).
    * `altOverride` swaps the ALT derivation (e.g. [[svAltSql]]) —
    * the DuckDB twin is [[duckCtesWith]] with the same expression.
    */
  def wide(s: SparkSession, dir: String,
      altOverride: String = altSql, withDs: Boolean = false,
      withGp: Boolean = false): DataFrame =
    // under Bench the planted frame is parquet-materialized once per
    // (ALT derivation, FORMAT shape) — see QueryUtil.substrate
    QueryUtil.substrate(s,
      s"wide-${QueryUtil.digest(dir + altOverride)}-$withDs-$withGp") {
      wideBuild(s, dir, altOverride, withDs, withGp)
    }

  private def wideBuild(s: SparkSession, dir: String,
      altOverride: String, withDs: Boolean,
      withGp: Boolean): DataFrame = {
    val fmt = (withDs, withGp) match {
      case (true, true) => "'GT:DP:AD:DS:GP'"
      case (true, false) => "'GT:DP:AD:DS'"
      case (false, true) => "'GT:DP:AD:GP'"
      case (false, false) => "'GT:DP:AD'"
    }
    val exprs = Seq(
      "k",
      s"$chromRawSql AS chrom_raw",
      s"$posSql AS pos",
      s"$idSql AS id",
      s"$refSql AS ref",
      s"$altOverride AS alt",
      s"$qualSql AS qual",
      s"$filtSql AS filt",
      s"$infoSql AS info",
      s"$fmt AS format") ++
      (1 to 4).map(i => s"${callSql(i.toString, withDs, withGp)} AS call_g$i")
    // The testdata files are tiny (1-3 input splits) while the derived
    // per-row work below is heavy — fan out to full parallelism BEFORE
    // the derivation projection, shuffling only the 8-byte key. Round 2
    // repartitioned after the projection (to materialize the derived
    // columns); that computed every big CASE tree on the 3 scan-side
    // tasks and was the annotate family's real bottleneck — the whole
    // derivation ran on 3 of 32 cores. Downstream of the exchange the
    // derivation and everything after it share one codegen stage, so
    // the derived values flow through as local variables (no
    // re-evaluation); only the small `alt` filter can sink below the
    // exchange. At production scale the scan has ample splits and the
    // repartition is a no-op to remove.
    val base = QueryUtil.t(s, dir, "lineitem")
      .selectExpr("l_orderkey * 8 + l_linenumber AS k")
      .repartition(s.sparkContext.defaultParallelism)
      .selectExpr(exprs: _*)
    val gmap = map(
      (1 to 4).flatMap(i => Seq(lit(s"g$i"), col(s"call_g$i"))): _*)
    base.select(
      col("k"),
      col("chrom_raw"),
      VariantFunctions.normalizeChrom(col("chrom_raw")).as("chrom"),
      col("pos"), col("id"), col("ref"), col("alt"), col("qual"),
      col("filt"), col("info"), col("format"),
      gmap.as("genotypes"))
  }

  /** DuckDB side: CTEs `ln` (keys), `v` (variant sites), `sm` (per-sample
    * calls, 4 rows/site). [[duckCtesWith]] swaps the ALT derivation so
    * downstream CTE chains (e.g. [[duckAnnotateCtes]]) replay over a
    * planted callset unchanged.
    */
  def duckCtesWith(alt: String, withDs: Boolean = false,
      withGp: Boolean = false): String =
    s"""ln AS (SELECT l_orderkey * 8 + l_linenumber AS k FROM lineitem),
        v AS (SELECT k, $chromRawSql AS chrom_raw, $posSql AS pos,
                     $idSql AS id, $refSql AS ref, $alt AS alt,
                     $qualSql AS qual, $filtSql AS filt, $infoSql AS info
              FROM ln),
        sm AS (SELECT v.*, u.si, ${callSql("u.si", withDs, withGp)} AS call
               FROM v CROSS JOIN (SELECT unnest([1,2,3,4]) AS si) u)"""

  val duckCtes: String = duckCtesWith(altSql)

  /** DuckDB reimplementation of VariantFunctions.vartype — the count of
    * differing characters over the allele's span, length-diff driven
    * (reference variant_annotations.py:130-162).
    */
  /** DuckDB twin of StringExprs.isSymbolicAlt (VCF 4.2 §5): star /
    * `<ID>` symbolic SV / square-bracket breakend.
    */
  def symbolicSql(a: String): String =
    s"""(($a) = '*' OR (length($a) >= 2 AND substr($a, 1, 1) = '<'
         AND substr($a, length($a), 1) = '>')
         OR contains(($a), '[') OR contains(($a), ']'))"""

  def vartypeSql(ref: String, a: String): String = {
    def diff =
      s"""coalesce(list_sum(list_transform(range(1, CAST(length($a) AS INT) + 1),
            i -> CASE WHEN substr($ref, CAST(i AS INT), 1) <> substr($a, CAST(i AS INT), 1) THEN 1 ELSE 0 END)), 0)"""
    s"""CASE WHEN $a = '*' THEN 'star'
         WHEN length($a) >= 2 AND substr($a, 1, 1) = '<' AND substr($a, length($a), 1) = '>' THEN 'sv'
         WHEN contains(($a), '[') OR contains(($a), ']') THEN 'bnd'
         WHEN $ref = $a THEN 'ref'
         WHEN length($ref) = length($a) THEN CASE WHEN $diff = 1 THEN 'snp' ELSE 'mnp' END
         WHEN length($ref) > length($a) THEN CASE WHEN $diff > 0 THEN 'indel' ELSE 'del' END
         ELSE 'ins' END"""
  }

  /** DuckDB reimplementation of VariantFunctions.zygosity (branch order
    * mirrors reference variant_annotations.py:64-127).
    */
  def zygositySql(ref: String, a1: String, a2: String): String =
    s"""CASE WHEN $a1 = $ref AND $a2 = $ref THEN 'hom-ref'
         WHEN $a1 = '.' AND $a2 = '.' THEN 'hom-miss'
         WHEN $a1 = '.' OR $a2 = '.' THEN 'het-miss'
         WHEN $a1 <> $ref AND $a2 <> $ref AND $a1 <> $a2 THEN 'het-alt'
         WHEN $a1 <> $ref AND $a2 <> $ref AND $a1 = $a2 THEN 'hom-alt'
         ELSE 'het-ref' END"""

  /** DuckDB CTE chain reproducing VariantAnnotator.annotate output
    * (appended after [[duckCtes]]): long → non-missing → parts/bases →
    * alleles → annotations (+ hom_ref_counts window).
    */
  def duckAnnotateCtesFrom(src: String): String =
    s"""lng AS (
          SELECT k, regexp_replace(chrom_raw, '^chr', '') AS chrom, pos, ref, alt,
                 'g' || CAST(si AS STRING) AS sample_id,
                 string_split(call, ':')[1] AS gt,
                 CAST(string_split(call, ':')[2] AS BIGINT) AS dp,
                 string_split(call, ':')[3] AS ad
          FROM $src WHERE alt <> '.'),
        nm AS (SELECT * FROM lng WHERE gt NOT IN ('./.', '.|.', '.')),
        pp AS (
          SELECT *,
            CASE WHEN contains(gt, '|') THEN '|' WHEN contains(gt, '/') THEN '/' ELSE '-' END AS phase,
            string_split_regex(gt, '[/|]') AS parts,
            list_prepend(ref, string_split(alt, ',')) AS bases
          FROM nm),
        al AS (
          SELECT *, parts[1] AS gt1,
            CASE WHEN len(parts) >= 2 THEN parts[2] ELSE NULL END AS gt2,
            CASE WHEN parts[1] = '.' THEN '.' ELSE bases[CAST(parts[1] AS INT) + 1] END AS a1,
            CASE WHEN len(parts) < 2 THEN '.'
                 WHEN parts[2] = '.' THEN '.'
                 ELSE bases[CAST(parts[2] AS INT) + 1] END AS a2
          FROM pp),
        ann AS (
          SELECT chrom, pos, ref, alt, sample_id, gt, phase, gt1, gt2, a1, a2,
            CAST(len(string_split(alt, ',')) - 1 AS INT) AS multiallele,
            ${vartypeSql("ref", "a1")} AS vartype1,
            ${vartypeSql("ref", "a2")} AS vartype2,
            ${zygositySql("ref", "a1", "a2")} AS zygosity,
            dp, ad
          FROM al),
        cnt AS (
          SELECT *,
            CAST(SUM(CASE WHEN zygosity = 'hom-ref' THEN 1 ELSE 0 END)
              OVER (PARTITION BY chrom, pos, ref, alt) AS BIGINT) AS hom_ref_counts
          FROM ann)"""

  val duckAnnotateCtes: String = duckAnnotateCtesFrom("sm")
}

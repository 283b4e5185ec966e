package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.VcfReader
import graft.sources.VcfReader.FieldDecl

/** Variant NORMALIZATION — the `bcftools norm` analogue upstream of
  * site-keyed cohort work (merge, concordance, kinship, burden): a
  * multi-allelic record and its biallelic splits never join on the same
  * (chrom, pos, ref, alt) key, and an untrimmed `CTT>CT` never matches
  * its parsimonious `CT>C` twin — normalization is what makes the site
  * key canonical. Beyond the reference's surface (pandasvcf analyzes
  * files as-is), but the step its notebooks assume upstream callers did.
  *
  * Two operators, both NARROW (one generator / one projection per row,
  * zero shuffles — they stream at scan speed and compose with pushdown):
  *
  *  - [[splitMultiallelic]]: one output record per ALT allele, with the
  *    genotype allele indices remapped (bcftools `norm -m-` semantics:
  *    the split allele becomes 1, every other allele — REF or other-ALT
  *    — becomes 0, missing `.` stays missing, phase preserved) and
  *    header-declared `Number=A/R/G` INFO arrays positionally sliced to
  *    the biallelic record via the spec alignment
  *    ([[VcfReader.rIndex]]/[[VcfReader.gIndex]], VCF spec §1.4.2).
  *  - [[trimAlleles]]: the genome-free half of left-normalization
  *    (vt-normalize / Tan et al. 2015 steps that need no FASTA): drop
  *    the longest shared allele SUFFIX (keeping ≥1 base on each side),
  *    then the longest shared PREFIX (again keeping ≥1 base), advancing
  *    POS by the prefix length. One suffix-then-prefix pass is a fixed
  *    point: prefix removal never changes the last bases, and any
  *    length-1 allele blocks further trimming on both ends. True
  *    left-ALIGNMENT of indels additionally needs the reference genome
  *    and is out of scope (documented, not stubbed).
  *
  * [[normalize]] composes the two — split first (trimming is per-ALT;
  * trimming a multi-allelic record jointly would have to stop at the
  * most conservative allele and leave the others unnormalized).
  */
object VariantNorm {

  /** Remap one GT string for the biallelic record of 1-based ALT index
    * `idx`: allele `idx` → "1", `.` → ".", anything else (REF or another
    * ALT) → "0"; separator (phase) preserved; haploid calls stay
    * haploid. String index compare, so 2-digit allele indices are exact.
    */
  private def remapGt(gt: Column, idx: Column): Column = {
    val mapped = transform(split(gt, "[/|]"), p =>
      when(p === ".", ".")
        .when(p === idx.cast("string"), "1")
        .otherwise("0"))
    when(gt.contains("|"), array_join(mapped, "|"))
      .otherwise(array_join(mapped, "/"))
  }

  /** Full call remap: the GT field is always first (VCF spec); the
    * remaining `:`-joined FORMAT payload is carried through verbatim.
    */
  private def remapCall(call: Column, idx: Column): Column = {
    val gt = substring_index(call, ":", 1)
    concat(remapGt(gt, idx), call.substr(length(gt) + 1, length(call)))
  }

  /** Split every multi-allelic record into one biallelic record per ALT
    * allele (bcftools `norm -m-` shape). Missing-ALT (`.`) sites are
    * dropped (no allele to split out — same rule as annotate's stacking,
    * variant_annotations.py:568).
    *
    * Output = input columns with `alt` replaced by the single allele,
    * `genotypes` remapped per [[remapGt]], plus `allele_idx` (1-based
    * position of this allele in the original ALT list) and `n_alts`;
    * for each declaration in `decls`, a typed `INFO_<id>` column sliced
    * to the biallelic record:
    * `Number=A` → the allele's scalar; `Number=R` → `[REF, alt]` pair;
    * `Number=G` → `[homref, het, homalt]` diploid triple (spec ordering
    * F(j,k) = k(k+1)/2 + j); other arities pass through as
    * [[VcfReader.withTypedInfo]] typed them. The raw `info` string is
    * NOT rewritten — consumers read the sliced typed columns.
    *
    * Plan shape: one narrow generator (posexplode of the split ALT) +
    * one projection. Zero shuffles at any scale.
    */
  def splitMultiallelic(df: DataFrame, decls: Seq[FieldDecl] = Nil): DataFrame = {
    val typed = if (decls.isEmpty) df else VcfReader.withTypedInfo(df, decls)
    val exploded = typed
      .filter(col("alt") =!= ".")
      .select(col("*"), posexplode(split(col("alt"), ",")).as(Seq("__ai", "__a")))
    val idx = (col("__ai") + 1).cast("int")
    val sliced = decls.foldLeft(exploded) { (d, decl) =>
      val arr = col(s"INFO_${decl.id}")
      decl.number match {
        case "A" => d.withColumn(s"INFO_${decl.id}", try_element_at(arr, idx))
        case "R" => d.withColumn(s"INFO_${decl.id}",
          array(try_element_at(arr, VcfReader.rIndex(lit(0))),
            try_element_at(arr, VcfReader.rIndex(idx))))
        case "G" => d.withColumn(s"INFO_${decl.id}",
          array(try_element_at(arr, VcfReader.gIndex(lit(0), lit(0))),
            try_element_at(arr, VcfReader.gIndex(lit(0), idx)),
            try_element_at(arr, VcfReader.gIndex(idx, idx))))
        case _ => d
      }
    }
    sliced
      .withColumn("allele_idx", idx)
      .withColumn("n_alts", size(split(col("alt"), ","))) // original list
      .withColumn("alt", col("__a"))
      .withColumn("genotypes",
        transform_values(col("genotypes"), (_, call) => remapCall(call, idx)))
      .drop("__ai", "__a")
  }

  /** Count-while-true left fold: the number of LEADING 1-positions of
    * the match predicate `m(i)` over i = 1..n (n ≥ 0). One-level
    * `aggregate` over a small int sequence with a cheap inner — the §8
    * parity case, linear in allele length.
    */
  private def leadingMatches(n: Column, m: Column => Column): Column = {
    val idxs = when(n >= 1, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    val z = struct(lit(1).as("ok"), lit(0).as("cnt"))
    aggregate(idxs, z, (acc, i) => {
      val ok = when(acc.getField("ok") === 1 && m(i), 1).otherwise(0)
      struct(ok.as("ok"), (acc.getField("cnt") + ok).as("cnt"))
    }).getField("cnt")
  }

  /** Parsimony-trim BIALLELIC records in place: `pos`/`ref`/`alt` are
    * replaced by the trimmed representation (suffix first, then prefix,
    * each keeping at least one base; POS advances by the prefix trim).
    * Refuses multi-allelic rows driver-side (`require` on a cheap
    * existence probe is the caller's job — here a comma ALT would trim
    * as a literal string, so the operator guards per row and passes
    * comma rows through untouched for [[splitMultiallelic]] to handle
    * first). Narrow: one projection, zero shuffles.
    */
  def trimAlleles(df: DataFrame): DataFrame = {
    val ref = col("ref")
    val alt = col("alt")
    val lr = length(ref)
    val la = length(alt)
    // longest shared suffix, capped so ≥1 base survives on each side
    val s0 = leadingMatches(least(lr, la) - 1,
      i => ref.substr(lr - i + 1, lit(1)) === alt.substr(la - i + 1, lit(1)))
    // longest shared prefix of the suffix-trimmed alleles, same cap.
    // Positions probed are < min(lr−s, la−s), so the original strings'
    // chars are the trimmed strings' chars — no intermediate substring.
    // symbolic ALTs (SV `<DEL>`, breakend `A[chr2:123[`, star `*`) are
    // not base strings — a breakend sharing its anchor base with a
    // multi-base REF would otherwise prefix-trim and shift POS
    val trimmable = alt =!= "." && !alt.contains(",") &&
      !graft.functions.VariantFunctions.isSymbolicAlt(alt)
    df
      .withColumn("__s", when(trimmable, s0).otherwise(0))
      .withColumn("__p", when(trimmable,
        leadingMatches(least(lr - col("__s"), la - col("__s")) - 1,
          i => ref.substr(i, lit(1)) === alt.substr(i, lit(1))))
        .otherwise(0))
      .withColumn("pos", (col("pos") + col("__p")).cast("int"))
      .withColumn("ref", ref.substr(col("__p") + 1, lr - col("__s") - col("__p")))
      .withColumn("alt", when(trimmable,
        alt.substr(col("__p") + 1, la - col("__s") - col("__p"))).otherwise(alt))
      .drop("__s", "__p")
  }

  /** The composed normalization: split multi-allelics, then trim each
    * biallelic record to its parsimonious representation.
    */
  def normalize(df: DataFrame, decls: Seq[FieldDecl] = Nil): DataFrame =
    trimAlleles(splitMultiallelic(df, decls))

  /** FASTA-backed LEFT-ALIGNMENT of biallelic records in place —
    * `bcftools norm -f` / vt-normalize's genome half
    * ([[graft.expressions.LeftAlignExpr]], Tan et al. 2015 Algorithm
    * 1): `pos`/`ref`/`alt` are replaced by the unique left-aligned
    * parsimonious representation (subsumes [[trimAlleles]]; an indel
    * in a repeat tract slides to the tract's left anchor base).
    * `genome` maps chrom → uppercase reference sequence (1-based
    * positions); chroms absent from the map degrade to the genome-free
    * trim, never a position shift. Multi-allelic / missing / symbolic
    * ALTs pass through untouched — run [[splitMultiallelic]] first.
    *
    * Narrow: ONE codegen'd kernel call per row, genome as a
    * generated-code reference HANDLE — zero shuffles (plan-gated). At
    * whole-genome scale use the [[graft.expressions.Genome]] overload
    * with [[graft.sources.FastaReader.readGenome]]'s broadcast: the
    * 3 GB sequence ships once per executor, tasks carry only an id.
    */
  def leftAlign(df: DataFrame, genome: Map[String, String]): DataFrame =
    leftAlign(df, graft.expressions.Genome.inline(genome))

  /** [[leftAlign]] over a [[graft.expressions.Genome]] HANDLE — the
    * whole-genome path: pass [[graft.sources.FastaReader.readGenome]]'s
    * broadcast handle and the sequence ships once per executor; the
    * `Map` overload closure-ships and is for small partial genomes. */
  def leftAlign(df: DataFrame,
      genome: graft.expressions.Genome): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val aligned = Bridge.column(graft.expressions.LeftAlignExpr(
      genome,
      Bridge.expression(col("chrom")),
      Bridge.expression(col("pos").cast("long")),
      Bridge.expression(col("ref")),
      Bridge.expression(col("alt"))))
    df
      .withColumn("__la", aligned)
      .withColumn("pos", col("__la.pos"))
      .withColumn("ref", col("__la.ref"))
      .withColumn("alt", col("__la.alt"))
      .drop("__la")
  }

  /** Full `bcftools norm -m- -f ref.fa` composition: split
    * multi-allelics, then left-align each biallelic record against the
    * genome (which includes the parsimony trim).
    */
  def normalizeWithGenome(
      df: DataFrame, genome: Map[String, String],
      decls: Seq[FieldDecl] = Nil): DataFrame =
    leftAlign(splitMultiallelic(df, decls), genome)

  def normalizeWithGenome(df: DataFrame,
      genome: graft.expressions.Genome): DataFrame =
    leftAlign(splitMultiallelic(df, Nil), genome)

  /** ALLELE / STRAND HARMONIZATION between two SNP panels — the
    * GWAS-meta-analysis and panel-merge prerequisite (`bcftools
    * +fixref` / plink `--flip` / the summary-statistics harmonization
    * step in every two-cohort meta before q169 can combine them): two
    * callsets genotyped on different arrays disagree on allele
    * ORIENTATION at the same site, and combining them unharmonized
    * silently flips effect directions. Per (chrom, pos) shared between
    * panel A and panel B, classify:
    *
    *   - `match`              same REF/ALT
    *   - `swap`               REF/ALT reversed → B's AF flips (1−af)
    *   - `strand_flip`        B reported on the other strand
    *                          (base-complement), same orientation
    *   - `swap_strand_flip`   both → AF flips
    *   - `palindromic_*`      A/T or G/C allele pairs are strand-
    *     UNRESOLVABLE from alleles alone: resolved by allele-frequency
    *     concordance — the orientation whose AF sits strictly closer
    *     to A's wins (`palindromic_match` / `palindromic_swap`) —
    *     UNLESS either panel's MAF exceeds `ambiguousMafMicroMax`
    *     (near-0.5 frequencies can't arbitrate; the published rule is
    *     to drop) or the two orientations tie → `ambiguous`
    *   - `mismatch`           alleles incompatible under every
    *                          transform (tri-allelic drift, indel vs
    *                          SNP, symbolic) — excluded downstream
    *
    * and emit `af_b_harmonized` (B's AF in A's orientation — the
    * number q169/meta consumes) next to the verdict. Palindromic
    * detection runs FIRST: an A/T site satisfies both `match` and
    * `swap_strand_flip` by construction, so the ladder order is the
    * semantics (spec-pinned). Integer micro-AF arithmetic throughout.
    *
    * Shape: ONE site-keyed equi-join of two per-site summary frames
    * (chrom, pos, ref, alt, af_micro) + a narrow codegen
    * classification projection — zero additional exchanges on
    * site-bucketed landings; panels of any relative size (no
    * broadcast assumption — summary-stats panels are both large).
    */
  def harmonizeAlleles(
      a: DataFrame, b: DataFrame,
      ambiguousMafMicroMax: Long = 400000L): DataFrame = {
    require(ambiguousMafMicroMax >= 0L && ambiguousMafMicroMax <= 500000L,
      s"ambiguousMafMicroMax must be a micro-MAF in [0, 5e5], got " +
        ambiguousMafMicroMax)
    def comp(c: Column): Column = translate(c, "ACGT", "TGCA")
    val pa = a.select(col("chrom"), col("pos"),
      col("ref").as("ref_a"), col("alt").as("alt_a"),
      col("af_micro").as("af_a"))
    val pb = b.select(col("chrom"), col("pos"),
      col("ref").as("ref_b"), col("alt").as("alt_b"),
      col("af_micro").as("af_b"))
    val (ra, aa, rb, ab) =
      (col("ref_a"), col("alt_a"), col("ref_b"), col("alt_b"))
    def snp(r: Column, al: Column) =
      length(r) === 1 && length(al) === 1 &&
        r.isin("A", "C", "G", "T") && al.isin("A", "C", "G", "T")
    val palA = snp(ra, aa) && aa === comp(ra)          // A/T or G/C in A
    val sameSet = (ra === rb && aa === ab)
    val swapped = (ra === ab && aa === rb)
    val maf = (x: Column) => least(x, lit(1000000L) - x)
    val afFlip = lit(1000000L) - col("af_b")
    val dKeep = abs(col("af_a") - col("af_b"))
    val dFlip = abs(col("af_a") - afFlip)
    val action =
      when(!snp(ra, aa) || !snp(rb, ab), lit("mismatch"))
        .when(palA && (sameSet || swapped),
          when(maf(col("af_a")) > ambiguousMafMicroMax ||
            maf(col("af_b")) > ambiguousMafMicroMax, lit("ambiguous"))
            .when(dKeep < dFlip, lit("palindromic_match"))
            .when(dFlip < dKeep, lit("palindromic_swap"))
            .otherwise(lit("ambiguous")))
        .when(sameSet, lit("match"))
        .when(swapped, lit("swap"))
        .when(ra === comp(rb) && aa === comp(ab), lit("strand_flip"))
        .when(ra === comp(ab) && aa === comp(rb), lit("swap_strand_flip"))
        .otherwise(lit("mismatch"))
    pa.join(pb, Seq("chrom", "pos"))
      .withColumn("action", action)
      .withColumn("af_b_harmonized",
        when(col("action").isin("match", "strand_flip",
          "palindromic_match"), col("af_b"))
          .when(col("action").isin("swap", "swap_strand_flip",
            "palindromic_swap"), afFlip))
  }

  /** MERGE biallelic records back into MULTIALLELIC ones — the
    * `bcftools norm -m+` inverse of [[splitMultiallelic]], the export
    * step before handing a callset to tools that expect one record
    * per site (and the dedup that makes a re-merged cohort's site
    * count honest). Records sharing the EXACT (chrom, pos, ref) key
    * merge; the combined ALT list is the lexicographically sorted
    * distinct allele set (bcftools keeps encounter order, which is
    * not deterministic distributed — sorted order is this engine's
    * pinned convention, same spirit as phaseByTransmission's
    * pat-first), and every sample's genotype indices are REMAPPED
    * into the merged list.
    *
    * Per-sample merge rule (the exact inverse of the split remap):
    * each contributing record's GT donates its non-REF calls as the
    * record's own ALT allele (token `1`), `0` donates REF, `.` stays
    * missing; across records the sample's allele multiset is
    * reassembled —
    *  - 2 non-REF donations → `j/k` (sorted; hom-alt when one record
    *    donated twice),
    *  - 1 → `0/j` (or `./j` when the donating record carried a
    *    missing token — half-calls survive the round trip),
    *  - 0 with any called record → `0/0`, none called → `./.`;
    *  - MORE than ploidy donations (k-colliding sites pooling
    *    inconsistent records — bcftools errors here) → `./.`,
    *    surfaced in `n_conflict`;
    *  - haploid in every contributing record → haploid out.
    * Phase is NOT preserved (merged alleles come from different
    * records; a `|` stream cannot be re-inferred — callers re-phase),
    * and missing tokens emit FIRST (`./1` — the canonical spelling).
    * Input contract: biallelic records (GT tokens 0/1/. — the
    * [[splitMultiallelic]] output shape); a GT carrying an index ≥ 2
    * marks that sample `./.` (counted in `n_conflict`, never
    * silently misread). Missing-ALT (`.`) rows are passed over
    * (nothing to merge — same rule as the split side drops them).
    *
    * Output: (chrom, pos, ref, alt, n_src, n_conflict, genotypes).
    * Shape: one narrow per-(record, sample) projection (token counts
    * by CHARACTER arithmetic — tokens are single-glyph by the input
    * contract, so no interpreted HOFs), one (site, sample) agg, one
    * site agg for the allele set, one join back, one final site agg —
    * all on the site-key family (a site-bucketed landing pays the
    * (site, sample) exchange only).
    */
  def mergeToMultiallelic(
      df: DataFrame,
      siteKey: Seq[String] = Seq("chrom", "pos", "ref")): DataFrame = {
    val k = siteKey.map(col)
    val base = df.filter(col("alt") =!= "." && !col("alt").contains(","))
    val lng = base
      .select(k ++ Seq(col("alt"),
        explode(col("genotypes")).as(Seq("__sid", "__call"))): _*)
      .withColumn("__gt", substring_index(col("__call"), ":", 1))
    // character arithmetic over the single-glyph token contract
    val gt = col("__gt")
    val nTok = (length(gt) -
      length(translate(gt, "/|", ""))) + lit(1)
    val dots = length(gt) - length(translate(gt, ".", ""))
    val ones = length(gt) - length(translate(gt, "1", ""))
    val bad = gt.rlike("[2-9]") || gt.rlike("[0-9]{2}")
    val perCall = lng.select(k ++ Seq(
      col("__sid"), col("alt").as("__alt"),
      when(bad, lit(-1)).otherwise(ones).as("__n1"),
      dots.as("__nd"),
      (nTok > 1).as("__dip"),
      (dots < nTok).as("__called")): _*)
    val perSample = perCall
      .groupBy(k :+ col("__sid"): _*)
      .agg(
        sum(when(col("__n1") > 0, col("__n1")).otherwise(0L)).as("__tot"),
        min(when(col("__n1") > 0, col("__alt"))).as("__aLo"),
        max(when(col("__n1") > 0, col("__alt"))).as("__aHi"),
        max(col("__nd")).as("__dots"),
        max(col("__dip")).as("__anyDip"),
        max(col("__called")).as("__anyCalled"),
        max(col("__n1") < 0).as("__bad"))
    val alts = base
      .groupBy(k: _*)
      .agg(array_sort(collect_set(col("alt"))).as("__alts"),
        count(lit(1)).as("n_src"))
    val sep = lit("/")
    val withIdx = perSample.join(alts, siteKey)
      .withColumn("__iLo", array_position(col("__alts"), col("__aLo")))
      .withColumn("__iHi", array_position(col("__alts"), col("__aHi")))
    val ploidy = when(col("__anyDip"), 2).otherwise(1)
    val conflict = col("__bad") ||
      col("__tot") + col("__dots") > ploidy
    val mergedGt =
      when(!col("__anyCalled") || conflict,
        when(col("__anyDip"), "./.").otherwise("."))
        .when(!col("__anyDip"), // haploid throughout
          when(col("__tot") === 1L, col("__iLo").cast("string"))
            .when(col("__dots") > 0, ".").otherwise("0"))
        .when(col("__tot") === 2L,
          concat(col("__iLo").cast("string"), sep,
            col("__iHi").cast("string")))
        .when(col("__tot") === 1L,
          when(col("__dots") > 0,
            concat(lit("."), sep, col("__iLo").cast("string")))
            .otherwise(concat(lit("0"), sep, col("__iLo").cast("string"))))
        .when(col("__dots") > 0, concat(lit("."), sep, lit("0")))
        .otherwise("0/0")
    withIdx
      .withColumn("__mgt", mergedGt)
      .groupBy(k ++ Seq(col("__alts"), col("n_src")): _*)
      .agg(
        sum(when(conflict && col("__anyCalled"), 1L).otherwise(0L))
          .as("n_conflict"),
        map_from_entries(collect_list(
          struct(col("__sid"), col("__mgt")))).as("genotypes"))
      .withColumn("alt", array_join(col("__alts"), ","))
      .drop("__alts")
      .select(k ++ Seq(col("alt"), col("n_src"), col("n_conflict"),
        col("genotypes")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Codon-aware SNP CONSEQUENCE calling — the core of snpEff / VEP /
  * `bcftools csq` (Cingolani et al. 2012; McLaren et al. 2016): given a
  * coding-sequence model and the reference genome, classify each coding
  * SNP by what it does to the protein — synonymous, missense,
  * stop_gained, stop_lost — and everything outside a CDS as intergenic.
  * This is the annotation every variant-interpretation pipeline runs
  * right after normalization (q163): the site key says WHERE, the
  * consequence says WHAT.
  *
  * Semantics (single-CDS gene model, the exon-resolved generalization
  * is the same arithmetic per exon):
  *  - '+' strand: offset o = pos − cds_start, codon index o DIV 3,
  *    phase o MOD 3; the reference codon is the genome triplet at
  *    cds_start + 3·(o DIV 3), the ALT codon substitutes the variant
  *    base at the phase position.
  *  - '−' strand: offset o = cds_end − pos read right-to-left; the
  *    forward triplet ends at cds_end − 3·(o DIV 3) and both codons are
  *    REVERSE-COMPLEMENTED before translation (the variant base is
  *    substituted on the forward strand first — complementing happens
  *    once, on the whole codon).
  *  - Translation by the standard genetic code ('*' = stop);
  *    aa_ref = aa_alt → synonymous; alt stop → stop_gained; ref stop →
  *    stop_lost; otherwise missense. Non-SNPs pass through as
  *    `non_snv` (normalize + classify upstream); sites in no CDS are
  *    `intergenic`.
  *
  * Scale shape: the CDS model is parameter-small (a transcript table —
  * tens of thousands of rows for a whole genome), so the range join is
  * a BROADCAST; everything after it is a narrow projection (substr
  * into the per-chrom genome literal + two 64-entry map lookups) that
  * rides whole-stage codegen. Zero corpus-side shuffles. The genome
  * travels as a per-chrom string map — at whole-genome scale hand
  * per-chrom slices covering the CDS span, as with
  * [[VariantNorm.leftAlign]].
  */
object Consequence {

  /** The standard genetic code, DNA codons → 1-letter amino acids,
    * '*' = stop (NCBI translation table 1). */
  val GeneticCode: Map[String, String] = Map(
    "TTT" -> "F", "TTC" -> "F", "TTA" -> "L", "TTG" -> "L",
    "CTT" -> "L", "CTC" -> "L", "CTA" -> "L", "CTG" -> "L",
    "ATT" -> "I", "ATC" -> "I", "ATA" -> "I", "ATG" -> "M",
    "GTT" -> "V", "GTC" -> "V", "GTA" -> "V", "GTG" -> "V",
    "TCT" -> "S", "TCC" -> "S", "TCA" -> "S", "TCG" -> "S",
    "CCT" -> "P", "CCC" -> "P", "CCA" -> "P", "CCG" -> "P",
    "ACT" -> "T", "ACC" -> "T", "ACA" -> "T", "ACG" -> "T",
    "GCT" -> "A", "GCC" -> "A", "GCA" -> "A", "GCG" -> "A",
    "TAT" -> "Y", "TAC" -> "Y", "TAA" -> "*", "TAG" -> "*",
    "CAT" -> "H", "CAC" -> "H", "CAA" -> "Q", "CAG" -> "Q",
    "AAT" -> "N", "AAC" -> "N", "AAA" -> "K", "AAG" -> "K",
    "GAT" -> "D", "GAC" -> "D", "GAA" -> "E", "GAG" -> "E",
    "TGT" -> "C", "TGC" -> "C", "TGA" -> "*", "TGG" -> "W",
    "CGT" -> "R", "CGC" -> "R", "CGA" -> "R", "CGG" -> "R",
    "AGT" -> "S", "AGC" -> "S", "AGA" -> "R", "AGG" -> "R",
    "GGT" -> "G", "GGC" -> "G", "GGA" -> "G", "GGG" -> "G")

  // The shared SNP codon arithmetic lives in
  // graft.expressions.CsqKernel (r17: one compiled call per row; the
  // previous Column bundle re-expanded per referencing branch with no
  // CSE across `when` branches); CsqKernelSpec keeps the Column form
  // verbatim as the parity reference.

  /** Classify SNPs in `sites` (chrom, pos, ref, alt — 1-based,
    * left-aligned biallelic) against `cds` (gene, chrom, cds_start,
    * cds_end, strand ∈ {+,-}; CDS length a multiple of 3) and the
    * genome. Output: site columns + gene, strand, codon_index,
    * ref_codon, alt_codon, aa_ref, aa_alt, consequence — one row per
    * (site, overlapping CDS), intergenic sites kept with NULL gene
    * fields.
    */
  def snpConsequence(
      sites: DataFrame, cds: DataFrame,
      genome: Map[String, String]): DataFrame = {
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isSnp = length(col("ref")) === 1 && length(col("alt")) === 1 &&
      col("alt").isin("A", "C", "G", "T")
    val joined = sites.join(
      broadcast(cds),
      sites("chrom") === cds("chrom") &&
        col("pos").between(col("cds_start"), col("cds_end")),
      "left").drop(cds("chrom"))
    val plus = col("strand") === "+"
    val off = when(plus, col("pos") - col("cds_start"))
      .otherwise(col("cds_end") - col("pos"))
    val ci = (off - pmod(off, lit(3L))) / 3L
    // r17: the codon walk is ONE compiled kernel call per coding-SNP
    // row (CsqKernelSpec pins kernel ≡ the previous Column bundle
    // field for field) — the Column spelling re-expanded the substr/
    // revcomp/code-lookup subtrees per referencing branch with no CSE.
    // codon_index stays a Column: it is genome-INdependent and non-null
    // wherever (gene, SNP) holds, while the kernel struct nulls out on
    // an absent contig.
    val snpStruct = graft.expressions.GenomeExprs.snpCodonStruct(
      graft.expressions.Genome.inline(genome),
      col("chrom"), col("pos").cast("long"), col("alt"), col("strand"),
      col("cds_start").cast("long"), col("cds_end").cast("long"))
    joined
      .withColumn("__snp",
        when(col("gene").isNotNull && isSnp, snpStruct))
      .withColumn("codon_index",
        when(col("gene").isNotNull && isSnp, ci.cast("long")))
      .withColumn("ref_codon", col("__snp.ref_codon"))
      .withColumn("alt_codon", col("__snp.alt_codon"))
      .withColumn("aa_ref", col("__snp.aa_ref"))
      .withColumn("aa_alt", col("__snp.aa_alt"))
      .withColumn("consequence",
        // symbolic ALTs pass through with their own class — `*`
        // length-1 alleles would otherwise read as mis-alphabet SNVs
        when(sym, lit("symbolic"))
          .when(!isSnp, lit("non_snv"))
          .when(col("gene").isNull, lit("intergenic"))
          // codon unresolvable — chrom absent from the genome map,
          // genome shorter than the triplet, or a non-ACGT base ('N'
          // in real references): degrade EXPLICITLY rather than
          // letting the NULL comparisons fall through to "missense"
          .when(col("aa_ref").isNull || col("aa_alt").isNull,
            lit("unresolved"))
          .when(col("aa_ref") === col("aa_alt"), lit("synonymous"))
          .when(col("aa_alt") === "*", lit("stop_gained"))
          .when(col("aa_ref") === "*", lit("stop_lost"))
          .otherwise(lit("missense")))
      .drop("__snp")
  }

  /** FULL consequence calling — SNPs AND INDELS AND SPLICE FLANKS: the
    * `bcftools csq` / VEP core beyond [[snpConsequence]]'s SNP-only
    * surface. Input indels follow the VCF normalized-anchor convention
    * (q103/q104/q163 output: pure ins/del share their first base).
    * Per (site, CDS-or-flank match), one label:
    *
    *  - SNP in CDS: synonymous / missense / stop_gained / stop_lost /
    *    unresolved — the [[graft.expressions.CsqKernel]] codon walk,
    *    bit-identical to [[snpConsequence]].
    *  - Insertion strictly between two CDS bases: `frameshift` when the
    *    inserted length m ≢ 0 (mod 3); otherwise the ALT codon window —
    *    the anchor's codon with the m bases spliced in at the anchor's
    *    phase (reverse-complemented whole on '−') — is translated
    *    codon-by-codon: any '*' ⇒ `stop_gained` (an insertion into the
    *    terminal codon that happens to retain '*' also reads
    *    stop_gained — documented simplification; well-formed CDS have
    *    no interior stops), any untranslatable codon ⇒ `unresolved`,
    *    else `inframe_insertion`.
    *  - Deletion overlapping the CDS: the IN-CDS deleted length drives
    *    the frame (a del running off either CDS edge shifts frame by
    *    what it removes from the transcript): ≢ 0 (mod 3) ⇒
    *    `frameshift`. Inframe: overlap with the START codon (transcript
    *    5' triplet) ⇒ `start_lost`; with the TERMINAL codon ⇒
    *    `stop_lost`; else the JUNCTION codon — the triplet spliced from
    *    the kept bases flanking the deleted span at the anchor's phase
    *    — translates to '*' ⇒ `stop_gained`, null ⇒ `unresolved`, else
    *    `inframe_deletion`. (When the deletion lands on a codon
    *    boundary the "junction codon" is an unchanged original codon —
    *    interior stops only arise in malformed CDS models.)
    *  - Outside the CDS but within `flank` bases: distance 1–2 ⇒
    *    `splice_donor` on the transcript-3' side / `splice_acceptor` on
    *    the 5' side (strand-aware), 3–`flank` ⇒ `splice_region` — the
    *    single-interval reading of the bcftools/VEP splice windows
    *    (with an exon-resolved gene model the same rule applies per
    *    intron edge).
    *  - Neither: `intergenic`; ref/alt patterns that are neither SNP
    *    nor pure anchored indel: `complex` (run
    *    [[VariantNorm.splitMultiallelic]]/[[VariantNorm.leftAlign]]
    *    upstream).
    *
    * Scale shape: identical to [[snpConsequence]] — broadcast CDS range
    * join (flank-widened, per-type predicate), then ONE narrow
    * projection: every branch is substr/concat arithmetic into the
    * per-chrom genome literal plus 64-entry map lookups; the variable-
    * length insertion window translates via a bounded higher-order
    * `transform` over ⌈(3+m)/3⌉ codons. Zero corpus-side shuffles,
    * whole-stage codegen end to end.
    */
  def csq(
      sites: DataFrame, cds: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    require(flank >= 2, s"flank must be >= 2 (donor window), got $flank")
    val refLen = length(col("ref")).cast("long")
    val altLen = length(col("alt")).cast("long")
    // symbolic ALTs (VCF 4.2 §5) are excluded from every base-
    // arithmetic class — a breakend `A[chr2:123[` shares its anchor
    // base with REF and would otherwise read as an insertion
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isIns = refLen === 1L && altLen > 1L && !sym &&
      substring(col("alt"), 1, 1) === col("ref")
    val isDel = altLen === 1L && refLen > 1L && !sym &&
      substring(col("ref"), 1, 1) === col("alt")
    val F = lit(flank.toLong)
    val dLo = col("pos") + 1L              // first deleted base
    val dHi = col("pos") + refLen - 1L     // last deleted base
    val joinCond = sites("chrom") === cds("chrom") && (
      when(isIns, col("pos").between(col("cds_start") - F,
          col("cds_end") + F - 1L))
        .when(isDel, dHi >= col("cds_start") - F &&
          dLo <= col("cds_end") + F)
        .otherwise(col("pos").between(col("cds_start") - F,
          col("cds_end") + F)))
    val joined = sites.join(broadcast(cds), joinCond, "left")
      .drop(cds("chrom"))
    // r17: the whole post-join ladder — SNP codon walk, insertion
    // window, deletion junction, splice flanks — is ONE compiled
    // kernel call per (site, CDS) row (CsqKernelSpec pins kernel ≡ the
    // previous Column ladder on an exhaustive branch sweep): the
    // Column spelling re-expanded the codon-walk subtrees per `when`
    // branch reference (no CSE across branches) and walked the
    // insertion window through an interpreted HOF — ~6 codon-tree
    // evaluations and a dozen UTF8String allocations per row.
    val label = graft.expressions.GenomeExprs.csqLabel(
      graft.expressions.Genome.inline(genome), flank,
      col("chrom"), col("pos").cast("long"), col("ref"), col("alt"),
      col("strand"), col("cds_start").cast("long"),
      col("cds_end").cast("long"))
    joined
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(col("gene").isNull, lit("intergenic"))
          .otherwise(label))
  }

  /** One-row-per-gene EXON MODEL: sorted exon array (s, e, cum) with
    * precomputed cumulative c-offsets, total CDS length, and the gene
    * span — the broadcast side of [[csqExons]] and
    * [[snpConsequenceExons]], factored so both consume bit-identical
    * models (the shared-kernel precedent: a drifted copy would break
    * the spec-pinned label parity silently).
    */
  private def exonGeneModel(exons: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("gene").orderBy("exon_start")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    exons
      .withColumn("__len", col("exon_end") - col("exon_start") + 1L)
      .withColumn("__cum", coalesce(sum(col("__len")).over(w), lit(0L)))
      .groupBy(col("gene"), col("chrom").as("__gchrom"), col("strand"))
      .agg(
        sort_array(collect_list(struct(
          col("exon_start").as("s"), col("exon_end").as("e"),
          col("__cum").as("cum")))).as("__ex"),
        sum(col("__len")).as("__total"),
        min(col("exon_start")).as("__gs"),
        max(col("exon_end")).as("__ge"))
  }

  // The transcript-offset → genome-base exon lookup lives in
  // graft.expressions.ExonCsqKernel (r17: compiled per-row kernels
  // replaced the staged CodegenFallback HOF columns; the Column form
  // is kept verbatim in ExonCsqKernelSpec as the parity reference).

  /** PER-GENE CONSEQUENCE-CLASS BURDEN — the gnomAD-constraint-style
    * rollup over a consequence table ([[csq]]/[[csqExons]] output; Lek
    * et al. 2016 / Karczewski et al. 2020's observed-variant counts
    * per functional class): how many LoF / missense / synonymous /
    * inframe variants each gene carries. The LoF set follows LOFTEE's
    * high-confidence classes — stop_gained, frameshift, splice_donor,
    * splice_acceptor; start_lost/stop_lost/splice_region/intron and
    * passthroughs count under `n_other`. This is the input table of
    * constraint scoring (obs/exp), gene-ranking dashboards, and the
    * denominator side of burden tests. One partial-aggregated
    * groupBy(gene) — conditional sums combine map-side; intergenic
    * (NULL-gene) rows are excluded.
    */
  def consequenceBurden(csqRows: DataFrame, geneCol: String = "gene",
      consequenceCol: String = "consequence"): DataFrame = {
    val c = col(consequenceCol)
    def n(p: Column) = sum(when(p, 1L).otherwise(0L))
    csqRows.filter(col(geneCol).isNotNull)
      .groupBy(col(geneCol))
      .agg(
        count(lit(1)).as("n_total"),
        n(c.isin("stop_gained", "frameshift", "splice_donor",
          "splice_acceptor")).as("n_lof"),
        n(c === "missense").as("n_missense"),
        n(c === "synonymous").as("n_synonymous"),
        n(c.isin("inframe_insertion", "inframe_deletion"))
          .as("n_inframe"),
        n(!c.isin("stop_gained", "frameshift", "splice_donor",
          "splice_acceptor", "missense", "synonymous",
          "inframe_insertion", "inframe_deletion")).as("n_other"))
  }

  /** FULL consequence calling on MULTI-EXON transcript models — the
    * [[csq]] × [[snpConsequenceExons]] product, closing the last
    * compositional gap: indels against a SPLICED coding sequence.
    * Real clinical callsets are ~10–15% indels and real transcripts
    * are multi-exon; `bcftools csq`/VEP handle the product, so this
    * does. Input/exon conventions as the two parents (normalized
    * anchored indels; 1-based inclusive exons in genome order,
    * concatenated length a multiple of 3).
    *
    * Semantics (all arithmetic in the [[snpConsequenceExons]] c-space
    * — the 0-based genome-order CDS index; transcript offset o = c on
    * '+', total−1−c on '−'):
    *
    *  - SNP: the [[snpConsequenceExons]] ladder (exonic → codon walk,
    *    else intron/splice) — junction-spanning codons via per-base
    *    exon lookups, bit-identity spec-pinned.
    *  - Insertion: TRANSCRIBED only when the anchor and its successor
    *    are the same exon's bases (an insertion between exons lands in
    *    the intron and never reaches the transcript — splice ladder);
    *    m ≢ 0 (mod 3) ⇒ `frameshift`; else the anchor CODON (assembled
    *    per-base across junctions) with the strand-adjusted insert
    *    spliced at the transcript slot — after phase on '+', before it
    *    on '−' (the insert sits between transcript offsets o and o+1 /
    *    o−1 and o respectively) — translates codon-by-codon:
    *    '*' ⇒ `stop_gained`, untranslatable ⇒ `unresolved`, else
    *    `inframe_insertion`.
    *  - Deletion: the removed EXONIC bases form a contiguous c-range
    *    [cA, cB] (a genome-contiguous span's exonic subset is
    *    c-contiguous), and THAT length drives the frame — intronic
    *    deleted bases never shift it, a span eating across a junction
    *    shifts by exactly what it removes from the transcript:
    *    ≢ 0 (mod 3) ⇒ `frameshift`; removing any of transcript offsets
    *    0–2 ⇒ `start_lost`, any of the terminal codon ⇒ `stop_lost`;
    *    else the JUNCTION codon — kept bases flanking the removed
    *    o-range at its phase, each mapped back through c-space —
    *    translates: '*' ⇒ `stop_gained`, null ⇒ `unresolved`, else
    *    `inframe_deletion`. A deletion with NO exonic overlap takes
    *    the splice ladder on the SPAN's facing distances.
    *  - Splice ladder: nearest FACING exon edge (span-aware for dels),
    *    1–2 ⇒ strand-aware donor/acceptor, 3–`flank` ⇒ splice_region,
    *    inside the gene span ⇒ `intron`, else `intergenic`. Complex
    *    ref/alt patterns pass through as `complex`.
    *
    * Scale shape: [[snpConsequenceExons]]'s — one-row-per-gene exon
    * model broadcast (del side joins on SPAN overlap), then ONE narrow
    * projection; every exon-array HOF (containing-exon, span edges,
    * cA/cB, six per-base lookups) is STAGED into a guarded named
    * column (the §8 r11 rule — CodegenFallback gets no CSE), each
    * evaluated once per row only on the rows whose variant class needs
    * it. Zero corpus-side shuffles.
    */
  def csqExons(
      sites: DataFrame, exons: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    require(flank >= 2, s"flank must be >= 2 (donor window), got $flank")
    val geneModel = exonGeneModel(exons)
    val refLen = length(col("ref")).cast("long")
    val altLen = length(col("alt")).cast("long")
    // symbolic ALTs (VCF 4.2 §5) are a separate pass-through class —
    // excluded from every base class; 1→1 substitutions are SNPs
    // regardless of alt alphabet (a non-ACGT alt degrades to
    // `unresolved` through the null amino-acid lookup, exactly as
    // [[snpConsequenceExons]] classifies it).
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isDel = altLen === 1L && refLen > 1L && !sym &&
      substring(col("ref"), 1, 1) === col("alt")
    val F = lit(flank.toLong)
    val dLo = col("pos") + 1L
    val dHi = col("pos") + refLen - 1L
    val joinCond = sites("chrom") === col("__gchrom") && (
      when(isDel, dHi >= col("__gs") - F && dLo <= col("__ge") + F)
        .otherwise(col("pos").between(col("__gs") - F, col("__ge") + F)))
    val joined = sites.join(broadcast(geneModel), joinCond, "left")
      .drop("__gchrom")
    // r17: the whole post-join ladder — containing-exon walk, c-space
    // insertion/deletion arithmetic, per-base junction codons, facing-
    // edge splice scan — is ONE compiled kernel call per (site, gene)
    // row (ExonCsqKernelSpec pins kernel ≡ the previous staged-Column
    // pipeline): the staged HOF columns each ran interpreted per row
    // with an array scan and per-element struct allocations.
    val label = graft.expressions.GenomeExprs.exonCsqLabel(
      graft.expressions.Genome.inline(genome), flank,
      col("chrom"), col("pos").cast("long"), col("ref"), col("alt"),
      col("strand"), col("__ex"), col("__total").cast("long"),
      col("__gs").cast("long"), col("__ge").cast("long"))
    joined
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(col("gene").isNull, lit("intergenic"))
          .otherwise(label))
      .drop("__ex", "__total", "__gs", "__ge")
  }

  /** EXON-RESOLVED SNP consequence calling — real multi-exon gene
    * models (the transcript structure `bcftools csq`/VEP actually
    * consume): a coding sequence split across exons, with INTRONS
    * between them, codons that SPAN exon junctions, and splice sites
    * at EVERY internal exon edge. [[snpConsequence]]/[[csq]]'s
    * single-interval model is the one-exon special case; this is the
    * general arithmetic.
    *
    * Input `exons`: one row per CDS exon — (gene, chrom, strand,
    * exon_start, exon_end), 1-based inclusive, genome order; the
    * concatenated exon lengths should be a multiple of 3. Coordinates
    * work in "c-space" — the 0-based index of a genome position
    * within the CDS read in GENOME order (c = cum_before_exon +
    * (pos − exon_start)); the transcript offset is then o = c on '+'
    * and o = total−1−c on '−', so ONE exon-lookup function serves
    * both strands: each of a codon's three transcript offsets maps
    * back through c-space to a genome position (possibly in a
    * DIFFERENT exon — junction-spanning codons fall out of the same
    * arithmetic), reads its base from the genome string, and '−'
    * complements per base before assembling the transcript-order
    * codon.
    *
    * Classification: coding SNPs get the [[snpConsequence]] ladder
    * (synonymous/missense/stop_gained/stop_lost, `unresolved` for
    * untranslatable codons); positions between exons of a gene are
    * `intron`, refined to strand-aware `splice_donor`/
    * `splice_acceptor` (1–2 bases from the nearest exon edge) and
    * `splice_region` (3–`flank`); gene-span flanks use the same edge
    * windows; everything else `intergenic`; non-SNVs pass through as
    * `non_snv`. Nearest-edge ties (exactly mid-intron) resolve to the
    * downstream exon's start side — deterministic, documented.
    *
    * Scale shape: the exon model aggregates to ONE row per gene
    * (sorted exon array with precomputed cumulative offsets — a
    * parameter-small broadcast), the range join is the [[csq]]
    * broadcast, and the per-site work is a narrow projection whose
    * only non-codegen pieces are higher-order lookups over the
    * per-gene exon array (tens of entries — bounded per row, nothing
    * like the §8 nested-HOF-over-corpus trap). Zero corpus-side
    * shuffles.
    */
  def snpConsequenceExons(
      sites: DataFrame, exons: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    require(flank >= 2, s"flank must be >= 2 (donor window), got $flank")
    val geneModel = exonGeneModel(exons)
    val F = lit(flank.toLong)
    val joined = sites.join(
      broadcast(geneModel),
      sites("chrom") === col("__gchrom") &&
        col("pos").between(col("__gs") - F, col("__ge") + F),
      "left").drop("__gchrom")
    // symbolic pass-through: a `*` spanning allele is length-1 and
    // would otherwise walk the codon ladder to a lying "unresolved"
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isSnp = length(col("ref")) === 1 && length(col("alt")) === 1 && !sym
    // r17: the whole per-row walk — containing-exon filter, c-space
    // codon assembly through per-base exon lookups, facing-edge splice
    // scan — is ONE compiled kernel call per (site, gene) row
    // (ExonCsqKernelSpec pins kernel ≡ the previous staged-Column
    // pipeline field for field): the staged HOF columns each ran
    // interpreted per row.
    val k = graft.expressions.GenomeExprs.exonSnp(
      graft.expressions.Genome.inline(genome), flank,
      col("chrom"), col("pos").cast("long"), col("alt"), col("strand"),
      col("__ex"), col("__total").cast("long"), col("__gs").cast("long"),
      col("__ge").cast("long"))
    joined
      .withColumn("__k", when(col("gene").isNotNull && isSnp, k))
      .withColumn("codon_index", col("__k.codon_index"))
      .withColumn("ref_codon", col("__k.ref_codon"))
      .withColumn("alt_codon", col("__k.alt_codon"))
      .withColumn("aa_ref", col("__k.aa_ref"))
      .withColumn("aa_alt", col("__k.aa_alt"))
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(!isSnp, lit("non_snv"))
          .when(col("gene").isNull, lit("intergenic"))
          .otherwise(col("__k.consequence")))
      .drop("__ex", "__total", "__gs", "__ge", "__k")
  }

  /** CONSUME VEP/snpEff annotations already IN a VCF — the `bcftools
    * +split-vep` analogue, the inverse direction of [[csq]]: most
    * real-world annotated callsets (gnomAD, ClinVar-matched releases,
    * clinical pipelines) arrive with the per-transcript consequence
    * records packed into ONE `CSQ`/`ANN` INFO string, and nothing
    * downstream can query "missense in gene X" until it is exploded
    * into typed long rows.
    *
    * Record grammar (VEP docs; snpEff ANN is the same shape):
    * `CSQ=rec1,rec2,…` with each record `v1|v2|…|vn` POSITIONALLY
    * matching the `Format:` declaration in the `##INFO=<ID=CSQ,…>`
    * header line ([[vepFormatFields]] parses it — VEP's
    * `Description="… Format: A|B|C"` and snpEff's
    * `Description="Functional annotations: 'A | B | C'"` both).
    * Per record: one output row, one typed column per declared field,
    * EMPTY subfields → NULL (the VCF missing convention), records
    * shorter than the declaration → trailing NULLs, longer → extras
    * ignored; `csq_idx` preserves record order. Rows whose INFO
    * carries no `infoKey` emit nothing (split-vep's long view).
    *
    * The subtle part is MULTI-ALLELIC alignment: a record annotates
    * ONE ALT allele, named by its `ALLELE_NUM` field (1-based ALT
    * index — the `--allele_number` convention VEP recommends exactly
    * because the `Allele` field's minimal spelling is ambiguous after
    * normalization). When the declaration carries `alleleNumField`,
    * the row's OWN ALT list is indexed with it (a per-row element_at,
    * NO join) and emitted as `alignedCol` — the actual ALT string the
    * record annotates, NULL when ALLELE_NUM is absent/malformed/out
    * of range.
    *
    * Shape: one regexp INFO extract + ONE posexplode + a narrow
    * positional projection (the split is STAGED into `__parts` once —
    * the §8 CodegenFallback staging rule; each field reads it through
    * one `nullif(try_element_at(…))`). Zero shuffles, zero joins at
    * any scale; transcript fan-out is bounded by the annotator's
    * per-site record count.
    */
  def splitVep(
      df: DataFrame,
      fields: Seq[String],
      infoKey: String = "CSQ",
      alleleNumField: String = "ALLELE_NUM",
      alignedCol: String = "aligned_alt",
      types: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)
      : DataFrame = {
    require(fields.nonEmpty, "need the Format field declaration")
    require(fields.distinct.length == fields.length,
      s"duplicate Format fields: $fields")
    require(types.keySet.subsetOf(fields.toSet),
      s"types declared for unknown fields: ${types.keySet -- fields.toSet}")
    val value = regexp_extract(col("info"),
      "(^|;)" + java.util.regex.Pattern.quote(infoKey) + "=([^;]*)", 2)
    val recs = df
      .withColumn("__csq", value)
      .filter(col("__csq").isNotNull && col("__csq") =!= "")
      .select(col("*"),
        posexplode(split(col("__csq"), ",")).as(Seq("csq_idx", "__rec")))
      // stage the pipe split ONCE; limit -1 keeps trailing empties so
      // `A|B|` still yields n parts (all-empty tails stay addressable)
      .withColumn("__parts", split(col("__rec"), "\\|", -1))
    // optional TYPED columns (the r13 verdict's #7 — VEP numeric
    // fields like positions/scores otherwise need caller-side casts):
    // a declared field gets ONE ANSI-safe try_cast on top of the same
    // string extract; undeclared fields keep the string path verbatim,
    // so the default (empty map) plans byte-identically
    val withFields = fields.zipWithIndex.foldLeft(recs) {
      case (d, (f, i)) =>
        val raw = nullif(try_element_at(col("__parts"), lit(i + 1)),
          lit(""))
        d.withColumn(f, types.get(f) match {
          case None => raw
          case Some(t) => raw.try_cast(t) // malformed values → NULL
        })
    }
    val aligned =
      if (!fields.contains(alleleNumField)) withFields
      else {
        val an = col(alleleNumField)
        // index must be >= 1: VEP's documented ALLELE_NUM=0 means "the
        // reference allele" — no ALT aligns, so it yields NULL like any
        // non-numeric value (ElementAt throws INVALID_INDEX_OF_ZERO
        // even via try_element_at); the {1,9} length cap keeps the
        // ANSI int cast overflow-safe
        withFields.withColumn(alignedCol,
          try_element_at(split(col("alt"), ","),
            when(an.rlike("^[0-9]{1,9}$") && an.cast("int") >= 1,
              an.cast("int"))))
      }
    aligned.drop("__csq", "__rec", "__parts")
  }

  /** The published VEP consequence-severity ranking (the Ensembl
    * "Variant consequences" table, most severe first) — what
    * `bcftools +split-vep -s worst` and every clinical triage sort
    * by. Index in this list = severity rank (0 = worst).
    */
  val VepSeverityOrder: Seq[String] = Seq(
    "transcript_ablation", "splice_acceptor_variant",
    "splice_donor_variant", "stop_gained", "frameshift_variant",
    "stop_lost", "start_lost", "transcript_amplification",
    "feature_elongation", "feature_truncation", "inframe_insertion",
    "inframe_deletion", "missense_variant", "protein_altering_variant",
    "splice_donor_5th_base_variant", "splice_region_variant",
    "splice_donor_region_variant", "splice_polypyrimidine_tract_variant",
    "incomplete_terminal_codon_variant", "start_retained_variant",
    "stop_retained_variant", "synonymous_variant",
    "coding_sequence_variant", "mature_miRNA_variant",
    "5_prime_UTR_variant", "3_prime_UTR_variant",
    "non_coding_transcript_exon_variant", "intron_variant",
    "NMD_transcript_variant", "non_coding_transcript_variant",
    "coding_transcript_variant", "upstream_gene_variant",
    "downstream_gene_variant", "TFBS_ablation", "TFBS_amplification",
    "TF_binding_site_variant", "regulatory_region_ablation",
    "regulatory_region_amplification", "regulatory_region_variant",
    "intergenic_variant", "sequence_variant")

  /** WORST-CONSEQUENCE selection over [[splitVep]] long rows — the
    * `bcftools +split-vep -s worst` mode, the record-level triage
    * every clinical/burden pipeline runs after the explode: a variant
    * annotated against 15 transcripts gets ONE verdict row, the
    * transcript whose consequence ranks most severe. A record's rank
    * is the MINIMUM over its `&`-joined consequence terms (VEP emits
    * compound annotations like `intron_variant&splice_region_variant`
    * — the severe member decides); terms outside the table rank past
    * the end (never beat a known one). Ties take the LOWEST `idxCol`
    * (VEP emits its own canonical-transcript-first ordering, so this
    * is its tie rule); the caller must keep `idxCol` unique per key.
    * Output: the key columns + the chosen record's payload verbatim +
    * `severity_rank`.
    *
    * Shape: one narrow rank projection (the `&`-split HOF is staged
    * into `__rank` once — §8 rule) + ONE key-grouped min_by agg
    * (partial, combines map-side). Zero joins.
    */
  def worstConsequence(
      splitRows: DataFrame,
      keyCols: Seq[String] = Seq("chrom", "pos", "ref", "alt"),
      consequenceCol: String = "Consequence",
      idxCol: String = "csq_idx",
      severity: Seq[String] = VepSeverityOrder): DataFrame = {
    require(severity.nonEmpty && severity.distinct.length == severity.length,
      "severity order must be a non-empty list of distinct terms")
    // r17 (guide §4): the transform/element_at HOF ran INTERPRETED
    // per row with a linear literal-map scan per term —
    // [[graft.expressions.MinSeverityRankExpr]] is the same min-rank
    // as one compiled hash-lookup pass (legacy form kept verbatim in
    // ConsequenceSpec's parity pin)
    val ranked = splitRows.withColumn("__rank",
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expressions.MinSeverityRankExpr(
          org.apache.spark.sql.graftbridge.Bridge.expression(
            col(consequenceCol)), severity)))
    val payload = ranked.columns.filterNot(keyCols.contains)
    ranked
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*),
        struct(col("__rank"), col(idxCol))).as("__w"))
      .select(keyCols.map(col) ++
        payload.filterNot(_ == "__rank")
          .map(c => col(s"__w.$c").as(c)) :+
        col("__w.__rank").as("severity_rank"): _*)
  }

  /** Parse the per-transcript field declaration out of a `##INFO`
    * header line — VEP writes `Description="Consequence annotations
    * from Ensembl VEP. Format: Allele|Consequence|IMPACT|…"`, snpEff
    * writes `Description="Functional annotations: 'Allele | Annotation
    * | …'"`; both are "the pipe list after the last colon of the
    * Description", quotes and spaces trimmed.
    */
  def vepFormatFields(headerLine: String): Seq[String] = {
    val desc = "Description=\"([^\"]*)\"".r.findFirstMatchIn(headerLine)
      .map(_.group(1)).getOrElse(headerLine)
    val tail = desc.substring(desc.lastIndexOf(':') + 1)
    val fields = tail.trim.stripPrefix("'").stripSuffix("'")
      .split("\\|").map(_.trim).filter(_.nonEmpty).toSeq
    require(fields.length > 1,
      s"no pipe-delimited Format list found in: $headerLine")
    fields
  }
}

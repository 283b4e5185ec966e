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

  private def revComp(s: Column): Column =
    reverse(translate(s, "ACGT", "TGCA"))

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
    val gmap = typedLit(genome.map { case (c, s) => (c, s.toUpperCase) })
    val code = typedLit(GeneticCode)
    val isSnp = length(col("ref")) === 1 && length(col("alt")) === 1 &&
      col("alt").isin("A", "C", "G", "T")
    val joined = sites.join(
      broadcast(cds),
      sites("chrom") === cds("chrom") &&
        col("pos").between(col("cds_start"), col("cds_end")),
      "left").drop(cds("chrom"))
    val gstr = element_at(gmap, col("chrom"))
    val plus = col("strand") === "+"
    val off = when(plus, col("pos") - col("cds_start"))
      .otherwise(col("cds_end") - col("pos"))
    val ci = (off - pmod(off, lit(3L))) / 3L
    val ph = pmod(off, lit(3L))
    // forward-strand triplet holding the variant
    val tripStart = when(plus, col("cds_start") + lit(3L) * ci)
      .otherwise(col("cds_end") - lit(3L) * ci - lit(2L))
    val refTrip = gstr.substr(tripStart.cast("int"), lit(3))
    // index of the variant base within the forward triplet (1-based)
    val idx = when(plus, ph + 1L).otherwise(lit(3L) - ph)
    val altTrip = concat(
      refTrip.substr(lit(1), (idx - 1L).cast("int")),
      col("alt"),
      refTrip.substr((idx + 1L).cast("int"), (lit(3L) - idx).cast("int")))
    val refCodon = when(plus, refTrip).otherwise(revComp(refTrip))
    val altCodon = when(plus, altTrip).otherwise(revComp(altTrip))
    val aaRef = element_at(code, refCodon)
    val aaAlt = element_at(code, altCodon)
    joined
      .withColumn("codon_index",
        when(col("gene").isNotNull && isSnp, ci.cast("long")))
      .withColumn("ref_codon",
        when(col("gene").isNotNull && isSnp, refCodon))
      .withColumn("alt_codon",
        when(col("gene").isNotNull && isSnp, altCodon))
      .withColumn("aa_ref", when(col("gene").isNotNull && isSnp, aaRef))
      .withColumn("aa_alt", when(col("gene").isNotNull && isSnp, aaAlt))
      .withColumn("consequence",
        when(!isSnp, lit("non_snv"))
          .when(col("gene").isNull, lit("intergenic"))
          .when(col("aa_ref") === col("aa_alt"), lit("synonymous"))
          .when(col("aa_alt") === "*", lit("stop_gained"))
          .when(col("aa_ref") === "*", lit("stop_lost"))
          .otherwise(lit("missense")))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level variant annotation semantics of the reference, re-expressed
  * as codegen-friendly Catalyst expressions (builtins only — no UDFs, so
  * every classifier inlines into WholeStageCodegen and stays
  * pushdown/prune-transparent).
  *
  * Reference semantics preserved from:
  *  - vartype:   /root/reference/variant_annotations.py:130-162
  *  - zygosity:  /root/reference/variant_annotations.py:64-127
  *  - alleles:   /root/reference/variant_annotations.py:15-61
  *  - chrom fix: /root/reference/pandasvcf.py:177
  */
object VariantFunctions {

  /** Strip a leading `chr` prefix (reference pandasvcf.py:177). */
  def normalizeChrom(chrom: Column): Column = regexp_replace(chrom, "^chr", "")

  /** Comma count in ALT. The reference docstring says {0,1} but the code
    * (variant_annotations.py:504) emits the comma COUNT — we keep the
    * code's behavior: 0 = biallelic, n = n+1 alt alleles.
    */
  def multiallele(alt: Column): Column = size(split(alt, ",")) - 1

  /** `|` if phased, `/` if unphased, `-` for haploid calls
    * (variant_annotations.py:24-31).
    */
  def phase(gt: Column): Column =
    when(gt.contains("|"), lit("|"))
      .when(gt.contains("/"), lit("/"))
      .otherwise(lit("-"))

  private def gtParts(gt: Column): Column = split(gt, "[/|]")

  /** Numeric allele index strings; gt2 is NULL for haploid calls
    * (the reference leaves GT2 = NaN, variant_annotations.py:53-57).
    */
  def gt1(gt: Column): Column = element_at(gtParts(gt), 1)
  def gt2(gt: Column): Column = {
    val p = gtParts(gt)
    when(size(p) >= 2, element_at(p, 2))
  }

  /** `[REF, alt1, alt2, …]` — GT indices index into this 0-based. */
  private def alleleBases(ref: Column, alt: Column): Column =
    concat(array(ref), split(alt, ","))

  /** Base string for one allele index: `.` (or NULL index) stays `.`;
    * an out-of-range index (malformed VCF) yields NULL rather than
    * failing the job (try_element_at), unlike the reference which raises.
    */
  def alleleBase(ref: Column, alt: Column, gtIdx: Column): Column =
    when(gtIdx.isNull || gtIdx === ".", lit("."))
      .otherwise(try_element_at(alleleBases(ref, alt), gtIdx.cast("int") + 1))

  /** Variant type of one allele vs REF: ref | snp | mnp | del | indel |
    * ins — exact algorithm of variant_annotations.py:130-162 (prefix
    * character comparison, length-difference driven). Backed by a native
    * codegen expression (graft.expressions.VartypeExpr) — the HOF
    * formulation fell out of WholeStageCodegen and dominated annotate
    * time at bench scale.
    */
  def vartype(ref: Column, allele: Column): Column =
    graft.expressions.StringExprs.vartype(ref, allele)

  /** Column twin of [[graft.expressions.StringExprs.isSymbolicAlt]]
    * (VCF 4.2 §5): `*` spanning allele, `<ID>` symbolic SV, or
    * square-bracket breakend. Base-arithmetic operators (trim,
    * left-align, consequence) use this to pass such alleles through
    * unmangled.
    */
  def isSymbolicAlt(a: Column): Column =
    a === "*" ||
      (length(a) >= 2 && a.startsWith("<") && a.endsWith(">")) ||
      a.contains("[") || a.contains("]")

  /** Zygosity of a diploid call — branch ORDER matters and mirrors
    * variant_annotations.py:64-127 exactly (hom-ref wins over missing).
    */
  def zygosity(ref: Column, a1: Column, a2: Column): Column =
    when(a1 === ref && a2 === ref, lit("hom-ref"))
      .when(a1 === "." && a2 === ".", lit("hom-miss"))
      .when(a1 === "." || a2 === ".", lit("het-miss"))
      .when(a1 =!= ref && a2 =!= ref && a1 =!= a2, lit("het-alt"))
      .when(a1 =!= ref && a2 =!= ref && a1 === a2, lit("hom-alt"))
      .otherwise(lit("het-ref"))

  /** True for calls the reference drops before annotating
    * (variant_annotations.py:618-620): `./.`, `.|.`, `.` or empty.
    */
  def isMissingCall(gt: Column): Column =
    gt.isNull || gt.isin("./.", ".|.", ".", "")
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FASTA-backed LEFT-ALIGNMENT of one variant — the genome-dependent
  * half of `vt normalize` / `bcftools norm -f` (Tan, Abecasis & Kang
  * 2015, Bioinformatics 31(13):2202, Algorithm 1): repeatedly (a) drop
  * the shared rightmost base of REF/ALT, (b) when either allele runs
  * empty, extend BOTH on the left with the reference base before POS
  * and decrement POS; finally trim the shared left prefix (keeping one
  * base each side) advancing POS. The fixed point is the unique
  * left-aligned parsimonious representation — the canonical site key
  * every indel in a repeat tract normalizes to (the paper's
  * GGGCACACAGGG example: (4,CAC,C), (5,ACA,A), (6,CACA,CA) all →
  * (3,GCA,G); spec-pinned).
  *
  * Kernel semantics:
  *  - Records the algorithm does not define are passed through
  *    UNCHANGED: missing/symbolic/multi-allelic ALT (run
  *    splitMultiallelic first), REF = ALT, and POS ≤ 1 extension
  *    attempts stop at the contig edge.
  *  - A chromosome ABSENT from the genome map degrades to the
  *    genome-free trim (suffix then prefix, ≥1 base floors — exactly
  *    VariantNorm.trimAlleles), so partial references never silently
  *    corrupt positions, they just under-shift.
  *  - Termination: every extension strictly decreases POS (bounded by
  *    1), every truncation strictly shrinks an allele.
  *
  * Scale shape: ONE static call per row inside whole-stage codegen,
  * genome as a generated-code reference object (the BpeCountExpr
  * pattern) — zero shuffle, scan-speed. The reference object is
  * task-serialized; at whole-genome scale hand the map 2-bit-packed
  * per-chrom slices (shifts are locally bounded by the repeat tract
  * length), not raw 3 GB strings.
  */
object LeftAlignKernel {
  /** Builds the chrom → sequence lookup (1-BASED positions; the map
    * stores plain 0-based Java strings). Uppercased once here so the
    * kernel compares case-free. */
  def genomeMap(genome: Map[String, String]): java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](genome.size * 2)
    genome.foreach { case (c, s) => m.put(c, s.toUpperCase) }
    m
  }

  private def invalidAlt(alt: String): Boolean =
    alt.isEmpty || alt == "." || alt == "*" || alt.contains(",") ||
      alt.startsWith("<") || alt.contains("[") || alt.contains("]")

  /** The per-row kernel. Returns a 3-field struct (pos, ref, alt). */
  def leftAlignK(
      chromU: UTF8String, pos: Long, refU: UTF8String, altU: UTF8String,
      genome: java.util.HashMap[String, String]): InternalRow = {
    val ref0 = refU.toString.toUpperCase
    val alt0 = altU.toString.toUpperCase
    if (invalidAlt(alt0) || ref0.isEmpty || ref0 == alt0 || pos < 1L)
      return row(pos, ref0, alt0)
    val seq = genome.get(chromU.toString)

    var p = pos
    val ref = new java.lang.StringBuilder(ref0)
    val alt = new java.lang.StringBuilder(alt0)
    def lastEq: Boolean = {
      val (lr, la) = (ref.length, alt.length)
      lr > 0 && la > 0 && ref.charAt(lr - 1) == alt.charAt(la - 1)
    }
    if (seq != null) {
      // Tan et al. Algorithm 1 main loop: truncate shared last bases;
      // when a side empties, left-extend both from the genome.
      // Terminates: extension strictly decreases p (≥ 1), a
      // non-extending truncation strictly shrinks total length.
      var done = false
      while (!done) {
        if (!lastEq) done = true
        else {
          val wouldEmpty = ref.length == 1 || alt.length == 1
          val canExtend = p > 1L && p - 2L < seq.length
          if (wouldEmpty && !canExtend) {
            // contig edge (or genome shorter than POS): stop BEFORE
            // the truncation that would need an extension base
            done = true
          } else {
            ref.setLength(ref.length - 1)
            alt.setLength(alt.length - 1)
            if (ref.length == 0 || alt.length == 0) {
              val base = seq.charAt((p - 2L).toInt)
              ref.insert(0, base)
              alt.insert(0, base)
              p -= 1L
            }
          }
        }
      }
    } else {
      // genome-free degradation: suffix trim only, ≥1 base each side
      while (ref.length > 1 && alt.length > 1 && lastEq) {
        ref.setLength(ref.length - 1)
        alt.setLength(alt.length - 1)
      }
    }
    // shared-prefix trim, ≥1 base each side
    var cut = 0
    while (ref.length - cut > 1 && alt.length - cut > 1 &&
        ref.charAt(cut) == alt.charAt(cut)) cut += 1
    row(p + cut, ref.substring(cut), alt.substring(cut))
  }

  private def row(pos: Long, ref: String, alt: String): InternalRow =
    new GenericInternalRow(Array[Any](
      pos, UTF8String.fromString(ref), UTF8String.fromString(alt)))
}

/** The Catalyst expression: (chrom, pos, ref, alt) →
  * struct(pos, ref, alt) left-aligned against the genome. The
  * [[Genome]] handle rides the plan; a broadcast handle resolves its
  * map once per stage on the executor (the sequence ships per
  * EXECUTOR through the torrent protocol, never per task).
  */
case class LeftAlignExpr(
    genome: Genome,
    chrom: Expression, pos: Expression, ref: Expression, alt: Expression)
    extends QuaternaryExpression {

  override def first: Expression = chrom
  override def second: Expression = pos
  override def third: Expression = ref
  override def fourth: Expression = alt
  override def prettyName: String = "left_align"

  override def dataType: DataType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("ref", StringType, nullable = false),
    StructField("alt", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (chrom.dataType, pos.dataType, ref.dataType, alt.dataType) match {
      case (StringType, LongType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, bigint, string, string), got $other")
    }

  @transient private lazy val genomeRef = genome.resolve()

  override protected def nullSafeEval(
      c: Any, p: Any, r: Any, a: Any): Any =
    LeftAlignKernel.leftAlignK(
      c.asInstanceOf[UTF8String], p.asInstanceOf[Long],
      r.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String], genomeRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("genome", genome,
      "graft.expressions.Genome")
    // resolve the broadcast once per stage instance, not per row
    val gMap = ctx.addMutableState("java.util.HashMap", "genomeMap",
      v => s"$v = $gRef.resolve();")
    defineCodeGen(ctx, ev, (c, p, r, a) =>
      s"graft.expressions.LeftAlignKernel.leftAlignK($c, $p, $r, $a, $gMap)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): LeftAlignExpr =
    copy(chrom = newFirst, pos = newSecond, ref = newThird, alt = newFourth)
}

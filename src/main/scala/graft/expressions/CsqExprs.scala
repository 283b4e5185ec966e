package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled consequence-calling kernels — the r17 optimization round's
  * [[CallFromPlKernel]] treatment applied to the
  * [[graft.operators.Consequence]] family, the suite's most expensive
  * projections (q184 ~700 exec-core-s at sf0.1): the Column-ladder
  * spelling referenced the codon-walk subtrees (substr into the genome
  * literal, revcomp, 64-entry literal-map lookups) once per `when`
  * BRANCH REFERENCE, and whole-stage codegen gets no common-
  * subexpression reuse across branches — so each row re-ran the walk
  * up to ~6×, allocating UTF8Strings each time. Each kernel is ONE
  * static call per row doing integer/char arithmetic over the resolved
  * genome string, allocating only its result.
  *
  * Exactness contract (the oracle-hash rule): every branch, tie order,
  * SQL-substr clamp, non-ANSI int narrowing, and null-propagation
  * quirk of the Column ladders is mirrored entry for entry —
  * including `sequence(1,0)` descending (an empty insertion window
  * reads `unresolved`), concat null-propagation (an absent contig
  * makes the SNP arm `unresolved`, the inframe-insertion arm
  * `inframe_insertion`, and the junction arm `unresolved` only when
  * the junction window is in-CDS), and case-sensitive codon lookups
  * (lowercase alt bases do NOT translate). CsqKernelSpec pins kernel
  * ≡ legacy-Column-ladder on an exhaustive branch sweep.
  */
object CsqKernel {

  /** The standard genetic code as a 64-slot table indexed by
    * 16·i(b0) + 4·i(b1) + i(b2) with i = index in "ACGT" — the exact
    * layout the DuckDB oracles replay; parity with
    * [[graft.operators.Consequence.GeneticCode]] is spec-pinned. */
  private val AA =
    "KNKNTTTTRSRSIIMIQHQHPPPPRRRRLLLLEDEDAAAAGGGGVVVV*Y*YSSSS*CWCLFLF"

  @inline private def baseIdx(c: Char): Int = c match {
    case 'A' => 0
    case 'C' => 1
    case 'G' => 2
    case 'T' => 3
    case _ => -1
  }

  /** Amino acid of the 3-char codon at `from` in `s`, or 0 (= the
    * Column form's null lookup) when out of range / non-ACGT. */
  @inline private def aaAt(s: String, from: Int): Char = {
    if (s == null || from < 0 || from + 3 > s.length) return 0.toChar
    val i0 = baseIdx(s.charAt(from))
    val i1 = baseIdx(s.charAt(from + 1))
    val i2 = baseIdx(s.charAt(from + 2))
    if (i0 < 0 || i1 < 0 || i2 < 0) 0.toChar
    else AA.charAt(16 * i0 + 4 * i1 + i2)
  }

  /** element_at(GeneticCode, codon): null unless an exact 3-char
    * uppercase ACGT codon. */
  @inline private def aaOf(s: String): Char =
    if (s == null || s.length != 3) 0.toChar else aaAt(s, 0)

  /** reverse(translate(s, "ACGT", "TGCA")) — unmapped chars ride. */
  private def revComp(s: String): String = {
    if (s == null) return null
    val n = s.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      out(n - 1 - i) = c match {
        case 'A' => 'T'
        case 'C' => 'G'
        case 'G' => 'C'
        case 'T' => 'A'
        case other => other
      }
      i += 1
    }
    new String(out)
  }

  /** SQL SUBSTR over a java String — UTF8String.substringSQL's exact
    * clamp semantics (1-based, negative pos from the end, pos 0 as 1,
    * ranges clipped to the string, empty when degenerate); the inputs
    * are ASCII genome/codon text so char indexing is byte-exact. */
  private def substrSql(s: String, pos: Int, len: Int): String = {
    if (s == null) return null
    val n = s.length
    val start = if (pos > 0) pos - 1 else if (pos < 0) n + pos else 0
    if (len <= 0) return ""
    val end = start.toLong + len
    val s0 = math.max(start, 0)
    val e0 = math.min(end, n.toLong).toInt
    if (s0 >= n || e0 <= s0) "" else s.substring(s0, e0)
  }

  @inline private def pmod3(x: Long): Long = ((x % 3) + 3) % 3

  private def u(s: String) = UTF8String.fromString(s)
  private val Synonymous = u("synonymous")
  private val Missense = u("missense")
  private val StopGained = u("stop_gained")
  private val StopLost = u("stop_lost")
  private val StartLost = u("start_lost")
  private val Unresolved = u("unresolved")
  private val Frameshift = u("frameshift")
  private val InframeIns = u("inframe_insertion")
  private val InframeDel = u("inframe_deletion")
  private val SpliceDonor = u("splice_donor")
  private val SpliceAcceptor = u("splice_acceptor")
  private val SpliceRegion = u("splice_region")
  private val Intergenic = u("intergenic")
  private val Complex = u("complex")

  private def splice(plus: Boolean, distL: Long, distR: Long,
      flank: Long): UTF8String = {
    val onLeft = distL > 0L
    val dist = if (onLeft) distL else distR
    val donor = (plus && !onLeft) || (!plus && onLeft)
    if (dist >= 1L && dist <= 2L) {
      if (donor) SpliceDonor else SpliceAcceptor
    } else if (dist >= 3L && dist <= flank) SpliceRegion
    else Intergenic
  }

  /** [[graft.operators.Consequence.csq]]'s whole post-join
    * classification for a (site, CDS) row with a non-null gene and a
    * non-symbolic ALT — SNP codon walk, insertion window, deletion
    * junction, splice flanks — as one call. `genome` is the row's
    * contig sequence (uppercased) or null when the contig is absent
    * from the (possibly partial) map.
    */
  def csqLabel(genome: String, pos: Long, refU: UTF8String,
      altU: UTF8String, plus: Boolean, cs: Long, ce: Long,
      flank: Long): UTF8String = {
    val ref = refU.toString
    val alt = altU.toString
    val refLen = ref.length.toLong
    val altLen = alt.length.toLong
    val isSnp = refLen == 1L && altLen == 1L
    val isIns = refLen == 1L && altLen > 1L && alt.charAt(0) == ref.charAt(0)
    val isDel = altLen == 1L && refLen > 1L && ref.charAt(0) == alt.charAt(0)
    if (!isSnp && !isIns && !isDel) return Complex
    val dLo = pos + 1L
    val dHi = pos + refLen - 1L

    if (isSnp) {
      if (pos >= cs && pos <= ce) {
        val off = if (plus) pos - cs else ce - pos
        val ci = (off - pmod3(off)) / 3L
        val tripStart = if (plus) cs + 3L * ci else ce - 3L * ci - 2L
        val refTrip = substrSql(genome, tripStart.toInt, 3)
        if (refTrip == null) return Unresolved // absent contig
        val idx = if (plus) pmod3(off) + 1L else 3L - pmod3(off)
        val altTrip = substrSql(refTrip, 1, (idx - 1L).toInt) + alt +
          substrSql(refTrip, (idx + 1L).toInt, (3L - idx).toInt)
        val aaR = aaOf(if (plus) refTrip else revComp(refTrip))
        val aaA = aaOf(if (plus) altTrip else revComp(altTrip))
        if (aaR == 0.toChar || aaA == 0.toChar) Unresolved
        else if (aaR == aaA) Synonymous
        else if (aaA == '*') StopGained
        else if (aaR == '*') StopLost
        else Missense
      } else splice(plus, cs - pos, pos - ce, flank)
    } else if (isIns) {
      val m = altLen - 1L
      if (pos >= cs && pos <= ce - 1L) {
        if (m % 3L != 0L) Frameshift
        else {
          val fs = if (plus) pos - pmod3(pos - cs)
            else pos - 1L + pmod3(ce - pos - 1L)
          val fe = fs + 2L
          val head = substrSql(genome, fs.toInt, (pos - fs + 1L).toInt)
          val tail = substrSql(genome, (pos + 1L).toInt, (fe - pos).toInt)
          if (head == null || tail == null) return InframeIns // null window
          val winF = head + alt.substring(1) + tail
          val winT = if (plus) winF else revComp(winF)
          val nCod = winT.length / 3
          // sequence(1, 0) DESCENDS: an empty window still "reads" two
          // codons, both null → unresolved (the Column quirk, mirrored)
          if (nCod == 0) return Unresolved
          var anyNull = false
          var anyStop = false
          var i = 0
          while (i < nCod) {
            val a = aaAt(winT, 3 * i)
            if (a == 0.toChar) anyNull = true
            else if (a == '*') anyStop = true
            i += 1
          }
          if (anyNull) Unresolved
          else if (anyStop) StopGained
          else InframeIns
        }
      } else splice(plus, cs - pos, pos - ce + 1L, flank)
    } else { // deletion
      if (dLo <= ce && dHi >= cs) {
        val mIn = math.min(dHi, ce) - math.max(dLo, cs) + 1L
        if (pmod3(mIn) != 0L) Frameshift
        else {
          val startLo = if (plus) cs else ce - 2L
          val termLo = if (plus) ce - 2L else cs
          if (dLo <= startLo + 2L && dHi >= startLo) StartLost
          else if (dLo <= termLo + 2L && dHi >= termLo) StopLost
          else {
            val fullyIn = pos >= cs && dHi <= ce
            val phP = pmod3(pos - cs)
            val phM = pmod3(ce - dHi - 1L)
            val jA = if (plus) pos - phP else pos - 1L + phM
            val jB = if (plus) dHi + 2L - phP else dHi + 1L + phM
            val junOk = fullyIn && jA >= cs && jB <= ce
            if (!junOk) InframeDel
            else {
              val h = substrSql(genome, jA.toInt, (pos - jA + 1L).toInt)
              val t = substrSql(genome, (dHi + 1L).toInt, (jB - dHi).toInt)
              val aaJ = if (h == null || t == null) 0.toChar
                else aaOf(if (plus) h + t else revComp(h + t))
              if (aaJ == 0.toChar) Unresolved
              else if (aaJ == '*') StopGained
              else InframeDel
            }
          }
        }
      } else splice(plus, cs - dHi, dLo - ce, flank)
    }
  }

  /** [[graft.operators.Consequence.snpConsequence]]'s codon walk for a
    * coding SNP row: struct(codon_index, ref_codon, alt_codon, aa_ref,
    * aa_alt) — field-for-field the staged Column quintet (aa fields
    * null for untranslatable codons, string fields never null once the
    * contig resolves). Null when the contig is absent (every Column
    * field null-propagates the same way).
    */
  def snpCodon(genome: String, pos: Long, altU: UTF8String,
      plus: Boolean, cs: Long, ce: Long): GenericInternalRow = {
    if (genome == null) return null
    val off = if (plus) pos - cs else ce - pos
    val ci = (off - pmod3(off)) / 3L
    val tripStart = if (plus) cs + 3L * ci else ce - 3L * ci - 2L
    val refTrip = substrSql(genome, tripStart.toInt, 3)
    val idx = if (plus) pmod3(off) + 1L else 3L - pmod3(off)
    val alt = altU.toString
    val altTrip = substrSql(refTrip, 1, (idx - 1L).toInt) + alt +
      substrSql(refTrip, (idx + 1L).toInt, (3L - idx).toInt)
    val refCodon = if (plus) refTrip else revComp(refTrip)
    val altCodon = if (plus) altTrip else revComp(altTrip)
    val aaR = aaOf(refCodon)
    val aaA = aaOf(altCodon)
    new GenericInternalRow(Array[Any](ci, u(refCodon), u(altCodon),
      if (aaR == 0.toChar) null else UTF8String.fromString(aaR.toString),
      if (aaA == 0.toChar) null else UTF8String.fromString(aaA.toString)))
  }
}

/** (chrom, pos, ref, alt, strand, cds_start, cds_end) → consequence
  * label (see [[CsqKernel.csqLabel]]); the [[Genome]] handle and the
  * flank width ride the generated code as reference objects. Callers
  * guard with gene-non-null and non-symbolic-ALT — this expression is
  * the everything-else ladder. Null on any null input.
  */
case class CsqLabelExpr(genome: Genome, flank: Int,
    children: Seq[Expression]) extends Expression {
  require(children.length == 7,
    s"csq_label expects (chrom, pos, ref, alt, strand, cds_start, " +
      s"cds_end), got ${children.length} children")
  override def prettyName: String = "csq_label"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, LongType, StringType, StringType, StringType,
          LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, bigint, string, string, string, " +
          s"bigint, bigint), got $other")
    }

  @transient private lazy val genomeRef = genome.resolve()

  override def eval(input: InternalRow): Any = {
    val chrom = children(0).eval(input)
    val pos = children(1).eval(input)
    val ref = children(2).eval(input)
    val alt = children(3).eval(input)
    val strand = children(4).eval(input)
    val cs = children(5).eval(input)
    val ce = children(6).eval(input)
    if (chrom == null || pos == null || ref == null || alt == null ||
      strand == null || cs == null || ce == null) return null
    CsqKernel.csqLabel(
      genomeRef.get(chrom.toString), pos.asInstanceOf[Long],
      ref.asInstanceOf[UTF8String], alt.asInstanceOf[UTF8String],
      strand.asInstanceOf[UTF8String].toString == "+",
      cs.asInstanceOf[Long], ce.asInstanceOf[Long], flank.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("genome", genome,
      "graft.expressions.Genome")
    val gMap = ctx.addMutableState("java.util.HashMap", "csqGenomeMap",
      v => s"$v = $gRef.resolve();")
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull.code).mkString(" || ")
    val plusU = ctx.addReferenceObj("plusStr",
      UTF8String.fromString("+"), "org.apache.spark.unsafe.types.UTF8String")
    val code =
      s"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!($anyNull)) {
         |  ${ev.value} = graft.expressions.CsqKernel.csqLabel(
         |    (String) $gMap.get(${evals(0).value}.toString()),
         |    ${evals(1).value}, ${evals(2).value}, ${evals(3).value},
         |    ${evals(4).value}.equals($plusU),
         |    ${evals(5).value}, ${evals(6).value}, ${flank}L);
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CsqLabelExpr =
    copy(children = newChildren)
}

/** (chrom, pos, alt, strand, cds_start, cds_end) → struct(codon_index,
  * ref_codon, alt_codon, aa_ref, aa_alt) for a coding SNP (see
  * [[CsqKernel.snpCodon]]); callers guard with gene-non-null, isSnp
  * and in-CDS. Null on any null input or an absent contig.
  */
case class SnpCodonExpr(genome: Genome, children: Seq[Expression])
    extends Expression {
  require(children.length == 6,
    s"snp_codon expects (chrom, pos, alt, strand, cds_start, cds_end), " +
      s"got ${children.length} children")
  override def prettyName: String = "snp_codon"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("codon_index", LongType, nullable = false),
    StructField("ref_codon", StringType, nullable = false),
    StructField("alt_codon", StringType, nullable = false),
    StructField("aa_ref", StringType, nullable = true),
    StructField("aa_alt", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, LongType, StringType, StringType, LongType,
          LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, bigint, string, string, bigint, " +
          s"bigint), got $other")
    }

  @transient private lazy val genomeRef = genome.resolve()

  override def eval(input: InternalRow): Any = {
    val chrom = children(0).eval(input)
    val pos = children(1).eval(input)
    val alt = children(2).eval(input)
    val strand = children(3).eval(input)
    val cs = children(4).eval(input)
    val ce = children(5).eval(input)
    if (chrom == null || pos == null || alt == null || strand == null ||
      cs == null || ce == null) return null
    CsqKernel.snpCodon(
      genomeRef.get(chrom.toString), pos.asInstanceOf[Long],
      alt.asInstanceOf[UTF8String],
      strand.asInstanceOf[UTF8String].toString == "+",
      cs.asInstanceOf[Long], ce.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("genome", genome,
      "graft.expressions.Genome")
    val gMap = ctx.addMutableState("java.util.HashMap", "snpGenomeMap",
      v => s"$v = $gRef.resolve();")
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull.code).mkString(" || ")
    val plusU = ctx.addReferenceObj("plusStr",
      UTF8String.fromString("+"), "org.apache.spark.unsafe.types.UTF8String")
    val code =
      s"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
         |if (!($anyNull)) {
         |  ${ev.value} = graft.expressions.CsqKernel.snpCodon(
         |    (String) $gMap.get(${evals(0).value}.toString()),
         |    ${evals(1).value}, ${evals(2).value},
         |    ${evals(3).value}.equals($plusU),
         |    ${evals(4).value}, ${evals(5).value});
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SnpCodonExpr =
    copy(children = newChildren)
}

/** Exon-model consequence kernels — the [[CsqKernel]] treatment for
  * [[graft.operators.Consequence.snpConsequenceExons]] and
  * [[graft.operators.Consequence.csqExons]]: one compiled call per
  * (site, gene) row over the per-gene sorted exon array, replacing the
  * staged CodegenFallback HOF columns (containing-exon filter, per-base
  * c-space lookups, facing-edge scan) that each ran interpreted per
  * row. Exactness contract as [[CsqKernel]]; ExonCsqKernelSpec pins
  * kernel ≡ the previous staged-Column implementation.
  */
object ExonCsqKernel {

  import org.apache.spark.sql.catalyst.util.ArrayData

  private def u(s: String) = UTF8String.fromString(s)
  private val Synonymous = u("synonymous")
  private val Missense = u("missense")
  private val StopGained = u("stop_gained")
  private val StopLost = u("stop_lost")
  private val StartLost = u("start_lost")
  private val Unresolved = u("unresolved")
  private val Frameshift = u("frameshift")
  private val InframeIns = u("inframe_insertion")
  private val InframeDel = u("inframe_deletion")
  private val SpliceDonor = u("splice_donor")
  private val SpliceAcceptor = u("splice_acceptor")
  private val SpliceRegion = u("splice_region")
  private val Intron = u("intron")
  private val Intergenic = u("intergenic")
  private val Complex = u("complex")

  private val AA =
    "KNKNTTTTRSRSIIMIQHQHPPPPRRRRLLLLEDEDAAAAGGGGVVVV*Y*YSSSS*CWCLFLF"

  @inline private def baseIdx(c: Char): Int = c match {
    case 'A' => 0
    case 'C' => 1
    case 'G' => 2
    case 'T' => 3
    case _ => -1
  }

  /** element_at(GeneticCode, codon): null (0) unless exactly 3
    * uppercase ACGT chars; `codon` may be null. */
  @inline private def aaOf(s: String): Char = {
    if (s == null || s.length != 3) return 0.toChar
    val i0 = baseIdx(s.charAt(0))
    val i1 = baseIdx(s.charAt(1))
    val i2 = baseIdx(s.charAt(2))
    if (i0 < 0 || i1 < 0 || i2 < 0) 0.toChar
    else AA.charAt(16 * i0 + 4 * i1 + i2)
  }

  private def revComp(s: String): String = {
    if (s == null) return null
    val n = s.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      out(n - 1 - i) = c match {
        case 'A' => 'T'
        case 'C' => 'G'
        case 'G' => 'C'
        case 'T' => 'A'
        case other => other
      }
      i += 1
    }
    new String(out)
  }

  /** translate(c, "ACGT", "TGCA") on a 0/1-char base string. */
  private def compl(s: String): String = {
    if (s == null || s.isEmpty) return s
    s.charAt(0) match {
      case 'A' => "T"
      case 'C' => "G"
      case 'G' => "C"
      case 'T' => "A"
      case _ => s
    }
  }

  /** SQL SUBSTR clamp semantics (see [[CsqKernel]]). */
  private def substrSql(s: String, pos: Int, len: Int): String = {
    if (s == null) return null
    val n = s.length
    val start = if (pos > 0) pos - 1 else if (pos < 0) n + pos else 0
    if (len <= 0) return ""
    val end = start.toLong + len
    val s0 = math.max(start, 0)
    val e0 = math.min(end, n.toLong).toInt
    if (s0 >= n || e0 <= s0) "" else s.substring(s0, e0)
  }

  @inline private def pmod3(x: Long): Long = ((x % 3) + 3) % 3

  @inline private def exS(ex: ArrayData, i: Int): Long =
    ex.getStruct(i, 3).getLong(0)
  @inline private def exE(ex: ArrayData, i: Int): Long =
    ex.getStruct(i, 3).getLong(1)
  @inline private def exCum(ex: ArrayData, i: Int): Long =
    ex.getStruct(i, 3).getLong(2)

  /** First exon (array order) containing genome position `pos`, −1 if
    * none — try_element_at(filter(__ex, s <= pos <= e), 1). */
  private def findExon(ex: ArrayData, pos: Long): Int = {
    var i = 0
    val n = ex.numElements()
    while (i < n) {
      if (pos >= exS(ex, i) && pos <= exE(ex, i)) return i
      i += 1
    }
    -1
  }

  /** Transcript-offset → genome base through the exon array (see
    * exonBaseAt): null when no exon holds the c-offset or the contig is
    * absent; "" when the genome is too short; '−' complements the
    * single char. */
  private def baseAt(genome: String, ex: ArrayData, total: Long,
      plus: Boolean, t: Long): String = {
    val cT = if (plus) t else total - 1L - t
    var i = 0
    val n = ex.numElements()
    while (i < n) {
      val cum = exCum(ex, i)
      if (cT >= cum && cT < cum + (exE(ex, i) - exS(ex, i) + 1L)) {
        val g = exS(ex, i) + (cT - cum)
        val b = substrSql(genome, g.toInt, 1)
        if (b == null) return null
        return if (plus) b else compl(b)
      }
      i += 1
    }
    null
  }

  /** concat of three nullable base strings — null if ANY is null. */
  @inline private def concat3(a: String, b: String, c: String): String =
    if (a == null || b == null || c == null) null else a + b + c

  /** Span-aware facing-edge splice ladder: nearest (distance, side)
    * over all exon edges (lexicographic min — ties take side 0), then
    * donor/acceptor (1–2) / splice_region (3–flank) / intron (inside
    * the gene span) / intergenic. `p0` is the left-facing probe (dHi
    * for dels), `p1` the right-facing probe (dLo for dels, pos+1 for
    * insertion points). */
  private def spliceLabel(ex: ArrayData, plus: Boolean, p0: Long,
      p1: Long, inSpan: Boolean, flank: Long): UTF8String = {
    var bestD = Long.MaxValue
    var bestSide = 1
    var i = 0
    val n = ex.numElements()
    while (i < n) {
      val d0 = exS(ex, i) - p0
      if (d0 > 0 && (d0 < bestD || (d0 == bestD && bestSide > 0))) {
        bestD = d0; bestSide = 0
      }
      val d1 = p1 - exE(ex, i)
      if (d1 > 0 && d1 < bestD) { bestD = d1; bestSide = 1 }
      i += 1
    }
    val donor = (plus && bestSide == 1) || (!plus && bestSide == 0)
    if (bestD >= 1L && bestD <= 2L) {
      if (donor) SpliceDonor else SpliceAcceptor
    } else if (bestD >= 3L && bestD <= flank) SpliceRegion
    else if (inSpan) Intron
    else Intergenic
  }

  /** [[graft.operators.Consequence.snpConsequenceExons]]'s per-row walk
    * for a non-symbolic SNP in a gene: struct(codon_index, ref_codon,
    * alt_codon, aa_ref, aa_alt, consequence) — coding fields null on
    * the splice/intron path, consequence always set. */
  def exonSnp(genome: String, pos: Long, altU: UTF8String, plus: Boolean,
      ex: ArrayData, total: Long, gs: Long, ge: Long,
      flank: Long): GenericInternalRow = {
    val ix = findExon(ex, pos)
    if (ix < 0) {
      val label = spliceLabel(ex, plus, pos, pos,
        pos >= gs && pos <= ge, flank)
      return new GenericInternalRow(
        Array[Any](null, null, null, null, null, label))
    }
    val c = exCum(ex, ix) + (pos - exS(ex, ix))
    val o = if (plus) c else total - 1L - c
    val ci = (o - pmod3(o)) / 3L
    val ph = pmod3(o)
    val t0 = 3L * ci
    val b0 = baseAt(genome, ex, total, plus, t0)
    val b1 = baseAt(genome, ex, total, plus, t0 + 1L)
    val b2 = baseAt(genome, ex, total, plus, t0 + 2L)
    val alt = altU.toString
    val altBase = if (plus) alt else compl(alt)
    val rcod = concat3(b0, b1, b2)
    val acod = concat3(
      if (ph == 0L) altBase else b0,
      if (ph == 1L) altBase else b1,
      if (ph == 2L) altBase else b2)
    val aaR = aaOf(rcod)
    val aaA = aaOf(acod)
    val label =
      if (aaR == 0.toChar || aaA == 0.toChar) Unresolved
      else if (aaR == aaA) Synonymous
      else if (aaA == '*') StopGained
      else if (aaR == '*') StopLost
      else Missense
    new GenericInternalRow(Array[Any](ci,
      if (rcod == null) null else u(rcod),
      if (acod == null) null else u(acod),
      if (aaR == 0.toChar) null else u(aaR.toString),
      if (aaA == 0.toChar) null else u(aaA.toString),
      label))
  }

  /** [[graft.operators.Consequence.csqExons]]'s whole post-join ladder
    * for a non-symbolic site in a gene — SNP codon walk, same-exon
    * insertion window with the strand-adjusted slot splice, c-space
    * deletion range with per-base junction codons, span-aware splice
    * ladder. */
  def exonCsqLabel(genome: String, pos: Long, refU: UTF8String,
      altU: UTF8String, plus: Boolean, ex: ArrayData, total: Long,
      gs: Long, ge: Long, flank: Long): UTF8String = {
    val ref = refU.toString
    val alt = altU.toString
    val refLen = ref.length.toLong
    val altLen = alt.length.toLong
    val isSnp = refLen == 1L && altLen == 1L
    val isIns = refLen == 1L && altLen > 1L && alt.charAt(0) == ref.charAt(0)
    val isDel = altLen == 1L && refLen > 1L && ref.charAt(0) == alt.charAt(0)
    if (!isSnp && !isIns && !isDel) return Complex
    val dLo = pos + 1L
    val dHi = pos + refLen - 1L

    if (isSnp) {
      exonSnp(genome, pos, altU, plus, ex, total, gs, ge, flank)
        .get(5, StringType).asInstanceOf[UTF8String]
    } else if (isIns) {
      val ix = findExon(ex, pos)
      val insCoding = ix >= 0 && pos < exE(ex, ix)
      if (insCoding) {
        val m = altLen - 1L
        if (pmod3(m) != 0L) Frameshift
        else {
          val c = exCum(ex, ix) + (pos - exS(ex, ix))
          val o = if (plus) c else total - 1L - c
          val ph = pmod3(o)
          val t0 = 3L * ((o - ph) / 3L)
          val codon = concat3(
            baseAt(genome, ex, total, plus, t0),
            baseAt(genome, ex, total, plus, t0 + 1L),
            baseAt(genome, ex, total, plus, t0 + 2L))
          if (codon == null) InframeIns // null window — the Column quirk
          else {
            val insT = if (plus) alt.substring(1)
              else revComp(alt.substring(1))
            val k = if (plus) ph else ph - 1L
            val win = substrSql(codon, 1, (k + 1L).toInt) + insT +
              substrSql(codon, (k + 2L).toInt, (2L - k).toInt)
            val nCod = win.length / 3
            if (nCod == 0) Unresolved // sequence(1,0) descends (Column quirk)
            else {
              var anyNull = false
              var anyStop = false
              var i = 0
              while (i < nCod) {
                val a = aaOf(win.substring(3 * i, 3 * i + 3))
                if (a == 0.toChar) anyNull = true
                else if (a == '*') anyStop = true
                i += 1
              }
              if (anyNull) Unresolved
              else if (anyStop) StopGained
              else InframeIns
            }
          }
        }
      } else spliceLabel(ex, plus, pos, pos + 1L,
        pos >= gs && pos <= ge, flank)
    } else { // deletion
      // deleted exonic c-range [cA, cB]
      var cA = Long.MaxValue
      var cB = -1L
      var i = 0
      val n = ex.numElements()
      while (i < n) {
        val s = exS(ex, i)
        val e = exE(ex, i)
        if (math.min(dHi, e) >= math.max(dLo, s)) {
          val lo = exCum(ex, i) + math.max(dLo - s, 0L)
          val hi = exCum(ex, i) + math.min(dHi, e) - s
          if (lo < cA) cA = lo
          if (hi > cB) cB = hi
        }
        i += 1
      }
      if (cA != Long.MaxValue) {
        val mDel = cB - cA + 1L
        if (pmod3(mDel) != 0L) Frameshift
        else {
          val oA = if (plus) cA else total - 1L - cB
          val oB = if (plus) cB else total - 1L - cA
          if (oA <= 2L) StartLost
          else if (oB >= total - 3L) StopLost
          else {
            val jStart = oA - pmod3(oA)
            def junOff(j: Int): Long = {
              val off = jStart + j.toLong
              if (off < oA) off else off + (oB - oA + 1L)
            }
            val junAa = aaOf(concat3(
              baseAt(genome, ex, total, plus, junOff(0)),
              baseAt(genome, ex, total, plus, junOff(1)),
              baseAt(genome, ex, total, plus, junOff(2))))
            if (junAa == 0.toChar) Unresolved
            else if (junAa == '*') StopGained
            else InframeDel
          }
        }
      } else spliceLabel(ex, plus, dHi, dLo,
        dHi >= gs && dLo <= ge, flank)
    }
  }
}

/** (chrom, pos, alt, strand, __ex, __total, __gs, __ge) →
  * struct(codon_index, ref_codon, alt_codon, aa_ref, aa_alt,
  * consequence) for a non-symbolic SNP in a gene (see
  * [[ExonCsqKernel.exonSnp]]). Null on any null input. */
case class ExonSnpExpr(genome: Genome, flank: Int,
    children: Seq[Expression]) extends Expression {
  require(children.length == 8,
    s"exon_snp expects 8 children, got ${children.length}")
  override def prettyName: String = "exon_snp"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("codon_index", LongType, nullable = true),
    StructField("ref_codon", StringType, nullable = true),
    StructField("alt_codon", StringType, nullable = true),
    StructField("aa_ref", StringType, nullable = true),
    StructField("aa_alt", StringType, nullable = true),
    StructField("consequence", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, LongType, StringType, StringType,
          ArrayType(_: StructType, _), LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName got unexpected input types: $other")
    }

  @transient private lazy val genomeRef = genome.resolve()

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    ExonCsqKernel.exonSnp(
      genomeRef.get(vs(0).toString), vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[UTF8String],
      vs(3).asInstanceOf[UTF8String].toString == "+",
      vs(4).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(5).asInstanceOf[Long], vs(6).asInstanceOf[Long],
      vs(7).asInstanceOf[Long], flank.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("genome", genome,
      "graft.expressions.Genome")
    val gMap = ctx.addMutableState("java.util.HashMap", "exonGenomeMap",
      v => s"$v = $gRef.resolve();")
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull.code).mkString(" || ")
    val plusU = ctx.addReferenceObj("plusStr",
      UTF8String.fromString("+"), "org.apache.spark.unsafe.types.UTF8String")
    val code =
      s"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
         |if (!($anyNull)) {
         |  ${ev.value} = graft.expressions.ExonCsqKernel.exonSnp(
         |    (String) $gMap.get(${evals(0).value}.toString()),
         |    ${evals(1).value}, ${evals(2).value},
         |    ${evals(3).value}.equals($plusU),
         |    ${evals(4).value}, ${evals(5).value}, ${evals(6).value},
         |    ${evals(7).value}, ${flank}L);
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExonSnpExpr =
    copy(children = newChildren)
}

/** (chrom, pos, ref, alt, strand, __ex, __total, __gs, __ge) →
  * consequence label for a non-symbolic site in a gene (see
  * [[ExonCsqKernel.exonCsqLabel]]). Null on any null input. */
case class ExonCsqLabelExpr(genome: Genome, flank: Int,
    children: Seq[Expression]) extends Expression {
  require(children.length == 9,
    s"exon_csq_label expects 9 children, got ${children.length}")
  override def prettyName: String = "exon_csq_label"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, LongType, StringType, StringType, StringType,
          ArrayType(_: StructType, _), LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName got unexpected input types: $other")
    }

  @transient private lazy val genomeRef = genome.resolve()

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    ExonCsqKernel.exonCsqLabel(
      genomeRef.get(vs(0).toString), vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[UTF8String], vs(3).asInstanceOf[UTF8String],
      vs(4).asInstanceOf[UTF8String].toString == "+",
      vs(5).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vs(6).asInstanceOf[Long], vs(7).asInstanceOf[Long],
      vs(8).asInstanceOf[Long], flank.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gRef = ctx.addReferenceObj("genome", genome,
      "graft.expressions.Genome")
    val gMap = ctx.addMutableState("java.util.HashMap", "exonGenomeMap",
      v => s"$v = $gRef.resolve();")
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull.code).mkString(" || ")
    val plusU = ctx.addReferenceObj("plusStr",
      UTF8String.fromString("+"), "org.apache.spark.unsafe.types.UTF8String")
    val code =
      s"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!($anyNull)) {
         |  ${ev.value} = graft.expressions.ExonCsqKernel.exonCsqLabel(
         |    (String) $gMap.get(${evals(0).value}.toString()),
         |    ${evals(1).value}, ${evals(2).value}, ${evals(3).value},
         |    ${evals(4).value}.equals($plusU),
         |    ${evals(5).value}, ${evals(6).value}, ${evals(7).value},
         |    ${evals(8).value}, ${flank}L);
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExonCsqLabelExpr =
    copy(children = newChildren)
}

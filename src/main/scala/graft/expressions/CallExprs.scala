package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-call VCF genotype kernels. */
object CallFromPlKernel {

  /** The [[graft.operators.VariantAnnotator.callFromPl]] per-call
    * computation as ONE compiled kernel: given the record's FORMAT,
    * ALT and one sample's call string, return the REWRITTEN call
    * (argmin-PL genotype replacing the GT subfield) or NULL meaning
    * "keep the original" — the exact semantics of the previous
    * Column-level single-fold, entry for entry:
    *
    *  - FORMAT's first colon-field must be GT and ALT ≠ `.`;
    *  - the PL subfield (first `plKey` position in FORMAT; the call
    *    must carry that many subfields) splits on `,` keeping
    *    empties; every entry must be pure digits fitting an Int
    *    (mirroring the non-ANSI `cast("int")` — overflow → null →
    *    "bad"), the entry count must equal (nAlts+1)(nAlts+2)/2,
    *    and ties keep the FIRST minimum (strict compare);
    *  - an all-Int.MaxValue vector leaves argmin at −1 → keep (the
    *    fold's `xv < MaxValue` strictness);
    *  - the emitted call is `j/k` (triangular-index inverse, same
    *    double-sqrt formula) + the original call from its first `:`.
    *
    * Why a kernel: inside `transform_values` every Column node is
    * interpreted with NO common-subexpression reuse — the fold
    * allocated a struct + several UTF8Strings per PL entry per call,
    * and the sf0.1 gate spent 17 of its 20 wall seconds in GC. One
    * static call per map entry allocates the output string and one
    * split array, nothing else.
    */
  def rewrite(formatU: UTF8String, altU: UTF8String, callU: UTF8String,
      plKey: String): UTF8String = {
    val format = formatU.toString
    // GT must be subfield 1
    val fEnd = { val c = format.indexOf(':'); if (c < 0) format.length else c }
    if (fEnd != 2 || format.charAt(0) != 'G' || format.charAt(1) != 'T')
      return null
    val alt = altU.toString
    if (alt == ".") return null
    var nAlts = 1
    var ai = 0
    while (ai < alt.length) { if (alt.charAt(ai) == ',') nAlts += 1; ai += 1 }
    val nGt = (nAlts + 1) * (nAlts + 2) / 2
    // 1-based position of plKey among FORMAT subfields
    var pi = -1
    var fieldNo = 1
    var fs = 0
    while (pi < 0 && fs <= format.length) {
      val fe = { val c = format.indexOf(':', fs); if (c < 0) format.length else c }
      if (fe - fs == plKey.length && format.regionMatches(fs, plKey, 0,
          plKey.length)) pi = fieldNo
      fieldNo += 1
      fs = fe + 1
    }
    if (pi < 0) return null
    val call = callU.toString
    // locate the pi-th colon-subfield of the call
    var cs = 0
    var no = 1
    var plS = -1; var plE = -1
    while (plS < 0 && cs <= call.length) {
      val ce = { val c = call.indexOf(':', cs); if (c < 0) call.length else c }
      if (no == pi) { plS = cs; plE = ce }
      no += 1
      cs = ce + 1
    }
    if (plS < 0) return null // call carries no such subfield
    // fold over the comma-split PL (empties kept)
    var minV = Int.MaxValue
    var argmin = -1
    var pos = 0
    var bad = false
    var es = plS
    var done = false
    while (!done) {
      val ee = {
        val c = call.indexOf(',', es)
        if (c < 0 || c > plE) plE else c
      }
      // parse pure-digit int, overflow → bad (non-ANSI cast semantics)
      var v = 0L
      var ok = ee > es
      var i = es
      while (ok && i < ee) {
        val ch = call.charAt(i)
        if (ch < '0' || ch > '9') ok = false
        else {
          v = v * 10 + (ch - '0')
          if (v > Int.MaxValue) ok = false
        }
        i += 1
      }
      if (!ok) bad = true
      else if (v < minV) { minV = v.toInt; argmin = pos }
      pos += 1
      if (ee >= plE) done = true else es = ee + 1
    }
    if (bad || pos != nGt || argmin < 0) return null
    // triangular-index inverse, the fold's exact double formula
    val k = math.floor((math.sqrt(argmin * 8.0 + 1.0) - 1.0) / 2.0).toInt
    val j = argmin - k * (k + 1) / 2
    val gtEnd = { val c = call.indexOf(':'); if (c < 0) call.length else c }
    val sb = new java.lang.StringBuilder(call.length + 4)
    sb.append(j).append('/').append(k).append(call, gtEnd, call.length)
    UTF8String.fromString(sb.toString)
  }
}

/** (format, alt, call) → rewritten call or NULL=keep (see
  * [[CallFromPlKernel.rewrite]]); `plKey` rides the expression as a
  * literal parameter. */
case class CallFromPlExpr(format: Expression, alt: Expression,
    call: Expression, plKey: String) extends TernaryExpression {
  override def first: Expression = format
  override def second: Expression = alt
  override def third: Expression = call
  override def prettyName: String = "call_from_pl"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(format, alt, call).map(_.dataType) match {
      case Seq(StringType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string, string), got $other")
    }

  override protected def nullSafeEval(f: Any, a: Any, c: Any): Any =
    CallFromPlKernel.rewrite(f.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String], plKey)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("plKey", plKey, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (f, a, c) => s"""
      ${ev.value} = graft.expressions.CallFromPlKernel.rewrite($f, $a, $c, $keyRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CallFromPlExpr =
    copy(format = newFirst, alt = newSecond, call = newThird)
}

/** [[graft.operators.Gvcf.jointGenotype]]'s per-record PL argmin —
  * (min, first-argmin, second-min, arity, malformed) in ONE compiled
  * pass over the PL string, finishing to struct(cgt, gq) or null
  * exactly like the previous Column `aggregate` fold (which ran
  * interpreted per row — the q213 lesson, third body): strict-<
  * first-minimum ties, digits-only ≤ 9-char entries (the non-ANSI
  * overflow guard), trailing empties kept, diploid triangular
  * inversion via the IDENTICAL double-sqrt formula, haploid
  * nAlts+1-arity records emitting the argmin allele index, everything
  * else (wrong arity, malformed entry, < 2 entries) null = "keep the
  * original GT".
  */
object JointCallKernel {
  def call(plU: UTF8String, altU: UTF8String): GenericInternalRow = {
    val pl = plU.toString
    val alt = altU.toString
    var nAlts = 1
    var ai = 0
    while (ai < alt.length) { if (alt.charAt(ai) == ',') nAlts += 1; ai += 1 }
    val nGt = (nAlts + 1) * (nAlts + 2) / 2
    var minV = Int.MaxValue
    var argmin = -1
    var v2 = Int.MaxValue
    var pos = 0
    var bad = false
    var es = 0
    var done = false
    while (!done) {
      val ee = { val c = pl.indexOf(',', es); if (c < 0) pl.length else c }
      var v = 0L
      var ok = ee > es && ee - es <= 9
      var i = es
      while (ok && i < ee) {
        val ch = pl.charAt(i)
        if (ch < '0' || ch > '9') ok = false else v = v * 10 + (ch - '0')
        i += 1
      }
      if (!ok) bad = true
      else {
        val xv = v.toInt
        if (xv < minV) { v2 = minV; argmin = pos; minV = xv }
        else if (xv < v2) v2 = xv
      }
      pos += 1
      if (ee >= pl.length) done = true else es = ee + 1
    }
    if (bad || pos < 2 || argmin < 0) return null
    val gq = v2 - minV
    if (pos == nGt) {
      val k = math.floor((math.sqrt(argmin * 8.0 + 1.0) - 1.0) / 2.0).toInt
      val j = argmin - k * (k + 1) / 2
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(s"$j/$k"), gq))
    } else if (pos == nAlts + 1 && pos != nGt) {
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(argmin.toString), gq))
    } else null
  }
}

/** (pl, alt) → struct(cgt, gq) or null (see [[JointCallKernel]]). */
case class JointCallExpr(pl: Expression, alt: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = pl
  override def right: Expression = alt
  override def prettyName: String = "joint_call_pl"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("cgt", StringType, nullable = true),
    StructField("gq", IntegerType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    (pl.dataType, alt.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got $other")
    }

  override protected def nullSafeEval(p: Any, a: Any): Any =
    JointCallKernel.call(p.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a) => s"""
      ${ev.value} = graft.expressions.JointCallKernel.call($p, $a);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JointCallExpr =
    copy(pl = newLeft, alt = newRight)
}

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

/** [[graft.operators.VariantAnnotator.removeTags]]' per-row strips as
  * compiled kernels — the Column form ran `filter`/`split`/
  * `try_element_at` HOF trees INTERPRETED per call entry (q224's
  * 114 exec-core-s). Each static mirrors its Column twin entry for
  * entry: split keeps trailing empties (Java split limit -1), the
  * INFO key is the text before the FIRST `=` (bare FLAGs match
  * whole), a NULL format keeps every call subfield, emptied strings
  * land as `.`, tag matching is exact (the `isin` contract).
  */
object TagStripKernel {
  private val Dot = UTF8String.fromString(".")

  /** Per-thread (format string → parts) memo: transform_values
    * invokes [[stripCall]] once per genotype-map ENTRY, so an
    * S-sample row would re-split the identical FORMAT string S times
    * — tasks are single-threaded per partition, so a last-hit
    * ThreadLocal is race-free and hits on every entry after a row's
    * first. */
  private val lastFmt =
    new ThreadLocal[(String, Array[String])]()

  /** Java `split(sep, -1)` for a single literal char — trailing
    * empties kept, "" → [""]. */
  private def splitKeep(s: String, sep: Char): Array[String] = {
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == sep) n += 1; i += 1 }
    val out = new Array[String](n)
    var k = 0
    var st = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out(k) = s.substring(st, i); k += 1; st = i + 1 }
      i += 1
    }
    out(k) = s.substring(st)
    out
  }

  private def has(tags: Array[String], k: String): Boolean = {
    var i = 0
    while (i < tags.length) { if (tags(i) == k) return true; i += 1 }
    false
  }

  private def joinOrDot(parts: Array[String], keep: Array[Boolean],
      sep: Char): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var first = true
    var i = 0
    while (i < parts.length) {
      if (keep(i)) {
        if (!first) sb.append(sep)
        sb.append(parts(i))
        first = false
      }
      i += 1
    }
    if (sb.length == 0) Dot
    else UTF8String.fromString(sb.toString)
  }

  /** INFO strip: NULL info = "" (→ "."), whole `;`-entries whose key
    * (before the first `=`) matches drop. NEVER null. */
  def stripInfo(infoU: UTF8String, tags: Array[String]): UTF8String = {
    val info = if (infoU == null) "" else infoU.toString
    val parts = splitKeep(info, ';')
    val keep = new Array[Boolean](parts.length)
    var i = 0
    while (i < parts.length) {
      val e = parts(i)
      val eq = e.indexOf('=')
      val key = if (eq < 0) e else e.substring(0, eq)
      keep(i) = !has(tags, key)
      i += 1
    }
    joinOrDot(parts, keep, ';')
  }

  /** FORMAT strip: keys matching drop; NULL stays NULL; emptied → ".". */
  def stripFormat(fmtU: UTF8String, tags: Array[String]): UTF8String = {
    if (fmtU == null) return null
    val parts = splitKeep(fmtU.toString, ':')
    val keep = new Array[Boolean](parts.length)
    var i = 0
    while (i < parts.length) { keep(i) = !has(tags, parts(i)); i += 1 }
    joinOrDot(parts, keep, ':')
  }

  /** CALL strip through the row's OWN format layout: subfield i drops
    * iff format key i matches; a call longer than FORMAT keeps its
    * tail (key "" never matches); NULL call stays NULL; NULL format
    * keeps everything; emptied → ".". */
  def stripCall(callU: UTF8String, fmtU: UTF8String,
      tags: Array[String]): UTF8String = {
    if (callU == null) return null
    val parts = splitKeep(callU.toString, ':')
    val fmt =
      if (fmtU == null) null
      else {
        val f = fmtU.toString
        val hit = lastFmt.get()
        if (hit != null && hit._1 == f) hit._2
        else {
          val ps = splitKeep(f, ':')
          lastFmt.set((f, ps))
          ps
        }
      }
    val keep = new Array[Boolean](parts.length)
    var i = 0
    while (i < parts.length) {
      val key = if (fmt != null && i < fmt.length) fmt(i) else ""
      keep(i) = !has(tags, key)
      i += 1
    }
    joinOrDot(parts, keep, ':')
  }
}

/** (info) → tag-stripped info (see [[TagStripKernel.stripInfo]];
  * NULL-tolerant, never returns null). */
case class StripInfoExpr(info: Expression, tags: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val tagsArr = tags.toArray
  override def child: Expression = info
  override def prettyName: String = "strip_info_tags"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = info.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TagStripKernel.stripInfo(
      info.eval(input).asInstanceOf[UTF8String], tagsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagsRef = ctx.addReferenceObj("tags", tagsArr, "java.lang.String[]")
    val c = info.genCode(ctx)
    val code =
      s"""
         |${c.code.toString}
         |UTF8String ${ev.value} = graft.expressions.TagStripKernel.stripInfo(
         |  ${c.isNull} ? null : ${c.value}, $tagsRef);
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): StripInfoExpr =
    copy(info = newChild)
}

/** (format) → tag-stripped format (see [[TagStripKernel.stripFormat]]). */
case class StripFormatExpr(format: Expression, tags: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val tagsArr = tags.toArray
  override def child: Expression = format
  override def prettyName: String = "strip_format_tags"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = format.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override protected def nullSafeEval(f: Any): Any =
    TagStripKernel.stripFormat(f.asInstanceOf[UTF8String], tagsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagsRef = ctx.addReferenceObj("tags", tagsArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, f => s"""
      ${ev.value} = graft.expressions.TagStripKernel.stripFormat($f, $tagsRef);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): StripFormatExpr =
    copy(format = newChild)
}

/** (call, format) → tag-stripped call through the row's own layout
  * (see [[TagStripKernel.stripCall]]; a NULL format keeps every
  * subfield, so only the call side gates nullness). */
case class StripCallExpr(call: Expression, format: Expression,
    tags: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  @transient private lazy val tagsArr = tags.toArray
  override def left: Expression = call
  override def right: Expression = format
  override def prettyName: String = "strip_call_tags"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (call.dataType, format.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got $other")
    }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = call.eval(input)
    if (c == null) null
    else TagStripKernel.stripCall(c.asInstanceOf[UTF8String],
      format.eval(input).asInstanceOf[UTF8String], tagsArr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagsRef = ctx.addReferenceObj("tags", tagsArr, "java.lang.String[]")
    val c = call.genCode(ctx)
    val f = format.genCode(ctx)
    val code =
      s"""
         |${c.code.toString}
         |boolean ${ev.isNull} = ${c.isNull};
         |UTF8String ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${f.code.toString}
         |  ${ev.value} = graft.expressions.TagStripKernel.stripCall(
         |    ${c.value}, ${f.isNull} ? null : ${f.value}, $tagsRef);
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripCallExpr =
    copy(call = newLeft, format = newRight)
}

/** [[graft.operators.Consequence.worstConsequence]]'s per-row
  * severity-rank min — `array_min(transform(split(csq, "&"), p →
  * element_at(rankMap, p)))` ran as an INTERPRETED HOF whose
  * literal-map lookup is a LINEAR UTF8String scan per term (q219's
  * hot projection). One compiled pass: split on '&' (trailing
  * empties kept, the Java split contract), each term hash-looked-up,
  * absent terms rank `severity.length`, minimum returned; NULL csq →
  * NULL.
  */
case class MinSeverityRankExpr(csq: Expression, severity: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    severity.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }
  override def child: Expression = csq
  override def prettyName: String = "min_severity_rank"
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = csq.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  private def minRank(s: String): Int = {
    val absent = severity.length
    var best = Int.MaxValue
    var st = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '&') {
        val r = rank.get(s.substring(st, i))
        val v = if (r == null) absent else r.intValue()
        if (v < best) best = v
        st = i + 1
      }
      i += 1
    }
    best
  }
  override protected def nullSafeEval(c: Any): Any =
    minRank(c.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("minRankExpr", this,
      "graft.expressions.MinSeverityRankExpr")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $selfRef.evalRank($c);
    """)
  }
  /** codegen entry — the kernel body on the resolved reference object. */
  def evalRank(c: UTF8String): Int = minRank(c.toString)
  override protected def withNewChildInternal(newChild: Expression): MinSeverityRankExpr =
    copy(csq = newChild)
}

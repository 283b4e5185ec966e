package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row hot paths. The builtin-HOF
  * formulations (zip_with/filter/aggregate) fall back to interpreted
  * evaluation and dominated the benchmark; these generate a single
  * static-method call inside WholeStageCodegen instead (bench: the
  * annotate pipeline dropped ~5×, minhash ~50× combined with the
  * long-form rewrite).
  */
object StringExprs {

  /** vartype(ref, allele) — reference variant_annotations.py:130-162. */
  def vartype(ref: Column, allele: Column): Column =
    Bridge.column(VartypeExpr(Bridge.expression(ref), Bridge.expression(allele)))

  /** Polynomial rolling hash h = (h*31 + codepoint) mod 1e9+7. */
  def rollingHash(s: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(s)))

  /** One-pass 32-bit simhash over an array<long> of token hashes. */
  def simhash32(tokenHashes: Column): Column =
    Bridge.column(Simhash32Expr(Bridge.expression(tokenHashes)))

  /** One-pass 64-bit simhash over an array<long> of DISTINCT token
    * hashes — bit-identical to Dedup.simhashTable's aggregation.
    */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(Simhash64Expr(Bridge.expression(tokenHashes)))

  /** Rolling-hash every element of an array<string> in one codegen'd
    * pass — the kernel form of `transform(tokens, rollingHash)`, which
    * as an array HOF is CodegenFallback (§8's banned pattern; this was
    * its last per-row streaming instance).
    */
  def tokenHashes(tokens: Column): Column =
    Bridge.column(TokenHashesExpr(Bridge.expression(tokens)))

  /** Hash every n-token window of an array<string> in one codegen'd
    * pass — the kernel form of
    * `transform(wordNgrams(tokens, n), rollingHash)`, which ran TWO
    * interpreted HOFs per row AND materialized every n-gram string.
    * Window w's hash ≡ `rollingHash(concat_ws(" ", tokens[w..w+n-1]))`
    * bit for bit (null tokens skipped like concat_ws); fewer than n
    * tokens → empty array.
    */
  def ngramHashes(tokens: Column, n: Int): Column =
    Bridge.column(NgramHashesExpr(Bridge.expression(tokens), n))

  /** One-pass k-permutation minhash signature over an array<long> of
    * shingle hashes.
    */
  def minhashSig(shingleHashes: Column, as: Seq[Long], bs: Seq[Long],
      mod: Long): Column =
    Bridge.column(MinhashSigExpr(Bridge.expression(shingleHashes), as, bs, mod))

  /** Content-defined chunk hashes (Rabin/FastCDC-style boundaries over
    * the [[rollHash]] polynomial): one O(L) pass maintaining the
    * rolling hash of the last `window` codepoints, cutting AFTER any
    * position whose window hash ≡ 0 (mod `modulus`), and emitting each
    * chunk's [[rollHash]]. Boundaries depend only on LOCAL content, so
    * an insertion early in a document shifts every byte yet re-syncs
    * the chunking within ~one window — the shifted-duplicate case both
    * exact dedup (whole-text hash) and fixed-size blocking miss.
    */
  def cdcChunkHashes(s: Column, window: Int, modulus: Int): Column =
    Bridge.column(CdcChunkHashesExpr(Bridge.expression(s), window, modulus))

  /** Token count under a TRAINED BPE merge table — the apply side of
    * the q140 pair-mining loop (count tokens under the tokenizer the
    * model will actually see; whitespace and regex counts mis-budget
    * exactly the high-merge text a tokenizer compresses most): greedy
    * highest-priority-first merging per pre-token, the GPT-2 apply
    * order. One codegen'd kernel call per row; the merge-rank table
    * rides the generated code as a reference object — zero shuffle,
    * zero state, scan-speed at any scale.
    */
  def bpeMergedCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeCountExpr(Bridge.expression(text), merges))

  /** The segmentation itself (array of surface tokens) — same kernel
    * as [[bpeMergedCount]]; prefer the count form in hot paths (no
    * per-token string materialization).
    */
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeSegmentExpr(Bridge.expression(text), merges))

  /** Count of Luhn-valid payment-card digit runs (maximal runs of
    * length 13–19 passing the ISO/IEC 7812 checksum) — the validated
    * complement of the q24 regex PII counters: a random 16-digit id
    * fails the checksum 90% of the time, so validation cuts the
    * false-positive mass an order of magnitude. One codegen'd scan
    * per row, zero shuffle.
    */
  def luhnCardCount(text: Column): Column =
    Bridge.column(LuhnCountExpr(Bridge.expression(text)))

  /** Replace Luhn-valid card runs with `<CC>` — same scan as
    * [[luhnCardCount]]; non-matching text returns the INPUT reference
    * (no copy on the common no-PII path). */
  def redactLuhnCards(text: Column): Column =
    Bridge.column(LuhnRedactExpr(Bridge.expression(text)))

  val HashMod = 1000000007L

  // ---- shared scalar kernels (called from generated code) -------------

  /** Rank lookup for the BPE kernels: pair "l<NUL>r" (NUL-joined) → merge priority
    * (list index — LOWER merges first, the trained order). First
    * occurrence wins on duplicates.
    */
  def bpeRanks(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { case (l, r) =>
      val k = l + "\u0000" + r
      if (!m.containsKey(k)) m.put(k, Integer.valueOf(i))
      i += 1
    }
    m
  }

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  // exactly java.util.regex \s — the BpePattern's whitespace class
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Greedy BPE over one pre-token span [start, end): start from
    * single-char symbols, repeatedly take the LOWEST-rank adjacent
    * pair present and merge every left-to-right occurrence of it —
    * the canonical trained-merges apply order. Pre-tokens are short
    * (letter/digit runs), so the quadratic scan is bounded by word
    * length, not document length.
    */
  private def bpeMergeSpan(str: String, start: Int, end: Int,
      ranks: java.util.HashMap[String, Integer])
      : scala.collection.mutable.ArrayBuffer[String] = {
    val parts = new scala.collection.mutable.ArrayBuffer[String](end - start)
    var k = start
    while (k < end) { parts += String.valueOf(str.charAt(k)); k += 1 }
    if (parts.length <= 1 || ranks.isEmpty) return parts
    var done = false
    while (!done) {
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < parts.length - 1) {
        val r = ranks.get(parts(j) + "\u0000" + parts(j + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val l = parts(bi)
        val rr = parts(bi + 1)
        val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var rd = 0
        while (rd < parts.length) {
          if (rd < parts.length - 1 && parts(rd) == l && parts(rd + 1) == rr) {
            out += l + rr; rd += 2
          } else { out += parts(rd); rd += 1 }
        }
        parts.clear(); parts ++= out
      }
    }
    parts
  }

  /** Pre-tokenize exactly like [[graft.functions.TextFunctions
    * .BpePattern]] (ASCII letter runs, ASCII digit runs, single
    * non-alnum code points; \s skipped) and fold `onSpan`/`onPunct`
    * over the stream. True-BPE floor semantics: an EMPTY merge table
    * yields one token per non-whitespace code point (what an untrained
    * byte/char BPE produces); merging only ever SHRINKS the count, and
    * a pre-token can never drop below one token — so the count is
    * always in [regex pre-token count, non-ws codepoint count], both
    * bounds spec-pinned.
    */
  private def bpeScan(str: String,
      onSpan: (Int, Int) => Unit, onPunct: (Int, Int) => Unit): Unit = {
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (isWs(c)) i += 1
      else if (isAsciiLetter(c)) {
        val st = i
        while (i < n && isAsciiLetter(str.charAt(i))) i += 1
        onSpan(st, i)
      } else if (isAsciiDigit(c)) {
        val st = i
        while (i < n && isAsciiDigit(str.charAt(i))) i += 1
        onSpan(st, i)
      } else {
        val cp = str.codePointAt(i)
        val w = Character.charCount(cp)
        onPunct(i, i + w)
        i += w
      }
    }
  }

  def bpeCountK(s: UTF8String,
      ranks: java.util.HashMap[String, Integer]): Int = {
    val str = s.toString
    var count = 0
    bpeScan(str,
      (st, en) => count += bpeMergeSpan(str, st, en, ranks).length,
      (_, _) => count += 1)
    count
  }

  def bpeSegmentK(s: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    bpeScan(str,
      (st, en) => bpeMergeSpan(str, st, en, ranks)
        .foreach(p => out += UTF8String.fromString(p)),
      (st, en) => out += UTF8String.fromString(str.substring(st, en)))
    new GenericArrayData(out.toArray)
  }

  /** Luhn checksum (ISO/IEC 7812) over a digit span — true iff the
    * mod-10 check digit validates. */
  private def luhnValid(str: String, st: Int, en: Int): Boolean = {
    var sum = 0
    var dbl = false
    var i = en - 1
    while (i >= st) {
      var d = str.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  /** Scan for MAXIMAL digit runs; `onRun(st, en, cardLike)` fires per
    * run with cardLike = length ∈ [13, 19] AND Luhn-valid — the
    * payment-card shape (PAN lengths per ISO/IEC 7812). Maximal-run
    * semantics (not regex {13,19} greedy bites): a 25-digit run is ONE
    * run and not card-like, which is what keeps long numeric ids from
    * false-positives.
    */
  private def luhnScan(str: String, onRun: (Int, Int, Boolean) => Unit): Unit = {
    val n = str.length
    var i = 0
    while (i < n) {
      if (isAsciiDigit(str.charAt(i))) {
        val st = i
        while (i < n && isAsciiDigit(str.charAt(i))) i += 1
        val len = i - st
        onRun(st, i, len >= 13 && len <= 19 && luhnValid(str, st, i))
      } else i += 1
    }
  }

  def luhnCountK(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    luhnScan(str, (_, _, card) => if (card) c += 1)
    c
  }

  def luhnRedactK(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var last = 0
    luhnScan(str, (st, en, card) =>
      if (card) {
        out.append(str, last, st).append("<CC>")
        last = en
      })
    if (last == 0) s
    else UTF8String.fromString(out.append(str, last, str.length).toString)
  }

  /** VCF 4.2 §5 symbolic-ALT detection: `*` (overlapping-deletion
    * spanning allele), `<ID>` symbolic SVs (`<DEL>`, `<CN2>`,
    * `<DUP:TANDEM>`, …), and square-bracket breakend notation
    * (`N[chr2:321682[`, `]13:123456]T`). These are NOT base strings —
    * every base-arithmetic kernel must pass them through unmangled.
    */
  def isSymbolicAlt(alt: String): Boolean =
    alt == "*" ||
      (alt.length >= 2 && alt.charAt(0) == '<' &&
        alt.charAt(alt.length - 1) == '>') ||
      alt.indexOf('[') >= 0 || alt.indexOf(']') >= 0

  def classifyVariant(refU: UTF8String, altU: UTF8String): UTF8String = {
    val alt = altU.toString
    // symbolic classes first — a breakend can share its anchor base
    // with REF and would otherwise fall into the base-arithmetic
    // branches (reference variant_annotations.py:130-162 has no
    // symbolic handling; gnomAD-SV/1000G-SV callsets hit this on row 1)
    if (alt == "*") return VartypeExpr.STAR
    if (alt.length >= 2 && alt.charAt(0) == '<' &&
      alt.charAt(alt.length - 1) == '>') return VartypeExpr.SV
    if (alt.indexOf('[') >= 0 || alt.indexOf(']') >= 0)
      return VartypeExpr.BND
    if (refU.equals(altU)) return VartypeExpr.REF
    val ref = refU.toString
    val lr = ref.length
    val la = alt.length
    if (lr == la) {
      var diff = 0
      var i = 0
      while (i < la) {
        if (ref.charAt(i) != alt.charAt(i)) diff += 1
        i += 1
      }
      if (diff == 1) VartypeExpr.SNP else VartypeExpr.MNP
    } else if (lr > la) {
      var anyDiff = false
      var i = 0
      while (i < la && !anyDiff) {
        if (ref.charAt(i) != alt.charAt(i)) anyDiff = true
        i += 1
      }
      if (anyDiff) VartypeExpr.INDEL else VartypeExpr.DEL
    } else VartypeExpr.INS
  }

  def rollHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % HashMod
      i += Character.charCount(cp)
    }
    h
  }

  /** Rolling hash of each n-token window, joined-string semantics:
    * contributes each kept token's codepoints with a single ' ' (32)
    * between kept tokens — exactly [[rollHash]] of
    * `concat_ws(" ", window)` (nulls skipped, like concat_ws).
    */
  def ngramHashesK(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) toks(i) = arr.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    var w = 0
    while (w <= len - n) {
      var h = 0L
      var first = true
      var j = w
      while (j < w + n) {
        val t = toks(j)
        if (t != null) {
          if (!first) h = (h * 31 + 32) % HashMod
          first = false
          var k = 0
          val m = t.length
          while (k < m) {
            val cp = t.codePointAt(k)
            h = (h * 31 + cp) % HashMod
            k += Character.charCount(cp)
          }
        }
        j += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Binary twin of [[cdcChunkHashesK]]: each UNSIGNED byte is the
    * polynomial symbol — content-defined chunking for media payloads
    * (container headers / metadata prepends shift every byte of the
    * stream; boundaries re-sync exactly as in the text case).
    */
  def cdcChunkHashesBytesK(bytes: Array[Byte], w: Int, m: Int): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    var pow = 1L
    var e = 0
    while (e < w) { pow = (pow * 31) % HashMod; e += 1 }
    val ring = new Array[Long](w)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var hWin = 0L
    var hChunk = 0L
    var chunkLen = 0
    var i = 0
    while (i < n) {
      val cp = (bytes(i) & 0xff).toLong
      hChunk = (hChunk * 31 + cp) % HashMod
      chunkLen += 1
      if (i >= w) {
        val evict = (ring(i % w) * pow) % HashMod
        hWin = ((hWin * 31 + cp - evict) % HashMod + HashMod) % HashMod
      } else {
        hWin = (hWin * 31 + cp) % HashMod
      }
      ring(i % w) = cp
      i += 1
      if (i >= w && hWin % m == 0 && i < n) {
        out += hChunk
        hChunk = 0L
        chunkLen = 0
      }
    }
    if (chunkLen > 0) out += hChunk
    new GenericArrayData(out.toArray)
  }

  /** One-pass CDC chunker kernel (see [[cdcChunkHashes]]): window hash
    * maintained by the true rolling update h' = (h·31 + c − c_out·31^w)
    * mod p — each emitted window hash is bit-identical to [[rollHash]]
    * of the window substring, and each emitted value is [[rollHash]] of
    * the chunk substring, so an engine-portable replay needs only the
    * public polynomial. Cuts land after codepoint i (1-based, i ≥ w)
    * when windowHash % m == 0; the final partial chunk always emits.
    * Empty input → empty array.
    */
  def cdcChunkHashesK(s: UTF8String, w: Int, m: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    // 31^w mod p, for evicting the oldest codepoint from the window
    var pow = 1L
    var e = 0
    while (e < w) { pow = (pow * 31) % HashMod; e += 1 }
    val ring = new Array[Long](w)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var hWin = 0L
    var hChunk = 0L
    var cpCount = 0    // codepoints since document start
    var chunkLen = 0   // codepoints in the current chunk
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      hChunk = (hChunk * 31 + cp) % HashMod
      chunkLen += 1
      if (cpCount >= w) {
        val evict = (ring(cpCount % w) * pow) % HashMod
        hWin = ((hWin * 31 + cp - evict) % HashMod + HashMod) % HashMod
      } else {
        hWin = (hWin * 31 + cp) % HashMod
      }
      ring(cpCount % w) = cp
      cpCount += 1
      if (cpCount >= w && hWin % m == 0 && i < n) {
        out += hChunk
        hChunk = 0L
        chunkLen = 0
      }
    }
    if (chunkLen > 0) out += hChunk
    new GenericArrayData(out.toArray)
  }

  /** [[rollHash]] over every element; null elements stay null (same
    * semantics as mapping RollingHashExpr through `transform`).
    */
  def tokenHashesK(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = rollHash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd vartype classifier (snp/mnp/ins/del/indel/ref); inputs must
  * already be string-typed (the Column wrappers guarantee it).
  */
case class VartypeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "vartype"

  override protected def nullSafeEval(ref: Any, alt: Any): Any =
    StringExprs.classifyVariant(
      ref.asInstanceOf[UTF8String], alt.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a) =>
      s"graft.expressions.StringExprs.classifyVariant($r, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VartypeExpr =
    copy(left = newLeft, right = newRight)
}

object VartypeExpr {
  val REF = UTF8String.fromString("ref")
  val SNP = UTF8String.fromString("snp")
  val MNP = UTF8String.fromString("mnp")
  val DEL = UTF8String.fromString("del")
  val INS = UTF8String.fromString("ins")
  val INDEL = UTF8String.fromString("indel")
  val SV = UTF8String.fromString("sv")
  val BND = UTF8String.fromString("bnd")
  val STAR = UTF8String.fromString("star")
}

/** Codegen'd polynomial rolling hash (engine-portable fingerprint). */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    StringExprs.rollHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.StringExprs.rollHash($s)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** Codegen'd one-pass content-defined chunker (see
  * [[StringExprs.cdcChunkHashesK]]) — boundaries and chunk fingerprints
  * in a single static call per row.
  */
case class CdcChunkHashesExpr(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window > 0, s"cdc window must be positive, got $window")
  require(modulus > 1, s"cdc modulus must be > 1, got $modulus")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string or binary input, got ${other.simpleString}")
  }

  private def isBinary = child.dataType == BinaryType

  override protected def nullSafeEval(s: Any): Any =
    if (isBinary)
      StringExprs.cdcChunkHashesBytesK(s.asInstanceOf[Array[Byte]], window, modulus)
    else
      StringExprs.cdcChunkHashesK(s.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isBinary) "cdcChunkHashesBytesK" else "cdcChunkHashesK"
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.StringExprs.$kernel($s, $window, $modulus)")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashesExpr =
    copy(child = newChild)
}

/** Codegen'd element-wise rolling hash of a token array — one static
  * call per row instead of an interpreted per-element lambda.
  */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "token_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.tokenHashesK(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.StringExprs.tokenHashesK($a)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

/** Codegen'd n-gram window hasher — one static call per row replacing
  * two interpreted HOFs (ngram string build + per-ngram hash) and the
  * intermediate ngram strings themselves.
  */
case class NgramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ngram size must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.ngramHashesK(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.StringExprs.ngramHashesK($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

/** Codegen'd BPE token COUNT under a trained merge table — the
  * tokenizer-apply kernel ([[StringExprs.bpeMergedCount]]): one static
  * call per row, merge ranks as a generated-code reference object, no
  * per-token materialization. Greedy lowest-rank-first per pre-token —
  * the GPT-2 apply order.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.forall { case (l, r) =>
    l.nonEmpty && r.nonEmpty && !l.contains(" ") && !r.contains(" ") },
    "merge parts must be non-empty and space-free (pre-tokens never " +
      "contain whitespace)")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got ${other.simpleString}")
  }

  @transient private lazy val ranks = StringExprs.bpeRanks(merges)

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.bpeCountK(a.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.StringExprs.bpeCountK($c, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Codegen'd BPE SEGMENTATION (surface token array) — same kernel as
  * [[BpeCountExpr]]; for inspection/vocab counting, not hot count
  * paths.
  */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.forall { case (l, r) =>
    l.nonEmpty && r.nonEmpty && !l.contains(" ") && !r.contains(" ") },
    "merge parts must be non-empty and space-free")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got ${other.simpleString}")
  }

  @transient private lazy val ranks = StringExprs.bpeRanks(merges)

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.bpeSegmentK(a.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.StringExprs.bpeSegmentK($c, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}

/** Codegen'd Luhn-valid payment-card COUNT ([[StringExprs.luhnCountK]]):
  * maximal digit runs of length 13–19 passing the mod-10 checksum.
  */
case class LuhnCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "luhn_card_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.luhnCountK(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringExprs.luhnCountK($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnCountExpr =
    copy(child = newChild)
}

/** Codegen'd Luhn-valid card REDACTION ([[StringExprs.luhnRedactK]]). */
case class LuhnRedactExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "luhn_redact"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    StringExprs.luhnRedactK(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringExprs.luhnRedactK($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnRedactExpr =
    copy(child = newChild)
}

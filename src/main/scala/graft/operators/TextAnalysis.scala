package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document quality / language heuristics for corpus filtering — pure
  * column expressions, usable inside any filter or projection and fully
  * pushdown-transparent.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Stopword hit count for one language profile. */
  def stopwordHits(text: Column, lang: String): Column =
    stopwordCount(text, Stopwords.toMap.apply(lang))

  /** Predicted language: argmax of profile hits, ties resolved by the
    * fixed profile order (en > de > fr > es) — deterministic.
    */
  def langId(text: Column): Column = {
    val hits = Stopwords.map { case (l, ws) => l -> stopwordCount(text, ws) }
    hits.zipWithIndex.foldRight(lit(Stopwords.last._1)) {
      case (((lang, h), i), alt) =>
        val rest = hits.drop(i + 1)
        if (rest.isEmpty) lit(lang)
        else when(rest.map(r => h >= r._2).reduce(_ && _), lang).otherwise(alt)
    }
  }

  /** Punctuation density over characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text))

  /** Stopword (en) density over whitespace tokens — the classic
    * "natural language vs boilerplate" signal.
    */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0)
      .otherwise(stopwordCount(text, Stopwords.toMap.apply("en")).cast("double") / n)
  }

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(upperCount(text).cast("double") / length(text))

  /** Document fingerprint: rolling hash of the ASCII-canonicalized text. */
  def fingerprint(text: Column): Column = rollingHash(cleanAscii(text))

  /** Sliding-window token chunking — the context-length preprocessor:
    * a doc longer than `chunk` tokens splits into windows of `chunk`
    * tokens advancing by `stride` (overlap = chunk − stride preserves
    * boundary context for the model). NARROW: one generator per doc
    * (explode of the chunk-index range), token slices re-joined
    * in-line — no shuffle, streams at scan speed, composes with
    * pushdown. Docs at or under `chunk` tokens yield exactly one chunk
    * (themselves).
    */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunk: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    import graft.functions.TextFunctions.wsTokens
    val toks = wsTokens(col(textCol))
    val nChunks = when(size(toks) <= chunk, lit(1))
      .otherwise(ceil((size(toks) - chunk).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("__t"), nChunks.as("__n"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__t"), col("chunk_idx") * stride + 1, lit(chunk)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__c")).as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  // ---- PII scrubbing ---------------------------------------------------
  // Patterns stay in the RE2 ∩ java.util.regex dialect (no lookaround, no
  // backrefs) so the DuckDB oracle applies the byte-identical regex.

  /** Email addresses (pragmatic pattern, not RFC 5322). */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers: 555-867-5309 / 555.867.5309. */
  val PhoneRx = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRx))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRx))

  /** Replace PII spans with typed placeholder tags. Order matters: emails
    * first, so a digit-bearing local part can't be half-eaten by the
    * phone pass. Narrow projection — no shuffle; at 100 TB this runs in
    * the scan stage at I/O speed.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRx, "<EMAIL>"),
      PhoneRx, "<PHONE>")
}

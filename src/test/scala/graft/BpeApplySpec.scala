package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.StringExprs.{bpeMergedCount, bpeSegment}
import graft.functions.TextFunctions.bpeTokenCount

class BpeApplySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def seg(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t").select(bpeSegment(col("t"), merges))
      .as[Seq[String]].head()

  private def cnt(text: String, merges: Seq[(String, String)]): Int =
    Seq(text).toDF("t").select(bpeMergedCount(col("t"), merges))
      .as[Int].head()

  test("greedy apply: the classic low/lower hand case, multi-level merges") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    assert(seg("low lower", merges) === Seq("low", "low", "e", "r"))
    assert(cnt("low lower", merges) === 4)
    // multi-level: t+h then th+e
    val the = Seq(("t", "h"), ("th", "e"))
    assert(seg("the then", the) === Seq("the", "the", "n"))
    assert(cnt("the then", the) === 3)
  }

  test("rank order decides the segmentation when merges conflict") {
    // (a,b) first → ab|c; (b,c) first → a|bc — the trained ORDER is
    // semantic, not just a set of pairs
    assert(seg("abc", Seq(("a", "b"), ("b", "c"))) === Seq("ab", "c"))
    assert(seg("abc", Seq(("b", "c"), ("a", "b"))) === Seq("a", "bc"))
  }

  test("all occurrences of the chosen pair merge left-to-right per round") {
    // aaaa → aa|aa (one round merges BOTH pairs); aaa → aa|a, never a|aa
    val m = Seq(("a", "a"))
    assert(seg("aaaa", m) === Seq("aa", "aa"))
    assert(seg("aaa", m) === Seq("aa", "a"))
  }

  test("merges never cross pre-token boundaries; digit/punct boundaries " +
      "follow the BpePattern classes") {
    val m = Seq(("t", "h"), ("a", "b"), ("c", "d"))
    assert(cnt("t h", m) === 2)          // whitespace separates pre-tokens
    // 'ab' and 'cd' merge within their letter runs; '1' and '!' are
    // their own pre-tokens, so (b,1)/(d,!) can never pair
    assert(seg("ab1cd!e", m) === Seq("ab", "1", "cd", "!", "e"))
  }

  test("empty merge table is the character-level BPE floor; merging only " +
      "shrinks and never undercuts the pre-token regex count") {
    val texts = Seq(
      "hello world", "a1b2c3", "  spaced\tout\n", "", "...", "mixed 42!x",
      "über café 北京", "ALLCAPS lower 007")
    val df = texts.toDF("t")
    val got = df.select(
        bpeMergedCount(col("t"), Seq.empty).as("chars"),
        bpeMergedCount(col("t"),
          Seq(("l", "l"), ("e", "ll"), ("h", "ell"))).as("merged"),
        bpeTokenCount(col("t")).as("pre"),
        length(regexp_replace(col("t"), "\\s", "")).as("nws"))
      .as[(Int, Int, Int, Int)].collect()
    got.zip(texts).foreach { case ((chars, merged, pre, nws), t) =>
      // zero merges = one token per non-whitespace codepoint
      assert(chars === nws, s"'$t': $chars chars vs $nws non-ws")
      // merging only shrinks, and can never go below one per pre-token
      assert(merged <= chars && merged >= pre,
        s"'$t': $pre <= $merged <= $chars violated")
    }
    // null text → null count
    val n = Seq[Option[String]](None).toDF("t")
      .select(bpeMergedCount(col("t"), Seq.empty)).collect().head
    assert(n.isNullAt(0))
  }

  test("segment concatenation reconstructs the non-whitespace stream; " +
      "count = segment size") {
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "er"))
    val texts = Seq("the weather there", "err... 42 'ther'")
    texts.foreach { t =>
      val s = seg(t, merges)
      assert(s.mkString === t.replaceAll("\\s+", ""), s)
      assert(cnt(t, merges) === s.size)
    }
    // and "ther" collapses fully: t,h,e,r → th,er → ther
    assert(seg("ther", merges) === Seq("ther"))
  }
}

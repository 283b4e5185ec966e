package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val corpusTexts = Seq(
    ("d1", "the quick brown fox jumps over the lazy dog again and again"),
    ("d2", "the quick brown fox jumps over the lazy dog again and again ok"), // near-dup of d1
    ("d3", "completely different content about spark distributed query engines"),
    ("d4", "the quick brown fox jumps over the lazy dog again and again")) // exact dup of d1

  private lazy val docs = corpusTexts.toDF("id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val out = Dedup.exact(docs, "id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("d1") === 2L) // d1 + d4 collapse
    assert(out("d2") === 1L)
    assert(out.size === 3)
  }

  test("ngram jaccard finds planted near-dup and exact dup only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("d1", "d2")))
    assert(pairs.contains(("d1", "d4")))
    assert(!pairs.exists(p => p._1 == "d3" || p._2 == "d3"))
  }

  test("minhash LSH surfaces the same near-dup candidates") {
    val pairs = Dedup.minhashLshPairs(docs, "id", "text", 3, 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("d1", "d4"))) // exact dup always collides
    assert(pairs.contains(("d1", "d2")))
    assert(!pairs.exists(p => p._1 == "d3" || p._2 == "d3"))
  }

  test("embedding near-dup within block") {
    val vecs = Seq(
      ("v1", Seq(1.0, 0.0, 0.0), 0),
      ("v2", Seq(0.99, 0.05, 0.0), 0),  // near v1
      ("v3", Seq(0.0, 1.0, 0.0), 0),
      ("v4", Seq(1.0, 0.0, 0.0), 1))    // near v1 but other block
      .toDF("id", "v", "blk")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "id", "v", "blk", 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("v1", "v2")))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)),
      (4L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1), 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((4L, 1), (2L, 2), (3L, 3)))
  }

  test("lshBucket is deterministic and separates opposite vectors") {
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Seq(5.0, 3.0)), (2L, Seq(-5.0, -3.0)), (3L, Seq(5.1, 2.9)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), planes).as("b"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(3L))
    assert(m(1L) !== m(2L))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    ("en", 1L, 900L), ("en", 2L, 900L), ("en", 3L, 900L), ("en", 4L, 100L),
    ("de", 10L, 2500L), ("de", 11L, 50L))
    .toDF("lang", "doc_id", "tok")

  test("packs split where the running budget crosses capacity") {
    val out = Packing.packByBudget(docs, "lang", "doc_id", col("tok"), 2048L)
      .select("lang", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect().toSet
    // en: cum_before 0, 900, 1800, 2700 → packs 0,0,0,1
    // de: cum_before 0, 2500 → packs 0,1 (oversized doc 10 owns pack 0)
    assert(out === Set(
      ("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L), ("en", 4L, 1L),
      ("de", 10L, 0L), ("de", 11L, 1L)))
  }

  test("pack layout is deterministic under repartitioning") {
    val a = Packing.packByBudget(docs, "lang", "doc_id", col("tok"), 1000L)
      .select("lang", "doc_id", "pack_id").collect().map(_.toSeq).toSet
    val b = Packing.packByBudget(docs.repartition(7), "lang", "doc_id", col("tok"), 1000L)
      .select("lang", "doc_id", "pack_id").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("non-positive capacity is rejected") {
    intercept[IllegalArgumentException] {
      Packing.packByBudget(docs, "lang", "doc_id", col("tok"), 0L)
    }
  }

  // ---- packSequences ----

  private val P = 1000000007L
  private def packKey(id: Long, seed: Long): Long =
    (id % P) * 2654435761L % P * Packing.seedMultiplier(seed) % P

  /** Plain-Scala replay of the packed layout: global (key, id) order,
    * running offset, slices per overlapped sequence.
    */
  private def replayPack(rows: Seq[(Long, Long)], seqLen: Long,
      seed: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var off = 0L
    rows.filter(_._2 > 0L)
      .sortBy { case (id, _) => (packKey(id, seed), id) }
      .flatMap { case (id, n) =>
        val start = off; off += n
        (start / seqLen to (start + n - 1) / seqLen).map { s =>
          (s, id, math.max(0L, s * seqLen - start),
            math.max(0L, start - s * seqLen),
            math.min((s + 1) * seqLen, start + n) -
              math.max(s * seqLen, start))
        }
      }
  }

  private def seqDocs = Seq(
    (1L, 100L), (2L, 300L), (3L, 1L), (4L, 250L), (5L, 256L),
    (6L, 700L), (7L, 0L), (8L, 13L))
    .toDF("doc_id", "n_tok")

  test("packSequences equals the plain-Scala replay exactly " +
      "(boundary-straddling slices included)") {
    val out = Packing.packSequences(seqDocs, "doc_id", "n_tok", 256L, 7L)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val want = replayPack(Seq((1L, 100L), (2L, 300L), (3L, 1L), (4L, 250L),
      (5L, 256L), (6L, 700L), (7L, 0L), (8L, 13L)), 256L, 7L).sorted
    assert(out === want)
    // a 700-token doc must straddle at least two cuts
    assert(out.filter(_._2 == 6L).size >= 3, out.filter(_._2 == 6L))
  }

  test("packSequences tiles sequences and docs exactly") {
    val out = Packing.packSequences(seqDocs, "doc_id", "n_tok", 256L, 7L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val total = 100L + 300L + 1L + 250L + 256L + 700L + 13L
    // per sequence: slices tile [0, 256) (last seq a prefix)
    val bySeq = out.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    assert(lastSeq === (total - 1) / 256L)
    bySeq.foreach { case (s, slices) =>
      val span = slices.map(_._5).sum
      if (s < lastSeq) assert(span === 256L, s"seq $s")
      else assert(span === total - lastSeq * 256L, s"last seq $s")
      val offs = slices.sortBy(_._4)
      assert(offs.head._4 === 0L, s"seq $s must start at 0")
      offs.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 === b._4, s"gap in seq $s")
        case _ =>
      }
    }
    // per doc: slices tile [0, n)
    out.groupBy(_._2).foreach { case (id, slices) =>
      val n = Map(1L -> 100L, 2L -> 300L, 3L -> 1L, 4L -> 250L,
        5L -> 256L, 6L -> 700L, 8L -> 13L)(id)
      assert(slices.map(_._5).sum === n, s"doc $id")
      val offs = slices.sortBy(_._3)
      assert(offs.head._3 === 0L)
      offs.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 === b._3, s"gap in doc $id")
        case _ =>
      }
    }
    // zero-token doc 7 is excluded
    assert(!out.exists(_._2 == 7L))
  }

  test("packSequences: two-phase prefix sum ≡ plain; deterministic " +
      "under repartitioning; seed reshuffles") {
    val a = Packing.packSequences(seqDocs, "doc_id", "n_tok", 256L, 7L)
      .collect().map(_.toSeq).toSet
    val b = Packing.packSequences(seqDocs.repartition(5), "doc_id",
        "n_tok", 256L, 7L, blocks = 1)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    val c = Packing.packSequences(seqDocs, "doc_id", "n_tok", 256L, 8L)
      .collect().map(_.toSeq).toSet
    assert(a !== c, "a different seed must lay a different stream")
  }

  test("packSequences property sweep: 20 seeded-random corpora match " +
      "the plain-Scala replay exactly") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 20).foreach { case_ =>
      val n = 1 + rnd.nextInt(60)
      val rows = (1 to n).map(_ =>
        (rnd.nextLong(1000000L), rnd.nextLong(800L)))
        .distinctBy(_._1)
      val seqLen = 1L + rnd.nextInt(300)
      val seed = rnd.nextLong(1000L)
      val out = Packing
        .packSequences(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok",
          seqLen, seed)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val want = replayPack(rows, seqLen, seed).sorted
      assert(out === want, s"case $case_ (n=$n seqLen=$seqLen seed=$seed)")
    }
  }

  test("packSequences rejects bad parameters") {
    intercept[IllegalArgumentException] {
      Packing.packSequences(seqDocs, "doc_id", "n_tok", 0L)
    }
    intercept[IllegalArgumentException] {
      Packing.packSequences(seqDocs, "doc_id", "n_tok", 256L, 0L, 0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DecontaminationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine"))
    .toDF("id", "text")

  test("contaminationReport flags the leaked doc, not the clean one") {
    val train = Seq(
      // verbatim leak of eval doc 1 plus a tail
      (100L, "alpha beta gamma delta epsilon zeta eta theta plus more"),
      // clean doc, zero shared 3-grams
      (101L, "totally different words with no overlap at all here"))
      .toDF("id", "text")
    val out = Dedup.contaminationReport(train, evalDocs, "id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((100L, 6L, 1L))) // 6 shared 3-grams, 1 eval doc
  }

  test("minShared filters borderline overlaps") {
    val train = Seq(
      // shares exactly one 3-gram ("alpha beta gamma") with eval doc 1
      (200L, "alpha beta gamma unrelated tail of words goes here"))
      .toDF("id", "text")
    assert(Dedup.contaminationReport(train, evalDocs, "id", "text",
      n = 3, minShared = 1).count() === 1)
    assert(Dedup.contaminationReport(train, evalDocs, "id", "text",
      n = 3, minShared = 2).count() === 0)
  }

  test("maxEvalDocFreq drops boilerplate shingles shared across the eval set") {
    // the same boilerplate sentence appears in BOTH eval docs → its
    // shingles have eval-doc-freq 2 and are dropped at cap 1, so a train
    // doc sharing only boilerplate is not flagged
    val boiler = "all rights reserved by the original author"
    val ev = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"$boiler one two three"))
      .toDF("id", "text")
    val train = Seq((300L, s"$boiler something else entirely")).toDF("id", "text")
    assert(Dedup.contaminationReport(train, ev, "id", "text", n = 3).count() === 1)
    assert(Dedup.contaminationReport(train, ev, "id", "text", n = 3,
      maxEvalDocFreq = Some(1)).count() === 0)
  }

  test("evalDirtiness: exact hit fractions, verdict threshold, " +
      "zero-shingle doc reports clean, no-hit doc reports zero") {
    val evals = Seq(
      // 6 shingles, 3 hit (the first 5 tokens leak → 3-grams 1..3)
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      // no overlap at all
      (2L, "one two three four five six seven eight nine"),
      // too short for a 3-gram → zero shingles, clean by contract
      (3L, "tiny doc"))
      .toDF("id", "text")
    val train = Seq(
      (100L, "alpha beta gamma delta epsilon tail words here"),
      (101L, "unrelated training text that matches nothing at all"))
      .toDF("id", "text")
    val out = Dedup
      .evalDirtiness(train, evals, "id", "text", n = 3,
        dirtyMinMicro = 500000L)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: 6 distinct 3-grams, hits = "alpha beta gamma",
    // "beta gamma delta", "gamma delta epsilon" → 3/6 = 0.5 ≥ 0.5
    assert(out(1L) === ((6L, 3L, 500000L, "dirty")))
    assert(out(2L) === ((7L, 0L, 0L, "clean")))
    assert(out(3L) === ((0L, 0L, 0L, "clean")))
  }

  test("the probe join broadcasts the eval side — train never shuffles for it") {
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val plan = Dedup.contaminationReport(train, evalDocs, "id", "text", n = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
  }
}

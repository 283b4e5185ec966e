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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VariantFunctions._

/** Semantics pinned to the reference:
  * vartype  — /root/reference/variant_annotations.py:130-162
  * zygosity — /root/reference/variant_annotations.py:64-127
  * alleles  — /root/reference/variant_annotations.py:15-61
  */
class VariantFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vt(ref: String, a: String): String =
    Seq((ref, a)).toDF("ref", "a")
      .select(vartype(col("ref"), col("a"))).as[String].head()

  test("vartype matches the reference classifier") {
    assert(vt("A", "A") === "ref")
    assert(vt("A", "G") === "snp")
    assert(vt("ACT", "AGT") === "snp")     // one differing base
    assert(vt("TTC", "TAG") === "mnp")     // two differing bases
    assert(vt("AG", "CT") === "mnp")
    assert(vt("AC", "A") === "del")        // pure prefix deletion
    assert(vt("ACT", "G") === "indel")     // shrink + base change
    assert(vt("A", "ACT") === "ins")
    assert(vt("T", "TTG") === "ins")
    // faithful reference quirk: missing allele classified like a base
    assert(vt("G", ".") === "snp")
    assert(vt("TTC", ".") === "indel")
  }

  test("vartype symbolic classes (VCF 4.2 §5): sv / bnd / star — " +
      "beyond the reference, which classifies these as nonsense mnp/indel") {
    assert(vt("A", "<DEL>") === "sv")
    assert(vt("ACG", "<CN2>") === "sv")
    assert(vt("T", "<DUP:TANDEM>") === "sv")
    assert(vt("A", "A[chr2:321682[") === "bnd") // anchor shares REF base
    assert(vt("C", "]13:123456]C") === "bnd")
    assert(vt("AT", "*") === "star")
    assert(vt("A", "*") === "star")
    // a lone '<' or unclosed bracket-free string stays base-classified
    assert(vt("A", "<A") === "ins")
  }

  private def zy(ref: String, a1: String, a2: String): String =
    Seq((ref, a1, a2)).toDF("ref", "a1", "a2")
      .select(zygosity(col("ref"), col("a1"), col("a2"))).as[String].head()

  test("zygosity matches the reference branch order") {
    assert(zy("A", "A", "A") === "hom-ref")
    assert(zy("A", ".", ".") === "hom-miss")
    assert(zy("A", ".", "G") === "het-miss")
    assert(zy("A", "G", ".") === "het-miss")
    assert(zy("A", "G", "C") === "het-alt")
    assert(zy("A", "G", "G") === "hom-alt")
    assert(zy("A", "A", "G") === "het-ref")
    assert(zy("A", "G", "A") === "het-ref")
  }

  test("phase and gt split, diploid/haploid/missing") {
    val df = Seq("0/1", "1|2", "0", "./1").toDF("gt").select(
      phase(col("gt")).as("p"),
      gt1(col("gt")).as("g1"),
      gt2(col("gt")).as("g2"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows(0) === ("/", "0", Some("1")))
    assert(rows(1) === ("|", "1", Some("2")))
    assert(rows(2) === ("-", "0", None))
    assert(rows(3) === ("/", ".", Some("1")))
  }

  test("alleleBase indexes [REF ++ ALTs], keeps '.', survives bad index") {
    val df = Seq(("G", "A,C")).toDF("ref", "alt").select(
      alleleBase(col("ref"), col("alt"), lit("0")).as("b0"),
      alleleBase(col("ref"), col("alt"), lit("1")).as("b1"),
      alleleBase(col("ref"), col("alt"), lit("2")).as("b2"),
      alleleBase(col("ref"), col("alt"), lit(".")).as("bm"),
      alleleBase(col("ref"), col("alt"), lit("9")).as("bx"))
    val r = df.head()
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ===
      ("G", "A", "C", "."))
    assert(r.isNullAt(4)) // out-of-range → NULL, not a job failure
  }

  test("normalizeChrom strips chr prefix only at the start") {
    val r = Seq("chr1", "22", "chrX", "Xchr").toDF("c")
      .select(normalizeChrom(col("c"))).as[String].collect()
    assert(r.toSeq === Seq("1", "22", "X", "Xchr"))
  }

  test("multiallele is the ALT comma count (reference code, not docstring)") {
    val r = Seq("A", "A,C", "A,C,T").toDF("a")
      .select(multiallele(col("a"))).as[Int].collect()
    assert(r.toSeq === Seq(0, 1, 2))
  }
}

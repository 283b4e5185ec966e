package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Consequence

/** Hand-computed codon cases for the snpEff/VEP-core consequence
  * caller, both strands, over a planted two-gene genome:
  *
  *   pos:    123456789012345678901 23
  *   genome: GGATGGCTTGTTAATTACATC AT
  *
  *  - gP '+' at 3..14: ATG GCT TGT TAA  (M A C *)
  *  - gM '−' at 15..23: forward TTACATCAT, reverse-complement
  *    ATG ATG TAA  (M M *)
  */
class ConsequenceSpec extends AnyFunSuite with SparkSpec {

  private val genome = Map("1" -> "GGATGGCTTGTTAATTACATCAT")

  private lazy val cds = {
    import spark.implicits._
    Seq(("gP", "1", 3L, 14L, "+"), ("gM", "1", 15L, 23L, "-"))
      .toDF("gene", "chrom", "cds_start", "cds_end", "strand")
  }

  private def call(rows: (Long, String, String)*) = {
    import spark.implicits._
    val sites = rows.toSeq
      .map { case (p, r, a) => ("1", p, r, a) }
      .toDF("chrom", "pos", "ref", "alt")
    Consequence.snpConsequence(sites, cds, genome)
      .select("pos", "gene", "ref_codon", "alt_codon", "aa_ref", "aa_alt",
        "consequence")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)).orNull,
        Option(r.getString(2)).orNull, Option(r.getString(3)).orNull,
        Option(r.getString(4)).orNull, Option(r.getString(5)).orNull,
        r.getString(6))))
      .toMap
  }

  test("plus strand: missense / synonymous / stop_gained / stop_lost") {
    val got = call(
      (6L, "G", "A"),   // codon 2 GCT→ACT: A→T missense
      (8L, "T", "A"),   // codon 2 GCT→GCA: A→A synonymous
      (11L, "T", "A"),  // codon 3 TGT→TGA: C→* stop_gained
      (13L, "A", "C"))  // codon 4 TAA→TCA: *→S stop_lost
    assert(got(6L) === (("gP", "GCT", "ACT", "A", "T", "missense")))
    assert(got(8L) === (("gP", "GCT", "GCA", "A", "A", "synonymous")))
    assert(got(11L) === (("gP", "TGT", "TGA", "C", "*", "stop_gained")))
    assert(got(13L) === (("gP", "TAA", "TCA", "*", "S", "stop_lost")))
  }

  test("minus strand: codons reverse-complement; substitution happens " +
      "on the forward strand first") {
    val got = call(
      (22L, "A", "G"),  // codon 0 fwd CAT→CGT, revcomp ATG→ACG: M→T
      (16L, "T", "C"))  // codon 2 fwd TTA→TCA, revcomp TAA→TGA: *→*
    assert(got(22L) === (("gM", "ATG", "ACG", "M", "T", "missense")))
    // stop-retained classifies as synonymous (aa_ref == aa_alt)
    assert(got(16L) === (("gM", "TAA", "TGA", "*", "*", "synonymous")))
  }

  test("intergenic and non-SNV pass through with NULL codon fields") {
    val got = call(
      (2L, "G", "A"),    // outside both CDS
      (5L, "GA", "G"))   // deletion → non_snv
    assert(got(2L) === ((null, null, null, null, null, "intergenic")))
    assert(got(5L)._6 === "non_snv")
  }

  test("plan: CDS joins by broadcast, no corpus-side shuffle") {
    import spark.implicits._
    val sites = spark.range(100).select(lit("1").as("chrom"),
      (col("id") + 3L).as("pos"), lit("A").as("ref"), lit("G").as("alt"))
    val q = Consequence.snpConsequence(sites, cds, genome)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange hashpartitioning"), plan)
  }
}

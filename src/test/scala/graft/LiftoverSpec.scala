package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Liftover

/** Hand-computed truth for assembly liftover (q233's operator): block
  * arithmetic on both strands, reverse-complement rules, symbolic
  * allele passthrough, the unmapped row, and multi-map surfacing.
  */
class LiftoverSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val chain = Seq(
    // + block: [100, 200] on 1 → d1 at 5000
    ("1", 100, 200, "d1", 5000, "+"),
    // - block: [300, 400] on 1 → d2 at 9000, target runs reverse
    ("1", 300, 400, "d2", 9000, "-"),
    // overlapping block (a patch/alt): [150, 250] on 1 → d3
    ("1", 150, 250, "d3", 7000, "+"),
    // other chromosome
    ("2", 100, 200, "d4", 1000, "+"))
    .toDF("chrom", "start", "end", "dst_chrom", "dst_start", "strand")

  test("liftover: + blocks shift, − blocks mirror AND reverse-" +
      "complement, symbolic alleles ride verbatim, uncovered variants " +
      "emit one unmapped row, overlapping blocks surface as multi-maps") {
    val vcf = Seq(
      ("1", 120, "A", "T"),          // + block only → 5000 + 20
      ("1", 350, "AC", "G,<DEL>"),   // − block → 9000 + (400−350) = 9050
      ("1", 180, "C", "G"),          // BOTH [100,200] and [150,250] → 2 rows
      ("1", 999, "T", "C"),          // uncovered → unmapped
      ("2", 150, "G", "A"))          // chrom-2 block
      .toDF("chrom", "pos", "ref", "alt")
    val got = Liftover.liftover(vcf, chain, bucketShift = 4)
      .select("chrom", "pos", "lift_status", "lifted_chrom",
        "lifted_pos", "lifted_ref", "lifted_alt")
      .as[(String, Int, String, String, Option[Int], String, String)]
      .collect().toSet
    assert(got === Set(
      ("1", 120, "lifted", "d1", Some(5020), "A", "T"),
      // revcomp: AC → GT; alt G → C; <DEL> verbatim (symbolic)
      ("1", 350, "flipped", "d2", Some(9050), "GT", "C,<DEL>"),
      ("1", 180, "lifted", "d1", Some(5080), "C", "G"),
      ("1", 180, "lifted", "d3", Some(7030), "C", "G"),
      ("1", 999, "unmapped", null, None, null, null),
      ("2", 150, "lifted", "d4", Some(1050), "G", "A")))
  }

  test("liftover dstGenome: destination-REF validation — match keeps " +
      "status, ALT carried by the target swaps REF⇄ALT and flips GT " +
      "indices, neither flags ref_mismatch, and unmapped/absent-contig " +
      "rows ride untouched") {
    // d1 bases at 5000.. : pos 5020 = 'T' (matches an ALT of site A
    // → swap), 5080 = 'C' (matches REF of site B → clean), 5040 = 'A'
    // (neither REF 'C' nor ALT 'T' of site C → ref_mismatch)
    val d1 = "N" * 4999 + ("A" * 20) + "T" + ("A" * 59) + "C" +
      ("A" * 100)
    assert(d1.charAt(5020 - 1) == 'T' && d1.charAt(5080 - 1) == 'C' &&
      d1.charAt(5040 - 1) == 'A')
    val genome = Map("d1" -> d1) // d2/d3/d4 absent: unvalidatable
    val vcf = Seq(
      ("1", 120, "A", "T,G", "0/1"),  // → 5020 'T' = ALT#1 → swap, GT flip
      ("1", 180, "C", "G", "1|1"),    // → 5080 'C' = REF → clean (d1 map)
      ("1", 140, "C", "T", "0/1"),    // → 5040 'A' ≠ REF,∉ALT → mismatch
      ("1", 350, "AC", "G", "0/1"),   // → d2 absent from genome → ride
      ("1", 999, "T", "C", "0/0"))    // unmapped
      .toDF("chrom", "pos", "ref", "alt", "gt")
    val got = Liftover.liftover(vcf, chain, bucketShift = 4,
        dstGenome = genome, gtCols = Seq("gt"))
      .filter(col("lifted_chrom").isNull || col("lifted_chrom") =!= "d3")
      .select("pos", "lift_status", "lifted_ref", "lifted_alt", "gt")
      .as[(Int, String, String, String, String)]
      .collect().toSet
    assert(got === Set(
      // swap: REF A ⇄ ALT#1 T (the target's base); GT 0/1 → 1/0
      (120, "swap", "T", "A,G", "1/0"),
      (180, "lifted", "C", "G", "1|1"),
      (140, "ref_mismatch", "C", "T", "0/1"),
      (350, "flipped", "GT", "C", "0/1"), // d2 absent → unvalidated
      (999, "unmapped", null, null, "0/0")))
  }

  test("liftover dstGenome: a minus-strand block whose flipped REF " +
      "mismatches but whose flipped ALT matches the target reads " +
      "flipped_swap, alleles exchanged post-flip") {
    // site (1, 350, ref A, alt G): '-' block → lifted_pos 9050,
    // flipped ref 'T', flipped alt 'C'; target base at 9050 = 'C'
    val d2 = "N" * 9049 + "C" + "A" * 60
    val vcf = Seq(("1", 350, "A", "G", "0/1"))
      .toDF("chrom", "pos", "ref", "alt", "gt")
    val got = Liftover.liftover(vcf, chain, bucketShift = 4,
        dstGenome = Map("d2" -> d2), gtCols = Seq("gt"))
      .select("lift_status", "lifted_ref", "lifted_alt", "gt")
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(("flipped_swap", "C", "T", "1/0")))
  }

  test("liftover: block edges are CLOSED on both ends; a '-' block " +
      "maps its start to the target end and vice versa") {
    val vcf = Seq(("1", 100, "A", "T"), ("1", 200, "C", "G"),
      ("1", 300, "G", "A"), ("1", 400, "T", "C"))
      .toDF("chrom", "pos", "ref", "alt")
    val got = Liftover.liftover(vcf, chain, bucketShift = 4)
      .filter(col("lifted_chrom").isin("d1", "d2"))
      .select("pos", "lifted_chrom", "lifted_pos")
      .as[(Int, String, Int)].collect().toSet
    assert(got === Set(
      (100, "d1", 5000), (200, "d1", 5100),   // + : offset rides
      (300, "d2", 9100), (400, "d2", 9000)))  // − : mirrored
  }
}

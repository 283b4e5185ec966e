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

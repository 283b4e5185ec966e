package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantNorm
import graft.sources.VcfReader.FieldDecl

/** Planted-fixture truth for the normalization operators: multi-allelic
  * split with GT remap + A/R/G INFO slicing, parsimony allele trimming
  * (suffix-then-prefix, POS advance), and their composition — plus the
  * narrow-plan gate (zero exchanges end to end).
  */
class VariantNormSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // (chrom, pos, ref, alt, info); genotypes attached below
  private def wide = Seq(
    ("1", 100, "A", "C,T", "AF=0.3,0.6;RC=5,6,7;PL=1,2,3,4,5,6"),
    ("1", 200, "CTT", "CT", "AF=0.1;RC=5,6;PL=1,2,3"),
    ("1", 300, "CAG", "CAT", "AF=0.1;RC=5,6;PL=1,2,3"),
    ("1", 400, "TC", "GC", "AF=0.1;RC=5,6;PL=1,2,3"),
    ("1", 500, "A", "T", "AF=0.1;RC=5,6;PL=1,2,3"),
    ("1", 600, "G", ".", "AF=0.1"),
    ("2", 700, "ACGT", "AT", "AF=0.1;RC=5,6;PL=1,2,3"),
    ("2", 800, "GAA", "GA,GAAA", "AF=0.2,0.4;RC=5,6,7;PL=1,2,3,4,5,6"))
    .toDF("chrom", "pos", "ref", "alt", "info")
    .withColumn("format", lit("GT:DP"))
    .withColumn("genotypes", map(
      lit("S1"), lit("1|2:10"), lit("S2"), lit("0/1:9"),
      lit("S3"), lit("2:7"), lit("S4"), lit("./1:2"),
      lit("S5"), lit("./.:0")))

  private val decls = Seq(
    FieldDecl("AF", "A", "Float"),
    FieldDecl("RC", "R", "Integer"),
    FieldDecl("PL", "G", "Integer"))

  private lazy val split = VariantNorm.splitMultiallelic(wide, decls)

  private def gtOf(pos: Int, idx: Int, sample: String): String =
    split.filter(col("pos") === pos && col("allele_idx") === idx)
      .select(element_at(col("genotypes"), sample))
      .collect().head.getString(0)

  test("split: one biallelic record per ALT, missing-ALT sites dropped") {
    assert(split.count() === 9) // 6 single-alt + 2 sites x 2 alts; '.' gone
    val s100 = split.filter(col("pos") === 100)
      .select("allele_idx", "alt", "n_alts")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(s100 === Set((1, "C", 2), (2, "T", 2)))
  }

  test("split: GT remap — split allele 1, others 0, missing kept, phase kept") {
    assert(gtOf(100, 1, "S1") === "1|0:10") // 1|2 vs allele 1
    assert(gtOf(100, 2, "S1") === "0|1:10") // 1|2 vs allele 2
    assert(gtOf(100, 1, "S2") === "0/1:9")  // 0/1 untouched shape
    assert(gtOf(100, 2, "S2") === "0/0:9")  // 1 is another alt now
    assert(gtOf(100, 1, "S3") === "0:7")    // haploid 2 vs allele 1
    assert(gtOf(100, 2, "S3") === "1:7")    // haploid 2 vs allele 2
    assert(gtOf(100, 1, "S4") === "./1:2")  // half-missing preserved
    assert(gtOf(100, 2, "S4") === "./0:2")
    assert(gtOf(100, 1, "S5") === "./.:0")  // fully missing unchanged
  }

  test("split: Number=A/R/G INFO slices align per allele") {
    val r = split.filter(col("pos") === 100)
      .select("allele_idx", "INFO_AF", "INFO_RC", "INFO_PL")
      .collect().map(x => (x.getInt(0), x.getDouble(1),
        x.getSeq[Long](2), x.getSeq[Long](3))).sortBy(_._1)
    assert(r(0) === ((1, 0.3, Seq(5L, 6L), Seq(1L, 2L, 3L))))
    assert(r(1) === ((2, 0.6, Seq(5L, 7L), Seq(1L, 4L, 6L))))
  }

  test("trim: shared suffix drops first, then shared prefix advances POS") {
    val norm = VariantNorm.normalize(wide, decls)
    // key on the pos's hundred-block so the prefix-advanced 302 still
    // files under its planted site 300
    val byKey = norm.select("chrom", "allele_idx", "pos", "ref", "alt")
      .collect().map(r => ((r.getString(0), r.getInt(2) / 100 * 100, r.getInt(1)),
        (r.getInt(2), r.getString(3), r.getString(4)))).toMap
    assert(byKey(("1", 200, 1)) === ((200, "CT", "C")))   // CTT>CT suffix-trims
    assert(byKey(("1", 300, 1)) === ((302, "G", "T")))    // CAG>CAT prefix-trims, pos+2
    assert(byKey(("1", 400, 1)) === ((400, "T", "G")))    // TC>GC suffix-trims to snp
    assert(byKey(("1", 500, 1)) === ((500, "A", "T")))    // already minimal
    assert(byKey(("2", 700, 1)) === ((700, "ACG", "A")))  // one suffix base only
    assert(byKey(("2", 800, 1)) === ((800, "GA", "G")))   // GAA>GA → del form
    assert(byKey(("2", 800, 2)) === ((800, "G", "GA")))   // GAA>GAAA → ins form
  }

  test("trim keeps at least one base on each side (identical alleles)") {
    val t = VariantNorm.trimAlleles(
      Seq(("1", 10, "AT", "AT")).toDF("chrom", "pos", "ref", "alt"))
      .select("pos", "ref", "alt").collect().head
    assert((t.getInt(0), t.getString(1), t.getString(2)) === ((10, "A", "A")))
  }

  test("plan gate: split + trim are narrow — zero exchanges") {
    val plan = VariantNorm.normalize(wide, decls)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected narrow plan, got:\n$plan")
  }
}

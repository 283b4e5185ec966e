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

  test("trim passes symbolic ALTs through unmangled — a breakend " +
      "sharing its anchor base with a multi-base REF must not " +
      "prefix-trim or shift POS") {
    import spark.implicits._
    val sv = Seq(
      ("1", 100, "AC", "A[chr2:321682["), // anchor base == REF[0]
      ("1", 200, "ACG", "<DEL>"),
      ("1", 300, "AT", "*"),
      ("1", 400, "CT", "]13:123456]T"),   // REF suffix == breakend tail
      ("1", 500, "CTT", "CT"))            // co-resident base allele trims
      .toDF("chrom", "pos", "ref", "alt")
    val got = VariantNorm.trimAlleles(sv)
      .select("pos", "ref", "alt")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (100, "AC", "A[chr2:321682["),
      (200, "ACG", "<DEL>"),
      (300, "AT", "*"),
      (400, "CT", "]13:123456]T"),
      (500, "CT", "C")))
  }

  test("harmonizeAlleles: the classification ladder by hand — " +
      "palindromic-first order, AF-concordance resolution, the 0.4-MAF " +
      "ambiguity rule, distance tie, AF flip, indel/symbolic mismatch") {
    import spark.implicits._
    def panel(rows: Seq[(Int, String, String, Long)]) =
      rows.map { case (p, r, a, af) => ("1", p, r, a, af) }
        .toDF("chrom", "pos", "ref", "alt", "af_micro")
    val a = panel(Seq(
      (1, "A", "C", 200000L),  // plain pair
      (2, "A", "C", 200000L),
      (3, "A", "C", 200000L),
      (4, "A", "C", 200000L),
      (5, "A", "T", 200000L),  // palindromic, low MAF
      (6, "A", "T", 200000L),
      (7, "A", "T", 450000L),  // palindromic, MAF > 0.4
      (8, "A", "T", 500000L),  // palindromic, exact tie
      (9, "A", "C", 200000L),  // B is an indel
      (10, "A", "G", 200000L)))// third-allele drift
    val b = panel(Seq(
      (1, "A", "C", 210000L),  // match (af kept)
      (2, "C", "A", 790000L),  // swap (af flips to 210000)
      (3, "T", "G", 210000L),  // strand_flip of (A,C)
      (4, "G", "T", 790000L),  // swap_strand_flip
      (5, "A", "T", 190000L),  // same orientation closer → palindromic_match
      (6, "A", "T", 810000L),  // flipped closer → palindromic_swap
      (7, "A", "T", 450000L),  // ambiguous by MAF
      (8, "A", "T", 500000L),  // |keep| = |flip| → ambiguous
      (9, "A", "CT", 200000L), // mismatch (not a SNP)
      (10, "A", "C", 200000L)))// mismatch (no transform fits)
    val got = graft.operators.VariantNorm.harmonizeAlleles(a, b)
      .select("pos", "action", "af_b_harmonized")
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(1) === (("match", 210000L)))
    assert(got(2) === (("swap", 210000L)))
    assert(got(3) === (("strand_flip", 210000L)))
    assert(got(4) === (("swap_strand_flip", 210000L)))
    // pos 5 satisfies BOTH match and swap_strand_flip structurally —
    // the palindromic branch must win and resolve by AF
    assert(got(5) === (("palindromic_match", 190000L)))
    assert(got(6) === (("palindromic_swap", 190000L)))
    assert(got(7) === (("ambiguous", -1L)))
    assert(got(8) === (("ambiguous", -1L)))
    assert(got(9) === (("mismatch", -1L)))
    assert(got(10) === (("mismatch", -1L)))
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

  // Tan, Abecasis & Kang 2015 Fig. 1: on ...GGGCACACAGGG... every
  // representation of the CA-deletion left-aligns to (3, GCA, G)
  private val tanGenome = Map("20" -> "GGGCACACAGGG")

  private def align(genome: Map[String, String],
      rows: (String, Long, String, String)*) = {
    import spark.implicits._
    VariantNorm.leftAlign(
        rows.zipWithIndex
          .map { case ((c, p, r, a), i) => (i.toLong, c, p, r, a) }
          .toDF("k", "chrom", "pos", "ref", "alt"),
        genome)
      .select("k", "pos", "ref", "alt")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
  }

  test("leftAlign: every representation of the Tan et al. CA-deletion " +
      "lands on (3, GCA, G)") {
    val got = align(tanGenome,
      ("20", 4L, "CAC", "C"),        // the paper's representations
      ("20", 5L, "ACA", "A"),
      ("20", 6L, "CACA", "CA"),
      ("20", 5L, "ACACA", "ACA"),
      ("20", 3L, "GCACA", "GCA"),    // shared-prefix spelling
      ("20", 3L, "GCA", "G"))        // already normalized — idempotent
    got.values.foreach(v => assert(v === ((3L, "GCA", "G")), got))
  }

  test("leftAlign: insertions slide too; SNPs/MNPs stay; invalid ALTs " +
      "and absent chroms pass through genome-free") {
    val got = align(tanGenome,
      ("20", 9L, "A", "ACA"),        // CA-insertion in the repeat
      ("20", 5L, "A", "T"),          // SNP — untouched
      ("20", 5L, "AC", "TG"),        // MNP — untouched
      ("20", 6L, "CAC", "TAC"),      // suffix trim only → SNP at 6
      ("20", 5L, "A", "<DEL>"),      // symbolic — untouched
      ("20", 5L, "ACA", "A,AC"),     // multi-allelic — untouched
      ("1", 800L, "GAA", "GA"))      // chrom absent → trim only, no shift
    assert(got(0L) === ((3L, "G", "GCA")), got)
    assert(got(1L) === ((5L, "A", "T")))
    assert(got(2L) === ((5L, "AC", "TG")))
    assert(got(3L) === ((6L, "C", "T")))
    assert(got(4L) === ((5L, "A", "<DEL>")))
    assert(got(5L) === ((5L, "ACA", "A,AC")))
    assert(got(6L) === ((800L, "GA", "G")))
  }

  test("leftAlign: contig-edge stop — a deletion at the start of the " +
      "chromosome cannot extend past POS 1") {
    // genome AAAAT: deleting one A anywhere in the run slides to pos 1
    // and stops with the edge representation (1, AA, A)
    val got = align(Map("9" -> "AAAAT"),
      ("9", 3L, "AA", "A"),
      ("9", 1L, "AA", "A"))
    assert(got(0L) === ((1L, "AA", "A")), got)
    assert(got(1L) === ((1L, "AA", "A")), got)
  }

  test("leftAlign: idempotent, and plan is narrow codegen — zero exchanges") {
    import spark.implicits._
    val df = Seq(("20", 6L, "CACA", "CA"), ("20", 9L, "A", "ACA"))
      .toDF("chrom", "pos", "ref", "alt")
    val once = VariantNorm.leftAlign(df, tanGenome)
    val twice = VariantNorm.leftAlign(once, tanGenome)
    assert(once.collect().toSeq === twice.collect().toSeq)
    // plan shape over the split pipeline: still narrow
    val sourced = VariantNorm.leftAlign(
      VariantNorm.splitMultiallelic(wide, decls)
        .withColumn("pos", col("pos").cast("long")),
      tanGenome)
    val plan = sourced.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected narrow plan, got:\n$plan")
    // codegen: isolated from split's transform_values lambdas (higher-
    // order functions are CodegenFallback and drag any merged Project
    // out of codegen with them), the left_align projection must ride
    // a WholeStageCodegen stage (the starred Project)
    // (a Range source, unlike the local fixtures, cannot constant-fold)
    val alone = VariantNorm.leftAlign(
      spark.range(4).select(lit("20").as("chrom"),
        (col("id") + 4L).as("pos"), lit("CAC").as("ref"),
        lit("C").as("alt")),
      tanGenome)
    val p2 = alone.queryExecution.executedPlan.toString
    assert(p2.linesIterator.exists(l =>
      l.contains("left_align") && l.contains("*(")),
      s"left_align must stay inside whole-stage codegen:\n$p2")
    // and the codegen path computes the same values as interpreted:
    // CAC>C at 4 and at 6 both sit in the CACA repeat → (3, GCA, G);
    // at 5 and 7 the allele disagrees with the genome mid-run and the
    // slide stops after one extension
    assert(alone.filter(col("pos") === 3L && col("ref") === "GCA" &&
      col("alt") === "G").count() === 2L)
  }

  test("mergeToMultiallelic: split -> merge round-trips a multiallelic " +
      "record (alleles re-indexed into the SORTED merged list), " +
      "half-calls and hom-alts survive, phase drops to '/', haploids " +
      "stay haploid, pooled inconsistency and index>=2 input read " +
      "./. with n_conflict") {
    val src = Seq(
      // one multiallelic record: A -> T,G (merged list sorts to G,T:
      // old index 1 (T) -> 2, old 2 (G) -> 1)
      ("1", 100, "A", "T,G", Map(
        "g1" -> "1/2", "g2" -> "0|1", "g3" -> "2/2", "g4" -> "./1")),
      // haploid record
      ("2", 50, "C", "G", Map("g1" -> "1", "g2" -> "0", "g3" -> ".",
        "g4" -> "1")),
      // two records sharing (chrom,pos,ref): g1 consistent het+het ->
      // 1/2; g2 hom in BOTH -> 4 donations -> conflict
      ("3", 10, "A", "C", Map("g1" -> "0/1", "g2" -> "1/1")),
      ("3", 10, "A", "G", Map("g1" -> "1/0", "g2" -> "1/1")))
      .toDF("chrom", "pos", "ref", "alt", "genotypes")
    val multi = src.where(col("chrom") === "1")
    val rt = VariantNorm.mergeToMultiallelic(
      VariantNorm.splitMultiallelic(multi))
      .select("alt", "n_src", "n_conflict", "genotypes")
      .as[(String, Long, Long, Map[String, String])].collect().toSeq
    assert(rt === Seq(("G,T", 2L, 0L, Map(
      "g1" -> "1/2", "g2" -> "0/2", "g3" -> "1/1", "g4" -> "./2"))))
    val out = VariantNorm.mergeToMultiallelic(src
        .where(col("chrom") =!= "1"))
      .orderBy("chrom", "pos")
      .select("chrom", "alt", "n_src", "n_conflict", "genotypes")
      .as[(String, String, Long, Long, Map[String, String])]
      .collect().toSeq
    assert(out === Seq(
      ("2", "G", 1L, 0L, Map("g1" -> "1", "g2" -> "0", "g3" -> ".",
        "g4" -> "1")),
      ("3", "C,G", 2L, 1L, Map("g1" -> "1/2", "g2" -> "./."))))
    // index >= 2 in a claimed-biallelic input never misreads: ./. +
    // conflict
    val bad = Seq(("4", 5, "A", "C", Map("g1" -> "0/2")))
      .toDF("chrom", "pos", "ref", "alt", "genotypes")
    val b = VariantNorm.mergeToMultiallelic(bad)
      .select("n_conflict", "genotypes")
      .as[(Long, Map[String, String])].collect().head
    assert(b === ((1L, Map("g1" -> "./."))))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantAnnotator
import graft.sources.VcfReader

/** End-to-end annotate matrix pinned to what the reference's
  * add_variant_annotations emits for the same mini VCF
  * (pandasvcf.py:186-288, variant_annotations.py:534-768).
  */
class VariantAnnotatorSpec extends AnyFunSuite with SparkSpec {

  private lazy val wide = VcfReader.read(spark, VcfFixture.write().toString)

  private lazy val full = VariantAnnotator.annotate(
    wide,
    VariantAnnotator.Options(
      splitColumns = Map("AD" -> 2),
      dropHomRef = false,
      formatKeys = Some(Seq("GT", "DP", "AD"))))

  private def row(pos: Int, sample: String) =
    full.filter(col("pos") === pos && col("sample_id") === sample)
      .collect() match {
      case Array(r) => r
      case other => fail(s"expected 1 row for ($pos,$sample), got ${other.length}")
    }

  private def f(pos: Int, sample: String, field: String): Any = {
    val r = row(pos, sample)
    r.get(r.fieldIndex(field))
  }

  test("wide→long explode with missing-call and missing-ALT drops") {
    // 7 sites × 2 samples = 14 calls; minus ./., minus 2 calls on ALT='.'
    assert(full.count() === 11)
    assert(full.filter(col("pos") === 600).count() === 0) // ALT='.' dropped
    assert(full.filter(col("pos") === 200).count() === 1) // ./. dropped
  }

  test("snp site with FORMAT payload") {
    assert(f(100, "NA1", "zygosity") === "het-ref")
    assert(f(100, "NA1", "phase") === "/")
    assert(f(100, "NA1", "a1") === "A")
    assert(f(100, "NA1", "a2") === "G")
    assert(f(100, "NA1", "vartype1") === "ref")
    assert(f(100, "NA1", "vartype2") === "snp")
    assert(f(100, "NA1", "DP") === "12")
    assert(f(100, "NA1", "AD_0") === "3")
    assert(f(100, "NA1", "AD_1") === "9")
    assert(f(100, "NA2", "zygosity") === "hom-alt")
    assert(f(100, "NA2", "phase") === "|")
  }

  test("deletion and insertion vartypes") {
    assert(f(200, "NA1", "vartype2") === "del") // AC→A
    assert(f(300, "NA1", "vartype2") === "ins") // T→TTG
    assert(f(500, "NA1", "vartype2") === "mnp") // TTC→TAG
  }

  test("multiallelic site: indices into [REF ++ ALTs]") {
    assert(f(400, "NA1", "a1") === "A")
    assert(f(400, "NA1", "a2") === "C")
    assert(f(400, "NA1", "zygosity") === "het-alt")
    assert(f(400, "NA1", "multiallele") === 1)
    assert(f(400, "NA2", "a1") === "C")
    assert(f(400, "NA2", "zygosity") === "hom-alt")
  }

  test("half-missing and haploid calls") {
    assert(f(500, "NA2", "zygosity") === "het-miss") // ./1
    assert(f(500, "NA2", "a1") === ".")
    assert(f(700, "NA1", "phase") === "-") // haploid '1'
    assert(f(700, "NA1", "a1") === "A")
    assert(f(700, "NA1", "a2") === ".")
    assert(f(700, "NA1", "zygosity") === "het-miss")
    assert(row(700, "NA1").isNullAt(row(700, "NA1").fieldIndex("gt2")))
  }

  test("hom_ref_counts per site, counted before drop_hom_ref") {
    assert(f(300, "NA1", "hom_ref_counts") === 1L) // NA2's 0/0
    assert(f(300, "NA2", "zygosity") === "hom-ref")
    assert(f(100, "NA1", "hom_ref_counts") === 0L)
    val dropped = VariantAnnotator.annotate(
      wide,
      VariantAnnotator.Options(dropHomRef = true,
        formatKeys = Some(Seq("GT", "DP", "AD"))))
    assert(dropped.filter(col("zygosity") === "hom-ref").count() === 0)
    // counts survive the drop
    assert(dropped.filter(col("pos") === 300).head()
      .getAs[Long]("hom_ref_counts") === 1L)
  }

  test("siteSummary pivots zygosity per site") {
    val s = VariantAnnotator.siteSummary(full)
    val r300 = s.filter(col("pos") === 300).head()
    assert(r300.getAs[Long]("hom-ref") === 1L)
    assert(r300.getAs[Long]("hom-alt") === 1L)
  }

  test("kinshipCounts: hand-computed KING evidence counts per pair") {
    import spark.implicits._
    // (site, sample, a1, a2): x/y share 4 called sites — 1 het-het,
    // 1 opposite-hom, 1 same-hom, 1 het-hom; site 5 drops from the
    // (x, y) pair because x is uncalled, but stays for (y, z)
    val ann = Seq(
      ("1", 100L, "A", "T", "x", "A", "T"), ("1", 100L, "A", "T", "y", "A", "T"),
      ("1", 200L, "A", "T", "x", "A", "A"), ("1", 200L, "A", "T", "y", "T", "T"),
      ("1", 300L, "A", "T", "x", "A", "A"), ("1", 300L, "A", "T", "y", "A", "A"),
      ("1", 400L, "A", "T", "x", "A", "T"), ("1", 400L, "A", "T", "y", "A", "A"),
      ("1", 500L, "A", "T", "x", ".", "."), ("1", 500L, "A", "T", "y", "A", "T"),
      ("1", 500L, "A", "T", "z", "T", "T"))
      .toDF("chrom", "pos", "ref", "alt", "sample_id", "a1", "a2")
    val k = graft.operators.VariantQc.kinshipCounts(ann)
      .select("sample_a", "sample_b", "n_sites", "n_het_a", "n_het_b",
        "n_hethet", "n_opp")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(k === Set(
      ("x", "y", 4L, 2L, 1L, 1L, 1L),
      // y het at 500, z hom-alt: no hom-hom comparison possible
      ("y", "z", 1L, 1L, 0L, 0L, 0L)))
  }

  test("hweBySite: exact closed-form chi-square, exclusions enforced") {
    import spark.implicits._
    // rows: (pos, multiallele, gt1, gt2, zygosity)
    def site(pos: Long, rows: Seq[(Int, String, String, String)]) =
      rows.map { case (m, g1, g2, z) => ("1", pos, "A", "T", m, g1, g2, z) }
    val ann = (
      // perfect HWE 1:2:1 → D = 0 → chi² = 0
      site(100L, Seq((0, "0", "0", "hom-ref"), (0, "0", "1", "het-ref"),
        (0, "1", "0", "het-ref"), (0, "1", "1", "hom-alt"))) ++
      // all-hom 2:0:2 → chi² = n·D²/(A²B²) = 4·256/256 = 4.0
      site(200L, Seq((0, "0", "0", "hom-ref"), (0, "0", "0", "hom-ref"),
        (0, "1", "1", "hom-alt"), (0, "1", "1", "hom-alt"))) ++
      // monomorphic ref → B = 0 → defined 0
      site(300L, Seq((0, "0", "0", "hom-ref"), (0, "0", "0", "hom-ref"))) ++
      // excluded: multiallelic site, haploid call, half-missing call
      site(400L, Seq((1, "1", "2", "het-alt"))) ++
      Seq(("1", 500L, "A", "T", 0, "1", null, "het-ref"),
        ("1", 500L, "A", "T", 0, ".", "1", "het-miss"),
        ("1", 500L, "A", "T", 0, "0", "1", "het-ref")))
      .toDF("chrom", "pos", "ref", "alt", "multiallele", "gt1", "gt2", "zygosity")
    val byPos = graft.operators.VariantQc.hweBySite(ann)
      .select("pos", "n0", "n1", "n2", "hwe_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(byPos(100L) === ((1L, 2L, 1L, 0L)))
    assert(byPos(200L) === ((2L, 0L, 2L, 4000000L)))
    assert(byPos(300L) === ((2L, 0L, 0L, 0L)))
    assert(!byPos.contains(400L)) // multiallelic excluded entirely
    // only the called diploid row counts: n = 1 het → chi² = 1·1/(1·1)
    assert(byPos(500L) === ((0L, 1L, 0L, 1000000L)))
  }
}

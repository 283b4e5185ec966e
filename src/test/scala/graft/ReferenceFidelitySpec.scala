package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VariantFunctions._

/** Randomized fidelity check: 500 seeded random (REF, ALT, GT) cases are
  * pushed through the Column implementations and compared against
  * [[RefOracle]] — a direct, independent Scala port of the reference's
  * Python (variant_annotations.py) kept free of any Spark code.
  */
class ReferenceFidelitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Line-for-line port of the reference algorithms (the test oracle). */
  object RefOracle {
    // variant_annotations.py:130-162
    def vartype(ref: String, alt: String): String = {
      val lenDiff = ref.length - alt.length
      if (ref == alt) "ref"
      else if (lenDiff == 0) {
        val diff = alt.indices.count(i => ref(i) != alt(i))
        if (diff == 1) "snp" else "mnp"
      } else if (lenDiff > 0) {
        val diff = alt.indices.count(i => ref(i) != alt(i))
        if (diff > 0) "indel" else "del"
      } else "ins"
    }

    // variant_annotations.py:64-127 (branch order preserved)
    def zygosity(ref: String, a1: String, a2: String): String =
      if (a1 == ref && a2 == ref) "hom-ref"
      else if (a1 == "." && a2 == ".") "hom-miss"
      else if (a1 == "." || a2 == ".") "het-miss"
      else if (a1 != ref && a2 != ref && a1 != a2) "het-alt"
      else if (a1 != ref && a2 != ref && a1 == a2) "hom-alt"
      else "het-ref"

    // variant_annotations.py:15-61
    def alleles(ref: String, alt: String, gt: String): (String, Option[String], String, String, String) = {
      val phase = if (gt.contains("|")) "|" else if (gt.contains("/")) "/" else "-"
      val bases = ref +: alt.split(",").toSeq
      val parts = gt.split("[/|]")
      if (parts.length == 2) {
        val a1 = if (parts(0) == ".") "." else bases(parts(0).toInt)
        val a2 = if (parts(1) == ".") "." else bases(parts(1).toInt)
        (parts(0), Some(parts(1)), a1, a2, phase)
      } else {
        (parts(0), None, bases(parts(0).toInt), ".", phase)
      }
    }
  }

  private val rng = new scala.util.Random(20260812L)
  private val bases = "ACGT"
  private def randSeq(n: Int) = Seq.fill(n)(bases(rng.nextInt(4))).mkString

  private case class Case(ref: String, alt: String, gt: String)

  private val cases: Seq[Case] = Seq.fill(500) {
    val ref = randSeq(1 + rng.nextInt(3))
    val nAlts = 1 + rng.nextInt(2)
    val alts = Seq.fill(nAlts)(randSeq(1 + rng.nextInt(3)))
    val alt = alts.mkString(",")
    val maxIdx = nAlts // allele indices 0..nAlts
    def idx() = if (rng.nextInt(8) == 0) "." else rng.nextInt(maxIdx + 1).toString
    val gt = rng.nextInt(4) match {
      case 0 => s"${idx()}|${idx()}"
      case 3 => rng.nextInt(maxIdx + 1).toString // haploid (no '.': ref crashes)
      case _ => s"${idx()}/${idx()}"
    }
    Case(ref, alt, gt)
  }.filterNot(c => c.gt == "./." || c.gt == ".|." || c.gt == ".")

  test("vartype / alleles / zygosity agree with the Python-port oracle on 500 random cases") {
    val df = cases.map(c => (c.ref, c.alt, c.gt)).toDF("ref", "alt", "gt")
      .select(
        col("ref"), col("alt"), col("gt"),
        phase(col("gt")).as("p"),
        gt1(col("gt")).as("g1"),
        gt2(col("gt")).as("g2"),
        alleleBase(col("ref"), col("alt"), gt1(col("gt"))).as("a1"),
        alleleBase(col("ref"), col("alt"), gt2(col("gt"))).as("a2"))
      .withColumn("vt1", vartype(col("ref"), col("a1")))
      .withColumn("vt2", vartype(col("ref"), col("a2")))
      .withColumn("zy", zygosity(col("ref"), col("a1"), col("a2")))

    df.collect().foreach { r =>
      val (ref, alt, gt) = (r.getString(0), r.getString(1), r.getString(2))
      val (eg1, eg2, ea1, ea2, ep) = RefOracle.alleles(ref, alt, gt)
      val ctx = s"case REF=$ref ALT=$alt GT=$gt"
      assert(r.getString(3) === ep, s"phase $ctx")
      assert(r.getString(4) === eg1, s"gt1 $ctx")
      assert(Option(r.getString(5)) === eg2, s"gt2 $ctx")
      assert(r.getString(6) === ea1, s"a1 $ctx")
      assert(r.getString(7) === ea2, s"a2 $ctx")
      assert(r.getString(8) === RefOracle.vartype(ref, ea1), s"vartype1 $ctx")
      assert(r.getString(9) === RefOracle.vartype(ref, ea2), s"vartype2 $ctx")
      assert(r.getString(10) === RefOracle.zygosity(ref, ea1, ea2), s"zygosity $ctx")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GenomeExprs, GtSwapKernel, TrioPhaseKernel}
import org.apache.spark.unsafe.types.UTF8String

/** Hand-computed truth for the genome/PL kernels behind liftover REF
  * validation (q239) and PL-aware trio phasing (q240).
  */
class GenomeExprsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("GtSwapKernel: allele indices 0⇄k in the FIRST colon-field " +
      "only; separators, '.', other indices, and non-GT subfields " +
      "ride verbatim; k <= 0 is the identity") {
    assert(GtSwapKernel.swap(u("0/1"), 1).toString === "1/0")
    assert(GtSwapKernel.swap(u("0|1"), 1).toString === "1|0")
    assert(GtSwapKernel.swap(u("1/1"), 1).toString === "0/0")
    assert(GtSwapKernel.swap(u("0/0"), 1).toString === "1/1")
    assert(GtSwapKernel.swap(u("./1"), 1).toString === "./0")
    assert(GtSwapKernel.swap(u("0/2"), 2).toString === "2/0")
    // k = 2 leaves allele 1 alone
    assert(GtSwapKernel.swap(u("0/1"), 2).toString === "2/1")
    // multi-digit k swaps whole tokens, never characters
    assert(GtSwapKernel.swap(u("0/12"), 12).toString === "12/0")
    // non-GT subfields ride verbatim
    assert(GtSwapKernel.swap(u("0/1:12,30:99"), 1).toString ===
      "1/0:12,30:99")
    // haploid GT
    assert(GtSwapKernel.swap(u("0"), 1).toString === "1")
    assert(GtSwapKernel.swap(u("0/1"), 0).toString === "0/1")
  }

  test("TrioPhaseKernel: max-posterior transmission — a parent whose " +
      "PL re-calls away from het resolves the double-het; consistent " +
      "all-het PLs stay ambiguous; hom-child winners phase trivially; " +
      "malformed PLs return null") {
    def res(c: String, m: String, f: String): Option[(String, String)] =
      Option(TrioPhaseKernel.resolve(u(c), u(m), u(f))).map { r =>
        (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
          r.getUTF8String(1).toString)
      }
    // mother's PL says hom-ref (0,40,300) → winner (gm=0, gf=1, gc=1):
    // mat allele 0, pat 1 → "1|0"
    assert(res("30,0,60", "0,40,300", "30,0,60") ===
      Some(("1|0", "phased_pl")))
    // father's PL says hom-alt → pat 1, mat 0 → "1|0"
    assert(res("30,0,60", "30,0,60", "300,40,0") ===
      Some(("1|0", "phased_pl")))
    // mother hom-ALT by PL → mat 1, pat 0 → "0|1"
    assert(res("30,0,60", "300,40,0", "30,0,60") ===
      Some(("0|1", "phased_pl")))
    // all three consistent hets: all-het combo wins (0+0+0 vs any
    // re-call ≥ 100·ΔPL) → ambiguous, null gt
    assert(res("30,0,60", "30,0,60", "30,0,60") ===
      Some((null, "ambiguous")))
    // child re-called hom-ref by its own PL → trivial 0|0
    assert(res("0,40,300", "0,30,60", "0,30,60") ===
      Some(("0|0", "phased_pl")))
    // malformed: wrong arity, junk, missing
    assert(res("30,0", "0,30,60", "0,30,60") === None)
    assert(res("a,b,c", "0,30,60", "0,30,60") === None)
    assert(res(".", "0,30,60", "0,30,60") === None)
  }

  test("TrioPhaseKernel: the centi-PL transmission prior separates " +
      "equal-PL-sum configurations — a hom×hom parent pair (penalty " +
      "0) beats het parents (penalty ≥ 301) at equal likelihood") {
    // child het; both parents' PLs are flat across {hom-ref, het}:
    // (gm=0, gf=1, gc=1) penalty 301 vs (gm=1, gf=1, gc=1) penalty
    // 602 vs (gm=0, gf=2?) inconsistent... the minimal-penalty
    // consistent configuration with m hom-ref wins deterministically
    val r = TrioPhaseKernel.resolve(u("30,0,60"), u("0,0,300"),
      u("0,0,300"))
    // score: (0,0,1) pen 301? gm=0,gf=0 → dmax 0, gc=1 inconsistent.
    // (0,1,1): 100·(0+0+0)+301 = 301 ← first minimum in (gm,gf,gc)
    // order; (1,0,1) ties at 301 but iterates later → pat from
    // father het: mother fixed hom-ref → mat 0, pat 1
    assert(!r.isNullAt(0) && r.getUTF8String(0).toString === "1|0")
    assert(r.getUTF8String(1).toString === "phased_pl")
  }

  test("GenomeSliceExpr: 1-based slice through a codegen'd plan; " +
      "absent contig and off-contig slices are NULL, never errors") {
    val genome = Map("1" -> "ACGTACGTAA")
    val df = Seq(("1", 1L, 4), ("1", 7L, 3), ("1", 9L, 2), ("1", 10L, 2),
      ("1", 0L, 1), ("2", 1L, 1))
      .toDF("chrom", "pos", "len")
    val got = df.select(
      GenomeExprs.genomeSlice(genome, col("chrom"), col("pos"),
        col("len")).as("s"))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(Some("ACGT"), Some("GTA"), Some("AA"), None,
      None, None))
  }

  test("phaseByTransmission plCol arm: PL-resolved rows read " +
      "phased_pl, PL-less rows keep the hard-call result " +
      "byte-identical, non-ambiguous statuses never touched") {
    import graft.operators.VariantQc
    def row(site: Int, sid: String, g1: String, g2: String, pl: String) =
      ("1", site, "A", "T", sid, s"$g1/$g2", g1, g2, 0, pl)
    val ann = Seq(
      // site 1: all het, mother's PL re-calls hom-ref → phased_pl 1|0
      row(1, "c", "0", "1", "30,0,60"),
      row(1, "m", "0", "1", "0,40,300"),
      row(1, "f", "0", "1", "30,0,60"),
      // site 2: all het, consistent PLs → ambiguous
      row(2, "c", "0", "1", "30,0,60"),
      row(2, "m", "0", "1", "30,0,60"),
      row(2, "f", "0", "1", "30,0,60"),
      // site 3: all het, child PL missing → ambiguous (hard result)
      row(3, "c", "0", "1", null),
      row(3, "m", "0", "1", "0,40,300"),
      row(3, "f", "0", "1", "30,0,60"),
      // site 4: hard-phased (mother hom-ref) — PL arm must not touch
      row(4, "c", "0", "1", "30,0,60"),
      row(4, "m", "0", "0", "0,30,60"),
      row(4, "f", "1", "1", "60,30,0"))
      .toDF("chrom", "pos", "ref", "alt", "sample_id", "gt", "gt1",
        "gt2", "multiallele", "pl")
    val got = VariantQc.phaseByTransmission(ann, "c", "m", "f",
        plCol = "pl")
      .select("pos", "phased_gt", "phase_status")
      .as[(Int, String, String)].collect()
      .map { case (p, g, s) => (p, (g, s)) }.toMap
    assert(got(1) === (("1|0", "phased_pl")))
    assert(got(2) === ((null, "ambiguous")))
    assert(got(3) === ((null, "ambiguous")))
    assert(got(4) === (("1|0", "phased")))
  }
}

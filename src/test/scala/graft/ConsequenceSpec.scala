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

  test("unresolvable codons degrade to 'unresolved', never silently " +
      "missense: absent chrom and non-ACGT reference base") {
    import spark.implicits._
    // chrom 2 has a CDS but NO genome entry; chrom 3's genome carries
    // an 'N' inside the codon (real references do)
    val cds2 = Seq(("gP", "1", 3L, 14L, "+"), ("g2", "2", 3L, 14L, "+"),
      ("g3", "3", 3L, 14L, "+"))
      .toDF("gene", "chrom", "cds_start", "cds_end", "strand")
    val g2 = genome + ("3" -> "GGATGNCTTGTTAATTACATCAT")
    val sites = Seq(("2", 6L, "G", "A"), ("3", 6L, "N", "A"))
      .toDF("chrom", "pos", "ref", "alt")
    val got = Consequence.snpConsequence(sites, cds2, g2)
      .select("chrom", "gene", "aa_ref", "consequence").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3)))).toMap
    assert(got("2") === (("g2", null, "unresolved")))
    assert(got("3") === (("g3", null, "unresolved")))
  }

  // ---- csq: full SNP + indel + splice calling ----

  private def callCsq(rows: (Long, String, String)*) = {
    import spark.implicits._
    val sites = rows.toSeq
      .map { case (p, r, a) => ("1", p, r, a) }
      .toDF("chrom", "pos", "ref", "alt")
    Consequence.csq(sites, cds, genome)
      .select("pos", "ref", "gene", "consequence")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).orNull) -> r.getString(3))
      .toMap
  }

  test("csq indels, plus strand: one inserted base flips inframe to " +
      "frameshift; a 3-base deletion stays inframe; codon-aligned " +
      "stop insertion reads stop_gained") {
    val got = callCsq(
      (6L, "G", "GA"),      // 1bp ins in codon 2 → frameshift
      (5L, "G", "GTAA"),    // ins TAA after codon 1 end → new codon * →
                            // stop_gained
      (4L, "T", "TCTG"),    // mid-codon 3bp ins: AT|CTG|G → ATC TGG (I W)
      (6L, "GC", "G"),      // 1bp del → frameshift
      (6L, "GCTT", "G"))    // del CTT → ATG G+GT TAA: junction GGT →
                            // inframe_deletion
    assert(got((6L, "G", "gP")) === "frameshift")
    assert(got((5L, "G", "gP")) === "stop_gained")
    // (5, G, GGCA) shares the (pos, ref) key with the GTAA row —
    // re-run separately
    val gotB = callCsq((5L, "G", "GGCA"))
    assert(gotB((5L, "G", "gP")) === "inframe_insertion")
    assert(got((4L, "T", "gP")) === "inframe_insertion")
    assert(got((6L, "GC", "gP")) === "frameshift")
    assert(got((6L, "GCTT", "gP")) === "inframe_deletion")
  }

  test("csq deletions: start_lost / stop_lost / junction stop_gained / " +
      "edge-straddling frameshift by in-CDS length") {
    val got = callCsq(
      (3L, "ATGG", "A"),    // D=[4,6] overlaps start codon → start_lost
      (11L, "TTAA", "T"),   // D=[12,14] covers the stop → stop_lost
      (13L, "AATT", "A"))   // D=[14,16]: 1 base in-CDS → frameshift
    assert(got((3L, "ATGG", "gP")) === "start_lost")
    assert(got((11L, "TTAA", "gP")) === "stop_lost")
    assert(got((13L, "AATT", "gP")) === "frameshift")
    // the same deletions also brush gM's left flank / CDS edge —
    // donor at distance 1, and a 2-base in-CDS frameshift
    assert(got((11L, "TTAA", "gM")) === "splice_donor")
    assert(got((13L, "AATT", "gM")) === "frameshift")
    // junction stop: dedicated gene GG ATG TGG CAA TGA — deleting GGC
    // splices T|AA → TAA at the junction
    import spark.implicits._
    val g2 = Map("1" -> "GGATGTGGCAATGA")
    val cds2 = Seq(("gJ", "1", 3L, 14L, "+"))
      .toDF("gene", "chrom", "cds_start", "cds_end", "strand")
    val sites = Seq(("1", 6L, "TGGC", "T")).toDF("chrom", "pos", "ref", "alt")
    val r = Consequence.csq(sites, cds2, g2)
      .select("gene", "consequence").collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ===
      Seq(("gJ", "stop_gained")))
  }

  test("csq indels, minus strand: transcript-oriented codon walk " +
      "(insertion spliced forward, whole window reverse-complemented)") {
    val got = callCsq(
      (19L, "A", "AG"),     // 1bp ins inside gM → frameshift
      (20L, "T", "TTTA"),   // ins TTA between transcript codons 1|2:
                            // revcomp(TTACAT) = ATGTAA → stop_gained
                            // (TGGG at the same (pos, ref) key re-runs
                            // separately below)
      (17L, "ACAT", "A"))   // delete fwd [18,20] = transcript codon 2
                            // exactly → inframe_deletion
    assert(got((19L, "A", "gM")) === "frameshift")
    assert(got((20L, "T", "gM")) === "stop_gained")
    val gotB = callCsq((20L, "T", "TGGG"))
    assert(gotB((20L, "T", "gM")) === "inframe_insertion")
    assert(got((17L, "ACAT", "gM")) === "inframe_deletion")
  }

  test("csq splice flanks: strand-aware donor/acceptor at 1-2, " +
      "splice_region at 3-8, intergenic beyond; complex passthrough") {
    val got = callCsq(
      (2L, "G", "A"),       // 1 base left of gP('+') → acceptor
      (1L, "G", "A"))       // 2 bases left → acceptor
    assert(got((2L, "G", "gP")) === "splice_acceptor")
    assert(got((1L, "G", "gP")) === "splice_acceptor")
    // pos 14: insertion lands between gP's end and gM's start — one
    // row per gene, donor side for BOTH ('+' right flank, '−' left)
    import spark.implicits._
    val sites = Seq(("1", 14L, "A", "AC")).toDF("chrom", "pos", "ref", "alt")
    val rows = Consequence.csq(sites, cds, genome)
      .select("gene", "consequence").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("gP", "splice_donor"), ("gM", "splice_donor")))
    // a coding SNP in gP is simultaneously gM's left-flank donor
    // neighborhood (dist 2)
    val s13 = Seq(("1", 13L, "A", "C")).toDF("chrom", "pos", "ref", "alt")
    val r13 = Consequence.csq(s13, cds, genome)
      .select("gene", "consequence").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(r13.contains(("gM", "splice_donor")))
    assert(r13.exists(_._1 == "gP"))
    // complex (neither SNP nor anchored indel) and far-intergenic
    val gc = callCsq((5L, "GA", "TT"), (40L, "A", "C"))
    assert(gc((5L, "GA", "gP")) === "complex")
    assert(gc((40L, "A", null)) === "intergenic")
  }

  test("csq snp coding path matches snpConsequence bit-for-bit") {
    import spark.implicits._
    val sites = (3L to 23L).map(p => ("1", p, "A", "G"))
      .toDF("chrom", "pos", "ref", "alt")
    val a = Consequence.csq(sites, cds, genome)
      .filter(col("pos").between(col("cds_start"), col("cds_end")))
      .select("pos", "gene", "consequence").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    val b = Consequence.snpConsequence(sites, cds, genome)
      .filter(col("gene").isNotNull)
      .select("pos", "gene", "consequence").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    b.foreach { case (k, v) => assert(a(k) === v, s"at $k") }
  }

  // ---- snpConsequenceExons: multi-exon transcripts ----

  /** Two-exon genes with a codon SPANNING the junction:
    *  - gX '+' chrom 1, exons [3,7] + [12,18] (lens 5+7 = 12):
    *    transcript ATG GCT TGT TAA, codon 1 (GCT) = genome 6,7 | 12.
    *  - gY '−' chrom 2, exons [3,7] + [12,18]: same transcript via
    *    per-base complement read right-to-left; codon 1 = 15,14,13.
    *  - gZ '+' chrom 3, exons [3,5] + [30,38]: long intron for the
    *    intron/splice ladder.
    */
  private val exGenome = Map(
    "1" -> "GGATGGCCCCCTTGTTAAGG",
    "2" -> "GGTTAACGGGGAAGCCATGG",
    "3" -> ("GG" + "AAA" + "A" * 24 + "AAAAAAAAA" + "AA"))

  private lazy val exModel = {
    import spark.implicits._
    Seq(
      ("gX", "1", "+", 3L, 7L), ("gX", "1", "+", 12L, 18L),
      ("gY", "2", "-", 3L, 7L), ("gY", "2", "-", 12L, 18L),
      ("gZ", "3", "+", 3L, 5L), ("gZ", "3", "+", 30L, 38L))
      .toDF("gene", "chrom", "strand", "exon_start", "exon_end")
  }

  private def callEx(rows: (String, Long, String, String)*) = {
    import spark.implicits._
    val sites = rows.toSeq.toDF("chrom", "pos", "ref", "alt")
    Consequence.snpConsequenceExons(sites, exModel, exGenome)
      .select("chrom", "pos", "gene", "codon_index", "ref_codon",
        "alt_codon", "aa_ref", "aa_alt", "consequence")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.getString(2)).orNull,
          if (r.isNullAt(3)) -1L else r.getLong(3),
          Option(r.getString(4)).orNull, Option(r.getString(5)).orNull,
          r.getString(8))))
      .toMap
  }

  test("snpConsequenceExons: junction-spanning codons assemble from " +
      "both exons, plus strand") {
    val got = callEx(
      ("1", 7L, "C", "G"),   // codon 1 GCT, middle base in exon 1 →
                             // G(6) G(sub) T(12): GGT missense
      ("1", 12L, "T", "A"),  // same codon, base 3 in exon 2 → GCA:
                             // Ala = Ala → synonymous
      ("1", 6L, "G", "A"),   // codon 1 first base → ACT missense
      ("1", 15L, "T", "A"))  // exon 2 interior: c=8, o=8, codon 2
                             // (TGT) phase 2 → TGA stop_gained
    assert(got(("1", 7L)) === (("gX", 1L, "GCT", "GGT", "missense")))
    assert(got(("1", 12L)) === (("gX", 1L, "GCT", "GCA", "synonymous")))
    assert(got(("1", 6L)) === (("gX", 1L, "GCT", "ACT", "missense")))
    assert(got(("1", 15L)) === (("gX", 2L, "TGT", "TGA", "stop_gained")))
  }

  test("snpConsequenceExons: minus strand reads exons right-to-left " +
      "with per-base complement; junction codon spans backwards") {
    val got = callEx(
      ("2", 15L, "C", "G"),  // gY codon 1 = comp(g15,g14,g13) = GCT;
                             // phase 0 sub comp(G)=C → CCT missense
      ("2", 18L, "T", "A"))  // o=0: codon 0 = ATG; alt comp(A)=T at
                             // phase 0 → TTG: M→L missense (start
                             // disruption reads missense here — the
                             // ladder has no start_lost for SNPs)
    assert(got(("2", 15L)) === (("gY", 1L, "GCT", "CCT", "missense")))
    assert(got(("2", 18L)) === (("gY", 0L, "ATG", "TTG", "missense")))
  }

  test("snpConsequenceExons: intron / per-edge splice ladder / " +
      "intergenic / non_snv") {
    val got = callEx(
      ("1", 8L, "C", "A"),   // 1 past exon-1 end → '+' donor
      ("1", 10L, "C", "A"),  // 2 before exon-2 start → acceptor
      ("1", 9L, "C", "A"),   // 2 past exon-1 end (vs 3 to exon 2) →
                             // donor
      ("3", 15L, "A", "C"),  // deep intron of gZ: 10 and 15 from the
                             // edges → intron
      ("3", 25L, "A", "C"),  // 5 before exon-2 start → splice_region
      ("2", 10L, "G", "C"),  // gY intron, 2 before exon-2 start: '−'
                             // upstream-of-start = DONOR side
      ("9", 5L, "A", "C"),   // no gene on chrom 9 → intergenic
      ("1", 5L, "GA", "G"))  // non-SNV passthrough
    assert(got(("1", 8L))._5 === "splice_donor")
    assert(got(("1", 10L))._5 === "splice_acceptor")
    assert(got(("1", 9L))._5 === "splice_donor")
    assert(got(("3", 15L))._5 === "intron")
    assert(got(("3", 25L))._5 === "splice_region")
    assert(got(("2", 10L))._5 === "splice_donor")
    assert(got(("9", 5L))._5 === "intergenic")
    assert(got(("1", 5L))._5 === "non_snv")
  }

  test("snpConsequenceExons: a single-exon model reproduces " +
      "snpConsequence bit-for-bit on coding SNPs") {
    import spark.implicits._
    val oneEx = Seq(("gP", "1", "+", 3L, 14L), ("gM", "1", "-", 15L, 23L))
      .toDF("gene", "chrom", "strand", "exon_start", "exon_end")
    val sites = (3L to 23L).map(p => ("1", p, "A", "G"))
      .toDF("chrom", "pos", "ref", "alt")
    val a = Consequence.snpConsequenceExons(sites, oneEx, genome)
      .filter(col("aa_ref").isNotNull)
      .select("pos", "gene", "ref_codon", "alt_codon", "consequence")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getString(2), r.getString(3), r.getString(4)))).toMap
    val b = Consequence.snpConsequence(sites, cds, genome)
      .filter(col("aa_ref").isNotNull)
      .select("pos", "gene", "ref_codon", "alt_codon", "consequence")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getString(2), r.getString(3), r.getString(4)))).toMap
    assert(a === b)
    assert(a.nonEmpty)
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

  test("plan: csq keeps the same shape — broadcast CDS + one narrow " +
      "projection, no corpus-side shuffle") {
    import spark.implicits._
    val sites = spark.range(100).select(lit("1").as("chrom"),
      (col("id") + 3L).as("pos"), lit("A").as("ref"), lit("AG").as("alt"))
    val q = Consequence.csq(sites, cds, genome)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange hashpartitioning"), plan)
  }

  // ---- csqExons: indels over multi-exon transcripts ----
  //
  // gene A '+', exons (11,20)+(31,44), transcript (24 bases):
  //   ATG GCC GGT TCT AGC GAA TTT GGG  = M A G S S E F G
  //   c 0..9 = genome 11..20, c 10..23 = genome 31..44
  // gene B '−', exons (111,120)+(131,138), transcript (18 bases):
  //   ATG GCC GGT TCT AGC GAA  (genome holds the complement, read
  //   right-to-left)
  private val ceGenome = Map("1" ->
    ("A" * 10 + "ATGGCCGGTT" + "C" * 10 + "CTAGCGAATTTGGG" + "A" * 66 +
      "TTCGCTAGAA" + "G" * 10 + "CCGGCCAT" + "AA"))

  private lazy val ceModel = {
    import spark.implicits._
    Seq(
      ("A", "1", "+", 11L, 20L), ("A", "1", "+", 31L, 44L),
      ("B", "1", "-", 111L, 120L), ("B", "1", "-", 131L, 138L))
      .toDF("gene", "chrom", "strand", "exon_start", "exon_end")
  }

  private def callCe(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    val sites = rows.toSeq
      .map { case (id, p, r, a) => (id, "1", p, r, a) }
      .toDF("id", "chrom", "pos", "ref", "alt")
    Consequence.csqExons(sites, ceModel, ceGenome)
      .select("id", "consequence")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("csqExons deletions: junction-spanning inframe, frame by EXONIC " +
      "length only, start/stop hits, junction stop_gained, splice span") {
    val out = callCe(
      // deletes transcript offsets 9..11 ACROSS the junction (exonic
      // bases 20, 31, 32 of the 14-base genome span) → inframe;
      // junction codon = kept offsets 12..14 = AGC
      (1L, 19L, "TTCCCCCCCCCCCT", "T"),
      // one exonic base (16) deleted → frameshift
      (3L, 15L, "CC", "C"),
      // pure intronic span [23,24] → nearest facing edge 3 → region
      (4L, 22L, "CCC", "C"),
      // intronic ANCHOR (28), span eats 3 bases of exon 2 → inframe;
      // junction codon T(9) + G(13←10) + C(14←11) = TGC
      (5L, 28L, "CCCCTA", "C"),
      // removes transcript offsets 1..3 → start_lost
      (6L, 11L, "ATGG", "A"),
      // removes the terminal codon's offsets 21..23 → stop_lost
      (7L, 41L, "TGGG", "T"),
      // removes offsets 10..15: kept junction = T(9) A(16) A(17) = TAA
      (19L, 30L, "CCTAGCG", "C"),
      // exon-edge-straddling del, ONE exonic base → frameshift
      (18L, 19L, "TTC", "T"))
    assert(out(1L) === "inframe_deletion")
    assert(out(3L) === "frameshift")
    assert(out(4L) === "splice_region")
    assert(out(5L) === "inframe_deletion")
    assert(out(6L) === "start_lost")
    assert(out(7L) === "stop_lost")
    assert(out(19L) === "stop_gained")
    assert(out(18L) === "frameshift")
  }

  test("csqExons insertions: transcript-slot splice both strands, " +
      "frameshift by m, boundary insert reads splice_donor") {
    val out = callCe(
      // '+' anchor c1/ph1, ins ATA → window AT|ATA|G = ATA TAG → stop
      (8L, 12L, "T", "TATA"),
      // same slot, ins GCC → ATG CCG = M P → inframe
      (9L, 12L, "T", "TGCC"),
      // m = 1 → frameshift
      (10L, 12L, "T", "TA"),
      // anchor on exon 1's LAST base: the insert lands one base into
      // the intron → splice_donor on '+', NOT deep intron
      (11L, 20L, "T", "TG"),
      // '−' strand: anchor c4/o13/ph1, insert before the slot; ins TTA
      // revcomps to TAA → window A|TAA|GC = ATA AGC = I S → inframe
      (14L, 115L, "C", "CTTA"))
    assert(out(8L) === "stop_gained")
    assert(out(9L) === "inframe_insertion")
    assert(out(10L) === "frameshift")
    assert(out(11L) === "splice_donor")
    assert(out(14L) === "inframe_insertion")
  }

  test("csqExons SNPs, splice ladder, and passthroughs; junction codon " +
      "on '−'; bit-identity with snpConsequenceExons on SNP input") {
    val out = callCe(
      // '+' junction codon TCT (bases at genome 20, 31, 32), alt at
      // phase 1 → TGT → missense
      (2L, 31L, "C", "G"),
      // '−' junction codon GGT (c 11,10,9 = genome 132,131,120), alt T
      // at genome 131 complements to A → GAT → missense
      (13L, 131L, "C", "T"),
      // 2 bases before exon 2's start on '+' → splice_acceptor
      (12L, 29L, "C", "A"),
      // 1 base after exon 1's genome end on '−' → transcript-upstream
      // side → splice_acceptor
      (15L, 121L, "G", "A"),
      // outside both gene spans + flanks
      (16L, 60L, "A", "T"),
      // neither SNP nor anchored indel
      (17L, 25L, "CAT", "CG"),
      // '−' frameshift deletion, one exonic base
      (20L, 117L, "AG", "A"))
    assert(out(2L) === "missense")
    assert(out(13L) === "missense")
    assert(out(12L) === "splice_acceptor")
    assert(out(15L) === "splice_acceptor")
    assert(out(16L) === "intergenic")
    assert(out(17L) === "complex")
    assert(out(20L) === "frameshift")

    // SNP inputs: csqExons ≡ snpConsequenceExons label-for-label over
    // every position of both gene regions
    import spark.implicits._
    val sweep = (1L to 140L).map(p => ("1", p, "A", "G"))
      .toDF("chrom", "pos", "ref", "alt")
    val a = Consequence.csqExons(sweep, ceModel, ceGenome)
      .select("pos", "gene", "consequence")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull,
        r.getString(2))).sortBy(t => (t._1, Option(t._2).getOrElse("")))
    val b = Consequence.snpConsequenceExons(sweep, ceModel, ceGenome)
      .select("pos", "gene", "consequence")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull,
        r.getString(2))).sortBy(t => (t._1, Option(t._2).getOrElse("")))
    assert(a === b)
  }

  test("symbolic ALTs (<DEL>/breakend/star) pass through as 'symbolic' " +
      "in all four entry points — a breakend sharing its anchor base " +
      "with REF must not read as an insertion, and a '*' must not walk " +
      "the codon ladder to 'unresolved'") {
    import spark.implicits._
    val sites = Seq(
      ("1", 5L, "G", "<DEL>"),          // inside gP CDS
      ("1", 6L, "G", "G[chr2:321682["), // anchor == REF → fake-ins trap
      ("1", 7L, "C", "*"),              // length-1 → fake-snp trap
      ("1", 1L, "G", "<CN2>"),          // outside CDS: still symbolic
      ("1", 5L, "G", "A"))              // co-resident real SNP
      .toDF("chrom", "pos", "ref", "alt")
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.select("pos", "alt", "consequence").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    for (out <- Seq(
        Consequence.snpConsequence(sites, cds, genome),
        Consequence.csq(sites, cds, genome))) {
      val got = labels(out)
      assert(got((5L, "<DEL>")) === "symbolic")
      assert(got((6L, "G[chr2:321682[")) === "symbolic")
      assert(got((7L, "*")) === "symbolic")
      assert(got((1L, "<CN2>")) === "symbolic")
      assert(got((5L, "A")) !== "symbolic") // base allele unaffected
    }
    val exSites = Seq(
      ("1", 5L, "T", "<DEL>"),
      ("1", 6L, "G", "G[chr2:321682["),
      ("1", 13L, "T", "*"),
      ("1", 5L, "T", "A"))
      .toDF("chrom", "pos", "ref", "alt")
    for (out <- Seq(
        Consequence.snpConsequenceExons(exSites, exModel, exGenome),
        Consequence.csqExons(exSites, exModel, exGenome))) {
      val got = labels(out)
      assert(got((5L, "<DEL>")) === "symbolic")
      assert(got((6L, "G[chr2:321682[")) === "symbolic")
      assert(got((13L, "*")) === "symbolic")
      assert(got((5L, "A")) !== "symbolic")
    }
  }

  test("consequenceBurden: LOFTEE class sorting, intergenic excluded") {
    import spark.implicits._
    val rows = Seq(
      ("gA", "frameshift"), ("gA", "stop_gained"), ("gA", "splice_donor"),
      ("gA", "splice_acceptor"), ("gA", "missense"), ("gA", "missense"),
      ("gA", "synonymous"), ("gA", "inframe_insertion"),
      ("gA", "inframe_deletion"), ("gA", "start_lost"), ("gA", "intron"),
      ("gB", "stop_lost"), ("gB", "splice_region"),
      (null.asInstanceOf[String], "intergenic"))
      .toDF("gene", "consequence")
    val out = Consequence.consequenceBurden(rows)
      .select("gene", "n_total", "n_lof", "n_missense", "n_synonymous",
        "n_inframe", "n_other")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size === 2, "NULL-gene rows must be excluded")
    assert(out("gA") === (("gA", 11L, 4L, 2L, 1L, 2L, 2L)))
    assert(out("gB") === (("gB", 2L, 0L, 0L, 0L, 0L, 2L)))
  }

  test("plan: csqExons keeps the broadcast + narrow-projection shape " +
      "(the one exchange builds the parameter-small gene model)") {
    import spark.implicits._
    val sites = spark.range(100).select(lit("1").as("chrom"),
      (col("id") + 3L).as("pos"), lit("A").as("ref"), lit("AG").as("alt"))
    val q = Consequence.csqExons(sites, ceModel, ceGenome)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the exon-model window's exchange (on gene, inside the broadcast
    // build side) is the ONLY shuffle — nothing corpus-side
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size <= 1 &&
      exchanges.forall(_.contains("gene")), plan)
  }

  // ---- split-vep (consume VEP/snpEff-annotated VCFs) ----

  test("vepFormatFields: VEP 'Format:' and snpEff quoted-pipe-list " +
      "Description forms both parse; a no-list header is refused") {
    val vep = "##INFO=<ID=CSQ,Number=.,Type=String,Description=\"" +
      "Consequence annotations from Ensembl VEP. Format: " +
      "Allele|Consequence|IMPACT|SYMBOL|Gene\">"
    assert(Consequence.vepFormatFields(vep) ===
      Seq("Allele", "Consequence", "IMPACT", "SYMBOL", "Gene"))
    val snpeff = "##INFO=<ID=ANN,Number=.,Type=String,Description=\"" +
      "Functional annotations: 'Allele | Annotation | " +
      "Annotation_Impact | Gene_Name'\">"
    assert(Consequence.vepFormatFields(snpeff) ===
      Seq("Allele", "Annotation", "Annotation_Impact", "Gene_Name"))
    intercept[IllegalArgumentException] {
      Consequence.vepFormatFields(
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">")
    }
  }

  test("splitVep: per-transcript explosion with positional field " +
      "binding — empty fields NULL, short records pad, long records " +
      "truncate, no-CSQ rows vanish, & consequences ride intact, " +
      "ALLELE_NUM aligns into the row's own ALT list") {
    import spark.implicits._
    val fields = Seq("Allele", "Consequence", "IMPACT", "SYMBOL",
      "ALLELE_NUM")
    val df = Seq(
      // two records; multiallelic — ALLELE_NUM 2 must align to 'G'
      (100, "C,G", "DP=9;CSQ=C|missense_variant|MODERATE|BRCA2|1," +
        "G|stop_gained&splice_region_variant|HIGH|BRCA2|2;AF=0.5"),
      // empty SYMBOL and short record (trailing fields NULL)
      (200, "T", "CSQ=T|synonymous_variant|LOW||1,T|intron_variant"),
      // record LONGER than the declaration: extras ignored
      (300, "A", "CSQ=A|missense_variant|HIGH|X|1|EXTRA|MORE"),
      // malformed, out-of-range, and ZERO ALLELE_NUM → NULL aligned_alt
      // (VEP documents 0 = "the reference allele": no ALT aligns; the
      // r13 advisory — ElementAt throws INVALID_INDEX_OF_ZERO even via
      // try_element_at, so 0 must be guarded out, not passed through)
      (400, "G", "CSQ=G|stop_lost|HIGH|Y|9,G|stop_lost|HIGH|Y|junk," +
        "G|stop_lost|HIGH|Y|0"),
      // no CSQ at all → contributes no rows
      (500, "A", "DP=4"))
      .toDF("pos", "alt", "info")
      .select(lit("1").as("chrom"), col("pos"), lit("A").as("ref"),
        col("alt"), col("info"))
    val got = Consequence.splitVep(df, fields)
      .select("pos", "csq_idx", "Allele", "Consequence", "IMPACT",
        "SYMBOL", "ALLELE_NUM", "aligned_alt")
      .as[(Int, Int, String, String, String, String, String, String)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size === 8, got.keySet)
    assert(got((100, 0)) === ((100, 0, "C", "missense_variant",
      "MODERATE", "BRCA2", "1", "C")))
    assert(got((100, 1)) === ((100, 1, "G",
      "stop_gained&splice_region_variant", "HIGH", "BRCA2", "2", "G")))
    assert(got((200, 0)) === ((200, 0, "T", "synonymous_variant",
      "LOW", null, "1", "T")))
    assert(got((200, 1)) === ((200, 1, "T", "intron_variant",
      null, null, null, null)))
    assert(got((300, 0)) === ((300, 0, "A", "missense_variant",
      "HIGH", "X", "1", "A")))
    assert(got((400, 0))._8 === null, "out-of-range ALLELE_NUM")
    assert(got((400, 1))._8 === null, "malformed ALLELE_NUM")
    assert(got((400, 2))._8 === null, "ALLELE_NUM=0 (reference allele)")
    assert(!got.keySet.exists(_._1 === 500), "no-CSQ rows must vanish")
    // snpEff ANN key + no ALLELE_NUM declared → no aligned column
    val ann = Consequence.splitVep(
      Seq((1, "C", "ANN=C|missense_variant")).toDF("pos", "alt", "info"),
      Seq("Allele", "Annotation"), infoKey = "ANN")
    assert(!ann.columns.contains("aligned_alt"))
    assert(ann.select("Annotation").as[String].collect() ===
      Array("missense_variant"))
    // TYPED columns (r13 verdict #7): declared fields land typed with
    // malformed values NULL; undeclared fields keep the string path,
    // and the string-path frame is unchanged by the default empty map
    val typed = Consequence.splitVep(df,
      fields,
      types = Map(
        "ALLELE_NUM" -> org.apache.spark.sql.types.IntegerType))
    assert(typed.schema("ALLELE_NUM").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(typed.schema("SYMBOL").dataType ===
      org.apache.spark.sql.types.StringType)
    val tAn = typed.select("pos", "csq_idx", "ALLELE_NUM")
      .as[(Int, Int, Option[Int])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(tAn((100, 1)) === Some(2))
    assert(tAn((400, 1)) === None, "junk ALLELE_NUM try_casts to NULL")
    intercept[IllegalArgumentException] {
      Consequence.splitVep(df, fields,
        types = Map("NOPE" -> org.apache.spark.sql.types.IntegerType))
    }
  }

  test("worstConsequence: published-order argmin per key — &-compound " +
      "records rank by their severe member, unknown terms never beat " +
      "known ones, ties take the lowest csq_idx, payload rides verbatim") {
    import spark.implicits._
    val sev = Consequence.VepSeverityOrder
    val rows = Seq(
      // site 100: missense (idx 0) loses to stop_gained (idx 1)
      (100, 0, "missense_variant", "GENE_A"),
      (100, 1, "stop_gained", "GENE_B"),
      // site 200: &-compound intron&splice_region (rank 15) beats
      // synonymous (rank 21)
      (200, 0, "synonymous_variant", "X"),
      (200, 1, "intron_variant&splice_region_variant", "Y"),
      // site 300: unknown term ranks PAST the table — intron wins
      (300, 0, "totally_new_consequence", "N"),
      (300, 1, "intron_variant", "I"),
      // site 400: exact tie → lowest csq_idx
      (400, 0, "missense_variant", "FIRST"),
      (400, 1, "missense_variant", "SECOND"))
      .toDF("pos", "csq_idx", "Consequence", "SYMBOL")
      .select(lit("1").as("chrom"), col("pos"), lit("A").as("ref"),
        lit("T").as("alt"), col("csq_idx"), col("Consequence"),
        col("SYMBOL"))
    val got = Consequence.worstConsequence(rows)
      .select("pos", "csq_idx", "Consequence", "SYMBOL", "severity_rank")
      .as[(Int, Int, String, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(100) === ((100, 1, "stop_gained", "GENE_B",
      sev.indexOf("stop_gained"))))
    assert(got(200) === ((200, 1, "intron_variant&splice_region_variant",
      "Y", sev.indexOf("splice_region_variant"))))
    assert(got(300) === ((300, 1, "intron_variant", "I",
      sev.indexOf("intron_variant"))))
    assert(got(400) === ((400, 0, "missense_variant", "FIRST",
      sev.indexOf("missense_variant"))))
  }

  test("min-severity-rank kernel == legacy HOF over a randomized sweep " +
      "(compound terms, unknown terms, empties, trailing '&', NULL)") {
    import spark.implicits._
    val sev = Consequence.VepSeverityOrder
    val rnd = new scala.util.Random(13)
    val terms = sev ++ Seq("not_a_term", "", "Missense_Variant")
    val rows = (0 until 400).map { i =>
      val c =
        if (i % 23 == 0) null.asInstanceOf[String]
        else (0 until (1 + rnd.nextInt(4)))
          .map(_ => terms(rnd.nextInt(terms.length))).mkString("&") +
          (if (i % 9 == 0) "&" else "")
      (i, c)
    }
    val df = rows.toDF("i", "c")
    // the pre-r17 HOF Column form, kept verbatim
    val rankMap = typedLit(sev.zipWithIndex.toMap)
    val legacy = array_min(transform(split(col("c"), "&"),
      p => coalesce(element_at(rankMap, p), lit(sev.length))))
    val kernel = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.MinSeverityRankExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("c")), sev))
    val bad = df.select(col("i"), col("c"), legacy.as("l"), kernel.as("k"))
      .filter(!(col("l") <=> col("k"))).collect()
    assert(bad.isEmpty,
      s"rank kernel drift: ${bad.map(_.toSeq.mkString("|")).mkString("; ")}")
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Consequence

/** r17 optimization parity pin: [[graft.operators.Consequence.csq]] /
  * [[Consequence.snpConsequence]] moved their per-row classification
  * from Column ladders to compiled kernels
  * ([[graft.expressions.CsqKernel]]). This spec keeps the PREVIOUS
  * Column-ladder implementation verbatim as the reference and asserts
  * bit-identical output over an exhaustive branch sweep — every
  * consequence class, both strands, edge-straddling indels, symbolic
  * ALTs, absent contigs, lowercase alt bases, and genome-end
  * truncation — so a kernel drift from the pinned semantics fails
  * loudly here before it can hash-mismatch an oracle.
  */
class CsqKernelSpec extends AnyFunSuite with SparkSpec {

  // ---- the pre-kernel Column implementation, kept verbatim ----

  private def legacyRevComp(s: Column): Column =
    reverse(translate(s, "ACGT", "TGCA"))

  private def legacySnpCodon(gstr: Column, plus: Column)
      : (Column, Column, Column, Column) = {
    val code = typedLit(Consequence.GeneticCode)
    val off = when(plus, col("pos") - col("cds_start"))
      .otherwise(col("cds_end") - col("pos"))
    val ci = (off - pmod(off, lit(3L))) / 3L
    val tripStart = when(plus, col("cds_start") + lit(3L) * ci)
      .otherwise(col("cds_end") - lit(3L) * ci - lit(2L))
    val refTrip = gstr.substr(tripStart.cast("int"), lit(3))
    val idx = when(plus, pmod(off, lit(3L)) + 1L)
      .otherwise(lit(3L) - pmod(off, lit(3L)))
    val altTrip = concat(
      refTrip.substr(lit(1), (idx - 1L).cast("int")),
      col("alt"),
      refTrip.substr((idx + 1L).cast("int"), (lit(3L) - idx).cast("int")))
    val refCodon = when(plus, refTrip).otherwise(legacyRevComp(refTrip))
    val altCodon = when(plus, altTrip).otherwise(legacyRevComp(altTrip))
    (refCodon, altCodon, element_at(code, refCodon),
      element_at(code, altCodon))
  }

  private def legacySnpConsequence(
      sites: DataFrame, cds: DataFrame,
      genome: Map[String, String]): DataFrame = {
    val gmap = typedLit(genome.map { case (c, s) => (c, s.toUpperCase) })
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isSnp = length(col("ref")) === 1 && length(col("alt")) === 1 &&
      col("alt").isin("A", "C", "G", "T")
    val joined = sites.join(
      broadcast(cds),
      sites("chrom") === cds("chrom") &&
        col("pos").between(col("cds_start"), col("cds_end")),
      "left").drop(cds("chrom"))
    val gstr = element_at(gmap, col("chrom"))
    val plus = col("strand") === "+"
    val off = when(plus, col("pos") - col("cds_start"))
      .otherwise(col("cds_end") - col("pos"))
    val ci = (off - pmod(off, lit(3L))) / 3L
    val (refCodon, altCodon, aaRef, aaAlt) = legacySnpCodon(gstr, plus)
    joined
      .withColumn("codon_index",
        when(col("gene").isNotNull && isSnp, ci.cast("long")))
      .withColumn("ref_codon",
        when(col("gene").isNotNull && isSnp, refCodon))
      .withColumn("alt_codon",
        when(col("gene").isNotNull && isSnp, altCodon))
      .withColumn("aa_ref", when(col("gene").isNotNull && isSnp, aaRef))
      .withColumn("aa_alt", when(col("gene").isNotNull && isSnp, aaAlt))
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(!isSnp, lit("non_snv"))
          .when(col("gene").isNull, lit("intergenic"))
          .when(col("aa_ref").isNull || col("aa_alt").isNull,
            lit("unresolved"))
          .when(col("aa_ref") === col("aa_alt"), lit("synonymous"))
          .when(col("aa_alt") === "*", lit("stop_gained"))
          .when(col("aa_ref") === "*", lit("stop_lost"))
          .otherwise(lit("missense")))
  }

  private def legacyCsq(
      sites: DataFrame, cds: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    val gmap = typedLit(genome.map { case (c, s) => (c, s.toUpperCase) })
    val code = typedLit(Consequence.GeneticCode)
    val refLen = length(col("ref")).cast("long")
    val altLen = length(col("alt")).cast("long")
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isSnp = refLen === 1L && altLen === 1L && !sym
    val isIns = refLen === 1L && altLen > 1L && !sym &&
      substring(col("alt"), 1, 1) === col("ref")
    val isDel = altLen === 1L && refLen > 1L && !sym &&
      substring(col("ref"), 1, 1) === col("alt")
    val F = lit(flank.toLong)
    val dLo = col("pos") + 1L
    val dHi = col("pos") + refLen - 1L
    val joinCond = sites("chrom") === cds("chrom") && (
      when(isIns, col("pos").between(col("cds_start") - F,
          col("cds_end") + F - 1L))
        .when(isDel, dHi >= col("cds_start") - F &&
          dLo <= col("cds_end") + F)
        .otherwise(col("pos").between(col("cds_start") - F,
          col("cds_end") + F)))
    val joined = sites.join(broadcast(cds), joinCond, "left")
      .drop(cds("chrom"))
    val gstr = element_at(gmap, col("chrom"))
    val plus = col("strand") === "+"
    val cs = col("cds_start")
    val ce = col("cds_end")

    val (_, _, aaRef, aaAlt) = legacySnpCodon(gstr, plus)
    val snpCoding = col("pos").between(cs, ce)
    val snpCons = when(aaRef.isNull || aaAlt.isNull, lit("unresolved"))
      .when(aaRef === aaAlt, lit("synonymous"))
      .when(aaAlt === "*", lit("stop_gained"))
      .when(aaRef === "*", lit("stop_lost"))
      .otherwise(lit("missense"))

    val mIns = altLen - 1L
    val insCoding = col("pos").between(cs, ce - 1L)
    val fsIns = when(plus, col("pos") - pmod(col("pos") - cs, lit(3L)))
      .otherwise(col("pos") - 1L + pmod(ce - col("pos") - 1L, lit(3L)))
    val feIns = fsIns + 2L
    val winF = concat(
      gstr.substr(fsIns.cast("int"), (col("pos") - fsIns + 1L).cast("int")),
      col("alt").substr(lit(2), mIns.cast("int")),
      gstr.substr((col("pos") + 1L).cast("int"),
        (feIns - col("pos")).cast("int")))
    val winT = when(plus, winF).otherwise(legacyRevComp(winF))
    val nCod = (length(col("__wint")) / lit(3)).cast("int")
    val insAas = transform(sequence(lit(1), nCod),
      i => element_at(code, col("__wint").substr(i * lit(3) - lit(2), lit(3))))
    val insCons = when(pmod(mIns, lit(3L)) =!= 0L, lit("frameshift"))
      .when(exists(col("__insaas"), a => a.isNull), lit("unresolved"))
      .when(exists(col("__insaas"), a => a === "*"), lit("stop_gained"))
      .otherwise(lit("inframe_insertion"))

    val mInDel = least(dHi, ce) - greatest(dLo, cs) + 1L
    val delCoding = dLo <= ce && dHi >= cs
    val startLo = when(plus, cs).otherwise(ce - 2L)
    val termLo = when(plus, ce - 2L).otherwise(cs)
    val startHit = dLo <= startLo + 2L && dHi >= startLo
    val termHit = dLo <= termLo + 2L && dHi >= termLo
    val fullyIn = col("pos") >= cs && dHi <= ce
    val phP = pmod(col("pos") - cs, lit(3L))
    val phM = pmod(ce - dHi - 1L, lit(3L))
    val jA = when(plus, col("pos") - phP).otherwise(col("pos") - 1L + phM)
    val jB = when(plus, dHi + 2L - phP).otherwise(dHi + 1L + phM)
    val junF = concat(
      gstr.substr(jA.cast("int"), (col("pos") - jA + 1L).cast("int")),
      gstr.substr((dHi + 1L).cast("int"), (jB - dHi).cast("int")))
    val junAa = element_at(code, when(plus, junF).otherwise(legacyRevComp(junF)))
    val junOk = fullyIn && jA >= cs && jB <= ce
    val delCons = when(pmod(mInDel, lit(3L)) =!= 0L, lit("frameshift"))
      .when(startHit, lit("start_lost"))
      .when(termHit, lit("stop_lost"))
      .when(junOk && junAa.isNull, lit("unresolved"))
      .when(junOk && junAa === "*", lit("stop_gained"))
      .otherwise(lit("inframe_deletion"))

    val distL = when(isIns, cs - col("pos"))
      .when(isDel, cs - dHi).otherwise(cs - col("pos"))
    val distR = when(isIns, col("pos") - ce + 1L)
      .when(isDel, dLo - ce).otherwise(col("pos") - ce)
    val onLeft = distL > 0L
    val dist = when(onLeft, distL).otherwise(distR)
    val donorSide = (plus && !onLeft) || (!plus && onLeft)
    val spliceCons = when(dist.between(1L, 2L),
        when(donorSide, lit("splice_donor")).otherwise(lit("splice_acceptor")))
      .when(dist.between(3L, F), lit("splice_region"))
      .otherwise(lit("intergenic"))

    joined
      .withColumn("__wint",
        when(isIns && col("gene").isNotNull && insCoding &&
          pmod(mIns, lit(3L)) === 0L, winT))
      .withColumn("__insaas", insAas)
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(col("gene").isNull, lit("intergenic"))
          .when(!isSnp && !isIns && !isDel, lit("complex"))
          .when(isSnp, when(snpCoding, snpCons).otherwise(spliceCons))
          .when(isIns, when(insCoding, insCons).otherwise(spliceCons))
          .otherwise(when(delCoding, delCons).otherwise(spliceCons)))
      .drop("__wint", "__insaas")
  }

  // ---- fixtures: the q184 formula genome + dense multi-shape sweep ----

  private def formulaGenome(len: Int): String = {
    val sb = new StringBuilder(len)
    (1 to len).foreach { p =>
      sb.append("ACGT".charAt(
        ((p.toLong * 2654435761L % 1000000007L) % 4L).toInt))
    }
    sb.toString
  }

  private def cdsFrame() = {
    import spark.implicits._
    (0 until 4).map { i =>
      (s"g$i", "1", 301L + i * 700L, 301L + i * 700L + 299L,
        if (i % 2 == 0) "+" else "-")
    }.toDF("gene", "chrom", "cds_start", "cds_end", "strand")
  }

  /** Sites sweeping every offset −12..311 around each CDS with every
    * variant shape, plus hand-planted degenerate rows. */
  private def sweepSites() = {
    import spark.implicits._
    val base = formulaGenome(3200)
    def b(p: Long): String =
      if (p < 1 || p > base.length) "A"
      else base.charAt(p.toInt - 1).toString
    val rows = for {
      g <- 0 until 4
      off <- -12 to 311
      typ <- 0 to 6
    } yield {
      val cs = 301L + g * 700L
      val pos = cs + off
      val ref = typ match {
        case 2 => b(pos) + b(pos + 1)
        case 3 => b(pos) + b(pos + 1) + b(pos + 2) + b(pos + 3)
        case 5 => b(pos) + b(pos + 1) + b(pos + 2) + b(pos + 3) +
          b(pos + 4) + b(pos + 5) + b(pos + 6)
        case _ => b(pos)
      }
      val alt = typ match {
        case 0 => b(pos) + "G"
        case 1 => b(pos) + "TAG" // organic stop candidates
        case 4 => "ACGT".charAt(((pos + 1) % 4).toInt).toString
        case 6 => b(pos) + "CCCGGG"
        case _ => b(pos)
      }
      ("1", pos, ref, alt)
    }
    val edge = Seq(
      ("1", 5L, "GA", "TT"),        // complex shape, no gene → intergenic
      ("1", 320L, "GA", "TT"),      // complex inside a gene
      ("1", 310L, "A", "*"),        // symbolic length-1
      ("1", 310L, "A", "<DEL>"),    // symbolic SV
      ("1", 310L, "A", "A[chr2:123["), // breakend
      ("1", 320L, "A", "a"),        // lowercase alt → unresolved in CDS
      ("2", 310L, "A", "G"),        // absent contig
      ("1", 3195L, "A", "G"),       // genome tail
      ("1", 290L, "AAAAAAAAAAAAAAAAAAAAAAAA", "A"), // long edge del
      ("1", 599L, "A", "AGGG"),     // ins at CDS end boundary
      ("1", 600L, "A", "AGGG"))     // ins just past coding window
    (rows ++ edge).toDF("chrom", "pos", "ref", "alt")
  }

  test("genetic-code table parity: kernel AA string == GeneticCode map") {
    val aaStr =
      "KNKNTTTTRSRSIIMIQHQHPPPPRRRRLLLLEDEDAAAAGGGGVVVV*Y*YSSSS*CWCLFLF"
    val bases = "ACGT"
    for (i0 <- 0 until 4; i1 <- 0 until 4; i2 <- 0 until 4) {
      val codon = s"${bases(i0)}${bases(i1)}${bases(i2)}"
      assert(aaStr.charAt(16 * i0 + 4 * i1 + i2).toString ===
        Consequence.GeneticCode(codon), s"codon $codon")
    }
  }

  test("csq kernel == legacy Column ladder over the full branch sweep") {
    val genome = Map("1" -> formulaGenome(3200))
    val sites = sweepSites()
    val cds = cdsFrame()
    val key = Seq("chrom", "pos", "ref", "alt", "gene")
    val got = Consequence.csq(sites, cds, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(r => r.toSeq.toList).toSet
    val want = legacyCsq(sites, cds, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(r => r.toSeq.toList).toSet
    assert(got === want)
    // the sweep must actually exercise every label class
    val labels = got.map(_.last.asInstanceOf[String])
    val expected = Set("synonymous", "missense", "stop_gained", "stop_lost",
      "unresolved", "frameshift", "inframe_insertion", "inframe_deletion",
      "start_lost", "splice_donor", "splice_acceptor", "splice_region",
      "intergenic", "complex", "symbolic")
    assert(expected.subsetOf(labels),
      s"missing labels: ${expected -- labels}")
  }

  test("snpConsequence kernel == legacy Column bundle, all fields") {
    val genome = Map("1" -> formulaGenome(3200))
    val sites = sweepSites()
    val cds = cdsFrame()
    val cols = Seq("chrom", "pos", "ref", "alt", "gene", "codon_index",
      "ref_codon", "alt_codon", "aa_ref", "aa_alt", "consequence")
    val got = Consequence.snpConsequence(sites, cds, genome)
      .select(cols.map(col): _*)
      .collect().map(r => r.toSeq.toList).toSet
    val want = legacySnpConsequence(sites, cds, genome)
      .select(cols.map(col): _*)
      .collect().map(r => r.toSeq.toList).toSet
    assert(got === want)
  }

  test("kernel handles an absent contig exactly as the Column ladder") {
    import spark.implicits._
    val genome = Map("1" -> formulaGenome(3200))
    val cds = Seq(("gX", "2", 11L, 40L, "+"), ("gY", "2", 51L, 80L, "-"))
      .toDF("gene", "chrom", "cds_start", "cds_end", "strand")
    val sites = Seq(
      ("2", 20L, "A", "G"),      // SNP, absent contig → unresolved
      ("2", 20L, "A", "AGGG"),   // inframe ins, absent contig
      ("2", 60L, "AAAA", "A"),   // inframe del, absent contig
      ("2", 20L, "A", "AG"))     // frameshift unaffected by genome
      .toDF("chrom", "pos", "ref", "alt")
    val key = Seq("chrom", "pos", "ref", "alt", "gene")
    val got = Consequence.csq(sites, cds, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(_.toSeq.toList).toSet
    val want = legacyCsq(sites, cds, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(_.toSeq.toList).toSet
    assert(got === want)
  }
}

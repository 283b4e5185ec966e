package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Consequence

/** r17 optimization parity pin for the exon-model kernels:
  * [[Consequence.snpConsequenceExons]] and [[Consequence.csqExons]]
  * moved their per-row walks (containing-exon filter, c-space per-base
  * codon assembly, junction codons, facing-edge splice scan) to
  * compiled kernels ([[graft.expressions.ExonCsqKernel]]). This spec
  * keeps the previous staged-Column implementations verbatim and
  * asserts bit-identical output over a dense multi-shape sweep across
  * junction-spanning codons, both strands, edge-straddling deletions,
  * insertion-point splice reads, and every label class.
  */
class ExonCsqKernelSpec extends AnyFunSuite with SparkSpec {

  // ---- the pre-kernel staged-Column implementations, kept verbatim ----

  private def legacyRevComp(s: Column): Column =
    reverse(translate(s, "ACGT", "TGCA"))

  private def legacyExonGeneModel(exons: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("gene").orderBy("exon_start")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    exons
      .withColumn("__len", col("exon_end") - col("exon_start") + 1L)
      .withColumn("__cum", coalesce(sum(col("__len")).over(w), lit(0L)))
      .groupBy(col("gene"), col("chrom").as("__gchrom"), col("strand"))
      .agg(
        sort_array(collect_list(struct(
          col("exon_start").as("s"), col("exon_end").as("e"),
          col("__cum").as("cum")))).as("__ex"),
        sum(col("__len")).as("__total"),
        min(col("exon_start")).as("__gs"),
        max(col("exon_end")).as("__ge"))
  }

  private def legacyExonBaseAt(gstr: Column, plus: Column)(t: Column): Column = {
    val cT = when(plus, t).otherwise(col("__total") - 1L - t)
    val xe = try_element_at(
      filter(col("__ex"), x => cT >= x.getField("cum") &&
        cT < x.getField("cum") + (x.getField("e") - x.getField("s") + 1L)),
      lit(1))
    val g = xe.getField("s") + (cT - xe.getField("cum"))
    val b = gstr.substr(g.cast("int"), lit(1))
    when(plus, b).otherwise(translate(b, "ACGT", "TGCA"))
  }

  private def legacySnpConsequenceExons(
      sites: DataFrame, exons: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    val gmap = typedLit(genome.map { case (c, s) => (c, s.toUpperCase) })
    val code = typedLit(Consequence.GeneticCode)
    val geneModel = legacyExonGeneModel(exons)
    val F = lit(flank.toLong)
    val joined = sites.join(
      broadcast(geneModel),
      sites("chrom") === col("__gchrom") &&
        col("pos").between(col("__gs") - F, col("__ge") + F),
      "left").drop("__gchrom")
    val sym = graft.functions.VariantFunctions.isSymbolicAlt(col("alt"))
    val isSnp = length(col("ref")) === 1 && length(col("alt")) === 1 && !sym
    val gstr = element_at(gmap, col("chrom"))
    val plus = col("strand") === "+"
    def facing(d: Column): Column =
      when(d > 0L, d).otherwise(lit(Long.MaxValue))
    val s1 = joined
      .withColumn("__inx", try_element_at(
        filter(col("__ex"), x => col("pos") >= x.getField("s") &&
          col("pos") <= x.getField("e")), lit(1)))
      .withColumn("__edge", when(col("gene").isNotNull &&
          col("__inx").isNull,
        array_min(flatten(transform(col("__ex"),
          x => array(
            struct(facing(x.getField("s") - col("pos")).as("d"),
              lit(0).as("side")),
            struct(facing(col("pos") - x.getField("e")).as("d"),
              lit(1).as("side"))))))))
    val c = col("__inx.cum") + (col("pos") - col("__inx.s"))
    val s2 = s1.withColumn("__o",
      when(plus, c).otherwise(col("__total") - 1L - c))
    val s3 = s2
      .withColumn("__ci", (col("__o") - pmod(col("__o"), lit(3L))) / 3L)
      .withColumn("__ph", pmod(col("__o"), lit(3L)))
    def baseAt(t: Column): Column = legacyExonBaseAt(gstr, plus)(t)
    val t0 = lit(3L) * col("__ci").cast("long")
    val s4 = s3
      .withColumn("__b0", baseAt(t0))
      .withColumn("__b1", baseAt(t0 + 1L))
      .withColumn("__b2", baseAt(t0 + 2L))
    val altBase = when(plus, col("alt")).otherwise(
      translate(col("alt"), "ACGT", "TGCA"))
    val s5 = s4
      .withColumn("__rcod", concat(col("__b0"), col("__b1"), col("__b2")))
      .withColumn("__acod", concat(
        when(col("__ph") === 0L, altBase).otherwise(col("__b0")),
        when(col("__ph") === 1L, altBase).otherwise(col("__b1")),
        when(col("__ph") === 2L, altBase).otherwise(col("__b2"))))
    val s6 = s5
      .withColumn("__aar", element_at(code, col("__rcod")))
      .withColumn("__aaa", element_at(code, col("__acod")))
    val snpCons =
      when(col("__aar").isNull || col("__aaa").isNull, lit("unresolved"))
        .when(col("__aar") === col("__aaa"), lit("synonymous"))
        .when(col("__aaa") === "*", lit("stop_gained"))
        .when(col("__aar") === "*", lit("stop_lost"))
        .otherwise(lit("missense"))
    val eDist = col("__edge.d")
    val eSide = col("__edge.side")
    val donorSide = (plus && eSide === 1) || (!plus && eSide === 0)
    val spliceCons = when(eDist.between(1L, 2L),
        when(donorSide, lit("splice_donor")).otherwise(lit("splice_acceptor")))
      .when(eDist.between(3L, F), lit("splice_region"))
      .when(col("pos").between(col("__gs"), col("__ge")), lit("intron"))
      .otherwise(lit("intergenic"))
    val coding = col("gene").isNotNull && isSnp && col("__inx").isNotNull
    s6
      .withColumn("codon_index", when(coding, col("__ci").cast("long")))
      .withColumn("ref_codon", when(coding, col("__rcod")))
      .withColumn("alt_codon", when(coding, col("__acod")))
      .withColumn("aa_ref", when(coding, col("__aar")))
      .withColumn("aa_alt", when(coding, col("__aaa")))
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(!isSnp, lit("non_snv"))
          .when(col("gene").isNull, lit("intergenic"))
          .when(col("__inx").isNotNull, snpCons)
          .otherwise(spliceCons))
      .drop("__ex", "__total", "__gs", "__ge", "__inx", "__edge", "__o",
        "__ci", "__ph", "__b0", "__b1", "__b2", "__rcod", "__acod",
        "__aar", "__aaa")
  }

  private def legacyCsqExons(
      sites: DataFrame, exons: DataFrame, genome: Map[String, String],
      flank: Int = 8): DataFrame = {
    val gmap = typedLit(genome.map { case (c, s) => (c, s.toUpperCase) })
    val code = typedLit(Consequence.GeneticCode)
    val geneModel = legacyExonGeneModel(exons)
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
    val joinCond = sites("chrom") === col("__gchrom") && (
      when(isDel, dHi >= col("__gs") - F && dLo <= col("__ge") + F)
        .otherwise(col("pos").between(col("__gs") - F, col("__ge") + F)))
    val joined = sites.join(broadcast(geneModel), joinCond, "left")
      .drop("__gchrom")
    val gstr = element_at(gmap, col("chrom"))
    val plus = col("strand") === "+"
    val INF = lit(Long.MaxValue)
    def facing(d: Column): Column = when(d > 0L, d).otherwise(INF)
    def baseAt(t: Column): Column = legacyExonBaseAt(gstr, plus)(t)
    val inGene = col("gene").isNotNull
    val mIns = altLen - 1L
    val insInframe = pmod(mIns, lit(3L)) === 0L
    val s1 = joined
      .withColumn("__inx", when(inGene && (isSnp || isIns),
        try_element_at(
          filter(col("__ex"), x => col("pos") >= x.getField("s") &&
            col("pos") <= x.getField("e")), lit(1))))
      .withColumn("__cA", when(inGene && isDel,
        array_min(transform(col("__ex"), x =>
          when(least(dHi, x.getField("e")) >= greatest(dLo, x.getField("s")),
            x.getField("cum") + greatest(dLo - x.getField("s"), lit(0L)))
            .otherwise(INF)))))
      .withColumn("__cB", when(inGene && isDel,
        array_max(transform(col("__ex"), x =>
          when(least(dHi, x.getField("e")) >= greatest(dLo, x.getField("s")),
            x.getField("cum") + least(dHi, x.getField("e")) - x.getField("s"))
            .otherwise(lit(-1L))))))
      .withColumn("__edge", when(inGene && (
          (isSnp && col("__inx").isNull) ||
          (isIns && !(col("__inx").isNotNull &&
            col("pos") < col("__inx.e"))) ||
          (isDel && !(col("__cA").isNotNull && col("__cA") =!= INF))),
        array_min(flatten(transform(col("__ex"), x => array(
          struct(facing(x.getField("s") -
            when(isDel, dHi).otherwise(col("pos"))).as("d"),
            lit(0).as("side")),
          struct(facing(when(isDel, dLo)
            .when(isIns, col("pos") + 1L).otherwise(col("pos")) -
            x.getField("e")).as("d"), lit(1).as("side"))))))))
    val cAnchor = col("__inx.cum") + (col("pos") - col("__inx.s"))
    val o = when(plus, cAnchor).otherwise(col("__total") - 1L - cAnchor)
    val ph = pmod(o, lit(3L))
    val t0 = o - ph
    val insCoding = col("__inx").isNotNull && col("pos") < col("__inx.e")
    val needCodon = inGene && col("__inx").isNotNull &&
      (isSnp || (isIns && insCoding && insInframe))
    val delExonic = isDel && col("__cA").isNotNull && col("__cA") =!= INF
    val mDel = col("__cB") - col("__cA") + 1L
    val oA = when(plus, col("__cA"))
      .otherwise(col("__total") - 1L - col("__cB"))
    val oB = when(plus, col("__cB"))
      .otherwise(col("__total") - 1L - col("__cA"))
    val startHit = oA <= 2L
    val stopHit = oB >= col("__total") - 3L
    val jPh = pmod(oA, lit(3L))
    val jStart = oA - jPh
    val needJunction = inGene && delExonic &&
      pmod(mDel, lit(3L)) === 0L && !startHit && !stopHit
    def junOff(i: Int): Column = {
      val off = jStart + lit(i.toLong)
      when(off < oA, off).otherwise(off + (oB - oA + 1L))
    }
    val s2 = s1
      .withColumn("__b0", when(needCodon, baseAt(t0)))
      .withColumn("__b1", when(needCodon, baseAt(t0 + 1L)))
      .withColumn("__b2", when(needCodon, baseAt(t0 + 2L)))
      .withColumn("__d0", when(needJunction, baseAt(junOff(0))))
      .withColumn("__d1", when(needJunction, baseAt(junOff(1))))
      .withColumn("__d2", when(needJunction, baseAt(junOff(2))))
    val codon = concat(col("__b0"), col("__b1"), col("__b2"))
    val altBase = when(plus, col("alt"))
      .otherwise(translate(col("alt"), "ACGT", "TGCA"))
    val altCodon = concat(
      when(ph === 0L, altBase).otherwise(col("__b0")),
      when(ph === 1L, altBase).otherwise(col("__b1")),
      when(ph === 2L, altBase).otherwise(col("__b2")))
    val aaR = element_at(code, codon)
    val aaA = element_at(code, altCodon)
    val snpCons = when(aaR.isNull || aaA.isNull, lit("unresolved"))
      .when(aaR === aaA, lit("synonymous"))
      .when(aaA === "*", lit("stop_gained"))
      .when(aaR === "*", lit("stop_lost"))
      .otherwise(lit("missense"))
    val insT = when(plus, col("alt").substr(lit(2), mIns.cast("int")))
      .otherwise(legacyRevComp(col("alt").substr(lit(2), mIns.cast("int"))))
    val k = when(plus, ph).otherwise(ph - 1L)
    val win = concat(
      codon.substr(lit(1), (k + 1L).cast("int")),
      insT,
      codon.substr((k + 2L).cast("int"), (lit(2L) - k).cast("int")))
    val s3 = s2
      .withColumn("__wint",
        when(inGene && isIns && insCoding && insInframe, win))
    val nCod = (length(col("__wint")) / lit(3)).cast("int")
    val s4 = s3.withColumn("__insaas",
      transform(sequence(lit(1), nCod), i =>
        element_at(code, col("__wint").substr(i * lit(3) - lit(2), lit(3)))))
    val insCons = when(!insInframe, lit("frameshift"))
      .when(exists(col("__insaas"), a => a.isNull), lit("unresolved"))
      .when(exists(col("__insaas"), a => a === "*"), lit("stop_gained"))
      .otherwise(lit("inframe_insertion"))
    val junAa = element_at(code, concat(col("__d0"), col("__d1"), col("__d2")))
    val delCons = when(pmod(mDel, lit(3L)) =!= 0L, lit("frameshift"))
      .when(startHit, lit("start_lost"))
      .when(stopHit, lit("stop_lost"))
      .when(junAa.isNull, lit("unresolved"))
      .when(junAa === "*", lit("stop_gained"))
      .otherwise(lit("inframe_deletion"))
    val eDist = col("__edge.d")
    val eSide = col("__edge.side")
    val donorSide = (plus && eSide === 1) || (!plus && eSide === 0)
    val inSpan = when(isDel, dHi >= col("__gs") && dLo <= col("__ge"))
      .otherwise(col("pos").between(col("__gs"), col("__ge")))
    val spliceCons = when(eDist.between(1L, 2L),
        when(donorSide, lit("splice_donor")).otherwise(lit("splice_acceptor")))
      .when(eDist.between(3L, F), lit("splice_region"))
      .when(inSpan, lit("intron"))
      .otherwise(lit("intergenic"))
    s4
      .withColumn("consequence",
        when(sym, lit("symbolic"))
          .when(col("gene").isNull, lit("intergenic"))
          .when(!isSnp && !isIns && !isDel, lit("complex"))
          .when(isSnp,
            when(col("__inx").isNotNull, snpCons).otherwise(spliceCons))
          .when(isIns,
            when(insCoding, insCons).otherwise(spliceCons))
          .otherwise(
            when(delExonic, delCons).otherwise(spliceCons)))
      .drop("__ex", "__total", "__gs", "__ge", "__inx", "__edge",
        "__cA", "__cB", "__b0", "__b1", "__b2", "__d0", "__d1", "__d2",
        "__wint", "__insaas")
  }

  // ---- fixtures: 3-exon genes on the formula genome, both strands ----

  private def formulaGenome(len: Int): String = {
    val sb = new StringBuilder(len)
    (1 to len).foreach { p =>
      sb.append("ACGT".charAt(
        ((p.toLong * 2654435761L % 1000000007L) % 4L).toInt))
    }
    sb.toString
  }

  private def exonFrame() = {
    import spark.implicits._
    (0 until 4).flatMap { i =>
      val cs = 301L + i * 900L
      val st = if (i % 2 == 0) "+" else "-"
      // lens 100/50/150 — codon phase crosses both junctions
      Seq((s"g$i", "1", st, cs, cs + 99L),
        (s"g$i", "1", st, cs + 200L, cs + 249L),
        (s"g$i", "1", st, cs + 400L, cs + 549L))
    }.toDF("gene", "chrom", "strand", "exon_start", "exon_end")
  }

  private def sweepSites() = {
    import spark.implicits._
    val base = formulaGenome(4400)
    def b(p: Long): String =
      if (p < 1 || p > base.length) "A"
      else base.charAt(p.toInt - 1).toString
    val rows = for {
      g <- 0 until 4
      off <- -12 to 561
      typ <- 0 to 6
    } yield {
      val cs = 301L + g * 900L
      val pos = cs + off
      val ref = typ match {
        case 2 => b(pos) + b(pos + 1)
        case 3 => b(pos) + b(pos + 1) + b(pos + 2) + b(pos + 3)
        case 5 => (0 to 6).map(j => b(pos + j)).mkString // 6-base del
        case _ => b(pos)
      }
      val alt = typ match {
        case 0 => b(pos) + "G"
        case 1 => b(pos) + "TAG"
        case 4 => "ACGT".charAt(((pos + 1) % 4).toInt).toString
        case 6 => b(pos) + "CCCGGG"
        case _ => b(pos)
      }
      ("1", pos, ref, alt)
    }
    // junction-straddling dels + degenerate shapes
    val edge = Seq(
      ("1", 395L, (0 to 11).map(i => "ACGT"((395 + i) % 4)).mkString, "A"),
      ("1", 5L, "GA", "TT"),
      ("1", 310L, "A", "*"),
      ("1", 310L, "A", "<DEL>"),
      ("1", 320L, "A", "a"),
      ("2", 310L, "A", "G"),
      ("1", 4395L, "A", "G"))
    (rows ++ edge).toDF("chrom", "pos", "ref", "alt")
  }

  test("csqExons kernel == legacy staged-Column pipeline, full sweep") {
    val genome = Map("1" -> formulaGenome(4400))
    val sites = sweepSites()
    val exons = exonFrame()
    val key = Seq("chrom", "pos", "ref", "alt", "gene")
    val got = Consequence.csqExons(sites, exons, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(_.toSeq.toList).toSet
    val want = legacyCsqExons(sites, exons, genome)
      .select(key.map(col) :+ col("consequence"): _*)
      .collect().map(_.toSeq.toList).toSet
    assert(got === want)
    val labels = got.map(_.last.asInstanceOf[String])
    val expected = Set("synonymous", "missense", "stop_gained", "stop_lost",
      "unresolved", "frameshift", "inframe_insertion", "inframe_deletion",
      "start_lost", "splice_donor", "splice_acceptor", "splice_region",
      "intron", "intergenic", "complex", "symbolic")
    assert(expected.subsetOf(labels),
      s"missing labels: ${expected -- labels}")
  }

  test("snpConsequenceExons kernel == legacy, all fields") {
    val genome = Map("1" -> formulaGenome(4400))
    val sites = sweepSites()
    val exons = exonFrame()
    val cols = Seq("chrom", "pos", "ref", "alt", "gene", "codon_index",
      "ref_codon", "alt_codon", "aa_ref", "aa_alt", "consequence")
    val got = Consequence.snpConsequenceExons(sites, exons, genome)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq.toList).toSet
    val want = legacySnpConsequenceExons(sites, exons, genome)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq.toList).toSet
    assert(got === want)
  }
}

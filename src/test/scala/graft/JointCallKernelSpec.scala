package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** r17 optimization parity pin: [[graft.operators.Gvcf.jointGenotype]]
  * moved its per-record PL argmin from a Column `aggregate` HOF (which
  * runs INTERPRETED per row — CodegenFallback) to the compiled
  * [[graft.expressions.JointCallKernel]]. This spec keeps the PREVIOUS
  * Column fold verbatim as the reference and asserts bit-identical
  * output over the full branch sweep — diploid triangular inversion,
  * haploid nAlts+1 arity, wrong arity, strict-< first-minimum ties,
  * second-minimum GQ gaps, malformed/empty/overflow entries, trailing
  * empties, leading zeros, null PL/ALT — so a kernel drift from the
  * pinned semantics fails loudly here before it can hash-mismatch
  * q229/q231/q241.
  */
class JointCallKernelSpec extends AnyFunSuite with SparkSpec {

  // ---- the pre-kernel Column fold, kept verbatim ----

  private def legacyFold(plCol: String): Column = {
    val nAlts = size(split(col("alt"), ","))
    val nGt = ((nAlts + 1) * (nAlts + 2) / 2).cast("int")
    val pl = split(col(plCol), ",")
    val big = Int.MaxValue
    val zero = struct(lit(big).as("v"), lit(-1).as("i"),
      lit(big).as("v2"), lit(0).as("pos"), lit(false).as("bad"))
    aggregate(pl, zero,
      (acc, x) => {
        val xv = when(x =!= "" && length(x) <= 9 &&
          length(translate(x, "0123456789", "")) === 0,
          x.cast("int"))
        val better = xv.isNotNull && xv < acc.getField("v")
        val second = xv.isNotNull && !(xv < acc.getField("v")) &&
          xv < acc.getField("v2")
        struct(
          when(better, xv).otherwise(acc.getField("v")).as("v"),
          when(better, acc.getField("pos"))
            .otherwise(acc.getField("i")).as("i"),
          when(better, acc.getField("v"))
            .when(second, xv).otherwise(acc.getField("v2")).as("v2"),
          (acc.getField("pos") + 1).as("pos"),
          (acc.getField("bad") || xv.isNull).as("bad"))
      },
      acc => {
        val i = acc.getField("i")
        val kAl = floor((sqrt(i.cast("double") * 8.0 + 1.0) - 1.0) / 2.0)
          .cast("int")
        val jAl = (i - (kAl * (kAl + 1)) / 2).cast("int")
        val ok = !acc.getField("bad") && acc.getField("pos") >= lit(2) &&
          i >= 0
        val gq = (acc.getField("v2") - acc.getField("v")).as("gq")
        when(ok && acc.getField("pos") === nGt,
          struct(
            concat(jAl.cast("string"), lit("/"), kAl.cast("string"))
              .as("cgt"),
            gq))
          .when(ok && acc.getField("pos") === nAlts + 1 &&
            acc.getField("pos") =!= nGt,
            struct(i.cast("string").as("cgt"), gq))
      })
  }

  private def kernelCol(plCol: String): Column =
    Bridge.column(graft.expressions.JointCallExpr(
      Bridge.expression(col(plCol)),
      Bridge.expression(col("alt"))))

  /** Every diploid/haploid arity × every argmin position × tie/gap
    * shapes, plus hand-planted degenerate rows. */
  private def sweepFrame(): DataFrame = {
    import spark.implicits._
    val alts = Seq("G", "G,T", "G,T,C") // nAlts 1..3 → nGt 3/6/10
    val organic = for {
      alt <- alts
      nAlts = alt.count(_ == ',') + 1
      arity <- Seq((nAlts + 1) * (nAlts + 2) / 2, nAlts + 1)
      arg <- 0 until arity
      gap <- Seq(0, 1, 37)
    } yield {
      val vals = (0 until arity).map { p =>
        if (p == arg) 0
        else if (p == (arg + 1) % arity) gap
        else 50 + p
      }
      (vals.mkString(","), alt)
    }
    val edge = Seq(
      ("0,0,50", "G"),            // tie on the minimum → argmin 0, gq 0
      ("50,0,0", "G"),            // tie off the minimum → gq 0
      ("007,0,3", "G"),           // leading zeros
      ("999999999,0,1", "G"),     // 9-digit max accepted
      ("9999999999,0,1", "G"),    // 10-digit overflow guard → null
      ("1,,2", "G"),              // empty inner entry → null
      ("1,2,", "G"),              // trailing empty → null
      ("1,a,2", "G"),             // non-digit → null
      ("-1,2,3", "G"),            // sign char → null
      ("5", "G"),                 // single entry → null (pos < 2)
      ("", "G"),                  // empty PL string → null
      ("0,10,20,30", "G"),        // wrong arity (neither 3 nor 2) → null
      ("0,10,20", "G,T"),         // haploid 3-entry with 2 alts
      ("0,10", "G"),              // haploid 2-entry with 1 alt
      (null, "G"),                // null PL
      ("0,10,20", null))          // null ALT
    (organic ++ edge).toDF("pl", "alt")
  }

  test("joint-call kernel == legacy aggregate fold over the full sweep") {
    val df = sweepFrame()
      .withColumn("legacy", legacyFold("pl"))
      .withColumn("kernel", kernelCol("pl"))
    val bad = df.filter(
      !(col("legacy") <=> col("kernel"))).collect()
    assert(bad.isEmpty,
      s"kernel drift on: ${bad.map(_.toSeq.mkString("|")).mkString("; ")}")
    // the sweep must actually exercise both call arities and the null arm
    val n = df.count()
    val called = df.filter(col("kernel").isNotNull)
    assert(n >= 100)
    assert(called.filter(col("kernel.cgt").contains("/")).count() > 20)
    assert(called.filter(!col("kernel.cgt").contains("/")).count() > 10)
    assert(df.filter(col("kernel").isNull).count() >= 10)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dissect the r12 heavyweights (q208 kinship panel, q209 KN LM):
  * time each pipeline stage separately and dump the executed plan's
  * scan/exchange skeleton, so the expensive piece is measured, not
  * guessed. Usage: Test/runMain graft.tools.ProfileR12 [q208|q209]
  */
object ProfileR12 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }

    if (which == "q209" || which == "both") {
      val d = graft.queries.QueryUtil.t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
      val ev = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("id"), col("text"))
      val tr = d.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").as("id"), col("text"))
      import graft.functions.TextFunctions._
      def bigramsOf(df: org.apache.spark.sql.DataFrame, withId: Boolean) = {
        val toks = wsTokens(lower(cleanAscii(col("text"))))
        val staged = if (withId)
          df.select(col("id"), transform(toks, t => rollingHash(t)).as("__hs"))
        else df.select(transform(toks, t => rollingHash(t)).as("__hs"))
        val hs = col("__hs")
        val pairs = when(size(hs) >= 2,
          transform(sequence(lit(1), size(hs) - 1), i =>
            struct(element_at(hs, i).as("h1"), element_at(hs, i + 1).as("h2"))))
          .otherwise(array().cast("array<struct<h1:long,h2:long>>"))
        val base = staged.select(
          (if (withId) Seq(col("id")) else Nil) :+ pairs.as("__p"): _*)
        base.select((if (withId) Seq(col("id")) else Nil) :+
          explode(col("__p")).as("__b"): _*)
          .select((if (withId) Seq(col("id")) else Nil) ++
            Seq(col("__b.h1").as("h1"), col("__b.h2").as("h2")): _*)
      }
      def noop(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      time("q209 hashes only (train)")(noop(
        tr.select(transform(wsTokens(lower(cleanAscii(col("text")))),
          t => rollingHash(t)).as("__hs"))))
      time("q209 bigrams(train)")(noop(bigramsOf(tr, withId = false)))
      time("q209 big groupBy")(noop(bigramsOf(tr, withId = false)
        .groupBy("h1", "h2").agg(count(lit(1)).as("c"))))
      time("q209 bigrams(eval)")(noop(bigramsOf(ev, withId = true)))
      time("q209 full (noop write)") {
        graft.operators.TextAnalysis.knBigramScore(tr, ev, "id", "text")
          .write.format("noop").mode("overwrite").save(); 0L
      }
      val q = graft.operators.TextAnalysis.knBigramScore(tr, ev, "id", "text")
      val skel = q.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Join") ||
          l.contains("Aggregate")).mkString("\n")
      println(skel)
    }

    if (which == "q208" || which == "both") {
      val ann = graft.operators.VariantAnnotator.annotate(
        graft.queries.SyntheticVariants.wide(spark, dir),
        graft.operators.VariantAnnotator.Options(
          dropHomRef = false, formatKeys = Some(Seq("AD", "DP", "GT"))))
      val withDup = ann.unionByName(
        ann.filter(col("sample_id") === "g1")
          .withColumn("sample_id", lit("g5")))
      time("q208 annotate+dup count")(withDup.count())
      val snp = withDup.filter(col("multiallele") === 0 &&
        length(col("ref")) === 1 && length(col("alt")) === 1 &&
        col("gt1").isNotNull && col("gt1") =!= "." &&
        col("gt2").isNotNull && col("gt2") =!= ".")
      time("q208 snp filter")(snp.count())
      val siteKey = Seq("chrom", "pos", "ref", "alt")
      val mafSites = snp.groupBy(siteKey.map(col): _*)
        .agg(sum(col("gt1").cast("long") + col("gt2").cast("long")).as("__b"),
          (lit(2L) * count(lit(1))).as("__c"))
        .filter(floor(least(col("__b"), col("__c") - col("__b")).cast("double") /
          col("__c").cast("double") * lit(1000000.0)).cast("long") >= 100000L)
        .select(siteKey.map(col): _*)
      time("q208 maf agg")(mafSites.count())
      val common = snp.join(mafSites, siteKey, "left_semi")
      time("q208 common semi-join")(common.count())
      time("q208 ldR2Pairs over common")(graft.operators.VariantQc
        .ldR2Pairs(common, maxDist = 100).count())
      time("q208 ldPrune over common")(graft.operators.VariantQc
        .ldPrune(common, 100, 990000L).count())
      time("q208 kinshipPanel full")(graft.operators.VariantQc
        .kinshipPanel(withDup, 100000L, 100, 990000L).count())
      time("q208 full gate")(graft.SparkEntry
        .queries("q208_kinship_panel")(spark, dir).count())
    }
    spark.stop()
  }
}

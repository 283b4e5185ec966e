package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VariantAnnotator
import graft.queries.SyntheticVariants

/** Stage-by-stage timing of the q15 pipeline (Test/runMain). */
object ProfileQ15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val wide = SyntheticVariants.wide(spark, dir)
    time("wide only")(wide.count())

    val fmtKeys = Some(Seq("AD", "DP", "GT"))
    val annNoDrop = VariantAnnotator.annotate(wide,
      VariantAnnotator.Options(dropHomRef = false, formatKeys = fmtKeys))
    time("annotate (no split, no drop)")(annNoDrop.count())

    val dropOnly = VariantAnnotator.annotate(wide,
      VariantAnnotator.Options(dropHomRef = true, formatKeys = fmtKeys))
    time("annotate (drop only)")(dropOnly.count())

    val splitOnly = VariantAnnotator.annotate(wide,
      VariantAnnotator.Options(splitColumns = Map("AD" -> 2),
        dropHomRef = false, formatKeys = fmtKeys))
    time("annotate (split only)")(splitOnly.count())

    val ann = VariantAnnotator.annotate(wide,
      VariantAnnotator.Options(splitColumns = Map("AD" -> 2),
        dropHomRef = true, formatKeys = fmtKeys))
    time("annotate (split+drop)")(ann.count())
    println(ann.queryExecution.executedPlan.toString.take(8000))

    val sel = ann.select(
      col("chrom"), col("pos"), col("ref"), col("alt"), col("sample_id"),
      col("gt"), col("phase"), col("gt1"), col("gt2"), col("a1"), col("a2"),
      col("multiallele"), col("vartype1"), col("vartype2"), col("zygosity"),
      col("hom_ref_counts"), col("DP").cast("long").as("dp"),
      col("AD_0").as("ad_0"), col("AD_1").as("ad_1"))
    time("annotate + select")(sel.count())
    time("annotate + select + orderBy")(
      sel.orderBy("chrom", "pos", "ref", "alt", "sample_id").count())
    time("annotate + select + orderBy (again)")(
      sel.orderBy("chrom", "pos", "ref", "alt", "sample_id").count())
    spark.stop()
  }
}

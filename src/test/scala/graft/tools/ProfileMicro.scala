package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VariantFunctions._
import graft.queries.SyntheticVariants

/** Microbench vartype/zygosity/window on a CACHED long table — isolates
  * per-operator cost from upstream recomputation.
  */
object ProfileMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[micro] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }

    val wide = SyntheticVariants.wide(spark, dir)
    val base = wide.filter(col("alt") =!= ".")
      .select(col("chrom"), col("pos"), col("ref"), col("alt"),
        explode(col("genotypes")).as(Seq("sample_id", "call")))
      .withColumn("gt", element_at(split(col("call"), ":"), 1))
      .filter(!isMissingCall(col("gt")))
      .withColumn("gt1", gt1(col("gt")))
      .withColumn("gt2", gt2(col("gt")))
      .withColumn("a1", alleleBase(col("ref"), col("alt"), col("gt1")))
      .withColumn("a2", alleleBase(col("ref"), col("alt"), col("gt2")))
      .select("chrom", "pos", "ref", "alt", "sample_id", "a1", "a2")
      .cache()
    time("materialize base")(base.count())
    time("count cached")(base.count())
    time("vartype1 on cached")(base.filter(vartype(col("ref"), col("a1")) =!= "zz").count())
    time("vartype1 again")(base.filter(vartype(col("ref"), col("a1")) =!= "zz").count())
    time("zygosity on cached")(base.filter(zygosity(col("ref"), col("a1"), col("a2")) =!= "zz").count())
    import org.apache.spark.sql.expressions.Window
    val site = Window.partitionBy("chrom", "pos", "ref", "alt")
    time("window on cached")(base.withColumn("h",
      sum(when(col("a1") === col("ref"), 1).otherwise(0)).over(site))
      .filter(col("h") >= 0).count())
    time("sort on cached")(base.orderBy("chrom", "pos", "ref", "alt", "sample_id").count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VariantFunctions._
import graft.queries.SyntheticVariants

/** Dissect the annotate pipeline stage-by-stage; every stage is forced
  * with a filter on its newest column so column pruning can't skip it.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }

    val wide = SyntheticVariants.wide(spark, dir)

    val long = wide.filter(col("alt") =!= ".")
      .select(col("chrom"), col("pos"), col("ref"), col("alt"), col("format"),
        explode(col("genotypes")).as(Seq("sample_id", "call")))
    val withGt = long
      .withColumn("fmt", map_from_arrays(split(col("format"), ":"), split(col("call"), ":")))
      .withColumn("gt", element_at(split(col("call"), ":"), 1))
      .filter(!isMissingCall(col("gt")))
    time("explode+gt filter")(withGt.count())

    val p1 = withGt
      .withColumn("phase", phase(col("gt")))
      .withColumn("gt1", gt1(col("gt")))
      .withColumn("gt2", gt2(col("gt")))
    time("+phase/gt1/gt2")(p1.filter(col("phase") =!= "zz").count())

    val p2 = p1
      .withColumn("a1", alleleBase(col("ref"), col("alt"), col("gt1")))
      .withColumn("a2", alleleBase(col("ref"), col("alt"), col("gt2")))
    time("+a1/a2")(p2.filter(col("a1") =!= "zz" && col("a2") =!= "zz").count())

    val p3 = p2.withColumn("zygosity", zygosity(col("ref"), col("a1"), col("a2")))
    time("+zygosity")(p3.filter(col("zygosity") =!= "zz").count())

    import org.apache.spark.sql.expressions.Window
    val site = Window.partitionBy("chrom", "pos", "ref", "alt")
    val p4 = p3.withColumn("hom_ref_counts",
      sum(when(col("zygosity") === "hom-ref", 1).otherwise(0)).over(site))
    time("+window")(p4.filter(col("hom_ref_counts") >= 0).count())

    val p5 = p4.filter(col("zygosity") =!= "hom-ref")
      .withColumn("vartype1", vartype(col("ref"), col("a1")))
      .withColumn("vartype2", vartype(col("ref"), col("a2")))
    time("+drop+vartypes")(p5.filter(col("vartype1") =!= "zz").count())
    spark.stop()
  }
}

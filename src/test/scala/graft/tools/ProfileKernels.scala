package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile: native kernels vs the HOF formulations they replaced
  * (r7 — TokenHashesExpr, NgramHashesExpr, BloomHitCountExpr). Forces
  * full evaluation through a noop write; median of 3. Run:
  * `sbt "Test/runMain graft.tools.ProfileKernels [sfDir]"`.
  */
object ProfileKernels {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    // replicate rows 20× so per-row expression cost dominates task
    // overhead (the sf0.1 documents table alone finishes in ~0.2 s)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), lit(20))).as("__rep"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))

    def timeIt(name: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val m = samples(1)
      println(f"$name%-34s ${m}%8.3f s  (runs: ${samples.map(s => f"$s%.2f").mkString(", ")})")
      m
    }

    val toks = wsTokens(lower(cleanAscii(col("text"))))

    println(s"== kernel vs HOF on $dir documents (median of 3) ==")
    timeIt("tokenHashes kernel") {
      docs.select(tokenHashes(toks).as("h"))
    }
    timeIt("tokenHashes HOF (transform)") {
      docs.select(transform(toks, t => rollingHash(t)).as("h"))
    }
    timeIt("ngramHashes kernel (shingles n=3)") {
      docs.select(array_distinct(
        graft.expressions.StringExprs.ngramHashes(toks, 3)).as("h"))
    }
    timeIt("ngram HOFs (wordNgrams+rollingHash)") {
      docs.select(array_distinct(transform(
        wordNgrams(toks, 3), s => rollingHash(s))).as("h"))
    }
    // bloom probe: eval-set bloom over a fraction of the corpus
    val bloom = graft.operators.Dedup.shingleBloom(
      docs.filter(col("doc_id") % 50 === 0), "text", 3, 200000L)
    timeIt("bloomHitCount kernel") {
      docs.select(graft.expressions.BloomExprs
        .bloomHitCount(bloom, shingleHashes(col("text"), 3)).as("n"))
    }
    timeIt("bloom HOF (size(filter(might_contain)))") {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.graftbridge.Bridge
      import org.apache.spark.sql.types.BinaryType
      docs.select(size(filter(shingleHashes(col("text"), 3), sh =>
        Bridge.column(BloomFilterMightContain(
          Literal.create(bloom, BinaryType), Bridge.expression(sh))))).as("n"))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile: the fused kmeansTrain (one kmeansStepWithObjective scan
  * per history entry) vs an explicit replay of the unfused loop (step
  * scan + separate ivfQuantError scan per round). relTol = 0 does NOT
  * disable the early stop (a non-improving round still trips it), so an
  * untimed probe run first learns how many rounds kmeansTrain actually
  * executes on this data, and both timed sides then run exactly that
  * many — identical work by construction. Run:
  * `sbt "Test/runMain graft.tools.ProfileKmeans [sfDir] [iters] [k]"`.
  */
object ProfileKmeans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
    val seeds = e.filter(col("vec_id").between(100, 99 + k))
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    def median(f: => Seq[Double]): (Double, Seq[Double]) = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (samples(1), samples)
    }

    // untimed probe: how many rounds does the deterministic training
    // actually run before maxIters or the plateau stop?
    val rounds =
      Similarity.kmeansTrain(e, seeds, maxIters = iters, relTol = 0)._2.length - 1
    val (fused, fr) = median {
      val (_, h) = Similarity.kmeansTrain(e, seeds, maxIters = rounds, relTol = 0)
      h
    }
    val (unfused, ur) = median {
      var cents = seeds.select(col("cid").cast("long"), col("cv"))
        .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      def freeze = cents.toDF("cid", "cv")
      var hist = Seq(Similarity.ivfQuantError(e, freeze))
      (0 until rounds).foreach { _ =>
        val learned = Similarity.kmeansCentroids(Similarity.kmeansStep(e, freeze))
          .as[(Long, Seq[Double])].collect().toMap
        cents = cents.map { case (cid, cv) => cid -> learned.getOrElse(cid, cv) }
        hist :+= Similarity.ivfQuantError(e, freeze)
      }
      hist
    }
    if (rounds < iters)
      println(s"note: early stop at $rounds of $iters requested rounds; both sides run $rounds")
    println(f"fused   kmeansTrain ($rounds iters, k=$k): $fused%7.3f s  (runs: ${fr.map(s => f"$s%.2f").mkString(", ")})")
    println(f"unfused replay      ($rounds iters, k=$k): $unfused%7.3f s  (runs: ${ur.map(s => f"$s%.2f").mkString(", ")})")
    println(f"speedup: ${unfused / fused}%.2f x  (scans ${rounds + 1} vs ${2 * rounds + 1})")
    spark.stop()
  }
}

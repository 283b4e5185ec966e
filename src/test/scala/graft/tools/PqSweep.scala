package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity
object PqSweep extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", 8).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
  val w = Window.partitionBy("probe_id").orderBy(col("d").asc, col("cand_id").asc)
  val brute = e.select(col("vec_id").as("cand_id"), col("v").as("cv"))
    .crossJoin(broadcast(e.filter(col("vec_id") < 5).select(col("vec_id").as("probe_id"), col("v").as("pv"))))
    .filter(col("cand_id") =!= col("probe_id"))
    .withColumn("d", Similarity.l2sq(col("cv"), col("pv")))
    .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
    .select("probe_id", "cand_id")
  for ((m, kk, steps) <- Seq((4, 8, 0), (4, 8, 3), (4, 16, 0), (4, 16, 3), (8, 16, 3), (4, 32, 3))) {
    var books = Similarity.pqCodebooks(e.filter(col("vec_id").between(200, 199 + kk)), m)
    for (_ <- 0 until steps) books = Similarity.pqTrainStep(e, books)
    val pq5 = Similarity.pqAdcTopK(Similarity.pqEncode(e, books), e.filter(col("vec_id") < 5), books, 5)
      .select("probe_id", "cand_id")
    val hit = brute.join(pq5, Seq("probe_id", "cand_id")).count()
    println(s"m=$m K=$kk steps=$steps recall@5 = ${hit / 25.0}")
  }
  spark.stop()
}

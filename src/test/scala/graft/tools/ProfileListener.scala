package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.queries.LlmQueries

/** Run the exact q15 gate query with a stage listener: prints per-stage
  * task count + executor run time to locate the real hot stage.
  */
object ProfileListener {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        println(f"[lst] stage=${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"runTime=${si.taskMetrics.executorRunTime / 1000.0}%8.1f s  " +
          f"shuffleRead=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
          f"spill=${si.taskMetrics.memoryBytesSpilled / 1e6}%8.1f MB  ${si.name.take(60)}")
      }
    })

    val q15 = graft.SparkEntry.queries("q15_vcf_annotate")
    val t0 = System.nanoTime()
    val n = q15(spark, "/root/testdata/sf0.1").count()
    println(f"[lst] TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}

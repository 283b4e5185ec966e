package graft.tools

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dump the POST-EXECUTION (AQE final) plan for declared queries, plus
  * a per-stage metrics table — the evidence static `explain` cannot
  * show: runtime exchange/stage REUSE only appears in the final
  * adaptive plan (`AdaptiveSparkPlan isFinalPlan=true`), so a claim
  * like "the self-join's shuffle map stage executes once" is checked
  * here by (a) the final plan's stage wiring and (b) the actual stage
  * list with shuffle-write record counts (a reused map stage simply
  * never runs a second time).
  *
  * Usage: runMain graft.tools.FinalPlanDump <outDir> <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(name: String, execMs: Long, shufWrite: Long,
        swRows: Long, input: Long, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages.synchronized {
          stages += St(sc.stageInfo.name.takeWhile(_ != '\n'),
            m.executorRunTime, m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.inputMetrics.bytesRead, sc.stageInfo.numTasks)
        }
      }
    })

    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val full = qs.keys.toSeq.sorted.find(_.startsWith(n)).getOrElse(n)
      stages.synchronized(stages.clear())
      val df = qs(full)(spark, sfDir)
      // execute the dataframe's OWN QueryExecution (a noop-sink write
      // would wrap the plan in a separate write command whose execution
      // leaves df.queryExecution un-run — isFinalPlan=false, no stage
      // wiring). toRdd is the AdaptiveSparkPlanExec itself; one foreach
      // action computes every row and finalizes the adaptive plan.
      df.queryExecution.toRdd.foreach(_ => ())
      Thread.sleep(200) // drain straggler stage events
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val snap = stages.synchronized(stages.toList)
      val table = snap.map(s =>
        f"exec ${s.execMs / 1e3}%8.2f s  sw ${s.shufWrite / 1048576.0}%8.1fMB" +
          f"  swRows ${s.swRows}%10d  in ${s.input / 1048576.0}%8.1fMB" +
          f"  tasks ${s.tasks}%4d  ${s.name.take(90)}").mkString("\n")
      val txt = s"== AQE FINAL plan (post-execution) ==\n$plan\n" +
        s"== executed stages (each line = one stage that actually ran) ==\n$table\n"
      Files.write(Paths.get(outDir, s"${full}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${full}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}

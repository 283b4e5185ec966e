package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  * MEDIAN wall time is reported — this box is bursty (SURVEY §8: ±2×
  * run-to-run on untouched queries; round-2's unexplained 9× q16 swing),
  * so a single sample is noise. The JSON also carries the executor-stage
  * time of the median run (`exec`) — wall vs exec separates "the plan is
  * slow" from "the host was busy".
  *
  * The forcing action is a noop-sink write, not count(): under count()
  * column pruning deletes the window + classifier columns (SURVEY §8
  * "count()-based timing lies"), so every output column is evaluated
  * here, with zero driver-collect cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata parquet is tiny; small splits keep all cores busy
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // total executor task run time, attributed per query between reads
    val execMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        execMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
    })

    // optional local-iteration filter, prefix-matched so both
    // SPARK_GRAFT_BENCH_ONLY=q14,q15 and full names select queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    def measure(name: String): (String, (Double, Double), Int) = {
      val fn = SparkEntry.queries(name)
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val e0 = execMs.get()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let straggler stage-completed events drain
        val exec = (execMs.get() - e0) / 1e3
        (if (ok) wall else -1.0, exec)
      }
      // median over SUCCESSFUL runs only: a failed run's -1 sentinel
      // would sort first and bias the "median" toward the fast sample;
      // -1 is reported only when every run failed, with the failure
      // count carried separately so partial failures stay visible.
      val good = samples.filter(_._1 >= 0).sortBy(_._1)
      val median = if (good.isEmpty) (-1.0, -1.0) else good(good.size / 2)
      (name, median, runs - good.size)
    }
    val results = names.map(measure)

    // SELF-ADJUDICATING outlier pass: three straight rounds needed a
    // manual isolation re-measure to separate "the plan regressed" from
    // "the host was busy / the codegen cache churned" (q62/q27 r6,
    // q66/q69/q70 + q68 r7). Automate it: any query whose exec moved
    // >3× against the LAST committed full artifact (the pre-run content
    // of BENCH_FULL.json — the driver's BENCH_r{N}.json is a clipped
    // stdout wrapper with no machine-readable exec map) re-measures at
    // the END of the suite — same medians, warm JVM, nothing else
    // running — and the isolation numbers ride the artifact so the
    // verdict can adjudicate without a by-hand rerun. Floor 5
    // exec-seconds (tiny queries swing 3× on noise alone); capped at 8
    // re-measures to bound suite time.
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "/root/repo/BENCH_FULL.json"))
    val isolation: Seq[(String, (Double, Double), Int)] =
      if (sys.env.get("SPARK_GRAFT_BENCH_ISOLATE").contains("0")) Seq.empty
      else {
        val prevExec: Map[String, Double] =
          (try Some(new String(java.nio.file.Files.readAllBytes(fullPath),
            java.nio.charset.StandardCharsets.UTF_8))
          catch { case _: Throwable => None }).toSeq.flatMap { txt =>
            "\"exec_sec\":\\{([^}]*)\\}".r.findFirstMatchIn(txt).toSeq.flatMap(m =>
              "\"([^\"]+)\":(-?[0-9.]+)".r.findAllMatchIn(m.group(1))
                .map(p => p.group(1) -> p.group(2).toDouble))
          }.toMap
        val moved = results.flatMap { case (name, (_, exec), _) =>
          prevExec.get(name).collect {
            case prev if prev > 0 && exec > 0 &&
                math.max(prev, exec) >= 5.0 &&
                math.max(prev, exec) / math.min(prev, exec) > 3.0 =>
              (name, math.max(prev, exec))
          }
        }.sortBy(-_._2).take(8).map(_._1)
        moved.map(measure)
      }
    // 3-decimal doubles: ms resolution is below this host's noise floor
    // and full 9-decimal doubles doubled the line size.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def fmt(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val qs = fmt(results.map { case (k, (w, _), _) => k -> w })
    val ex = fmt(results.map { case (k, (_, e), _) => k -> e })
    val failed = results.filter(_._3 > 0)
    val fails = failed.map { case (k, _, n) => s"\"" + k + "\":" + n }.mkString("{", ",", "}")
    val total = r3(results.map(_._2._1).filter(_ >= 0).sum)
    // The driver captures a bounded TAIL of stdout, and at 67 queries
    // the line exceeds that cap — four rounds of artifacts lost either
    // the head or the middle of the per-query WALL map. Two fixes:
    // (1) the COMPLETE json is written to BENCH_FULL.json next to this
    // repo (committed per round, so the full wall+exec maps are always
    // readable even when stdout clips); (2) the stdout line orders the
    // biggest expendable map (exec_sec) FIRST and the wall map + summary
    // LAST, so whatever tail survives always ends with every wall time
    // and the verdict-critical totals.
    val isoW = fmt(isolation.map { case (k, (w, _), _) => k -> w })
    val isoE = fmt(isolation.map { case (k, (_, e), _) => k -> e })
    val line = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs":$runs,"failed_runs":$fails,"full":"BENCH_FULL.json","isolation_wall":$isoW,"isolation_exec":$isoE,"exec_sec":$ex,"queries":$qs,"total":$total}"""
    // Only a FULL-suite run may overwrite the committed artifact: a
    // SPARK_GRAFT_BENCH_ONLY iteration loop would otherwise clobber the
    // complete wall/exec maps that the next run's outlier adjudication
    // (and the round ledger) compare against — exactly what happened to
    // the r7 map during a single-family isolation run.
    if (only.isEmpty)
      try java.nio.file.Files.write(fullPath,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"BENCH_FULL.json write failed: $e") }
    else System.err.println(
      s"BENCH_ONLY filter active — not overwriting $fullPath")
    println(line)
    spark.stop()
  }
}

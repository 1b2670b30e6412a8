package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement aid (guide §1): per-query job/stage/task accounting, because
  * the sandbox runs with the UI disabled. For each named query (all, or the
  * comma-separated SPARK_GRAFT_ONLY subset) runs one untimed warmup then one
  * timed pass to the noop sink, and prints
  *   name, wall s, #jobs, #stages, #tasks, Σ task time s, Σ shuffle bytes
  * so "overhead-bound" (wall ≫ Σtask/cores, many jobs) and "compute-bound"
  * (Σtask ≈ wall × cores) entries are distinguishable from the driver.
  * Not registered in SparkEntry — a diagnostic main, like ScaleBench.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    @volatile var shuffleBytes = 0L
    val stageLog =
      new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val info = s.stageInfo
        stageLog.synchronized {
          stageLog += ((info.stageId,
            info.name.linesIterator.next().take(120), info.numTasks,
            info.taskMetrics.executorRunTime / 1e3))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskNanos += m.executorRunTime * 1000000L
          shuffleBytes += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val dumpStages = sys.env.contains("SPARK_GRAFT_STAGES")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def runOnce(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    println("name,wall_s,jobs,stages,tasks,task_time_s,shuffle_mb")
    names.foreach { name =>
      runOnce(name) // warmup
      Thread.sleep(50) // let straggler listener events drain
      jobs = 0; stages = 0; tasks = 0; taskNanos = 0L; shuffleBytes = 0L
      stageLog.synchronized(stageLog.clear())
      val t0 = System.nanoTime()
      runOnce(name)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"$name,$wall%.3f,$jobs,$stages,$tasks,${taskNanos / 1e9}%.3f," +
        f"${shuffleBytes / 1048576.0}%.2f")
      if (dumpStages) stageLog.synchronized {
        stageLog.sortBy(-_._4).take(25).foreach { case (id, nm, nt, s) =>
          println(f"  STAGE $id%5d  $s%8.2f s  $nt%4d tasks  $nm")
        }
      }
    }
    spark.stop()
  }
}

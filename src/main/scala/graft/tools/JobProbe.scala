package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev scratch probe — per-job wall time + description for one entry,
  * to see which scheduled jobs an iterative loop actually spends its
  * bench seconds in (job COUNT alone lies: AQE splits an execution
  * into per-stage jobs that can be microseconds or seconds).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          println(f"  job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc")
        }
      }
      // stage-level attribution: name + summed executor run/GC time tells
      // WHICH operator a slow job spends its seconds in (the job line
      // alone can't — AQE reuses one description across all its jobs)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m != null && m.executorRunTime > 500)
          println(f"    stage ${i.stageId}%4d run=${m.executorRunTime / 1e3}%7.2f s" +
            f" gc=${m.jvmGCTime / 1e3}%5.1f s cpu=${m.executorCpuTime / 1e9}%7.2f s" +
            f" tasks=${i.numTasks}%3d  ${i.name.take(70)}")
      }
    })
    def run(name: String): Unit =
      graft.Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    graft.graph.CodeGraph.edges(spark, dir).count()
    graft.graph.CodeGraph.nodeBlocks(spark, dir).count()
    graft.graph.CodeGraph.edgePairs(spark, dir).count()
    graft.graph.CodeGraph.undPairs(spark, dir).count()
    graft.graph.CodeGraph.coPairs(spark, dir).count()
    // one warm pass (untimed print-suppressed would be nicer; just run 2)
    for (it <- 1 to 2) {
      graft.core.Checkpoints.sweepAnonymous(spark)
      System.gc()
      println(s"=== iter $it ${args(0)}")
      val t0 = System.nanoTime()
      run(args(0))
      println(f"=== total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit =
      graft.Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    // same warmup as Bench: materialize the derived graph views first
    graft.graph.CodeGraph.edges(spark, dir).count()
    graft.graph.CodeGraph.nodeBlocks(spark, dir).count()
    graft.graph.CodeGraph.edgePairs(spark, dir).count()
    graft.graph.CodeGraph.undPairs(spark, dir).count()
    graft.graph.CodeGraph.coPairs(spark, dir).count()
    // job/stage/task counters: wall-clock on a loaded box is noisy, the
    // scheduling shape (jobs × stages) is what the loop rewrites change
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); ()
        }
      })
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapMb: Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed / (1024 * 1024)
    for (it <- 1 to 3; name <- args) {
      // mirror Bench: untimed storage reset between queries
      graft.core.Checkpoints.sweepAnonymous(spark)
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0)
      val gc0 = gcMs; val h0 = heapMb
      val t0 = System.nanoTime()
      run(name)
      println(f"iter$it $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s" +
        f"  jobs=${jobs.get()}%3d stages=${stages.get()}%3d tasks=${tasks.get()}%5d" +
        f"  gc=${gcMs - gc0}%5d ms heap=$h0%5d->${heapMb}%5d MB")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Why does the iterative cohort run 2-3x slower IN-SUITE than
  * isolated (r11: bfs_both_depth2 5.9-6.9 s in-suite vs 2.3 s in a
  * fresh JVM, same jobs/stages/tasks)? This probe reproduces the
  * suite's JVM aging in one process: time a sentinel entry fresh,
  * run a heavy mid-suite slice, re-time the sentinel, and report the
  * degradation alongside GC time, heap, JIT-compilation time, and
  * loaded-class counts — the candidate causes a fresh-JVM BenchProbe
  * can't see. `runMain graft.tools.SuiteDegradeProbe [sentinel...]`
  */
object SuiteDegradeProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val sentinels =
      if (args.nonEmpty) args.toSeq
      else Seq("bfs_both_depth2", "topo_levels", "graph_lpa")
    val heavy = Seq(
      "graph_pagerank", "graph_coreness", "graph_triangles",
      "graph_linkpred", "graph_louvain_deep", "graph_modularity",
      "graph_diameter", "graph_hits", "graph_coloring", "graph_stress",
      "graph_betweenness", "graph_walk_pairs", "graph_ktruss",
      "graph_clustering", "sssp_paths", "text_bpe_merges",
      "dedup_prefix_join", "ann_ivfpq", "events_cms_counts",
      "corpus_shuffle")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit =
      graft.Queries.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    graft.graph.CodeGraph.edges(spark, dir).count()
    graft.graph.CodeGraph.nodeBlocks(spark, dir).count()
    graft.graph.CodeGraph.edgePairs(spark, dir).count()
    graft.graph.CodeGraph.undPairs(spark, dir).count()
    graft.graph.CodeGraph.coPairs(spark, dir).count()
    Queries2.prebuildAll(spark, dir)

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    def classes: Int = java.lang.management.ManagementFactory
      .getClassLoadingMXBean.getLoadedClassCount
    def heapMb: Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed / (1024 * 1024)

    def sample(tag: String): Unit = {
      for (s <- sentinels) {
        val ts = (1 to 3).map { _ =>
          graft.core.Checkpoints.sweepAnonymous(spark)
          System.gc()
          val g0 = gcMs; val j0 = jitMs
          val t0 = System.nanoTime()
          run(s)
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, gcMs - g0, jitMs - j0)
        }
        val med = ts.map(_._1).sorted.apply(1)
        println(f"$tag $s%-18s median=$med%5.2f s  " +
          ts.map(t => f"${t._1}%.2f/${t._2}ms/${t._3}ms").mkString(" ") +
          f"  heap=$heapMb%5d MB classes=$classes%6d")
      }
    }

    sample("FRESH")
    val tH0 = System.nanoTime()
    heavy.foreach { h => try run(h) catch { case _: Throwable => () } }
    println(f"heavy slice: ${(System.nanoTime() - tH0) / 1e9}%.1f s")
    sample("AGED ")
    spark.stop()
  }

  /** Force every registered stored artifact, like Bench's materialize
    * phase (kept out of the timing).
    */
  private object Queries2 {
    def prebuildAll(spark: SparkSession, dir: String): Unit =
      graft.Queries.prebuild.foreach { case (_, pb) =>
        try pb(spark, dir) catch { case _: Throwable => () }
      }
  }
}

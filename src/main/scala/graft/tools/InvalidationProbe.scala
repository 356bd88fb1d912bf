package graft.tools

import org.apache.spark.sql.SparkSession

/** Test of the in-suite inflation hypothesis (r12): an MVCC-writing
  * entry invalidates the session QueryCache, unpersisting the shared
  * CodeGraph store views — and the next NON-artifact view consumer
  * (the BFS family, triangles, LPA) pays the view re-materialization
  * inside its timed window, while artifact entries get their views
  * re-warmed for free by their untimed prebuild. Sequence: warm →
  * time bfs_both_depth2 → run an MVCC writer → time again → time
  * again. If the hypothesis holds, the middle draw is the 4-6×
  * in-suite number and the outer draws are the ~1.4 s isolated one.
  *
  * `runMain graft.tools.InvalidationProbe`
  */
object InvalidationProbe {
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
    def run(name: String): Double = {
      graft.core.Checkpoints.sweepAnonymous(spark)
      System.gc()
      val t0 = System.nanoTime()
      graft.Queries.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // materialize phase, like Bench
    graft.graph.CodeGraph.edges(spark, dir).count()
    graft.graph.CodeGraph.nodeBlocks(spark, dir).count()
    graft.graph.CodeGraph.edgePairs(spark, dir).count()
    graft.graph.CodeGraph.undPairs(spark, dir).count()
    graft.graph.CodeGraph.coPairs(spark, dir).count()
    run("bfs_both_depth2") // JIT warm
    println(f"warm1   bfs_both_depth2 ${run("bfs_both_depth2")}%6.2f s")
    println(f"writer  mvcc_roundtrip  ${run("mvcc_roundtrip")}%6.2f s" +
      s"  (cache size after: ${graft.query.QueryCache.forSession(spark).size})")
    println(f"post-w  bfs_both_depth2 ${run("bfs_both_depth2")}%6.2f s   <- pays the view rebuild?")
    println(f"warm2   bfs_both_depth2 ${run("bfs_both_depth2")}%6.2f s")
    println(f"writer  put_edge_dedup  ${run("put_edge_dedup")}%6.2f s")
    println(f"post-w2 graph_triangles ${run("graph_triangles")}%6.2f s   <- coPairs rebuild?")
    println(f"warm3   graph_triangles ${run("graph_triangles")}%6.2f s")
    spark.stop()
  }
}

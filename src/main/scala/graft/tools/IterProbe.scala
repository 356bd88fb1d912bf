package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: per-phase timing inside the iterative analytics. */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ep = graft.graph.CodeGraph.edgePairs(spark, dir)
    println(s"edgePairs count: ${ep.count()}")
    val und = graft.graph.CodeGraph.undPairs(spark, dir)
    println(s"undPairs count: ${und.count()}")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      time("pagerank") {
        graft.graph.GraphAnalytics.pagerankFixedPoint(ep, iters = 5,
          pairsDistinct = true).write.format("noop").mode("overwrite").save()
      }
      time("kcore") {
        graft.graph.GraphAnalytics.kcore(und, k = 2, rounds = 8,
          undirectedPairs = true).write.format("noop").mode("overwrite").save()
      }
      time("components") {
        graft.graph.GraphAnalytics.connectedComponents(und, rounds = 6,
          undirectedPairs = true).write.format("noop").mode("overwrite").save()
      }
      time("lpa") {
        graft.graph.GraphAnalytics.labelPropagation(und, rounds = 4,
          undirectedPairs = true).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

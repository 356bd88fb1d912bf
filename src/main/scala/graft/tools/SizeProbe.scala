package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — row counts and degree stats of the derived
  * graph views at a given sf dir, to size loop-shuffle widths and
  * sanity-check which view each heavy entry actually probes.
  */
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.CodeGraph.edges(spark, dir)
    val ep = graft.graph.CodeGraph.edgePairs(spark, dir)
    val up = graft.graph.CodeGraph.undPairs(spark, dir)
    val cp = graft.graph.CodeGraph.coPairs(spark, dir)
    val nb = graft.graph.CodeGraph.nodeBlocks(spark, dir)
    println(s"edges      = ${e.count()}")
    println(s"edgePairs  = ${ep.count()}")
    println(s"undPairs   = ${up.count()}")
    println(s"coPairs    = ${cp.count()}")
    println(s"nodeBlocks = ${nb.count()}")
    val deg = up.groupBy("src").count()
    deg.agg(count(lit(1)).as("v"), max("count").as("maxDeg"),
      avg("count").as("avgDeg")).show()
    val cdeg = cp.groupBy("src").count()
    cdeg.agg(count(lit(1)).as("v_co"), max("count").as("maxDeg_co"),
      avg("count").as("avgDeg_co")).show()
    spark.stop()
  }
}

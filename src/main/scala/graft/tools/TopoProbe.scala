package graft.tools

import graft.graph.{CodeGraph, Traversal}
import org.apache.spark.sql.SparkSession

/** Dev scratch probe — interleaved A/B timing of topoLevels on the
  * memoized edge pairs at a given SF (run order alternates so JVM/GC
  * drift hits both variants equally). Not part of the library surface.
  */
object TopoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs = CodeGraph.edgePairs(spark, dir)
    pairs.count() // warm the memoized graph

    def run(): Double = {
      val t0 = System.nanoTime()
      Traversal.topoLevels(pairs, edgesDistinct = true).count()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val ts = (1 to 5).map(_ => run()).sorted
    println(f"topoLevels median=${ts(ts.size / 2)}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — per-phase timing of the Borůvka MSF loop, to
  * locate where graph_msf's wall seconds go (jobs are all sub-0.2 s,
  * so the cost is driver-side). Duplicates the entry's weight
  * derivation; not part of the library surface.
  */
object MsfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ep = graft.graph.CodeGraph.edgePairs(spark, dir)
    println(s"edgePairs: ${ep.count()}")
    val weighted = ep.withColumn("w",
      lit(1L) + (expr("CAST(substring(src, 2, 100) AS BIGINT)")
        + expr("CAST(substring(dst, 2, 100) AS BIGINT)")) % 7)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (it <- 1 to 2) {
      println(s"=== iter $it")
      time("msf total") {
        graft.graph.GraphAnalytics.minimumSpanningForest(weighted, canonicalInput = true, probe = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

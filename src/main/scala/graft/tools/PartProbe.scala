package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — A/B `spark.sql.shuffle.partitions` for the
  * label-table loops (AQE is self-scoped off there, so the loops lost
  * runtime partition coalescing; their per-round shuffles are V-sized
  * and may prefer fewer, fuller partitions at local[32]).
  *
  * CAVEAT (post-r6): the label-table loops now self-size via
  * `Checkpoints.withLoopShuffle` — the effective loop width is
  * min(sweep value, max(4, V/25k, E/250k)), so sweep arms ABOVE that
  * ceiling measure the same configuration and differ only by noise.
  * The sweep is meaningful below the ceiling, for non-loop entries, or
  * after temporarily unwrapping the loop (how the r6 sizing constants
  * were chosen).
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("graph_components")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.graph.CodeGraph.edgePairs(spark, dir).count()
    graft.graph.CodeGraph.undPairs(spark, dir).count()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.Queries.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warm
    for (p <- Seq("32", "8", "16", "32"); n <- names) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      graft.core.Checkpoints.sweepAnonymous(spark)
      System.gc()
      val ts = (1 to 3).map(_ => run(n)).sorted
      println(f"parts=$p%-3s $n%-24s median=${ts(1)}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — A/B entries with the SESSION AQE flag on vs
  * off. CAVEAT: the label-table loops (pagerank/ppr, components,
  * k-core, LPA, MSF, topo) self-scope AQE off via
  * `Checkpoints.withoutAqe`, so for those entries both arms measure
  * the same loop-internal setting and any aqe=true/false delta is
  * suite-position noise, not AQE — the A/B is only meaningful for
  * entries OUTSIDE the withoutAqe set (frontier loops, one-shot
  * queries), or after temporarily unwrapping the loop under test
  * (how the r6 decision matrix was produced).
  */
object AqeProbe {
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
    names.foreach { n => run(n) } // warm
    for (aqe <- Seq(true, false); n <- names) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      graft.core.Checkpoints.sweepAnonymous(spark)
      System.gc()
      val ts = (1 to 3).map(_ => run(n)).sorted
      println(f"aqe=$aqe%-5s $n%-24s median=${ts(1)}%.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

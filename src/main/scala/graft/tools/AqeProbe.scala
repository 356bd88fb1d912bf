package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — A/B the iterative graph entries with AQE on vs
  * off. The iterative loops materialize many SMALL (V-sized) frames;
  * AQE re-plans every materialization per stage, which is pure driver
  * latency when the frames are known-small and the plans are fixed.
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

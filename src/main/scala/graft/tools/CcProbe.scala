package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-round cost of the connected-components loop. */
object CcProbe {
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
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = graft.graph.CodeGraph.edgePairs(spark, dir)
    t("edgePairs count")(pairs.count())
    val und0 = pairs.select(col("src").as("a"), col("dst").as("b"))
      .union(pairs.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(false)
    val init = und0.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(false)
    t("init count")(init.count())
    var labels = init
    for (r <- 1 to 6) {
      val lblsA = labels.withColumnRenamed("id", "a")
      val msgs = und0.join(broadcast(lblsA), Seq("a"))
        .select(col("b").as("id"), col("lbl"))
      val m = t(s"round $r m")(
        labels.union(msgs).groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint(true))
      val mSide = m.select(col("id").as("lbl"), col("lbl").as("lbl2"))
      val jumped = t(s"round $r jump")(
        m.join(broadcast(mSide), Seq("lbl"))
          .select(col("id"), col("lbl2").as("lbl"))
          .localCheckpoint(true))
      labels = jumped
    }
    spark.stop()
  }
}

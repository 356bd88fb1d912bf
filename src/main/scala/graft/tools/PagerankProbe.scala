package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev scratch probe — per-stage timing + plan inspection for the
  * fixed-point PageRank loop at sf0.1.
  */
object PagerankProbe {
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
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairsAll = t("edgePairs materialize") {
      val p = graft.graph.CodeGraph.edgePairs(spark, dir); p.count(); p
    }
    // inline copy of the pagerank loop with per-phase timing
    val pairs = pairsAll.select(col("src"), col("dst"))
    val nodes = t("nodes") {
      val n = pairs.select(col("src").as("id"))
        .union(pairs.select(col("dst").as("id"))).distinct()
        .localCheckpoint(false)
      n.count(); n
    }
    val n = nodes.count()
    val base = 1000000000000L / n
    val teleport = 15L * base / 100L
    val outdeg = pairs.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint(false)
    val dangIds = nodes.join(outdeg, Seq("id"), "left_anti")
      .localCheckpoint(false)
    var rank = nodes.withColumn("rank", lit(base)).localCheckpoint(false)
    for (it <- 1 to 5) {
      val dangling = t(s"iter$it dangling") {
        rank.join(dangIds, Seq("id"), "left_semi")
          .agg(coalesce(sum("rank"), lit(0L))).first().getLong(0)
      }
      val dangShare = dangling / n
      val incoming = rank.join(outdeg, Seq("id"))
        .select(col("id").as("src"), expr("rank div outdeg").as("share"))
        .join(pairs, Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("share").as("inc"))
      rank = nodes.join(incoming, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"85 * (coalesce(inc, 0L) + ${dangShare}L) div 100")
          ).as("rank"))
        .localCheckpoint(false)
      if (it == 2) {
        val plan = rank.queryExecution.executedPlan.toString
        val nEx = "Exchange".r.findAllIn(plan).length
        println(s"  iter2 plan exchanges: $nEx")
      }
      t(s"iter$it materialize")(rank.count())
    }
    spark.stop()
  }
}

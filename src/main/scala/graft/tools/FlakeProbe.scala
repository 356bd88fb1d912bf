package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev scratch probe — hunt the r5 graph_pagerank/graph_ppr driver
  * hash flake: loop both entries under deliberate storage pressure
  * (small heap via SPARK_DRIVER_MEM + churned MEMORY_ONLY ballast that
  * forces block eviction between iterations) and compare an
  * order-independent value hash across repetitions. Any deviation or
  * invariant-check throw is a reproduction.
  *
  * Usage: SPARK_DRIVER_MEM=3g sbt "runMain graft.tools.FlakeProbe 12 /root/testdata/sf0.01"
  */
object FlakeProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 12
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // order-independent value hash; pmod keeps each term < 2^30 so the
    // ANSI-mode sum cannot overflow (raw xxhash64 sums do, and the
    // overflow point depends on accumulation order)
    def hashOf(name: String): Long =
      graft.Queries.queries(name)(spark, dir)
        .agg(sum(pmod(xxhash64(col("id"), col("rank")), lit(1073741789L))))
        .first().getLong(0)
    val names = Seq("graph_pagerank", "graph_ppr")
    var baseline = Map.empty[String, Long]
    var flakes = 0
    for (rep <- 1 to reps) {
      // churn storage: a fresh MEMORY_ONLY ballast each rep competes
      // with checkpoint blocks for the storage pool (LRU eviction)
      val ballast = spark.range(0, 6000000L)
        .select(col("id"), sha2(col("id").cast("string"), 256).as("pad"))
        .persist(StorageLevel.MEMORY_ONLY)
      ballast.count()
      for (n <- names) {
        try {
          val h = hashOf(n)
          baseline.get(n) match {
            case None => baseline += n -> h
            case Some(b) if b != h =>
              flakes += 1
              println(s"FLAKE rep=$rep $n: hash $h != baseline $b")
            case _ => ()
          }
        } catch { case e: Throwable =>
          flakes += 1
          println(s"FLAKE rep=$rep $n threw: ${e.getMessage}")
        }
      }
      ballast.unpersist(blocking = false)
      graft.core.Checkpoints.sweepAnonymous(spark)
      println(s"rep $rep done (storage=${spark.sparkContext.getPersistentRDDs.size} rdds)")
    }
    println(if (flakes == 0) s"PASS: $reps reps stable" else s"FAIL: $flakes flakes")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — fixture document geometry + micro-timing of the
  * per-row text expressions that dominate the map-heavy entries.
  */
object DocStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.select(count(lit(1)).as("n"),
      sum(length(col("text"))).as("chars"),
      max(length(col("text"))).as("max_chars"),
      sum(size(split(col("text"), "\\s+"))).as("tokens"),
      max(size(split(col("text"), "\\s+"))).as("max_tokens"))
      .show(false)
    println("partitions=" + docs.rdd.getNumPartitions)
    def t(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      docs.select(c.as("x")).write.format("noop").mode("overwrite").save()
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("tokens()")(graft.pipeline.TextAnalysis.tokens(col("text")))
    t("sort(tokens)")(array_sort(graft.pipeline.TextAnalysis.tokens(col("text"))))
    t("simhash16")(graft.pipeline.Dedup.simhash16(col("text")))
    t("minKgramHash")(graft.pipeline.TextAnalysis.minKgramHash(col("text"), 8))
    spark.stop()
  }
}

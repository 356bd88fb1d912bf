package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where the PMI pipeline spends time. */
object PmiProbe {
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
    val docs = graft.core.Tables.documents(spark, dir)
    import graft.pipeline.TextAnalysis
    for (_ <- 1 to 2) {
      val ws = expr(
        "filter(split(lower(text), '\\\\s+'), x -> x != '')")
      val n = size(ws)
      val bigrams = when(n >= 2,
        transform(sequence(lit(1), n - 1),
          i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>"))
      t("uni count")(docs.select(explode(ws).as("w"))
        .groupBy("w").agg(count(lit(1))).write.format("noop").mode("overwrite").save())
      t("bigram explode+count")(docs.select(explode(bigrams).as("big"))
        .groupBy("big").agg(count(lit(1))).write.format("noop").mode("overwrite").save())
      t("full pmi")(TextAnalysis.pmiCollocations(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

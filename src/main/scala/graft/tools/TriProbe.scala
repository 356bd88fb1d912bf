package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage costs of the triangle-count pipeline. */
object TriProbe {
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
    for (_ <- 1 to 2) {
      val baskets = graft.core.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"),
          concat(lit("P"), col("l_partkey")).as("p"))
        .groupBy("ok").agg(sort_array(collect_set(col("p"))).as("ps"))
      val pairs = baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          | transform(slice(ps, i + 2, size(ps)),
          |   y -> struct(x AS src, y AS dst))))""".stripMargin)).as("pr"))
        .select(col("pr.src"), col("pr.dst")).distinct()
      val canon = t("canon")(pairs
        .select(col("src").as("a"), col("dst").as("b")).localCheckpoint(true))
      val deg = canon.select(col("a").as("id"))
        .union(canon.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val lower = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val o = t("orient")(canon
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .select(when(lower, col("a")).otherwise(col("b")).as("u"),
          when(lower, col("b")).otherwise(col("a")).as("v"))
        .localCheckpoint(true))
      t("canon count")(canon.count())
      val wedges = o.join(o.select(col("u"), col("v").as("w")), Seq("u"))
        .filter(col("v") < col("w"))
      val tri = wedges.join(
        broadcast(canon.select(col("a").as("v"), col("b").as("w"))),
        Seq("v", "w"), "left_semi")
      t("wedges+close+agg")(
        tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("triangles"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

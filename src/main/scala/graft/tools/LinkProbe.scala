package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — stage-by-stage wall times inside linkPredTopK
  * at sf0.1, to find which materialization owns the seconds.
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val pairs = graft.graph.CodeGraph.edgePairs(spark, dir)
    t("warm edgePairs")(pairs.count())
    val canon = t("canon ckpt") {
      pairs.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint(true)
    }
    val nodes = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id"))).distinct()
    val (ranked, v) = t("globalRankBy") {
      graft.pipeline.Sampling.globalRankBy(nodes, Seq(col("id")))
    }
    val dict = t("dict ckpt") {
      ranked.select(col("id"), col("pos").as("code")).localCheckpoint(true)
    }
    println(s"  V=$v")
    val P = 4294967296L
    val canonC = t("canonC ckpt") {
      canon
        .join(broadcast(dict.select(col("id").as("a"), col("code").as("ac"))), Seq("a"))
        .join(broadcast(dict.select(col("id").as("b"), col("code").as("bc"))), Seq("b"))
        .select((col("ac") * P + col("bc")).as("pk"))
        .localCheckpoint(true)
    }
    val adj = t("adj ckpt") {
      canonC
        .select(expr(s"pk div ${P}L").as("id"), (col("pk") % P).as("nb"))
        .union(canonC.select((col("pk") % P).as("id"),
          expr(s"pk div ${P}L").as("nb")))
        .groupBy("id").agg(sort_array(collect_set(col("nb"))).as("adj"))
        .localCheckpoint(true)
    }
    val deg = adj.select(col("id"), size(col("adj")).cast("long").as("deg"))
    val wedges = adj
      .filter(size(col("adj")).between(2, 100))
      .select(explode(expr(
        s"""flatten(transform(adj, (x, i) ->
           | transform(slice(adj, i + 2, size(adj)),
           |   y -> x * ${P}L + y)))""".stripMargin)).as("pk"))
    val cnt0 = wedges.groupBy("pk").agg(count(lit(1)).as("cn"))
    val cnt = t("cnt ckpt")(cnt0.localCheckpoint(true))
    println("   cnt parts=" + cnt.rdd.getNumPartitions)
    val cand = cnt.join(broadcast(canonC), Seq("pk"), "left_anti")
      .select(expr(s"pk div ${P}L").as("vc"), (col("pk") % P).as("wc"), col("cn"))
    val top = cand
      .join(broadcast(deg.select(col("id").as("vc"), col("deg").as("deg_v"))), Seq("vc"))
      .join(broadcast(deg.select(col("id").as("wc"), col("deg").as("deg_w"))), Seq("wc"))
      .select(col("vc"), col("wc"), col("cn"),
        round(col("cn") / (col("deg_v") + col("deg_w") - col("cn")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("cn").desc, col("vc"), col("wc"))
      .limit(100)
    t("full tail (anti+deg+topk)")(top.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — stage timing for incrementalDedup at a given SF. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val isBatch = substring(col("source"), 4, 10).cast("int") < 5
    val batch = docs.filter(isBatch).cache()
    val corpus = docs.filter(!isBatch).cache()
    var t0 = System.nanoTime()
    def lap(l: String, n: Long): Unit = {
      println(f"$l%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    lap("batch", batch.count()); lap("corpus", corpus.count())
    def long(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBands(df, "doc_id", "text").select(col("doc_id"),
        posexplode(array((0 until 4).map(b => col(s"band$b")): _*))
          .as(Seq("band_idx", "band_key")))
    val lb = long(batch).cache(); lap("batch bands", lb.count())
    val lc = long(corpus).cache(); lap("corpus bands", lc.count())
    val cand = lb.select(col("doc_id").as("id_a"), col("band_idx"), col("band_key"))
      .join(lc.select(col("doc_id").as("id_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select("id_a", "id_b").distinct().cache()
    lap("candidates", cand.count())
    val out = Dedup.jaccardForPairs(cand, batch.unionByName(corpus),
      "doc_id", "text", 2, 0.05)
    lap("verified", out.count())
    // variant: shingle array materialized ONCE per row, sigs read it
    val withSh = corpus.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val sigs2 = (0 until 16).map { i =>
      array_min(transform(col("sh"), s => md5(concat(lit(s"$i:"), s))))
        .as(f"mh$i%02d")
    }
    val sig2 = withSh.select(col("doc_id") +: sigs2: _*)
    lap("corpus sigs via sh-col", sig2.queryExecution.toRdd.count())
    // variant: permutation trick — ONE md5 per shingle, k affine perms
    val base = corpus.select(col("doc_id"),
      transform(Dedup.shingles(col("text"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("decimal(20,0)"))
        .as("hs"))
    val P = 2305843009213693951L // 2^61 - 1
    val sigs3 = (0 until 16).map { i =>
      array_min(transform(col("hs"),
        h => pmod(h * lit(i * 2 + 1) + lit(i * 7919), lit(P)))).as(f"mh$i%02d")
    }
    val sig3 = base.select(col("doc_id") +: sigs3: _*)
    lap("corpus sigs via perm trick", sig3.queryExecution.toRdd.count())
    val fast = Dedup.minhashBandsFast(docs, "doc_id", "text")
    lap("full-corpus fused bands", fast.queryExecution.toRdd.count())
    lap("fused again", Dedup.minhashBandsFast(docs, "doc_id", "text")
      .queryExecution.toRdd.count())
    spark.stop()
  }
}

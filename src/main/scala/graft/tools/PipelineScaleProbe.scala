package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up probe for the LLM-DATA-PIPELINE family (r8) —
  * the companion of [[ScaleProbe]] (graph headliners). The dedup/ANN
  * 100-TB arguments are "banded/bucketed by construction"; this
  * measures them: synthesizes deterministic corpora at 1×
  * (50k docs / 20k vectors — 10× the sf0.1 fixture, so fixed per-query
  * overhead doesn't drown the signal) and 10× (500k docs / 200k
  * vectors), runs the six pipeline headliners at both scales on fixed
  * cores, and prints wall-clock ratios. Scale-safe ≙ ratio ≲ 10.
  *
  * Corpus shape (all xxhash64-derived, no RNG state, resume-safe):
  *  - documents: 30–149 words from a 10k-word vocabulary; every
  *    5th doc is a NEAR-DUPLICATE of its group base (same word
  *    stream, one extra trailing word) so the dedup paths have real
  *    collision work at a fixed 20% dup rate;
  *  - embeddings: dim 64, planted clusters of FIXED expected size
  *    (~500 vectors — cluster COUNT scales with n, the shape real
  *    embedding spaces have; a fixed cluster count would make
  *    within-cluster candidate generation quadratic in n, a data
  *    artifact, not an operator property) — v_j =
  *    centroid(label,j)·0.7 + noise·0.3, so LSH banding / IVF see
  *    genuine cluster structure.
  *
  * Headliners and why:
  *  - exact        hash-groupBy dedup: one shuffle of (hash(text))
  *  - minhash      banded LSH candidate pairs on the fused xxhash64
  *                 scale path (MinHashBandKeys expression)
  *  - textstats    fused TextStats expression: map-only, the per-doc
  *                 analysis pass every corpus prep runs
  *  - deciles      quality tiers by DISTRIBUTED global rank (the
  *                 range-partition + offsets scheme, no one-task window)
  *  - knn          k-NN graph via banded hyperplane LSH + exact rescore
  *  - ivf          IVF top-k: inline centroid build + nprobe-pruned scan
  *
  * Usage: runMain graft.tools.PipelineScaleProbe [ops...]
  */
object PipelineScaleProbe {

  /** Deterministic synthetic corpus: ~20% near-duplicate docs. */
  def genDocs(spark: SparkSession, nDocs: Long): DataFrame = {
    // group base: docs 0-3 of each 5-block are unique, doc 4 repeats
    // doc 0's stream plus one extra word
    val base = when(col("id") % 5 === 4, col("id") - 4).otherwise(col("id"))
    val len = (abs(xxhash64(base, lit(0))) % 120 + 30).cast("int")
    val words = transform(sequence(lit(1), len),
      i => concat(lit("w"), abs(xxhash64(base, i)) % 10000))
    val extra = when(col("id") % 5 === 4,
      concat(lit(" x"), abs(xxhash64(col("id"), lit(-1))) % 10000))
      .otherwise(lit(""))
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(concat_ws(" ", words), extra).as("text"))
  }

  /** Deterministic synthetic embeddings: planted clusters of ~500
    * vectors each (count scales with n), dim 64. */
  def genEmb(spark: SparkSession, nVec: Long, dim: Int = 64): DataFrame = {
    val nClusters = (nVec / 500L) max 16L
    val label = (col("id") % nClusters).cast("int")
    def unit(h: org.apache.spark.sql.Column) =
      (abs(h) % 2000L - 1000L).cast("double") / 1000.0
    val vec = transform(sequence(lit(0), lit(dim - 1)), j =>
      (unit(xxhash64(col("id") % nClusters, j, lit(7))) * 0.7 +
        unit(xxhash64(col("id"), j, lit(11))) * 0.3).cast("float"))
    spark.range(nVec).select(
      col("id").as("vec_id"), vec.as("embedding"), label.as("label"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Dedup, Similarity, TextAnalysis}

    val ops: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("exact", "minhash", "textstats", "deciles", "knn", "ivf")

    def run(tag: String, nDocs: Long, nVec: Long,
            opsFor: Seq[String] = ops): Map[String, Double] = {
      // like the graph probe: the corpus-at-rest contract — inputs are
      // a stored table, not a lazily re-derived expression, so persist
      // the generated frames before timing anything over them
      val docs = genDocs(spark, nDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val emb = genEmb(spark, nVec)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[$tag] docs=${docs.count()} vecs=${emb.count()}")
      def time(name: String)(f: => DataFrame): Option[(String, Double)] =
        if (!opsFor.contains(name)) None
        else {
          graft.core.Checkpoints.sweepAnonymous(spark)
          System.gc()
          val t0 = System.nanoTime()
          f.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[$tag] $name%-10s $dt%8.2f s")
          Some(name -> dt)
        }
      val r = Seq(
        time("exact")(Dedup.exact(docs, Seq("text"), "doc_id")),
        time("minhash")(Dedup.minhashPairsFast(docs, "doc_id", "text")),
        time("textstats")(TextAnalysis.analyze(docs, "doc_id", "text")),
        time("deciles")(Similarity.scoreDeciles(emb)),
        // band geometry scales with n — production holds expected
        // RANDOM bucket occupancy constant (~8 vectors) by widening
        // band keys as the corpus grows; candidate volume then tracks
        // the planted-cluster collisions (linear in n), not n²/buckets
        time("knn")(Similarity.knnJoin(emb, k = 5, nBands = 4,
          planesPerBand =
            math.ceil(math.log(nVec / 8.0) / math.log(2)).toInt)),
        time("ivf")(Similarity.ivfTopK(emb, queryVecId = 0L, k = 10)),
        // r8e additions: BPE ENCODE (word-type table + join back),
        // RAG packing (map-only chunk+score → TakeOrdered), SymSpell
        // fuzzy lookup (vocab delete index + broadcast query batch),
        // JL projection (map-only), Bloom semi-join over a synthetic
        // fact/dim pair (doc ids as keys, every 7th doc the dim)
        time("bpeencode")(TextAnalysis.bpeEncodeStats(docs,
          "doc_id", "text", rounds = 8)),
        time("ragpack")(TextAnalysis.ragContextPack(docs, "doc_id",
          "text", Seq("w1", "w2", "w3", "w4"), k = 20,
          tokenBudget = 120L)),
        time("fuzzy")(TextAnalysis.fuzzyLookup(docs, "text",
          Seq("w123x", "w45", "w9999z"))),
        time("jlproj")(Similarity.randomProjection(emb)),
        time("bloom")(graft.pipeline.Scale.bloomSemiJoin(
          docs.select(col("doc_id")), "doc_id",
          docs.select(col("doc_id")).filter(col("doc_id") % 7 === 0),
          "doc_id"))
      ).flatten.toMap
      docs.unpersist(); emb.unpersist()
      r
    }

    val s1 = run("1x", 50000L, 20000L)
    val s10 = run("10x", 500000L, 200000L)
    println(f"${"op"}%-10s ${"1x"}%8s ${"10x"}%8s  ratio")
    for (k <- ops if s1.contains(k) && s10.contains(k))
      println(f"$k%-10s ${s1(k)}%8.2f ${s10(k)}%8.2f  ${s10(k) / s1(k)}%5.2f")
    // 100× leg (5M docs / 2M vectors): the 10× doc-side numbers are
    // still fixed-overhead-bound (~1-4 s), so the real growth test is
    // here. knn is excluded — its 10× leg already measures the
    // candidate-bounded shape and a 100× run is minutes of pure
    // rescore throughput, not new information.
    if (sys.env.get("SPARK_GRAFT_PROBE_100X").contains("1")) {
      val ops100 = ops.filterNot(_ == "knn")
      val s100 = run("100x", 5000000L, 2000000L, ops100)
      println(f"${"op"}%-10s ${"10x"}%8s ${"100x"}%8s  ratio (10x->100x)")
      for (k <- ops100 if s10.contains(k) && s100.contains(k))
        println(f"$k%-10s ${s10(k)}%8.2f ${s100(k)}%8.2f  ${s100(k) / s10(k)}%5.2f")
    }
    spark.stop()
  }
}

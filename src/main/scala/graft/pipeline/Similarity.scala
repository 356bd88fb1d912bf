package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query vector —
  * one scan, no shuffle, TakeOrderedAndProject for the top-k).
  * Scale paths: random-hyperplane LSH bucketing (candidates from a
  * bucket groupBy, never all-pairs) and IVF (coarse centroids, probe
  * the nearest cells only).
  *
  * All arithmetic is forced to DOUBLE in array order, so the identical
  * left-to-right summation can be replayed by an external oracle
  * bit-for-bit (DuckDB's own list_cosine_similarity is FLOAT math —
  * not used for that reason).
  */
object Similarity {

  /** Dot product in double precision, strict array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native-expression variants (requires `graft.GraftExtensions` on the
    * session): bit-identical to [[dot]]/[[cosine]] — same left-fold
    * order in double — but fused + whole-stage-codegen'd, for the ANN
    * hot path. See [[graft.expressions.DotProductFloat]].
    */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def cosineNative(a: Column, b: Column): Column = {
    val d = dotNative(a, b)
    val n = sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** [[bruteForceTopK]] on the native expression path. */
  def bruteForceTopKNative(emb: DataFrame, queryVecId: Long, k: Int,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("__qvec"))
    emb.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(cosineNative(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** cosine(a,b) = dot / (||a||·||b||); NULL-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Brute-force cosine top-k against one stored vector (the baseline
    * ANN oracle): broadcast the 1-row query side, score every row,
    * TakeOrderedAndProject keeps a k-heap per partition — no shuffle of
    * the big side. Scores rounded to 6 dp for cross-engine determinism.
    */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("__qvec"))
    emb.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(cosine(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Top-k by a caller-supplied similarity metric — MIPS (raw inner
    * product, the embedding-service retrieval metric) and L2 retrieval
    * share the broadcast-query + per-partition-k-heap shape of
    * [[bruteForceTopK]]; only the scored column differs. `ascending`
    * for distance metrics (smaller = closer).
    */
  def topKBy(emb: DataFrame, queryVecId: Long, k: Int,
             score: (Column, Column) => Column, ascending: Boolean = false,
             idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    val q = emb.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("__qvec"))
    val scored = emb.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(score(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("score"))
    scored.orderBy(
        (if (ascending) col("score").asc else col("score").desc), col(idCol))
      .limit(k)
  }

  /** Squared L2 distance via the dot expansion — one fused dot per
    * side plus the cross dot, no per-element subtraction array.
    */
  def l2sq(a: Column, b: Column): Column =
    dotNative(a, a) - lit(2.0) * dotNative(a, b) + dotNative(b, b)

  /** Symmetric per-vector int8 quantization: scale = 127/max|x| (1.0
    * for the zero vector), q_i = round(x_i · scale) in [-127, 127].
    * Both engines round half away from zero, so the oracle reproduces
    * the codes exactly.
    */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs)
  }

  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("int"))

  /** Quantize-then-rescore top-k — the 100-TB ANN layout. int8 codes
    * are 4x smaller than float32 (the scan becomes memory-bandwidth
    * bound on codes, and the inner product is exact INTEGER math), the
    * integer dot ranks a candidate pool of `candidates`, and only that
    * pool is re-ranked with exact float cosine. Standard
    * quantize/rescore recall shape; candidate generation is the same
    * broadcast + per-partition-heap plan as [[bruteForceTopK]], just
    * over 4x less data.
    */
  def quantizedTopK(emb: DataFrame, queryVecId: Long, k: Int,
                    candidates: Int = 100, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val qt = emb.select(col(idCol), col(vecCol),
        int8Scale(col(vecCol)).as("__scale"))
      .withColumn("__q", quantizeInt8(col(vecCol), col("__scale")))
    val q = qt.filter(col(idCol) === queryVecId)
      .select(col("__q").as("__qq"), col("__scale").as("__qscale"),
        col(vecCol).as("__qvec"))
    qt.filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("approx",
        aggregate(zip_with(col("__q"), col("__qq"),
          (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)
          .cast("double") / (col("__scale") * col("__qscale")))
      .orderBy(col("approx").desc, col(idCol)).limit(candidates)
      .withColumn("score", round(cosine(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** All near-duplicate pairs above a cosine threshold — the EXACT
    * (quadratic) semantics. Deliberately NOT the registered scale
    * operator: it exists as the small-n cross-check / recall oracle for
    * [[lshNearDupPairs]], which is the shipped path (see
    * `SimilaritySpec`'s subset assertion). Within-block use only.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    // Same verification engineering as the LSH path: norms hoisted out
    // of the pair join (1 dot per pair, not 3) on the fused codegen
    // expression — quadratic stays quadratic, but ~10x cheaper per pair.
    val normed = emb.select(col(idCol), col(vecCol),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("nrm"))
    val a = normed.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nrm").as("na"))
    val b = normed.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nrm").as("nb"))
    val d = dotNative(col("va"), col("vb"))
    val n = col("na") * col("nb")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(when(n === 0.0, lit(0.0)).otherwise(d / n), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** The shared deterministic LCG behind [[planes]] and
    * [[qualityWeights]] (Knuth MMIX constants) — one definition so the
    * oracle-embedded literals derived from it can never drift.
    */
  private def lcg(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s }
  }

  /** Deterministic ±1 hyperplanes from a tiny LCG — fixed at build time
    * so the identical literal matrix can be embedded in oracle SQL.
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Int]] = {
    val next = lcg(seed)
    Array.fill(nPlanes, dim) { if (((next() >>> 33) & 1L) == 1L) 1 else -1 }
  }

  /** Deterministic sparse {−1, 0, +1} sign matrix (Achlioptas 2003,
    * P(±1) = 1/6 each, P(0) = 2/3) from the shared LCG — fixed at
    * build time so the identical literal matrix embeds in oracle SQL.
    */
  def signMatrix(outDim: Int, inDim: Int,
                 seed: Long = 11L): Array[Array[Int]] = {
    val next = lcg(seed)
    Array.fill(outDim, inDim) {
      val r = ((next() >>> 33) % 6L).toInt
      if (r == 0) 1 else if (r == 1) -1 else 0
    }
  }

  /** Johnson–Lindenstrauss random projection — reduce `dim`-d
    * embeddings to `outDim` dimensions with the sparse sign matrix
    * [[signMatrix]] scaled by sqrt(3/outDim) [Achlioptas 2003]: the
    * cheap, data-independent dimensionality reduction every
    * embedding pipeline reaches for before LSH/clustering when the
    * model's native width is overkill. Distances are preserved within
    * the JL bound while 2/3 of the multiplies vanish.
    *
    * DETERMINISM: each output coordinate is a FIXED-ORDER left-assoc
    * sum of x_i · s_ij with s ∈ {−1, 0, +1} — exact double adds in
    * the same order in both engines — then one multiply by the
    * driver-computed scale and round(6). Map-only projection: no
    * shuffle, no UDF, one codegen expression per output dim.
    *
    * Returns (vec_id, p0..p{outDim−1}).
    */
  def randomProjection(embeddings: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", dim: Int = 64,
                       outDim: Int = 8, seed: Long = 11L): DataFrame = {
    require(outDim >= 1 && outDim <= 64, "outDim must be 1..64")
    val m = signMatrix(outDim, dim, seed)
    val scale = math.sqrt(3.0 / outDim)
    val projCols = (0 until outDim).map { j =>
      val terms = (0 until dim).flatMap { i =>
        m(j)(i) match {
          case 0 => None
          case 1 => Some(element_at(col(vecCol), i + 1).cast("double"))
          case _ => Some(-element_at(col(vecCol), i + 1).cast("double"))
        }
      }
      val raw = if (terms.isEmpty) lit(0.0) else terms.reduceLeft(_ + _)
      round(raw * lit(scale), 6).as(s"p$j")
    }
    embeddings.select(col(idCol) +: projCols: _*)
  }

  /** DuckDB oracle for [[randomProjection]], generated from the SAME
    * matrix and scale so the literal sums cannot drift.
    */
  def randomProjectionSql(table: String = "embeddings",
                          idCol: String = "vec_id",
                          vecCol: String = "embedding", dim: Int = 64,
                          outDim: Int = 8, seed: Long = 11L): String = {
    val m = signMatrix(outDim, dim, seed)
    val scale = math.sqrt(3.0 / outDim)
    val projCols = (0 until outDim).map { j =>
      val terms = (0 until dim).flatMap { i =>
        m(j)(i) match {
          case 0 => None
          case 1 => Some(s"CAST($vecCol[${i + 1}] AS DOUBLE)")
          case _ => Some(s"-CAST($vecCol[${i + 1}] AS DOUBLE)")
        }
      }
      val raw = if (terms.isEmpty) "CAST(0.0 AS DOUBLE)"
        else terms.mkString("(", " + ", ")")
      s"round($raw * CAST($scale AS DOUBLE), 6) AS p$j"
    }
    s"SELECT $idCol, ${projCols.mkString(", ")} FROM $table ORDER BY $idCol"
  }

  /** Hybrid lexical + vector retrieval with reciprocal-rank fusion —
    * the two-tower search shape every retrieval pipeline converges on:
    * BM25 top-`kEach` over the documents (TakeOrderedAndProject — no
    * corpus sort) and cosine top-`kEach` against a stored query vector
    * (broadcast query, per-partition k-heaps), fused by
    * `rrf = Σ 1/(rrfK + rank)` over the two lists (docs absent from a
    * list contribute 0) and re-ranked.
    *
    * RRF is rank-only — no score normalization across incomparable
    * scales — and the fused sum is TWO terms in fixed order, so the
    * doubles are bit-reproducible and the whole operator oracles
    * exactly. Scale shape: both candidate lists are k-bounded BEFORE
    * fusion (each side's plan never globally sorts the corpus); the
    * fusion frame is ≤ 2·kEach rows, so the rank windows and the
    * full-outer join are driver-bounded — at 100 TB the corpus cost is
    * the two top-k scans, unchanged.
    */
  def hybridSearchRrf(docs: DataFrame, emb: DataFrame,
                      queryTerms: Seq[String], queryVecId: Long,
                      kEach: Int = 50, k: Int = 10, rrfK: Int = 60,
                      idCol: String = "doc_id", textCol: String = "text",
                      vecIdCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    // single-partition rank windows are FINE here: both inputs are
    // k-bounded results, not corpus-sized
    val lex = TextAnalysis.bm25(docs, idCol, textCol, queryTerms,
      topK = kEach)
      .withColumn("rl", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))))
      .select(col(idCol), col("rl"))
    val vec = bruteForceTopK(emb, queryVecId, kEach, vecIdCol, vecCol)
      .withColumn("rv", row_number().over(
        Window.orderBy(col("score").desc, col(vecIdCol))))
      .select(col(vecIdCol).as(idCol), col("rv"))
    lex.join(vec, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(coalesce(lit(1.0) / (col("rl") + rrfK), lit(0.0)) +
          coalesce(lit(1.0) / (col("rv") + rrfK), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic integer scoring weights in [-50, 50] from the same
    * LCG as [[planes]] — integers so the identical literal vector is
    * EXACT in both engines (no decimal-literal parsing drift).
    */
  def qualityWeights(dim: Int, seed: Long = 7L): Array[Int] = {
    val next = lcg(seed)
    Array.fill(dim) { (((next() >>> 33) % 101L) - 50L).toInt }
  }

  /** Model-based quality gate over embeddings — the "classifier score +
    * percentile threshold" stage of a corpus build: score every vector
    * with a fixed linear model (here the deterministic [[qualityWeights]]
    * standing in for trained classifier weights), compute the corpus
    * cutoff at `1 − keepFrac`, and keep the top `keepFrac` fraction.
    *
    * Shape at 100 TB: scoring is one map-only projection; the cutoff is
    * ONE global aggregate broadcast back (never a sort of the corpus).
    * The exact `percentile` here buffers the score column per partition
    * — it is the oracle-checkable surface, same contract as
    * `events_quantiles`; swap `percentile` → `approx_percentile`
    * (mergeable sketch, no buffering) for the production cutoff, the
    * gate shape is unchanged.
    */
  def scoreFilter(emb: DataFrame, keepFrac: Double = 0.3,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  seed: Long = 7L, dim: Int = 64): DataFrame = {
    require(keepFrac > 0.0 && keepFrac < 1.0,
      s"scoreFilter needs keepFrac in (0, 1); got $keepFrac")
    val w = qualityWeights(dim, seed)
    val wLit = array(w.map(x => lit(x.toDouble)): _*)
    // scored feeds the cutoff aggregate AND the final projection —
    // checkpoint once or the corpus scan + scoring runs twice
    val scored = emb.select(col(idCol),
      round(dot(col(vecCol), wLit), 6).as("score"))
      .localCheckpoint(true)
    val cut = scored.agg(
      round(percentile(col("score"), lit(1.0 - keepFrac)), 4).as("__cut"))
    scored.crossJoin(broadcast(cut))
      .select(col(idCol), col("score"), (col("score") >= col("__cut")).as("keep"))
  }

  /** Quality-tier assignment — the curation step after scoring: every
    * vector lands in one of `buckets` equal-population tiers by its
    * score's GLOBAL rank (decile 1 = best), the binning a mixture
    * recipe weights by ("3 epochs of tier 1, 1 of tier 5, drop tier
    * 10"). The global rank is assigned DISTRIBUTED (range-repartition
    * on (score desc, id) + per-partition row_number + broadcast
    * offsets — the corpus-shuffle/MVCC shape; a global window would
    * one-task the corpus), and the corpus size the tier formula needs
    * falls out of the same offsets fold — no extra count job.
    */
  def scoreDeciles(emb: DataFrame, buckets: Int = 10,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   seed: Long = 7L, dim: Int = 64): DataFrame = {
    require(buckets >= 2, s"scoreDeciles needs buckets >= 2; got $buckets")
    val spark = emb.sparkSession
    import spark.implicits._
    val w = qualityWeights(dim, seed)
    val wLit = array(w.map(x => lit(x.toDouble)): _*)
    val scored = emb.select(col(idCol),
      round(dot(col(vecCol), wLit), 6).as("score"))
    val (ranked, n) = Sampling.globalRankBy(scored,
      Seq(col("score").desc, col(idCol)))
    val total = n max 1L
    ranked.select(col(idCol), col("score"), col("pos"),
      (expr(s"((pos - 1) * $buckets) div ${total}L") + 1L)
        .cast("int").as("tier"))
  }

  /** Random-hyperplane LSH bucket key: bit j = (v · plane_j) >= 0.
    * Same-bucket vectors are near-duplicate candidates; expected bucket
    * count 2^nPlanes, so the self-join is per-bucket, not all-pairs —
    * the scale path for [[nearDupPairs]].
    */
  def lshBucket(vec: Column, pl: Array[Array[Int]]): Column =
    pl.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(x => lit(x.toDouble)): _*)
      when(dot(vec, planeLit) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Guard against a dimensionality mismatch: with wrong-length planes
    * every dot is NULL, every bucket key collapses to 0, and "never
    * all-pairs" silently becomes one giant quadratic bucket. Adds 0 when
    * the length matches; raises otherwise.
    */
  private def dimGuard(vec: Column, dim: Int): Column =
    when(size(vec) === dim, lit(0L))
      .otherwise(raise_error(concat(
        lit(s"lsh: expected $dim-dim embedding, got "),
        size(vec).cast("string"))).cast("long"))

  def lshBucketPairs(emb: DataFrame, nPlanes: Int = 8,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     seed: Long = 42L, dim: Int = 64): DataFrame = {
    val pl = planes(nPlanes, dim, seed)
    val bucketed = emb.select(col(idCol),
      (lshBucket(col(vecCol), pl) + dimGuard(col(vecCol), dim)).as("bucket"))
    val a = bucketed.select(col(idCol).as("id_a"), col("bucket"))
    val b = bucketed.select(col(idCol).as("id_b"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select("bucket", "id_a", "id_b")
  }

  /** Banded (OR-construction) hyperplane LSH candidates: `nBands` bands
    * of `planesPerBand` hyperplane bits each; vectors sharing ANY band
    * key are candidates — the classic recall amplifier
    * (recall = 1 − (1 − p^k)^L for per-plane agreement p). Same explode →
    * equi-join-on-(band_idx, band_key) shape as [[Dedup.minhashPairs]]:
    * pair volume is bounded by band-bucket sizes, never all-pairs.
    */
  def lshBandedPairs(emb: DataFrame, nBands: Int = 4, planesPerBand: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     seed: Long = 42L, dim: Int = 64): DataFrame = {
    val pl = planes(nBands * planesPerBand, dim, seed)
    val bandCols = (0 until nBands).map { b =>
      (0 until planesPerBand).map { j =>
        val p = pl(b * planesPerBand + j)
        val planeLit = array(p.map(x => lit(x.toDouble)): _*)
        when(dot(col(vecCol), planeLit) >= 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val banded = emb.select(col(idCol),
      posexplode(array(bandCols.map(_ + dimGuard(col(vecCol), dim)): _*))
        .as(Seq("band_idx", "band_key")))
    val a = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The registered scale path for embedding near-dup: banded-LSH
    * candidates ([[lshBandedPairs]] — equi-joins on band keys, never
    * all-pairs) verified by exact cosine. Vectors are fetched per
    * candidate side via equi-joins on id, so the big table is touched
    * O(|candidates|), not O(n²). Approximate by construction — misses
    * pairs sharing no band — but everything it DOES emit is exact;
    * [[nearDupPairs]] is its small-n recall oracle (see SimilaritySpec).
    *
    * Verification cost engineering: norms are computed ONCE PER VECTOR
    * before the pair join (a pair-side cosine pays 3 dots; this pays 1),
    * and the per-pair dot is the fused codegen [[dotNative]] expression
    * (bit-identical to the composable fold — DotProductFloatSpec) — at
    * millions of candidates per band-bucket batch this is the
    * difference between lambda-eval and whole-stage-codegen throughput.
    */
  def lshNearDupPairs(emb: DataFrame, threshold: Double,
                      nBands: Int = 4, planesPerBand: Int = 4,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      seed: Long = 42L, dim: Int = 64): DataFrame = {
    val cand = lshBandedPairs(emb, nBands, planesPerBand, idCol, vecCol, seed, dim)
    val normed = emb.select(col(idCol), col(vecCol),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("nrm"))
    val d = dotNative(col("va"), col("vb"))
    val n = col("na") * col("nb")
    cand
      .join(normed.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(normed.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos", round(when(n === 0.0, lit(0.0)).otherwise(d / n), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Batched k-NN self-join (the k-NN GRAPH construction every
    * embedding-dedup / clustering / semantic-retrieval pipeline needs):
    * every vector's top-k neighbors among its banded-LSH candidates.
    * This is the many-query counterpart of [[bruteForceTopK]] — at
    * 10⁹ vectors the brute-force form is an O(n²) score matrix, while
    * this stays candidate-bounded end to end:
    *
    *   1. candidates: [[lshBandedPairs]] equi-joins on (band_idx,
    *      band_key) — pair volume is band-bucket-bounded, never n²;
    *   2. symmetrize (a kNN list is per-source, so each undirected
    *      candidate pair feeds both endpoints' lists);
    *   3. exact cosine per candidate (per-vector norms computed once
    *      pre-join, fused codegen [[dotNative]] per pair);
    *   4. per-source top-k: row_number over (id) ordered by rounded
    *      score desc with neighbor-id tie-break — one hash shuffle on
    *      id; Spark turns the bounded-rank filter into a per-partition
    *      heap (WindowGroupLimit), so no full per-key sort materializes.
    *
    * Approximate by construction (a true neighbor sharing no band is
    * missed — recall governed by the band geometry, SimilaritySpec
    * pins it on the fixture); every emitted score is exact.
    */
  def knnJoin(emb: DataFrame, k: Int = 5,
              nBands: Int = 4, planesPerBand: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L, dim: Int = 64): DataFrame = {
    // cand feeds BOTH orientations of the symmetrization — eager
    // checkpoint so the banding + bucket self-join run once, not twice
    // (multi-branch lazy frames recompute per branch, see
    // GraphAnalytics.connectedComponents)
    val cand = lshBandedPairs(emb, nBands, planesPerBand, idCol, vecCol, seed, dim)
      .localCheckpoint(true)
    val sym = cand.union(
      cand.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val normed = emb.select(col(idCol), col(vecCol),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("nrm"))
    val d = dotNative(col("va"), col("vb"))
    val n = col("na") * col("nb")
    val scored = sym
      .join(normed.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(normed.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a").as("id"), col("id_b").as("neighbor"),
        round(when(n === 0.0, lit(0.0)).otherwise(d / n), 6).as("cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** IVF index build — the "train once" step: per-cell centroids from
    * the cell assignment (here the fixture's `label`, i.e. a pre-trained
    * k-means). At scale this is computed ONCE at ingest, persisted (or
    * written alongside the table), and reused by every query — never
    * rebuilt per query; it is one partial-aggregating shuffle over the
    * corpus and the result is cells×dim tiny (broadcastable).
    */
  def ivfCentroids(emb: DataFrame, cellCol: String = "label",
                   vecCol: String = "embedding"): DataFrame =
    emb
      .select(col(cellCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(cellCol), col("pos"))
      .agg(avg(col("v").cast("double")).as("cv"))
      .groupBy(col(cellCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))

  /** IVF search against a prebuilt [[ivfCentroids]] index: probe only
    * the `nprobe` cells whose centroids are nearest the query, then
    * score brute-force within those cells — the classic inverted-file
    * trade: scan nprobe/cells of the data per query. The probed-cell
    * set is a broadcast left-semi join, so the big table is pruned
    * before any scoring (with the table partitioned by cell, that is
    * partition pruning).
    */
  def ivfTopKWith(centroids: DataFrame, emb: DataFrame, queryVecId: Long,
                  k: Int, nprobe: Int = 2,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  cellCol: String = "label"): DataFrame = {
    val q = emb.filter(col(idCol) === queryVecId).select(col(vecCol).as("__qvec"))
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("cscore", cosine(col("centroid"), col("__qvec")))
      .orderBy(col("cscore").desc, col(cellCol))
      .limit(nprobe)
      .select(col(cellCol))
    emb.join(broadcast(probed), Seq(cellCol), "left_semi")
      .filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("score", round(cosine(col(vecCol), col("__qvec")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** One-shot IVF (index built inline) — operator-demo convenience;
    * production reuses [[ivfCentroids]] across queries via
    * [[ivfTopKWith]].
    */
  def ivfTopK(emb: DataFrame, queryVecId: Long, k: Int, nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              cellCol: String = "label"): DataFrame =
    ivfTopKWith(ivfCentroids(emb, cellCol, vecCol), emb, queryVecId, k,
      nprobe, idCol, vecCol, cellCol)

  /** Deterministic Lloyd k-means over the embedding column — the
    * clustering primitive behind IVF index builds, corpus
    * domain-bucketing, and diversity sampling. Spark-MLlib's shape,
    * reproducibly: seed centroids are the k lowest-id vectors (no RNG),
    * each assignment pass is a PROJECTION against centroid literals
    * (codegen'd, zero shuffle, zero join — the centroid set is k×dim
    * doubles, driver metadata exactly like [[graft.core.Mvcc]]'s
    * partition offsets), and each update pass is one partial-agg
    * shuffle of (cluster, element) pairs — k·dim result rows.
    * Element means are rounded to 6 dp so the update is reproducible
    * bit-for-bit by an external engine regardless of either side's
    * summation order; distances fold left-to-right in double like every
    * similarity op here.
    *
    * At 100 TB: assignment scans dominate and parallelize perfectly;
    * the update shuffle carries k·dim rows per partition after
    * map-side combine. `iters` is fixed, not convergence-tested —
    * pipeline clustering wants bounded cost, and the reference point
    * (IVF coarse quantizers) standardizes on a handful of rounds.
    *
    * Ties (equidistant centroids) break to the LOWEST cluster id via
    * `array_position` first-match, matching the oracle's
    * `ORDER BY dist, cid` ranking.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 4, iters: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val cents = kmeansFit(emb, k, iters, idCol, vecCol)
    val d = centroidDistances(col(vecCol), cents)
    emb.select(col(idCol), col(vecCol),
        (array_position(d, array_min(d)) - 1).cast("int").as("cluster"),
        array_min(d).as("dist"))
      .select(col(idCol), col("cluster"),
        org.apache.spark.sql.functions.round(col("dist"), 6).as("dist"))
  }

  /** Squared-L2 distance of `v` to each centroid literal, as one array
    * expression (codegen'd projection; the centroid set is driver
    * metadata).
    */
  private def centroidDistances(v: Column, cents: Seq[Seq[Double]]): Column =
    array(cents.map { c =>
      val cl = typedLit(c)
      dot(v, v) - lit(2.0) * dot(v, cl) + dot(cl, cl)
    }: _*)

  /** The Lloyd FIT of [[kmeansAssign]], returning the final centroids
    * — factored out so product quantization can train one codebook per
    * subspace on the identical arithmetic (same seed rule, same 6-dp
    * rounded element means, same lowest-cid tie-break).
    */
  private[pipeline] def kmeansFit(emb: DataFrame, k: Int, iters: Int,
                                  idCol: String, vecCol: String)
      : Seq[Seq[Double]] = {
    val v = col(vecCol)
    var cents: Seq[Seq[Double]] = emb.orderBy(col(idCol)).limit(k)
      .select(v).collect().map(_.getSeq[Float](0).map(_.toDouble)).toSeq
    var round = 1
    while (round < iters) {
      round += 1
      // element-wise mean per cluster: ONE shuffle of k·dim partial
      // aggregates; result is driver metadata for the next projection
      val d = centroidDistances(v, cents)
      val updated = emb
        .select((array_position(d, array_min(d)) - 1).cast("int").as("cluster"),
          posexplode(v).as(Seq("j", "x")))
        .groupBy("cluster", "j")
        .agg(org.apache.spark.sql.functions.round(avg(col("x").cast("double")), 6).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // a cluster that lost all members keeps its previous centroid
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    cents
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = cluster the embedding space, then drop any vector
    * with a sufficiently-similar lower-id neighbor IN ITS CLUSTER. The
    * clusters are the blocking scheme — the pair join is equi on
    * `cluster`, so comparisons are quadratic only within a cell, never
    * across the corpus (the paper's exact rationale for clustering
    * first). Deterministic keep rule: a vector survives iff no
    * lower-id cluster-mate has cosine ≥ threshold (lower-id = the
    * paper's "keep one representative", made total and order-free).
    *
    * Returns every input id with (cluster, keep). At 100 TB: k scales
    * with corpus size (n / target-cell-size, the paper uses ~11k cells
    * for LAION) so cells stay bounded; the kmeans assign is a
    * broadcast-centroid projection (see [[kmeansAssign]]) and the pair
    * join shuffles on `cluster` once.
    */
  def semDedup(emb: DataFrame, k: Int = 4, iters: Int = 2,
               threshold: Double = 0.5,
               idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    // assigned feeds THREE branches (both pair-join sides + the final
    // left join) — as a lazy plan each would recompute the kmeans
    // assignment, including its per-iteration driver collects (see
    // GraphAnalytics.connectedComponents on multi-branch frames);
    // checkpoint once. Pair cosine on the codegen vec_dot path
    // (bit-identical to the HOF form, ~10× on the within-cell
    // quadratic — the one hot loop here).
    val assigned = kmeansAssign(emb, k, iters)
      .select(col(idCol), col("cluster"))
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .localCheckpoint(true)
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("va"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosineNative(col("va"), col("vb")), 6) >= lit(threshold))
      .select(col("id_b").as("__dup")).distinct()
    assigned.join(dups, assigned(idCol) === dups("__dup"), "left")
      .select(col(idCol), col("cluster"), col("__dup").isNull.as("keep"))
  }

  /** Product-quantization ANN (Jégou/Douze/Schmid 2011): split each
    * vector into `m` subvectors, train an independent `ksub`-centroid
    * codebook per subspace (the [[kmeansFit]] deterministic Lloyd —
    * same seed rule, 6-dp means, lowest-cid tie-break), ENCODE every
    * vector as its m nearest-centroid ids, and answer queries by
    * ASYMMETRIC DISTANCE COMPUTATION: the query's squared-L2 to each
    * centroid of each subspace is a tiny m×ksub table, and a
    * database vector's approximate distance is the sum of its codes'
    * table entries. This is THE memory-bound scale path for vector
    * search — a 64-dim float vector (256 bytes) becomes m=4 bytes of
    * codes, so a 100-TB embedding corpus fits a 1.6-TB code table
    * that scans at memory bandwidth; IVF+PQ is exactly this composed
    * with [[ivfTopK]]'s cell routing.
    *
    * Everything stays oracle-exact: codebooks replay in SQL (the
    * kmeans CTE chain per subspace), encoding is the same
    * lowest-cid-tie argmin, and the ADC table is EVALUATED AS
    * EXPRESSIONS over literal centroids + the literal query (constant
    * -folded left-to-right double folds — the identical arithmetic
    * DuckDB's list_sum performs), summed in subspace order.
    *
    * Scale shape: fit = m small driver fits; encode = ONE codegen
    * projection over the corpus (no join, no shuffle); query = one
    * map-side expression + TakeOrderedAndProject. Returns
    * (vec_id, code, adc_dist) for the k nearest by ADC.
    */
  def pqTopK(emb: DataFrame, queryVecId: Long, k: Int, m: Int = 4,
             ksub: Int = 8, iters: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val (coded, adc) =
      pqMachine(emb, queryVecId, m, ksub, iters, idCol, vecCol, Seq.empty)
    coded.filter(col(idCol) =!= queryVecId)
      .select(col(idCol),
        concat_ws(",", (0 until m).map(s => col(s"code_$s")): _*).as("code"),
        round(adc, 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol)).limit(k)
  }

  /** The shared fit → encode → ADC machinery of [[pqTopK]] /
    * [[ivfPqTopK]]: returns the coded corpus (`idCol`, `carryCols`,
    * `code_0..code_{m-1}`) and the ADC distance column over those
    * codes for `queryVecId`.
    */
  private def pqMachine(emb: DataFrame, queryVecId: Long, m: Int,
                        ksub: Int, iters: Int, idCol: String,
                        vecCol: String, carryCols: Seq[String])
      : (DataFrame, Column) = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val L = dim / m
    def sub(s: Int): Column = slice(col(vecCol), s * L + 1, L)
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      kmeansFit(emb.select(col(idCol), sub(s).as(vecCol)),
        ksub, iters, idCol, vecCol)
    }
    val q: Seq[Double] = emb.filter(col(idCol) === queryVecId)
      .select(col(vecCol)).head().getSeq[Float](0).map(_.toDouble).toSeq
    def qsub(s: Int): Seq[Double] = q.slice(s * L, (s + 1) * L)
    // encode: nearest-codebook-centroid id per subspace, one projection
    def codeCol(s: Int): Column = {
      val d = centroidDistances(sub(s), books(s))
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    // ADC: the query-to-centroid table, computed ON THE DRIVER with
    // the identical arithmetic the SQL folds perform — left-to-right
    // index-order double fold, then (qq − 2·qc) + cc — so the literal
    // table is bit-identical to what DuckDB's list_sum derives (an
    // expression-built table would instead evaluate m·ksub interpreted
    // HOFs per row — the documented trap)
    def dotd(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    def qTable(s: Int): Seq[Double] = books(s).map { c =>
      val qs = qsub(s)
      dotd(qs, qs) - 2.0 * dotd(qs, c) + dotd(c, c)
    }
    val coded = emb.select(
      (col(idCol) +: carryCols.map(col)) ++
        (0 until m).map(s => codeCol(s).as(s"code_$s")): _*)
    val adc = (0 until m)
      .map(s => element_at(typedLit(qTable(s)), col(s"code_$s") + 1))
      .reduce(_ + _)
    (coded, adc)
  }

  /** IVF+PQ — the composition both halves were built for (and the
    * layout FAISS popularized): [[ivfCentroids]]' cell routing prunes
    * the corpus to `nprobe` cells, then [[pqTopK]]'s asymmetric
    * distance computation ranks only the surviving codes. Codebooks
    * are GLOBAL (trained on the full corpus — the standard recipe:
    * cells route, codebooks compress) and at scale both are ingest
    * artifacts: centroids persisted, codes a 4-byte column. Per query
    * the plan is: broadcast probe of the cell table, left-semi prune
    * (partition pruning when the table is cell-partitioned), one
    * map-side ADC expression, TakeOrderedAndProject.
    */
  def ivfPqTopK(emb: DataFrame, queryVecId: Long, k: Int, nprobe: Int = 2,
                m: Int = 4, ksub: Int = 8, iters: Int = 2,
                idCol: String = "vec_id", vecCol: String = "embedding",
                cellCol: String = "label"): DataFrame = {
    val (coded, adc) = pqMachine(emb, queryVecId, m, ksub, iters,
      idCol, vecCol, Seq(cellCol))
    val q = emb.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("__qvec"))
    val probed = ivfCentroids(emb, cellCol, vecCol)
      .crossJoin(broadcast(q))
      .withColumn("cscore", cosine(col("centroid"), col("__qvec")))
      .orderBy(col("cscore").desc, col(cellCol))
      .limit(nprobe)
      .select(col(cellCol))
    coded.join(broadcast(probed), Seq(cellCol), "left_semi")
      .filter(col(idCol) =!= queryVecId)
      .select(col(idCol),
        concat_ws(",", (0 until m).map(s => col(s"code_$s")): _*).as("code"),
        round(adc, 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol)).limit(k)
  }
}

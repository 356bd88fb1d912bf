package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f, 0.0f), 0),     // identical to query
    (2L, Array(0.0f, 1.0f, 0.0f), 1),     // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f), 1),    // opposite
    (4L, Array(1.0f, 1.0f, 0.0f), 0),     // 45 degrees
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identical 1, orthogonal 0, opposite -1") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == 0.0)
    assert(pairs((0L, 3L)) == -1.0)
    assert(pairs((0L, 4L)) == 0.707107)
  }

  test("zero vector cosine is 0, not NaN") {
    val z = Seq((9L, Array(0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val c = z.crossJoin(emb.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      .select(Similarity.cosine(col("embedding"), col("q")).as("c"))
      .head().getDouble(0)
    assert(c == 0.0)
  }

  test("brute-force top-k ranks by score then id") {
    val r = Similarity.bruteForceTopK(emb, 0L, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r == Seq((1L, 1.0), (4L, 0.707107), (2L, 0.0)))
  }

  test("near-dup pairs above threshold") {
    val p = Similarity.nearDupPairs(emb, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((0L, 1L)))
  }

  test("LSH: identical vectors share a bucket; planes are deterministic") {
    val pl = Similarity.planes(4, 3)
    assert(pl.toSeq.map(_.toSeq) == Similarity.planes(4, 3).toSeq.map(_.toSeq))
    val b = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), pl).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
  }

  test("IVF with enough probes finds the brute-force winner") {
    val r = Similarity.ivfTopK(emb, 0L, 1, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L))
  }

  test("IVF index builds once and serves repeated queries") {
    val idx = Similarity.ivfCentroids(emb).persist()
    try {
      idx.count() // train once
      val q0 = Similarity.ivfTopKWith(idx, emb, 0L, 1, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq
      val q2 = Similarity.ivfTopKWith(idx, emb, 2L, 1, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq
      assert(q0 == Seq(1L))
      assert(q2.nonEmpty && q2.head != 2L)
    } finally { idx.unpersist(); () }
  }

  // 64-dim fixture for the banded path (lshBandedPairs assumes dim 64):
  // two identical vectors plus noise.
  private lazy val emb64 = {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val v0 = vec()
    (Seq((0L, v0), (1L, v0.clone())) ++ (2L to 40L).map(i => (i, vec())))
      .toDF("vec_id", "embedding")
  }

  test("banded LSH near-dup: subset of exact, finds identical pair") {
    val lsh = Similarity.lshNearDupPairs(emb64, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.nearDupPairs(emb64, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH path must only emit exact-verified pairs")
    assert(lsh.contains((0L, 1L)),
      "identical vectors share every band -> guaranteed candidate")
  }

  test("knnJoin: ranked per-vector lists, candidate-bounded, exact scores") {
    val r = Similarity.knnJoin(emb64, k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    // every emitted edge is an LSH candidate pair (never beyond the bands)
    val cand = Similarity.lshBandedPairs(emb64)
      .collect().flatMap(x => Seq((x.getLong(0), x.getLong(1)),
        (x.getLong(1), x.getLong(0)))).toSet
    assert(r.forall(t => cand((t._1, t._2))))
    // ranks are 1..n contiguous, scores non-increasing within a list,
    // ties broken by neighbor id
    r.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4).toSeq
      assert(sorted.map(_._4) == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Seq(p, q) =>
          assert(p._3 > q._3 || (p._3 == q._3 && p._2 < q._2))
        case _ =>
      }
    }
    // the identical pair shares every band: each is the other's top-1
    val top = r.filter(_._4 == 1).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(top(0L) == ((1L, 1.0)) && top(1L) == ((0L, 1.0)))
  }

  test("quantized top-k with a full candidate pool equals brute force") {
    val n = 50
    val rnd = new scala.util.Random(11)
    val big = (0L until n).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(big, queryVecId = 0, k = 5)
      .as[(Long, Double)].collect().toSeq
    val quant = Similarity.quantizedTopK(big, queryVecId = 0, k = 5,
      candidates = n)
      .as[(Long, Double)].collect().toSeq
    // full pool -> the re-rank IS the exact ranking
    assert(quant === exact)
  }

  test("int8 codes are within [-127, 127] and zero vector is safe") {
    val df = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(3.0f, -4.0f)))
      .toDF("vec_id", "embedding")
    val codes = df.select(Similarity.quantizeInt8($"embedding",
        Similarity.int8Scale($"embedding")).as("q"))
      .as[Seq[Int]].collect().toSeq
    assert(codes.contains(Seq(0, 0)))
    assert(codes.flatten.forall(c => c >= -127 && c <= 127))
    assert(codes.contains(Seq(95, -127))) // 3/4*127 = 95.25 -> 95
  }

  test("banded LSH plan has no cartesian / nested-loop join") {
    val plan = Similarity.lshNearDupPairs(emb64, 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString)
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("kmeansAssign: separable clusters recovered, deterministic, tie to lowest cid") {
    // two tight groups far apart; seeds (2 lowest ids) land one per group
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.0f)), (4L, Array(0.0f, 0.1f)),
      (1L, Array(9.0f, 9.0f)), (3L, Array(9.1f, 9.0f)), (5L, Array(9.0f, 9.1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(pts, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0) == Set(0L, 2L, 4L)) // seeded by vec 0
    assert(byCluster(1) == Set(1L, 3L, 5L)) // seeded by vec 1
    // deterministic: second run bit-identical
    val again = Similarity.kmeansAssign(pts, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    assert(again == got)
    // exact tie between centroids -> lowest cluster id wins
    val tied = Seq(
      (0L, Array(-1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)) // equidistant from both seeds
    ).toDF("vec_id", "embedding")
    val t = Similarity.kmeansAssign(tied, k = 2, iters = 1)
      .filter($"vec_id" === 2L).as[(Long, Int, Double)].head()
    assert(t._2 == 0)
  }

  test("kmeansAssign plans assignment as a projection: no join, no cartesian") {
    val plan = Similarity.kmeansAssign(emb64, k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("semDedup: drops exactly the vectors with a similar lower-id cluster-mate") {
    // vec 1 duplicates vec 0 (cos = 1); vec 4 is 45 degrees from both
    // (cos ~ 0.7071); vecs 2 and 3 are orthogonal/opposite to everything.
    val out = Similarity.semDedup(emb, k = 2, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L)) // every input id present
    assert(out(0L))    // lowest id of the duplicate pair survives
    assert(!out(1L))   // its exact duplicate is dropped
    assert(out(2L) && out(3L)) // dissimilar vectors survive
    // keep decisions agree with the brute-force rule within clusters
    val asg = Similarity.kmeansAssign(emb, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) 0.0 else d / n
    }
    for (id <- vecs.keys) {
      val dominated = vecs.keys.exists(o =>
        o < id && asg(o) == asg(id) && cos(vecs(o), vecs(id)) >= 0.9)
      assert(out(id) == !dominated, s"vec $id keep=${out(id)}")
    }
  }

  test("hybridSearchRrf: fuses ranks, covers one-list-only docs") {
    // docs 1..4; term "hash" hits docs 1,2 (doc 2 twice → higher bm25);
    // vectors: query is vec 0; vec 3 identical (top), vec 4 close,
    // vec 1 orthogonal (cosine 0 — still ranked), vec 2 absent
    val docs = Seq(
      (1L, "hash join x"), (2L, "hash hash y"), (3L, "scan only"),
      (4L, "no match here")).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (3L, Array(1f, 0f)),
      (4L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val got = Similarity.hybridSearchRrf(docs, vecs, Seq("hash"),
      queryVecId = 0, kEach = 10, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // lexical ranks: doc2=1, doc1=2; vector ranks: vec3=1, vec4=2, vec1=3
    def rrf(rs: Seq[Int]) =
      BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(1L -> rrf(Seq(2, 3)), 2L -> rrf(Seq(1)),
      3L -> rrf(Seq(1)), 4L -> rrf(Seq(2)))
    assert(got.toMap == want)
    // fused order: doc1 (both lists) first, then the rank-1 singles
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("scoreFilter: keeps the top fraction, threshold is consistent") {
    val rnd = new scala.util.Random(41)
    val dim = 16
    val corpus = (1L to 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding").repartition(5)
    val got = Similarity.scoreFilter(corpus, keepFrac = 0.25, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.length == 200)
    val kept = got.filter(_._3).map(_._2)
    val dropped = got.filterNot(_._3).map(_._2)
    // every kept score beats every dropped score (the gate is a pure
    // threshold), and the kept fraction lands on the requested quartile
    assert(kept.min >= dropped.max)
    assert(math.abs(kept.length - 50) <= 2, s"kept ${kept.length}")
    // deterministic: same weights, same result on a second run
    val again = Similarity.scoreFilter(corpus, keepFrac = 0.25, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("pqTopK: clustered corpus — ADC ranks the query's cluster first") {
    import spark.implicits._
    // two well-separated clusters in 8 dims (m=2 subspaces of 4):
    // queries from cluster A must retrieve cluster A under ADC.
    val rnd = new scala.util.Random(3)
    def jitter(base: Float): Seq[Float] =
      Seq.fill(8)(base + rnd.nextFloat() * 0.1f)
    val a = (0L until 10L).map(i => (i, jitter(0.0f)))
    val b = (10L until 20L).map(i => (i, jitter(5.0f)))
    val emb = (a ++ b).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(emb, queryVecId = 0, k = 9, m = 2,
      ksub = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.length == 9)
    // all 9 nearest by ADC are the other cluster-A members
    assert(got.map(_._1).toSet == (1L until 10L).toSet, got.toSeq.toString)
    // codes are m comma-joined centroid ids within [0, ksub)
    assert(got.forall(_._2.split(',').length == 2))
    assert(got.forall(_._2.split(',').forall(c => c.toInt >= 0 && c.toInt < 4)))
    // ascending ADC order, deterministic rerun
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    val again = Similarity.pqTopK(emb, queryVecId = 0, k = 9, m = 2,
      ksub = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
    // kmeansAssign still matches its pre-refactor contract: two
    // line-separated pairs (seeds 0 and 1 both sit in the left pair,
    // the update pulls centroid 1 rightward, iter 3 separates cleanly)
    val sq = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.5f, 0f)), (2L, Seq(4f, 0f)),
      (3L, Seq(4.5f, 0f))).toDF("vec_id", "embedding")
    val asg = Similarity.kmeansAssign(sq, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg(0L) == asg(1L) && asg(2L) == asg(3L) && asg(0L) != asg(2L))
  }

  test("randomProjection: sparse sign matrix, linearity, JL norm preservation") {
    val m = Similarity.signMatrix(8, 64, seed = 11L)
    assert(m.flatten.forall(v => v == -1 || v == 0 || v == 1))
    val zeroFrac = m.flatten.count(_ == 0).toDouble / (8 * 64)
    assert(zeroFrac > 0.5 && zeroFrac < 0.8, s"zero fraction $zeroFrac")
    // well-mixed deterministic pseudo-vectors (isotropic-ish). For a
    // FIXED sign matrix, the isotropic-mean norm ratio is exactly
    // 3·nnz/(k·dim) — self-calibrate to the drawn matrix and assert
    // the scaling + linear structure around it.
    val vecs = (0 until 200).map { v =>
      (v.toLong, (0 until 64).map { i =>
        val h = (v * 64L + i + 1L) * 0x9E3779B97F4A7C15L
        (((h >>> 33) % 201L) - 100L) / 100.0f
      })
    }.toDF("vec_id", "embedding")
    val p = Similarity.randomProjection(vecs).collect()
    val inNorm = vecs.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Float]](1).map(x => x * x.toDouble).sum).toMap
    val ratios = p.map { r =>
      val pn = (1 to 8).map(j => { val x = r.getDouble(j); x * x }).sum
      pn / math.max(1e-9, inNorm(r.getLong(0)))
    }
    val mean = ratios.sum / ratios.length
    val expected = 3.0 * m.flatten.count(_ != 0) / (8 * 64)
    assert(math.abs(mean - expected) < 0.3,
      s"mean norm ratio $mean vs isotropic expectation $expected")
    // linearity: proj(2x) == 2*proj(x) exactly (pre-rounding it's a
    // linear map; rounding at 6 dp leaves <= 1e-6 per coord)
    val doubled = vecs.select($"vec_id" + 1000L as "vec_id",
      transform($"embedding", x => x * 2f).as("embedding"))
    val p2 = Similarity.randomProjection(doubled).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getDouble)).toMap
    val p1 = p.map(r => r.getLong(0) -> (1 to 8).map(r.getDouble)).toMap
    for (v <- 0L until 200L; j <- 0 until 8)
      assert(math.abs(p2(v + 1000L)(j) - 2 * p1(v)(j)) < 3e-6)
  }
}

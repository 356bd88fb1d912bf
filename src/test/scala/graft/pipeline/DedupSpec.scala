package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"), // exact dup of 1
    (3L, "the quick brown fox jumps over a lazy dog", "s1"),   // near dup
    (4L, "completely different content about spark engines", "s1"),
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps min id and counts duplicates") {
    val r = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("canonical_id", "dup_count").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("identical texts share the full minhash signature") {
    val bands = Dedup.minhashBands(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(4L))
  }

  test("minhash pairs surface the exact duplicate") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("fused simhash16 ≡ composable on a messy corpus") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("alpha", "Beta", "GAMMA", "d", "epsilon", "ze ta", "x")
    val docs = ((1L to 50L).map { i =>
      (i, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } ++ Seq((51L, ""), (52L, " "), (53L, "one"))).toDF("doc_id", "text")
    val a = docs.select(col("doc_id"),
      Dedup.simhash16(col("text")).as("h")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = docs.select(col("doc_id"),
      Dedup.simhash16Composable(col("text")).as("h")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(graft.expressions.Fused.available("simhash16"))
  }

  test("simhash is deterministic and equal for identical text") {
    val sh = docs.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) >= 0 && sh(1L) < 65536)
    val again = docs.select(Dedup.simhash16(col("text")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(again == docs.select(Dedup.simhash16(col("text")).as("s"))
      .collect().map(_.getLong(0)).toSeq)
  }

  test("simhash near-dup pairs include identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("ngram jaccard: identical = 1.0, near dup high, unrelated absent") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
      n = 2, threshold = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(!j.contains((1L, 4L)))
  }

  test("banded simhash pairs equal the brute-force all-pairs result") {
    // pigeonhole banding is exact for hamming <= radius: the candidate
    // equi-join may only SHRINK the comparison set, never the result.
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val many = ((1L to 30L).map { i =>
      (i, Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "s")
    } ++ Seq((31L, "alpha beta gamma delta", "s"),
      (32L, "alpha beta gamma delta", "s"),       // identical -> hamming 0
      (33L, "alpha beta gamma epsilon", "s")))    // near
      .toDF("doc_id", "text", "source")
    val sh = many.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        bit_count(col("a.s").bitwiseXOR(col("b.s"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Dedup.simhashPairs(many, "doc_id", "text", radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    assert(banded.exists(p => p._1 == 31L && p._2 == 32L && p._3 == 0))
  }

  test("banded simhash plan has no cartesian / nested-loop join") {
    val plan = Dedup.simhashPairs(docs, "doc_id", "text", radius = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("jaccardForPairs verifies candidates, scoring zero-overlap pairs 0") {
    val cand = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardForPairs(cand, docs, "doc_id", "text",
      n = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0) // candidate with empty intersection survives at 0
    assert(!j.contains((1L, 3L))) // not a candidate -> never scored
  }

  test("dupGroups clusters transitively with min-id canonical labels") {
    // 1-2, 2-3 chain => {1,2,3} labelled 1; 7-9 => labelled 7
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val g = Dedup.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("dupGroups driver union-find ≡ distributed CC past the gate") {
    // randomized pair graphs; driverMax = 0 forces the distributed
    // pointer-jumping path, which must label identically
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(60)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
      val viaDriver = Dedup.dupGroups(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaCc = Dedup.dupGroups(pairs, driverMax = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == viaCc, s"trial $trial")
    }
  }

  test("contamination finds shared shingles train-vs-eval, counts distinct") {
    val train = Seq(
      (10L, "the quick brown fox jumps high"),   // shares "the quick brown"
      (11L, "totally unrelated words here now"),
      (12L, "quick brown fox quick brown fox")   // repeats: distinct shingles
    ).toDF("doc_id", "text")
    val evalSet = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val got = Dedup.contamination(train, evalSet, "doc_id", "text", n = 3)
      .orderBy("train_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 10 shares "the quick brown" + "quick brown fox" = 2
    // doc 12 shares "quick brown fox" once (distinct within each doc)
    assert(got === Seq((10L, 1L, 2L), (12L, 1L, 1L)))
  }

  test("shingles of short text are empty, not an error") {
    val n = Seq((9L, "one two", "s")).toDF("doc_id", "text", "source")
      .select(size(Dedup.shingles(col("text"), 3)).as("n")).head().getInt(0)
    assert(n == 0)
  }

  test("fast banding: identical docs share every band key; schema matches md5 variant") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words in this other document right here")
    ).toDF("doc_id", "text")
    val fast = Dedup.minhashBandsFast(docs, "doc_id", "text")
    assert(fast.columns.toSeq == Seq("doc_id", "band0", "band1", "band2", "band3"))
    val rows = fast.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))       // identical text -> identical bands
    assert(rows(1L) != rows(3L))       // different text -> different bands
  }

  test("fused md5 banding is bit-identical to the composable oracle form") {
    // the DuckDB oracle encodes the composable construction; the fused
    // expression must match it exactly, including the short-doc NULL bands
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "Mixed", "CASE", "tabs\there")
    val many = ((1L to 40L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } ++ Seq((41L, "one two"), (42L, ""), (43L, "   "),
      (44L, "word"))).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fused = canon(Dedup.minhashBands(many, "doc_id", "text"))
    val composable = canon(Dedup.minhashBandsComposable(many, "doc_id", "text"))
    assert(fused == composable)
    // short docs (< n words) must yield NULL bands in both forms
    assert(fused(40).tail.forall(_ == null))
  }

  test("prefixFilterJoin finds EXACTLY the brute-force Jaccard pairs") {
    // the prefix-filter lemma (prefixes under one global order must
    // intersect when J >= t) is the load-bearing math — pin it against
    // brute-force all-pairs on randomized corpora, several thresholds
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val sets = docs.collect().map { r =>
      val ws = r.getString(1).split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> ws.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet
    }.toMap
    for ((tn, td) <- Seq((1, 2), (1, 3), (2, 3))) {
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        uni = sets(a).size + sets(b).size - inter
        if uni > 0 && inter * td >= tn * uni
      } yield (a, b)).toSet
      val got = Dedup.prefixFilterJoin(docs, "doc_id", "text",
          n = 2, tn = tn, td = td)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"threshold $tn/$td")
    }
  }

  test("prefixFilterJoin: jaccard column is exact and short docs drop out") {
    val docs = Seq(
      (1L, "x y z w"),        // shingles {x y, y z, z w}
      (2L, "x y z q"),        // shares {x y, y z}: J = 2/4 = 0.5
      (3L, "p q"),            // 1 shingle, unrelated
      (4L, "solo")            // no 2-gram shingles at all
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(docs, "doc_id", "text",
        n = 2, tn = 1, td = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 3L, 3L, 0.5)))
    // determinism across partitionings
    val a = Dedup.prefixFilterJoin(docs.repartition(5), "doc_id", "text",
      n = 2, tn = 1, td = 2).orderBy("id_a", "id_b").collect().toSeq
    assert(a == got.toSeq.map(org.apache.spark.sql.Row.fromTuple))
  }

  test("incrementalDedup flags batch-vs-corpus near-dups only") {
    val rep = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, rep),                                // dup target in corpus
      (2L, rep),                                // corpus-internal dup of 1
      (3L, "completely different corpus text here now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, rep),                               // near-dup of corpus 1 and 2
      (11L, rep),                               // batch-internal dup of 10
      (12L, "fresh unseen content nothing matches")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // only cross-side pairs: batch {10, 11} x corpus {1, 2}; NEVER the
    // corpus-internal (1,2) or batch-internal (10,11) pairs
    assert(got == Set((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L)))
  }
}

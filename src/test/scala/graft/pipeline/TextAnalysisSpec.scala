package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  private def stat(text: String, c: org.apache.spark.sql.Column): Any =
    one(text).select(c.as("v")).head().get(0)

  test("token count splits on whitespace runs") {
    assert(stat("a  b\tc", TextAnalysis.tokenCount(col("text"))) == 3)
    assert(stat("", TextAnalysis.tokenCount(col("text"))) == 0)
  }

  test("bpe-ish count: alpha runs, digits, marks") {
    // "ab12 c!" -> [ab][1][2][c][!]
    assert(stat("ab12 c!", TextAnalysis.bpeishCount(col("text"))) == 5)
  }

  test("avg token length is the exact rational") {
    assert(stat("ab cdef", TextAnalysis.avgTokenLen(col("text"))) == 3.0)
  }

  test("punct ratio counts non-alphanumerics") {
    assert(stat("ab!?", TextAnalysis.punctRatio(col("text"))) == 0.5)
    assert(stat("", TextAnalysis.punctRatio(col("text"))) == 0.0)
  }

  test("stopword ratio is frequency-weighted") {
    assert(stat("the the fox", TextAnalysis.stopwordRatio(col("text"))) == 2.0 / 3.0)
  }

  test("quality score stays in [0,1]") {
    Seq("", "the a of to in", "x!@#$%", ("word " * 200).trim).foreach { t =>
      val q = stat(t, TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q")
    }
  }

  test("langId picks the profile with most stopword hits") {
    assert(stat("the cat and the dog", TextAnalysis.langId(col("text"))) == "en")
    assert(stat("le chat est en colère", TextAnalysis.langId(col("text"))) == "fr")
    assert(stat("der hund ist nicht da", TextAnalysis.langId(col("text"))) == "de")
    assert(stat("xyzzy plugh", TextAnalysis.langId(col("text"))) == "und")
  }

  test("content hash is whitespace-insensitive via normalization") {
    val h1 = stat("Hello  World", TextAnalysis.contentHash(col("text")))
    val h2 = stat("hello world ", TextAnalysis.contentHash(col("text")))
    assert(h1 == h2)
  }

  test("min k-gram fingerprint matches for shifted content") {
    // shared 8-gram windows dominate: the minimum hash is likely shared
    val a = stat("abcdefghijklmnop", TextAnalysis.minKgramHash(col("text"), 8))
    val b = stat("xx abcdefghijklmnop", TextAnalysis.minKgramHash(col("text"), 8))
    // not guaranteed equal in general, but both deterministic
    assert(a == stat("abcdefghijklmnop", TextAnalysis.minKgramHash(col("text"), 8)))
    assert(b.toString.matches("[0-9a-f]{32}"))
  }

  test("fused text_stats ≡ composable columns on the fixture corpus") {
    // the fused native expression must reproduce the composable (and
    // thus DuckDB-oracle-matched) columns BIT-FOR-BIT — same contract
    // as the fused minhash banding
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq((9000001L, ""), (9000002L, "   "), (9000003L, "a"),
      (9000004L, "The\tQUICK  brown\nfox! 123 a.b@c.de"),
      (9000005L, "der le el the 的")).toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val fused = TextAnalysis.analyze(all, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val composable = TextAnalysis.analyzeComposable(all, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(fused == composable)
  }

  test("fused min_kgram / rep_stats ≡ composable on a messy corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "Beta", "GAMMA", "d", "epsilon", "ze",
      "tab\there", "x", "!!", "a.b")
    val docs = ((1L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString("  "))
    } ++ Seq((61L, ""), (62L, "   "), (63L, "one"), (64L, "one one one"),
      (65L, " Mixed   CASE\twords here words here "))).toDF("doc_id", "text")
    for (k <- Seq(3, 8)) {
      val a = docs.select(col("doc_id"),
        TextAnalysis.minKgramHash(col("text"), k).as("h")).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val b = docs.select(col("doc_id"),
        TextAnalysis.minKgramHashComposable(col("text"), k).as("h"))
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(a == b, s"k=$k")
    }
    val fr = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val cr = TextAnalysis.repetitionStatsComposable(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fr == cr)
    // and the fused path is actually in play on this session
    assert(graft.expressions.Fused.available("rep_stats"))
  }

  test("analyze emits one row per document with all columns") {
    val df = TextAnalysis.analyze(
      Seq((1L, "the quick brown fox"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(df.columns.toSeq == Seq("doc_id", "n_tokens", "n_bpeish",
      "avg_token_len", "punct_ratio", "stopword_ratio", "quality",
      "lang_pred", "content_hash"))
    assert(df.count() == 2)
  }

  test("lmScore: self-predictable bigrams score 0, diverging prefixes below") {
    val docs = Seq(
      (1L, "a b a b a b"),  // every bigram is its prefix's only continuation
      (2L, "c d c e")       // prefix c splits between d and e -> ln(1/2) terms
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got(0) === ((1L, 5L, 0.0)))
    assert(got(1)._2 === 3L)
    assert(got(1)._3 < 0.0) // avg of {ln .5, 0, ln .5} / 3
  }

  test("repetitionStats: counts, fractions, and degenerate docs") {
    val docs = Seq(
      (1L, "a b a b a b"),        // top bigram "a b" x3 of 5, top token a x3
      (2L, "all distinct words"), // no repetition
      (3L, "solo"),               // single token: no bigrams
      (4L, "")                    // empty
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Double, Int, Int, Double)].collect().toSeq
    assert(got(0) === ((1L, 6, 0.333333, 3, 3, 0.6)))
    assert(got(1) === ((2L, 3, 1.0, 1, 1, 0.5)))
    assert(got(2) === ((3L, 1, 1.0, 1, 0, 0.0)))
    assert(got(3) === ((4L, 0, 0.0, 0, 0, 0.0)))
  }

  test("piiScan: counts every match and redacts all occurrences") {
    val docs = Seq(
      (1L, "mail a@b.com and c.d+x@e.org, host 10.0.0.1 ref 123-45-6789"),
      (2L, "no identifiers here"),
      (3L, "10.1.2.3 then 10.1.2.3 again") // duplicate matches both count
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got(0)._2 == 2 && got(0)._3 == 1 && got(0)._4 == 1)
    assert(got(1)._2 == 0 && got(1)._3 == 0 && got(1)._4 == 0)
    assert(got(2)._3 == 2)
    // redaction is total: re-scanning the redacted text finds nothing
    val redacted = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        TextAnalysis.EmailRe, "<EMAIL>"),
        TextAnalysis.Ipv4Re, "<IP>"),
        TextAnalysis.SsnLikeRe, "<ID>").as("text"))
    val rescan = TextAnalysis.piiScan(redacted, "doc_id", "text")
      .agg(sum(col("n_emails") + col("n_ipv4") + col("n_ids")))
      .as[Long].head()
    assert(rescan == 0L)
  }

  test("filterDecisions: first-match reject reason; keep iff no rule fails") {
    val longGood = ("the a of and " * 30).trim       // many tokens, stopwords
    val docs = Seq(
      (1L, "too short"),                             // < 10 tokens
      (2L, longGood),                                // passes everything
      (3L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~") // punct soup
    ).toDF("doc_id", "text")
    val got = TextAnalysis.filterDecisions(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Boolean)].collect().toSeq
    assert(got(0) == ((1L, "too_short", false)))
    assert(got(1) == ((2L, "keep", true)))
    assert(got(2)._3 == false) // punct soup fails (first matching rule)
    assert(got(2)._2 != "keep")
  }

  test("topTerms: exact counts, count-desc then term-asc order, limit k") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a d d")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("d", 2L))) // tie a/b -> term asc
  }

  test("pmiCollocations: hand-computed PMI, min-count gate, tie order") {
    // 6 copies of "new york is big": T=24 tokens, TB=18 bigrams, every
    // bigram count 6, every unigram count 6 ->
    // pmi = ln(6*24*24 / (18*6*6)) = ln(16/3) = 1.6740 (4 dp)
    val docs = (1L to 6L).map(i => (i, "new york is big")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("is", "big", 6L, 1.674), ("new", "york", 6L, 1.674),
      ("york", "is", 6L, 1.674)))
    // raising the gate above 6 empties the result
    assert(TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 7)
      .isEmpty)
  }

  test("dupNgramStats: flags windows whose gram appears in another doc") {
    // docs 1 and 2 share the trigram "a b c"; doc 3 is all-unique;
    // doc 4 is too short for any window.
    val docs = Seq(
      (1L, "a b c d"),     // windows: "a b c", "b c d"
      (2L, "z a b c"),     // windows: "z a b", "a b c"
      (3L, "p q r s"),     // windows: "p q r", "q r s" -- unique
      (4L, "x y")          // no window at n = 3
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramStats(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 2L, 1L, 0.5)))
    assert(got(1) == ((2L, 2L, 1L, 0.5)))
    assert(got(2) == ((3L, 2L, 0L, 0.0)))
    assert(got(3) == ((4L, 0L, 0L, 0.0))) // short doc: zero, not missing
  }

  test("dupSpans: marks shared windows, merges overlapping/abutting spans") {
    val docs = Seq(
      (1L, "a b c d e f"),          // "a b c" shared with doc 2 at pos 0
      (2L, "a b c x y z q a b c"),  // two disjoint shared windows: pos 0, 7
      (3L, "p q r s t"),            // windows 0,1 shared with doc 4 → merge
      (4L, "p q r s u"),
      (5L, "m n o w1 w2 w3"),       // nothing shared
      // ABUTTING (not overlapping): doc 6 shares "g h i" (tokens 0-2)
      // and "j k l" (tokens 3-5) with doc 7 but NOT the windows
      // between — contiguous covered range 0..5 → ONE maximal span;
      // doc 7's copies sit 6 apart → two separate spans
      (6L, "g h i j k l"),
      (7L, "g h i z1 z2 z3 j k l")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0, 2, 1L),
      (2L, 0, 2, 1L), (2L, 7, 9, 1L),
      (3L, 0, 3, 2L),
      (4L, 0, 3, 2L),
      (6L, 0, 5, 2L),
      (7L, 0, 2, 1L), (7L, 6, 8, 1L)))
  }

  test("chunkDocs: brute-force parity, overlap, and edge docs") {
    val rnd = new scala.util.Random(31)
    val docs = ((1L to 30L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))("w" + rnd.nextInt(9)).mkString(" "))
    } ++ Seq((31L, ""), (32L, "one"), (33L, ("x " * 8).trim)))
      .toDF("doc_id", "text")
    val size = 8; val overlap = 3; val step = size - overlap
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text", size, overlap)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

    // brute-force reference on the driver
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).flatMap { case (id, text) =>
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val c = if (ws.length <= size) 1
                else 1 + (ws.length - size + step - 1) / step
        (0 until c).map { i =>
          val chunk = ws.slice(i * step, i * step + size)
          (id, i, chunk.length, chunk.mkString(" "))
        }
      }.toSeq
    assert(got.toSeq == want)

    // consecutive full chunks share exactly `overlap` tokens
    got.toSeq.groupBy(_._1).foreach { case (_, cs) =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) if a._3 == size =>
          assert(a._4.split(" ").takeRight(overlap).toSeq ==
            b._4.split(" ").take(overlap).toSeq)
        case _ =>
      }
    }
    // edge docs: empty and short docs yield exactly one chunk
    assert(got.count(_._1 == 31L) == 1 && got.find(_._1 == 31L).get._3 == 0)
    assert(got.count(_._1 == 32L) == 1)
    assert(got.count(_._1 == 33L) == 1) // exactly chunkSize tokens
  }

  test("boilerplate lines: per-source threshold, order, survivors") {
    val docs = Seq(
      (1L, "a", "H\nx\nF"), (2L, "a", "H\ny\nF"), (3L, "a", "H\nF"),
      // same H line in source b, but only 2 docs there: below threshold
      (4L, "b", "H\nz"), (5L, "b", "H\nw"),
      (6L, "a", "")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.boilerplateLines(docs, "doc_id", "text", "source",
      minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    assert(out(0) == ((1L, 3L, 1L, "x")))
    assert(out(1) == ((2L, 3L, 1L, "y")))
    assert(out(2) == ((3L, 2L, 0L, ""))) // pure boilerplate survives, empty
    // source b keeps H: frequency is per (source, line)
    assert(out(3) == ((4L, 2L, 2L, "H\nz")))
    assert(out(4) == ((5L, 2L, 2L, "H\nw")))
    // the empty doc has ONE line (the empty string) — and since "" only
    // appears in one doc of source a, it is kept verbatim
    assert(out(5) == ((6L, 1L, 1L, "")))
    // line ORDER is preserved through the shuffle: multi-line survivor
    val multi = Seq((1L, "s", "keep1\nBP\nkeep2\nkeep3"),
      (2L, "s", "BP\nq"), (3L, "s", "BP")).toDF("doc_id", "source", "text")
    val m = TextAnalysis.boilerplateLines(multi, "doc_id", "text", "source",
      minDocs = 3).filter(col("doc_id") === 1L).head()
    assert(m.getString(3) == "keep1\nkeep2\nkeep3")
  }

  test("bpeMerges: hand-computed merge sequence, greedy aaaa case, early stop") {
    // corpus: "low low lower" -> word types low(2), lower(1)
    // round 1 pairs: (l,o)=3, (o,w)=3, (w,e)=1, (e,r)=1
    //   tie 3: (l,o) < (o,w) lexically -> merge (l,o) -> lo
    // round 2: (lo,w)=3, (w,e)=1, (e,r)=1 -> merge (lo,w) -> low
    // round 3: (low,e)=1, (e,r)=1 -> (e,r) < (low,e)? count tie 1:
    //   (e,r) sorts before (low,e) -> merge (e,r) -> er
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(m == Seq((1, "l", "o", "lo", 3L), (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L)))
    // greedy left-to-right: aaaa fuses to (aa)(aa), so round 2's pair
    // count for (aa,aa) is 1 per word occurrence, not 3
    val rep = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val g = TextAnalysis.bpeMerges(rep, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(g == Seq((1, "aa", 6L), (2, "aaaa", 2L)))
    // exhaustion: single-char words stop the loop early
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(tiny, "text", rounds = 5).count() == 0L)
    // merges fully tokenize a one-word corpus then stop
    val one = Seq((1L, "abc")).toDF("doc_id", "text")
    val o = TextAnalysis.bpeMerges(one, "text", rounds = 10)
      .collect().map(_.getString(3)).toSeq
    assert(o == Seq("ab", "abc"))
    // delimiter exclusion: word types containing '‹'/'›' (real
    // single-angle quotation marks, e.g. French «guillemets simples»)
    // are DROPPED before wrapping — they would otherwise create false
    // symbol boundaries. Corpus = the low corpus + a ‹quoted› word:
    // merges must be identical to the clean corpus's.
    val dirty = Seq((1L, "low low lower ‹abc› x‹y")).toDF("doc_id", "text")
    val dm = TextAnalysis.bpeMerges(dirty, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(dm == Seq((1, "l", "o", "lo", 3L), (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L)))
    // encode side: the dirty words contribute neither words nor tokens
    val de = TextAnalysis.bpeEncodeStats(dirty, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // low low lower -> low(1 sym)x2 + low|e|r -> low,er = 2 syms
    assert(de == Seq((1L, 3L, 4L)))
  }

  test("fuzzyLookup: ed<=1 matches via delete keys; transpositions excluded") {
    val docs = Seq((1L, "join join filter scan scan scan"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.fuzzyLookup(docs, "text",
      Seq("join", "joim", "filtr", "scann", "jion", "zzz"))
      .collect().map(x => (x.getString(0), x.getString(1),
        x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(
      ("filtr", "filter", 1L, 1L),  // deletion
      ("joim", "join", 1L, 2L),     // substitution
      ("join", "join", 0L, 2L),     // exact
      ("scann", "scan", 1L, 3L)))   // insertion
    // "jion" (transposition, ed 2) and "zzz" produce no rows
    assert(!r.exists(x => x._1 == "jion" || x._1 == "zzz"))
  }

  test("ragContextPack: rank order, budget cut, zero-score chunks dropped") {
    val docs = Seq((1L, "q q q q x x x x q q"), (2L, "q x x x"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.ragContextPack(docs, "doc_id", "text",
      Seq("q"), k = 10, tokenBudget = 7L, chunkSize = 4, overlap = 0)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
        x.getLong(3), x.getInt(4), x.getLong(5))).toSeq
    // chunks: doc1 [qqqq](score 4), [xxxx](0, dropped), [qq](2);
    // doc2 [qxxx](1). cum 4, 6, 10 -> budget 7 keeps the first two.
    assert(r == Seq((1L, 0, 4L, 1L, 4, 4L), (1L, 2, 2L, 2L, 2, 6L)))
  }

  test("searchEvalMetrics: hand-computed MRR/NDCG incl. empty result set") {
    val docs = Seq((1L, "apple banana"), (2L, "apple"), (3L, "cherry"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.searchEvalMetrics(docs, "doc_id", "text",
      Seq("q0_none" -> Seq("zzz"), "q1_two" -> Seq("apple", "banana"),
        "q2_one" -> Seq("cherry")), k = 3)
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(6))).toSeq
    // q1: doc1 (rel 2) ranks first, doc2 (rel 1) second →
    // DCG = 3/log2(2) + 1/log2(3) = 3.6309; ideal order identical
    val dcgQ1 = BigDecimal(3.0 + 1.0 / (math.log(3.0) / math.log(2.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Seq(
      ("q0_none", 0L, -1L, 0.0, 0.0, 0.0),
      ("q1_two", 2L, 1L, 1.0, dcgQ1, 1.0),
      ("q2_one", 1L, 1L, 1.0, 1.0, 1.0)))
  }

  test("bpeEncodeStats: hand-computed token counts after the trained merges") {
    // merges on this corpus (see bpeMerges spec): lo, low, er
    // encode: low -> ‹low› (1 symbol), lower -> ‹low›‹er› (2 symbols)
    val docs = Seq((1L, "low low lower"), (2L, "lower low"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeStats(docs, "doc_id", "text", rounds = 3)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 3L, 4L), (2L, 2L, 3L)))
    // greedy aaaa case flows through encoding: aaaa -> (aa)(aa),
    // aaa -> (aa)(a) after the single (a,a) merge
    val rep = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val g = TextAnalysis.bpeEncodeStats(rep, "doc_id", "text", rounds = 1)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSeq
    assert(g == Seq((2L, 4L)))
    // a corpus that exhausts before `rounds` fails loudly (the oracle
    // unrolls all rounds)
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncodeStats(tiny, "doc_id", "text", rounds = 2)
    }
  }
}

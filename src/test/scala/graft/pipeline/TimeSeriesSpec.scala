package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TimeSeries (as-of / range join) and Sampling operators: each scalable
  * shape is checked against the brute-force formulation on data small
  * enough to enumerate, plus the plan-shape properties that make it the
  * scalable one.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    // (id, key, ts)
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 500L), (5L, "c", 10L)
  ).toDF("event_id", "k", "ts")

  private lazy val right = Seq(
    // (id, key, ts, v)
    (10L, "a", 100L, 1.0), (11L, "a", 150L, 2.0), (12L, "a", 99L, 3.0),
    (13L, "b", 499L, 4.0), (14L, "b", 500L, 5.0), (15L, "d", 1L, 6.0)
  ).toDF("event_id", "k", "ts", "v")

  test("asofJoin picks the latest right row at or before each left ts") {
    val got = TimeSeries.asofJoin(left, right, "k", "ts", "event_id",
      Seq("event_id", "v"))
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, Some(10L), Some(1.0)), // tie at ts=100 is inclusive
      (2L, Some(11L), Some(2.0)), // 150 is the most recent <= 200
      (3L, None, None),           // earliest right row for key a is ts=99 > 50
      (4L, Some(14L), Some(5.0)), // tie at 500 beats 499
      (5L, None, None)))          // key c has no right rows
  }

  test("asofJoin matches the brute-force non-equi formulation") {
    val brute = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" <= $"l.ts", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l.event_id")
          .orderBy($"r.ts".desc_nulls_last, $"r.event_id".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"l.event_id", $"r.event_id".as("asof_event_id"), $"r.v".as("asof_v"))
    val got = TimeSeries.asofJoin(left, right, "k", "ts", "event_id",
      Seq("event_id", "v")).select("event_id", "asof_event_id", "asof_v")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("asofJoin keeps matched rows coherent when a payload value is NULL") {
    val l = Seq((1L, "k", 30L)).toDF("event_id", "k", "ts")
    val r = Seq((100L, "k", 10L, Some(1.5)), (200L, "k", 20L, None))
      .toDF("event_id", "k", "ts", "v")
    val got = TimeSeries.asofJoin(l, r, "k", "ts", "event_id",
        Seq("event_id", "v"))
      .select("asof_event_id", "asof_v")
      .as[(Option[Long], Option[Double])].head()
    // the latest right row is (200, NULL): the NULL must come through,
    // not be patched with the older row's 1.5 (row tearing)
    assert(got === ((Some(200L), None)))
  }

  test("asofJoin plan has no nested-loop join (single window, no cartesian)") {
    val plan = TimeSeries.asofJoin(left, right, "k", "ts", "event_id", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  private lazy val pts = Seq(
    (1L, "a", 0L), (2L, "a", 5L), (3L, "a", 10L), (4L, "a", 27L),
    (5L, "b", 3L), (6L, "b", 30L), (7L, "b", 33L)
  ).toDF("id", "k", "ts")

  test("rangeSelfJoin finds exactly the within-window ordered pairs") {
    val got = TimeSeries.rangeSelfJoin(pts, "k", "ts", "id", windowSpan = 10L)
      .select("a_id", "b_id", "dt").orderBy("a_id", "b_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 5L), (1L, 3L, 10L), (2L, 3L, 5L),
      (6L, 7L, 3L)))
  }

  test("rangeSelfJoin matches brute force on random data") {
    val n = 200
    val rnd = new scala.util.Random(7)
    val df = (1 to n).map(i => (i.toLong, s"k${rnd.nextInt(5)}",
      rnd.nextInt(1000).toLong)).toDF("id", "k", "ts")
    val w = 37L
    val brute = df.as("a").join(df.as("b"),
        $"a.k" === $"b.k" && $"b.ts" >= $"a.ts" && $"b.ts" - $"a.ts" <= w &&
          ($"a.ts" < $"b.ts" || $"a.id" < $"b.id"))
      .select($"a.id".as("a_id"), $"b.id".as("b_id"))
    val got = TimeSeries.rangeSelfJoin(df, "k", "ts", "id", w)
      .select("a_id", "b_id")
    assert(got.count() === brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("stratified sampling is deterministic, subset-monotone, and rate-shaped") {
    val docs = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val s20 = Sampling.stratified(docs, "doc_id", "source", Seq("src0" -> 20), 10)
    val s40 = Sampling.stratified(docs, "doc_id", "source", Seq("src0" -> 40), 10)
    // deterministic: same result twice
    assert(s20.collect().toSeq === s20.collect().toSeq)
    // monotone: the 20% stratum is a subset of the 40% stratum
    val ids20 = s20.filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    val ids40 = s40.filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    assert(ids20.subsetOf(ids40))
    // roughly rate-shaped (hash is pseudo-uniform; generous bounds)
    val n0 = ids20.size
    assert(n0 > 25 && n0 < 75, s"src0 kept $n0 of 250 at 20%")
    // negative ids still bucket into [0, 100)
    val buckets = (-50L until 50L).toDF("doc_id")
      .select(Sampling.hashBucket($"doc_id").as("b")).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 100))
  }

  test("tokenBudget fills each stratum to its budget, keeping the crossing doc") {
    val docs = (0L until 40L).map(i => (i, s"s${i % 2}", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val kept = Sampling.tokenBudget(docs, "doc_id", "source", "n_tokens", 550L)
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // 100-token docs, budget 550: tokens_before < 550 keeps docs 0..5
    // (the 6th crosses the boundary and is kept) in each stratum
    assert(bySrc === Map("s0" -> 6L, "s1" -> 6L))
    // deterministic across runs
    assert(kept.collect().toSeq === kept.collect().toSeq)
    // a stratum smaller than its budget is kept whole
    val tiny = Sampling.tokenBudget(docs, "doc_id", "source", "n_tokens", 100000L)
    assert(tiny.count() === 40L)
  }

  test("assignSplits covers every row once with stable cut points") {
    val docs = (0L until 500L).toDF("doc_id")
    val splits = Sampling.assignSplits(docs, "doc_id",
      Seq("val" -> 10, "test" -> 10, "train" -> 80))
    assert(splits.count() === 500)
    val byName = splits.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet === Set("val", "test", "train"))
    assert(byName.values.sum === 500L)
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // stable: a row's split never changes between runs
    assert(splits.collect().toSeq === splits.collect().toSeq)
  }

  test("bm25 ranks the doc that repeats a query term above one that lacks it") {
    val docs = Seq(
      (1L, "hash join hash probe hash table"),
      (2L, "sort merge join only"),
      (3L, "nothing relevant here at all whatsoever today")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L)) // doc 3 scores 0 and is filtered
    assert(got.head._2 > got(1)._2)
  }

  test("gapFill: dense grid per key, forward-filled gaps, observed sums kept") {
    // key k1 observes buckets 0 and 3 (span 10): grid 0..3 with two
    // gaps carrying bucket 0's value; key k2 is a single point.
    val df = Seq(
      ("k1", 5L, 2.0), ("k1", 7L, 3.0),   // bucket 0, sum 5.0
      ("k1", 35L, 7.0),                    // bucket 3
      ("k2", 100L, 1.0)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.gapFill(df, "k", "ts", "v", bucketSpan = 10L)
      .orderBy("k", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("k1", 0L, Some(5.0), 5.0, false),
      ("k1", 1L, None, 5.0, true),
      ("k1", 2L, None, 5.0, true),
      ("k1", 3L, Some(7.0), 7.0, false),
      ("k2", 10L, Some(1.0), 1.0, false)))
  }

  test("nearestJoin: min |dt|, equidistant->backward, equal-ts->greatest tie, no-match nulls") {
    val left = Seq((100L, "u", 14L), (101L, "u", 15L), (102L, "u", 20L),
      (103L, "u", 3L), (104L, "v", 5L), (105L, "w", 29L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, "u", 10L, 1.0), (2L, "u", 20L, 2.0),
      (5L, "w", 30L, 5.0), (6L, "w", 30L, 6.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val r = TimeSeries.nearestJoin(left, right, "user_id", "ts_us",
      "event_id", "event_id", Seq("event_id", "value"))
      .orderBy("event_id")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(6)) Long.MinValue else x.getLong(6))).toSeq
    assert(r == Seq(
      (100L, 1L, -4L),          // dist 4 back vs 6 fwd
      (101L, 1L, -5L),          // 5 vs 5 -> backward
      (102L, 2L, 0L),           // exact hit
      (103L, 1L, 7L),           // nothing behind -> forward
      (104L, -1L, Long.MinValue), // user v has no clicks
      (105L, 6L, 1L)))          // two clicks at ts 30 -> greatest tie
  }

  test("nearestJoin: randomized parity with the brute-force argmin") {
    // deterministic pseudo-random data incl. duplicate timestamps
    val left = (1 to 120).map { i =>
      (1000L + i, s"u${i % 7}", ((i * 37) % 50).toLong)
    }
    val right = (1 to 80).map { i =>
      (2000L + i, s"u${i % 9}", ((i * 53 + 11) % 50).toLong, i * 1.5)
    }
    val got = TimeSeries.nearestJoin(
      left.toDF("event_id", "user_id", "ts_us"),
      right.toDF("event_id", "user_id", "ts_us", "value"),
      "user_id", "ts_us", "event_id", "event_id",
      Seq("event_id", "value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // brute force with the contract's tie rules: min |dt|, then
    // earlier ts, then GREATEST right id
    val byKey = right.groupBy(_._2)
    val want = left.map { case (lid, k, lts) =>
      val cands = byKey.getOrElse(k, Seq.empty)
      lid -> (if (cands.isEmpty) -1L
        else cands.minBy(c =>
          (math.abs(c._3 - lts), c._3, -c._1))._1)
    }.toMap
    assert(got == want)
  }

  test("linearTrend: hand-computed slope/R², zero-variance guard, partition-stable") {
    // up: y = 2x exactly (scaled slope 2*10000), r2 = 1
    // down: y = 4 - 2x, r2 = 1; flat time (den = 0) -> 0/0 guards
    val df = Seq(
      ("up", 0L, 0.0), ("up", 1L, 2.0), ("up", 2L, 4.0),
      ("down", 0L, 4.0), ("down", 1L, 2.0), ("down", 2L, 0.0),
      ("flat", 5L, 1.0), ("flat", 5L, 9.0))
      .toDF("k", "ts_us", "value")
    val r = TimeSeries.linearTrend(df, "k", "ts_us", "value", bucketUs = 1L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r("up") == ((3L, 20000.0, 1.0)))
    assert(r("down") == ((3L, -20000.0, 1.0)))
    assert(r("flat") == ((2L, 0.0, 0.0)))
    // exact integer moments: identical on any partitioning
    val a = TimeSeries.linearTrend(df.repartition(1), "k", "ts_us", "value",
      bucketUs = 1L).orderBy("k").collect().map(_.toSeq).toSeq
    val b = TimeSeries.linearTrend(df.repartition(7), "k", "ts_us", "value",
      bucketUs = 1L).orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ns(min: Long): Long = min * 60L * 1000000000L

  private lazy val events = Seq(
    // (event_id, ts_ns, user_id, event_type, value)
    (1L, ns(5), 1L, "click", 1.0),
    (2L, ns(20), 1L, "click", 2.0),
    (3L, ns(65), 1L, "view", 3.0),
    (4L, ns(70), 2L, "click", 4.0),
    (5L, ns(140), 1L, "click", 5.0),  // >30min gap for user 1 after 70
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumbling windows bucket by hour with counts and sums") {
    val r = EventStreams.tumbling(EventStreams.withEventTime(events))
      .collect().map(x => (x.getLong(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(
      (0L, "click") -> (2L, 3.0),
      (3600L, "view") -> (1L, 3.0),
      (3600L, "click") -> (1L, 4.0),
      (7200L, "click") -> (1L, 5.0)))
  }

  test("sliding windows cover each event twice") {
    val r = EventStreams.sliding(EventStreams.withEventTime(events))
    assert(r.agg(sum("n")).head().getLong(0) == 2 * events.count())
  }

  test("sessionization splits on >30min gaps per user") {
    val r = EventStreams.sessionCounts(EventStreams.withEventTime(events))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // user 1: events at 5,20 | 65 | 140 min -> gaps 45min and 70min -> 3 sessions
    assert(r(1L) == (3L, 4L))
    assert(r(2L) == (1L, 1L))
  }

  test("stateful streaming sessionization matches batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val streamed = EventStreams.streamingSessionCounts(
      EventStreams.withEventTime(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")))
    val q = streamed.writeStream.format("memory")
      .queryName("sessions_test").outputMode("update").start()
    try {
      // batch 1: user 1 events at 5 and 20 min (one session)
      mem.addData((1L, ns(5), 1L, "click", 1.0), (2L, ns(20), 1L, "click", 2.0))
      q.processAllAvailable()
      // batch 2: 65 min (45-min gap -> new session), 140 min (new session);
      // user 2 first event
      mem.addData((3L, ns(65), 1L, "view", 3.0), (5L, ns(140), 1L, "click", 5.0),
        (4L, ns(70), 2L, "click", 4.0))
      q.processAllAvailable()
      val got = spark.sql(
        """select user_id, n_sessions, n_events from (
          |  select *, row_number() over (
          |    partition by user_id order by n_events desc) as rn
          |  from sessions_test) where rn = 1
          |""".stripMargin).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = EventStreams.sessionCounts(EventStreams.withEventTime(events))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == batch) // state carried across micro-batches = batch answer
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val streamed = EventStreams.dedupWithinWatermark(
      EventStreams.withEventTime(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")))
    val q = streamed.writeStream.format("memory")
      .queryName("dedup_test").outputMode("append").start()
    try {
      mem.addData((1L, ns(5), 1L, "click", 1.0), (2L, ns(6), 1L, "view", 2.0))
      q.processAllAvailable()
      // re-delivery of id 1 in a later micro-batch, within the watermark
      mem.addData((1L, ns(5), 1L, "click", 1.0), (3L, ns(7), 2L, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.sql("select event_id from dedup_test").collect()
        .map(_.getLong(0)).toSeq
      assert(ids.sorted === Seq(1L, 2L, 3L)) // id 1 exactly once
      // batch twin gives the same distinct set
      val batch = EventStreams.dedupWithinWatermark(
        EventStreams.withEventTime(Seq(
          (1L, ns(5), 1L, "click", 1.0), (2L, ns(6), 1L, "view", 2.0),
          (1L, ns(5), 1L, "click", 1.0), (3L, ns(7), 2L, "click", 3.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")))
      assert(batch.select("event_id").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("attribution join runs stream-stream with watermarks, matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long, String, Double)]
    val purchases = MemoryStream[(Long, Long, Long, String, Double)]
    def prep(df: org.apache.spark.sql.DataFrame) =
      EventStreams.withEventTime(
        df.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .withWatermark("event_time", "2 hours")
    val joined = EventStreams.attributionJoin(
      prep(clicks.toDF()), prep(purchases.toDF()), withinSec = 3600)
    val q = joined.writeStream.format("memory")
      .queryName("attr_test").outputMode("append").start()
    try {
      // user 1 clicks at 5 and 20 min; user 2 clicks at 10 min
      clicks.addData((1L, ns(5), 1L, "click", 0.0),
        (2L, ns(20), 1L, "click", 0.0), (3L, ns(10), 2L, "click", 0.0))
      q.processAllAvailable()
      // purchases arrive in a LATER micro-batch: user 1 at 30 min
      // (attributes to both clicks), user 2 at 100 min (> 1 h after its
      // click -> no match), user 3 with no click at all
      purchases.addData((10L, ns(30), 1L, "purchase", 9.0),
        (11L, ns(100), 2L, "purchase", 9.0), (12L, ns(30), 3L, "purchase", 9.0))
      q.processAllAvailable()
      // both watermarks must advance past the join range before Spark
      // emits (append mode waits for correctness) — push time forward
      clicks.addData((4L, ns(400), 9L, "click", 0.0))
      purchases.addData((13L, ns(400), 9L, "purchase", 9.0))
      q.processAllAvailable()
      clicks.addData((5L, ns(900), 9L, "click", 0.0))
      purchases.addData((14L, ns(900), 9L, "purchase", 9.0))
      q.processAllAvailable()
      val got = spark.sql(
        "select click_id, purchase_id from attr_test where user_id < 9")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 10L)))
      // batch twin over the union of both inputs agrees
      val all = Seq(
        (1L, ns(5), 1L, "click", 0.0), (2L, ns(20), 1L, "click", 0.0),
        (3L, ns(10), 2L, "click", 0.0), (10L, ns(30), 1L, "purchase", 9.0),
        (11L, ns(100), 2L, "purchase", 9.0), (12L, ns(30), 3L, "purchase", 9.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val ev = EventStreams.withEventTime(all)
      val batch = EventStreams.attributionJoin(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"))
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("the same transform runs on a stream with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val streamed = EventStreams.tumbling(
      EventStreams.withEventTime(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
        .withWatermark("event_time", "2 hours"))
    val q = streamed.writeStream.format("memory")
      .queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData((1L, ns(5), 1L, "click", 1.0), (2L, ns(20), 1L, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from tumbling_test").collect()
      assert(rows.map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet ==
        Set((0L, "click", 2L)))
    } finally q.stop()
  }

  private def us(min: Long): Long = min * 60L * 1000000L

  test("funnelSteps: greedy in-order matching, out-of-order steps don't count") {
    val ev = Seq(
      // user 1 completes view -> click -> purchase
      (1L, us(1), 1L, "view"), (2L, us(2), 1L, "click"), (3L, us(3), 1L, "purchase"),
      // user 2: purchase BEFORE the view/click — only 2 steps count
      (4L, us(1), 2L, "purchase"), (5L, us(2), 2L, "view"), (6L, us(3), 2L, "click"),
      // user 3: view only
      (7L, us(1), 3L, "view"),
      // user 4: no funnel step types at all
      (8L, us(1), 4L, "signup"),
    ).toDF("event_id", "ts_us", "user_id", "event_type")
    val r = EventStreams.funnelSteps(ev).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("streaming funnel walk across micro-batches matches the batch walk") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val streamed = EventStreams.streamingFunnelSteps(
      mem.toDF().toDF("event_id", "ts_us", "user_id", "event_type"))
    val q = streamed.writeStream.format("memory")
      .queryName("funnel_test").outputMode("update").start()
    try {
      // batch 1: user 1 view+click; user 2 click only (stage stays 0)
      mem.addData((1L, us(1), 1L, "view"), (2L, us(2), 1L, "click"),
        (3L, us(1), 2L, "click"))
      q.processAllAvailable()
      // batch 2: user 1 purchase completes; user 2 view then (late, BEFORE
      // the view) a click that must NOT advance the walk
      mem.addData((4L, us(3), 1L, "purchase"), (5L, us(5), 2L, "view"),
        (6L, us(4), 2L, "click"))
      q.processAllAvailable()
      // batch 3: user 2's click after its view -> stage 2
      mem.addData((7L, us(6), 2L, "click"))
      q.processAllAvailable()
      val got = spark.sql(
        """select user_id, steps_completed from (
          |  select *, row_number() over (
          |    partition by user_id order by steps_completed desc) as rn
          |  from funnel_test) where rn = 1""".stripMargin).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchEv = Seq(
        (1L, us(1), 1L, "view"), (2L, us(2), 1L, "click"), (3L, us(1), 2L, "click"),
        (4L, us(3), 1L, "purchase"), (5L, us(5), 2L, "view"), (6L, us(4), 2L, "click"),
        (7L, us(6), 2L, "click"),
      ).toDF("event_id", "ts_us", "user_id", "event_type")
      val batch = EventStreams.funnelSteps(batchEv).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch)
      assert(batch == Map(1L -> 3L, 2L -> 2L))
    } finally q.stop()
  }

  test("transformWithState funnel (RocksDB state store) matches the batch walk") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.streamingFunnelStepsTws(
        mem.toDF().toDF("event_id", "ts_us", "user_id", "event_type"))
      .writeStream.format("memory")
      .queryName("funnel_tws_test").outputMode("update").start()
    try {
      mem.addData((1L, us(1), 1L, "view"), (2L, us(2), 1L, "click"),
        (3L, us(1), 2L, "click"))
      q.processAllAvailable()
      mem.addData((4L, us(3), 1L, "purchase"), (5L, us(5), 2L, "view"),
        (6L, us(4), 2L, "click"))
      q.processAllAvailable()
      mem.addData((7L, us(6), 2L, "click"))
      q.processAllAvailable()
      val got = spark.sql(
        """select user_id, steps_completed from (
          |  select *, row_number() over (
          |    partition by user_id order by steps_completed desc) as rn
          |  from funnel_tws_test) where rn = 1""".stripMargin).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 3L, 2L -> 2L)) // same as the fMGWS/batch walk
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}

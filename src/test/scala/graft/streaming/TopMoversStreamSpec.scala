package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The top-movers rollup as a STREAMING aggregation: the integer-cents
  * counters of `EventStreams.periodCents` are mergeable, so streaming
  * aggregation state updates them incrementally across micro-batches —
  * the live-counter form of the batch `events_top_movers` entry. Pins
  * stream ≡ batch after arbitrary micro-batch splits, including the
  * lag/rank head derived from the final rollup.
  */
class TopMoversStreamSpec extends SparkSpec {
  import spark.implicits._

  // (event_type, ts_us, value): two types over three weeks, one spike
  private val wk = 604800000000L
  private val rows = Seq(
    ("a", 0L * wk, 1.00), ("a", 0L * wk + 5L, 2.50),
    ("a", 1L * wk, 10.00), ("a", 2L * wk, 3.00),
    ("b", 0L * wk, 4.00), ("b", 1L * wk, 4.00),
    ("b", 2L * wk, 40.00), ("b", 2L * wk + 9L, 0.25))

  test("streaming period cents across micro-batches equal batch; movers head matches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val streamed = EventStreams.periodCents(
      mem.toDF().toDF("event_type", "ts_us", "value"),
      keyCol = "event_type", tsUsCol = "ts_us", valCol = "value")
    val q = streamed.writeStream.format("memory")
      .queryName("movers_test").outputMode("complete").start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(3, 6): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(6): _*)
      q.processAllAvailable()
      val live = spark.sql("select * from movers_test")
      val batchRollup = EventStreams.periodCents(
        rows.toDF("event_type", "ts_us", "value"),
        keyCol = "event_type", tsUsCol = "ts_us", valCol = "value")
      val a = live.orderBy("key", "period").collect().map(_.toSeq).toSeq
      val b = batchRollup.orderBy("key", "period").collect()
        .map(_.toSeq).toSeq
      assert(a == b)
      // the movers head over the live rollup = the batch entry head
      val liveHead = EventStreams.topMovers(live, k = 5)
        .collect().map(_.toSeq).toSeq
      val batchHead = EventStreams.topMovers(batchRollup, k = 5)
        .collect().map(_.toSeq).toSeq
      assert(liveHead == batchHead)
      // sanity on the fixture: b's week-2 spike ranks first
      assert(liveHead.head.take(2) == Seq("b", 2L))
    } finally q.stop()
  }
}

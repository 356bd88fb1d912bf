package graft.streaming

import graft.SparkSpec
import graft.pipeline.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The linear-trend moment sums as a STREAMING aggregation: the exact
  * 128-bit counters of `TimeSeries.momentSums` are mergeable, so
  * Structured Streaming's aggregation state updates them incrementally
  * across micro-batches — the live-counter form of the batch
  * `events_linear_trend` entry. This spec pins stream ≡ batch after
  * arbitrary micro-batch splits, including the slope derived from the
  * final counters.
  */
class TrendStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (k, ts_us, value): "up" is y = 2x exactly, "noisy" mixes
    ("up", 0L, 0.0), ("up", 1L, 2.0), ("up", 2L, 4.0),
    ("noisy", 0L, 5.0), ("noisy", 1L, 1.0), ("noisy", 2L, 9.0),
    ("noisy", 3L, 2.0))

  test("streaming moment sums across micro-batches equal the batch counters") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val streamed = TimeSeries.momentSums(
      mem.toDF().toDF("k", "ts_us", "value"),
      keyCol = "k", tsUsCol = "ts_us", valCol = "value", bucketUs = 1L)
    val q = streamed.writeStream.format("memory")
      .queryName("trend_test").outputMode("complete").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(2, 5): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(5): _*)
      q.processAllAvailable()
      val got = spark.sql("select * from trend_test").collect()
        .map(r => r.getString(0) -> r.toSeq.tail).toMap
      val batch = TimeSeries.momentSums(rows.toDF("k", "ts_us", "value"),
          "k", "ts_us", "value", bucketUs = 1L)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(got == batch)
      // the closed form over the live counters matches batch linearTrend
      val slopeBatch = TimeSeries.linearTrend(
          rows.toDF("k", "ts_us", "value"), "k", "ts_us", "value",
          bucketUs = 1L)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(slopeBatch("up") == 20000.0) // sanity: exact 2x · valScale
      // got("up") = (n, sx, sy, sxy, sxx, syy)
      val n = BigDecimal(got("up").head.toString)
      val Seq(sx, sy, sxy, sxx, _) =
        got("up").tail.map(v => BigDecimal(v.toString)).toSeq
      val slopeLive = (n * sxy - sx * sy).toDouble /
        (n * sxx - sx * sx).toDouble
      assert(math.abs(slopeLive - slopeBatch("up")) < 1e-6)
    } finally q.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The retention activity dedup as a STREAMING dropDuplicates: distinct
  * (user, hour) state is mergeable, so the streaming dedup accumulates
  * it incrementally across micro-batches — the live form of the batch
  * `events_retention` entry. Pins stream ≡ batch after arbitrary
  * micro-batch splits, including the cohort matrix derived from the
  * final activity table. Duplicate activity rows are deliberately
  * split ACROSS batches so cross-batch dedup state is exercised.
  */
class RetentionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val hr = 3600000000L
  // (user_id, ts_us): u1 cohort hour 0 active hours {0,1,3};
  // u2 cohort hour 1 active {1,2}; u3 cohort 0 active {0} — with
  // duplicates of (u1, hour 0) and (u2, hour 1) in different batches
  private val rows = Seq(
    ("u1", 0L * hr + 5L), ("u3", 0L * hr + 9L), ("u1", 0L * hr + 99L),
    ("u2", 1L * hr + 1L), ("u1", 1L * hr),
    ("u1", 0L * hr + 7L), // duplicate hour for u1, later batch
    ("u2", 2L * hr), ("u2", 1L * hr + 50L), ("u1", 3L * hr))

  test("streaming activity dedup across micro-batches equals batch; matrix matches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val streamed = EventStreams.userHourActivity(
      mem.toDF().toDF("user_id", "ts_us"))
    val q = streamed.writeStream.format("memory")
      .queryName("retention_test").outputMode("append").start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(3, 6): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(6): _*)
      q.processAllAvailable()
      val live = spark.sql("select * from retention_test")
      val batchAct = EventStreams.userHourActivity(
        rows.toDF("user_id", "ts_us"))
      val a = live.orderBy("user_id", "hr").collect().map(_.toSeq).toSeq
      val b = batchAct.orderBy("user_id", "hr").collect().map(_.toSeq).toSeq
      assert(a == b)
      // the matrix over the live activity = the batch entry matrix
      val liveM = EventStreams.retentionMatrix(live)
        .orderBy("cohort", "period").collect().map(_.toSeq).toSeq
      val batchM = EventStreams.retentionMatrix(batchAct)
        .orderBy("cohort", "period").collect().map(_.toSeq).toSeq
      assert(liveM == batchM)
      // hand-checked matrix: cohort 0 = {u1,u3}: p0 -> 2 users,
      // p1 -> 1 (u1), p3 -> 1 (u1); cohort 1 = {u2}: p0 -> 1, p1 -> 1
      assert(liveM == Seq(
        Seq(0L, 0L, 2L), Seq(0L, 1L, 1L), Seq(0L, 3L, 1L),
        Seq(1L, 0L, 1L), Seq(1L, 1L, 1L)))
    } finally q.stop()
  }
}

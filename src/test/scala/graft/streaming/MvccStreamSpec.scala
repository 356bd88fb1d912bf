package graft.streaming

import graft.SparkSpec
import graft.core.Schemas
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class MvccStreamSpec extends SparkSpec {
  import spark.implicits._

  // (src, dst, edge_type, sequence, is_deleted) versions, delivered
  // across micro-batches with an out-of-order late arrival
  private val b1 = Seq(
    ("x", "y", "t", 1L, false),
    ("x", "z", "t", 2L, false))
  private val b2 = Seq(
    ("x", "y", "t", 5L, true),    // tombstone shadows seq 1
    ("y", "z", "t", 6L, false))
  private val b3 = Seq(
    ("x", "y", "t", 3L, false),   // LATE, lower than the state's 5 ->
                                  // must NOT resurrect the edge
    ("x", "z", "t", 7L, false))   // rewrite wins

  test("streaming current view folds versions by sequence, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String, Long, Boolean)]
    val out = MvccStream.currentViewKeyedDf(
      mem.toDF().toDF("src", "dst", "edge_type", "sequence", "is_deleted"))
    val q = out.writeStream.format("memory")
      .queryName("mvcc_stream_test").outputMode("update").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      // memory sink in update mode appends each emission; the LAST
      // emission per key is the maintained winner
      val emissions = spark.table("mvcc_stream_test")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getBoolean(4)))
      val last = emissions.zipWithIndex
        .groupBy { case ((s, d, t, _, _), _) => (s, d, t) }
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
      assert(last(("x", "y", "t")) == (("x", "y", "t", 5L, true)))  // tombstone held
      assert(last(("x", "z", "t")) == (("x", "z", "t", 7L, false)))
      assert(last(("y", "z", "t")) == (("y", "z", "t", 6L, false)))

      // the reader's view (drop tombstones) equals the batch window
      // over the union of all delivered versions
      val streamView = last.values.filterNot(_._5)
        .map { case (s, d, t, seq, _) => (s, d, t, seq) }.toSet
      val batchView = Schemas.currentViewKeyed(
          (b1 ++ b2 ++ b3).toDF("src", "dst", "edge_type", "sequence", "is_deleted"),
          Seq("src", "dst", "edge_type"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(streamView == batchView)
    } finally q.stop()
  }
}

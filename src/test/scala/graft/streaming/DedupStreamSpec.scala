package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // near-dup trio (one word changed) + two distinct docs; long enough
  // that 3-shingles exist and the dups share most bands
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy cat again and again"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "completely different text about spark structured streaming state"),
    (5L, "yet another unrelated document mentioning parquet and shuffles"),
  )

  test("streaming band collisions match the batch view under id-ordered arrival") {
    val batch = Dedup.bandCollisions(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // doc 3 is an exact dup of doc 1 -> must collide in EVERY band;
    // doc 2 is a near-dup -> collides in at least one band
    assert(batch.count { case (d, o, _) => d == 3L && o == 1L } == 4)
    assert(batch.exists { case (d, o, _) => d == 2L && o == 1L })
    assert(!batch.exists { case (d, _, _) => d == 4L || d == 5L })

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = DedupStream.bandCollisions(
      mem.toDF().toDF("doc_id", "text"))
    val q = streamed.writeStream.format("memory")
      .queryName("dedup_stream_test").outputMode("append").start()
    try {
      // id-ordered arrival across three micro-batches: claimed buckets
      // persist in state between batches
      mem.addData(docs(0), docs(1))
      q.processAllAvailable()
      mem.addData(docs(2), docs(3))
      q.processAllAvailable()
      mem.addData(docs(4))
      q.processAllAvailable()
      val got = spark.table("dedup_stream_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("within one micro-batch the bucket claimant is the batch-minimum id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = DedupStream.bandCollisions(
      mem.toDF().toDF("doc_id", "text"))
    val q = streamed.writeStream.format("memory")
      .queryName("dedup_stream_single").outputMode("append").start()
    try {
      // exact dups arriving in ONE batch out of id order: winner must
      // still be the minimum id (deterministic replay), not arrival
      mem.addData(docs(2), docs(0))
      q.processAllAvailable()
      val got = spark.table("dedup_stream_single")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 1L)))
    } finally q.stop()
  }
}

package graft.ingest

import graft.SparkSpec
import graft.core.{Mvcc, Schemas}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous ingestion end-to-end: the streaming directory source
  * feeding the MVCC write path via foreachBatch — the production shape
  * of the reference's sync-on-change loop (each micro-batch is one
  * write epoch) — must converge to the same current view as a one-shot
  * batch ingest of the final tree, and a re-delivered micro-batch
  * (at-least-once delivery) must leave the view unchanged.
  */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def viewKey(df: DataFrame) =
    Schemas.currentView(df)
      .select("id", "workspace", "unit_type", "unit_id", "file_path",
        "source_uri", "content")
      .collect().map(_.toSeq).toSet

  test("streaming ingest through MVCC epochs converges to the batch view; re-delivery is view-idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft-si").toFile
    def write(name: String, content: String): Unit =
      java.nio.file.Files.write(new java.io.File(root, name).toPath,
        content.getBytes("UTF-8"))
    write("first.zig", "fn first() {\n  second()\n}\n")

    // empty versioned table with the block schema
    val empty = Ingest.unitsToBlocks(
      Ingest.parseFiles(spark.emptyDataset[Ingest.FileDoc], SimpleParser), "ws")
    var state: DataFrame = empty
    var firstBatch: Option[DataFrame] = None

    val stream = Ingest.unitsToBlocks(
      Ingest.parseFiles(
        Ingest.readStreamDirectory(spark, root.getAbsolutePath,
          include = Seq("**/*.zig")), SimpleParser), "ws")
      .drop("sequence", "is_deleted")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // each micro-batch = one MVCC write epoch; the batch frame is
        // only valid inside this callback, so materialize the new state
        val b = batch.localCheckpoint(true)
        if (firstBatch.isEmpty && b.count() > 0) firstBatch = Some(b)
        state = Mvcc.putBlocks(state, b).localCheckpoint(true)
        ()
      }.start()
    try {
      q.processAllAvailable()
      write("second.zig", "fn second() {\n}\nconst LIMIT = 3\n")
      q.processAllAvailable()
    } finally q.stop()

    // one-shot batch ingest of the final tree through the same write path
    val batchBlocks = Ingest.unitsToBlocks(
      Ingest.parseFiles(
        Ingest.readDirectory(spark, root.getAbsolutePath,
          include = Seq("**/*.zig")), SimpleParser), "ws")
      .drop("sequence", "is_deleted")
    val batchState = Mvcc.putBlocks(empty, batchBlocks)

    assert(viewKey(state).nonEmpty)
    assert(viewKey(state) == viewKey(batchState))

    // at-least-once repair: re-deliver the first micro-batch; the new
    // epoch shadows identical content, so the current view is unchanged
    val redelivered = Mvcc.putBlocks(state, firstBatch.get)
    assert(viewKey(redelivered) == viewKey(state))
    // but history grew: the re-delivered rows are real new versions
    assert(redelivered.count() == state.count() + firstBatch.get.count())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MVCC: maintain the latest-sequence-wins current view of a
  * versioned edge stream continuously — the streaming twin of
  * [[graft.core.Schemas.currentViewKeyed]] and the Spark re-expression
  * of the reference engine's write path (memtable absorbs versions as
  * they arrive; readers always see the highest sequence, tombstones
  * shadow — `src/storage/engine.zig:927-1005`).
  *
  * The state per (src, dst, edge_type) key is ONE (sequence,
  * is_deleted) pair — constant-size per live key, hash-partitioned by
  * the state store exactly like the batch view's window partitioning.
  * Crucially the winner is decided by SEQUENCE COMPARE, not arrival
  * order: a version that arrives late (lower sequence than the state)
  * is absorbed silently, exactly like an LSM compaction folding an
  * older SSTable under a newer memtable — MvccStreamSpec pins this
  * out-of-order case against the batch view.
  */
object MvccStream {

  /** One version of an edge arriving on the stream. */
  final case class EdgeVersion(src: String, dst: String, edgeType: String,
                               sequence: Long, isDeleted: Boolean)

  /** The current winning version of a key after a batch touched it. */
  final case class EdgeCurrent(src: String, dst: String, edgeType: String,
                               sequence: Long, isDeleted: Boolean)

  /** Update-mode current view: for every key touched by a micro-batch,
    * emit the key's winning version after folding the batch in (the
    * tombstone winner IS emitted with isDeleted=true — a downstream
    * sink needs the retraction; filter it for the reader's view, as
    * the spec does when comparing against the batch window).
    */
  def currentViewKeyed(versions: Dataset[EdgeVersion]): Dataset[EdgeCurrent] = {
    val spark = versions.sparkSession
    import spark.implicits._
    versions.groupByKey(v => (v.src, v.dst, v.edgeType))
      .flatMapGroupsWithState[(Long, Boolean), EdgeCurrent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((src, dst, et), rows,
              state: GroupState[(Long, Boolean)]) =>
          // batch winner: highest sequence in this batch; fold against
          // the state's winner by the same compare
          val batchWin = rows.maxBy(_.sequence)
          val win = state.getOption match {
            case Some((seq, del)) if seq >= batchWin.sequence => (seq, del)
            case _ => (batchWin.sequence, batchWin.isDeleted)
          }
          state.update(win)
          Iterator.single(EdgeCurrent(src, dst, et, win._1, win._2))
      }
  }

  /** Column-level entry point for a streaming DataFrame with the
    * versioned-edge schema (src, dst, edge_type, sequence, is_deleted).
    */
  def currentViewKeyedDf(stream: DataFrame): Dataset[EdgeCurrent] = {
    val spark = stream.sparkSession
    import spark.implicits._
    currentViewKeyed(stream.select(
      col("src"), col("dst"), col("edge_type").as("edgeType"),
      col("sequence"), col("is_deleted").as("isDeleted"))
      .as[EdgeVersion])
  }
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write path: the Spark re-expression of the reference's mutation
  * operators — `put_block` (sequence assignment + append,
  * `src/storage/engine.zig:644-773`), `delete_block` (tombstone append,
  * `:1132-1175`), `put_edge` (`:1177-1252`).
  *
  * The reference assigns sequences from a single global counter, which a
  * distributed engine cannot (and should not) have. The scale-safe
  * replacement is an *epoch* per write batch: every row in a batch gets
  * `sequence = max(existing) + rank-within-batch`, where the within-batch
  * rank is a deterministic order (by id). One `max` aggregation (a
  * 1-row broadcast) per batch — no coordination, reproducible, and
  * latest-sequence-wins semantics are preserved exactly.
  *
  * Everything here is append-only: mutations never rewrite existing data,
  * matching both the reference's LSM model and the Parquet-at-scale model
  * (appends land as new files; the MVCC view [[Schemas.currentView]]
  * resolves precedence at read time; compaction is an offline OPTIMIZE).
  */
object Mvcc {

  /** Append-with-sequence: `puts` must have the same columns as
    * `existing` except `sequence` (assigned here) and the tombstone flag
    * (set false). Within-batch order is by `id` — deterministic across
    * reruns and cluster layouts.
    */
  def putBlocks(existing: DataFrame, puts: DataFrame,
                idCol: String = "id", seqCol: String = "sequence",
                deletedCol: String = "is_deleted"): DataFrame = {
    val maxSeq = existing.agg(coalesce(max(col(seqCol)), lit(0L)).as("m"))
    val w = Window.orderBy(col(idCol)) // batch is small; single-partition rank is fine
    val sequenced = puts
      .crossJoin(broadcast(maxSeq))
      .withColumn(seqCol, col("m") + row_number().over(w))
      .drop("m")
      .withColumn(deletedCol, lit(false))
    existing.unionByName(sequenced.select(existing.columns.map(col).toSeq: _*))
  }

  /** Tombstone delete: appends a shadowing row per id at the next
    * sequence epoch. Non-key columns are NULL — the tombstone only needs
    * (id, sequence, is_deleted), exactly like the reference's 24-byte
    * tombstone record; the MVCC view never surfaces them.
    */
  def deleteBlocks(existing: DataFrame, ids: Seq[String],
                   idCol: String = "id", seqCol: String = "sequence",
                   deletedCol: String = "is_deleted"): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    val maxSeq = existing.agg(coalesce(max(col(seqCol)), lit(0L)).as("m"))
    val w = Window.orderBy(col(idCol))
    val base = ids.toDF(idCol)
      .crossJoin(broadcast(maxSeq))
      .withColumn(seqCol, col("m") + row_number().over(w))
      .drop("m")
      .withColumn(deletedCol, lit(true))
    val tombstones = existing.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(existing.schema(c).dataType))
    }
    existing.unionByName(tombstones.select(existing.columns.map(col).toSeq: _*))
  }

  /** Edge insert with the dedup the reference's bidirectional edge index
    * performs on put (`graph_edge_index.zig:111-144`): an identical
    * (src, dst, edge_type) is stored once.
    */
  def putEdges(existing: DataFrame, puts: DataFrame): DataFrame =
    existing.unionByName(puts.select(existing.columns.map(col).toSeq: _*))
      .dropDuplicates("src", "dst", "edge_type")
}

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

  /** Global dense rank by `idCol` (1-based, added as `__rk`) WITHOUT a
    * single-task global sort: range-repartition by id (partition p holds
    * ids below partition p+1), local row_number within each partition in
    * parallel, then add per-partition cumulative offsets (N≈32 counts —
    * metadata, not data — collected to the driver and broadcast back).
    * Two jobs, every stage parallel: the shape that survives a 100-TB
    * ingest epoch where `Window.orderBy(id)` (no partitionBy) would
    * funnel the whole batch through one task. The assignment is
    * IDENTICAL to the global window's: rank in id order.
    */
  private def withIdRank(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // METADATA-SIZED batches (a driver-built LocalRelation: registry
    // link/unlink rows, a CLI mutation, a unit test) skip the
    // distributed dance entirely — a global window over a few local
    // rows is one task and ZERO extra jobs, where the range-partition +
    // counts-collect path costs two jobs of pure scheduling latency per
    // put. The assignment is identical (same (id, content-hash) total
    // order); real ingest batches arrive as distributed plans and take
    // the ranked path below.
    val localRows = df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(lr.data.length)
      case _ => None
    }
    if (localRows.exists(_ <= 10000)) {
      val w = Window.orderBy(col(idCol),
        xxhash64(df.columns.map(col).toSeq: _*))
      return df.withColumn("__rk",
        row_number().over(w).cast("long"))
    }
    val n = spark.sessionState.conf.numShufflePartitions max 1
    // localCheckpoint freezes the range partitioning so the counts job
    // and the final plan see the same partition ids
    val parted = df.repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toSeq
    val offDf = offsets.toDF("__pid", "__off")
    // content-hash tie-break: a batch holding TWO rows with the same id
    // (e.g. a streaming micro-batch updating a block twice) must rank
    // them the same way on every run/retry — plain orderBy(id) would
    // break the tie by physical scan order. Equal ids land in one range
    // partition, so the within-partition tiebreak is total.
    // CONTRACT: intra-batch same-id ordering is ARBITRARY-BUT-STABLE,
    // not arrival-order — the "latest" version of an id that appears
    // twice in one batch is whichever row hashes larger, deterministic
    // across retries but unrelated to the order the caller built the
    // batch in (a distributed batch HAS no arrival order). Callers that
    // care which version wins must pre-reduce the batch to one row per
    // id before putBlocks (the ingest paths satisfy this by
    // construction: unit ids are file-scoped, so a parse batch never
    // carries two versions of one id).
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col(idCol), xxhash64(df.columns.map(col).toSeq: _*))
    parted.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__rk", col("__off") + row_number().over(w))
      .drop("__pid", "__off")
  }

  /** Append-with-sequence: `puts` must have the same columns as
    * `existing` except `sequence` (assigned here) and the tombstone flag
    * (set false). Within-batch order is by `id` — deterministic across
    * reruns and cluster layouts; assigned distributed via [[withIdRank]]
    * (no single-task stage anywhere on the write path).
    */
  def putBlocks(existing: DataFrame, puts: DataFrame,
                idCol: String = "id", seqCol: String = "sequence",
                deletedCol: String = "is_deleted"): DataFrame = {
    val maxSeq = existing.agg(coalesce(max(col(seqCol)), lit(0L)).as("m"))
    val sequenced = withIdRank(puts, idCol)
      .crossJoin(broadcast(maxSeq))
      .withColumn(seqCol, col("m") + col("__rk"))
      .drop("m", "__rk")
      .withColumn(deletedCol, lit(false))
    graft.query.QueryCache.invalidateSession(existing.sparkSession)
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
    deleteBlocksDf(existing, ids.toDF(idCol), idCol, seqCol, deletedCol)
  }

  /** [[deleteBlocks]] with the id set as a DataFrame — the 100-TB shape:
    * a delete driven by a query (e.g. "every current id this re-link no
    * longer parses") stays distributed end-to-end instead of collecting
    * ids to the driver and shipping them back as literals.
    */
  def deleteBlocksDf(existing: DataFrame, ids: DataFrame,
                     idCol: String = "id", seqCol: String = "sequence",
                     deletedCol: String = "is_deleted"): DataFrame = {
    val maxSeq = existing.agg(coalesce(max(col(seqCol)), lit(0L)).as("m"))
    val base = withIdRank(ids.select(col(idCol)), idCol)
      .crossJoin(broadcast(maxSeq))
      .withColumn(seqCol, col("m") + col("__rk"))
      .drop("m", "__rk")
      .withColumn(deletedCol, lit(true))
    val tombstones = existing.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(existing.schema(c).dataType))
    }
    graft.query.QueryCache.invalidateSession(existing.sparkSession)
    existing.unionByName(tombstones.select(existing.columns.map(col).toSeq: _*))
  }

  /** Edge insert with the dedup the reference's bidirectional edge index
    * performs on put (`graph_edge_index.zig:111-144`): an identical
    * (src, dst, edge_type) is stored once. The reference's index is
    * per-store = per-workspace, so when the edges table carries a
    * `workspace` column it joins the dedup key — two workspaces may
    * legitimately hold the same triple.
    */
  /** Offline compaction — the Parquet OPTIMIZE analogue of the
    * reference's tiered LSM compaction
    * (`/root/reference/src/storage/tiered_compaction.zig`): rewrite the
    * versioned table keeping only each id's LATEST version. Tombstones
    * are KEPT by default — a tombstone must go on shadowing older
    * copies of its id that may live in segments outside this
    * compaction's scope (`tombstone.zig:27-64`) — and dropped only
    * under `full = true`, the reference's rule that tombstone GC is
    * safe only when compaction covers the whole keyspace.
    *
    * Invariants (spec-proven): `currentView(compact(t)) ==
    * currentView(t)`, and as-of reads at/above the compaction horizon
    * are unchanged; history below it is intentionally discarded —
    * that's what compaction is.
    *
    * One shuffle (the per-id window). At 100 TB this runs as a
    * partition-range background job, same shape.
    */
  def compact(versioned: DataFrame, full: Boolean = false,
              idCol: String = "id", seqCol: String = "sequence",
              deletedCol: String = "is_deleted"): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(seqCol).desc)
    val latest = versioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (full) latest.filter(!col(deletedCol)) else latest
  }

  def putEdges(existing: DataFrame, puts: DataFrame): DataFrame = {
    graft.query.QueryCache.invalidateSession(existing.sparkSession)
    val keys = Seq("src", "dst", "edge_type", "workspace")
      .filter(existing.columns.contains)
    existing.unionByName(puts.select(existing.columns.map(col).toSeq: _*))
      .dropDuplicates(keys)
  }
}

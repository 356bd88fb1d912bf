package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core data model: the Spark re-expression of the reference's
  * ContextBlock / GraphEdge / MVCC semantics.
  *
  * Reference (kausaldb): `src/core/types.zig:137-151` (ContextBlock),
  * `:549-625` (GraphEdge), `:107-133` (EdgeType); MVCC latest-sequence-wins
  * with tombstone shadowing per `docs/DESIGN.md:27-33`.
  */
object Schemas {

  /** One stored knowledge unit (graph node). The reference keeps metadata as
    * a JSON blob probed at query time; we promote the keys its ingester
    * actually writes (`src/ingestion/ingest_file.zig:96-105`) to real
    * columns so Parquet stats / dictionary filters apply.
    */
  final case class ContextBlock(
      id: String,          // 32-hex deterministic id (reference: 16-byte BlockId)
      sequence: Long,      // MVCC version, higher shadows lower
      workspace: String,   // reference metadata key "codebase"; partition column
      unitType: String,    // function | type | const | var | import | test | document
      unitId: String,      // "<file_path>:<entity>" or "<file_path>:<Container>:<entity>"
      filePath: String,
      sourceUri: String,   // "file://<path>#L<start>-L<end>"
      content: String,
      isDeleted: Boolean)  // tombstone marker

  /** Typed directed edge (reference `src/core/types.zig:549-561`). */
  final case class Edge(src: String, dst: String, edgeType: String, workspace: String)

  /** Closed edge-type enum, `src/core/types.zig:107-133`. Stored as STRING
    * for Parquet dictionary encoding; validated at ingest.
    */
  val EdgeTypes: Seq[String] = Seq(
    "imports", "defined_in", "references", "contains", "extends", "implements",
    "calls", "depends_on", "method_of", "calls_method", "calls_function")

  /** Deterministic 32-hex block id from (workspace, unitId).
    * The reference uses a global generation counter (`types.zig:70-103`);
    * content-addressing is the distributed-safe replacement — no
    * coordination, reproducible across re-ingests.
    */
  def blockId(workspace: Column, unitId: Column): Column =
    md5(concat_ws("\u0000", workspace, unitId))

  /** MVCC "current view": latest sequence per id wins, tombstones shadow.
    * Reference semantics: memtable-over-SSTable precedence + sequence
    * compare (`src/storage/engine.zig:927-1005`, model-checked at
    * `src/testing/model.zig:546-694`).
    *
    * This is the one load-bearing window function of the core engine. At
    * scale the shuffle on `id` is unavoidable for a heap of unsorted
    * versions, but in practice the blocks table is written
    * partitioned-by-workspace and major-compacted, so AQE coalesces the
    * exchange; readers should persist this view once per job.
    */
  def currentView(versioned: DataFrame,
                  idCol: String = "id",
                  seqCol: String = "sequence",
                  deletedCol: String = "is_deleted"): DataFrame =
    currentViewKeyed(versioned, Seq(idCol), seqCol, deletedCol)

  /** [[currentView]] for composite version keys — the EDGE analogue:
    * the reference dedups edges on (source, target, type)
    * (`src/storage/engine.zig:1209-1247`), so a versioned edge table's
    * current view partitions the window by all three. Same
    * latest-sequence-wins + tombstone-shadow semantics, same single
    * shuffle on the key columns.
    */
  def currentViewKeyed(versioned: DataFrame, keyCols: Seq[String],
                       seqCol: String = "sequence",
                       deletedCol: String = "is_deleted"): DataFrame = {
    require(keyCols.nonEmpty, "currentViewKeyed needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    versioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deletedCol))
      .drop("__rn")
  }

  /** Time-travel [[currentViewKeyed]]: the composite-key current view
    * AS OF a sequence horizon (pushed-down range filter before the
    * window, like [[currentViewAsOf]]).
    */
  def currentViewKeyedAsOf(versioned: DataFrame, seq: Long,
                           keyCols: Seq[String],
                           seqCol: String = "sequence",
                           deletedCol: String = "is_deleted"): DataFrame =
    currentViewKeyed(versioned.filter(col(seqCol) <= seq), keyCols,
      seqCol, deletedCol)

  /** Change-data view between two sequence horizons — what a consumer
    * that last read at `seqLo` must apply to catch up to `seqHi`
    * (the CDC shape: Delta Lake's table_changes / the reference's
    * WAL-replay delta between two read snapshots). Per key present in
    * either horizon's current view: `added` (visible only at hi),
    * `removed` (visible only at lo — a tombstone or shadowing write
    * landed in between), `updated` (visible in both with a different
    * winning sequence). Unchanged keys are dropped — the output is
    * delta-sized, never snapshot-sized.
    *
    * Scale shape: the two horizon views share one scan (the hi-horizon
    * range filter is pushed down; lo's view is a second window over
    * the SAME shuffled layout — Catalyst reuses the exchange since
    * both windows partition by the key columns), then ONE key-keyed
    * full-outer join of two snapshot-sized sides.
    */
  def asOfDiffKeyed(versioned: DataFrame, seqLo: Long, seqHi: Long,
                    keyCols: Seq[String],
                    seqCol: String = "sequence",
                    deletedCol: String = "is_deleted"): DataFrame = {
    require(seqLo <= seqHi, s"asOfDiffKeyed needs seqLo <= seqHi " +
      s"(got $seqLo > $seqHi)")
    val lo = currentViewKeyedAsOf(versioned, seqLo, keyCols, seqCol,
      deletedCol).select((keyCols.map(col) :+
        col(seqCol).as("seq_before")): _*)
    val hi = currentViewKeyedAsOf(versioned, seqHi, keyCols, seqCol,
      deletedCol).select((keyCols.map(col) :+
        col(seqCol).as("seq_after")): _*)
    lo.join(hi, keyCols, "full_outer")
      .withColumn("change",
        when(col("seq_before").isNull, lit("added"))
          .when(col("seq_after").isNull, lit("removed"))
          .when(col("seq_before") =!= col("seq_after"), lit("updated"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
  }

  /** Time-travel read: the current view AS OF a sequence — exactly what
    * the reference's LSM read path computes against any historical
    * sequence horizon (versions above `seq` don't exist yet; tombstones
    * at or below it still shadow). One extra pushed-down range filter
    * before the same window.
    */
  def currentViewAsOf(versioned: DataFrame, seq: Long,
                      idCol: String = "id",
                      seqCol: String = "sequence",
                      deletedCol: String = "is_deleted"): DataFrame =
    currentView(versioned.filter(col(seqCol) <= seq), idCol, seqCol, deletedCol)
}

package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the continuous form of the
  * banded MinHash dedup: documents are deduplicated AS THEY ARRIVE
  * against everything already ingested, instead of re-running the
  * batch pair join over the corpus. This is the shape a training-data
  * ingest runs at 100 TB: the state is one canonical doc id per
  * occupied (band_idx, band_key) bucket — banding's whole point is
  * that this is corpus-bounded and hash-partitioned, never a scan of
  * the corpus — and each arriving doc probes exactly its own `bands`
  * buckets.
  *
  * The batch twin is [[graft.pipeline.Dedup.bandCollisions]] (winner =
  * bucket-minimum doc id). The two agree whenever arrival order is
  * doc-id order (DedupStreamSpec pins this across micro-batches);
  * under arbitrary arrival the streaming winner is first-arrived —
  * exactly the semantics an append-only ingest wants.
  */
object DedupStream {

  /** One occupied LSH bucket probe: `docId` hit (bandIdx, bandKey). */
  final case class BandHit(bandIdx: Int, bandKey: String, docId: Long)

  /** `docId` collided with the bucket claimed by `dupOf` in `bandIdx`. */
  final case class Collision(docId: Long, dupOf: Long, bandIdx: Int)

  /** Per-bucket stateful collision stream: first doc to reach a bucket
    * claims it (no output); every later doc in the bucket emits one
    * (docId, dupOf = claimant, bandIdx) row. Within a micro-batch the
    * claimant of an unclaimed bucket is the batch-minimum doc id, so a
    * replay of the same batches is deterministic, and duplicate docIds
    * WITHIN one micro-batch collapse to a single collision row (`ids`
    * is distinct-ed before emitting). Output caveat, inherent to
    * `flatMapGroupsWithState` + append sinks: a doc REDELIVERED in a
    * later micro-batch (at-least-once sources, restart replay) emits
    * its collision row again — an exactly-once consumer should treat
    * (docId, bandIdx) as the output key, same as every at-least-once
    * streaming contract in this library.
    *
    * `docs` must be a STREAMING DataFrame with `idCol` (LONG) and
    * `textCol`; banding runs map-only on the stream (the fused
    * expression keeps it codegen-friendly), and the only shuffle is
    * the groupByKey on (band_idx, band_key) — the same key the state
    * store is partitioned by.
    */
  def bandCollisions(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     n: Int = 3, k: Int = 16,
                     bands: Int = 4): Dataset[Collision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = Dedup.minhashBands(docs, idCol, textCol, n, k, bands)
    val hits = banded.select(col(idCol).cast("long").as("docId"),
      posexplode(array((0 until bands).map(b => col(s"band$b")): _*))
        .as(Seq("bandIdx", "bandKey")))
      .as[BandHit]
    hits.groupByKey(h => (h.bandIdx, h.bandKey))
      .flatMapGroupsWithState[Long, Collision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bandIdx, _), rows, state: GroupState[Long]) =>
          val ids = rows.map(_.docId).toArray.distinct.sorted
          val winner = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(winner)
          ids.iterator.filter(_ != winner)
            .map(d => Collision(d, winner, bandIdx))
      }
  }
}

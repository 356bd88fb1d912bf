package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY payloads plus a
  * typed metadata struct, with decode / feature-extraction / frame
  * sampling as per-partition batch operators.
  *
  * The actual codec step is a STUB (this container has no image/audio
  * libraries): `decodeFeatures` computes a deterministic fake —
  * per-chunk byte aggregates — behind the same Dataset API a real
  * decoder would use. Everything *around* the stub is real Spark
  * surface: the schema, the binary column handling, the
  * mapPartitions batching (one decoder init per partition, the shape a
  * JNI/FFI codec needs), and the partitioning story (payloads never
  * shuffle — features are extracted before any wide operation).
  */
object Multimodal {

  /** Typed media row: what `spark.read.format("binaryFile")` + a
    * metadata join would produce at ingest.
    */
  final case class MediaRow(doc_id: Long, mime: String, n_bytes: Long,
                            payload: Array[Byte])

  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 n_chunks: Int, checksum: Long,
                                 features: Array[Float])

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (a stand-in for image/audio bytes), mime dispatched
    * deterministically. Mirrors the reference's content-type dispatch at
    * ingest (`src/ingestion/ingest_file.zig:44-49`).
    */
  def toMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      // pmod: `%` follows the dividend's sign, so a negative doc_id
      // would hit element_at(0) (always an error) or index from the end
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** ===== STUB decode =====
    * A real implementation would initialize a codec once per partition
    * (`mapPartitions` — NOT per row) and decode each payload to pixels /
    * samples. The deterministic fake: split the payload into 256-byte
    * chunks and emit per-chunk mean bytes as the "feature vector" plus a
    * simple additive checksum. Batch shape, schema, and per-partition
    * init cost are exactly what the real codec path would have.
    */
  def decodeFeatures(media: DataFrame, chunkSize: Int = 256): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "n_bytes", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "codec init" happens here in a real decoder
        rows.map { r =>
          val chunks = r.payload.grouped(chunkSize).toArray
          val feats = chunks.map(c => c.map(b => (b & 0xff).toFloat).sum / c.length)
          val checksum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
          MediaFeatures(r.doc_id, r.mime, r.n_bytes, chunks.length, checksum, feats)
        }
      }
  }

  /** Frame sampling: every `stride`-th chunk index, as (doc_id,
    * frame_idx, offset) — the explode-shaped half of a video pipeline;
    * the decode of each frame would go through [[decodeFeatures]]'s
    * partition-batched path.
    */
  def frameSample(media: DataFrame, chunkSize: Int = 256, stride: Int = 4): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(col("n_bytes").cast("double") / chunkSize).cast("int"))
      .select(col("doc_id"), col("mime"),
        // zero chunks -> NO frames (explode of an empty array emits no
        // rows), matching decodeFeatures' n_chunks = 0 and the oracle's
        // empty range — not a phantom frame 0 over a payload with no
        // bytes (greatest(-1, 0) would fabricate one)
        explode(when(col("n_chunks") > 0,
          sequence(lit(0), col("n_chunks") - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
      .withColumn("offset", col("frame_idx").cast("long") * chunkSize)
}

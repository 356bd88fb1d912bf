package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: media as opaque BINARY payloads plus
  * typed metadata, with decode / feature-extraction / frame sampling as
  * per-partition batch operators.
  *
  * r6: the decode step is REAL. [[toMedia]] synthesizes genuine
  * containers (canonical PCM WAV, 24-bit BMP with stride padding,
  * binary PPM) from each document's bytes — the deterministic stand-in
  * for an ingest that read image/audio files — and
  * [[decodeFeatures]] parses those containers back with
  * [[MediaCodec]]: RIFF chunk walk, BITMAPINFOHEADER + bottom-up
  * stride rows, P6 header grammar. Dispatch is by CONTENT (magic
  * bytes), mirroring the reference's ingest content-type dispatch
  * (`src/ingestion/ingest_file.zig:44-49`); the mime column is
  * verified against the sniff, not trusted.
  *
  * Scale shape: payload synthesis and decode are both map-only
  * (mapPartitions — one codec init per partition, the batch shape a
  * JNI/FFI codec needs); payloads never shuffle. Features are
  * extracted before any wide operation, so the only thing that ever
  * moves is the small feature schema.
  */
object Multimodal {

  /** Typed media row: what `spark.read.format("binaryFile")` + a
    * metadata join would produce at ingest.
    */
  final case class MediaRow(doc_id: Long, mime: String, n_bytes: Long,
                            payload: Array[Byte])

  /** Decoded per-payload features. For audio: dim1 = sample count,
    * dim2 = sample rate, n_units = sample count, sum_abs = Σ|sample|.
    * For images: dim1 = width, dim2 = height, n_units = channel-byte
    * count (w·h·3), sum_abs = Σ channel bytes. All integer — the
    * oracle replays them exactly; means are rounded downstream.
    */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 dim1: Long, dim2: Long,
                                 n_units: Long, sum_abs: Long)

  /** Image geometry for the synthesized fixtures: 15 px wide so the
    * BMP row stride (45 → 48 bytes) actually exercises padding.
    */
  val ImgWidth = 15
  private val RowBytes = ImgWidth * 3

  private def imgHeight(nBytes: Int): Int =
    math.max(1, (nBytes + RowBytes - 1) / RowBytes)

  private def rgbFromBytes(bytes: Array[Byte]): MediaCodec.RgbImage = {
    val h = imgHeight(bytes.length)
    val rgb = new Array[Byte](ImgWidth * h * 3) // zero-padded tail
    System.arraycopy(bytes, 0, rgb, 0, bytes.length)
    MediaCodec.RgbImage(ImgWidth, h, rgb)
  }

  /** Derive a media table from `documents`: payload = a REAL container
    * built from the text's UTF-8 bytes, mime dispatched
    * deterministically by doc_id. Audio: 16-bit mono 8000 Hz PCM with
    * sample i = (byte_i − 128)·256. Images: bytes laid row-major into a
    * 15-px-wide RGB raster, zero-padded to full rows.
    */
  def toMedia(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (docId, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val payload = (docId % 3) match {
            case 0 => MediaCodec.encodeBmp(rgbFromBytes(bytes))
            case 1 =>
              MediaCodec.encodeWav(bytes.map(b => ((b & 0xff) - 128) * 256))
            case _ => MediaCodec.encodePpm(rgbFromBytes(bytes))
          }
          val mime = (docId % 3) match {
            case 0 => "image/bmp"
            case 1 => "audio/wav"
            case _ => "image/x-portable-pixmap"
          }
          MediaRow(docId, mime, payload.length.toLong, payload)
        }
      }.toDF()
  }

  /** Decode every payload with the real [[MediaCodec]] parsers and
    * emit integer feature aggregates. Dispatch is content-sniffed; a
    * payload whose magic disagrees with its mime column fails loudly
    * (corrupt ingest should never pass silently).
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "n_bytes", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init would happen here (JNI/FFI shape)
        rows.map { r =>
          val kind = MediaCodec.sniff(r.payload).getOrElse(
            throw new IllegalArgumentException(
              s"doc ${r.doc_id}: unrecognized payload magic"))
          require(kind == r.mime,
            s"doc ${r.doc_id}: mime '${r.mime}' but content is '$kind'")
          kind match {
            case "audio/wav" =>
              val wav = MediaCodec.decodeWav(r.payload)
              var sum = 0L
              wav.samples.foreach(s => sum += math.abs(s.toLong))
              MediaFeatures(r.doc_id, r.mime, r.n_bytes,
                wav.samples.length.toLong, wav.sampleRate.toLong,
                wav.samples.length.toLong, sum)
            case _ =>
              val img =
                if (kind == "image/bmp") MediaCodec.decodeBmp(r.payload)
                else MediaCodec.decodePpm(r.payload)
              var sum = 0L
              img.rgb.foreach(b => sum += (b & 0xff).toLong)
              MediaFeatures(r.doc_id, r.mime, r.n_bytes,
                img.width.toLong, img.height.toLong,
                img.rgb.length.toLong, sum)
          }
        }
      }
  }

  /** One active segment of [[audioSegments]]: frame indices are
    * 0-based inclusive; energy is the exact integer Σ|sample| over the
    * segment's frames.
    */
  final case class AudioSegment(doc_id: Long, seg_idx: Long,
                                start_frame: Long, end_frame: Long,
                                n_frames: Long, energy: Long)

  /** Energy-threshold audio segmentation — the VAD-shaped step a
    * speech pipeline runs before transcription/windowing: frame the
    * PCM stream into fixed `frameSize`-sample windows (ragged tail
    * kept), per-frame energy = Σ|sample| (exact integer), mark frames
    * above `threshold` active, and merge consecutive active frames
    * into segments. Segmentation is PER-DOC LOCAL work on the decoded
    * samples — it runs inside the same `mapPartitions` pass as the
    * decode (no Spark window, no shuffle beyond the scan), which is
    * the right shape at 100 TB: a doc's segments never leave its
    * partition. Non-audio docs pass through the sniff and are
    * skipped. All-integer output → hash-exact oracle (the synthetic
    * WAV payload derives from the text bytes, so DuckDB replays
    * decode + framing + islands from `documents` directly).
    */
  def audioSegments(media: DataFrame, frameSize: Int = 40,
                    threshold: Long = 350000L): Dataset[AudioSegment] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(frameSize >= 1, "frameSize must be >= 1")
    media.select("doc_id", "mime", "n_bytes", "payload").as[MediaRow]
      .filter(_.mime == "audio/wav")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val wav = MediaCodec.decodeWav(r.payload)
          val n = wav.samples.length
          val nFrames = (n + frameSize - 1) / frameSize
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
          var segStart = -1L
          var segEnergy = 0L
          var segIdx = 0L
          var f = 0
          while (f < nFrames) {
            var e = 0L
            var i = f * frameSize
            val end = math.min(n, i + frameSize)
            while (i < end) { e += math.abs(wav.samples(i).toLong); i += 1 }
            if (e > threshold) {
              if (segStart < 0) { segStart = f; segEnergy = 0L }
              segEnergy += e
            } else if (segStart >= 0) {
              out += AudioSegment(r.doc_id, segIdx, segStart, f - 1L,
                f - segStart, segEnergy)
              segIdx += 1; segStart = -1L
            }
            f += 1
          }
          if (segStart >= 0)
            out += AudioSegment(r.doc_id, segIdx, segStart, nFrames - 1L,
              nFrames - segStart, segEnergy)
          out
        }
      }
  }

  /** One row of [[resizeFeatures]]: input geometry + integer checksum
    * of the fixed-shape output (sum of resized channel bytes / resampled
    * absolute amplitudes) — all integer, oracle-replayable.
    */
  final case class MediaResize(doc_id: Long, mime: String,
                               in_dim1: Long, in_dim2: Long,
                               out_units: Long, sum_out: Long)

  /** The PREPROCESS step of a multimodal training pipeline: decode with
    * the real [[MediaCodec]] parsers, then normalize every payload to a
    * fixed output shape — images resize to `outW`×`outH` RGB by
    * nearest-neighbor (source pixel (x·w div outW, y·h div outH) — the
    * integer sampling grid every resize kernel starts from), audio
    * resamples to `outW`·`outH` samples by the same nearest index rule.
    * Emits the input geometry and the integer checksum of the resized
    * output rather than the payload itself (the real pipeline writes
    * the tensor; the checksum is what an oracle can verify
    * bit-for-bit). Map-only over the media table — embarrassingly
    * parallel, no shuffle anywhere.
    */
  def resizeFeatures(media: DataFrame, outW: Int = 8,
                     outH: Int = 8): Dataset[MediaResize] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "n_bytes", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = MediaCodec.sniff(r.payload).getOrElse(
            throw new IllegalArgumentException(
              s"doc ${r.doc_id}: unrecognized payload magic"))
          require(kind == r.mime,
            s"doc ${r.doc_id}: mime '${r.mime}' but content is '$kind'")
          kind match {
            case "audio/wav" =>
              val wav = MediaCodec.decodeWav(r.payload)
              val n = wav.samples.length
              val outN = outW * outH
              var sum = 0L
              if (n > 0) {
                var i = 0
                while (i < outN) {
                  sum += math.abs(
                    wav.samples((i.toLong * n / outN).toInt).toLong)
                  i += 1
                }
              }
              MediaResize(r.doc_id, r.mime, n.toLong, wav.sampleRate.toLong,
                outN.toLong, sum)
            case _ =>
              val img =
                if (kind == "image/bmp") MediaCodec.decodeBmp(r.payload)
                else MediaCodec.decodePpm(r.payload)
              var sum = 0L
              var y = 0
              while (y < outH) {
                val sy = (y.toLong * img.height / outH).toInt
                var x = 0
                while (x < outW) {
                  val sx = (x.toLong * img.width / outW).toInt
                  val base = (sy * img.width + sx) * 3
                  sum += (img.rgb(base) & 0xff).toLong
                  sum += (img.rgb(base + 1) & 0xff).toLong
                  sum += (img.rgb(base + 2) & 0xff).toLong
                  x += 1
                }
                y += 1
              }
              MediaResize(r.doc_id, r.mime, img.width.toLong,
                img.height.toLong, (outW * outH * 3).toLong, sum)
          }
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
        // rows) — not a phantom frame 0 over a payload with no bytes
        explode(when(col("n_chunks") > 0,
          sequence(lit(0), col("n_chunks") - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
      .withColumn("offset", col("frame_idx").cast("long") * chunkSize)
}

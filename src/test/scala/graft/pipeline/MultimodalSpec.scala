package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 600, "en", "s", 600L), // bmp: 600 bytes -> h = ceil(600/45) = 14
    (1L, "xyz", "en", "s", 3L),       // wav: 3 samples
    (2L, "b" * 256, "en", "s", 256L), // ppm: h = ceil(256/45) = 6
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("toMedia builds real containers with dispatched mime and true sizes") {
    val m = Multimodal.toMedia(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("mime"), r.getAs[Long]("n_bytes"),
          r.getAs[Array[Byte]]("payload"))).toMap
    assert(m(0L)._1 == "image/bmp")
    assert(m(0L)._2 == 54L + 48L * 14) // 54-byte header + padded rows
    assert(m(1L)._1 == "audio/wav")
    assert(m(1L)._2 == 44L + 2L * 3)
    assert(m(2L)._1 == "image/x-portable-pixmap")
    assert(m(2L)._2 == 11L + 1 + 45L * 6) // "P6\n15 6\n255\n" + data
    // container magics are real
    assert(MediaCodec.sniff(m(0L)._3).contains("image/bmp"))
    assert(MediaCodec.sniff(m(1L)._3).contains("audio/wav"))
    assert(MediaCodec.sniff(m(2L)._3).contains("image/x-portable-pixmap"))
  }

  test("decodeFeatures parses real containers back to exact aggregates") {
    val f = Multimodal.decodeFeatures(Multimodal.toMedia(docs)).collect()
      .map(x => x.doc_id -> x).toMap
    // bmp: 15 wide, 14 rows, sum of channel bytes = 600 * 'a' (pad = 0)
    assert(f(0L).dim1 == 15L && f(0L).dim2 == 14L)
    assert(f(0L).n_units == 15L * 14 * 3)
    assert(f(0L).sum_abs == 600L * 'a'.toLong)
    // wav: 3 samples at 8000 Hz, |(b-128)*256| each
    assert(f(1L).dim1 == 3L && f(1L).dim2 == 8000L)
    assert(f(1L).sum_abs ==
      (math.abs('x' - 128) + math.abs('y' - 128) + math.abs('z' - 128)).toLong * 256)
    // ppm: 15 x 6, sum = 256 * 'b'
    assert(f(2L).dim1 == 15L && f(2L).dim2 == 6L)
    assert(f(2L).sum_abs == 256L * 'b'.toLong)
  }

  test("decodeFeatures rejects a payload whose magic disagrees with its mime") {
    val media = Multimodal.toMedia(docs)
      .withColumn("mime", lit("audio/wav")) // lie about the image rows
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(media).collect()
    }
    assert(e.getMessage.contains("content is") ||
      Option(e.getCause).exists(_.getMessage.contains("content is")))
  }

  test("resizeFeatures: nearest-neighbor grid sums match brute force") {
    val f = Multimodal.resizeFeatures(Multimodal.toMedia(docs))
      .collect().map(x => x.doc_id -> x).toMap
    // bmp doc 0: 15×14 all-'a' pixels except the zero-padded tail;
    // brute-force the same integer grid
    val bytes0 = ("a" * 600).getBytes("UTF-8")
    val h0 = 14
    var want0 = 0L
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
      val idx = ((y * h0 / 8) * 15 + (x * 15 / 8)) * 3 + c
      want0 += (if (idx < bytes0.length) bytes0(idx) & 0xff else 0)
    }
    assert(f(0L).in_dim1 == 15L && f(0L).in_dim2 == 14L)
    assert(f(0L).out_units == 192L && f(0L).sum_out == want0)
    // wav doc 1: 3 samples resampled to 64 by i*3/64 -> indexes 0,0,...,1,...,2
    val s1 = "xyz".getBytes("UTF-8").map(b => ((b & 0xff) - 128) * 256)
    val want1 = (0 until 64).map(i => math.abs(s1(i * 3 / 64).toLong)).sum
    assert(f(1L).in_dim1 == 3L && f(1L).out_units == 64L)
    assert(f(1L).sum_out == want1)
  }

  test("audioSegments: hand-computed islands, tail frame, threshold cut") {
    import spark.implicits._
    // doc 1 (wav): "ab cd" -> amps 7936,7680,24576,7424,7168
    // frames of 2: 15616, 32000, 7168(tail)
    val d = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val m = Multimodal.toMedia(d)
    val lo = Multimodal.audioSegments(m, frameSize = 2, threshold = 10000L)
      .collect().map(s => (s.seg_idx, s.start_frame, s.end_frame,
        s.n_frames, s.energy)).toSeq
    assert(lo == Seq((0L, 0L, 1L, 2L, 47616L)))
    val hi = Multimodal.audioSegments(m, frameSize = 2, threshold = 20000L)
      .collect().map(s => (s.seg_idx, s.start_frame, s.end_frame,
        s.n_frames, s.energy)).toSeq
    assert(hi == Seq((0L, 1L, 1L, 1L, 32000L)))
    // everything below threshold -> no segments
    assert(Multimodal.audioSegments(m, frameSize = 2,
      threshold = 50000L).count() == 0L)
  }

  test("frameSample strides over container chunks") {
    val fr = Multimodal.frameSample(Multimodal.toMedia(docs),
      chunkSize = 256, stride = 2)
      .groupBy("doc_id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("idx").sorted).toMap
    // bmp payload = 54 + 48*14 = 726 bytes -> chunks 0,1,2 -> stride keeps 0,2
    assert(fr(0L) == Seq(0, 2))
    assert(fr(1L) == Seq(0)) // 50-byte wav -> 1 chunk
  }
}

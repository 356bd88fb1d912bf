package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 600, "en", "s", 600L),
    (1L, "xyz", "en", "s", 3L),
    (2L, "b" * 256, "en", "s", 256L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("toMedia produces binary payloads with dispatched mime") {
    val m = Multimodal.toMedia(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("mime"), r.getAs[Long]("n_bytes"))).toMap
    assert(m(0L) == ("image/png", 600L))
    assert(m(1L) == ("audio/wav", 3L))
    assert(m(2L) == ("video/mp4", 256L))
  }

  test("decodeFeatures is deterministic and chunk-correct") {
    val f = Multimodal.decodeFeatures(Multimodal.toMedia(docs)).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(0L).n_chunks == 3)          // 600 bytes / 256
    assert(f(1L).n_chunks == 1)
    assert(f(2L).n_chunks == 1)
    assert(f(1L).checksum == 'x'.toLong + 'y'.toLong + 'z'.toLong)
    assert(f(0L).features.length == 3)
    assert(f(0L).features.forall(_ == 'a'.toFloat))
    val again = Multimodal.decodeFeatures(Multimodal.toMedia(docs)).collect()
      .map(x => x.doc_id -> x.checksum).toMap
    assert(again == f.view.mapValues(_.checksum).toMap)
  }

  test("frameSample strides over chunks") {
    val fr = Multimodal.frameSample(Multimodal.toMedia(docs),
      chunkSize = 256, stride = 2)
      .groupBy("doc_id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("idx").sorted).toMap
    assert(fr(0L) == Seq(0, 2))   // chunks 0,1,2 -> stride 2 keeps 0,2
    assert(fr(1L) == Seq(0))
  }
}

package graft.expressions

import graft.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class DotProductFloatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "v")
  }

  test("vec_dot is bit-identical to the composable left-fold dot") {
    val both = vecs.as("a").crossJoin(vecs.as("b")).limit(500)
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("composed"),
        Similarity.dotNative(col("a.v"), col("b.v")).as("native"))
    assert(both.filter(col("composed") =!= col("native")).isEmpty)
  }

  test("null input yields null") {
    val r = Seq((Array(1.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(Similarity.dotNative(col("a"), col("b")).as("d"))
      .head()
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements return null, like the composable form") {
    // composable semantics: zip_with pads the shorter array with null and
    // a null element nulls the whole fold -> vec_dot must do the same
    val df = Seq(
      ("mismatch", Array(1.0f, 2.0f), Array(1.0f)),
    ).toDF("k", "a", "b")
      .select(col("k"),
        Similarity.dot(col("a"), col("b")).as("composed"),
        Similarity.dotNative(col("a"), col("b")).as("native"))
    val r = df.head()
    assert(r.isNullAt(1) && r.isNullAt(2))

    val withNullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS ARRAY<FLOAT>) AS a, " +
        "CAST(array(1.0, 2.0) AS ARRAY<FLOAT>) AS b")
      .select(Similarity.dot(col("a"), col("b")).as("composed"),
        Similarity.dotNative(col("a"), col("b")).as("native"))
      .head()
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("native top-k equals the composable top-k") {
    val emb = vecs.withColumnRenamed("id", "vec_id")
      .withColumnRenamed("v", "embedding")
    val a = Similarity.bruteForceTopK(emb, 0L, 10).collect().toSeq
    val b = Similarity.bruteForceTopKNative(emb, 0L, 10).collect().toSeq
    assert(a == b)
  }

  test("expression participates in codegen (no fallback errors)") {
    // run through a filter + aggregate to force the codegen path
    val n = vecs.crossJoin(vecs.select(col("v").as("q")).limit(1))
      .filter(Similarity.dotNative(col("v"), col("q")) > lit(-100.0))
      .count()
    assert(n == 50)
  }
}

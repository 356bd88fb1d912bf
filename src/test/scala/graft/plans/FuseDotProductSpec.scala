package graft.plans

import graft.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** The optimizer rule must rewrite the composable float dot-product
  * fold to the codegen vec_dot expression — with identical results
  * including the NULL edge cases — and must leave non-matching folds
  * alone.
  */
class FuseDotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(23)
    (1L to 50L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f),
        Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "a", "b")
      // keep the projection a real stage: over a bare LocalRelation the
      // optimizer constant-folds the whole select away and there is no
      // plan left to inspect (or to execute fused)
      .repartition(2)
  }

  test("composable dot over float arrays plans as vec_dot") {
    val df = vecs.select(Similarity.dot(col("a"), col("b")).as("d"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("vec_dot"), opt)
    assert(!opt.contains("aggregate("), opt)
  }

  test("cosine (three folds) fuses and matches the native path bit-for-bit") {
    val viaRule = vecs.select(col("id"),
      Similarity.cosine(col("a"), col("b")).as("c")).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val native = vecs.select(col("id"),
      Similarity.cosineNative(col("a"), col("b")).as("c")).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(viaRule == native)
  }

  test("null array, null element, and length mismatch still yield NULL") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1f, 2f), Seq(3f, 4f)),
        Row(2L, null, Seq(1f, 2f)),
        Row(3L, Seq(1f, 2f, 3f), Seq(1f, 2f)),
        Row(4L, Seq[Any](1f, null), Seq(1f, 2f))),
      schema).repartition(2)
    val planned = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
    assert(planned.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    val got = planned.orderBy("id").collect()
    assert(got(0).getDouble(1) == (1f.toDouble * 3f + 2f.toDouble * 4f))
    assert(got(1).isNullAt(1))
    assert(got(2).isNullAt(1))
    assert(got(3).isNullAt(1))
  }

  test("a non-matching fold (double arrays) is left to the interpreter") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .repartition(2)
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("vec_dot"), opt)
    assert(df.collect().head.getDouble(0) == 11.0)
  }
}

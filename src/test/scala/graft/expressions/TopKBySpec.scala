package graft.expressions

import graft.SparkSpec
import graft.pipeline.Scale
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native bounded-heap top-k aggregate must equal the window
  * formulation (`row_number` over score DESC, item ASC) on any data —
  * including ties, many partitions (forcing partial-buffer serialize /
  * merge across the exchange), and k larger than the group.
  */
class TopKBySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
                         group: String, item: String, score: String,
                         k: Int) = {
    val w = Window.partitionBy(group)
      .orderBy(col(score).desc, col(item))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(group), (col("rk") - 1).cast("int").as("pos"), col(item))
  }

  private lazy val rows = {
    val rnd = new scala.util.Random(7)
    // scores drawn from a tiny set → many exact ties, exercising the
    // item tie-break; 37 partitions → every group's heap merges across
    // partial buffers (serialize/deserialize on the exchange)
    (1L to 5000L).map { i =>
      (s"g${rnd.nextInt(12)}", i, rnd.nextInt(8).toDouble)
    }.toDF("grp", "item_id", "score").repartition(37)
  }

  test("long items: equals the window formulation, ties included") {
    for (k <- Seq(1, 5, 1000)) {
      val got = Scale.topKPerGroup(rows, Seq("grp"), "item_id",
        col("score"), k).orderBy("grp", "pos").collect().toSeq
      val want = windowTopK(rows, "grp", "item_id", "score", k)
        .orderBy("grp", "pos").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("string items: byte-order tie-break matches the window sort") {
    val df = rows.select(col("grp"),
      concat(lit("it"), col("item_id")).as("name"), col("score"))
    val got = Scale.topKPerGroup(df, Seq("grp"), "name", col("score"), 7)
      .orderBy("grp", "pos").collect().toSeq
    val want = windowTopK(df, "grp", "name", "score", 7)
      .orderBy("grp", "pos").collect().toSeq
    assert(got == want)
  }

  test("null scores and items are ignored") {
    val df = Seq(
      ("a", java.lang.Long.valueOf(1L), java.lang.Double.valueOf(5.0)),
      ("a", java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double]),
      ("a", null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(9.0)),
      ("a", java.lang.Long.valueOf(3L), java.lang.Double.valueOf(4.0)))
      .toDF("grp", "item_id", "score")
    val got = Scale.topKPerGroup(df, Seq("grp"), "item_id", col("score"), 10)
      .orderBy("pos").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 3L))
  }

  test("plans as ObjectHashAggregate with a partial stage") {
    val plan = Scale.topKPerGroup(rows, Seq("grp"), "item_id",
      col("score"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_topk_by"), plan.take(800))
  }
}

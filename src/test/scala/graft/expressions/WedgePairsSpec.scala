package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WedgePairsSpec extends SparkSpec {
  import spark.implicits._

  private val P = 4294967296L // 2^32, the linkPredTopK pack base

  test("wedge_pairs: all C(n,2) packed pairs of a sorted array") {
    val r = Seq(Seq(2L, 5L, 9L)).toDF("adj")
      .select(call_function("wedge_pairs", col("adj"), lit(P)).as("w"))
      .as[Seq[Long]].head()
    assert(r == Seq(2L * P + 5L, 2L * P + 9L, 5L * P + 9L))
  }

  test("wedge_pairs: n < 2 yields empty, NULL yields NULL") {
    val df = Seq(Some(Seq(7L)), Some(Seq.empty[Long]), None)
      .toDF("adj")
      .select(call_function("wedge_pairs", col("adj"), lit(P)).as("w"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("wedge_pairs: an uncapped-hub-sized array fails loudly, not OOM") {
    // C(n,2) over 100M pairs in ONE row is a caller error (missing
    // degree cap); the Int-arithmetic wrap at n=65536 must never reach
    // the allocation
    val big = Seq(Seq.range(1L, 20002L)).toDF("adj")
      .select(call_function("wedge_pairs", col("adj"), lit(P)).as("w"))
    val e = intercept[Exception](big.collect())
    assert(e.getMessage != null)
  }

  test("wedge_pairs ≡ the composable HOF tree on random adjacencies") {
    // the HOF formulation is the cross-check the native loop replaced
    // in linkPredTopK's explode stage — they must agree element-wise
    val rnd = new scala.util.Random(42)
    val adjs = Seq.fill(50)(
      (1 to (2 + rnd.nextInt(20))).map(_ => (1L + rnd.nextInt(100000)).toLong)
        .distinct.sorted)
    val df = adjs.toDF("adj")
    val both = df.select(
      call_function("wedge_pairs", col("adj"), lit(P)).as("native"),
      expr(s"""flatten(transform(adj, (x, i) ->
        | transform(slice(adj, i + 2, size(adj)), y -> x * ${P}L + y)))"""
        .stripMargin).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() == 50)
  }
}

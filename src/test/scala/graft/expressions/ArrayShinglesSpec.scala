package graft.expressions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** The fused shingle expression must be bit-identical to the composable
  * HOF form it replaces (which stays as the DuckDB-oracle-shaped
  * construction).
  */
class ArrayShinglesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "Beta", "GAMMA", "d", "epsilon", "ze ta",
      "tab\there", "x")
    ((1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString("  "))
    } ++ Seq((41L, ""), (42L, "   "), (43L, "one"), (44L, "one two"),
      (45L, " Mixed   CASE\twords here "))).toDF("doc_id", "text")
  }

  test("native shingles equals the composable form on messy input") {
    for (n <- Seq(1, 2, 3, 8)) {
      val a = docs.select(col("doc_id"),
        Dedup.shingles(col("text"), n).as("sh")).orderBy("doc_id")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq
      val b = docs.select(col("doc_id"),
        Dedup.shinglesComposable(col("text"), n).as("sh")).orderBy("doc_id")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq
      assert(a == b, s"n=$n")
    }
  }

  test("shingles degrades to the composable form without GraftExtensions") {
    // a session whose registry lacks the fused function must still get
    // correct shingles (ADVICE r5: external callers without the
    // extension were getting an undefined-function AnalysisException)
    val bare = spark.newSession()
    bare.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingles"))
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(bare)
    try {
      val got = bare.createDataFrame(Seq(Tuple1("a b c d"))).toDF("text")
        .select(Dedup.shingles(col("text"), 2).as("sh"))
        .collect().head.getSeq[String](0)
      assert(got == Seq("a b", "b c", "c d"))
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("fused-function builders reject null / non-numeric literal args") {
    val e1 = intercept[Exception](spark.sql("SELECT shingles('a b', NULL)"))
    assert(e1.getMessage.contains("shingles n"))
    val e2 = intercept[Exception](spark.sql("SELECT shingles('a b', 'x')"))
    assert(e2.getMessage.contains("shingles n"))
    val e3 = intercept[Exception](
      spark.sql("SELECT minhash_bands('a', NULL, 16, 4)"))
    assert(e3.getMessage.contains("minhash_bands n"))
  }

  test("null text yields null, short text yields empty") {
    val df = Seq((1L, Option("a b")), (2L, None), (3L, Option("a")))
      .toDF("id", "text")
    val got = df.select(col("id"), Dedup.shingles(col("text"), 2).as("sh"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq("a b"))
    assert(got(1).isNullAt(1))
    assert(got(2).getSeq[String](1) == Seq())
  }
}

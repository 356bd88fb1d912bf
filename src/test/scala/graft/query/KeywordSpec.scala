package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keyword scoring semantics (`/root/reference/src/query/operations.zig:
  * 353-386, 421-443`): fraction of query words contained; threshold +
  * top-k with deterministic tie-break.
  */
class KeywordSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("d1", "alpha beta gamma"),
    ("d2", "alpha beta"),
    ("d3", "alpha"),
    ("d4", "unrelated"),
  ).toDF("id", "content")

  private def score(content: String, q: String): Double =
    Seq(content).toDF("content")
      .select(Keyword.score(col("content"), q).as("s"))
      .head().getDouble(0)

  test("score is the contained fraction of query words") {
    assert(score("alpha beta gamma", "alpha beta") == 1.0)
    assert(score("alpha x", "alpha beta") == 0.5)
    assert(score("x", "alpha beta") == 0.0)
  }

  test("duplicate query words count separately") {
    assert(score("alpha", "alpha alpha beta") == 2.0 / 3.0)
  }

  test("empty query scores zero") {
    assert(score("anything", "") == 0.0)
    assert(score("anything", "   ") == 0.0)
  }

  test("substring containment, like the reference") {
    assert(score("alphabet", "alpha") == 1.0)
  }

  test("threshold + top-k ordering with id tie-break") {
    val r = Keyword.search(docs, "content", "id", "alpha beta gamma",
      threshold = 0.3, maxResults = 2)
    val got = r.select("id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("d1", "d2"))
  }

  test("max_results cap is validated") {
    intercept[IllegalArgumentException] {
      Keyword.search(docs, "content", "id", "x", maxResults = 501)
    }
  }
}

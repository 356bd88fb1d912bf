package graft.query

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Mirrors the reference's filter-operator tests
  * (`/root/reference/src/query/filtering.zig:410-520`).
  */
class FilterExprSpec extends SparkSpec {
  import FilterExpr._

  private lazy val df: DataFrame = {
    import spark.implicits._
    Seq(
      ("b1", 1L, "hello world", """{"tier":"gold","n":"5"}"""),
      ("b2", 2L, "42", """{"tier":"silver","n":"10"}"""),
      ("b3", 3L, "7", """{"tier":"gold"}"""),
      ("b4", 4L, "zebra", """{"n":"bad"}"""),
    ).toDF("id", "sequence", "content", "metadata_json")
  }

  private def ids(e: Expr): Seq[String] =
    df.filter(compile(e)).select("id").collect().map(_.getString(0)).sorted.toSeq

  test("equality over non-numeric content is lexical, not an ANSI crash") {
    assert(ids(Cond(Content, Eq, "hello world")) == Seq("b1"))
  }

  test("numeric compare when both sides parse as numbers") {
    // "7" vs "42": numeric path (7 < 42) must win over lexical ("7" > "42");
    // non-numeric contents fall back to lexical ("hello...", "zebra" > "42")
    assert(ids(Cond(Content, Gt, "42")) == Seq("b1", "b4"))
    assert(ids(Cond(Content, Lt, "42")) == Seq("b3"))
  }

  test("lexical fallback when one side is non-numeric") {
    assert(ids(Cond(Content, Gt, "x")) == Seq("b4"))
  }

  test("all nine operators compile and run under ANSI") {
    val ops: Seq[Op] = Seq(Eq, Ne, Gt, Ge, Lt, Le, Contains, StartsWith, EndsWith)
    ops.foreach { op => df.filter(compile(Cond(Content, op, "hello"))).count() }
  }

  test("metadata field probe with missing key is a non-match") {
    assert(ids(Cond(MetadataField("tier"), Eq, "gold")) == Seq("b1", "b3"))
    assert(ids(Cond(MetadataField("missing"), Eq, "x")) == Seq())
  }

  test("metadata numeric-or-lexical: numeric when parseable") {
    // b2 n="10" numeric 10 > 7; b4 n="bad" lexical "bad" > "7" is false...
    // ('b' < '7' is false in ASCII: '7'=0x37 < 'b'=0x62, so "bad" > "7")
    assert(ids(Cond(MetadataField("n"), Gt, "7")) == Seq("b2", "b4"))
  }

  test("boolean tree with and/or/not") {
    val e = And(Seq(
      Or(Seq(Cond(Content, Contains, "hello"), Cond(Content, Eq, "42"))),
      Not(Cond(Sequence, Ge, "2"))))
    assert(ids(e) == Seq("b1"))
  }

  test("content length target") {
    assert(ids(Cond(ContentLength, Ge, "5")) == Seq("b1", "b4"))
  }

  test("pagination: offset + limit over deterministic order") {
    val page = FilterExpr.filteredQuery(df, Cond(Sequence, Ge, "1"), "id",
      offset = 1, maxResults = 2)
    assert(page.select("id").collect().map(_.getString(0)).toSeq == Seq("b2", "b3"))
  }

  test("max_results cap is validated") {
    intercept[IllegalArgumentException] {
      FilterExpr.filteredQuery(df, Cond(Sequence, Ge, "1"), "id",
        maxResults = 10001)
    }
  }
}

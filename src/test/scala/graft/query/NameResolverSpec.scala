package graft.query

import graft.SparkSpec

/** Mirrors the reference's qualified-name matching tests
  * (`/root/reference/src/query/engine.zig:1195-1493`).
  */
class NameResolverSpec extends SparkSpec {

  private lazy val blocks = {
    import spark.implicits._
    Seq(
      ("1", "ws1", "function", "src/a.zig:helper"),
      ("2", "ws1", "function", "src/a.zig:Parser:helper"),
      ("3", "ws1", "function", "src/b.zig:Lexer:helper"),
      ("4", "ws2", "function", "src/a.zig:helper"),
      ("5", "ws1", "type", "src/a.zig:Parser"),
      ("6", "ws1", "function", "noseparator"), // < 2 segments: must not crash
    ).toDF("id", "workspace", "unit_type", "unit_id")
      .withColumn("file_path", org.apache.spark.sql.functions.lit("f"))
  }

  private def find(ws: String, t: String, n: String): Seq[String] =
    NameResolver.findByName(blocks, ws, t, n)
      .select("id").collect().map(_.getString(0)).sorted.toSeq

  test("simple name matches the trailing segment, workspace-scoped") {
    assert(find("ws1", "function", "helper") == Seq("1", "2", "3"))
    assert(find("ws2", "function", "helper") == Seq("4"))
  }

  test("empty workspace searches all") {
    assert(find("", "function", "helper") == Seq("1", "2", "3", "4"))
  }

  test("qualified Container.name matches the 2nd-to-last segment") {
    assert(find("ws1", "function", "Parser.helper") == Seq("2"))
    assert(find("ws1", "function", "Lexer.helper") == Seq("3"))
  }

  test("qualified match on a short unit_id is a non-match, not a crash") {
    // reference: missing segment => no match (engine.zig:592-600);
    // under ANSI this used to throw INVALID_ARRAY_INDEX
    assert(find("ws1", "function", "Anything.noseparator") == Seq())
  }

  test("struct alias resolves to type") {
    assert(find("ws1", "struct", "Parser") == Seq("5"))
  }

  test("find_by_file_path filters on the real column") {
    import org.apache.spark.sql.functions._
    val b2 = blocks.withColumn("file_path",
      when(col("id") === "1", "src/a.zig").otherwise("other"))
    val r = NameResolver.findByFilePath(b2, "ws1", "src/a.zig")
    assert(r.select("id").collect().map(_.getString(0)).toSeq == Seq("1"))
  }
}

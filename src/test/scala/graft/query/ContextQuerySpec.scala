package graft.query

import graft.SparkSpec
import graft.graph.{Direction, EdgeFilter}
import org.apache.spark.sql.functions._

/** Context-query composition (`/root/reference/src/query/context_query
  * .zig:140-244`, `context/engine.zig:171-211`): anchors → rules →
  * bounded packaging with workspace isolation.
  */
class ContextQuerySpec extends SparkSpec {
  import spark.implicits._

  private lazy val blocks = Seq(
    ("f1", "ws1", "function", "a.zig:main", "main body"),
    ("f2", "ws1", "function", "a.zig:helper", "helper body"),
    ("t1", "ws1", "type", "a.zig:Parser", "parser type"),
    ("x1", "ws2", "function", "b.zig:main", "other ws"),
  ).map { case (id, ws, t, uid, c) => (id, 1L, ws, t, uid, "a.zig", c, false) }
    .toDF("id", "sequence", "workspace", "unit_type", "unit_id",
      "file_path", "content", "is_deleted")

  private lazy val edges = Seq(
    ("f1", "f2", "calls"),     // main calls helper
    ("f2", "t1", "references"),
    ("x1", "f2", "calls"),     // cross-workspace caller
  ).toDF("src", "dst", "edge_type")

  test("anchor by name + outgoing rule packages the reachable set") {
    val r = ContextQuery.execute(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ByName("function", "main")),
      rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2))))
    val got = r.collect().map(x => (x.getString(0), x.getInt(1))).toSeq
    assert(got == Seq(("f1", 0), ("f2", 1), ("t1", 2)))
  }

  test("workspace isolation drops cross-workspace nodes at packaging") {
    val r = ContextQuery.execute(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ByName("function", "helper")),
      rules = Seq(ContextQuery.Rule(Direction.Incoming, EdgeFilter.All, 1))))
    val ids = r.collect().map(_.getString(0)).toSeq
    assert(ids == Seq("f2", "f1")) // x1 (ws2) excluded, like the reference
  }

  test("two rules merge at min depth; edge filter applies per rule") {
    val r = ContextQuery.execute(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ById("f1")),
      rules = Seq(
        ContextQuery.Rule(Direction.Outgoing, EdgeFilter.Only("calls"), 1),
        ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2))))
    val got = r.collect().map(x => (x.getString(0), x.getInt(1))).toMap
    assert(got == Map("f1" -> 0, "f2" -> 1, "t1" -> 2))
  }

  test("global cap truncates in (depth, id) order") {
    val r = ContextQuery.execute(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ById("f1")),
      rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2)),
      maxTotalNodes = 2))
    assert(r.collect().map(_.getString(0)).toSeq == Seq("f1", "f2"))
  }

  test("anchor validation: unknown id resolves to empty, not an error") {
    val r = ContextQuery.execute(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ById("nope")),
      rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 1))))
    assert(r.isEmpty)
  }

  test("admission control rejects an over-budget estimate before any job") {
    val spec = ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ById("f1")),
      rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2)))
    val e = intercept[ContextQuery.QueryRejected] {
      ContextQuery.execute(blocks, edges, spec, admit = _ => false)
    }
    assert(e.getMessage.contains("admission"))
    // the default thresholds are the reference's exceeds_limits values
    assert(ContextQuery.estimateCost(spec).acceptable)
  }

  test("deadline: a query that cannot finish in time is cancelled") {
    intercept[ContextQuery.QueryTimeout] {
      // wrap execute's plan in a deadline by using a blocks table whose
      // scan is slow: a 50M-row range crossed with itself via the seeds
      val slowBlocks = spark.range(0, 50000000L)
        .select(concat(lit("f"), col("id")).as("id"), lit(1L).as("sequence"),
          lit("ws1").as("workspace"), lit("function").as("unit_type"),
          concat(lit("a.zig:n"), col("id")).as("unit_id"),
          lit("a.zig").as("file_path"), lit("c").as("content"),
          lit(false).as("is_deleted"))
      ContextQuery.executeWithDeadline(slowBlocks, edges, ContextQuery.Spec(
        workspace = "ws1",
        anchors = Seq(ContextQuery.ByName("function", "f49999999")),
        rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2))),
        timeoutMs = 300)
    }
  }

  test("deadline: a fast query completes and returns materialized rows") {
    val r = ContextQuery.executeWithDeadline(blocks, edges, ContextQuery.Spec(
      workspace = "ws1",
      anchors = Seq(ContextQuery.ById("f1")),
      rules = Seq(ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, 2))),
      timeoutMs = 120000)
    assert(r.collect().map(_.getString(0)).toSeq == Seq("f1", "f2", "t1"))
  }

  test("spec bounds are validated") {
    intercept[IllegalArgumentException] {
      ContextQuery.Spec("ws", Seq.fill(5)(ContextQuery.ById("a")), Seq())
    }
    intercept[IllegalArgumentException] {
      ContextQuery.Rule(Direction.Outgoing, EdgeFilter.All, maxDepth = 33)
    }
  }
}

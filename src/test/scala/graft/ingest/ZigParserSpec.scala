package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the real-Zig extractor against the same
  * snippet shapes the reference's own parser tests pin
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:646-900`):
  * top-level fn, method in struct, imports, tests, call edges.
  */
class ZigParserSpec extends AnyFunSuite {

  private def parse(src: String) = ZigParser.parse("src/x.zig", src)

  test("top-level function (reference 'parse top-level function')") {
    val us = parse("pub fn main() void {\n    return;\n}\n")
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) ==
      Seq(("function", "main", "")))
    assert(us.head.lineStart == 1 && us.head.lineEnd == 3)
    assert(us.head.content.startsWith("pub fn main"))
  }

  test("method inside struct gets parent + method_of (ref :350-357)") {
    val src =
      """const Engine = struct {
        |    count: u32,
        |    pub fn init(allocator: Allocator) Engine {
        |        return Engine{ .count = 0 };
        |    }
        |    fn helper(self: *Engine) void {
        |        self.reset();
        |    }
        |};
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType) == Seq("type", "function", "function"))
    val init = us(1)
    assert(init.parentContainer == "Engine")
    assert(init.unitId == "src/x.zig:Engine:init")
    assert(init.edges.contains(ParsedEdge("method_of", "Engine")))
    // .reset() on self is a method call edge (ref :404-414)
    assert(us(2).edges.contains(ParsedEdge("calls_method", "reset")))
  }

  test("imports become units with module-basename edge targets") {
    val src =
      """const std = @import("std");
        |const types = @import("../core/types.zig");
        |pub const assert_mod = @import("assert.zig");
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("std", "types", "assert_mod"))
    assert(us(1).edges == Seq(ParsedEdge("imports", "types")))
    assert(us(2).edges == Seq(ParsedEdge("imports", "assert")))
  }

  test("test decls: named unit, line-based id, body calls attach") {
    val src =
      """test "query roundtrip" {
        |    const engine = try setup_engine();
        |    try std.testing.expectEqual(engine.run(), 1);
        |}
        |""".stripMargin
    val us = parse(src)
    // the local `const engine` is a unit too (reference scope rule)
    assert(us.map(_.unitType) == Seq("test", "const"))
    assert(us.head.name == "query roundtrip")
    assert(us.head.unitId == "src/x.zig:test:1")
    assert(us.head.edges.contains(ParsedEdge("calls", "setup_engine")))
    assert(us.head.edges.contains(ParsedEdge("calls_method", "expectEqual")))
    assert(us.head.edges.contains(ParsedEdge("calls_method", "run")))
  }

  test("call extraction skips keywords, builtins, strings, comments") {
    val src =
      """fn f(x: u8) !void {
        |    if (x > 0) { // real_call() in a comment
        |        const y = @intCast(x);
        |        while (y < 10) : (y += 1) {}
        |        log("call_in_string()");
        |        switch (x) { else => {} }
        |        real_call(y) catch unreachable;
        |    }
        |}
        |""".stripMargin
    val us = parse(src)
    val calls = us.head.edges.filter(_.edgeType == "calls").map(_.targetName)
    assert(calls == Seq("log", "real_call"))
  }

  test("multi-line signatures and one-line bodies") {
    val src =
      """pub fn long_signature(
        |    allocator: Allocator,
        |    query: *const FindBlocksQuery,
        |) QueryError!QueryResult {
        |    return execute(allocator, query);
        |}
        |fn one_liner() void { tiny(); }
        |extern fn proto(x: u8) void;
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("long_signature", "one_liner", "proto"))
    assert(us(0).lineStart == 1 && us(0).lineEnd == 6)
    assert(us(0).edges.exists(e => e.targetName == "execute"))
    assert(us(1).edges.contains(ParsedEdge("calls", "tiny")))
    assert(us(2).lineEnd == 8) // proto: no body
  }

  test("enum/union containers, nested constants, union(enum) form") {
    val src =
      """pub const Direction = enum { outgoing, incoming, bidirectional };
        |const Payload = union(enum) {
        |    find: FindQuery,
        |    pub fn kind(self: Payload) u8 {
        |        return 0;
        |    }
        |};
        |const MAX_DEPTH: u32 = 10;
        |var counter: u64 = 0;
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "Direction"), ("type", "Payload"), ("function", "kind"),
      ("const", "MAX_DEPTH"), ("var", "counter")))
    assert(us(2).parentContainer == "Payload")
  }

  test("multiline string literals and char literals do not disturb depth") {
    val src =
      """fn banner() []const u8 {
        |    const s =
        |        \\ fn fake_decl() { unbalanced {{{
        |        \\ more text }
        |    ;
        |    const c = '{';
        |    return s;
        |}
        |fn after() void {}
        |""".stripMargin
    val us = parse(src)
    // s and c are local-const units (reference scope rule); the point
    // here is that the literal text disturbs neither depth nor calls
    assert(us.map(_.name) == Seq("banner", "s", "c", "after"))
    assert(us(0).lineEnd == 8)
  }

  test("function-local const/var emit units like the reference walker") {
    // zig_parser.zig:499-500: "create unit regardless of scope" —
    // locals are units too, parentContainer = innermost TYPE container
    // (never the enclosing function), and the initializer's call-sites
    // still attach to the enclosing function.
    val src =
      """const S = struct {
        |    fn f() void {
        |        const local = helper();
        |        var also_local: u8 = 0;
        |    }
        |};
        |const global = 2;
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) ==
      Seq(("type", "S"), ("function", "f"), ("const", "local"),
        ("var", "also_local"), ("const", "global")))
    val local = us.find(_.name == "local").get
    assert(local.parentContainer == "S") // the container, not fn f
    assert(us.find(_.name == "global").get.parentContainer == "")
    // the call inside local's initializer belongs to f
    val f = us.find(_.name == "f").get
    assert(f.edges.exists(e =>
      e.edgeType == "calls" && e.targetName == "helper"))
  }

  test("non-code .zig-free files fall through DispatchParser to document") {
    val md = DispatchParser.parse("README.md", "# Title\nSome prose.\n")
    assert(md.map(_.unitType) == Seq("document"))
    val zig = DispatchParser.parse("a.zig", "fn f() void {}\n")
    assert(zig.map(_.unitType) == Seq("function"))
  }

  test("self-ingestion smoke: parses a real reference file cleanly") {
    val path = "/root/reference/src/ingestion/semantic_resolver.zig"
    val f = new java.io.File(path)
    assume(f.exists())
    val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val us = ZigParser.parse("src/ingestion/semantic_resolver.zig", src)
    val byType = us.groupBy(_.unitType).view.mapValues(_.size).toMap
    // the file's own declared surface: imports at :16-23, the resolver
    // container + its methods, parse_symbol_kind, tests at the bottom
    assert(byType("import") == 3) // std, pipeline_types, EdgeType
    assert(byType("function") >= 7)
    assert(byType("test") == 5)
    assert(byType.getOrElse("type", 0) >= 1)
    val resolve = us.find(_.name == "resolve_in_scope").get
    assert(resolve.parentContainer == "SemanticResolver")
    assert(resolve.edges.contains(ParsedEdge("method_of", "SemanticResolver")))
  }
}

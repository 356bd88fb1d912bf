package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the Python extractor — same harness shape as
  * [[ZigParserSpec]]/[[ScalaParserSpec]] — plus DOGFOOD: the last test
  * ingests this repository's own oracle tooling (the `tools/` python
  * scripts), the Python this engine actually lives next to.
  */
class PythonParserSpec extends AnyFunSuite {

  private def parse(src: String) = PythonParser.parse("src/x.py", src)

  test("module functions: units, calls, calls_method") {
    val src =
      """def load(path):
        |    rows = read_rows(path)
        |    return rows.filter(keep)
        |
        |def keep(r):
        |    return True
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "load", ""), ("function", "keep", "")))
    assert(us(0).unitId == "src/x.py:load")
    assert(us(0).edges.contains(ParsedEdge("calls", "read_rows")))
    assert(us(0).edges.contains(ParsedEdge("calls_method", "filter")))
    assert(us(0).lineStart == 1 && us(0).lineEnd == 3)
  }

  test("class scope: methods get parent + method_of; indent closes it") {
    val src =
      """class Pipeline:
        |    MAX_ROWS = 100
        |
        |    def run(self):
        |        self.load()
        |
        |def helper():
        |    pass
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Pipeline", ""), ("const", "MAX_ROWS", "Pipeline"),
      ("function", "run", "Pipeline"), ("function", "helper", "")))
    assert(us(2).unitId == "src/x.py:Pipeline:run")
    assert(us(2).edges.contains(ParsedEdge("method_of", "Pipeline")))
    assert(us(2).edges.contains(ParsedEdge("calls_method", "load")))
    assert(us(3).parentContainer == "")
  }

  test("imports: plain with as/commas, from-import, multi-line parens") {
    val src =
      """import os, json as j
        |from collections import OrderedDict, defaultdict as dd
        |from . import sibling
        |from pkg.mod import (
        |    alpha,
        |    beta,
        |)
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("os", "j", "collections", "sibling", "mod"))
    assert(us(1).edges == Seq(ParsedEdge("imports", "json")))
    assert(us(2).edges == Seq(ParsedEdge("imports", "OrderedDict"),
      ParsedEdge("imports", "defaultdict")))
    assert(us(3).edges == Seq(ParsedEdge("imports", "sibling")))
    assert(us(4).edges == Seq(ParsedEdge("imports", "alpha"),
      ParsedEdge("imports", "beta")))
  }

  test("pytest convention: def test_* becomes a test unit with calls") {
    val src =
      """def test_roundtrip():
        |    out = encode(decode(RAW))
        |    assert out == RAW
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(("test", "test_roundtrip")))
    assert(us(0).unitId == "src/x.py:test:1")
    assert(us(0).edges.contains(ParsedEdge("calls", "encode")))
    assert(us(0).edges.contains(ParsedEdge("calls", "decode")))
  }

  test("hanging indents and backslash continuations never close a scope") {
    val src =
      """def wide(a,
        |b,
        |c):
        |    x = total(a,
        |1,
        |2)
        |    y = a + \
        |b
        |    return combine(x, y)
        |
        |CONST_AFTER = 1
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "wide"), ("const", "CONST_AFTER")))
    val w = us(0)
    assert(w.edges.contains(ParsedEdge("calls", "total")))
    assert(w.edges.contains(ParsedEdge("calls", "combine")))
    assert(w.lineEnd == 9)
  }

  test("strings, docstrings, f-splices, comments are structurally inert") {
    val src =
      s"""def doc():
         |    ${"\"\"\""}not_a_call() 'nor this
         |    def not_a_def(): pass${"\"\"\""}
         |    s = f"{fake_call(1)} literal"
         |    t = 'ignored(2)'  # trailing comment(3)
         |    return real(4)
         |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("doc"))
    val callees = us(0).edges.map(_.targetName)
    assert(callees == Seq("real"))
  }

  test("one-liner def and UPPER const with annotation") {
    val src =
      """THRESHOLD: float = 0.5
        |def ok(): return check(THRESHOLD)
        |def after():
        |    pass
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("const", "THRESHOLD"), ("function", "ok"), ("function", "after")))
    assert(us(1).edges.contains(ParsedEdge("calls", "check")))
    assert(us(1).lineEnd == 2)
  }

  test("non-code text falls back to one document unit") {
    val us = PythonParser.parse("notes.py", "just words, no declarations\n")
    assert(us.map(_.unitType) == Seq("document"))
  }

  test("dogfood: parses this repo's own oracle tooling (tools/*.py)") {
    val root = new java.io.File("tools")
    assume(root.isDirectory)
    val files = root.listFiles().filter(_.getName.endsWith(".py"))
    assume(files.nonEmpty)
    val units = files.flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      PythonParser.parse(s"tools/${f.getName}", src)
    }.toSeq
    val byType = units.groupBy(_.unitType).view.mapValues(_.size).toMap
    // the oracle scripts import duckdb/json/sys and define real helpers
    assert(byType.getOrElse("import", 0) >= 3)
    assert(byType.getOrElse("function", 0) >= 2)
    assert(units.map(_.unitId).distinct.size == units.size)
    val edges = units.flatMap(_.edges)
    assert(edges.count(e =>
      e.edgeType == "calls" || e.edgeType == "calls_method") >= 10)
  }
}

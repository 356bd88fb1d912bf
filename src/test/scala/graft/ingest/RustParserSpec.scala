package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the Rust extractor — same harness shape as
  * the other six parser specs.
  */
class RustParserSpec extends AnyFunSuite {

  private def parse(src: String) = RustParser.parse("src/x.rs", src)

  test("fns, impl containers, traits, consts: the declared surface") {
    val src =
      """use std::collections::HashMap;
        |
        |pub struct Store {
        |    map: HashMap<String, String>,
        |}
        |
        |pub const RETRIES: u32 = 3;
        |static mut CACHE: u64 = 0;
        |
        |impl Store {
        |    pub const MAX_CONNS: usize = 8;
        |    pub fn open(addr: &str) -> Store {
        |        Store::from(validate(addr))
        |    }
        |    pub fn get(&self, key: &str) -> String {
        |        self.map.lookup(key)
        |    }
        |}
        |
        |fn validate(addr: &str) -> String {
        |    normalize(addr)
        |}
        |
        |pub trait Render {
        |    fn draw(&self) -> String {
        |        paint(self)
        |    }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("import", "HashMap", ""),
      ("type", "Store", ""),
      ("const", "RETRIES", ""),
      ("var", "CACHE", ""),
      ("const", "MAX_CONNS", "Store"),
      ("function", "open", "Store"),
      ("function", "get", "Store"),
      ("function", "validate", ""),
      ("type", "Render", ""),
      ("function", "draw", "Render")))
    val open = us.find(_.name == "open").get
    assert(open.unitId == "src/x.rs:Store:open")
    assert(open.edges.contains(ParsedEdge("method_of", "Store")))
    assert(open.edges.contains(ParsedEdge("calls", "validate")))
    assert(open.edges.contains(ParsedEdge("calls", "from"))) // Store::from
    assert(us.find(_.name == "get").get.edges
      .contains(ParsedEdge("calls_method", "lookup")))
    assert(us.find(_.name == "validate").get.edges
      .contains(ParsedEdge("calls", "normalize")))
    assert(us.find(_.name == "draw").get.edges
      .contains(ParsedEdge("method_of", "Render")))
  }

  test("impl Trait for Type attaches methods to the SELF type") {
    val src =
      """impl Render for Shape {
        |    fn draw(&self) -> String {
        |        trace(self)
        |    }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.name, u.parentContainer)) == Seq(("draw", "Shape")))
    assert(us.head.edges.contains(ParsedEdge("method_of", "Shape")))
  }

  test("use declarations: plain, alias, braced list, glob") {
    val src =
      """use std::fs;
        |use std::io::Read as Readable;
        |use crate::graph::{Node, Edge as E};
        |use super::util::*;
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("fs", "Readable", "Node", "E", "util"))
    assert(us(1).edges == Seq(ParsedEdge("imports", "Read")))
    assert(us(3).edges == Seq(ParsedEdge("imports", "Edge")))
  }

  test("#[test] arms the next fn, namespaced attributes included") {
    val src =
      """#[test]
        |fn opens_store() {
        |    let s = open("x");
        |    check(s);
        |}
        |
        |#[tokio::test]
        |#[ignore]
        |fn async_case() {
        |    run()
        |}
        |
        |fn not_a_test() {
        |    helper()
        |}
        |""".stripMargin
    val us = parse(src)
    val tests = us.filter(_.unitType == "test")
    assert(tests.map(_.name) == Seq("opens_store", "async_case"))
    assert(tests(0).unitId == "src/x.rs:test:2")
    assert(tests(0).edges.contains(ParsedEdge("calls", "open")))
    assert(tests(0).edges.contains(ParsedEdge("calls", "check")))
    assert(us.find(_.name == "not_a_test").get.unitType == "function")
  }

  test("cleaning: nested comments, multi-line/raw strings, lifetimes") {
    val src =
      """// fn ghost1() {}
        |/* fn ghost2() {} /* nested */ still comment */
        |const S: &str = "fn ghost3() {}";
        |const M: &str = "multi
        |fn ghost4() {}
        |line";
        |const R: &str = r#"raw "quoted" fn ghost5() {}"#;
        |fn real<'a>(x: &'a str) -> char {
        |    let c = 'x';
        |    let nl = '\n';
        |    keep(x)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.count(_.unitType == "function") == 1)
    val real = us.find(_.name == "real").get
    assert(real.edges.contains(ParsedEdge("calls", "keep")))
    assert(!us.exists(_.name.startsWith("ghost")))
    // the consts themselves are still declared
    assert(us.filter(_.unitType == "const").map(_.name) == Seq("S", "M", "R"))
  }

  test("macro invocations are not call edges; bodyless trait sigs close") {
    val src =
      """pub trait Sink {
        |    fn flush(&self);
        |}
        |fn log_it(v: u32) {
        |    println!("v={}", v);
        |    vec![v];
        |    emit(v)
        |}
        |""".stripMargin
    val us = parse(src)
    val flush = us.find(_.name == "flush").get
    assert(flush.parentContainer == "Sink" && flush.lineEnd == 2)
    val log = us.find(_.name == "log_it").get
    assert(log.edges.contains(ParsedEdge("calls", "emit")))
    assert(!log.edges.exists(_.targetName == "println"))
    assert(!log.edges.exists(_.targetName == "vec"))
  }

  test("DispatchParser routes .rs to RustParser") {
    val us = DispatchParser.parse("a/b.rs", "fn f() {\n    g()\n}\n")
    assert(us.map(_.unitType) == Seq("function"))
    assert(us.head.edges.contains(ParsedEdge("calls", "g")))
  }

  test("dogfood: parses a real third-party Rust test file") {
    // pydantic-core's packaged integration test: real-world #[cfg]
    // attributes, a tests mod, multi-line raw strings, closures
    val f = new java.io.File(
      "/root/miniconda/pkgs/pydantic-core-2.46.2-py313h6e1b9ff_0/" +
        "info/test/tests/test.rs")
    assume(f.exists())
    val src = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val us = RustParser.parse("tests/test.rs", src)
    // the three #[test] fns register as tests; #[cfg(test)] does not
    // arm (it is a cfg attribute, not a test attribute)
    assert(us.filter(_.unitType == "test").map(_.name) == Seq(
      "test_build_schema_serializer", "test_literal_schema",
      "test_segfault_for_recursive_schemas"))
    // the braced use list binds each item; the glob keeps the module
    val imports = us.filter(_.unitType == "import").map(_.name)
    for (n <- Seq("SchemaSerializer", "SchemaValidator", "WarningsArg",
        "c_str", "prelude", "PyDict"))
      assert(imports.contains(n), n)
    us.foreach { u =>
      assert(u.lineStart >= 1 && u.lineEnd >= u.lineStart, u.unitId)
    }
  }
}

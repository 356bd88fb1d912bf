package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the Go extractor — same harness shape as the
  * other three parser specs.
  */
class GoParserSpec extends AnyFunSuite {

  private def parse(src: String) = GoParser.parse("pkg/x.go", src)

  test("functions and receiver methods: parent from the receiver") {
    val src =
      """package store
        |
        |func Open(path string) *DB {
        |	return newDB(path)
        |}
        |
        |func (db *DB) Get(key string) ([]byte, error) {
        |	return db.lookup(key)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "Open", ""), ("function", "Get", "DB")))
    assert(us(0).edges.contains(ParsedEdge("calls", "newDB")))
    assert(us(1).unitId == "pkg/x.go:DB:Get")
    assert(us(1).edges.contains(ParsedEdge("method_of", "DB")))
    assert(us(1).edges.contains(ParsedEdge("calls_method", "lookup")))
    assert(us(0).lineStart == 3 && us(0).lineEnd == 5)
  }

  test("imports: single line and grouped block with alias") {
    val src =
      """package main
        |
        |import "fmt"
        |
        |import (
        |	"os"
        |	enc "encoding/json"
        |	"net/http"
        |)
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("fmt", "os", "enc", "http"))
    assert(us(2).edges == Seq(ParsedEdge("imports", "json")))
    assert(us(3).edges == Seq(ParsedEdge("imports", "http")))
  }

  test("types, consts, vars: top-level and grouped (iota block)") {
    val src =
      """package cfg
        |
        |type Server struct {
        |	Addr string
        |}
        |
        |type Handler interface {
        |	Serve(req Request) error
        |}
        |
        |const MaxConns = 64
        |var debug = false
        |
        |const (
        |	StateIdle = iota
        |	StateBusy
        |)
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "Server"), ("type", "Handler"),
      ("const", "MaxConns"), ("var", "debug"),
      ("const", "StateIdle"), ("const", "StateBusy")))
    // interface method signatures are not call edges or units
    assert(us.flatMap(_.edges).isEmpty)
  }

  test("go test convention: func TestXxx becomes a test unit") {
    val src =
      """package store
        |
        |func TestOpen(t *testing.T) {
        |	db := Open("mem")
        |	db.Close()
        |}
        |
        |func Testify() {}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("test", "TestOpen"), ("function", "Testify")))
    assert(us(0).unitId == "pkg/x.go:test:3")
    assert(us(0).edges.contains(ParsedEdge("calls", "Open")))
    assert(us(0).edges.contains(ParsedEdge("calls_method", "Close")))
  }

  test("strings, raw strings, comments are structurally inert") {
    val src =
      """package p
        |
        |func f() {
        |	s := "not_a_call() {"
        |	r := `raw } {
        |multi_line_not_a_call()
        |`
        |	// commented_call()
        |	/* block_call() */
        |	g(s, r)
        |}
        |
        |func after() {}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("f", "after"))
    assert(us(0).edges == Seq(ParsedEdge("calls", "g")))
  }

  test("multi-line signatures join; closures attach to the enclosing func") {
    val src =
      """package p
        |
        |func wide(
        |	a int,
        |	b func(int) error,
        |) error {
        |	return apply(func(x int) error {
        |		return inner(x)
        |	})
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("wide"))
    val callees = us(0).edges.map(_.targetName)
    assert(callees.contains("apply") && callees.contains("inner"))
  }

  test("named closure bindings are function units with their own scope") {
    val src =
      """package p
        |
        |var top = func(a int) int {
        |	return shape(a)
        |}
        |
        |func drive(n int) int {
        |	double := func(x int) int {
        |		return grow(x)
        |	}
        |	return double(n) + after(n)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "top"), ("function", "drive"), ("function", "double")))
    // the closure's body calls belong to the CLOSURE, not the host
    assert(us.find(_.name == "top").get.edges
      .contains(ParsedEdge("calls", "shape")))
    assert(us.find(_.name == "double").get.edges
      .contains(ParsedEdge("calls", "grow")))
    val drive = us.find(_.name == "drive").get
    assert(!drive.edges.exists(_.targetName == "grow"))
    // the host still records its own call-sites, incl. the closure's
    assert(drive.edges.contains(ParsedEdge("calls", "double")))
    assert(drive.edges.contains(ParsedEdge("calls", "after")))
  }

  test("non-code text falls back to one document unit") {
    val us = GoParser.parse("README.go", "words only\n")
    assert(us.map(_.unitType) == Seq("document"))
  }

  test("bodyless declarations don't swallow the next function") {
    // assembly-backed stub: signature line closes its parens with no
    // brace — semicolon insertion means no body ever follows
    val src =
      """package p
        |
        |func Add(a, b int) int
        |
        |func Sub(a, b int) int {
        |	return minus(a, b)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "Add"), ("function", "Sub")))
    assert(us(0).edges.isEmpty) // no phantom calls->Sub from the scan
    assert(us(1).edges == Seq(ParsedEdge("calls", "minus")))
  }

  test("unnamed and generic receivers still yield method units") {
    val src =
      """package p
        |
        |func (*Store) Reset() {
        |	cleanup()
        |}
        |
        |func (s *Cache[K]) Get(k K) K {
        |	return s.probe(k)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "Reset", "Store"), ("function", "Get", "Cache")))
    assert(us(0).edges.contains(ParsedEdge("calls", "cleanup")))
    assert(us(1).edges.contains(ParsedEdge("calls_method", "probe")))
  }

  test("imports inside comments or raw strings are not units") {
    val src =
      """package p
        |
        |/*
        |import "fmt"
        |*/
        |
        |var tmpl = `
        |import "phantom"
        |`
        |
        |import "real"
        |""".stripMargin
    val us = parse(src)
    val imports = us.filter(_.unitType == "import")
    assert(imports.map(_.name) == Seq("real"))
  }

  test("function-local const/var groups are skipped like single locals") {
    val src =
      """package p
        |
        |func f() {
        |	const (
        |		bufSize = 4096
        |	)
        |	use(bufSize)
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(("function", "f")))
    assert(us(0).edges == Seq(ParsedEdge("calls", "use")))
  }
}

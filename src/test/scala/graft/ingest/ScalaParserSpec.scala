package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the Scala extractor — same harness shape as
  * [[ZigParserSpec]] — plus DOGFOOD: the last tests ingest this
  * repository's own sources, proving the engine can parse the language
  * it is written in ("Code is a graph. Query it." on graft itself).
  */
class ScalaParserSpec extends AnyFunSuite {

  private def parse(src: String) = ScalaParser.parse("src/X.scala", src)

  test("top-level object with methods: parent, method_of, calls") {
    val src =
      """object MathUtil {
        |  def clamp(x: Int): Int = floor(x)
        |  def floor(x: Int): Int = x
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "MathUtil", ""),
      ("function", "clamp", "MathUtil"),
      ("function", "floor", "MathUtil")))
    assert(us(1).unitId == "src/X.scala:MathUtil:clamp")
    assert(us(1).edges.contains(ParsedEdge("method_of", "MathUtil")))
    assert(us(1).edges.contains(ParsedEdge("calls", "floor")))
  }

  test("case class params spanning lines do not swallow successors") {
    val src =
      """final case class Edge(edgeType: String, targetName: String)
        |
        |final case class Unit(
        |    unitId: String,
        |    name: String)
        |
        |trait Parser extends Serializable {
        |  def parse(path: String): Seq[Unit]
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "Edge"), ("type", "Unit"), ("type", "Parser"),
      ("function", "parse")))
    assert(us(1).lineStart == 3 && us(1).lineEnd == 5)
    assert(us(3).parentContainer == "Parser")
  }

  test("imports: plain, wildcard, braces (with rename)") {
    val src =
      """import org.apache.spark.sql.functions._
        |import graft.core.Schemas
        |import graft.graph.{CodeGraph, Traversal => T}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.unitType).forall(_ == "import"))
    assert(us.map(_.name) == Seq("functions", "Schemas", "graph"))
    assert(us(0).edges == Seq(ParsedEdge("imports", "functions")))
    assert(us(1).edges == Seq(ParsedEdge("imports", "Schemas")))
    // braces expand; a rename targets the ORIGINAL name
    assert(us(2).edges.toSet == Set(
      ParsedEdge("imports", "CodeGraph"), ParsedEdge("imports", "Traversal")))
  }

  test("ScalaTest FunSuite test(...) registrations become test units") {
    val src =
      """class PipelineSpec extends AnyFunSuite {
        |  test("run works") {
        |    Pipeline.run()
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "PipelineSpec"), ("test", "run works")))
    assert(us(1).unitId == "src/X.scala:test:2")
    assert(us(1).edges.contains(ParsedEdge("calls_method", "run")))
  }

  test("call extraction skips keywords, annotations, type applications") {
    val src =
      """object O {
        |  def f(x: Int): Int = {
        |    if (x > 0) {
        |      val a = new Array[Char](x)   // Char is a type app, not a call
        |      helper(x) match {
        |        case 0 => other.method(x)
        |        case _ => ()
        |      }
        |    }
        |    g("call_in_string()")
        |  }
        |}
        |""".stripMargin
    val calls = parse(src).find(_.name == "f").get.edges
    val names = calls.map(_.targetName)
    assert(names.contains("helper") && names.contains("g"))
    assert(calls.contains(ParsedEdge("calls_method", "method")))
    assert(!names.contains("if") && !names.contains("match") &&
      !names.contains("Char") && !names.contains("case"))
  }

  test("expression bodies, multi-line signatures, nested defs") {
    val src =
      """object O {
        |  def short(x: Int): Int = twice(x)
        |  def long(
        |      a: Int,
        |      b: Int): Int = {
        |    def inner(c: Int) = a + c
        |    inner(b)
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("O", "short", "long", "inner"))
    assert(us(1).edges.contains(ParsedEdge("calls", "twice")))
    assert(us(2).lineStart == 3)
    assert(us(2).edges.contains(ParsedEdge("calls", "inner")))
  }

  test("comments, nested block comments, strings, triple-quoted strings") {
    val src =
      ("""object O {
        |  // def commented_out() {
        |  /* def also_out() { /* nested */ } */
        |  val re = QQQ^\s*def\s+fake(QQQ.r
        |  val s = "def fake2() {"
        |  val c = '{'
        |  def real(): Int = 1
        |}
        |""").stripMargin.replace("QQQ", "\"\"\"")
    val us = parse(src)
    assert(us.map(_.name) == Seq("O", "re", "s", "c", "real"))
    assert(us.count(_.unitType == "function") == 1)
    // depth survived the unbalanced braces inside literals: the object
    // closes where the file says it does
    assert(us.head.lineEnd == 8)
  }

  test("interpolation splices: nested literals and braces stay blanked") {
    // a string literal INSIDE a splice must not end the outer string —
    // its braces would leak into depth accounting and mis-scope every
    // unit after it
    val src =
      """object O {
        |  def f(m: Map[String, String]): String = {
        |    val x = s"prefix ${m.getOrElse("{", other("}"))} suffix"
        |    h(x)
        |  }
        |  def after(): Int = 1
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("O", "f", "after"))
    assert(us.head.lineEnd == 7) // object closes where the file says
    assert(us(1).parentContainer == "O" && us(2).parentContainer == "O")
    assert(us(1).edges.contains(ParsedEdge("calls", "h")))
    // multi-line splice in a triple-quoted interpolated string
    val src2 =
      ("""object P {
        |  val q = sQQQ SELECT ${cols.map(c => s"x$c").mkString(", ")}
        |    FROM ${tbl("{")} QQQ
        |  def real(): Int = 2
        |}
        |""").stripMargin.replace("QQQ", "\"\"\"")
    val us2 = parse(src2)
    assert(us2.map(_.name) == Seq("P", "q", "real"))
  }

  test("vals inside function bodies are not units (documented deviation)") {
    val src =
      """object O {
        |  val Global = 1
        |  var mutable = 2
        |  def f(): Int = {
        |    val local = 3
        |    local
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "O"), ("const", "Global"), ("var", "mutable"),
      ("function", "f")))
  }

  test("companions and overloads get deterministic distinct unit ids") {
    val src =
      """class Box(v: Int)
        |object Box {
        |  def apply(): Box = new Box(0)
        |}
        |""".stripMargin
    val us = parse(src)
    val ids = us.map(_.unitId)
    assert(ids.distinct.size == ids.size)
    assert(ids.contains("src/X.scala:Box"))
    assert(ids.exists(_.startsWith("src/X.scala:Box#")))
  }

  test("DispatchParser routes .scala to ScalaParser") {
    val us = DispatchParser.parse("a/B.scala",
      "object B {\n  def f() = 1\n}\n")
    assert(us.map(_.unitType) == Seq("type", "function"))
  }

  test("fuzz: adversarial inputs terminate without throwing (all parsers)") {
    // ingestion must survive arbitrary bytes — a corrupt file in a
    // 100-TB tree must not kill the job. Deterministic LCG so failures
    // reproduce; the alphabet is weighted toward the parsers' control
    // characters (braces, quotes, slashes, backslashes, newlines).
    val alphabet =
      "{}()[]\"'\\/*\n\n ;=>:,.@_abcdefXYZ09 \t`#$!-~<" +
        "fn def val var class object trait test import const type " +
        "from func go package async lambda public static final void record " +
        "namespace template using TEST R\" :: if endif "
    var seed = 0x9E3779B97F4A7C15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 200) {
      val len = nextInt(400)
      val sb = new StringBuilder
      for (_ <- 0 until len) sb += alphabet(nextInt(alphabet.length))
      val src = sb.toString
      // every parser: total (returns, never throws) with sane units
      for (p <- Seq(ScalaParser, ZigParser, SimpleParser, DispatchParser,
          PythonParser, GoParser, TsParser, JavaParser, RustParser,
          CParser, CppParser)) {
        val us = p.parse(s"f$trial.x", src)
        us.foreach { u =>
          assert(u.lineStart >= 1, s"trial $trial: lineStart ${u.lineStart}")
          assert(u.lineEnd >= u.lineStart,
            s"trial $trial ${u.unitType} ${u.name}: " +
              s"range ${u.lineStart}-${u.lineEnd}")
          assert(u.unitId.nonEmpty && u.unitType.nonEmpty)
        }
      }
    }
  }

  test("dogfood: parses the engine's own SourceParser.scala") {
    val path = "src/main/scala/graft/ingest/SourceParser.scala"
    val f = new java.io.File(path)
    assume(f.exists())
    val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val us = ScalaParser.parse(path, src)
    val names = us.map(_.name)
    // the stable declared surface of the contract file
    assert(names.contains("ParsedEdge") && names.contains("ParsedUnit") &&
      names.contains("SourceParser") && names.contains("SimpleParser"))
    val parse0 = us.find(u => u.name == "parse" &&
      u.parentContainer == "SimpleParser").get
    assert(parse0.unitType == "function")
    assert(parse0.edges.contains(ParsedEdge("method_of", "SimpleParser")))
    assert(parse0.edges.exists(_.targetName == "readBody")) // real call
  }

  test("dogfood: whole-repo ingestion is parseable and call-connected") {
    val root = new java.io.File("src/main/scala/graft/ingest")
    assume(root.isDirectory)
    val files = root.listFiles().filter(_.getName.endsWith(".scala"))
    val units = files.flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      ScalaParser.parse(s"graft/ingest/${f.getName}", src)
    }.toSeq
    val byType = units.groupBy(_.unitType).view.mapValues(_.size).toMap
    // every file in the package declares at least one container; the
    // package has dozens of functions and real call edges between them
    assert(byType("type") >= files.length)
    assert(byType("function") > 20)
    assert(units.map(_.unitId).distinct.size == units.size)
    val edges = units.flatMap(_.edges)
    assert(edges.count(_.edgeType == "calls") > 20)
    assert(edges.count(_.edgeType == "calls_method") > 50)
    assert(edges.count(_.edgeType == "method_of") > 20)
  }
}

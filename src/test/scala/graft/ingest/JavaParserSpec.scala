package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the Java extractor — same harness shape as
  * the other five parser specs.
  */
class JavaParserSpec extends AnyFunSuite {

  private def parse(src: String) = JavaParser.parse("src/X.java", src)

  test("classes, methods, constructor, nested type containers") {
    val src =
      """import java.util.HashMap;
        |import static java.lang.Math.max;
        |
        |public class Store {
        |  private final int capacity = 8;
        |  private int used;
        |
        |  public Store(int cap) {
        |    this.capacity = check(cap);
        |  }
        |
        |  public int get(String key) {
        |    return this.map.lookup(key);
        |  }
        |
        |  static class Entry {
        |    long offset;
        |    void seal() { flush(); }
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("import", "HashMap", ""), ("import", "max", ""),
      ("type", "Store", ""),
      ("const", "capacity", "Store"), ("var", "used", "Store"),
      ("function", "Store", "Store"), ("function", "get", "Store"),
      ("type", "Entry", "Store"),
      ("var", "offset", "Entry"), ("function", "seal", "Entry")))
    assert(us(0).edges == Seq(ParsedEdge("imports", "HashMap")))
    assert(us(1).edges == Seq(ParsedEdge("imports", "Math")))
    assert(us(5).edges.contains(ParsedEdge("method_of", "Store")))
    assert(us(5).edges.contains(ParsedEdge("calls", "check")))
    assert(us(6).edges.contains(ParsedEdge("calls_method", "lookup")))
    assert(us(9).edges.contains(ParsedEdge("calls", "flush")))
    assert(us(6).unitId == "src/X.java:Store:get")
  }

  test("@Test methods become test units; annotations are not calls") {
    val src =
      """class StoreTest {
        |  @Test
        |  public void roundtrips() {
        |    assertEquals(read(), written());
        |  }
        |  @Override
        |  @SuppressWarnings("unchecked")
        |  public String toString() { return render(this); }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "StoreTest"), ("test", "roundtrips"),
      ("function", "toString")))
    assert(us(1).edges.contains(ParsedEdge("calls", "assertEquals")))
    assert(us(1).edges.contains(ParsedEdge("calls", "read")))
    // @SuppressWarnings(...) must NOT read as a call
    assert(!us.flatMap(_.edges).exists(_.targetName == "SuppressWarnings"))
  }

  test("interfaces, records, enums; bodyless signatures; multi-line decls") {
    val src =
      """public interface Codec {
        |  byte[] encode(String s);
        |  default int size() { return bytes(this); }
        |}
        |public record Point(int x, int y) { }
        |enum Color { RED, GREEN }
        |class Impl {
        |  public long fold(
        |      long acc,
        |      long next) {
        |    return combine(acc, next);
        |  }
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Codec", ""), ("function", "encode", "Codec"),
      ("function", "size", "Codec"),
      ("type", "Point", ""), ("type", "Color", ""), ("type", "Impl", ""),
      ("function", "fold", "Impl")))
    assert(us(6).edges.contains(ParsedEdge("calls", "combine")))
    assert(us(6).lineStart == 8 && us(6).lineEnd == 12)
  }

  test("comments, strings, and text blocks are invisible; wildcard imports skipped") {
    val src =
      """import java.util.*;
        |class C {
        |  // fake(call)
        |  /* also fake(call) */
        |  String s = "quoted(call)";
        |  String t = \"\"\"
        |      block(call)
        |      \"\"\";
        |  void real() { genuine(); }
        |}
        |""".stripMargin.replace("\\\"", "\"")
    val us = parse(src)
    assert(us.count(_.unitType == "import") == 0)
    val calls = us.flatMap(_.edges).filter(_.edgeType == "calls")
      .map(_.targetName)
    assert(calls == Seq("genuine"))
  }

  test("a file with no declarations falls back to one document unit") {
    val us = JavaParser.parse("notes.java", "just some prose\nno code here\n")
    assert(us.map(_.unitType) == Seq("document"))
  }
}

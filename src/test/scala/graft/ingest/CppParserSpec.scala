package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the C++ extractor — same harness shape as
  * the other eight parser specs.
  */
class CppParserSpec extends AnyFunSuite {

  private def parse(src: String) = CppParser.parse("src/x.cpp", src)

  test("namespaces, classes, methods, out-of-line definitions") {
    val src =
      """#include <cstdio>
        |#include "store.hpp"
        |
        |namespace svc {
        |
        |constexpr int kRetries = 3;
        |
        |class Store {
        | public:
        |  Store(const char* addr) : addr_(addr) { validate(addr); }
        |  int get(const char* key) {
        |    return lookup(addr_, key);
        |  }
        |  static Store* open(const char* addr);
        | private:
        |  const char* addr_;
        |};
        |
        |Store* Store::open(const char* addr) {
        |  return new Store(validate(addr));
        |}
        |
        |static const char* validate(const char* addr) {
        |  return normalize(addr);
        |}
        |
        |}  // namespace svc
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("import", "cstdio", ""), ("import", "store", ""),
      ("const", "kRetries", ""),
      ("type", "Store", ""),
      ("function", "Store", "Store"),   // in-class constructor
      ("function", "get", "Store"),
      ("const", "addr_", "Store"),
      ("function", "open", "Store"),    // out-of-line definition
      ("function", "validate", "")))
    // the in-class `static Store* open(...);` prototype yields no unit:
    // exactly ONE `open`, from the out-of-line definition
    assert(us.count(_.name == "open") == 1)
    val ctor = us.find(u => u.name == "Store" && u.unitType == "function").get
    assert(ctor.edges.contains(ParsedEdge("calls", "validate")))
    assert(ctor.edges.contains(ParsedEdge("method_of", "Store")))
    val open = us.find(_.name == "open").get
    assert(open.edges.contains(ParsedEdge("calls", "validate")))
    assert(open.edges.contains(ParsedEdge("method_of", "Store")))
    assert(open.lineStart == 19 && open.lineEnd == 21)
    assert(us.find(_.name == "get").get.edges
      .contains(ParsedEdge("calls", "lookup")))
  }

  test("gtest TEST registration, using-imports, using-aliases") {
    val src =
      """#include "store.hpp"
        |#include <gtest/gtest.h>
        |
        |using svc::Store;
        |using Clock = std::chrono::steady_clock;
        |using namespace std;
        |
        |TEST(StoreTest, OpensStore) {
        |  Store* s = Store::open("x");
        |  EXPECT_EQ(0, s->get("k"));
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("import", "store"), ("import", "gtest"),
      ("import", "Store"), ("type", "Clock"),
      ("test", "StoreTest.OpensStore")))
    val t = us.find(_.unitType == "test").get
    assert(t.unitId == "src/x.cpp:test:8")
    // `Store::open(` scans as a call to `open`; `->get(` as a plain call
    assert(t.edges.contains(ParsedEdge("calls", "open")))
    assert(t.edges.contains(ParsedEdge("calls", "get")))
  }

  test("templates, enum class, destructors, fields") {
    val src =
      """template <typename T>
        |T max2(T a, T b) {
        |  return pick(a, b);
        |}
        |
        |template <class T> class Vec {
        | public:
        |  ~Vec() { release(); }
        |  int size_ = 0;
        |};
        |
        |enum class Color { Red, Green };
        |
        |struct Point {
        |  int x;
        |  int y;
        |};
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "max2", ""),
      ("type", "Vec", ""),
      ("function", "~Vec", "Vec"),
      ("var", "size_", "Vec"),
      ("type", "Color", ""),
      ("type", "Point", ""),
      ("var", "x", "Point"),
      ("var", "y", "Point")))
    assert(us.find(_.name == "max2").get.edges
      .contains(ParsedEdge("calls", "pick")))
    assert(us.find(_.name == "~Vec").get.edges
      .contains(ParsedEdge("calls", "release")))
    // enum bodies hold constants, not members: no Red/Green units
    assert(!us.exists(_.name == "Red"))
  }

  test("GNU-style heads: return type and qualifier on their own lines") {
    val src =
      """namespace svc {
        |
        |class Ring {
        | public:
        |  _MACRO_QUALIFIER
        |  void
        |  push(int v);
        |  int
        |  pop() {
        |    return take_last();
        |  }
        |};
        |
        |void
        |Ring::
        |push(int v) {
        |  grow(v);
        |}
        |
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Ring", ""),
      ("function", "pop", "Ring"),
      ("function", "push", "Ring"))) // out-of-line; in-class prototype skipped
    assert(us.find(_.name == "pop").get.edges
      .contains(ParsedEdge("calls", "take_last")))
    assert(us.find(_.name == "push").get.edges
      .contains(ParsedEdge("calls", "grow")))
  }

  test("prototypes, forward declarations, friends emit nothing") {
    val src =
      """class Store;
        |int free_fn(int x);
        |
        |class Keeper {
        |  friend class Store;
        |  void helper();
        |  int run() { return helper_impl(); }
        |};
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "Keeper"), ("function", "run")))
    assert(us.find(_.name == "run").get.edges
      .contains(ParsedEdge("calls", "helper_impl")))
  }

  test("cleaning: raw strings, digit separators, comments hide ghosts") {
    val src =
      """// int ghost1() {}
        |/* int ghost2() {
        |   still comment */
        |const char* s = R"(int ghost3() {} ")";
        |const long big = 1'000'000;
        |int real() {
        |  char c = '{';
        |  return keep(big);
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.count(_.unitType == "function") == 1)
    assert(us.find(_.name == "real").get.edges
      .contains(ParsedEdge("calls", "keep")))
    assert(!us.exists(_.name.startsWith("ghost")))
    assert(us.exists(u => u.unitType == "const" && u.name == "big"))
    assert(us.exists(u => u.unitType == "const" && u.name == "s"))
  }

  test("preprocessor: function-like macros still join continuations") {
    val src =
      """#define GUARD(x)          \
        |    do {                  \
        |        validate(x);      \
        |    } while (0)
        |
        |void drive() {
        |  GUARD(1);
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "GUARD"), ("function", "drive")))
    assert(us.find(_.name == "GUARD").get.edges
      .contains(ParsedEdge("calls", "validate")))
    assert(us.find(_.name == "drive").get.edges
      .contains(ParsedEdge("calls", "GUARD")))
  }

  test("attributes are transparent: [[nodiscard]], __attribute__, __declspec") {
    val src =
      """[[nodiscard]] int probe() {
        |  return peek();
        |}
        |class Api {
        | public:
        |  [[deprecated("old")]] int legacy() { return shim(); }
        |  __declspec(dllexport) int exported() { return impl(); }
        |};
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "probe", ""),
      ("type", "Api", ""),
      ("function", "legacy", "Api"),
      ("function", "exported", "Api")))
    assert(us.find(_.name == "probe").get.edges
      .contains(ParsedEdge("calls", "peek")))
  }

  test("operator overloads: in-class, out-of-line, and free forms") {
    val src =
      """class Vec {
        | public:
        |  int operator[](int i) { return at(i); }
        |  bool operator==(const Vec& o) const {
        |    return same(o);
        |  }
        |  bool operator<(const Vec& o) const { return less(o); }
        |};
        |
        |Vec& Vec::operator+=(const Vec& o) {
        |  grow(o);
        |  return *this;
        |}
        |
        |std::ostream& operator<<(std::ostream& os, const Vec& v) {
        |  return render(os, v);
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Vec", ""),
      ("function", "operator[]", "Vec"),
      ("function", "operator==", "Vec"),
      ("function", "operator<", "Vec"), // the template-args trap shape
      ("function", "operator+=", "Vec"),
      ("function", "operator<<", "")))
    assert(us.find(_.name == "operator==").get.edges
      .contains(ParsedEdge("calls", "same")))
    assert(us.find(_.name == "operator+=").get.edges
      .contains(ParsedEdge("method_of", "Vec")))
    assert(us.find(_.name == "operator<<").get.edges
      .contains(ParsedEdge("calls", "render")))
    // conversion operators: no return type, the target type is the name
    val conv = parse(
      """class Handle {
        | public:
        |  explicit operator bool() const { return check(); }
        |  operator std::string() const { return repr(); }
        |};
        |""".stripMargin)
    assert(conv.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Handle", ""),
      ("function", "operator bool", "Handle"),
      ("function", "operator std::string", "Handle")))
    assert(conv.find(_.name == "operator bool").get.edges
      .contains(ParsedEdge("calls", "check")))
  }

  test("literal preprocessor arms: #if 0 dead code is skipped whole") {
    val src =
      """#if 0
        |class Ghost {
        |  void haunt() { boo(); }
        |#else
        |class Live {
        | public:
        |  int ping() { return pong(); }
        |};
        |#endif
        |""".stripMargin
    val us = parse(src)
    // the dead arm's unbalanced class brace must not corrupt scope:
    // Live parses at file scope with its method attached
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("type", "Live", ""), ("function", "ping", "Live")))
    assert(us.find(_.name == "ping").get.edges
      .contains(ParsedEdge("calls", "pong")))
  }

  test("macro conditions: first arm wins, #else arm suppressed") {
    val src =
      """#ifdef _WIN32
        |void poll_impl() { win_poll(); }
        |#else
        |void poll_impl() { epoll_wait_loop(); }
        |#endif
        |
        |#ifdef USE_TLS
        |class Conn {
        | public:
        |  int send() { return tls_send(); }
        |#else
        |class Conn {
        | public:
        |  int send() { return raw_send(); }
        |#endif
        |};
        |""".stripMargin
    val us = parse(src)
    // exactly ONE poll_impl (both-arm inclusion would double it) and
    // ONE Conn/send pair — the second shape's per-arm unbalanced
    // braces must not corrupt scope depth
    assert(us.map(u => (u.unitType, u.name, u.parentContainer)) == Seq(
      ("function", "poll_impl", ""),
      ("type", "Conn", ""), ("function", "send", "Conn")))
    assert(us.find(_.name == "poll_impl").get.edges
      .contains(ParsedEdge("calls", "win_poll")))
    assert(us.find(_.name == "send").get.edges
      .contains(ParsedEdge("calls", "tls_send")))
  }

  test("suppressed-arm recovery: class-body and file-scope definitions") {
    val src =
      """class Conn {
        | public:
        |#ifdef _WIN32
        |  int send() { return win_send(); }
        |  int win_only() { return 1; }
        |#else
        |  int send() { return raw_send(); }
        |  int posix_only() { return 2; }
        |#endif
        |};
        |
        |#ifdef _WIN32
        |#else
        |int util::helper(int x) { return x; }
        |static int posix_free(void) { return 3; }
        |#define POSIX_CAP 64
        |#endif
        |""".stripMargin
    val us = parse(src)
    // the taken arm's send wins with its call edge; the #else twin is
    // dropped; #else-ONLY definitions are recovered with the LIVE
    // class context (posix_only attributes to Conn) and at file scope
    // (free fn, qualified method, macro) — names only, no call edges
    assert(us.count(_.name == "send") == 1)
    assert(us.find(_.name == "send").get.edges
      .contains(ParsedEdge("calls", "win_send")))
    val po = us.find(_.name == "posix_only").get
    assert(po.arm == "suppressed" && po.parentContainer == "Conn")
    assert(po.edges == Seq(ParsedEdge("method_of", "Conn")))
    val h = us.find(_.name == "helper").get
    assert(h.arm == "suppressed" && h.parentContainer == "util")
    assert(us.find(_.name == "posix_free").get.arm == "suppressed")
    assert(us.find(_.name == "posix_free").get.edges.isEmpty)
    assert(us.find(_.name == "POSIX_CAP").get.arm == "suppressed")
    assert(us.find(_.name == "POSIX_CAP").get.unitType == "const")
  }

  test("a non-conditional directive mid-body does not reset the arm depth") {
    // r13 (ADVICE): CondTracker used to zero armDepth for EVERY
    // directive, including #define/#pragma/#include — inside a
    // recoverable suppressed arm, a #define in the middle of a
    // function body made the following block-local lines scan at
    // "file scope", recovering spurious suppressed units (the
    // function-style macro loop header below).
    val src =
      """#ifdef _WIN32
        |#else
        |int helper(int x) {
        |#define CAP 4
        |  list_for_each(it, x) {
        |    use(it);
        |  }
        |  return 0;
        |}
        |#endif
        |""".stripMargin
    val us = parse(src)
    assert(us.exists(u => u.name == "helper" && u.arm == "suppressed"))
    assert(us.exists(u => u.name == "CAP" && u.arm == "suppressed"))
    assert(!us.exists(_.name == "list_for_each"))
    // the arm-policy edge contract (r13, measured by tools/ArmProbe):
    // call-sites inside a suppressed arm emit NO edges — the recovered
    // unit is a name-only index entry
    assert(us.find(u => u.name == "helper" && u.arm == "suppressed")
      .get.edges.isEmpty)
  }

  test("constructor init-lists: nested calls are genuine, heads are not") {
    val src =
      """class Store {
        | public:
        |  Store(int v) : v_(clamp(v)), base_(v) { open_conn(); }
        |  int get() { return v_; }
        | private:
        |  int v_;
        |  int base_;
        |};
        |
        |Store::Store(int v, int w) : v_(check(v, w)), base_(w) { }
        |""".stripMargin
    val us = parse(src)
    val ctors = us.filter(u => u.name == "Store" && u.unitType == "function")
    assert(ctors.size == 2)
    val inClass = ctors.head
    // nested init calls ARE edges; member-init heads are NOT
    assert(inClass.edges.contains(ParsedEdge("calls", "clamp")))
    assert(inClass.edges.contains(ParsedEdge("calls", "open_conn")))
    assert(!inClass.edges.exists(_.targetName == "v_"))
    assert(!inClass.edges.exists(_.targetName == "base_"))
    val outOfLine = ctors.last
    assert(outOfLine.edges.contains(ParsedEdge("calls", "check")))
    assert(!outOfLine.edges.exists(_.targetName == "v_"))
    // a non-ctor method with no init list gains no call edges
    assert(!us.find(_.name == "get").get.edges.exists(_.edgeType == "calls"))
  }

  test("ns::f free-function definitions are scope-qualified, not methods") {
    val src =
      """namespace net {
        |class Socket {
        | public:
        |  int fd() const;
        |};
        |int connect_to(const char* host);
        |}
        |
        |int net::Socket::fd() const { return fd_; }
        |
        |int net::connect_to(const char* host) {
        |  return dial(host);
        |}
        |""".stripMargin
    val us = parse(src)
    // `net::connect_to` — net is a namespace THIS file opened — is a
    // FREE function (no container, no method_of); `net::Socket::fd`
    // still attributes to Socket, the qualifier adjacent to the name
    val ct = us.find(_.name == "connect_to").get
    assert(ct.parentContainer == "" && ct.unitType == "function")
    assert(!ct.edges.exists(_.edgeType == "method_of"))
    assert(ct.edges.contains(ParsedEdge("calls", "dial")))
    val fd = us.find(_.name == "fd").get
    assert(fd.parentContainer == "Socket")
    assert(fd.edges.contains(ParsedEdge("method_of", "Socket")))
  }

  test("prefixed char literals L'a'/u8'x' don't corrupt the line") {
    val src =
      """void emit() {
        |  wchar_t w = L'"'; write_w(w);
        |  char8_t c = u8'{'; write_c(c);
        |  int big = 1'000'000; keep(big);
        |}
        |""".stripMargin
    val us = parse(src)
    // the literal quote/brace payloads must be blanked (no phantom
    // string state, no scope shift) and the same-line calls survive
    assert(us.map(_.name) == Seq("emit"))
    val e = us.head.edges
    assert(e.contains(ParsedEdge("calls", "write_w")))
    assert(e.contains(ParsedEdge("calls", "write_c")))
    assert(e.contains(ParsedEdge("calls", "keep")))
    assert(us.head.lineEnd == 5)
  }

  test("DispatchParser routes the C++ extension family to CppParser") {
    for (ext <- Seq("cpp", "cc", "cxx", "hpp", "hh", "hxx")) {
      val us = DispatchParser.parse(s"a/b.$ext",
        "class K {\n public:\n  int f() { return g(); }\n};\n")
      assert(us.map(u => (u.unitType, u.name)) ==
        Seq(("type", "K"), ("function", "f")), ext)
      assert(us.last.edges.contains(ParsedEdge("calls", "g")), ext)
    }
    // `.h` still routes to CParser (C owns the extension)
    val h = DispatchParser.parse("a/b.h", "int f(void);\nint g(void) { return 1; }\n")
    assert(h.map(_.name) == Seq("g"))
  }

  test("dogfood: parses real libstdc++ headers without losing its footing") {
    // template-saturated real C++ is the adversarial input this
    // extractor will actually meet: SFINAE, attribute macros,
    // preprocessor guards, out-of-line template member definitions
    val base = new java.io.File("/usr/include/c++")
    assume(base.isDirectory)
    val ver = base.listFiles().headOption.getOrElse(fail("no libstdc++"))
    for (name <- Seq("bits/stl_vector.h", "bits/stl_pair.h")) {
      val f = new java.io.File(ver, name)
      assume(f.exists())
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val us = CppParser.parse(name, src)
      assert(us.nonEmpty, name)
      us.foreach { u =>
        assert(u.lineStart >= 1 && u.lineEnd >= u.lineStart,
          s"$name ${u.unitId}")
        assert(u.unitId.nonEmpty && u.unitType.nonEmpty, name)
      }
    }
    // decades-stable facts, not version-pinned minutiae
    val sv = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(ver, "bits/stl_vector.h").toPath), "UTF-8")
    val us = CppParser.parse("bits/stl_vector.h", sv)
    assert(us.exists(u => u.unitType == "type" && u.name == "vector"))
    assert(us.exists(u => u.unitType == "function" &&
      u.name == "push_back" && u.parentContainer == "vector"))
    val sp = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(ver, "bits/stl_pair.h").toPath), "UTF-8")
    val up = CppParser.parse("bits/stl_pair.h", sp)
    assert(up.exists(u => u.unitType == "type" && u.name == "pair"))
  }

  test("dogfood breadth: every libstdc++ bits/ header parses with sane units") {
    // the full template-metaprogramming gauntlet: SFINAE headers,
    // compiler intrinsics, _GLIBCXX macros, deep preprocessor nesting
    val base = new java.io.File("/usr/include/c++")
    assume(base.isDirectory)
    val ver = base.listFiles().headOption.getOrElse(fail("no libstdc++"))
    val bits = new java.io.File(ver, "bits")
    assume(bits.isDirectory)
    val headers = bits.listFiles().filter(_.getName.endsWith(".h")).sortBy(_.getName)
    assume(headers.length > 50)
    var units = 0
    for (f <- headers) {
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val us = CppParser.parse(s"bits/${f.getName}", src)
      units += us.length
      us.foreach { u =>
        assert(u.lineStart >= 1 && u.lineEnd >= u.lineStart,
          s"${f.getName} ${u.unitId}")
        assert(u.unitId.nonEmpty && u.unitType.nonEmpty && u.name.nonEmpty,
          f.getName)
        assert(!u.name.startsWith("__attribute"), s"${f.getName} ${u.unitId}")
      }
    }
    // the corpus is ~100+ headers of real C++; a scan that silently
    // extracted nothing would pass per-unit invariants vacuously
    assert(units > 2000, s"only $units units across ${headers.length} headers")
  }
}

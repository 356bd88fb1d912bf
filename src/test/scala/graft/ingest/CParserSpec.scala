package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape tests for the C extractor — same harness shape as the
  * other seven parser specs.
  */
class CParserSpec extends AnyFunSuite {

  private def parse(src: String) = CParser.parse("src/x.c", src)

  test("includes, defines, functions, globals: the declared surface") {
    val src =
      """#include <stdio.h>
        |#include "util/helpers.h"
        |
        |#define MAX_CONNS 8
        |#define GUARD(x) validate(x)
        |
        |static int retries = 3;
        |const char *proto = "tcp";
        |
        |struct store {
        |    int conns;
        |};
        |
        |struct store *open_store(const char *addr) {
        |    return wrap(validate(addr));
        |}
        |
        |static char *validate(const char *addr) {
        |    return normalize(addr);
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("import", "stdio"), ("import", "helpers"),
      ("const", "MAX_CONNS"), ("function", "GUARD"),
      ("var", "retries"), ("const", "proto"),
      ("type", "store"),
      ("function", "open_store"), ("function", "validate")))
    // the function-like macro's replacement text is call-scanned
    assert(us.find(_.name == "GUARD").get.edges
      .contains(ParsedEdge("calls", "validate")))
    val open = us.find(_.name == "open_store").get
    assert(open.edges.contains(ParsedEdge("calls", "validate")))
    assert(open.edges.contains(ParsedEdge("calls", "wrap")))
    assert(open.lineStart == 14 && open.lineEnd == 16)
    assert(us.find(_.name == "validate").get.edges
      .contains(ParsedEdge("calls", "normalize")))
  }

  test("multi-line function-like macros: whole replacement list scanned") {
    val src =
      """#define RETRY(op, n)            \
        |    do {                        \
        |        if (!try_once(op))      \
        |            backoff(n);         \
        |    } while (0)
        |
        |#define BANNER "multi \
        |line string"
        |
        |static int live = 1;
        |
        |int drive(void) {
        |    RETRY(live, 3);
        |    return 0;
        |}
        |""".stripMargin
    val us = parse(src)
    // the continuation lines are consumed: no spurious units from the
    // macro body, the unbalanced do/while braces don't corrupt scope
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "RETRY"), ("const", "BANNER"),
      ("var", "live"), ("function", "drive")))
    val retry = us.find(_.name == "RETRY").get
    // calls from ALL continued lines, not just the first
    assert(retry.edges.contains(ParsedEdge("calls", "try_once")))
    assert(retry.edges.contains(ParsedEdge("calls", "backoff")))
    assert(retry.lineStart == 1 && retry.lineEnd == 5)
    assert(us.find(_.name == "drive").get.edges
      .contains(ParsedEdge("calls", "RETRY")))
  }

  test("prototypes and forward declarations emit nothing") {
    val src =
      """static char *validate(const char *addr);
        |struct store;
        |int get_item(struct store *s,
        |             const char *key);
        |int real_fn(void) {
        |    return probe();
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("real_fn"))
    assert(us.head.edges.contains(ParsedEdge("calls", "probe")))
  }

  test("K&R definitions: param declarations between ) and { still define") {
    val src =
      """int legacy_sum(a, b)
        |int a;
        |int b;
        |{
        |    return checked_add(a, b);
        |}
        |
        |int modern(int x);
        |
        |int driver(void) {
        |    return legacy_sum(1, 2);
        |}
        |""".stripMargin
    val us = parse(src)
    // the K&R shape defines; the true prototype still doesn't
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "legacy_sum"), ("function", "driver")))
    val legacy = us.find(_.name == "legacy_sum").get
    assert(legacy.edges.contains(ParsedEdge("calls", "checked_add")))
    assert(legacy.lineStart == 1 && legacy.lineEnd == 6)
    assert(us.find(_.name == "driver").get.edges
      .contains(ParsedEdge("calls", "legacy_sum")))
    // NOT K&R: a prototype followed by globals and a struct BODY —
    // the brace is not alone after a `;`, so nothing is swallowed
    val neg = parse(
      """int f(void);
        |int retries;
        |struct store {
        |    int conns;
        |};
        |""".stripMargin)
    assert(neg.map(u => (u.unitType, u.name)) ==
      Seq(("var", "retries"), ("type", "store")))
  }

  test("literal preprocessor arms: #if 0 dead code is skipped whole") {
    val src =
      """#if 0
        |int dead_fn(void) {
        |    haunt();
        |}
        |struct ghost {
        |#else
        |int live_fn(void) {
        |    return keep();
        |}
        |#endif
        |
        |#if 1
        |int also_live(void) { return 1; }
        |#else
        |int dead_else(void) { return 2; }
        |#endif
        |
        |#ifdef CONFIG_X
        |int arm_a(void) { return 3; }
        |#else
        |int arm_b(void) { return 4; }
        |#endif
        |
        |#if 0
        |int elif_dead(void) { return 5; }
        |#elif defined(CONFIG_Y)
        |int elif_taken(void) { return 6; }
        |#else
        |int elif_shadowed(void) { return 7; }
        |#endif
        |""".stripMargin
    val us = parse(src)
    // #if 0 arm skipped (even with unbalanced braces), #else live;
    // #if 1 live, its #else dead; macro conditions take the FIRST arm
    // (first-arm-wins, r11): arm_a in, arm_b suppressed — both-arm
    // inclusion double-counted declarations and let per-arm
    // unbalanced braces corrupt scope depth. An #elif reached with no
    // arm yet taken is itself first-arm-wins (elif_taken), and its
    // #else is shadowed. MACRO-suppressed arms recover their
    // definition NAMES as arm="suppressed" units, appended last (r12):
    // arm_b and elif_shadowed — but never the LITERALLY dead ones
    // (dead_fn, ghost, dead_else, elif_dead stay invisible: #if 0 is
    // the disabled-code idiom, and #if 1's #else is dead in every
    // config).
    assert(us.map(_.name) == Seq("live_fn", "also_live", "arm_a",
      "elif_taken", "arm_b", "elif_shadowed"))
    assert(us.find(_.name == "live_fn").get.edges
      .contains(ParsedEdge("calls", "keep")))
    assert(us.filter(_.arm == "suppressed").map(_.name) ==
      Seq("arm_b", "elif_shadowed"))
    // recovered units carry NO call edges — names only
    assert(us.find(_.name == "arm_b").get.edges.isEmpty)
  }

  test("suppressed-arm recovery: same-named active definition wins") {
    // the r10 double-count shape: first-arm-wins keeps ONE poll_impl
    // (the taken arm's, with its call edge); recovery must not bring
    // the #else twin back. An #else-ONLY definition (the POSIX half of
    // a platform split) is recovered, with its brace depth never
    // touching file scope.
    val src =
      """#ifdef _WIN32
        |int poll_impl(void) { return win_poll(); }
        |#else
        |int poll_impl(void) { return epoll_loop(); }
        |static int posix_fd(void) {
        |    int local_decl = 0;
        |    return helper(local_decl);
        |}
        |#endif
        |
        |int after(void) { return poll_impl(); }
        |""".stripMargin
    val us = parse(src)
    assert(us.map(_.name) == Seq("poll_impl", "after", "posix_fd"))
    assert(us.count(_.name == "poll_impl") == 1)
    assert(us.find(_.name == "poll_impl").get.edges
      .contains(ParsedEdge("calls", "win_poll")))
    val rec = us.find(_.name == "posix_fd").get
    assert(rec.arm == "suppressed" && rec.edges.isEmpty)
    // block-locals inside the recovered function's body never register
    assert(!us.exists(_.name == "local_decl"))
    // file scope survived the arm's braces: `after` parses normally
    assert(us.find(_.name == "after").get.arm == "")
  }

  test("typedefs: one-liner, struct tail name, function pointer") {
    val src =
      """typedef unsigned long word_t;
        |typedef struct {
        |    int id;
        |} handle_t;
        |typedef struct node {
        |    struct node *next;
        |} node_t;
        |typedef void (*callback_t)(int code);
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("type", "word_t"), ("type", "handle_t"),
      ("type", "node"), ("type", "node_t"), ("type", "callback_t")))
  }

  test("attribute macros are transparent to the structural matchers") {
    val src =
      """__attribute__((visibility("default"))) int exported(int x) {
        |    return work(x);
        |}
        |static int __attribute__((format(printf, 1, 2))) logf2(const char *fmt) {
        |    return emit(fmt);
        |}
        |struct __attribute__((packed)) wire {
        |    int a;
        |};
        |""".stripMargin
    val us = parse(src)
    assert(us.map(u => (u.unitType, u.name)) == Seq(
      ("function", "exported"), ("function", "logf2"),
      ("type", "wire")))
    assert(us.find(_.name == "exported").get.edges
      .contains(ParsedEdge("calls", "work")))
    // no bogus `__attribute__` function unit, even with nested parens
    assert(!us.exists(_.name.startsWith("__attribute")))
  }

  test("cleaning: comments and strings hide ghosts; locals are skipped") {
    val src =
      """// int ghost1(void) {}
        |/* int ghost2(void) {
        |   still comment */
        |const char *s = "int ghost3(void) {}";
        |int real(void) {
        |    int local = 1;
        |    char c = '{';
        |    return keep(local);
        |}
        |""".stripMargin
    val us = parse(src)
    assert(us.count(_.unitType == "function") == 1)
    assert(us.find(_.name == "real").get.edges
      .contains(ParsedEdge("calls", "keep")))
    assert(!us.exists(_.name.startsWith("ghost")))
    assert(!us.exists(_.name == "local"))
  }

  test("DispatchParser routes .c and .h to CParser") {
    for (ext <- Seq("c", "h")) {
      val us = DispatchParser.parse(s"a/b.$ext",
        "int f(void) {\n    return g();\n}\n")
      assert(us.map(_.unitType) == Seq("function"), ext)
      assert(us.head.edges.contains(ParsedEdge("calls", "g")))
    }
  }

  test("dogfood: parses real glibc headers without losing its footing") {
    // system headers are the adversarial C the extractor will actually
    // meet: deep preprocessor nesting, attribute macros, prototypes
    val inc = new java.io.File("/usr/include")
    assume(inc.isDirectory)
    for (name <- Seq("string.h", "stdlib.h", "errno.h")) {
      val f = new java.io.File(inc, name)
      assume(f.exists())
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val us = CParser.parse(name, src)
      assert(us.nonEmpty, name)
      us.foreach { u =>
        assert(u.lineStart >= 1 && u.lineEnd >= u.lineStart,
          s"$name ${u.unitId}")
        assert(u.unitId.nonEmpty && u.unitType.nonEmpty, name)
      }
    }
    // a couple of decades-stable facts, not version-pinned minutiae
    val sh = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(inc, "string.h").toPath), "UTF-8")
    val us = CParser.parse("string.h", sh)
    assert(us.exists(u => u.unitType == "const" && u.name == "_STRING_H"))
    assert(us.exists(_.unitType == "import")) // features.h et al.
    // prototypes must NOT register as function definitions
    assert(!us.exists(u => u.unitType == "function" && u.name == "strcpy"))
  }
}

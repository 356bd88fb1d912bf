package graft.queries

import graft.graph.{CodeGraph, GraphAlgos}
import graft.ingest.{DispatchParser, Ingest, SemanticResolver, SimpleParser, Workspace}
import org.apache.spark.sql.functions._

/** Entries for the ingestion pipeline and the heavier graph algorithms.
  *
  * The ingestion entries parse an embedded demo codebase (no fixture
  * dependency), so their oracle is the expected output as literal
  * VALUES — a golden-output check that catches any parser/resolver
  * regression.
  */
object QueriesIngest {
  import QueriesCore.Entry

  private val E = CodeGraph.edgesSql

  private val demoMain =
    """import "util.zig"
      |const MAX = 100
      |fn main() {
      |  helper(MAX)
      |  Parser.parse()
      |}
      |type Parser {
      |  fn parse() {
      |    tokenize()
      |  }
      |  fn tokenize() {
      |  }
      |}
      |test "main works" {
      |  main()
      |}
      |""".stripMargin

  private val demoUtil =
    """fn helper(x) {
      |  log(x)
      |}
      |fn log(x) {
      |}
      |""".stripMargin

  private def demoFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("src/main.zig", demoMain),
      Ingest.FileDoc("src/util.zig", demoUtil)).toDS()
  }

  // Scala demo codebase for the ScalaParser entries (r8): an object
  // with a method-call chain, a cross-file import, and a ScalaTest
  // FunSuite — the shapes ScalaParserSpec pins on the engine's own
  // sources, here in golden-oracle form.
  private val demoScalaPipeline =
    """import demo.MathUtil
      |
      |object Pipeline {
      |  val MaxRows = 100
      |  def run(): Int = {
      |    val data = load(MaxRows)
      |    MathUtil.clamp(data)
      |  }
      |  def load(n: Int): Int = n
      |}
      |""".stripMargin

  private val demoScalaUtil =
    """object MathUtil {
      |  def clamp(x: Int): Int = floor(x)
      |  def floor(x: Int): Int = x
      |}
      |""".stripMargin

  private val demoScalaSpec =
    """import org.scalatest.funsuite.AnyFunSuite
      |
      |class PipelineSpec extends AnyFunSuite {
      |  test("run works") {
      |    Pipeline.run()
      |  }
      |}
      |""".stripMargin

  private def demoScalaFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("app/Pipeline.scala", demoScalaPipeline),
      Ingest.FileDoc("app/MathUtil.scala", demoScalaUtil),
      Ingest.FileDoc("app/PipelineSpec.scala", demoScalaSpec)).toDS()
  }

  // Python demo codebase for the PythonParser entries (r8): the same
  // three-file shape as the Scala demo — a module with a const and a
  // call chain, a utility module reached via attribute call, and a
  // pytest-style test — the shapes PythonParserSpec pins on this
  // repo's own tools/ scripts, here in golden-oracle form.
  private val demoPyPipeline =
    """import mathutil
      |
      |MAX_ROWS = 100
      |
      |def run():
      |    data = load(MAX_ROWS)
      |    return mathutil.clamp(data)
      |
      |def load(n):
      |    return n
      |""".stripMargin

  private val demoPyUtil =
    """def clamp(x):
      |    return floor(x)
      |
      |def floor(x):
      |    return x
      |""".stripMargin

  private val demoPyTest =
    """import pipeline
      |
      |def test_run_works():
      |    assert pipeline.run() == 100
      |""".stripMargin

  private def demoPyFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("app/pipeline.py", demoPyPipeline),
      Ingest.FileDoc("app/mathutil.py", demoPyUtil),
      Ingest.FileDoc("app/test_pipeline.py", demoPyTest)).toDS()
  }

  // Go demo codebase for the GoParser entries (r8): a receiver method
  // (container from the receiver, not lexical scope), grouped and
  // single imports, a top-level const, and a `go test` function.
  private val demoGoStore =
    """package svc
      |
      |import "fmt"
      |
      |const MaxConns = 64
      |
      |type Store struct {
      |	addr string
      |}
      |
      |func Open(addr string) *Store {
      |	validate(addr)
      |	return &Store{addr: addr}
      |}
      |
      |func (s *Store) Get(key string) string {
      |	fmt.Println(key)
      |	return s.addr
      |}
      |
      |func validate(addr string) {
      |}
      |
      |var renderer = func(key string) string {
      |	validate(key)
      |	return key
      |}
      |""".stripMargin

  private val demoGoTest =
    """package svc
      |
      |func TestOpen(t *T) {
      |	s := Open("x")
      |	s.Get("k")
      |}
      |""".stripMargin

  private def demoGoFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("svc/store.go", demoGoStore),
      Ingest.FileDoc("svc/store_test.go", demoGoTest)).toDS()
  }

  // TypeScript demo codebase for the TsParser entries (r8d): a class
  // with constructor + method (lexical containers, unlike Go's
  // receivers), a plain exported function, a top-level arrow-function
  // binding, default + named imports, a const, and a jest-style test
  // whose arrow callback is the call scope.
  private val demoTsClient =
    """import axios from './transport'
      |import { parse } from './codec'
      |
      |export const RETRIES = 3
      |
      |export class Client {
      |  constructor(addr: string) {
      |    this.addr = validate(addr)
      |  }
      |  fetch(path: string): string {
      |    return axios.get(`${validate(this.addr)}${path}`)
      |  }
      |}
      |
      |export function validate(addr: string): string {
      |  return parse(addr)
      |}
      |
      |export function strip(s: string): string {
      |  return s.replace(/['"]+/g, validate(s))
      |}
      |
      |export const shorten = (s: string) => s.slice(0, 8)
      |""".stripMargin

  private val demoTsTest =
    """import { Client } from './client'
      |
      |test('client fetches', () => {
      |  const c = new Client('x')
      |  c.fetch('/id')
      |})
      |""".stripMargin

  // Java demo codebase for the JavaParser entries (r8e): a class with
  // a static-final const, a static factory guarding with a validator
  // (the callers-trace spine), a method, a static import binding the
  // factory into the JUnit-style test.
  private val demoJavaStore =
    """import java.util.HashMap;
      |
      |public class Store {
      |  public static final int MAX_CONNS = 8;
      |
      |  public static Store open(String addr) {
      |    return new Store(validate(addr));
      |  }
      |
      |  static String validate(String addr) {
      |    return normalize(addr);
      |  }
      |
      |  public String get(String key) {
      |    return lookup(key);
      |  }
      |}
      |""".stripMargin

  private val demoJavaTest =
    """import static app.Store.open;
      |
      |public class StoreTest {
      |  @Test
      |  public void openChecks() {
      |    open("x");
      |  }
      |}
      |""".stripMargin

  private def demoJavaFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("app/Store.java", demoJavaStore),
      Ingest.FileDoc("app/StoreTest.java", demoJavaTest)).toDS()
  }

  private def demoTsFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("api/client.ts", demoTsClient),
      Ingest.FileDoc("api/client.test.ts", demoTsTest)).toDS()
  }

  // Rust demo codebase for the RustParser entries (r9): a struct with
  // an impl block (methods attach via the impl's SELF type), a
  // top-level const, a guarded constructor (the callers-trace spine),
  // a use import, and a #[test]-armed fn reaching the constructor.
  private val demoRustStore =
    """use std::collections::HashMap;
      |
      |pub struct Store {
      |    map: HashMap<String, String>,
      |}
      |
      |pub const RETRIES: u32 = 3;
      |
      |impl Store {
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
      |""".stripMargin

  private val demoRustTest =
    """use crate::store::Store;
      |
      |#[test]
      |fn opens_store() {
      |    let s = Store::open("x");
      |    s.get("k");
      |}
      |""".stripMargin

  private def demoRustFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("svc/store.rs", demoRustStore),
      Ingest.FileDoc("svc/store_test.rs", demoRustTest)).toDS()
  }

  // C demo codebase for the CParser entries (r9): includes, an
  // object-like and a function-like macro (the macro GUARDS with the
  // validator, so macro call-graph resolution is part of the trace),
  // a struct definition, a guarded constructor, and a check function
  // reaching the constructor from a second translation unit.
  private val demoCStore =
    """#include <stdio.h>
      |#include "store.h"
      |
      |#define MAX_CONNS 8
      |#define GUARD(x)          \
      |    do {                  \
      |        validate(x);      \
      |        log_retry(x);     \
      |    } while (0)
      |
      |static int retries = 3;
      |
      |struct store {
      |    int conns;
      |};
      |
      |struct store *open_store(const char *addr) {
      |    return wrap(validate(addr));
      |}
      |
      |int get_item(struct store *s, const char *key) {
      |    return lookup(s, key);
      |}
      |
      |static char *validate(const char *addr) {
      |    return normalize(addr);
      |}
      |""".stripMargin

  private val demoCCheck =
    """#include "store.h"
      |
      |int check_open(void) {
      |    struct store *s = open_store("x");
      |    return get_item(s, "k");
      |}
      |""".stripMargin

  private def demoCFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("svc/store.c", demoCStore),
      Ingest.FileDoc("svc/store_check.c", demoCCheck)).toDS()
  }

  // C++ demo codebase for the CppParser entries (r10; extended r12): a
  // namespace (transparent scope), a class with an in-class constructor
  // whose initializer-list ITEM HEADS must not scan as calls but whose
  // NESTED init call (`addr_(validate(addr))`) is the ctor's only path
  // to `validate` (pinning initListArgs), an in-class method, an
  // in-class PROTOTYPE defined out-of-line (`Store::open` — the
  // Go-receiver shape: exactly one unit), a file-scope free function, a
  // platform split pinning first-arm-wins + suppressed-arm recovery
  // (same-named `flush_store` in both arms → ONE active unit;
  // `posix_retries` only in the non-taken arm → recovered with
  // arm = 'suppressed'), a qualified definition in a file that never
  // opens `svc` (resolver-time orphan downgrade), and a gtest TEST
  // reaching the class through a `using` import.
  private val demoCppStore =
    """#include <cstdio>
      |#include "store.hpp"
      |
      |#define MAX_CONNS 8
      |
      |namespace svc {
      |
      |constexpr int kRetries = 3;
      |
      |class Store {
      | public:
      |  Store(const char* addr) : addr_(validate(addr)) { log_open(addr); }
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
      |#ifdef _WIN32
      |int flush_store(Store* s) { return win_flush(s); }
      |#else
      |int flush_store(Store* s) { return posix_flush(s); }
      |#endif
      |
      |#ifdef _WIN32
      |#else
      |static int posix_retries(void) { return 2; }
      |#endif
      |
      |}  // namespace svc
      |""".stripMargin

  // `svc` opens only in store.cpp — this file's `svc::helper` scans as
  // a method of `svc` at parse time (the per-file lexical limit) and is
  // downgraded to a FREE function at resolver time, because no TYPE
  // unit named `svc` exists anywhere in the workspace (r12,
  // SemanticResolver.downgradeOrphanMethods).
  private val demoCppUtil =
    """#include "store.hpp"
      |
      |int svc::helper(int n) {
      |  return n + 1;
      |}
      |""".stripMargin

  private val demoCppTest =
    """#include "store.hpp"
      |#include <gtest/gtest.h>
      |
      |using svc::Store;
      |
      |TEST(StoreTest, OpensStore) {
      |  Store* s = Store::open("x");
      |  EXPECT_EQ(0, s->get("k"));
      |}
      |""".stripMargin

  private def demoCppFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(Ingest.FileDoc("svc/store.cpp", demoCppStore),
      Ingest.FileDoc("svc/util.cpp", demoCppUtil),
      Ingest.FileDoc("svc/store_test.cpp", demoCppTest)).toDS()
  }

  /** The C++ demo's workspace-level unit view: parse + the resolver's
    * orphan-method downgrade (r12) — what [[graft.api.WorkspaceStore]]
    * ingests through.
    */
  private def demoCppUnits(s: org.apache.spark.sql.SparkSession) =
    SemanticResolver.downgradeOrphanMethods(
      Ingest.parseFiles(demoCppFiles(s), DispatchParser))

  /** Deterministic on-disk tree for the directory-source entry: code
    * files that pass the globs, a doc file, a glob-excluded vendor file,
    * an oversized file (> 1 MiB cap) and an empty file (both must be
    * skipped by the reader, like the reference's enumeration filters).
    * Written idempotently under target/ so every run sees the same tree.
    */
  private def fixtureTree(): String = {
    // relative to the JVM's working directory (the checkout), not a
    // hardcoded absolute path — any clone location works
    val root = new java.io.File(
      new java.io.File(sys.props("user.dir")), "target/ingest-fixture")
    def write(relPath: String, content: String): Unit = {
      val f = new java.io.File(root, relPath)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    write("main.zig",
      "import \"util\"\nfn main() {\n  helper()\n  util_fn()\n}\nfn helper() {\n  compute()\n}\n")
    write("lib/util.zig",
      "type Util {\n  fn util_fn() {\n    compute()\n  }\n}\nfn compute() {\n}\n")
    write("docs/readme.md", "Toy fixture tree for the directory ingestion source.\n")
    write("vendor/dep.zig", "fn vendored() {\n}\n")
    write("big.zig", "x" * (1024 * 1024 + 1))
    write("empty.zig", "")
    root.getAbsolutePath
  }

  val entries: Seq[Entry] = Seq(

    // Full directory pipeline: binaryFile tree scan → glob
    // include/exclude → 1 MiB length-pushdown cap → parse → stats.
    // Golden-output oracle (the tree is deterministic): 3 files pass the
    // filters, yielding 7 units and 6 raw edges.
    ("ingest_directory_stats",
      (s, d) => {
        val root = fixtureTree()
        val files = Ingest.readDirectory(s, root,
          include = Seq("**/*.zig", "**/*.md"), exclude = Seq("vendor/**"))
        Ingest.stats(files, Ingest.parseFiles(files, SimpleParser))
      },
      Some("""SELECT CAST(3 AS BIGINT) AS files_processed,
        | CAST(7 AS BIGINT) AS blocks_generated,
        | CAST(6 AS BIGINT) AS raw_edges,
        | CAST(0 AS BIGINT) AS suppressed_arm_units"""
        .stripMargin.replace("\n", " "))),

    // link → link → unlink → re-link registry roundtrip through the real
    // MVCC write path (put = epoch sequence, unlink = tombstone); the
    // current view must show the re-linked root, not the tombstoned one
    // (reference manager.zig:113-377).
    ("workspace_lifecycle",
      (s, d) => {
        import s.implicits._
        val noFiles = Seq.empty[Ingest.FileDoc].toDS()
        var reg = Workspace.emptyRegistry(s)
        reg = Workspace.link(reg, "alpha", "/data/alpha", noFiles)._1
        reg = Workspace.link(reg, "beta", "/data/beta", noFiles)._1
        reg = Workspace.unlink(reg, "alpha")
        reg = Workspace.link(reg, "alpha", "/data/alpha2", noFiles)._1
        Workspace.linked(reg).orderBy("id")
      },
      Some("""SELECT * FROM (VALUES ('alpha', '/data/alpha2'),
        | ('beta', '/data/beta')) t(id, root_path) ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    // REAL-CODEBASE ingestion (r8): the reference's own source tree is
    // the fixture — "Code is a graph. Query it." on kausaldb itself.
    // Golden-count oracle over the pinned read-only `src/query` subtree:
    // unit counts per type from the ZigParser walk and resolved-edge
    // counts per type from the scoped-then-global SemanticResolver
    // (reference zig_parser.zig:317-380,575-598,646-680 +
    // semantic_resolver.zig:110-162). Any extractor/resolver drift
    // breaks the hash.
    ("ingest_zig_reference",
      (s, d) => {
        val files = Ingest.readDirectory(s, "/root/reference/src/query",
          include = Seq("**/*.zig"))
        val units = Ingest.parseFiles(files, DispatchParser)
        val unitCounts = units.toDF().groupBy(col("unitType").as("name"))
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("unit"))
        val edgeCounts = SemanticResolver.resolveEdges(units)
          .groupBy(col("edge_type").as("name"))
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("edge"))
        unitCounts.unionByName(edgeCounts)
          .select("kind", "name", "n").orderBy("kind", "name")
      },
      Some("""SELECT * FROM (VALUES
        | ('edge', 'calls', CAST(63 AS BIGINT)),
        | ('edge', 'calls_method', 351),
        | ('edge', 'imports', 28),
        | ('edge', 'method_of', 144),
        | ('unit', 'const', 523),
        | ('unit', 'function', 182),
        | ('unit', 'import', 53),
        | ('unit', 'test', 46),
        | ('unit', 'type', 51),
        | ('unit', 'var', 175)
        |) t(kind, name, n) ORDER BY kind, name"""
        .stripMargin.replace("\n", " "))),

    // The README demo on the reference's own code
    // (/root/reference/README.md:28-38): link the full src tree, then
    // `show --relation callers --target find_callers` — the engine
    // function plus the CLI-protocol handlers that call it, through the
    // real BFS traversal. Golden output pins parser + resolver +
    // traversal end-to-end on a real codebase.
    ("ingest_zig_callers",
      (s, d) => {
        import graft.api.Cli
        val files = Ingest.readDirectory(s, "/root/reference/src",
          include = Seq("**/*.zig"))
        val units = Ingest.parseFiles(files, DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "kausaldb")
        val edges = SemanticResolver.edgesAsBlocks(units, "kausaldb")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "find_callers", "kausaldb", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'query/engine.zig:QueryEngine:find_callers'),
        | (1, 'server/cli_protocol.zig:handle_show_callers_request'),
        | (1, 'server/cli_protocol.zig:handle_trace_request'),
        | (2, 'server/cli_protocol.zig:handle_cli_message')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // SCALA extraction (r8): the second real language behind the
    // pluggable parser — and the one the engine itself is written in
    // (ScalaParserSpec ingests this repository's own sources; the
    // golden oracle here pins the same unit surface on a stable demo).
    ("ingest_scala_units",
      (s, d) => Ingest.parseFiles(demoScalaFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('app/MathUtil.scala:MathUtil', 'type', 'MathUtil', ''),
        | ('app/MathUtil.scala:MathUtil:clamp', 'function', 'clamp', 'MathUtil'),
        | ('app/MathUtil.scala:MathUtil:floor', 'function', 'floor', 'MathUtil'),
        | ('app/Pipeline.scala:Pipeline', 'type', 'Pipeline', ''),
        | ('app/Pipeline.scala:Pipeline:MaxRows', 'const', 'MaxRows', 'Pipeline'),
        | ('app/Pipeline.scala:Pipeline:load', 'function', 'load', 'Pipeline'),
        | ('app/Pipeline.scala:Pipeline:run', 'function', 'run', 'Pipeline'),
        | ('app/Pipeline.scala:import:MathUtil', 'import', 'MathUtil', ''),
        | ('app/PipelineSpec.scala:PipelineSpec', 'type', 'PipelineSpec', ''),
        | ('app/PipelineSpec.scala:import:AnyFunSuite', 'import', 'AnyFunSuite', ''),
        | ('app/PipelineSpec.scala:test:4', 'test', 'run works', 'PipelineSpec')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // The README demo on the Scala demo codebase: who calls `clamp`,
    // two hops — the direct caller plus its test coverage, through
    // parser → resolver → blocks/edges → BFS, end to end.
    ("ingest_scala_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoScalaFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "graft")
        val edges = SemanticResolver.edgesAsBlocks(units, "graft")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "clamp", "graft", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'app/MathUtil.scala:MathUtil:clamp'),
        | (1, 'app/Pipeline.scala:Pipeline:run'),
        | (2, 'app/PipelineSpec.scala:test:4')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // PYTHON extraction (r8): the third real language — indentation
    // scoping instead of braces, pytest test registration, attribute
    // call-sites (PythonParserSpec dogfoods this repo's own tools/
    // scripts; the golden oracle pins the unit surface on the demo).
    ("ingest_python_units",
      (s, d) => Ingest.parseFiles(demoPyFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('app/mathutil.py:clamp', 'function', 'clamp', ''),
        | ('app/mathutil.py:floor', 'function', 'floor', ''),
        | ('app/pipeline.py:MAX_ROWS', 'const', 'MAX_ROWS', ''),
        | ('app/pipeline.py:import:mathutil', 'import', 'mathutil', ''),
        | ('app/pipeline.py:load', 'function', 'load', ''),
        | ('app/pipeline.py:run', 'function', 'run', ''),
        | ('app/test_pipeline.py:import:pipeline', 'import', 'pipeline', ''),
        | ('app/test_pipeline.py:test:3', 'test', 'test_run_works', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // The README demo on the Python demo codebase: who calls `clamp`,
    // two hops — the attribute-call site and its test coverage —
    // through parser → resolver → blocks/edges → BFS, end to end.
    ("ingest_python_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoPyFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "pydemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "pydemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "clamp", "pydemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'app/mathutil.py:clamp'),
        | (1, 'app/pipeline.py:run'),
        | (2, 'app/test_pipeline.py:test:3')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // GO extraction (r8): the fourth real language — containers from
    // RECEIVER declarations (methods live outside the type's braces),
    // grouped import/const blocks, `go test` registration.
    ("ingest_go_units",
      (s, d) => Ingest.parseFiles(demoGoFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('svc/store.go:MaxConns', 'const', 'MaxConns', ''),
        | ('svc/store.go:Open', 'function', 'Open', ''),
        | ('svc/store.go:Store', 'type', 'Store', ''),
        | ('svc/store.go:Store:Get', 'function', 'Get', 'Store'),
        | ('svc/store.go:import:fmt', 'import', 'fmt', ''),
        | ('svc/store.go:renderer', 'function', 'renderer', ''),
        | ('svc/store.go:validate', 'function', 'validate', ''),
        | ('svc/store_test.go:test:3', 'test', 'TestOpen', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the Go demo: the exported constructor
    // that guards with it, PLUS the `renderer` closure binding (r10 —
    // func-literal bindings are function units with their own call
    // scope, the TsParser arrow rule), then the test that covers the
    // constructor.
    ("ingest_go_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoGoFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "godemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "godemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "godemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'svc/store.go:validate'),
        | (1, 'svc/store.go:Open'),
        | (1, 'svc/store.go:renderer'),
        | (2, 'svc/store_test.go:test:3')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // TypeScript/JavaScript extractor (r8d): classes as lexical
    // containers (constructor + method), arrow-function bindings as
    // functions, default/named imports, jest-style tests. The fixture
    // pins the r9 lexer fidelity: `fetch` reaches validate only
    // through a template `${}` interpolation, and `strip` only past a
    // quote-bearing regex literal on the same line.
    ("ingest_ts_units",
      (s, d) => Ingest.parseFiles(demoTsFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('api/client.test.ts:import:client', 'import', 'client', ''),
        | ('api/client.test.ts:test:3', 'test', 'client fetches', ''),
        | ('api/client.ts:Client', 'type', 'Client', ''),
        | ('api/client.ts:Client:constructor', 'function', 'constructor', 'Client'),
        | ('api/client.ts:Client:fetch', 'function', 'fetch', 'Client'),
        | ('api/client.ts:RETRIES', 'const', 'RETRIES', ''),
        | ('api/client.ts:import:axios', 'import', 'axios', ''),
        | ('api/client.ts:import:codec', 'import', 'codec', ''),
        | ('api/client.ts:shorten', 'function', 'shorten', ''),
        | ('api/client.ts:strip', 'function', 'strip', ''),
        | ('api/client.ts:validate', 'function', 'validate', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the TS demo: both class members guard
    // with it (fetch only via an interpolated call-site), strip calls
    // it past a regex literal, and the test reaches it through the
    // method call.
    ("ingest_ts_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoTsFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "tsdemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "tsdemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "tsdemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'api/client.ts:validate'),
        | (1, 'api/client.ts:Client:constructor'),
        | (1, 'api/client.ts:Client:fetch'),
        | (1, 'api/client.ts:strip'),
        | (2, 'api/client.test.ts:test:3')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // JAVA extraction (r8e): the sixth real language — methods with no
    // introducing keyword (structural modifier-run + return-type
    // detection), static-import bindings, @Test registration, static
    // final consts vs fields.
    ("ingest_java_units",
      (s, d) => Ingest.parseFiles(demoJavaFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('app/Store.java:Store', 'type', 'Store', ''),
        | ('app/Store.java:Store:MAX_CONNS', 'const', 'MAX_CONNS', 'Store'),
        | ('app/Store.java:Store:get', 'function', 'get', 'Store'),
        | ('app/Store.java:Store:open', 'function', 'open', 'Store'),
        | ('app/Store.java:Store:validate', 'function', 'validate', 'Store'),
        | ('app/Store.java:import:HashMap', 'import', 'HashMap', ''),
        | ('app/StoreTest.java:StoreTest', 'type', 'StoreTest', ''),
        | ('app/StoreTest.java:import:open', 'import', 'open', ''),
        | ('app/StoreTest.java:test:5', 'test', 'openChecks', 'StoreTest')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the Java demo: the static factory that
    // guards with it, then the @Test method reaching it through the
    // static import — parser → resolver → blocks/edges → BFS.
    ("ingest_java_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoJavaFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "javademo")
        val edges = SemanticResolver.edgesAsBlocks(units, "javademo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "javademo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'app/Store.java:Store:validate'),
        | (1, 'app/Store.java:Store:open'),
        | (2, 'app/StoreTest.java:test:5')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // RUST extraction (r9): the seventh real language — methods attach
    // via impl-block SELF types (not lexical nesting), #[test]-armed
    // fns, use imports incl. braced lists, macro call-sites excluded.
    ("ingest_rust_units",
      (s, d) => Ingest.parseFiles(demoRustFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('svc/store.rs:RETRIES', 'const', 'RETRIES', ''),
        | ('svc/store.rs:Store', 'type', 'Store', ''),
        | ('svc/store.rs:Store:get', 'function', 'get', 'Store'),
        | ('svc/store.rs:Store:open', 'function', 'open', 'Store'),
        | ('svc/store.rs:import:HashMap', 'import', 'HashMap', ''),
        | ('svc/store.rs:validate', 'function', 'validate', ''),
        | ('svc/store_test.rs:import:Store', 'import', 'Store', ''),
        | ('svc/store_test.rs:test:4', 'test', 'opens_store', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the Rust demo: the impl constructor
    // that guards with it, then the #[test] fn reaching it through
    // `Store::open` — parser → resolver → blocks/edges → BFS.
    ("ingest_rust_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoRustFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "rustdemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "rustdemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "rustdemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'svc/store.rs:validate'),
        | (1, 'svc/store.rs:Store:open'),
        | (2, 'svc/store_test.rs:test:4')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // C extraction (r9): the eighth real language — structural
    // function-definition detection (prototypes skipped), function-like
    // macros as callable units, typedef tail names, include imports.
    ("ingest_c_units",
      (s, d) => Ingest.parseFiles(demoCFiles(s), DispatchParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('svc/store.c:GUARD', 'function', 'GUARD', ''),
        | ('svc/store.c:MAX_CONNS', 'const', 'MAX_CONNS', ''),
        | ('svc/store.c:get_item', 'function', 'get_item', ''),
        | ('svc/store.c:import:stdio', 'import', 'stdio', ''),
        | ('svc/store.c:import:store', 'import', 'store', ''),
        | ('svc/store.c:open_store', 'function', 'open_store', ''),
        | ('svc/store.c:retries', 'var', 'retries', ''),
        | ('svc/store.c:store', 'type', 'store', ''),
        | ('svc/store.c:validate', 'function', 'validate', ''),
        | ('svc/store_check.c:check_open', 'function', 'check_open', ''),
        | ('svc/store_check.c:import:store', 'import', 'store', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the C demo: BOTH the constructor and
    // the function-like GUARD macro call it (macro units make macro
    // call-graphs resolvable), then the second translation unit's
    // check function reaches it through open_store. GUARD's validate
    // call sits on a `\`-CONTINUATION line (r10): the depth-1 GUARD
    // row exists only because multi-line macros are joined before the
    // call scan — the golden pins the fix end-to-end.
    ("ingest_c_callers",
      (s, d) => {
        import graft.api.Cli
        val units = Ingest.parseFiles(demoCFiles(s), DispatchParser)
        val blocks = Ingest.unitsToBlocks(units, "cdemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "cdemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "cdemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'svc/store.c:validate'),
        | (1, 'svc/store.c:GUARD'),
        | (1, 'svc/store.c:open_store'),
        | (2, 'svc/store_check.c:check_open')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    // C++ extraction (r10): the ninth real language — closes the
    // reference's DEFAULT ingest surface (ingest_directory.zig:185-195
    // includes .cpp/.hpp). Classes as containers, namespace-transparent
    // scoping, out-of-line `Cls::method` definitions, gtest TESTs,
    // using-imports.
    ("ingest_cpp_units",
      (s, d) => demoCppUnits(s)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"), col("arm"))
        .orderBy("unit_id"),
      // pins (r12): ONE flush_store (first-arm-wins, active arm),
      // posix_retries recovered from the #else arm (arm='suppressed'),
      // and svc::helper downgraded to a FREE function because no type
      // unit named svc exists in the workspace
      Some("""SELECT * FROM (VALUES
        | ('svc/store.cpp:MAX_CONNS', 'const', 'MAX_CONNS', '', ''),
        | ('svc/store.cpp:Store', 'type', 'Store', '', ''),
        | ('svc/store.cpp:Store:Store', 'function', 'Store', 'Store', ''),
        | ('svc/store.cpp:Store:addr_', 'const', 'addr_', 'Store', ''),
        | ('svc/store.cpp:Store:get', 'function', 'get', 'Store', ''),
        | ('svc/store.cpp:Store:open', 'function', 'open', 'Store', ''),
        | ('svc/store.cpp:flush_store', 'function', 'flush_store', '', ''),
        | ('svc/store.cpp:import:cstdio', 'import', 'cstdio', '', ''),
        | ('svc/store.cpp:import:store', 'import', 'store', '', ''),
        | ('svc/store.cpp:kRetries', 'const', 'kRetries', '', ''),
        | ('svc/store.cpp:posix_retries', 'function', 'posix_retries', '',
        |   'suppressed'),
        | ('svc/store.cpp:validate', 'function', 'validate', '', ''),
        | ('svc/store_test.cpp:import:Store', 'import', 'Store', '', ''),
        | ('svc/store_test.cpp:import:gtest', 'import', 'gtest', '', ''),
        | ('svc/store_test.cpp:import:store', 'import', 'store', '', ''),
        | ('svc/store_test.cpp:test:6', 'test', 'StoreTest.OpensStore', '',
        |   ''),
        | ('svc/util.cpp:helper', 'function', 'helper', '', ''),
        | ('svc/util.cpp:import:store', 'import', 'store', '', '')
        |) t(unit_id, unit_type, name, parent, arm) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    // Callers of `validate` on the C++ demo: the in-class constructor
    // reaches it ONLY through its initializer list's nested call
    // (`addr_(validate(addr))` — the r12 initListArgs rule; the body
    // calls log_open), the out-of-line `Store::open` definition guards
    // with it, and the gtest TEST reaches it through `Store::open(` —
    // a `::`-qualified call-site scanning as its last segment — at
    // depth 2. Parser → resolver → blocks/edges → BFS.
    ("ingest_cpp_callers",
      (s, d) => {
        import graft.api.Cli
        val units = demoCppUnits(s)
        val blocks = Ingest.unitsToBlocks(units, "cppdemo")
        val edges = SemanticResolver.edgesAsBlocks(units, "cppdemo")
        Cli.execute(blocks, edges,
          Cli.ShowCmd("callers", "validate", "cppdemo", maxDepth = 2))
          .select("depth", "unit_id").orderBy("depth", "unit_id")
      },
      Some("""SELECT * FROM (VALUES
        | (0, 'svc/store.cpp:validate'),
        | (1, 'svc/store.cpp:Store:Store'),
        | (1, 'svc/store.cpp:Store:open'),
        | (2, 'svc/store_test.cpp:test:6')
        |) t(depth, unit_id) ORDER BY depth, unit_id"""
        .stripMargin.replace("\n", " "))),

    ("ingest_units",
      (s, d) => Ingest.parseFiles(demoFiles(s), SimpleParser)
        .toDF().select(col("unitId").as("unit_id"),
          col("unitType").as("unit_type"), col("name"),
          col("parentContainer").as("parent"))
        .orderBy("unit_id"),
      Some("""SELECT * FROM (VALUES
        | ('src/main.zig:MAX', 'const', 'MAX', ''),
        | ('src/main.zig:Parser', 'type', 'Parser', ''),
        | ('src/main.zig:Parser:parse', 'function', 'parse', 'Parser'),
        | ('src/main.zig:Parser:tokenize', 'function', 'tokenize', 'Parser'),
        | ('src/main.zig:import:util.zig', 'import', 'util.zig', ''),
        | ('src/main.zig:main', 'function', 'main', ''),
        | ('src/main.zig:test:main works', 'test', 'main works', ''),
        | ('src/util.zig:helper', 'function', 'helper', ''),
        | ('src/util.zig:log', 'function', 'log', '')
        |) t(unit_id, unit_type, name, parent) ORDER BY unit_id"""
        .stripMargin.replace("\n", " "))),

    ("ingest_resolved_edges",
      (s, d) => SemanticResolver.resolveEdges(
        Ingest.parseFiles(demoFiles(s), SimpleParser))
        .orderBy("src_unit_id", "dst_unit_id", "edge_type"),
      Some("""SELECT * FROM (VALUES
        | ('src/main.zig:Parser:parse', 'src/main.zig:Parser', 'method_of'),
        | ('src/main.zig:Parser:parse', 'src/main.zig:Parser:tokenize', 'calls'),
        | ('src/main.zig:Parser:tokenize', 'src/main.zig:Parser', 'method_of'),
        | ('src/main.zig:main', 'src/main.zig:Parser:parse', 'calls'),
        | ('src/main.zig:main', 'src/util.zig:helper', 'calls'),
        | ('src/main.zig:test:main works', 'src/main.zig:main', 'calls'),
        | ('src/util.zig:helper', 'src/util.zig:log', 'calls')
        |) t(src_unit_id, dst_unit_id, edge_type)
        | ORDER BY src_unit_id, dst_unit_id, edge_type"""
        .stripMargin.replace("\n", " "))),

    ("bidirectional_search",
      (s, d) => GraphAlgos.bidirectionalSearch(
        CodeGraph.edges(s, d), "O0", "R0", maxDepth = 4).orderBy("id"),
      Some(s"""WITH RECURSIVE e AS ($E),
        | f AS (SELECT 'O0' AS id, 0 AS depth
        |   UNION ALL SELECT e.dst, f.depth + 1 FROM f JOIN e ON e.src = f.id
        |    WHERE f.depth < 2),
        | fwd AS (SELECT id, MIN(depth) AS depth_fwd FROM f GROUP BY id),
        | b AS (SELECT 'R0' AS id, 0 AS depth
        |   UNION ALL SELECT e.src, b.depth + 1 FROM b JOIN e ON e.dst = b.id
        |    WHERE b.depth < 2),
        | bwd AS (SELECT id, MIN(depth) AS depth_bwd FROM b GROUP BY id),
        | meet AS (SELECT fwd.id, depth_fwd, depth_bwd,
        |    depth_fwd + depth_bwd AS dist
        |   FROM fwd JOIN bwd ON fwd.id = bwd.id)
        | SELECT id, depth_fwd, depth_bwd, dist FROM meet
        | WHERE dist = (SELECT MIN(dist) FROM meet) ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("scc_components",
      (s, d) => GraphAlgos.stronglyConnected(
        CodeGraph.edges(s, d)
          .filter(col("edge_type").isin("in_nation", "in_region")))
        .orderBy("id"),
      // the geo subgraph is a DAG: every node is its own SCC — and the
      // engine must prove it (the reference fakes SCC as DFS; we don't)
      Some(s"""WITH e AS ($E),
        | g AS (SELECT src, dst FROM e
        |   WHERE edge_type IN ('in_nation', 'in_region')),
        | nodes AS (SELECT src AS id FROM g UNION SELECT dst FROM g)
        | SELECT id, id AS component FROM nodes ORDER BY id"""
        .stripMargin.replace("\n", " "))),
  )
}

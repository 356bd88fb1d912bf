package graft.ingest

import graft.SparkSpec
import graft.graph.{Direction, Traversal, TraversalSpec}
import graft.query.NameResolver
import org.apache.spark.sql.functions._

/** Ingestion pipeline: parser contract, unit→block translation, symbol
  * resolution, and the end-to-end README demo (ingest → find_by_name →
  * callers). Mirrors `/root/reference/src/tests/scenarios/ingestion.zig`
  * and `semantic_resolver.zig` tests.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val mainZig =
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

  private val utilZig =
    """fn helper(x) {
      |  log(x)
      |}
      |fn log(x) {
      |}
      |""".stripMargin

  private def files = Seq(
    Ingest.FileDoc("src/main.zig", mainZig),
    Ingest.FileDoc("src/util.zig", utilZig),
    Ingest.FileDoc("README.md", "just docs, no code"),
  ).toDS()

  private lazy val units = Ingest.parseFiles(files, SimpleParser).collect().toSeq

  test("parser extracts functions, types, consts, imports, tests, documents") {
    val byType = units.groupBy(_.unitType).view.mapValues(_.size).toMap
    assert(byType("function") == 5) // main, parse, tokenize, helper, log
    assert(byType("type") == 1)
    assert(byType("const") == 1)
    assert(byType("import") == 1)
    assert(byType("test") == 1)
    assert(byType("document") == 1) // README
  }

  test("container functions get qualified unit_ids and method_of edges") {
    val parse = units.find(_.unitId == "src/main.zig:Parser:parse").get
    assert(parse.parentContainer == "Parser")
    assert(parse.edges.contains(ParsedEdge("method_of", "Parser")))
    assert(parse.edges.contains(ParsedEdge("calls", "tokenize")))
  }

  test("call edges carry raw names; keywords excluded") {
    val main = units.find(_.unitId == "src/main.zig:main").get
    assert(main.edges.map(_.targetName).toSet == Set("helper", "parse"))
  }

  test("source_uri and deterministic ids in block translation") {
    val blocks = Ingest.unitsToBlocks(
      Ingest.parseFiles(files, SimpleParser), "ws")
    val row = blocks.filter(col("unit_id") === "src/main.zig:main").head()
    assert(row.getAs[String]("source_uri") == "file://src/main.zig#L3-L6")
    assert(row.getAs[String]("id").matches("[0-9a-f]{32}"))
    assert(blocks.select("id").distinct().count() == blocks.count())
  }

  test("file size cap and empty files are rejected") {
    val big = Seq(Ingest.FileDoc("big", "x" * (1024 * 1024 + 1)),
      Ingest.FileDoc("", "content"), Ingest.FileDoc("empty", "")).toDS()
    assert(Ingest.parseFiles(big, SimpleParser).isEmpty)
  }

  test("scoped resolution prefers the same container") {
    // parse() calls tokenize(): both Parser.tokenize (scoped) exists —
    // must resolve to the container's, not any global one
    val edges = SemanticResolver.resolveEdges(Ingest.parseFiles(files, SimpleParser))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges.contains(("src/main.zig:Parser:parse",
      "src/main.zig:Parser:tokenize", "calls")))
    assert(edges.contains(("src/main.zig:main", "src/util.zig:helper", "calls")))
    // unresolved log->? no: log is global in util.zig
    assert(edges.contains(("src/util.zig:helper", "src/util.zig:log", "calls")))
  }

  test("method_of resolves to the TYPE even when a constructor shadows it") {
    // C++/Java shape: the constructor is a FUNCTION named like its
    // class INSIDE that class — scoped resolution would bind a sibling
    // method's `method_of Store` to the ctor, detaching it from the
    // type. method_of must resolve against type units only, while a
    // `Store(…)` CALL from inside the class still means the ctor.
    val cpp = Seq(Ingest.FileDoc("s.cpp",
      """class Store {
        | public:
        |  Store(int c) { validate(c); }
        |  int get(int k) { return k; }
        |};
        |Store* make() { return new Store(1); }
        |void validate(int c) {}
        |""".stripMargin)).toDS()
    val edges = SemanticResolver.resolveEdges(Ingest.parseFiles(cpp, DispatchParser))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges.contains(("s.cpp:Store:get", "s.cpp:Store", "method_of")))
    assert(edges.contains(("s.cpp:Store:Store", "s.cpp:Store", "method_of")))
    assert(edges.contains(("s.cpp:make", "s.cpp:Store", "calls"))) // global: min id = type
    assert(!edges.contains(("s.cpp:Store:get", "s.cpp:Store:Store", "method_of")))
  }

  test("unresolved targets drop instead of failing") {
    val orphan = Seq(Ingest.FileDoc("a.zig", "fn f() {\n  ghost()\n}\n")).toDS()
    val edges = SemanticResolver.resolveEdges(Ingest.parseFiles(orphan, SimpleParser))
    assert(edges.isEmpty)
  }

  test("end-to-end README demo: ingest -> find_by_name -> callers") {
    val u = Ingest.parseFiles(files, SimpleParser)
    val blocks = Ingest.unitsToBlocks(u, "demo")
    val edges = SemanticResolver.edgesAsBlocks(u, "demo")
    // kausal find --type function --name helper
    val anchor = NameResolver.findByName(blocks, "demo", "function", "helper")
    val seedId = anchor.select("id").head().getString(0)
    // kausal show --relation callers --target helper
    val callers = Traversal.bfs(edges, Seq(seedId).toDF("id"),
      TraversalSpec(Direction.Incoming, maxDepth = 3))
      .join(blocks, Seq("id"))
      .select("unit_id", "depth").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(callers("src/util.zig:helper") == 0)
    assert(callers("src/main.zig:main") == 1)          // main calls helper
    assert(callers("src/main.zig:test:main works") == 2) // test calls main
  }

  test("workspace link/unlink/sync lifecycle") {
    val reg0 = Workspace.emptyRegistry(spark)
    val (reg1, blocks, edges) = Workspace.link(reg0, "demo", "/src", files)
    assert(Workspace.linked(reg1).collect().map(_.getString(0)).toSeq == Seq("demo"))
    assert(blocks.count() > 0 && edges.count() > 0)

    val reg2 = Workspace.unlink(reg1, "demo")
    assert(Workspace.linked(reg2).isEmpty)

    // sync replaces the workspace partition with a fresh parse
    val files2 = Seq(Ingest.FileDoc("src/only.zig", "fn solo() {\n}\n")).toDS()
    val (b2, e2) = Workspace.sync(blocks, edges, "demo", files2)
    assert(b2.filter(col("workspace") === "demo").count() == 1)
    assert(e2.filter(col("workspace") === "demo").isEmpty)
  }

  test("sync keeps MVCC tombstones (null workspace) of other rows") {
    // tombstones carry NULL in every non-key column including workspace;
    // a null-UNSAFE filter would drop them and resurrect deleted blocks
    val (_, blocks, edges) = Workspace.link(
      Workspace.emptyRegistry(spark), "wsA", "/src", files)
    val someId = blocks.select("id").as[String].head()
    val withTombstone = graft.core.Mvcc.deleteBlocks(blocks, Seq(someId))
    assert(graft.core.Schemas.currentView(withTombstone)
      .filter(col("id") === someId).isEmpty) // deleted
    // sync an UNRELATED workspace; the tombstone must survive
    val (b2, _) = Workspace.sync(withTombstone, edges, "wsB",
      Seq(Ingest.FileDoc("b.zig", "fn b() {\n}\n")).toDS())
    assert(graft.core.Schemas.currentView(b2)
      .filter(col("id") === someId).isEmpty, "deleted block resurrected")
  }

  test("readDirectory: recursive scan, glob include/exclude, size cap") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toFile
    def write(rel: String, content: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    try {
      write("a.zig", "fn a() {\n}\n")
      write("sub/deep/b.zig", "fn b() {\n}\n")
      write("notes.txt", "not code")                 // not in include globs
      write("vendor/c.zig", "fn c() {\n}\n")         // excluded by glob
      write("huge.zig", "y" * (1024 * 1024 + 1))     // over the 1 MiB cap
      write("none.zig", "")                          // empty -> skipped
      val got = Ingest.readDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig"), exclude = Seq("vendor/**"))
        .collect().map(f => f.path -> f.content).toMap
      assert(got.keySet == Set("a.zig", "sub/deep/b.zig"))
      assert(got("a.zig") == "fn a() {\n}\n") // UTF-8 decode intact
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("readDirectory: git work trees enumerate tracked files only") {
    // reference behavior (ingest_directory.zig:208-253): `git ls-files`
    // first — untracked and .gitignore'd files never enter the scan —
    // with the fs-walk as fallback for non-repos / git failures
    val root = java.nio.file.Files.createTempDirectory("graft-git").toFile
    def write(rel: String, content: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    def git(args: String*): Unit = {
      val pb = new ProcessBuilder(("git" +: args): _*)
        .directory(root).redirectErrorStream(true).start()
      pb.getInputStream.readAllBytes()
      assert(pb.waitFor() == 0, s"git ${args.mkString(" ")} failed")
    }
    try {
      write("tracked.zig", "fn t() {\n}\n")
      write("sub/also tracked.zig", "fn s() {\n}\n") // space: -z parsing
      write("untracked.zig", "fn u() {\n}\n")
      write("ignored.zig", "fn i() {\n}\n")
      write(".gitignore", "ignored.zig\n")
      git("init", "-q")
      git("add", "tracked.zig", "sub/also tracked.zig", ".gitignore")
      val got = Ingest.readDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")).collect().map(_.path).toSet
      assert(got == Set("tracked.zig", "sub/also tracked.zig"))
      // deleted-but-indexed entries are skipped, not errors
      new java.io.File(root, "tracked.zig").delete()
      val after = Ingest.readDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")).collect().map(_.path).toSet
      assert(after == Set("sub/also tracked.zig"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("readDirectory: roots and files with spaces keep clean relative paths") {
    // file-source URIs %XX-encode special characters; the reader must
    // decode them or the root-prefix strip fails and globs see %20s
    val root = java.nio.file.Files.createTempDirectory("graft ingest sp").toFile
    def write(rel: String, content: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    try {
      write("my lib/a b.zig", "fn a() {\n}\n")
      write("c+d.zig", "fn c() {\n}\n") // literal '+' must survive decode
      val got = Ingest.readDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")).collect().map(_.path).toSet
      assert(got === Set("my lib/a b.zig", "c+d.zig"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("glob translation: segment vs cross-directory wildcards") {
    assert("sub/deep/b.zig".matches(Ingest.globToRegex("**/*.zig")))
    assert("b.zig".matches(Ingest.globToRegex("**/*.zig")))
    assert(!"sub/b.zig".matches(Ingest.globToRegex("*.zig"))) // * stays in segment
    assert("vendor/x/y.zig".matches(Ingest.globToRegex("vendor/**")))
    assert("a.b.zig".matches(Ingest.globToRegex("a?b.zig")))
    assert(!"a.bXzig".matches(Ingest.globToRegex("a?b.zig")))
  }

  test("dogfood: link the engine's own ingest package, trace real callers") {
    // the full workspace path — directory reader → DispatchParser
    // (.scala → ScalaParser) → blocks/edges through the MVCC write
    // path — pointed at THIS repository: who calls
    // SemanticResolver.resolveEdges, two hops? Its in-package chain is
    // resolveEdges ← edgesAsBlocks ← Workspace.link/sync, all real
    // engine code.
    val root = new java.io.File("src/main/scala/graft/ingest")
    assume(root.isDirectory)
    val (reg, blocks, edges) = Workspace.linkDirectory(
      Workspace.emptyRegistry(spark), "graft", root.getAbsolutePath,
      include = Seq("**/*.scala"))
    assert(Workspace.linked(reg).count() == 1)
    val out = graft.api.Cli.execute(blocks, edges,
      graft.api.Cli.ShowCmd("callers", "resolveEdges", "graft", maxDepth = 2))
      .select("depth", "unit_id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out.contains((0, "SemanticResolver.scala:SemanticResolver:resolveEdges")))
    assert(out.contains((1, "SemanticResolver.scala:SemanticResolver:edgesAsBlocks")))
    assert(out.contains((2, "Workspace.scala:Workspace:link")))
    assert(out.contains((2, "Workspace.scala:Workspace:sync")))
  }

  test("linkDirectory ingests a real tree through the registry") {
    val root = java.nio.file.Files.createTempDirectory("graft-link").toFile
    try {
      java.nio.file.Files.write(new java.io.File(root, "m.zig").toPath,
        "fn top() {\n  leaf()\n}\nfn leaf() {\n}\n".getBytes("UTF-8"))
      val (reg, blocks, edges) = Workspace.linkDirectory(
        Workspace.emptyRegistry(spark), "tree", root.getAbsolutePath)
      assert(Workspace.linked(reg).collect().map(_.getString(0)).toSeq == Seq("tree"))
      assert(blocks.filter(col("unit_id") === "m.zig:top").count() == 1)
      assert(edges.count() == 1) // top -> leaf resolved call
    } finally {
      Option(root.listFiles()).foreach(_.foreach(_.delete())); root.delete()
    }
  }

  test("streaming directory ingestion parses files as they arrive") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    def write(rel: String, content: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    write("one.zig", "fn one() {\n}\n") // present at stream start
    val units = Ingest.parseFiles(
      Ingest.readStreamDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")), SimpleParser)
    val q = units.toDF().writeStream.format("memory")
      .queryName("ingest_stream_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      write("sub/two.zig", "fn two() {\n}\n") // arrives mid-stream
      write("skip.txt", "not code")           // filtered by glob
      q.processAllAvailable()
      val got = spark.table("ingest_stream_test")
        .select("unitId").collect().map(_.getString(0)).toSet
      assert(got == Set("one.zig:one", "sub/two.zig:two"))
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  test("streaming ingestion appends through the MVCC write path per micro-batch") {
    import graft.core.{Mvcc, Schemas}
    val root = java.nio.file.Files.createTempDirectory("graft-sync").toFile
    def write(rel: String, content: String): Unit =
      java.nio.file.Files.write(new java.io.File(root, rel).toPath,
        content.getBytes("UTF-8"))
    write("first.zig", "fn first() {\n}\n")
    // the continuously-synced store: starts empty with the block schema
    var store = Ingest.unitsToBlocks(
      Ingest.parseFiles(Seq.empty[Ingest.FileDoc].toDS(), SimpleParser), "live")
    val stream = Ingest.parseFiles(
      Ingest.readStreamDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")), SimpleParser)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ParsedUnit], _: Long) =>
        val puts = Ingest.unitsToBlocks(batch, "live")
          .drop("sequence", "is_deleted")
        store = Mvcc.putBlocks(store, puts).localCheckpoint(true)
        ()
      }.start()
    try {
      q.processAllAvailable()
      write("second.zig", "fn second() {\n}\n")
      q.processAllAvailable()
      val cur = Schemas.currentView(store)
        .select("unit_id", "sequence").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cur.keySet == Set("first.zig:first", "second.zig:second"))
      // later micro-batch writes land at higher sequence epochs
      assert(cur("second.zig:second") > cur("first.zig:first"))
    } finally {
      q.stop()
      Option(root.listFiles()).foreach(_.foreach(_.delete())); root.delete(); ()
    }
  }

  test("ingestion stats aggregate files/blocks/edges") {
    val u = Ingest.parseFiles(files, SimpleParser)
    val s = Ingest.stats(files, u).head()
    assert(s.getLong(0) == 3 && s.getLong(1) == 10 && s.getLong(2) > 0)
    // no C/C++ in this fixture → zero suppressed-arm units (r12 column)
    assert(s.getLong(3) == 0)
  }

  test("resolver downgrades orphan C++ methods to free functions") {
    // the qualified-definition residual (r12): `svc::helper` in a file
    // that never opens `namespace svc` scans as a method of `svc` at
    // parse time; at resolver time the workspace symbol table shows no
    // TYPE unit named svc anywhere → downgrade to a free function
    // (parent "", method_of dropped, unitId re-derived). A REAL
    // out-of-line method (`Store::open`, Store is a type unit in
    // another file) keeps its container.
    val cpp = Seq(
      Ingest.FileDoc("a/store.cpp",
        """namespace svc {
          |class Store {
          | public:
          |  int get() { return 1; }
          |};
          |Store* Store::open(const char* a) { return make(a); }
          |}
          |""".stripMargin),
      Ingest.FileDoc("a/util.cpp",
        "int svc::helper(int n) {\n  return n;\n}\n")).toDS()
    val units = SemanticResolver.downgradeOrphanMethods(
      Ingest.parseFiles(cpp, DispatchParser)).collect()
    val h = units.find(_.name == "helper").get
    assert(h.parentContainer == "" && h.unitId == "a/util.cpp:helper")
    assert(!h.edges.exists(_.edgeType == "method_of"))
    val o = units.find(_.name == "open").get
    assert(o.parentContainer == "Store" &&
      o.edges.exists(_.edgeType == "method_of"))
  }

  test("orphan-method downgrade suffixes a colliding re-derived id") {
    val cpp = Seq(Ingest.FileDoc("a/x.cpp",
      """int helper(int n) { return n; }
        |int svc::helper(int n) { return n + 1; }
        |""".stripMargin)).toDS()
    val units = SemanticResolver.downgradeOrphanMethods(
      Ingest.parseFiles(cpp, DispatchParser)).collect()
    val ids = units.filter(_.name == "helper").map(_.unitId).sorted
    // the downgraded svc::helper would collide with the free helper's
    // id — it takes the parse-time `#line` suffix instead
    assert(ids.toSeq == Seq("a/x.cpp:helper", "a/x.cpp:helper#2"))
  }
  test("orphan-method downgrade dedups within the downgraded set") {
    // two orphan methods of the same name in ONE file (r13, ADVICE):
    // both downgrade, and both would re-derive the unsuffixed
    // `file:init` — duplicate block ids at the same MVCC sequence.
    // Repeats within the downgraded set take the `#line` suffix too.
    val cpp = Seq(Ingest.FileDoc("a/x.cpp",
      """int a::init(int n) { return n; }
        |int b::init(int n) { return n + 1; }
        |""".stripMargin)).toDS()
    val units = SemanticResolver.downgradeOrphanMethods(
      Ingest.parseFiles(cpp, DispatchParser)).collect()
    val ids = units.filter(_.name == "init").map(_.unitId).sorted
    assert(ids.toSeq == Seq("a/x.cpp:init#1", "a/x.cpp:init#2"))
    assert(units.forall(_.parentContainer == ""))
  }

  test("resolution prefers an ACTIVE definition over a suppressed-arm twin") {
    // platform-split twin (r13, ADVICE): the recovered `#else`-arm
    // helper sorts BELOW the active one by unitId alone
    // ("a/plat.cpp:helper" < "b/util.cpp:helper"), so a bare
    // min(unitId) pick would retarget the call edge to code that is
    // never compiled. Active (arm = "") must win; a suppressed-ONLY
    // name must still resolve (names stay findable).
    val cpp = Seq(
      Ingest.FileDoc("a/plat.cpp",
        """#ifdef _WIN32
          |#else
          |static int helper(int x) { return x; }
          |static int posix_entry(int x) { return x; }
          |#endif
          |""".stripMargin),
      Ingest.FileDoc("b/util.cpp",
        "int helper(int n) {\n  return n;\n}\n"),
      Ingest.FileDoc("c/main.cpp",
        "int main() {\n  return helper(1) + posix_entry(2);\n}\n")).toDS()
    val edges = SemanticResolver.resolveEdges(Ingest.parseFiles(cpp, DispatchParser))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges.contains(("c/main.cpp:main", "b/util.cpp:helper", "calls")))
    assert(!edges.contains(("c/main.cpp:main", "a/plat.cpp:helper", "calls")))
    assert(edges.contains(("c/main.cpp:main", "a/plat.cpp:posix_entry", "calls")))
  }
}

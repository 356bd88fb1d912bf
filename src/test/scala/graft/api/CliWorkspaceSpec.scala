package graft.api

import graft.SparkSpec

/** CLI workspace/health surface: parse vocabulary for
  * `link/unlink/sync/status/ping/version/help` (reference
  * `parser.zig:38-156`) and the full lifecycle against a parquet-backed
  * [[WorkspaceStore]] state dir — the reference daemon's
  * `handle_*_request` handlers (`cli_protocol.zig:83-574`) re-expressed
  * as table-in/table-out commands.
  */
class CliWorkspaceSpec extends SparkSpec {

  private def writeTree(files: (String, String)*): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory("graft-cli-ws").toFile
    files.foreach { case (rel, content) =>
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    root
  }

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("graft-cli-state").toFile.getAbsolutePath

  private val libZig =
    """fn alpha() {
      |  beta()
      |}
      |fn beta() {
      |}
      |""".stripMargin

  test("parse: workspace + health command vocabulary") {
    assert(Cli.parse(Seq("link", "--path", "/x/proj")) ==
      Right(Cli.LinkCmd("/x/proj", "proj")))
    assert(Cli.parse(Seq("link", "--path", "/x/proj/", "--name", "p2",
      "--include", "**.zig,src/**", "--exclude", "gen/**")) ==
      Right(Cli.LinkCmd("/x/proj/", "p2", Seq("**.zig", "src/**"), Seq("gen/**"))))
    assert(Cli.parse(Seq("unlink", "--name", "p")) == Right(Cli.UnlinkCmd("p")))
    assert(Cli.parse(Seq("sync", "--name", "p")) == Right(Cli.SyncCmd(Some("p"))))
    assert(Cli.parse(Seq("sync", "--all")) == Right(Cli.SyncCmd(None, all = true)))
    assert(Cli.parse(Seq("status")) == Right(Cli.StatusCmd()))
    assert(Cli.parse(Seq("status", "--verbose", "--format", "json")) ==
      Right(Cli.StatusCmd(verbose = true, format = "json")))
    assert(Cli.parse(Seq("trace", "--direction", "callers", "--target", "t",
      "--all-paths")) ==
      Right(Cli.TraceCmd("callers", "t", allPaths = true)))
    assert(Cli.parse(Seq("ping")) == Right(Cli.PingCmd))
    assert(Cli.parse(Seq("version")) == Right(Cli.VersionCmd))
    assert(Cli.parse(Seq("help")) == Right(Cli.HelpCmd(None)))
    assert(Cli.parse(Seq("help", "--topic", "link")) ==
      Right(Cli.HelpCmd(Some("link"))))
    // error-message-first: missing/conflicting/misspelled flags fail
    assert(Cli.parse(Seq("link")).isLeft)                       // no --path
    assert(Cli.parse(Seq("sync")).isLeft)                       // no --name/--all
    assert(Cli.parse(Seq("sync", "--name", "p", "--all")).isLeft)
    assert(Cli.parse(Seq("unlink")).isLeft)
    assert(Cli.parse(Seq("status", "--verbos")).isLeft)         // typo'd bool flag
    assert(Cli.parse(Seq("link", "--path")).isLeft)             // dangling value
  }

  test("lifecycle: link -> status -> query -> sync -> unlink") {
    val tree = writeTree("lib.zig" -> libZig)
    val state = tmpState()

    // link ingests the tree through the MVCC write path
    val linked = Cli.executeWorkspace(spark, state,
      Cli.LinkCmd(tree.getAbsolutePath, "proj")).collect().head
    assert(linked.getAs[String]("workspace") == "proj")
    assert(linked.getAs[Long]("files_processed") == 1L)
    assert(linked.getAs[Long]("blocks_linked") >= 2L) // alpha, beta

    // status: linked workspace visible, freshly synced, counts match
    val st = Cli.executeWorkspace(spark, state, Cli.StatusCmd(verbose = true))
      .collect()
    assert(st.length == 1)
    assert(st.head.getAs[String]("workspace") == "proj")
    assert(st.head.getAs[String]("sync_status") == "synced")
    assert(st.head.getAs[Long]("block_count") == linked.getAs[Long]("blocks_linked"))
    assert(st.head.getAs[Long]("storage_bytes") ==
      st.head.getAs[Long]("block_count") * 2048L +
        st.head.getAs[Long]("edge_count") * 64L)

    // query commands run against the linked store: alpha calls beta
    val (blocks, edges) = WorkspaceStore.currentGraph(spark, state)
    val callees = Cli.execute(blocks, edges,
      Cli.ShowCmd("callees", "alpha", maxDepth = 2)).collect()
    assert(callees.exists(_.getAs[String]("unit_id").endsWith(":beta")))

    // sync after an edit: beta gone, gamma added -> tombstone + new epoch
    java.nio.file.Files.write(new java.io.File(tree, "lib.zig").toPath,
      "fn alpha() {\n  gamma()\n}\nfn gamma() {\n}\n".getBytes("UTF-8"))
    val synced = Cli.executeWorkspace(spark, state,
      Cli.SyncCmd(Some("proj"))).collect().head
    assert(synced.getAs[Long]("blocks_removed") >= 1L) // beta tombstoned
    val (blocks2, edges2) = WorkspaceStore.currentGraph(spark, state)
    val names2 = blocks2.select("unit_id").collect().map(_.getString(0)).toSet
    assert(names2.exists(_.endsWith(":gamma")))
    assert(!names2.exists(_.endsWith(":beta")))

    // unlink tombstones the registry row; status no longer lists it
    Cli.executeWorkspace(spark, state, Cli.UnlinkCmd("proj"))
    assert(Cli.executeWorkspace(spark, state, Cli.StatusCmd()).count() == 0L)
    // unlinking again (or a never-linked name) is an error, like the
    // reference's "workspace not linked" response
    intercept[IllegalArgumentException] {
      Cli.executeWorkspace(spark, state, Cli.UnlinkCmd("proj"))
    }

    // relink works and the registry history survives (MVCC, not rewrite)
    val relinked = Cli.executeWorkspace(spark, state,
      Cli.LinkCmd(tree.getAbsolutePath, "proj")).collect().head
    assert(relinked.getAs[Long]("blocks_linked") >= 2L)
    assert(Cli.executeWorkspace(spark, state, Cli.StatusCmd()).count() == 1L)
  }

  test("concurrent syncs serialize on the write lock; stale locks break; timeout is loud") {
    val tree = writeTree(
      "a.zig" -> "fn alpha() {\n  beta()\n}\n",
      "b.zig" -> "fn beta() {\n}\n")
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "p"))
    val afterLink = WorkspaceStore.load(spark, state).blocks.count()

    // two simultaneous no-op syncs: both must complete (serialized by
    // the lock, not interleaved) and neither may write epoch rows —
    // without the lock both read epoch N and both write N+1, and one
    // writer's table swap clobbers the other's
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("p")))
              .collect().head.getAs[Long]("blocks_synced")
        })
      }
      val deltas = futs.map(_.get(120, TimeUnit.SECONDS))
      assert(deltas == Seq(0L, 0L), s"both syncs no-op: $deltas")
    } finally pool.shutdownNow()
    // the store is intact: registry current view = 1 row, blocks table
    // did not grow, and the lock was released
    assert(WorkspaceStore.load(spark, state).blocks.count() == afterLink)
    val lock = new java.io.File(
      WorkspaceStore.stateRoot(state) + "/_lock")
    assert(!lock.exists(), "lock released after both writers finish")

    // a LIVE foreign lock times out loudly (short wait), naming the path
    java.nio.file.Files.write(lock.toPath, "9999 now".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      WorkspaceStore.withWriteLock(spark, state, waitMs = 400L) { 42 }
    }
    assert(e.getMessage.contains("_lock"))

    // a STALE lock (old mtime) is broken and the writer proceeds
    lock.setLastModified(System.currentTimeMillis() - 3600 * 1000L)
    val r = WorkspaceStore.withWriteLock(spark, state, waitMs = 5000L,
      staleMs = 600000L) { 7 }
    assert(r == 7)
    assert(!lock.exists())
  }

  test("sync is incremental: no-op syncs write zero block rows") {
    val tree = writeTree(
      "a.zig" -> "fn alpha() {\n}\n",
      "b.zig" -> "fn beta() {\n}\n")
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "p"))
    def versionedRows(): Long = WorkspaceStore.load(spark, state).blocks.count()
    val afterLink = versionedRows()

    // nothing changed on disk: the versioned table must not grow
    val noop = Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("p")))
      .collect().head
    assert(noop.getAs[Long]("blocks_synced") == 0L)
    assert(noop.getAs[Long]("blocks_removed") == 0L)
    // r13: a no-op sync PARSES nothing either (hash-diff short-circuit)
    assert(noop.getAs[Long]("files_reparsed") == 0L)
    assert(versionedRows() == afterLink)

    // edit ONE file: exactly that file's changed unit is re-epoched,
    // and only that file re-parses (r13)
    java.nio.file.Files.write(new java.io.File(tree, "a.zig").toPath,
      "fn alpha() {\n  beta()\n}\n".getBytes("UTF-8"))
    val synced = Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("p")))
      .collect().head
    assert(synced.getAs[Long]("blocks_synced") == 1L) // alpha only
    assert(synced.getAs[Long]("blocks_removed") == 0L)
    assert(synced.getAs[Long]("files_reparsed") == 1L)
    assert(versionedRows() == afterLink + 1L)

    // relink after unlink over an unchanged tree: registry epoch moves,
    // block table does not (unlink only tombstones the registry)
    Cli.executeWorkspace(spark, state, Cli.UnlinkCmd("p"))
    val before = versionedRows()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "p"))
    assert(versionedRows() == before)
    // and the current view still answers queries
    val (blocks, edges) = WorkspaceStore.currentGraph(spark, state)
    assert(blocks.filter(org.apache.spark.sql.functions
      .col("unit_id") === "a.zig:alpha").count() == 1L)

    // the tree CHANGES while unlinked: relink must tombstone units (and
    // drop edges) of files deleted in the interim — the block current
    // view decides what goes, not the registry row (which unlink
    // tombstoned)
    Cli.executeWorkspace(spark, state, Cli.UnlinkCmd("p"))
    assert(new java.io.File(tree, "b.zig").delete())
    java.nio.file.Files.write(new java.io.File(tree, "a.zig").toPath,
      "fn alpha() {\n}\n".getBytes("UTF-8")) // beta call gone too
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "p"))
    val (blocks3, edges3) = WorkspaceStore.currentGraph(spark, state)
    val ids3 = blocks3.select("unit_id").collect().map(_.getString(0)).toSet
    assert(ids3.contains("a.zig:alpha"))
    assert(!ids3.exists(_.endsWith(":beta")), s"stale beta in $ids3")
    assert(edges3.count() == 0L) // the alpha->beta edge must not survive
  }

  test("bool flags are rejected on commands that don't handle them") {
    // presence-only flags follow the same error-message-first contract as
    // value flags: accepted ONLY where a handler reads them
    assert(Cli.parse(Seq("find", "--type", "function", "--name", "x",
      "--force")) == Left("flag --force is not valid for find"))
    assert(Cli.parse(Seq("show", "--relation", "callers", "--target", "t",
      "--all")).isLeft)
    assert(Cli.parse(Seq("find", "--type", "function", "--name", "x",
      "--verbose")).isLeft)
    assert(Cli.parse(Seq("status", "--all-paths")).isLeft)
    assert(Cli.parse(Seq("sync", "--name", "p", "--verbose")).isLeft)
    // --force is parsed by the reference but handled nowhere -> rejected
    // on every command (parser.zig:130-156)
    assert(Cli.parse(Seq("unlink", "--name", "p", "--force")).isLeft)
    // the handled homes still parse
    assert(Cli.parse(Seq("status", "--verbose")).isRight)
    assert(Cli.parse(Seq("sync", "--all")).isRight)
    assert(Cli.parse(Seq("trace", "--direction", "callers", "--target", "t",
      "--all-paths")).isRight)
  }

  test("unlink hides the workspace from the query view until relink") {
    val tree = writeTree("lib.zig" -> libZig)
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "proj"))
    val (b1, e1) = WorkspaceStore.currentGraph(spark, state)
    assert(b1.count() > 0 && e1.count() > 0)
    // after unlink the blocks stay stored (time-travelable history) but
    // find/show/trace must stop seeing them — the registry tombstone
    // scopes the query view
    Cli.executeWorkspace(spark, state, Cli.UnlinkCmd("proj"))
    val (b2, e2) = WorkspaceStore.currentGraph(spark, state)
    assert(b2.count() == 0 && e2.count() == 0)
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "proj"))
    val (b3, e3) = WorkspaceStore.currentGraph(spark, state)
    assert(b3.count() > 0 && e3.count() > 0)
  }

  test("re-link tombstones vanished units and replaces the workspace's edges") {
    val tree = writeTree("lib.zig" -> libZig) // alpha calls beta
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "proj"))
    // rewrite the tree: beta deleted, gamma added — then re-LINK (not
    // sync): the link path must run the same vanished-id diff
    java.nio.file.Files.write(new java.io.File(tree, "lib.zig").toPath,
      "fn alpha() {\n  gamma()\n}\nfn gamma() {\n}\n".getBytes("UTF-8"))
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "proj"))
    val (blocks, edges) = WorkspaceStore.currentGraph(spark, state)
    val names = blocks.select("unit_id").collect().map(_.getString(0)).toSet
    assert(names.exists(_.endsWith(":gamma")))
    assert(!names.exists(_.endsWith(":beta"))) // stale block tombstoned
    // no phantom edges: every edge endpoint resolves to a live block
    val liveIds = blocks.select("id").collect().map(_.getString(0)).toSet
    val dsts = edges.select("dst").collect().map(_.getString(0)).toSet
    assert(dsts.subsetOf(liveIds))
  }

  test("sync replays the globs the workspace was linked with") {
    // r11 (ADVICE): link with a WIDER-than-default surface (.md docs),
    // then sync — before the registry persisted include/exclude, sync
    // re-enumerated with DefaultInclude and tombstoned every
    // out-of-default unit on its first run
    val tree = writeTree("lib.zig" -> "fn alpha() {\n}\n",
      "notes.md" -> "design notes\n")
    val state = tmpState()
    val linked = WorkspaceStore.link(spark, state, "proj",
      tree.getAbsolutePath, include = Seq("**")).collect().head
    assert(linked.getAs[Long]("files_processed") == 2L)
    assert(linked.getAs[Long]("files_skipped") == 0L)
    val before = WorkspaceStore.currentGraph(spark, state)._1
      .select("unit_id").collect().map(_.getString(0)).toSet
    assert(before.exists(_.contains("notes.md")))
    val synced = WorkspaceStore.sync(spark, state, Seq("proj"))
      .collect().head
    // no-op tree edit: NOTHING may be tombstoned — the doc unit
    // out of the default surface must survive its first sync
    assert(synced.getAs[Long]("blocks_removed") == 0L)
    val after = WorkspaceStore.currentGraph(spark, state)._1
      .select("unit_id").collect().map(_.getString(0)).toSet
    assert(after.exists(_.contains("notes.md")))

    // a default-surface link reports the narrowed-away files
    val tree2 = writeTree("a.zig" -> "fn a() {\n}\n", "readme.md" -> "hi\n")
    val linked2 = WorkspaceStore.link(spark, state, "narrow",
      tree2.getAbsolutePath).collect().head
    assert(linked2.getAs[Long]("files_processed") == 1L)
    assert(linked2.getAs[Long]("files_skipped") == 1L)
  }

  test("legacy registry rows (no glob columns) sync with the ** fallback") {
    // simulate a pre-r11 store: strip the glob columns from the saved
    // registry parquet; load() re-reads them as NULL
    val tree = writeTree("lib.zig" -> "fn alpha() {\n}\n",
      "notes.md" -> "docs\n")
    val state = tmpState()
    WorkspaceStore.link(spark, state, "proj", tree.getAbsolutePath,
      include = Seq("**"))
    val regPath = s"${WorkspaceStore.stateRoot(state)}/registry"
    val legacy = spark.read.parquet(regPath)
      .drop("include_globs", "exclude_globs")
    val tmp = regPath + ".legacy"
    legacy.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(regPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(regPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(regPath))
    spark.catalog.refreshByPath(WorkspaceStore.stateRoot(state))
    // the fallback is the WIDEST surface: sync must not tombstone the
    // doc unit just because the legacy row cannot say how it was linked
    val synced = WorkspaceStore.sync(spark, state, Seq("proj"))
      .collect().head
    assert(synced.getAs[Long]("blocks_removed") == 0L)
    val after = WorkspaceStore.currentGraph(spark, state)._1
      .select("unit_id").collect().map(_.getString(0)).toSet
    assert(after.exists(_.contains("notes.md")))
  }

  test("sync --all targets every linked workspace; sync of unknown errors") {
    val t1 = writeTree("a.zig" -> "fn a() {\n}\n")
    val t2 = writeTree("b.zig" -> "fn b() {\n}\n")
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(t1.getAbsolutePath, "w1"))
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(t2.getAbsolutePath, "w2"))
    val rows = Cli.executeWorkspace(spark, state, Cli.SyncCmd(None, all = true))
      .collect().map(_.getAs[String]("workspace")).toSeq
    assert(rows.sorted == Seq("w1", "w2"))
    intercept[IllegalArgumentException] {
      Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("nope")))
    }
  }

  test("ping/version/help render as tables") {
    val state = tmpState()
    val ping = Cli.executeWorkspace(spark, state, Cli.PingCmd).collect().head
    assert(ping.getAs[String]("reply") == "pong")
    assert(ping.getAs[String]("version") == Cli.Version)
    val help = Cli.executeWorkspace(spark, state, Cli.HelpCmd(None))
    assert(help.count() >= 8)
    val one = Cli.executeWorkspace(spark, state, Cli.HelpCmd(Some("sync")))
      .collect()
    assert(one.length == 1 && one.head.getAs[String]("usage").contains("--all"))
  }
  test("incremental sync retargets cross-file edges like a full re-ingest") {
    // the global passes (downgrade + scoped-then-global resolution) run
    // over the MERGED unit set (stored snapshot + re-parsed files), so
    // an edit in one file retargets edges of UNCHANGED files exactly as
    // a full re-ingest would — the correctness claim behind re-parsing
    // only changed files (r13)
    import org.apache.spark.sql.functions.col
    val tree = writeTree(
      "m.zig" -> "fn main() {\n  helper()\n}\n",
      "z.zig" -> "fn helper() {\n}\n")
    val state = tmpState()
    Cli.executeWorkspace(spark, state, Cli.LinkCmd(tree.getAbsolutePath, "p"))
    def edgeUnits(): Set[(String, String)] = {
      val st = WorkspaceStore.load(spark, state)
      val cur = graft.core.Schemas.currentView(st.blocks).select("id", "unit_id")
      val a = cur.withColumnRenamed("id", "__s")
        .withColumnRenamed("unit_id", "src_unit")
      val b = cur.withColumnRenamed("id", "__d")
        .withColumnRenamed("unit_id", "dst_unit")
      st.edges.join(a, col("src") === col("__s"))
        .join(b, col("dst") === col("__d"))
        .select("src_unit", "dst_unit").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(edgeUnits().contains(("m.zig:main", "z.zig:helper")))

    // a NEW file defines a lexicographically-smaller helper: only it
    // re-parses, yet the UNCHANGED m.zig's call edge must retarget
    java.nio.file.Files.write(new java.io.File(tree, "a.zig").toPath,
      "fn helper() {\n}\n".getBytes("UTF-8"))
    val s1 = Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("p")))
      .collect().head
    assert(s1.getAs[Long]("files_reparsed") == 1L)
    val e1 = edgeUnits()
    assert(e1.contains(("m.zig:main", "a.zig:helper")))
    assert(!e1.contains(("m.zig:main", "z.zig:helper")))

    // delete it again: nothing re-parses (vanish only), the new file's
    // unit tombstones, and the edge retargets back
    assert(new java.io.File(tree, "a.zig").delete())
    val s2 = Cli.executeWorkspace(spark, state, Cli.SyncCmd(Some("p")))
      .collect().head
    assert(s2.getAs[Long]("files_reparsed") == 0L)
    assert(s2.getAs[Long]("blocks_removed") == 1L)
    assert(edgeUnits().contains(("m.zig:main", "z.zig:helper")))
  }
}

package graft.api

import graft.SparkSpec

/** e2e for daemon mode, the shape of the reference's e2e harness
  * (`/root/reference/tests/e2e/harness.zig:1-40`: spawn server → send
  * commands over the socket → assert responses → stop): start a
  * CliServer on an ephemeral port against a fresh state dir, drive the
  * full lifecycle (ping → link a real tree → find → show callers →
  * status) through the wire, then `stop` and verify shutdown.
  */
class CliServerSpec extends SparkSpec {

  private def writeTree(files: (String, String)*): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory("graft-srv").toFile
    for ((rel, content) <- files) {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    root
  }

  test("server parse: modes, flags, defaults (parser.zig:274-314)") {
    assert(Cli.parse(Seq("server")) == Right(Cli.ServerCmd("start")))
    assert(Cli.parse(Seq("server", "start", "--port", "7070")) ==
      Right(Cli.ServerCmd("start", port = 7070)))
    assert(Cli.parse(Seq("server", "stop", "--host", "h", "--port", "1")) ==
      Right(Cli.ServerCmd("stop", "h", 1)))
    assert(Cli.parse(Seq("server", "status", "--port", "9", "--data-dir", "/x")) ==
      Right(Cli.ServerCmd("status", port = 9, dataDir = Some("/x"))))
    // stop/status/restart must name the daemon: a portless stop would
    // connect to port 0 (never valid) and a portless restart would
    // silently spawn a second daemon beside the running one
    assert(Cli.parse(Seq("server", "status")).isLeft)
    assert(Cli.parse(Seq("server", "stop")).isLeft)
    assert(Cli.parse(Seq("server", "restart")).isLeft)
    assert(Cli.parse(Seq("server", "bogus")).isLeft)
    assert(Cli.parse(Seq("server", "--port")).isLeft)   // dangling value
    assert(Cli.parse(Seq("server", "--port", "x")).isLeft)
  }

  test("lifecycle over the wire: ping -> link -> find -> callers -> stop") {
    val tree = writeTree("lib.zig" ->
      "fn alpha() void {\n    beta();\n}\nfn beta() void {\n    return;\n}\n")
    val state = java.nio.file.Files.createTempDirectory("graft-srv-state")
      .toFile.getAbsolutePath
    val srv = new CliServer(spark, state).start()
    val port = srv.boundPort
    try {
      def req(line: String): String = CliServer.request("127.0.0.1", port, line)

      assert(req("ping").contains("\"pong\""))
      assert(req("version").contains(Cli.Version))

      val linked = req(s"link --path ${tree.getAbsolutePath} --name proj")
      assert(linked.startsWith("""{"ok":true"""), linked)

      val found = req("find --type function --name alpha --workspace proj")
      assert(found.contains("lib.zig:alpha"), found)

      // alpha calls beta -> alpha is a depth-1 caller of beta
      val callers = req("show --relation callers --target beta --workspace proj")
      assert(callers.contains("lib.zig:beta") &&
        callers.contains("lib.zig:alpha"), callers)

      // parse errors come back structured, connection stays usable
      assert(req("find --typo x").startsWith("""{"ok":false"""))
      assert(req("ping").contains("\"pong\""))

      // one request per line on a SINGLE connection too
      val s = new java.net.Socket("127.0.0.1", port)
      try {
        val out = new java.io.PrintWriter(
          new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"), true)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
        out.println("status")
        assert(in.readLine().contains("proj"))
        out.println("help --topic server")
        assert(in.readLine().contains("server [start|stop|restart|status]"))
      } finally s.close()

      assert(req("stop").contains("stopping"))
      srv.awaitTermination()
      intercept[java.io.IOException] {
        CliServer.request("127.0.0.1", port, "ping")
      }
    } finally {
      srv.stop()
      Option(tree.listFiles()).foreach(_.foreach(_.delete())); tree.delete()
    }
  }

  test("tokenizer: quoted names group; blank lines yield no tokens") {
    assert(CliServer.tokenize("""find --name "Foo Bar" --type function""") ==
      Seq("find", "--name", "Foo Bar", "--type", "function"))
    assert(CliServer.tokenize("  ") == Seq.empty)
    assert(CliServer.tokenize("""a "" b""") == Seq("a", "", "b"))
  }
}

package graft.api

import org.apache.spark.sql.SparkSession

/** `kausal server` — the long-lived daemon mode
  * (`/root/reference/src/cli/parser.zig:225` `parse_server`,
  * `src/server/connection_manager.zig`; the reference's e2e suite runs
  * every query against a live server, `tests/e2e/harness.zig:1-40`).
  *
  * The Spark analogue: a thin line-protocol loop over a warmed
  * SparkSession — the session, its extensions, and the workspace store
  * stay hot across requests, which is the entire point of daemon mode
  * (a cold `Cli.main` pays session startup per query; the reference
  * pays storage recovery per CLI invocation the same way,
  * `src/cli/cli.zig` connect-or-spawn).
  *
  * Protocol, mirroring the reference's request/response framing at
  * line granularity instead of its binary TCP header
  * (`server/cli_protocol.zig:83-574` — the wire FORMAT is a transport
  * detail, the command vocabulary is the capability):
  *   - one request per line: the CLI argument vector, shell-style
  *     tokenized (double quotes group words);
  *   - one response per line: `{"ok":true,"result":[...]}` with the
  *     rows as JSON objects, or `{"ok":false,"error":"..."}`;
  *   - `stop` shuts the server down (reference `kausal server stop`).
  *
  * Connections are handled sequentially — the single-threaded core is
  * the reference's own concurrency model ("Single-Threaded Core: no
  * data races by design", README.md:46); Spark parallelism lives
  * INSIDE each query, not across requests.
  */
final class CliServer(spark: SparkSession, stateDir: String, port: Int = 0,
                      host: String = "127.0.0.1") {

  // bind the REQUESTED interface, loopback by default — an
  // unauthenticated line protocol that can link arbitrary paths and
  // read file contents must never listen on the wildcard address
  // unless the operator explicitly asks (--host 0.0.0.0)
  private val socket = new java.net.ServerSocket(
    port, 50, java.net.InetAddress.getByName(host))
  @volatile private var running = true
  private val thread = new Thread(() => acceptLoop(), "graft-cli-server")

  /** Ephemeral-port friendly: the actually-bound port. */
  def boundPort: Int = socket.getLocalPort

  def start(): this.type = {
    thread.setDaemon(true)
    thread.start()
    this
  }

  /** Blocks until the serve loop exits (a client sent `stop`). */
  def awaitTermination(): Unit = thread.join()

  /** Idempotent shutdown; joins the accept loop. */
  def stop(): Unit = {
    running = false
    try socket.close() catch { case _: java.io.IOException => () }
    thread.join(30000)
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val conn = socket.accept()
        try handle(conn) finally conn.close()
      } catch {
        case _: java.net.SocketException => () // closed by stop()
        case _: java.io.IOException => ()
      }
    }

  private def handle(conn: java.net.Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(conn.getOutputStream, "UTF-8"), true)
    var line = in.readLine()
    while (line != null && running) {
      val toks = CliServer.tokenize(line)
      if (toks == Seq("stop")) {
        out.println("""{"ok":true,"result":[{"reply":"stopping"}]}""")
        running = false
        try socket.close() catch { case _: java.io.IOException => () }
        return
      }
      out.println(dispatch(toks))
      line = if (running) in.readLine() else null
    }
  }

  private def dispatch(toks: Seq[String]): String =
    try Cli.parse(toks) match {
      case Left(err) => CliServer.errorJson(err)
      case Right(cmd) =>
        val df =
          if (!Cli.isQueryCommand(cmd)) Cli.executeWorkspace(spark, stateDir, cmd)
          else if (WorkspaceStore.exists(spark, stateDir)) {
            val (blocks, edges) = WorkspaceStore.currentGraph(spark, stateDir)
            Cli.execute(blocks, edges, cmd)
          } else Cli.execute(
            graft.graph.CodeGraph.nodeBlocks(spark, stateDir),
            graft.graph.CodeGraph.edges(spark, stateDir), cmd)
        s"""{"ok":true,"result":${Cli.render(df, "json")}}"""
    } catch {
      case e: Throwable =>
        CliServer.errorJson(
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
}

object CliServer {

  /** Shell-style request tokenizer: whitespace-separated, double quotes
    * group words (`find --name "Foo Bar"`). No escapes — names with
    * embedded quotes don't occur in the command vocabulary.
    */
  private[api] def tokenize(line: String): Seq[String] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var seen = false
    for (c <- line) c match {
      case '"' => inQuote = !inQuote; seen = true
      case ' ' | '\t' if !inQuote =>
        if (seen) { toks += cur.result(); cur.clear(); seen = false }
      case ch => cur += ch; seen = true
    }
    if (seen) toks += cur.result()
    toks.toSeq
  }

  /** One-shot client: connect, send one request line, read one response
    * line — `kausal server stop` / `server status` against a live
    * daemon.
    */
  def request(host: String, port: Int, line: String): String = {
    val s = new java.net.Socket(host, port)
    try {
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"), true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      out.println(line)
      Option(in.readLine()).getOrElse("")
    } finally s.close()
  }

  private[api] def errorJson(msg: String): String =
    """{"ok":false,"error":"""" + msg.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"}"
}

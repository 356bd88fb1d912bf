package graft.api

import graft.graph.{CodeGraph, Direction, EdgeFilter, Traversal, TraversalSpec}
import graft.query.{Lookups, NameResolver}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI/API surface, mirroring the reference's command shapes
  * (`/root/reference/src/cli/parser.zig:38-156`): `find`, `show`,
  * `trace`, with text/json/csv rendering
  * (`parser.zig:13-17`, `renderer.zig`). The TCP wire protocol is a
  * transport detail, not a capability — the Spark build exposes the
  * same commands as a library API + a thin main.
  */
object Cli {

  sealed trait Command
  final case class FindCmd(entityType: String, name: String,
                           workspace: String = "", maxResults: Int = 10,
                           format: String = "text") extends Command
  final case class ShowCmd(relation: String, target: String,
                           workspace: String = "", maxDepth: Int = 3,
                           format: String = "text") extends Command
  final case class TraceCmd(direction: String, target: String,
                            maxDepth: Int = 10,
                            format: String = "text") extends Command

  private val EntityTypes = Set("function", "struct_type", "constant", "variable",
    "type", "struct", "const", "var", "document", "customer", "supplier",
    "nation", "region", "order", "part")
  private val Relations = Set("callers", "callees", "imports", "exports")
  private val Directions = Set("callers", "callees")
  private val Formats = Set("text", "json", "csv")

  private val KnownFlags = Set("type", "name", "workspace", "max-results",
    "relation", "target", "max-depth", "format", "direction")

  /** Argument parser for `find|show|trace` with the reference's flags
    * (`--type --name --workspace --max-results --relation --target
    * --max-depth --format`). Error-message-first like the reference
    * parser: an unknown/misspelled flag, a dangling `--flag` with no
    * value, or a bare non-flag token is an error — never silently
    * ignored (a typo'd flag running with defaults is worse than
    * failing).
    */
  def parse(args: Seq[String]): Either[String, Command] = {
    if (args.isEmpty) return Left("no command; expected find|show|trace")
    val pairs = args.tail.grouped(2).toSeq
    pairs.collectFirst {
      case Seq(k) if k.startsWith("--") => s"flag $k is missing a value"
      case Seq(k) => s"unexpected argument: $k"
      case Seq(k, _) if !k.startsWith("--") => s"expected a --flag, got: $k"
      case Seq(k, _) if !KnownFlags(k.drop(2)) => s"unknown flag: $k"
    } match {
      case Some(err) => return Left(err)
      case None => ()
    }
    val flags = pairs.collect { case Seq(k, v) => k.drop(2) -> v }.toMap
    def int(k: String, dflt: Int): Either[String, Int] =
      flags.get(k).map(v => v.toIntOption.toRight(s"--$k must be an integer"))
        .getOrElse(Right(dflt))
    val format = flags.getOrElse("format", "text")
    if (!Formats(format)) return Left(s"unknown format: $format")
    args.head match {
      case "find" =>
        for {
          t <- flags.get("type").toRight("find requires --type")
          n <- flags.get("name").toRight("find requires --name")
          _ <- if (EntityTypes(t)) Right(()) else Left(s"unknown entity type: $t")
          k <- int("max-results", 10)
        } yield FindCmd(t, n, flags.getOrElse("workspace", ""), k, format)
      case "show" =>
        for {
          r <- flags.get("relation").toRight("show requires --relation")
          t <- flags.get("target").toRight("show requires --target")
          _ <- if (Relations(r)) Right(()) else Left(s"unknown relation: $r")
          d <- int("max-depth", 3)
        } yield ShowCmd(r, t, flags.getOrElse("workspace", ""), d, format)
      case "trace" =>
        for {
          dir <- flags.get("direction").toRight("trace requires --direction")
          t <- flags.get("target").toRight("trace requires --target")
          _ <- if (Directions(dir)) Right(()) else Left(s"unknown direction: $dir")
          d <- int("max-depth", 10)
        } yield TraceCmd(dir, t, d, format)
      case other => Left(s"unknown command: $other")
    }
  }

  /** Map the CLI's entity-type vocabulary to stored unit types
    * (`struct_type` → `type` etc., reference `parser.zig:90-104`).
    */
  private def canonicalType(t: String): String = t match {
    case "struct_type" | "struct" => "type"
    case "constant" => "const"
    case "variable" => "var"
    case x => x
  }

  /** Execute against a blocks/edges pair. `show imports/exports` map to
    * outgoing/incoming `imports`-typed traversal at depth 1×maxDepth,
    * callers/callees to incoming/outgoing all-type traversal — the
    * reference's handler table (`server/cli_protocol.zig:282-441`).
    */
  def execute(blocks: DataFrame, edges: DataFrame, cmd: Command): DataFrame =
    cmd match {
      case FindCmd(t, n, ws, k, _) =>
        NameResolver.findByName(blocks, ws, canonicalType(t), n)
          .select("id", "unit_type", "unit_id", "content")
          .orderBy("id").limit(k)
      case ShowCmd(rel, target, ws, depth, _) =>
        // target may be a name of any unit type or a raw id: resolve by
        // trailing unit_id segment or exact id, workspace-scoped
        val wsBlocks = if (ws.isEmpty) blocks
                       else blocks.filter(col("workspace") === ws)
        val seedDf = wsBlocks.filter(
          substring_index(col("unit_id"), ":", -1) === target ||
            col("id") === target)
          .select("id").distinct()
        val (dir, filt) = rel match {
          case "callers" => (Direction.Incoming, EdgeFilter.All)
          case "callees" => (Direction.Outgoing, EdgeFilter.All)
          case "imports" => (Direction.Outgoing, EdgeFilter.Only("imports"))
          case "exports" => (Direction.Incoming, EdgeFilter.Only("imports"))
        }
        Traversal.bfs(edges, seedDf, TraversalSpec(dir, depth, 1000, filt))
          .join(blocks, Seq("id"))
          .select("id", "depth", "unit_type", "unit_id")
          .orderBy("depth", "id")
      case TraceCmd(dirName, target, depth, _) =>
        val seedDf = blocks.filter(
          substring_index(col("unit_id"), ":", -1) === target ||
            col("id") === target).select("id").distinct()
        val dir = if (dirName == "callers") Direction.Incoming else Direction.Outgoing
        Traversal.bfs(edges, seedDf,
          TraversalSpec(dir, depth, 1000, EdgeFilter.All, trackPaths = true))
          .select(col("id"), col("depth"), concat_ws("->", col("path")).as("path"))
          .orderBy("depth", "id")
    }

  /** Render a (small, already-capped) result in the reference's output
    * formats. Collects to the driver — CLI results are bounded by
    * max_results, never a full table.
    */
  def render(df: DataFrame, format: String): String = format match {
    case "json" => df.toJSON.collect().mkString("[", ",", "]")
    case "csv" =>
      val cols = df.columns
      def esc(s: String): String =
        if (s == null) ""
        else if (s.contains(",") || s.contains("\"") || s.contains("\n"))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      (cols.mkString(",") +: df.collect().map(_.toSeq.map(v =>
        esc(if (v == null) null else v.toString)).mkString(","))).mkString("\n")
    case _ => // text: aligned columns
      val cols = df.columns
      val rows = df.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString))
      val widths = cols.indices.map { i =>
        (cols(i).length +: rows.map(_(i).length)).max
      }
      def line(vals: Seq[String]): String =
        vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ")
      (line(cols.toIndexedSeq) +: rows.map(r => line(r))).mkString("\n")
  }

  /** Thin main: `runMain graft.api.Cli <sfDir> find --type ... ` —
    * runs against the derived fixture graph.
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    parse(args.drop(1).toSeq) match {
      case Left(err) => System.err.println(err); sys.exit(2)
      case Right(cmd) =>
        val fmt = cmd match {
          case c: FindCmd => c.format
          case c: ShowCmd => c.format
          case c: TraceCmd => c.format
        }
        println(render(execute(CodeGraph.nodeBlocks(spark, dir),
          CodeGraph.edges(spark, dir), cmd), fmt))
    }
    spark.stop()
  }
}

package graft.ingest

import graft.core.Schemas
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Directory → blocks + edges ingestion, the Spark re-expression of
  * `ingest_directory_to_blocks` / `parse_file_to_blocks` /
  * `translate_unit_to_block`
  * (`/root/reference/src/ingestion/ingest_directory.zig:37-173`,
  * `ingest_file.zig:38-118`).
  *
  * Shape: a files DataFrame (path, content) — from
  * `spark.read.format("text").option("wholetext", true)` or
  * `binaryFile` on a real tree — flatMapped through the pluggable
  * parser per partition, then translated to the block schema with
  * deterministic ids. Stats (files/blocks/errors) come from one
  * aggregation instead of mutable counters.
  */
object Ingest {

  final case class FileDoc(path: String, content: String)

  /** 1 MiB per-file cap, `src/workspace/manager.zig:386`; empty
    * source/content rejected (`core/types.zig:440-461`).
    */
  val MaxFileBytes: Long = 1024L * 1024

  /** Glob → anchored Java regex: `**` crosses directory boundaries (a
    * double-star followed by a slash also matches zero directories);
    * `*` and `?` stay within one path segment — the reference's
    * include/exclude pattern semantics (`ingest_directory.zig:84-130`).
    */
  private[ingest] def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob(i) match {
        case '*' if i + 1 < glob.length && glob(i + 1) == '*' =>
          if (i + 2 < glob.length && glob(i + 2) == '/') { sb ++= "(?:.*/)?"; i += 2 }
          else { sb ++= ".*"; i += 1 }
        case '*' => sb ++= "[^/]*"
        case '?' => sb ++= "[^/]"
        case c if "\\.[]{}()+^$|".indexOf(c) >= 0 => sb += '\\'; sb += c
        case c => sb += c
      }
      i += 1
    }
    sb.toString
  }

  /** Root-relative path from a file-source URI column — shared by the
    * batch and streaming readers so their path/glob semantics cannot
    * diverge. File sources URI-encode special characters (space →
    * `%20`) in both binaryFile's `path` and `input_file_name()`;
    * decode BEFORE stripping the (raw) root prefix, shielding literal
    * `+` first because url_decode is form-decoding (`+` → space).
    */
  private def relPathCol(uriCol: Column, rootAbs: String): Column = {
    val deSchemed = regexp_replace(uriCol, "^file:(//)?", "")
    val decoded = url_decode(regexp_replace(deSchemed, "\\+", "%2B"))
    regexp_replace(decoded,
      "^" + java.util.regex.Pattern.quote(rootAbs) + "/", "")
  }

  /** Any-glob predicate over a root-relative path column; `default`
    * is the empty-list value (include lists default-allow, exclude
    * lists default-deny).
    */
  private def globAnyCol(rel: Column, globs: Seq[String],
                         default: Boolean): Column =
    globs.map(g => rel.rlike("^" + globToRegex(g) + "$"))
      .reduceOption(_ || _).getOrElse(lit(default))

  /** include/exclude glob predicate over a root-relative path column. */
  private def globFilterCol(rel: Column, include: Seq[String],
                            exclude: Seq[String]): Column =
    globAnyCol(rel, include, default = true) &&
      !globAnyCol(rel, exclude, default = false)

  /** Driver-side `git ls-files -z` enumeration, the reference's
    * FIRST-choice source listing (`ingest_directory.zig:208-253`):
    * tracked paths when `root` is a git work tree, `None` — meaning
    * fall back to the filesystem walk, exactly like the reference —
    * when git is absent, exits non-zero, or lists nothing. Enumeration
    * is metadata-scale (the same listing the fs-walk holds on the
    * driver); missing-on-disk index entries are skipped.
    */
  private[ingest] def gitTrackedFiles(rootAbs: String): Option[Seq[String]] =
    try {
      if (!new java.io.File(rootAbs, ".git").exists()) None
      else {
        val proc = new ProcessBuilder("git", "ls-files", "-z")
          .directory(new java.io.File(rootAbs))
          .redirectErrorStream(false)
          .start()
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        val code = proc.waitFor()
        if (code != 0) None
        else {
          val rels = out.split('\u0000').iterator.map(_.trim).filter(_.nonEmpty)
            .filter(r => new java.io.File(s"$rootAbs/$r").isFile)
            .toSeq
          if (rels.isEmpty) None else Some(rels)
        }
      }
    } catch { case _: java.io.IOException => None }

  /** Hadoop path-glob escape for literal file paths handed to a
    * reader's `load(paths*)` (which glob-expands each path).
    */
  private def escapeGlob(p: String): String =
    p.flatMap(c => if ("*?{}[]\\".indexOf(c) >= 0) s"\\$c" else c.toString)

  /** Default include surface when the caller passes no globs — the
    * reference's `should_include_file` rule (`ingest_directory.zig:
    * 185-195`: EMPTY include patterns mean the source-extension list
    * `.zig .c .cpp .h .hpp .rs .go .py .js .ts`, NOT everything),
    * extended with the extensions the nine-extractor family
    * dispatches (`.scala .sc .java .tsx .jsx .mjs .cc .cxx .hh
    * .hxx`). A bare `link <dir>` therefore ingests the tree's CODE —
    * vendored tarballs, images, and lockfiles stay out of the store,
    * exactly as a reference user expects. Pass explicit globs
    * (`**` included) to widen.
    */
  val DefaultInclude: Seq[String] = Seq(
    // the reference's own list, ingest_directory.zig:185-195
    ".zig", ".c", ".cpp", ".h", ".hpp", ".rs", ".go", ".py", ".js", ".ts",
    // the extractor family's additional dispatch surface
    ".scala", ".sc", ".java", ".tsx", ".jsx", ".mjs",
    ".cc", ".cxx", ".hh", ".hxx"
  ).map(e => s"**/*$e")

  /** The real directory source, reference `ingest_directory_to_blocks`
    * enumeration (`ingest_directory.zig:37-253`): git-tracked files
    * first when the root is a work tree (ignored + untracked files
    * never enter the scan), recursive tree walk as the fallback;
    * include/exclude globs and the size cap apply on either path. The
    * scan itself is a `binaryFile` read — files are read BY EXECUTORS
    * in parallel, and the size cap is a pushed-down filter on the file
    * `length` metadata column (oversized payloads are never read).
    * Paths are returned RELATIVE to `root` so unit ids / block ids are
    * stable across hosts and tmp dirs. UTF-8 decode via binary→string
    * cast (codegen'd, no UDF).
    */
  def readDirectory(spark: SparkSession, root: String,
                    include: Seq[String] = DefaultInclude,
                    exclude: Seq[String] = Nil,
                    maxBytes: Long = MaxFileBytes): Dataset[FileDoc] = {
    import spark.implicits._
    val rootAbs = new java.io.File(root).getAbsolutePath.stripSuffix("/")
    val sized = enumerateSized(spark, rootAbs, maxBytes)
    val rel = relPathCol(col("path"), rootAbs)
    sized.filter(globFilterCol(rel, include, exclude))
      .select(rel.as("path"), col("content").cast("string").as("content"))
      .as[FileDoc]
  }

  /** The shared enumeration behind [[readDirectory]] and
    * [[readDirectoryWithTotal]]: one git-or-walk listing, size-capped
    * on the file-length metadata column (oversized payloads are never
    * read).
    */
  private def enumerateSized(spark: SparkSession, rootAbs: String,
                             maxBytes: Long): DataFrame = {
    // invalidate stale session state for this tree (r13): two hazards
    // when the SAME session re-reads a tree whose files changed on disk
    // between commands (exactly what `sync` exists for). (1)
    // InMemoryFileIndex.equals compares rootPaths ONLY, so a cached
    // Dataset rooted at this tree's scan (link's parsed units, a prior
    // sync's hash pass) is served — stale — for EVERY later scan of the
    // same root; (2) the shared FileStatusCache can hold a pre-edit
    // listing. refreshByPath drops both: cached plans rooted here are
    // invalidated and lazily re-materialized, listings are relisted.
    // Driver metadata work only.
    try spark.catalog.refreshByPath(rootAbs)
    catch { case _: org.apache.spark.sql.AnalysisException => () }
    val raw = gitTrackedFiles(rootAbs) match {
      case Some(rels) =>
        spark.read.format("binaryFile")
          .load(rels.map(r => escapeGlob(s"$rootAbs/$r")): _*)
      case None =>
        spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .load(rootAbs)
    }
    raw.filter(col("length") > 0 && col("length") <= maxBytes)
  }

  /** One-enumeration variant of [[readDirectory]] for callers that
    * also need the tree's include-independent file count — `link`
    * reports `files_skipped` = total − included. Builds ONE file index
    * (one `git ls-files` run / one recursive listing) and derives both
    * the included-file Dataset and the total count from it, instead of
    * enumerating the tree twice (r12 — on a huge monorepo the listing
    * IS the cost). The count action touches only the path/length
    * metadata columns; column pruning keeps file contents unread.
    */
  def readDirectoryWithTotal(spark: SparkSession, root: String,
                             include: Seq[String] = DefaultInclude,
                             exclude: Seq[String] = Nil,
                             maxBytes: Long = MaxFileBytes)
      : (Dataset[FileDoc], Long) = {
    import spark.implicits._
    val rootAbs = new java.io.File(root).getAbsolutePath.stripSuffix("/")
    val sized = enumerateSized(spark, rootAbs, maxBytes)
    val rel = relPathCol(col("path"), rootAbs)
    val base = sized.filter(!globAnyCol(rel, exclude, default = false))
    val nAll = base.select(rel.as("path")).count()
    val files = base.filter(globAnyCol(rel, include, default = true))
      .select(rel.as("path"), col("content").cast("string").as("content"))
      .as[FileDoc]
    (files, nAll)
  }

  /** Continuous ingestion: the Structured Streaming variant of
    * [[readDirectory]] — files appearing under `root` flow through the
    * same glob/cap filters and the same [[parseFiles]] transform, one
    * micro-batch per file listing (the streaming analogue of the
    * reference's sync-on-change loop, `manager.zig:249-377`). Scale
    * knobs are the file source's own: `maxFilesPerTrigger` for batch
    * sizing, a checkpoint dir for exactly-once. The size cap here
    * filters on decoded content length (the streaming text source has
    * no length metadata column to push down).
    */
  def readStreamDirectory(spark: SparkSession, root: String,
                          include: Seq[String] = DefaultInclude,
                          exclude: Seq[String] = Nil,
                          maxBytes: Long = MaxFileBytes): Dataset[FileDoc] = {
    import spark.implicits._
    val rootAbs = new java.io.File(root).getAbsolutePath.stripSuffix("/")
    val raw = spark.readStream.format("text")
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .load(rootAbs)
      .select(input_file_name().as("uri"), col("value").as("content"))
    val rel = relPathCol(col("uri"), rootAbs)
    raw.filter(globFilterCol(rel, include, exclude) &&
        octet_length(col("content")) > 0 &&
        octet_length(col("content")) <= maxBytes)
      .select(rel.as("path"), col("content")).as[FileDoc]
  }

  def parseFiles(files: Dataset[FileDoc], parser: SourceParser): Dataset[ParsedUnit] = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .filter(f => f.path.nonEmpty && f.content.nonEmpty &&
        f.content.getBytes("UTF-8").length <= MaxFileBytes)
      .flatMap(f => parser.parse(f.path, f.content))
  }

  /** Units → versioned blocks with the reference's conventions:
    * deterministic id = md5(workspace, unit_id); `source_uri` =
    * "file://<path>#L<start>-L<end>" (`ingest_file.zig:90-94`);
    * promoted metadata columns instead of a JSON blob.
    */
  def unitsToBlocks(units: Dataset[ParsedUnit], workspace: String,
                    sequence: Long = 1L): DataFrame =
    units.toDF()
      .select(
        Schemas.blockId(lit(workspace), col("unitId")).as("id"),
        lit(sequence).as("sequence"),
        lit(workspace).as("workspace"),
        col("unitType").as("unit_type"),
        col("unitId").as("unit_id"),
        col("filePath").as("file_path"),
        concat(lit("file://"), col("filePath"), lit("#L"), col("lineStart"),
          lit("-L"), col("lineEnd")).as("source_uri"),
        col("content"),
        lit(false).as("is_deleted"))

  /** Ingestion stats, reference `IngestStats`
    * (`ingest_directory.zig:64-71`): one aggregation, not counters.
    * `suppressed_arm_units` (r12, ADVICE) surfaces how many units were
    * recovered from non-taken preprocessor arms — the observable for
    * first-arm-wins recall on config-heavy C/C++ trees.
    */
  def stats(files: Dataset[FileDoc], units: Dataset[ParsedUnit]): DataFrame = {
    val f = files.count()
    val r = units.toDF().agg(
      count(lit(1)).as("u"),
      coalesce(sum(size(col("edges"))), lit(0L)).as("e"),
      coalesce(sum(when(col("arm") === "suppressed", 1L).otherwise(0L)),
        lit(0L)).as("sup")).first()
    val spark = files.sparkSession
    import spark.implicits._
    Seq((f, r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("files_processed", "blocks_generated", "raw_edges",
        "suppressed_arm_units")
  }
}

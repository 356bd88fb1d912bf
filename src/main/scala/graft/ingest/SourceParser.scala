package graft.ingest

/** Ingestion-side contract, mirroring the reference's `ParsedUnit`
  * (`/root/reference/src/ingestion/pipeline_types.zig:56-95`): a parsed
  * semantic unit plus its outgoing raw edges (`ParsedEdge`, `:35-50`,
  * target still a *name*, resolved later by [[SemanticResolver]]).
  */
final case class ParsedEdge(edgeType: String, targetName: String)

final case class ParsedUnit(
    unitId: String,          // "<file_path>:<entity>" or "<file_path>:<Container>:<entity>"
    unitType: String,        // function | type | const | import | test | document
    name: String,
    parentContainer: String, // "" at top level
    filePath: String,
    lineStart: Int,
    lineEnd: Int,
    content: String,
    edges: Seq[ParsedEdge],
    // "" = active code; "suppressed" = a definition recovered from a
    // non-taken preprocessor arm (C/C++ first-arm-wins, r12): the NAME
    // is indexed so `#else`-only definitions stay findable, but the
    // unit carries no call edges and its extent is the signature — the
    // tag lets consumers and ingest stats tell the two apart.
    arm: String = "")

/** Pluggable parser: (path, content) → units. The reference walks a real
  * Zig AST (`parsers/zig_parser.zig`); that is language tooling, not
  * engine — the JVM build ships a line/regex extractor for a simple
  * brace language that preserves the unit/edge CONTRACT exactly
  * (SURVEY.md §7.4 risk note). Runs inside `mapPartitions`/`flatMap`
  * over a files DataFrame, so any real parser (tree-sitter via JNI, …)
  * drops in per-partition.
  */
trait SourceParser extends Serializable {
  def parse(filePath: String, content: String): Seq[ParsedUnit]
}

/** Scaffolding shared by the four real-language extractors (Zig,
  * Scala, Python, Go): the in-flight unit builder, the scope frame,
  * the call-site scan, and unit finalization (id assignment, duplicate
  * suffixing, body slicing, document fallback). One copy, so a change
  * to a cross-language rule — the `.m(` → calls_method dispatch, the
  * `#line` duplicate-id scheme — cannot silently diverge per parser.
  */
private[ingest] object ParserScaffold {

  final case class UnitBuilder(
      unitType: String, name: String, parent: String, lineStart: Int,
      var lineEnd: Int,
      edges: scala.collection.mutable.ArrayBuffer[ParsedEdge] =
        scala.collection.mutable.ArrayBuffer.empty,
      arm: String = "")

  /** One open scope. `boundary` is the brace depth just before the
    * body's `{` (brace languages) or the declaration line's indent
    * (Python) — the value the scan compares against to close it.
    */
  final case class Frame(kind: String, ub: UnitBuilder, boundary: Int)

  /** Blank C/C++ attribute spans in a cleaned line — `[[nodiscard]]`,
    * `__attribute__((format(printf, 1, 2)))` (balanced parens, so the
    * nested form works), `__declspec(dllexport)` — which otherwise sit
    * between a declaration's start and its name and defeat the
    * structural matchers (`__attribute__` even scans as the declarator
    * name of a `(`-led "function"). Spaces preserve column positions.
    */
  def stripCAttrs(line: String): String = {
    if (!(line.contains("[[") || line.contains("__attribute__") ||
        line.contains("__declspec"))) return line
    val out = line.toCharArray
    def blankParens(from: Int): Int = {
      var k = from
      while (k < out.length && out(k) != '(') {
        if (!out(k).isWhitespace) return from // no parens follow
        k += 1
      }
      var depth = 0
      while (k < out.length) {
        if (out(k) == '(') depth += 1
        else if (out(k) == ')') depth -= 1
        out(k) = ' '
        k += 1
        if (depth == 0) return k
      }
      k
    }
    var i = 0
    while (i < out.length) {
      if (out(i) == '[' && i + 1 < out.length && out(i + 1) == '[') {
        val end = line.indexOf("]]", i)
        val stop = if (end < 0) out.length else end + 2
        var k = i
        while (k < stop) { out(k) = ' '; k += 1 }
        i = stop
      } else if (line.startsWith("__attribute__", i) ||
          line.startsWith("__declspec", i)) {
        val kw = if (line.startsWith("__attribute__", i)) 13 else 10
        var k = i
        while (k < i + kw) { out(k) = ' '; k += 1 }
        i = blankParens(k)
      } else i += 1
    }
    new String(out)
  }

  /** Scan `text` for call-sites and append edges to `to`: `.m(...)` →
    * `calls_method`, bare `m(...)` → `calls` (the reference's
    * distinction, zig_parser.zig:404-414); identifiers in `keywords`
    * and sites whose preceding char is in `excludedPrev` (language
    * syntax like Zig/Python `@`, Scala type application `[`) are not
    * calls.
    */
  def addCalls(text: String, to: UnitBuilder, keywords: Set[String],
               excludedPrev: Set[Char]): Unit =
    {
    // hand-rolled scan of CallRe (`([A-Za-z_]\w*)\s*\(`) — this runs
    // on every function-body line of every parser; the regex engine's
    // matcher allocation + reset was ~10% of the whole parse in the
    // r11 sampling profile. Semantics identical to findAllMatchIn:
    // a token may begin at any letter/underscore (so `0x1f(` yields
    // callee `x1f`, as the regex did), the gap before `(` admits any
    // regex-`\s` whitespace, and `prev` looks back over spaces only.
    def isWs(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' ||
      c == '\u000B' || c == '\f' || c == '\r'
    // ASCII-exact `[A-Za-z_]` / `\w`, NOT Char.isLetter — the regex
    // never matched unicode letters and neither may the scan
    def isIdStart(c: Char): Boolean = c == '_' ||
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isIdPart(c: Char): Boolean =
      isIdStart(c) || (c >= '0' && c <= '9')
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isIdStart(c)) {
        val start = i
        i += 1
        while (i < n && isIdPart(text.charAt(i))) i += 1
        var k = i
        while (k < n && isWs(text.charAt(k))) k += 1
        if (k < n && text.charAt(k) == '(') {
          val callee = text.substring(start, i)
          var p = start - 1
          while (p >= 0 && text.charAt(p) == ' ') p -= 1
          val prev = if (p >= 0) text.charAt(p) else ' '
          val edgeType = if (prev == '.') "calls_method" else "calls"
          if (!excludedPrev.contains(prev) && !keywords(callee))
            to.edges += ParsedEdge(edgeType, callee)
          i = k + 1 // resume past the `(`, as the regex scan did
        }
      } else i += 1
    }
    }

  /** C/C++ preprocessor-conditional machine (r10 literal arms, r11
    * first-arm-wins, r12 recoverability), shared by [[CParser]] and
    * [[CppParser]] so the arm rules cannot diverge. Literal arms are
    * decided (`#if 0` dead, `#if 1`'s `#else` dead); macro conditions
    * take the FIRST arm and suppress the rest. `recoverable`
    * distinguishes the two kinds of suppression: a macro-conditional
    * alternative arm (`#ifdef _WIN32 … #else`) is plausibly active in
    * another build config — its definition names are worth recovering —
    * while a literally-dead arm (`#if 0`, the classic disabled-code
    * idiom, or the `#else` of a taken literal) is dead in EVERY config
    * and recovers nothing.
    */
  final class CondTracker {
    private final case class Arm(suppress: Boolean, took: Boolean,
                                 takenLiteral: Boolean, recover: Boolean)
    private val stack = scala.collection.mutable.ArrayBuffer.empty[Arm]
    /** Arm-relative brace depth for the recovery scan — reset per arm
      * (each arm's braces are routinely unbalanced against file scope,
      * so its depth machine is its own).
      */
    var armDepth: Int = 0
    def suppressed: Boolean = stack.exists(_.suppress)
    /** Suppressed AND every suppressing level is a macro-conditional
      * arm — the gate for suppressed-arm unit recovery.
      */
    def recoverable: Boolean = suppressed &&
      stack.forall(a => !a.suppress || a.recover)
    /** Handle a directive; true when `d` was a conditional directive
      * (the caller treats the line as consumed either way it returns).
      * Only CONDITIONAL directives reset the arm-relative depth (r13,
      * ADVICE): a `#define`/`#pragma`/`#include` in the middle of a
      * suppressed function body is not an arm boundary — zeroing the
      * depth there made the body's remaining block-local declarations
      * scan as spurious file-scope suppressed units.
      */
    def directive(d: String, arg: String): Boolean = {
      d match {
        case "if" | "ifdef" | "ifndef" | "elif" | "else" | "endif" =>
          armDepth = 0
        case _ => return false
      }
      d match {
        case "if" =>
          stack += Arm(suppress = arg == "0", took = arg != "0",
            takenLiteral = arg == "1", recover = false)
          true
        case "ifdef" | "ifndef" =>
          stack += Arm(suppress = false, took = true,
            takenLiteral = false, recover = false)
          true
        case "elif" =>
          if (stack.nonEmpty) {
            val a = stack.last
            stack(stack.length - 1) =
              if (a.took) Arm(suppress = true, took = true,
                takenLiteral = a.takenLiteral, recover = !a.takenLiteral)
              else Arm(suppress = arg == "0", took = arg != "0",
                takenLiteral = arg == "1", recover = false)
          }
          true
        case "else" =>
          if (stack.nonEmpty) {
            val a = stack.last
            stack(stack.length - 1) =
              if (a.took) Arm(suppress = true, took = true,
                takenLiteral = a.takenLiteral, recover = !a.takenLiteral)
              else Arm(suppress = false, took = true,
                takenLiteral = false, recover = false)
          }
          true
        case "endif" =>
          if (stack.nonEmpty) stack.remove(stack.length - 1)
          true
        case _ => false
      }
    }
  }

  /** Append suppressed-arm recovered builders (C/C++ first-arm-wins
    * recovery, r12) to the active list, dropping any whose
    * (type, name, parent) an ACTIVE unit already carries — the taken
    * arm wins, so recovery can never reintroduce the double-count
    * first-arm-wins was built to kill — and deduping within the
    * recovered set itself (identical definitions across #elif arms).
    */
  def appendSuppressed(
      builders: scala.collection.mutable.ArrayBuffer[UnitBuilder],
      suppressed: Seq[UnitBuilder]): Unit = {
    if (suppressed.isEmpty) return
    val active =
      builders.iterator.map(b => (b.unitType, b.name, b.parent)).toSet
    val seen =
      scala.collection.mutable.HashSet.empty[(String, String, String)]
    suppressed.foreach { b =>
      val k = (b.unitType, b.name, b.parent)
      if (!active(k) && seen.add(k)) builders += b
    }
  }

  /** Builders → ParsedUnits: the shared unit-id scheme
    * (`file:import:<name>` / `file:test:<line>` / `file[:Parent]:name`),
    * optional `#line` suffixing for duplicate ids (overloads,
    * companions, redefinitions — deterministic), the original-line body
    * slice, and the one-`document`-unit fallback for files with no
    * recognized declarations (the reference's non-code path).
    */
  def finish(filePath: String, content: String, origLines: Array[String],
             builders: Seq[UnitBuilder], dedupIds: Boolean): Seq[ParsedUnit] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val units = builders.map { ub =>
      val base = ub.unitType match {
        case "import" => s"$filePath:import:${ub.name}"
        case "test" => s"$filePath:test:${ub.lineStart}"
        case _ if ub.parent.nonEmpty => s"$filePath:${ub.parent}:${ub.name}"
        case _ => s"$filePath:${ub.name}"
      }
      val unitId =
        if (!dedupIds || seen.add(base)) base else s"$base#${ub.lineStart}"
      val body = origLines.slice(ub.lineStart - 1, ub.lineEnd)
        .mkString("\n").trim
      ParsedUnit(unitId, ub.unitType, ub.name, ub.parent, filePath,
        ub.lineStart, ub.lineEnd, body, ub.edges.distinct.toSeq, ub.arm)
    }
    if (units.isEmpty && content.trim.nonEmpty)
      Seq(ParsedUnit(s"$filePath:document", "document",
        filePath.split('/').last, "", filePath, 1, origLines.length,
        content, Seq.empty))
    else units
  }
}

/** Extractor for a Zig-ish toy language:
  *   - `fn name(args) { ... }`            → function unit
  *   - `type Name { ... }`                → type (container) unit;
  *      nested `fn` inside a type body gets parent = Name and a
  *      `method_of` edge (reference `zig_parser.zig:350-357`)
  *   - `const NAME = ...` / `var NAME`    → const/var unit
  *   - `import "x"` / `import x`          → import unit + `imports` edge
  *   - `test "name" { ... }`              → test unit
  *   - `callee(...)` inside a body        → `calls` edge with the raw
  *      callee name (resolved later; reference `zig_parser.zig:382-441`)
  * Non-code files (no recognized declarations) become one `document`
  * unit, like the reference's content-type dispatch
  * (`ingest_file.zig:44-58`).
  */
object SimpleParser extends SourceParser {
  private val FnRe = """^\s*fn\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(.*""".r
  private val TypeRe = """^\s*type\s+([A-Za-z_][A-Za-z0-9_]*)\s*\{.*""".r
  private val ConstRe = """^\s*(const|var)\s+([A-Za-z_][A-Za-z0-9_]*).*""".r
  private val ImportRe = """^\s*import\s+"?([A-Za-z0-9_./]+)"?\s*;?\s*$""".r
  private val TestRe = """^\s*test\s+"([^"]+)"\s*\{.*""".r
  private val CallRe = """([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val Keywords = Set("fn", "if", "while", "for", "switch", "type", "test")

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val lines = content.split("\n", -1)
    val units = scala.collection.mutable.ArrayBuffer.empty[ParsedUnit]
    var container = ""          // current `type` block, by brace depth
    var containerDepth = 0
    var depth = 0

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val lineNo = i + 1
      line match {
        case TypeRe(name) =>
          units += ParsedUnit(s"$filePath:$name", "type", name, "", filePath,
            lineNo, lineNo, line.trim, Seq.empty)
          container = name
          containerDepth = depth
        case FnRe(name) =>
          val parent = if (container.nonEmpty && depth > containerDepth) container else ""
          val (body, endLine) = readBody(lines, i)
          val calls = body.flatMap(extractCalls).filterNot(_ == name).distinct
          val unitId = if (parent.isEmpty) s"$filePath:$name"
                       else s"$filePath:$parent:$name"
          val edges = calls.map(c => ParsedEdge("calls", c)) ++
            (if (parent.nonEmpty) Seq(ParsedEdge("method_of", parent)) else Seq.empty)
          units += ParsedUnit(unitId, "function", name, parent, filePath,
            lineNo, endLine, (line +: body).mkString("\n").trim, edges)
        case ConstRe(kind, name) =>
          units += ParsedUnit(s"$filePath:$name", kind, name, "", filePath,
            lineNo, lineNo, line.trim, Seq.empty)
        case ImportRe(target) =>
          units += ParsedUnit(s"$filePath:import:$target", "import", target, "",
            filePath, lineNo, lineNo, line.trim,
            Seq(ParsedEdge("imports", target)))
        case TestRe(name) =>
          val (body, endLine) = readBody(lines, i)
          val calls = body.flatMap(extractCalls).distinct
          units += ParsedUnit(s"$filePath:test:$name", "test", name, "",
            filePath, lineNo, endLine, (line +: body).mkString("\n").trim,
            calls.map(c => ParsedEdge("calls", c)))
        case _ => ()
      }
      depth += line.count(_ == '{') - line.count(_ == '}')
      if (container.nonEmpty && depth <= containerDepth) container = ""
      i += 1
    }
    if (units.isEmpty && content.trim.nonEmpty)
      Seq(ParsedUnit(s"$filePath:document", "document",
        filePath.split('/').last, "", filePath, 1, lines.length,
        content, Seq.empty))
    else units.toSeq
  }

  /** Body lines of a brace block opened on `lines(start)` (exclusive of
    * the opening line), plus the 1-based end line.
    */
  private def readBody(lines: Array[String], start: Int): (Seq[String], Int) = {
    var depth = lines(start).count(_ == '{') - lines(start).count(_ == '}')
    if (depth <= 0) return (Seq.empty, start + 1)
    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = start + 1
    while (j < lines.length && depth > 0) {
      depth += lines(j).count(_ == '{') - lines(j).count(_ == '}')
      if (depth > 0 || lines(j).trim != "}") body += lines(j)
      j += 1
    }
    (body.toSeq, j)
  }

  private def extractCalls(line: String): Seq[String] =
    CallRe.findAllMatchIn(line).map(_.group(1)).filterNot(Keywords).toSeq
}

package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade GO source extractor — the fourth real language
  * behind the pluggable [[SourceParser]] contract, rounding out what a
  * data-infrastructure codebase actually contains (Zig, Scala, Python,
  * Go). Same architecture as [[ZigParser]]: a comment/string-safe
  * cleaning pre-pass, then a single brace-scoped structural scan,
  * recovering the reference walker's unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from Go shapes:
  *
  *   - `func Name(...)` → `function` units. A METHOD declaration
  *     `func (r *T) Name(...)` carries `parentContainer = T` + a
  *     `method_of` edge — Go attaches methods by receiver, not lexical
  *     nesting, so the container comes from the receiver type where
  *     the brace languages read the enclosing scope. `func TestXxx(`
  *     (the `go test` registration convention) → `test` units, the
  *     role Zig's `test "..."` block plays. `calls` edges from
  *     identifier call-sites and `calls_method` from `.Method(...)`
  *     call-sites in signature + body, attached to the innermost
  *     enclosing function — the walker's `current_function` rule.
  *   - `type Name struct/interface/...` → `type` units (one per spec;
  *     the grouped `type ( ... )` block emits one per line).
  *   - `import "a/b"` and the grouped `import ( alias "a/b" ... )`
  *     block → one `import` unit per path, named by the alias or the
  *     path's last segment, + an `imports` edge targeting that
  *     segment. Unresolvable targets (fmt, os, …) drop in
  *     [[SemanticResolver]], like Zig's `std`.
  *   - top-level `const X` / `var X` and the grouped `const ( ... )` /
  *     `var ( ... )` blocks (incl. bare `iota` continuation lines) →
  *     `const`/`var` units. Function-local bindings (incl. `:=`) are
  *     skipped — the same documented scope deviation as the other
  *     extractors.
  *
  * Lexical honesty comes from the cleaning pre-pass: `//` comments,
  * `/* */` block comments (non-nesting, per the spec), interpreted
  * `"…"` strings, rune literals, and multi-line backtick raw strings
  * are blanked with structure preserved — except import paths, which
  * are read from the ORIGINAL line (the one place a string literal IS
  * the declaration, like Zig's `@import("...")`).
  *
  * Closure literals BOUND to a name (`x := func(…) {…}`,
  * `var f = func(…) …`) are `function` units with their own call
  * scope — the TsParser arrow-binding rule (r10). Anonymous literals
  * (`go func() {…}()`, callback arguments) still attach their calls
  * to the enclosing function.
  *
  * What a line-grade scan gives up vs `go/ast`: generic
  * instantiations `f[T](x)` lose the call edge. What it gains: zero
  * native dependencies and per-partition parallelism inside
  * `flatMap`.
  */
object GoParser extends SourceParser {

  // receiver: optional NAME (unnamed receivers are legal), optional
  // `*`, the type, optional generic params `[T]`
  private val FuncRe =
    """^\s*func\s+(?:\(\s*(?:\w+\s+)?\*?([A-Za-z_]\w*)(?:\[[^\]]*\])?\s*\)\s+)?([A-Za-z_]\w*)\s*[(\[]""".r
  private val TypeRe =
    """^\s*type\s+([A-Za-z_]\w*)(?:\[[^\]]*\])?\s+""".r
  private val ImportOneRe = """^\s*import\s+(?:(\w+|\.)\s+)?"([^"]+)"""".r
  private val GroupOpenRe = """^\s*(import|const|var|type)\s*\(\s*$""".r
  private val ImportLineRe = """^\s*(?:(\w+|\.)\s+)?"([^"]+)"""".r
  private val ConstVarRe = """^\s*(const|var)\s+([A-Za-z_]\w*)""".r
  // a binding whose RHS is a func literal: `x := func(`, `x = func(`,
  // `var x = func(` — the Go shape of TsParser's arrow-binding rule
  private val FuncBindRe =
    """^\s*(?:var\s+)?([A-Za-z_]\w*)\s*:?=\s*func\s*[(\[]""".r
  private val IdentLineRe = """^\s*([A-Za-z_]\w*)""".r
  private val TypeSpecRe = """^\s*([A-Za-z_]\w*)(?:\[[^\]]*\])?\s+\S""".r

  /** Call-shaped but syntax. Builtins (`make`, `len`, `append`, …)
    * stay IN — real calls whose unresolvable targets drop in the
    * resolver, exactly like Zig's `std.*`.
    */
  private val Keywords = Set(
    "if", "for", "switch", "select", "go", "defer", "return", "range",
    "func", "interface", "struct", "chan", "map", "case", "else", "goto",
    "break", "continue", "fallthrough", "package", "import", "type",
    "const", "var")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]
    var group: String = "" // inside `import (` / `const (` / `var (` / `type (`

    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" || k == "test" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set.empty)

    def emitImport(alias: String, path: String, lineNo: Int): Unit = {
      val tail = path.split('/').last
      val bound =
        if (alias != null && alias.nonEmpty && alias != ".") alias else tail
      if (bound.matches("[A-Za-z_]\\w*"))
        builders += UnitBuilder("import", bound, "", lineNo, lineNo,
          ArrayBuffer(ParsedEdge("imports", tail)))
    }

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None

      if (group.nonEmpty) {
        // inside a grouped declaration block: one spec per line until
        // the closing `)` (group blocks don't nest, per the grammar)
        if (line.trim == ")") group = ""
        else group match {
          case "import" =>
            ImportLineRe.findFirstMatchIn(origLines(i)).foreach { m =>
              emitImport(m.group(1), m.group(2), lineNo)
            }
          case "type" =>
            TypeSpecRe.findFirstMatchIn(line).foreach { m =>
              builders += UnitBuilder("type", m.group(1), "", lineNo, lineNo)
            }
          case kind => // const | var; bare `Name` lines continue iota
            IdentLineRe.findFirstMatchIn(line)
              .filterNot(m => m.group(1) == "iota")
              .foreach { m =>
                builders += UnitBuilder(kind, m.group(1), "", lineNo, lineNo)
              }
        }
      } else if (!insideFunction && GroupOpenRe.findFirstMatchIn(line).isDefined) {
        // function-local `const (`/`var (` blocks are locals — skipped,
        // the same documented deviation as single local declarations
        group = GroupOpenRe.findFirstMatchIn(line).get.group(1)
      } else if (line.trim.startsWith("import")) {
        // single import: the keyword must survive CLEANING (an import
        // line inside a block comment or raw string is text, not code);
        // the PATH lives in a (cleaned-away) string, so it reads from
        // the original line
        ImportOneRe.findFirstMatchIn(origLines(i)).foreach { m =>
          emitImport(m.group(1), m.group(2), lineNo)
        }
      } else if (FuncRe.findFirstMatchIn(line).isDefined) {
        val m = FuncRe.findFirstMatchIn(line).get
        val recv = Option(m.group(1)).getOrElse("")
        val name = m.group(2)
        val isTest = recv.isEmpty && name.startsWith("Test") &&
          name.drop(4).headOption.forall(!_.isLower)
        val kind = if (isTest) "test" else "function"
        val ub = UnitBuilder(kind, name, recv, lineNo, lineNo)
        if (kind == "function" && recv.nonEmpty)
          ub.edges += ParsedEdge("method_of", recv)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(sig.replaceFirst("""func\s+(?:\([^)]*\)\s+)?[A-Za-z_]\w*\s*\(""",
          " ( "), ub)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame(kind, ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (FuncBindRe.findFirstMatchIn(line).isDefined) {
        // closure literal bound to a name (`handler := func(w, r) {…}`,
        // `var f = func(…) …`) → a `function` unit named by the
        // binding, exactly TsParser's arrow-binding rule (r10; was: the
        // literal was invisible and its calls bled into the enclosing
        // function — the one extractor gap a modern Go codebase hits
        // constantly). Body calls attach to the closure's own frame.
        val name = FuncBindRe.findFirstMatchIn(line).get.group(1)
        val ub = UnitBuilder("function", name, "", lineNo, lineNo)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(sig.replaceFirst("""^.*?func\s*\(""", " ( "), ub)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame("function", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (!insideFunction && TypeRe.findFirstMatchIn(line).isDefined) {
        val name = TypeRe.findFirstMatchIn(line).get.group(1)
        builders += UnitBuilder("type", name, "", lineNo, lineNo)
        // struct/interface bodies carry no units of their own (methods
        // hang off receivers), so the body is consumed by depth
        // accounting alone — no container frame needed
      } else if (!insideFunction && ConstVarRe.findFirstMatchIn(line).isDefined) {
        val m = ConstVarRe.findFirstMatchIn(line).get
        builders += UnitBuilder(m.group(1), m.group(2), "", lineNo, lineNo)
      } else {
        currentCallTarget.foreach(t => addCalls(line, t))
      }

      var j = i
      while (j <= consumedTo) {
        depth += cleanedLines(j).count(_ == '{') - cleanedLines(j).count(_ == '}')
        while (stack.nonEmpty && depth <= stack.last.boundary) {
          stack.last.ub.lineEnd = j + 1
          stack.remove(stack.length - 1)
        }
        j += 1
      }
      pending.foreach { f =>
        if (depth > f.boundary) stack += f
        else f.ub.lineEnd = consumedTo + 1
      }
      i = consumedTo + 1
    }
    for (f <- stack) f.ub.lineEnd = origLines.length

    ParserScaffold.finish(filePath, content, origLines, builders.toSeq,
      dedupIds = true)
  }

  /** Join cleaned lines from `start` until the declaration's body `{`
    * at paren-depth 0 (multi-line signatures). Same contract as
    * [[ZigParser]]'s joinDecl, with one Go-specific END rule: the spec's
    * semicolon insertion forces the body brace onto the SAME line the
    * signature ends on, so a line that closes all parens WITHOUT a `{`
    * is a bodyless declaration (assembly/linkname extern stubs) — stop
    * there instead of hunting forward and swallowing the next
    * declaration's brace. Lookahead bounded at 60 lines.
    */
  private def joinDecl(lines: Array[String], start: Int)
      : (String, Int, Boolean, String) = {
    val sb = new StringBuilder
    var paren = 0
    var j = start
    while (j < lines.length && j < start + 60) {
      val l = lines(j)
      var k = 0
      while (k < l.length) {
        l(k) match {
          case '(' | '[' => paren += 1
          case ')' | ']' => paren -= 1
          case '{' if paren <= 0 =>
            sb ++= l.take(k + 1); return (sb.toString, j, true, l.drop(k + 1))
          case _ => ()
        }
        k += 1
      }
      sb ++= l; sb += '\n'
      if (paren <= 0) return (sb.toString, j, false, "") // bodyless decl
      j += 1
    }
    (sb.toString, start, false, "")
  }

  /** Blank comments and string/rune literals, preserving line
    * structure: `//` to EOL, `/* */` across lines (non-nesting, per
    * the spec), `"…"` with escapes (newline-terminated — interpreted
    * strings cannot span lines), `'…'` runes, and multi-line backtick
    * raw strings (no escapes).
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…", 2 '…', 3 // comment, 4 /* */, 5 `…`
    var state = 0
    while (i < content.length) {
      val c = content(i)
      if (c == '\n') {
        out(i) = '\n'
        if (state == 1 || state == 2 || state == 3) state = 0
      } else state match {
        case 0 =>
          if (c == '/' && i + 1 < content.length && content(i + 1) == '/') {
            out(i) = ' '; state = 3
          } else if (c == '/' && i + 1 < content.length && content(i + 1) == '*') {
            out(i) = ' '; out(i + 1) = ' '; state = 4; i += 1
          } else if (c == '"') { out(i) = ' '; state = 1 }
          else if (c == '\'') { out(i) = ' '; state = 2 }
          else if (c == '`') { out(i) = ' '; state = 5 }
          else out(i) = c
        case 1 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '"') state = 0
        case 2 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '\'') state = 0
        case 4 =>
          out(i) = ' '
          if (c == '*' && i + 1 < content.length && content(i + 1) == '/') {
            out(i + 1) = ' '; state = 0; i += 1
          }
        case 5 =>
          out(i) = ' '
          if (c == '`') state = 0
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade SCALA source extractor — the second real language
  * behind the pluggable [[SourceParser]] contract (after [[ZigParser]]),
  * and the one that lets the engine ingest ITSELF: point it at this
  * repository and `show --relation callers` works on the engine's own
  * functions (ScalaParserSpec does exactly that). Same architecture as
  * the Zig extractor — a comment/string-safe cleaning pre-pass, then a
  * single structural scan with brace-scoped container/function stacks —
  * recovering the reference walker's unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from Scala shapes:
  *
  *   - `class` / `object` / `trait` declarations → `type` units that
  *     open a container scope (Zig: `const X = struct`). A COMPANION
  *     pair (object + class of one name) would collide on the
  *     `file:Name` unit id — later duplicates get `#<line>` appended,
  *     deterministically.
  *   - `def name` → `function` units; inside a container they carry
  *     `parentContainer` + a `method_of` edge; `calls` edges from
  *     identifier call-sites, `calls_method` from `.method(...)`
  *     call-sites, attached to the innermost enclosing function —
  *     the walker's `current_function` rule. Expression bodies
  *     (`def f = g(x)`, no braces) are joined via the continuation
  *     heuristic below. Symbolic names (`def ===`) are skipped.
  *   - container-level `val` / `var` → `const`/`var` units (locals
  *     inside function bodies are skipped — same documented scope
  *     deviation as the Zig extractor).
  *   - `import a.b.c` / `import a.b.{C, D}` → one `import` unit per
  *     statement + an `imports` edge per imported name (braces
  *     expanded; `_`/`*` wildcards fall back to the path's last
  *     segment). Unresolvable targets (spark, scala, java) drop in
  *     [[SemanticResolver]], like Zig's `std`.
  *   - `test("...")` registrations (ScalaTest FunSuite style — what
  *     this repo uses) → `test` units; calls inside the test body
  *     attach to the test unit, the same contract the other two
  *     parsers ship.
  *
  * What a line-grade scan gives up vs real Scala tooling (scalameta):
  * multi-line expression bodies are joined only while continuation is
  * syntactically evident (trailing `=`/`,`/operator or a leading
  * `extends`/`{` on the next line), generic applications (`foo[T](x)`)
  * lose the call edge (`[` guard), and string-interpolation splices
  * are blanked with their literals. What it gains: zero dependencies
  * beyond the JVM and per-partition parallelism inside `flatMap`.
  */
object ScalaParser extends SourceParser {

  private val Mods =
    """(?:(?:private|protected|sealed|abstract|final|implicit|override|lazy|inline|open|transparent|case)(?:\[\w+\])?\s+)*"""
  private val ContainerRe =
    (s"""^\\s*$Mods(class|object|trait)\\s+([A-Za-z_]\\w*)""").r
  private val DefRe =
    (s"""^\\s*${Mods}def\\s+([A-Za-z_]\\w*)""").r
  private val ValVarRe =
    (s"""^\\s*$Mods(val|var)\\s+([A-Za-z_]\\w*)""").r
  private val ImportRe =
    """^\s*import\s+([A-Za-z_][\w.]*?)(?:\.\{([^}]*)\}|\.(_|\*))?\s*;?\s*$""".r
  private val TestRe = """^\s*test\s*\(""".r
  private val TestNameRe = """^\s*test\s*\(\s*"([^"]*)"""".r

  private val Keywords = Set(
    "if", "while", "for", "match", "catch", "return", "throw", "do",
    "else", "yield", "case", "type", "def", "val", "var", "new", "this",
    "super", "with", "extends", "package", "import", "object", "class",
    "trait", "sealed", "final", "implicit", "override", "private",
    "protected", "lazy", "abstract", "try", "finally", "given", "using",
    "then", "synchronized")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]

    def parentContainer: String =
      stack.reverseIterator.collectFirst { case Frame("type", ub, _) => ub.name }
        .getOrElse("")
    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" || k == "test" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined

    // `[T](...)` is a type application, not a call; annotations
    // (`@inline(`) are not calls either
    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set('@', '['))

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None

      if (ImportRe.findFirstMatchIn(line).isDefined) {
        // imports are read from the ORIGINAL line: the cleaner only
        // blanks comments/strings, never import paths, but keep parity
        // with the other parsers' convention of exact-name extraction
        ImportRe.findFirstMatchIn(origLines(i)).orElse(
            ImportRe.findFirstMatchIn(line)).foreach { m =>
          val path = m.group(1)
          val braced = Option(m.group(2))
          val lastSeg = path.split('.').last
          val targets = braced match {
            case Some(names) => names.split(',').toSeq
              .map(_.trim.split("=>").head.trim) // renames: original name
              .filter(n => n.nonEmpty && n != "_" && n != "*")
            case None => Seq(lastSeg)
          }
          val ub = UnitBuilder("import", lastSeg, parentContainer,
            lineNo, lineNo)
          targets.foreach(t => ub.edges += ParsedEdge("imports", t))
          builders += ub
        }
      } else if (ContainerRe.findFirstMatchIn(line).isDefined) {
        val name = ContainerRe.findFirstMatchIn(line).get.group(2)
        val ub = UnitBuilder("type", name, parentContainer, lineNo, lineNo)
        builders += ub
        val (_, end, opened, _) = joinDecl(cleanedLines, i)
        if (opened) pending = Some(Frame("type", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (DefRe.findFirstMatchIn(line).isDefined) {
        val name = DefRe.findFirstMatchIn(line).get.group(1)
        val parent = parentContainer
        val ub = UnitBuilder("function", name, parent, lineNo, lineNo)
        if (parent.nonEmpty) ub.edges += ParsedEdge("method_of", parent)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        // default-arg / return-type / expression-body call-sites belong
        // to the fn (the walker's pre-order visit); strip the decl
        // keyword so `def f(` is not read as a call to f
        addCalls(sig.replaceFirst("""def\s+[A-Za-z_]\w*""", " "), ub)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame("function", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (TestRe.findFirstMatchIn(line).isDefined && !insideFunction) {
        val name = TestNameRe.findFirstMatchIn(origLines(i)).map(_.group(1))
          .getOrElse(s"test_$lineNo")
        val ub = UnitBuilder("test", name, parentContainer, lineNo, lineNo)
        builders += ub
        val (_, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame("test", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (!insideFunction &&
          ValVarRe.findFirstMatchIn(line).isDefined) {
        val m = ValVarRe.findFirstMatchIn(line).get
        // `val` → const, matching the unit-type vocabulary the other
        // parsers emit (function|type|const|var|import|test|document)
        val kind = if (m.group(1) == "val") "const" else "var"
        builders += UnitBuilder(kind, m.group(2), parentContainer,
          lineNo, lineNo)
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

    // companions (object + class of one name) and overloads share a
    // base id → dedupIds appends `#line` to later duplicates
    ParserScaffold.finish(filePath, content, origLines, builders.toSeq,
      dedupIds = true)
  }

  /** Join cleaned lines from `start` into one declaration. Returns
    * (joined text, last line index, bodyOpened, remainder after `{`).
    * Stops at a `{` outside parens/brackets (body opens), or when the
    * declaration syntactically ENDS: a `;`, or a line that closes all
    * parens and neither ends in a continuation token (`=`, `=>`, `,`,
    * an operator, `extends`, `with`) nor is followed by a continuation
    * line (leading `{`, `extends`, `with`, `=`, `)`). Unlike Zig there
    * is no mandatory terminator, so without the end heuristic a
    * brace-less declaration (`case class X(...)`) would swallow its
    * successors hunting for a `{`. Lookahead bounded at 60 lines.
    */
  private def joinDecl(lines: Array[String], start: Int)
      : (String, Int, Boolean, String) = {
    val sb = new StringBuilder
    var nest = 0 // parens + brackets
    var j = start
    while (j < lines.length && j < start + 60) {
      val l = lines(j)
      var k = 0
      while (k < l.length) {
        l(k) match {
          case '(' | '[' => nest += 1
          case ')' | ']' => nest -= 1
          case '{' if nest <= 0 =>
            sb ++= l.take(k + 1); return (sb.toString, j, true, l.drop(k + 1))
          case ';' if nest <= 0 =>
            sb ++= l.take(k + 1); return (sb.toString, j, false, "")
          case _ => ()
        }
        k += 1
      }
      sb ++= l; sb += '\n'
      if (nest <= 0) {
        val t = l.trim
        val continues = t.isEmpty && j == start || // decl line itself blank: impossible, keep scanning guard simple
          t.endsWith("=") || t.endsWith("=>") || t.endsWith(",") ||
          t.endsWith("+") || t.endsWith("++") || t.endsWith("&&") ||
          t.endsWith("||") || t.endsWith(":") || t.endsWith("extends") ||
          t.endsWith("with") || {
            val nxt = if (j + 1 < lines.length) lines(j + 1).trim else ""
            nxt.startsWith("{") || nxt.startsWith("extends") ||
              nxt.startsWith("with") || nxt.startsWith("=") ||
              nxt.startsWith(")")
          }
        if (!continues) return (sb.toString, j, false, "")
      }
      j += 1
    }
    (sb.toString, math.min(j, lines.length - 1) max start, false, "")
  }

  /** Blank comments and string/char literals, preserving line
    * structure. Scala needs four states Zig doesn't: nested `/* */`
    * block comments (a depth counter — Scala block comments nest),
    * triple-quoted `"""..."""` strings (multi-line, no escapes),
    * interpolated literals (blanked whole, splices included), and the
    * SPLICE state itself: a `${...}` inside a string can nest braces
    * and its own string literals (s"${m.getOrElse("{")}"), so exiting
    * string state at the first `"` would leak the inner literal's
    * braces into depth accounting — the splice is tracked with its own
    * brace counter and inner-string flag and blanked entirely,
    * returning to the enclosing (single- or triple-quote) string state
    * at its matching `}`. Line comments reset at newline; block
    * comments, triple strings, and splices carry across lines.
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    var state = 0 // 0 normal, 1 string, 2 char, 3 line comment, 5 triple string, 6 splice
    var blockDepth = 0 // nested /* */ when > 0
    var spliceDepth = 0 // ${...} brace nesting when state == 6
    var spliceReturn = 1 // string state to resume after the splice
    var spliceInStr = false // inside a string literal within the splice
    def tripleAt(p: Int): Boolean =
      p + 2 < content.length && content(p) == '"' &&
        content(p + 1) == '"' && content(p + 2) == '"'
    def spliceAt(p: Int): Boolean =
      p + 1 < content.length && content(p) == '$' && content(p + 1) == '{'
    while (i < content.length) {
      val c = content(i)
      if (c == '\n') {
        out(i) = '\n'
        if (state == 3 || state == 1 || state == 2) state = 0
      } else if (blockDepth > 0) {
        out(i) = ' '
        if (c == '/' && i + 1 < content.length && content(i + 1) == '*') {
          out(i + 1) = ' '; blockDepth += 1; i += 1
        } else if (c == '*' && i + 1 < content.length && content(i + 1) == '/') {
          out(i + 1) = ' '; blockDepth -= 1; i += 1
        }
      } else state match {
        case 0 =>
          if (c == '/' && i + 1 < content.length && content(i + 1) == '/') {
            out(i) = ' '; state = 3
          } else if (c == '/' && i + 1 < content.length && content(i + 1) == '*') {
            out(i) = ' '; out(i + 1) = ' '; blockDepth = 1; i += 1
          } else if (tripleAt(i)) {
            out(i) = ' '; out(i + 1) = ' '; out(i + 2) = ' '
            state = 5; i += 2
          } else if (c == '"') { out(i) = ' '; state = 1 }
          else if (c == '\'' && i + 2 < content.length &&
              (content(i + 1) == '\\' || content(i + 2) == '\'')) {
            // a char literal ('x' or '\n'), NOT a symbol/quote — only
            // enter char state when a closing quote is in sight
            out(i) = ' '; state = 2
          } else out(i) = c
        case 1 =>
          out(i) = ' '
          if (spliceAt(i)) {
            out(i + 1) = ' '; i += 1
            state = 6; spliceDepth = 1; spliceReturn = 1; spliceInStr = false
          }
          else if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '"') state = 0
        case 2 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '\'') state = 0
        case 5 =>
          out(i) = ' '
          if (spliceAt(i)) {
            out(i + 1) = ' '; i += 1
            state = 6; spliceDepth = 1; spliceReturn = 5; spliceInStr = false
          } else if (tripleAt(i)) {
            out(i + 1) = ' '; out(i + 2) = ' '
            // a quadruple+ quote ends the literal at its LAST triple;
            // consuming greedily here is close enough for a cleaner
            state = 0; i += 2
          }
        case 6 =>
          out(i) = ' '
          if (spliceInStr) {
            if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
            else if (c == '"') spliceInStr = false
          } else c match {
            case '"' => spliceInStr = true
            case '{' => spliceDepth += 1
            case '}' =>
              spliceDepth -= 1
              if (spliceDepth == 0) state = spliceReturn
            case _ => ()
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

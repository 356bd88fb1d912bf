package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade PYTHON source extractor — the third real language
  * behind the pluggable [[SourceParser]] contract (after [[ZigParser]]
  * and [[ScalaParser]]), and the lingua franca of the data/ML codebases
  * a training-data engine actually gets pointed at (this repo's own
  * oracle tooling under `tools/` is the dogfood fixture —
  * `PythonParserSpec` ingests it). Same architecture as the other two —
  * a comment/string-safe cleaning pre-pass, then a single structural
  * scan — but scoping is INDENTATION-based, Python's block structure,
  * instead of brace depth; recovering the reference walker's unit/edge
  * surface (`/root/reference/src/ingestion/parsers/zig_parser.zig:
  * 317-680`) from Python shapes:
  *
  *   - `class Name(...):` → `type` units that open a container scope
  *     for nested declarations (Zig: `const X = struct`).
  *   - `def name(...):` / `async def` → `function` units; inside a
  *     class they carry `parentContainer` + a `method_of` edge;
  *     `calls` edges from identifier call-sites and `calls_method`
  *     from `.attr(...)` call-sites in the signature (defaults,
  *     annotations) and body, attached to the innermost enclosing
  *     function — the walker's `current_function` rule. Functions
  *     named `test_*` become `test` units (the pytest registration
  *     convention — the role Zig's `test "..."` block plays), with
  *     call-sites attached the same way.
  *   - `import a.b.c` (incl. `as` renames and comma lists) and
  *     `from a.b import c, d` → one `import` unit per statement +
  *     an `imports` edge per bound name (for `from`-imports the
  *     imported members; for plain imports the module's last
  *     segment). Relative `from . import x` keeps the member names.
  *     Unresolvable targets (os, json, …) drop in
  *     [[SemanticResolver]], like Zig's `std`.
  *   - module- or class-level `NAME = …` where NAME is UPPER_CASE →
  *     `const` units (PEP 8's constant convention). Deviation,
  *     documented like the other extractors' local-variable rule:
  *     lower-case module/class assignments and all function-local
  *     bindings are skipped — binding noise no reference query
  *     consumes, and Python has no `const` keyword to anchor on.
  *
  * Lexical honesty comes from the cleaning pre-pass: `#` comments,
  * single/double-quoted strings (newline-terminated, per the grammar),
  * triple-quoted multi-line strings (docstrings blank to structural
  * no-ops), and f-string splices (blanked whole — a brace inside one
  * must not reach the header-join bracket counter). Indentation scope
  * honesty needs two continuation guards the brace languages don't:
  * lines inside an open bracket nest and lines after a trailing `\`
  * never close a scope, whatever their indent (PEP 8 hanging indents
  * would otherwise end their own function).
  *
  * What a line-grade scan gives up vs a real AST (the `ast` module):
  * decorator call-sites are not edges (`@` guard), lambdas don't nest
  * scopes, calls inside f-string splices are blanked with the literal.
  * What it gains: zero native dependencies and per-partition
  * parallelism inside `flatMap` over the files DataFrame.
  */
object PythonParser extends SourceParser {

  private val ClassRe = """^\s*class\s+([A-Za-z_]\w*)\s*[(:\s]""".r
  private val DefRe = """^\s*(?:async\s+)?def\s+([A-Za-z_]\w*)\s*\(""".r
  private val ImportRe = """^\s*import\s+(.+?)\s*$""".r
  private val FromImportRe =
    """^\s*from\s+([.\w]+)\s+import\s+\(?\s*([^()]*?)\s*\)?\s*$""".r
  private val ConstRe = """^\s*([A-Z][A-Z0-9_]*)\s*(?::[^=]+)?=[^=]""".r

  /** Lexically call-shaped but syntax, not calls. Builtins (`len`,
    * `print`, …) stay IN — they are real calls whose unresolvable
    * targets drop in the resolver, exactly like Zig's `std.*`.
    */
  private val Keywords = Set(
    "if", "elif", "while", "for", "with", "return", "yield", "assert",
    "del", "raise", "except", "lambda", "and", "or", "not", "in", "is",
    "def", "class", "import", "from", "as", "pass", "break", "continue",
    "global", "nonlocal", "await", "async", "match", "case", "else",
    "try", "finally")

  // Frame.boundary = the DECLARATION line's indentation; the scope
  // closes at the first statement line at indent ≤ it (blank,
  // bracket-continuation, and backslash-continuation lines excepted)
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

    // `@decorator(` is registration syntax, not a call edge
    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set('@'))

    def indentOf(l: String): Int =
      l.takeWhile(c => c == ' ' || c == '\t').length

    var nest = 0            // open (/[/{ across lines — continuation guard
    var contBackslash = false
    var lastNonBlank = 0    // 1-based; scopes close at their last CONTENT line
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      val t = line.trim
      val isContinuation = nest > 0 || contBackslash
      var consumedTo = i
      var pending: Option[Frame] = None

      if (t.nonEmpty && !isContinuation) {
        // statement line: close every scope whose body this indent exits
        val ind = indentOf(line)
        while (stack.nonEmpty && ind <= stack.last.boundary) {
          stack.last.ub.lineEnd =
            math.max(stack.last.ub.lineStart, lastNonBlank)
          stack.remove(stack.length - 1)
        }

        line match {
          // imports parse from the CLEANED line: Python import
          // statements carry no string literals, and blanking means a
          // trailing `# comment` can never leak into the name list
          case _ if t.startsWith("from ") =>
            // the parenthesized form may span lines — join to balance
            val sb = new StringBuilder
            var bal = 0
            var j = i
            do {
              val l = cleanedLines(j)
              bal += l.count(_ == '(') - l.count(_ == ')')
              sb ++= l; sb += ' '
              j += 1
            } while (bal > 0 && j < cleanedLines.length && j < i + 120)
            consumedTo = j - 1
            FromImportRe.findFirstMatchIn(sb.toString.trim).foreach { m =>
              emitFromImport(builders, m.group(1), m.group(2), lineNo)
            }
          case ImportRe(spec) =>
            emitPlainImport(builders, spec, lineNo)
          case _ if ClassRe.findFirstMatchIn(line).isDefined =>
            val name = ClassRe.findFirstMatchIn(line).get.group(1)
            val ub = UnitBuilder("type", name, parentContainer, lineNo, lineNo)
            builders += ub
            val (_, end, rest) = joinHeader(cleanedLines, i)
            consumedTo = end
            if (rest.trim.isEmpty) pending = Some(Frame("type", ub, indentOf(line)))
            else ub.lineEnd = end + 1 // one-liner: `class X: pass`
          case _ if DefRe.findFirstMatchIn(line).isDefined =>
            val name = DefRe.findFirstMatchIn(line).get.group(1)
            val parent = parentContainer
            val kind = if (name.startsWith("test_")) "test" else "function"
            val ub = UnitBuilder(kind, name, parent, lineNo, lineNo)
            if (kind == "function" && parent.nonEmpty)
              ub.edges += ParsedEdge("method_of", parent)
            builders += ub
            val (sig, end, rest) = joinHeader(cleanedLines, i)
            // default-arg / annotation call-sites belong to the fn
            // (the walker's pre-order visit); strip the decl keyword so
            // `def f(` is not read as a call to f
            addCalls(sig.replaceFirst("""def\s+[A-Za-z_]\w*\s*\(""", " ( "), ub)
            addCalls(rest, ub) // one-liner: `def f(): return g()`
            consumedTo = end
            if (rest.trim.isEmpty) pending = Some(Frame(kind, ub, indentOf(line)))
            else ub.lineEnd = end + 1
          case _ if currentCallTarget.isEmpty &&
              ConstRe.findFirstMatchIn(line).isDefined =>
            val name = ConstRe.findFirstMatchIn(line).get.group(1)
            builders += UnitBuilder("const", name, parentContainer,
              lineNo, lineNo)
          case _ =>
            currentCallTarget.foreach(tgt => addCalls(line, tgt))
        }
      } else if (t.nonEmpty) {
        // bracket/backslash continuation: body text, never a scope edge
        currentCallTarget.foreach(tgt => addCalls(line, tgt))
      }

      var j = i
      while (j <= consumedTo) {
        val l = cleanedLines(j)
        nest += l.count(c => c == '(' || c == '[' || c == '{') -
          l.count(c => c == ')' || c == ']' || c == '}')
        if (nest < 0) nest = 0 // stray closer: never wedge the guard open
        contBackslash = l.endsWith("\\")
        if (l.trim.nonEmpty) lastNonBlank = j + 1
        j += 1
      }
      pending.foreach(stack += _)
      i = consumedTo + 1
    }
    for (f <- stack) f.ub.lineEnd = origLines.length

    // overloads/redefinitions share a base id → dedupIds appends
    // `#line` to later duplicates (deterministic, same as ScalaParser)
    ParserScaffold.finish(filePath, content, origLines, builders.toSeq,
      dedupIds = true)
  }

  private def emitPlainImport(builders: ArrayBuffer[UnitBuilder],
                              spec: String, lineNo: Int): Unit = {
    // `import a.b.c as x, d.e` — one unit per module, named by the
    // bound segment, one `imports` edge targeting the module tail
    for (part <- spec.split(',').map(_.trim) if part.nonEmpty) {
      val tokens = part.split("""\s+as\s+""")
      val path = tokens.head.trim
      val tail = path.split('.').last
      val bound = if (tokens.length > 1) tokens(1).trim else tail
      if (bound.matches("[A-Za-z_]\\w*"))
        builders += UnitBuilder("import", bound, "", lineNo, lineNo,
          ArrayBuffer(ParsedEdge("imports", tail)))
    }
  }

  private def emitFromImport(builders: ArrayBuffer[UnitBuilder],
                             module: String, names: String,
                             lineNo: Int): Unit = {
    val tail = module.split('.').filter(_.nonEmpty).lastOption.getOrElse("")
    val members = names.split(',').toSeq
      .map(_.trim.split("""\s+as\s+""").head.trim) // renames: original name
      .filter(n => n.matches("[A-Za-z_]\\w*") || n == "*")
    val unitName = if (tail.nonEmpty) tail
      else members.headOption.getOrElse("_")
    val ub = UnitBuilder("import", unitName, "", lineNo, lineNo)
    val targets = members.map(m => if (m == "*") tail else m).filter(_.nonEmpty)
    targets.foreach(t => ub.edges += ParsedEdge("imports", t))
    builders += ub
  }

  /** Join cleaned lines from `start` into one declaration header:
    * consume until the `:` that ends the header at bracket-nest 0
    * (multi-line signatures, annotations, defaults — their `:`s all
    * sit inside parens; `->` return annotations end at nest 0 too,
    * AFTER the closing paren, so the scan runs to the final colon).
    * Returns (header text, last line index, remainder after `:` — the
    * one-liner body). Lookahead bounded at 120 lines — a pathological
    * file degrades to per-line handling, never an infinite scan.
    */
  private def joinHeader(lines: Array[String], start: Int)
      : (String, Int, String) = {
    val sb = new StringBuilder
    var nest = 0
    var j = start
    while (j < lines.length && j < start + 120) {
      val l = lines(j)
      var k = 0
      while (k < l.length) {
        l(k) match {
          case '(' | '[' | '{' => nest += 1
          case ')' | ']' | '}' => nest -= 1
          case ':' if nest <= 0 =>
            sb ++= l.take(k + 1); return (sb.toString, j, l.drop(k + 1))
          case _ => ()
        }
        k += 1
      }
      sb ++= l; sb += '\n'
      j += 1
    }
    (sb.toString, start, "")
  }

  /** Blank comments and string literals, preserving line structure.
    * States Python needs: `#` line comments; single- and double-quoted
    * strings (newline-TERMINATED — an unterminated quote must not eat
    * the file, matching the grammar); triple-quoted `'''`/`"""`
    * multi-line strings (docstrings become structural no-ops); and
    * backslash escapes inside all of them. F-string splices are blanked
    * with their literal — their braces must not reach the header-join
    * bracket counter (prefix letters like `f`/`r`/`b` survive as plain
    * identifiers, which the decl regexes never match).
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 '…', 2 "…", 3 # comment, 5 """…""", 7 '''…'''
    var state = 0
    def tripleAt(p: Int, q: Char): Boolean =
      p + 2 < content.length && content(p) == q &&
        content(p + 1) == q && content(p + 2) == q
    while (i < content.length) {
      val c = content(i)
      if (c == '\n') {
        out(i) = '\n'
        if (state == 1 || state == 2 || state == 3) state = 0
      } else state match {
        case 0 =>
          if (c == '#') { out(i) = ' '; state = 3 }
          else if (tripleAt(i, '"')) {
            out(i) = ' '; out(i + 1) = ' '; out(i + 2) = ' '
            state = 5; i += 2
          } else if (tripleAt(i, '\'')) {
            out(i) = ' '; out(i + 1) = ' '; out(i + 2) = ' '
            state = 7; i += 2
          } else if (c == '"') { out(i) = ' '; state = 2 }
          else if (c == '\'') { out(i) = ' '; state = 1 }
          else out(i) = c
        case 1 | 2 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '\'' && state == 1) state = 0
          else if (c == '"' && state == 2) state = 0
        case 5 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (tripleAt(i, '"')) {
            out(i + 1) = ' '; out(i + 2) = ' '; state = 0; i += 2
          }
        case 7 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (tripleAt(i, '\'')) {
            out(i + 1) = ' '; out(i + 2) = ' '; state = 0; i += 2
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

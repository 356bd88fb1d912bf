package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade TypeScript/JavaScript source extractor — the fifth
  * real language behind the pluggable [[SourceParser]] contract, and
  * the one most user repositories actually contain. Same architecture
  * as [[GoParser]]: a comment/string-safe cleaning pre-pass, then a
  * single brace-scoped structural scan recovering the reference
  * walker's unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from TS/JS shapes:
  *
  *   - `function name(...)` (with any `export` / `default` / `async`
  *     prefix) → `function` units. Top-level
  *     `const f = (...) => ...` / `const f = async x => ...` arrow
  *     bindings → `function` units too — most real JS functions are
  *     arrows, so classifying them as consts would miss the codebase's
  *     call graph. `calls` edges from identifier call-sites and
  *     `calls_method` from `.m(...)` sites in signature + body attach
  *     to the innermost enclosing function (the walker's
  *     `current_function` rule).
  *   - `class Name` → `type` unit + container scope; inside the class
  *     body, `name(...) {` method declarations (any
  *     `static`/`async`/`get`/`set`/`*` prefix, `#private` names,
  *     `constructor`) and `name = (...) =>` field arrows carry
  *     `parentContainer = Name` + a `method_of` edge. TS `interface` /
  *     `enum` / `type Name =` declarations → `type` units (no scope:
  *     interface bodies declare no units).
  *   - `import d from 'p'` / `import * as ns from 'p'` /
  *     `import { a, b } from 'p'` / bare `import 'p'` and
  *     `const x = require('p')` → one `import` unit per module path,
  *     named by the default/namespace binding (or the path's last
  *     segment, `./`-and-extension-stripped), + an `imports` edge on
  *     that segment. Unresolvable targets (react, fs, …) drop in
  *     [[SemanticResolver]], like Zig's `std` and Go's `fmt`.
  *   - `test('...', ...)` / `it('...', ...)` at top level → `test`
  *     units named by the title literal (read from the ORIGINAL line —
  *     cleaning blanks strings — like Go's import paths); their
  *     callback bodies attach calls to the test unit.
  *   - top-level `const X` → `const` units, `let`/`var` → `var` units.
  *     Function-local bindings are skipped — the same documented scope
  *     deviation as every other extractor.
  *
  * Cleaning blanks `//`, `/* */`, `'…'`, `"…"`, template literals
  * `` `…` `` (multi-line; code inside `${}` interpolations is
  * PRESERVED so interpolated call-sites reach the scan), and regex
  * literals (prev-token disambiguated from division, char classes and
  * flags included) — see [[clean]] for the lexer detail and the one
  * residual line-grade trade-off.
  */
object TsParser extends SourceParser {

  private val FuncRe =
    """^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)\s*\(""".r
  private val ArrowBindRe =
    ("""^\s*(?:export\s+)?(const|let|var)\s+([A-Za-z_$][\w$]*)\s*(?::[^=]+)?=\s*""" +
      """(?:async\s+)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]+)?=>""").r
  private val ClassRe =
    """^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][\w$]*)""".r
  private val TypeDeclRe =
    """^\s*(?:export\s+)?(?:declare\s+)?(interface|enum|type)\s+([A-Za-z_$][\w$]*)""".r
  private val ConstVarRe =
    """^\s*(?:export\s+)?(?:declare\s+)?(const|let|var)\s+([A-Za-z_$][\w$]*)""".r
  private val ImportFromRe =
    """^\s*import\s+(?:(?:([A-Za-z_$][\w$]*)\s*,?\s*)?(?:\*\s+as\s+([A-Za-z_$][\w$]*)|\{[^}]*\})?\s*from\s+)?['"]([^'"]+)['"]""".r
  private val RequireRe =
    """^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*require\s*\(\s*['"]([^'"]+)['"]""".r
  private val TestRe =
    """^\s*(?:test|it)\s*\(""".r
  private val TestTitleRe =
    """^\s*(?:test|it)\s*\(\s*['"`]([^'"`]*)['"`]""".r
  private val MethodRe =
    ("""^\s*(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?\*?\s*""" +
      """(#?[A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\s*\(""").r
  private val FieldArrowRe =
    ("""^\s*(?:static\s+)?(#?[A-Za-z_$][\w$]*)\s*(?::[^=]+)?=\s*""" +
      """(?:async\s+)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]+)?=>""").r

  /** Call-shaped but syntax. `require` is handled as an import;
    * `super`/`constructor` are declaration machinery.
    */
  private val Keywords = Set(
    "if", "for", "while", "switch", "catch", "do", "else", "return",
    "function", "yield", "await", "typeof", "void", "delete", "in", "of",
    "instanceof", "throw", "case", "default", "super", "constructor",
    "require", "new", "class", "import", "export", "try", "finally")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]

    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" || k == "test" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined
    def classFrame: Option[Frame] =
      stack.lastOption.filter(_.kind == "type")

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set.empty)

    def emitImport(binding: String, path: String, lineNo: Int): Unit = {
      // last path segment, extension-stripped; a `node:fs`-style
      // scheme keeps only the module name
      val tail = path.split('/').last
        .replaceAll("""\.(ts|tsx|js|jsx|mjs|cjs)$""", "")
        .split(':').last
      val bound =
        if (binding != null && binding.nonEmpty) binding else tail
      if (bound.matches("[A-Za-z_$][\\w$]*")) {
        val edges =
          if (tail.matches("[A-Za-z_$][\\w$-]*"))
            ArrayBuffer(ParsedEdge("imports", tail))
          else ArrayBuffer.empty[ParsedEdge]
        builders += UnitBuilder("import", bound, "", lineNo, lineNo, edges)
      }
    }

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None

      if (!insideFunction && line.trim.startsWith("import")) {
        // binding names survive cleaning; the PATH is a blanked string
        // literal, so it reads from the original line
        ImportFromRe.findFirstMatchIn(origLines(i)).foreach { m =>
          val binding = Option(m.group(1)).orElse(Option(m.group(2))).orNull
          emitImport(binding, m.group(3), lineNo)
        }
      } else if (!insideFunction &&
          RequireRe.findFirstMatchIn(origLines(i)).isDefined &&
          line.contains("require")) {
        val m = RequireRe.findFirstMatchIn(origLines(i)).get
        emitImport(m.group(1), m.group(2), lineNo)
      } else if (!insideFunction && TestRe.findFirstMatchIn(line).isDefined) {
        val title = TestTitleRe.findFirstMatchIn(origLines(i))
          .map(_.group(1)).getOrElse("")
        val ub = UnitBuilder("test", if (title.nonEmpty) title else "test",
          "", lineNo, lineNo)
        builders += ub
        // calls on the registration line itself (one-line tests, and
        // the opening line of a block callback), then the callback
        // body opens this line's brace scope (if any)
        addCalls(line.replaceFirst("""(?:test|it)\s*\(""", " ( "), ub)
        if (netBraces(line) > 0) pending = Some(Frame("test", ub, depth))
      } else if (FuncRe.findFirstMatchIn(line).isDefined) {
        val name = FuncRe.findFirstMatchIn(line).get.group(1)
        val parent = ""
        val ub = UnitBuilder("function", name, parent, lineNo, lineNo)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(sig.replaceFirst(
          """function\s*\*?\s*[A-Za-z_$][\w$]*\s*\(""", " ( "), ub)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame("function", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (!insideFunction && classFrame.isEmpty &&
          ArrowBindRe.findFirstMatchIn(line).isDefined) {
        val name = ArrowBindRe.findFirstMatchIn(line).get.group(2)
        val ub = UnitBuilder("function", name, "", lineNo, lineNo)
        builders += ub
        val body = line.substring(line.indexOf("=>") + 2)
        if (netBraces(line) > 0) pending = Some(Frame("function", ub, depth))
        else addCalls(body, ub) // expression-bodied arrow
      } else if (!insideFunction && ClassRe.findFirstMatchIn(line).isDefined) {
        val name = ClassRe.findFirstMatchIn(line).get.group(1)
        val ub = UnitBuilder("type", name, "", lineNo, lineNo)
        builders += ub
        if (netBraces(line) > 0) pending = Some(Frame("type", ub, depth))
      } else if (!insideFunction && TypeDeclRe.findFirstMatchIn(line).isDefined) {
        val name = TypeDeclRe.findFirstMatchIn(line).get.group(2)
        builders += UnitBuilder("type", name, "", lineNo, lineNo)
        // interface/enum bodies declare no units; depth accounting
        // consumes them without a frame
      } else if (!insideFunction && classFrame.isDefined &&
          FieldArrowRe.findFirstMatchIn(line).isDefined) {
        val cls = classFrame.get.ub.name
        val name = FieldArrowRe.findFirstMatchIn(line).get.group(1)
        val ub = UnitBuilder("function", name, cls, lineNo, lineNo,
          ArrayBuffer(ParsedEdge("method_of", cls)))
        builders += ub
        val body = line.substring(line.indexOf("=>") + 2)
        if (netBraces(line) > 0) pending = Some(Frame("function", ub, depth))
        else addCalls(body, ub)
      } else if (!insideFunction && classFrame.isDefined &&
          MethodRe.findFirstMatchIn(line).isDefined &&
          !line.trim.startsWith("}")) {
        val cls = classFrame.get.ub.name
        val name = MethodRe.findFirstMatchIn(line).get.group(1)
        if (!Keywords(name) || name == "constructor") {
          val unitName = name.stripPrefix("#")
          val ub = UnitBuilder("function", unitName, cls, lineNo, lineNo,
            ArrayBuffer(ParsedEdge("method_of", cls)))
          builders += ub
          val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
          addCalls(sig.replaceFirst("""#?[A-Za-z_$][\w$]*\s*(?:<[^>]*>)?\s*\(""",
            " ( "), ub)
          addCalls(rest, ub)
          if (opened) pending = Some(Frame("function", ub, depth))
          else ub.lineEnd = end + 1
          consumedTo = end
        }
      } else if (!insideFunction && ConstVarRe.findFirstMatchIn(line).isDefined
          && classFrame.isEmpty && stack.isEmpty) {
        val m = ConstVarRe.findFirstMatchIn(line).get
        val kind = if (m.group(1) == "const") "const" else "var"
        builders += UnitBuilder(kind, m.group(2), "", lineNo, lineNo)
      } else {
        currentCallTarget.foreach(t => addCalls(line, t))
      }

      var j = i
      while (j <= consumedTo) {
        depth += netBraces(cleanedLines(j))
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

  private def netBraces(l: String): Int =
    l.count(_ == '{') - l.count(_ == '}')

  /** Join cleaned lines from `start` until the declaration's body `{`
    * at paren-depth 0 (multi-line signatures), with the [[GoParser]]
    * bodyless rule: a line closing all parens without a `{` ends the
    * declaration (TS `declare` stubs, interface method signatures,
    * expression-bodied members). Lookahead bounded at 60 lines.
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
      if (paren <= 0) return (sb.toString, j, false, "")
      j += 1
    }
    (sb.toString, start, false, "")
  }

  /** After these words a `/` starts a regex literal, not division —
    * the standard prev-token disambiguation every JS lexer uses
    * (e.g. `return /x/.test(s)`, `case /y/ :`).
    */
  private val RegexPrecedingKeywords = Set(
    "return", "typeof", "case", "in", "of", "instanceof", "new",
    "delete", "void", "do", "else", "yield", "await", "throw")

  /** Blank comments and string literals, preserving line structure:
    * `//` to EOL, `/* */` across lines, `'…'` and `"…"` with escapes
    * (newline-terminated), and multi-line template literals. Code
    * inside template `${}` interpolations is PRESERVED verbatim (with
    * the `${`/`}` delimiters blanked), so call-sites in interpolated
    * strings reach the scan; nesting (templates in interpolations in
    * templates) is tracked with a brace-counter stack. Regex literals
    * are lexed with the standard prev-token heuristic — a `/` after a
    * value (identifier, `)`, `]`, literal) is division, after an
    * operator/opening-bracket/regex-preceding keyword it opens a
    * regex — and blanked including char classes (where `/` does not
    * terminate) and flags, so a regex containing quotes or `//` no
    * longer over-blanks its line. Known residual trade-off (line-grade
    * scanner, documented): an arrow function literal inside an
    * interpolation on a `const x = …` line can make the binding
    * classify as a function.
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…", 2 '…', 3 // comment, 4 /* */, 5 `…`,
    // 6 /regex/, 7 [charclass] inside a regex
    var state = 0
    // one brace counter per open `${` interpolation (innermost last)
    val interp = ArrayBuffer.empty[Int]
    // last significant code char emitted in state 0 (' ' = none);
    // a string/template/regex literal counts as a value (']')
    var prevSig = ' '
    val word = new StringBuilder // LAST COMPLETE identifier ending at prevSig
    // whitespace seen since `word` was completed: the next word char
    // starts a NEW identifier, so the buffer resets then — not at the
    // whitespace itself (the completed word must survive the gap for
    // `x in /re/`-style keyword checks), and never mid-word. Without
    // the gap flag consecutive identifiers concatenated ("x in" →
    // "xin"), missing regexes after in/of/instanceof and misfiring
    // after keyword-named property accesses (`a.in / 2`).
    var wordGap = false
    // the word began right after `.` → a PROPERTY named like a keyword
    // (`a.in`), never the keyword itself
    var wordAfterDot = false
    def isWordChar(c: Char) = c == '_' || c == '$' || c.isLetterOrDigit
    def regexCanStart: Boolean =
      if (prevSig == ' ') true
      else if (isWordChar(prevSig))
        !wordAfterDot && RegexPrecedingKeywords(word.toString)
      else "([{,;=:!&|?+-*%<>^~".indexOf(prevSig) >= 0
    while (i < content.length) {
      val c = content(i)
      if (c == '\n') {
        out(i) = '\n'
        if (word.nonEmpty) wordGap = true // newline is a word gap too
        if (state == 1 || state == 2 || state == 3 ||
          state == 6 || state == 7) state = 0
      } else state match {
        case 0 =>
          if (c == '/' && i + 1 < content.length && content(i + 1) == '/') {
            out(i) = ' '; state = 3
          } else if (c == '/' && i + 1 < content.length && content(i + 1) == '*') {
            out(i) = ' '; out(i + 1) = ' '; state = 4; i += 1
          } else if (c == '/' && regexCanStart) { out(i) = ' '; state = 6 }
          else if (c == '"') { out(i) = ' '; state = 1 }
          else if (c == '\'') { out(i) = ' '; state = 2 }
          else if (c == '`') { out(i) = ' '; state = 5 }
          else if (c == '}' && interp.nonEmpty && interp.last == 0) {
            out(i) = ' '; interp.remove(interp.length - 1); state = 5
          } else {
            out(i) = c
            if (!c.isWhitespace) {
              if (c == '{' && interp.nonEmpty)
                interp(interp.length - 1) += 1
              else if (c == '}' && interp.nonEmpty)
                interp(interp.length - 1) -= 1
              if (isWordChar(c)) {
                if (wordGap) word.clear()
                if (word.isEmpty) wordAfterDot = prevSig == '.'
                word.append(c)
              } else word.clear()
              prevSig = c
              wordGap = false
            } else if (word.nonEmpty) wordGap = true
          }
        case 1 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '"') { state = 0; prevSig = ']'; word.clear() }
        case 2 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '\'') { state = 0; prevSig = ']'; word.clear() }
        case 4 =>
          out(i) = ' '
          if (c == '*' && i + 1 < content.length && content(i + 1) == '/') {
            out(i + 1) = ' '; state = 0; i += 1
          }
        case 5 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '`') { state = 0; prevSig = ']'; word.clear() }
          else if (c == '$' && i + 1 < content.length && content(i + 1) == '{') {
            out(i + 1) = ' '; i += 1; interp += 0; state = 0
          }
        case 6 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '[') state = 7
          else if (c == '/') {
            // consume flags, then the literal reads as a value
            while (i + 1 < content.length && content(i + 1).isLetter) {
              out(i + 1) = ' '; i += 1
            }
            state = 0; prevSig = ']'; word.clear()
          }
        case 7 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == ']') state = 6
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

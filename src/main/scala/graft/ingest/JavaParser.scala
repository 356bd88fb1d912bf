package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade JAVA source extractor — the sixth real language
  * behind the pluggable [[SourceParser]] contract (after Zig, Scala,
  * Python, Go, TS/JS): the JVM-ecosystem language most
  * data-infrastructure codebases (including Spark itself) expose at
  * their boundaries. Same architecture as the others: a
  * comment/string-safe cleaning pre-pass, then one brace-scoped
  * structural scan recovering the reference walker's unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from Java shapes:
  *
  *   - `class / interface / enum / record / @interface Name` →
  *     `type` units; nested types carry the ENCLOSING type as
  *     `parentContainer` (Java nests lexically, unlike Go's
  *     receiver-attached methods).
  *   - methods and constructors inside a type body → `function` units
  *     with `parentContainer` = the innermost type + a `method_of`
  *     edge. A method has no introducing keyword in Java, so the
  *     declaration test is structural: optional modifier run +
  *     (return type + name | bare ClassName for a constructor) + `(`
  *     at type-body depth, excluding control-flow keywords. A method
  *     directly preceded by a `@Test` annotation line → `test` unit
  *     (the JUnit registration convention — the role Zig's
  *     `test "..."` block and Go's `TestXxx` play). `calls` edges from
  *     identifier call-sites and `calls_method` from `.m(...)` sites
  *     in signature + body, attached to the innermost enclosing
  *     function (the walker's `current_function` rule); annotation
  *     applications (`@Foo(...)`) are excluded by the preceding-char
  *     rule.
  *   - `import a.b.C;` / `import static a.b.C.m;` → one `import` unit
  *     named by the last segment (the member for a static import),
  *     + an `imports` edge targeting the simple class name.
  *     Wildcard imports (`a.b.*`) emit no unit — there is no name to
  *     bind, the same documented loss as Zig's `usingnamespace`.
  *   - fields at type-body depth → `const` when `final`, `var`
  *     otherwise. Method-local bindings are skipped — the same scope
  *     deviation as every other extractor here.
  *
  * Cleaning blanks `//`, `/* */`, `"…"` (with escapes), `'…'` char
  * literals, and Java 15 text blocks `"""…"""` (blanked whole),
  * preserving line structure — except import lines, which carry no
  * string literals in Java, so no original-line re-read is needed.
  *
  * What the line grade gives up vs a javac AST: anonymous classes
  * don't open scopes (their calls attach to the enclosing method —
  * same observable contract), lambdas likewise, and generic bounds in
  * signatures can hide a `(` edge case. What it gains: zero native
  * dependencies and per-partition parallelism inside `flatMap`.
  */
object JavaParser extends SourceParser {

  private val Modifiers =
    "(?:(?:public|private|protected|static|final|abstract|synchronized|" +
      "native|default|strictfp|sealed|non-sealed|transient|volatile)\\s+)*"

  private val TypeRe =
    (s"^\\s*$Modifiers(class|interface|enum|record|@interface)\\s+" +
      """([A-Za-z_$][\w$]*)""").r
  private val ImportRe =
    """^\s*import\s+(static\s+)?([\w.$]+(?:\.\*)?)\s*;""".r
  // modifier run + optional type params + return type (id with
  // optional generics/array/dots) + name + `(`
  private val MethodRe =
    (s"^\\s*$Modifiers(?:<[^>]*>\\s*)?" +
      """(?:[\w.$]+(?:<[^>]*>)?(?:\[\s*\])*\s+)([A-Za-z_$][\w$]*)\s*\(""").r
  // constructor: modifiers + BareName( with no return type before it
  private val CtorRe =
    (s"^\\s*$Modifiers" + """([A-Za-z_$][\w$]*)\s*\(""").r
  private val FieldRe =
    (s"^\\s*$Modifiers" +
      """[\w.$]+(?:<[^>]*>)?(?:\[\s*\])*\s+([A-Za-z_$][\w$]*)\s*(?:=|;)""").r

  /** Call-shaped but syntax/control flow. */
  private val Keywords = Set(
    "if", "for", "while", "switch", "catch", "do", "else", "return",
    "new", "super", "this", "throw", "throws", "assert", "synchronized",
    "try", "finally", "instanceof", "case", "default", "break", "continue",
    "yield", "record", "sealed", "permits")

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
    def typeFrame: Option[Frame] =
      stack.lastOption.filter(_.kind == "type")
    def enclosingTypeName: String =
      stack.reverseIterator.collectFirst {
        case Frame("type", ub, _) => ub.name
      }.getOrElse("")

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set('@'))

    var pendingTest = false // a @Test annotation line arms the next method
    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None
      val trimmed = line.trim

      if (trimmed.startsWith("@Test")) {
        pendingTest = true
      } else if (!insideFunction && ImportRe.findFirstMatchIn(line).isDefined) {
        val m = ImportRe.findFirstMatchIn(line).get
        val path = m.group(2)
        if (!path.endsWith(".*")) {
          val segs = path.split('.')
          val bound = segs.last
          // the simple CLASS name: for `import static A.B.m` the class
          // is the second-to-last segment; plain imports end at it
          val cls = if (m.group(1) != null && segs.length >= 2)
            segs(segs.length - 2) else bound
          builders += UnitBuilder("import", bound, "", lineNo, lineNo,
            ArrayBuffer(ParsedEdge("imports", cls)))
        }
      } else if (!insideFunction && TypeRe.findFirstMatchIn(line).isDefined) {
        val name = TypeRe.findFirstMatchIn(line).get.group(2)
        val ub = UnitBuilder("type", name, enclosingTypeName, lineNo, lineNo)
        builders += ub
        // record headers carry a param list; join until the body `{`
        val (_, end, opened, _) = joinDecl(cleanedLines, i)
        if (opened) pending = Some(Frame("type", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (!insideFunction && typeFrame.isDefined &&
          (MethodRe.findFirstMatchIn(line).isDefined ||
            CtorRe.findFirstMatchIn(line).exists(m =>
              m.group(1) == typeFrame.get.ub.name)) &&
          !trimmed.startsWith("}")) {
        val cls = typeFrame.get.ub.name
        val name = MethodRe.findFirstMatchIn(line).map(_.group(1))
          .getOrElse(CtorRe.findFirstMatchIn(line).get.group(1))
        if (!Keywords(name)) {
          val kind = if (pendingTest) "test" else "function"
          val ub = UnitBuilder(kind, name, cls, lineNo, lineNo,
            ArrayBuffer(ParsedEdge("method_of", cls)))
          builders += ub
          val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
          // scan only past the declaration's first `(`: unlike the
          // keyword-introduced languages, Java's RETURN TYPE sits
          // directly before the name, so a name-only strip would glue
          // `void`/`String` to the paren and read it as a call-site
          addCalls(sig.substring(sig.indexOf('(') + 1), ub)
          addCalls(rest, ub)
          if (opened) pending = Some(Frame(kind, ub, depth))
          else ub.lineEnd = end + 1
          consumedTo = end
        }
        pendingTest = false
      } else if (!insideFunction && typeFrame.isDefined &&
          FieldRe.findFirstMatchIn(line).isDefined) {
        val name = FieldRe.findFirstMatchIn(line).get.group(1)
        val kind = if (trimmed.matches(s".*\\bfinal\\b.*")) "const" else "var"
        val ub = UnitBuilder(kind, name, typeFrame.get.ub.name,
          lineNo, lineNo)
        builders += ub
        addCalls(line.substring(line.indexOf(name) + name.length), ub)
        pendingTest = false
      } else {
        currentCallTarget.foreach(t => addCalls(line, t))
        if (trimmed.nonEmpty && !trimmed.startsWith("@")) pendingTest = false
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
    * at paren-depth 0 (multi-line signatures), with the bodyless rule:
    * a line closing all parens without `{` ends the declaration
    * (interface/abstract method signatures ending in `;`). Lookahead
    * bounded at 60 lines.
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

  /** Blank comments and string literals, preserving line structure:
    * `//` to EOL, `/* */` across lines, `"…"` with escapes, `'…'` char
    * literals, and Java 15 text blocks `\"\"\"…\"\"\"` blanked whole.
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…", 2 '…', 3 //, 4 /* */, 6 text block
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
          } else if (c == '"' && i + 2 < content.length &&
              content(i + 1) == '"' && content(i + 2) == '"') {
            out(i) = ' '; out(i + 1) = ' '; out(i + 2) = ' '
            state = 6; i += 2
          } else if (c == '"') { out(i) = ' '; state = 1 }
          else if (c == '\'') { out(i) = ' '; state = 2 }
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
        case 6 =>
          out(i) = ' '
          if (c == '"' && i + 2 < content.length &&
              content(i + 1) == '"' && content(i + 2) == '"') {
            out(i + 1) = ' '; out(i + 2) = ' '; state = 0; i += 2
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

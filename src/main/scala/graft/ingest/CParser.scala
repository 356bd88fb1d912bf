package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade C source extractor — the eighth real language
  * behind the pluggable [[SourceParser]] contract, completing the
  * systems-language family (Zig, Go, Rust, C) that data-infrastructure
  * and runtime codebases are written in. Same architecture as the
  * others: a comment/string-safe cleaning pre-pass, then one
  * brace-scoped structural scan recovering the reference walker's
  * unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from C shapes:
  *
  *   - function DEFINITIONS at file scope → `function` units. Like
  *     Java, C has no introducing keyword, so the test is structural:
  *     a type/qualifier run + name + `(` whose joined declaration
  *     opens a `{` body. Prototypes (the parens close into `;`) are
  *     declarations, not definitions — skipped, so a
  *     forward-declared function yields exactly one unit. `calls`
  *     edges from identifier call-sites and `calls_method` from
  *     `.m(...)` member dispatch (a `->m(...)` function-pointer field
  *     scans as a plain call — named targets still resolve), attached
  *     to the innermost enclosing function (the walker's
  *     `current_function` rule).
  *   - `#define NAME …` → `const` unit; a FUNCTION-LIKE macro
  *     `#define F(x) …` → `function` unit whose replacement text is
  *     call-scanned — macro call-sites ARE `F(…)`-shaped, so defining
  *     them as functions lets [[SemanticResolver]] connect macro
  *     callers exactly like function callers. `\`-continued macros
  *     are joined to one logical line first (C17 §5.1.1.2 phase 2),
  *     so a multi-line replacement list contributes ALL its calls
  *     and its body lines are never mis-scanned as file-scope code.
  *   - `struct/enum/union Name { … }` definitions → `type` units;
  *     `typedef … name;` one-liners (incl. function-pointer
  *     `(*name)` forms) and `typedef struct { … } name;` tail names →
  *     `type` units. Forward declarations (`struct foo;`) emit
  *     nothing, same rule as prototypes.
  *   - `#include <a/b.h>` / `#include "b.h"` → one `import` unit named
  *     by the header basename (extension-stripped), + an `imports`
  *     edge on that name. Unresolvable targets (stdio, …) drop in the
  *     resolver, like Zig's `std` and Go's `fmt`.
  *   - file-scope object declarations → `const` when const-qualified,
  *     `var` otherwise. Block-local bindings, struct fields, and enum
  *     constants are skipped — the same documented scope choice as the
  *     other beyond-reference extractors. C has no test-registration
  *     convention, so no `test` units (a `*_test.c` harness's
  *     functions are ordinary functions).
  *
  * Cleaning blanks `//` and `/* */` comments (non-nesting, per the
  * standard), `"…"` strings with escapes, and `'…'` char literals,
  * preserving line structure — except `#include` lines, whose quoted
  * header IS the declaration and is re-read from the original line
  * (the [[GoParser]] import-path rule).
  *
  * K&R-style definitions (`int foo(a, b) int a; int b; { … }`) are
  * recognized when the text between the closing paren and the body
  * brace is pure declaration material (r10).
  *
  * What the line grade gives up vs a real C front end: preprocessor
  * conditionals with MACRO conditions are not evaluated — LITERAL
  * arms are decided (r10): `#if 0 … #endif` dead-code blocks are
  * skipped whole (no declarations, no call-sites, no brace counting —
  * dead code is routinely unbalanced), `#if 1`'s `#else` arm
  * likewise, with `#elif`/`#else` chains tracked per nesting level;
  * macro conditions take the FIRST arm and suppress the
  * `#elif`/`#else` alternatives (first-arm-wins, r11). MACRO-suppressed
  * arms still contribute their definition NAMES as
  * `arm = "suppressed"` units (r12; literally-dead `#if 0` code stays
  * dead): the `#else` POSIX half of a
  * platform split stays findable in the index, with no call edges, no
  * brace effect on file scope, and an active same-named definition
  * winning — so neither the r10 double-count nor the scope corruption
  * can return. What it gains: zero native dependencies and
  * per-partition parallelism inside `flatMap`.
  */
object CParser extends SourceParser {

  private val IncludeRe =
    """^\s*#\s*include\s+[<"]([^>"]+)[>"]""".r
  private val DefineRe =
    """^\s*#\s*define\s+([A-Za-z_]\w*)(\()?""".r
  // type/qualifier run (idents and `*`s) then the declarator name + `(`
  private val FuncRe =
    """^\s*(?:[A-Za-z_]\w*\s+|\*\s*)+\*?\s*([A-Za-z_]\w*)\s*\(""".r
  private val StructRe =
    """^\s*(?:typedef\s+)?(struct|enum|union)\s+([A-Za-z_]\w*)""".r
  private val TypedefFnPtrRe =
    """^\s*typedef\s+.*\(\s*\*\s*([A-Za-z_]\w*)\s*\)""".r
  private val TypedefOneRe =
    """^\s*typedef\s+[^{;]*?([A-Za-z_]\w*)\s*;""".r
  private val TypedefTailRe =
    """^\s*\}\s*([A-Za-z_]\w*)\s*;""".r
  private val GlobalRe =
    """^\s*(?:[A-Za-z_]\w*\s+)+\*?\s*([A-Za-z_]\w*)\s*(?:=|;|\[)""".r

  /** Call-shaped but syntax: control flow, type keywords, operators. */
  private[ingest] val Keywords = Set(
    "if", "for", "while", "switch", "return", "sizeof", "case", "do",
    "else", "goto", "break", "continue", "typedef", "struct", "enum",
    "union", "static", "const", "extern", "inline", "void", "int",
    "char", "long", "short", "float", "double", "unsigned", "signed",
    "volatile", "register", "defined", "restrict")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]
    // an open `typedef … {` waiting for its `} name;` tail
    var typedefOpen = false
    var typedefBoundary = 0

    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set.empty)

    // Preprocessor-conditional tracking (r10, FIRST-ARM-WINS r11):
    // LITERAL arms are decidable — `#if 0 … #endif` is the classic
    // dead-code comment and its contents (declarations, call-sites,
    // and worst, unbalanced braces) must not reach the scan. Macro
    // conditions a lexical scan cannot evaluate TAKE THE FIRST
    // non-`#if 0` arm and suppress the `#elif`/`#else` rest: both-arm
    // inclusion double-counted declarations and call edges in
    // config-heavy code and let per-arm unbalanced braces (`#ifdef
    // _WIN32 void f() { #else void f() { #endif`) corrupt scope
    // depth. Per level: (suppress THIS arm, an arm was taken).
    // shared conditional machine (ParserScaffold.CondTracker, r12) +
    // the recovered-definition buffer
    val cond = new ParserScaffold.CondTracker
    def suppressed: Boolean = cond.suppressed
    def condDirective(d: String, arg: String): Boolean = cond.directive(d, arg)
    val suppressedUnits = ArrayBuffer.empty[UnitBuilder]
    val DirectiveRe = """^\s*#\s*(\w+)\s*(\S*)""".r

    /** SUPPRESSED-ARM UNIT RECOVERY (r12). First-arm-wins (r11) fixed
      * the double-count and the per-arm brace corruption, but made a
      * definition living only in a non-taken arm — the `#ifdef _WIN32
      * … #else <POSIX defs> #endif` shape, the most common real split
      * — invisible in the index. Recover definition NAMES from
      * MACRO-conditional suppressed arms (cond.recoverable —
      * literally-dead `#if 0` code stays dead, it is the disabled-code
      * idiom) as `arm = "suppressed"` units: no call edges, no brace
      * counting against file scope, no scope frames, a function's
      * extent = its joined signature. An identical active definition
      * wins (appendSuppressed drops recovered (type, name, parent)
      * duplicates); block-local noise is gated out by the arm-relative
      * depth (only cond.armDepth == 0, each arm's own top level, is
      * scanned); suppressed `#include`s are config noise and skipped.
      * Returns the consumed-to line. A local def, NOT inline in the
      * scan loop: keeping the hot loop's method small preserves its
      * JIT budget (measured on the CppParser twin).
      */
    def scanSuppressedArm(line: String, i: Int, lineNo: Int): Int = {
      var consumedTo = i
      if (line.trim.startsWith("#")) {
        // join continuations like the active # path, so a suppressed
        // macro's replacement-list lines are never signature-scanned
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
        val joined =
          if (pEnd == i) line
          else (i to pEnd).map(cleanedLines(_)
            .replaceAll("""\\\s*$""", " ")).mkString(" ")
        if (cond.recoverable)
          DefineRe.findFirstMatchIn(joined).foreach { m =>
            suppressedUnits += UnitBuilder(
              if (m.group(2) != null) "function" else "const",
              m.group(1), "", lineNo, pEnd + 1, arm = "suppressed")
          }
      } else {
        if (cond.recoverable && cond.armDepth == 0) {
          val t = line.trim
          if (t.startsWith("typedef")) {
            TypedefFnPtrRe.findFirstMatchIn(line)
              .orElse(TypedefOneRe.findFirstMatchIn(line))
              .filter(m => !Keywords(m.group(1)))
              .foreach(m => suppressedUnits += UnitBuilder("type",
                m.group(1), "", lineNo, lineNo, arm = "suppressed"))
          } else if (StructRe.findFirstMatchIn(line).isDefined &&
              line.contains("{")) {
            suppressedUnits += UnitBuilder("type",
              StructRe.findFirstMatchIn(line).get.group(2), "",
              lineNo, lineNo, arm = "suppressed")
          } else if (FuncRe.findFirstMatchIn(line).isDefined) {
            val name = FuncRe.findFirstMatchIn(line).get.group(1)
            val (_, end, opened, _) = joinDecl(cleanedLines, i)
            // a join that crosses another directive line would read
            // past the arm boundary — reject it (conservative)
            val crossesDirective =
              (i to end).exists(cleanedLines(_).trim.startsWith("#"))
            if (opened && !crossesDirective && !Keywords(name)) {
              suppressedUnits += UnitBuilder("function", name, "",
                lineNo, end + 1, arm = "suppressed")
              consumedTo = end
            }
          } else if (GlobalRe.findFirstMatchIn(line).isDefined &&
              !line.contains("(") && t.endsWith(";")) {
            val name = GlobalRe.findFirstMatchIn(line).get.group(1)
            if (!Keywords(name)) {
              val kind =
                if (line.matches(""".*\bconst\b.*""")) "const" else "var"
              suppressedUnits += UnitBuilder(kind, name, "",
                lineNo, lineNo, arm = "suppressed")
            }
          }
        }
        // arm-relative depth machine: clamped at 0 (an arm may open
        // with a closing brace relative to the taken arm's scope)
        cond.armDepth = math.max(0, cond.armDepth +
          (i to consumedTo).map(j => netBraces(cleanedLines(j))).sum)
      }
      consumedTo
    }

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      // attribute spans defeat the structural matchers — blank them
      // for MATCHING only (brace/paren counting uses the raw cleaned
      // line; attribute parens are balanced, so counts agree)
      val line = ParserScaffold.stripCAttrs(cleanedLines(i))
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None
      var isPreproc = false
      val atTop = depth == 0 && !insideFunction

      if (line.trim.startsWith("#") && {
        val m = DirectiveRe.findFirstMatchIn(line)
        m.exists(mm => condDirective(mm.group(1), mm.group(2)))
      }) {
        // a conditional directive: stack updated above, the line itself
        // declares nothing and counts no braces (continuations joined
        // into the directive, same as every other # line)
        isPreproc = true
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
      } else if (suppressed) {
        // SUPPRESSED-ARM UNIT RECOVERY (r12) — see scanSuppressedArm
        isPreproc = true
        consumedTo = scanSuppressedArm(line, i, lineNo)
      } else if (line.trim.startsWith("#")) {
        // preprocessor lines: includes and defines declare, the rest
        // (#if/#endif/#pragma/…) are transparent to the scan. A
        // `\`-continued directive is ONE logical line (C17 §5.1.1.2
        // phase 2): join the continuations so a multi-line
        // function-like macro's WHOLE replacement list is call-scanned
        // (was: first line only — dropped real call-graph edges in
        // config-macro-heavy codebases like glibc), and consume them
        // so macro-body lines are never re-scanned as file-scope code.
        // Macro-body braces never shift file-scope depth (the brace
        // count below skips preprocessor lines — `#define BEGIN {`
        // would otherwise corrupt the scope stack).
        isPreproc = true
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
        val joined =
          if (pEnd == i) line
          else (i to pEnd).map(cleanedLines(_)
            .replaceAll("""\\\s*$""", " ")).mkString(" ")
        IncludeRe.findFirstMatchIn(origLines(i)) match {
          case Some(m) =>
            val base = m.group(1).split('/').last
            val name = base.replaceAll("""\.\w+$""", "")
            if (name.matches("[A-Za-z_]\\w*"))
              builders += UnitBuilder("import", name, "", lineNo, lineNo,
                ArrayBuffer(ParsedEdge("imports", name)))
          case None =>
            DefineRe.findFirstMatchIn(joined).foreach { m =>
              val name = m.group(1)
              if (m.group(2) != null) {
                // function-like macro: unit + call scan of the
                // replacement text past the parameter list
                val ub = UnitBuilder("function", name, "",
                  lineNo, pEnd + 1)
                builders += ub
                val afterParams = joined.drop(joined.indexOf('(') + 1)
                  .dropWhile(_ != ')').drop(1)
                addCalls(afterParams, ub)
              } else
                builders += UnitBuilder("const", name, "",
                  lineNo, pEnd + 1)
            }
        }
      } else if (typedefOpen &&
          TypedefTailRe.findFirstMatchIn(line).isDefined &&
          depth + netBraces(line) <= typedefBoundary) {
        builders += UnitBuilder("type",
          TypedefTailRe.findFirstMatchIn(line).get.group(1),
          "", lineNo, lineNo)
        typedefOpen = false
      } else if (atTop && line.trim.startsWith("typedef") &&
          TypedefFnPtrRe.findFirstMatchIn(line).isDefined) {
        builders += UnitBuilder("type",
          TypedefFnPtrRe.findFirstMatchIn(line).get.group(1),
          "", lineNo, lineNo)
      } else if (atTop && FuncRe.findFirstMatchIn(line).isDefined &&
          !line.trim.startsWith("typedef")) {
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        if (opened) {
          val name = FuncRe.findFirstMatchIn(line).get.group(1)
          val ub = UnitBuilder("function", name, "", lineNo, lineNo)
          builders += ub
          addCalls(sig.replaceFirst(
            """^\s*(?:[A-Za-z_]\w*\s+|\*\s*)+\*?\s*[A-Za-z_]\w*\s*\(""",
            " ( "), ub)
          addCalls(rest, ub)
          pending = Some(Frame("function", ub, depth))
          consumedTo = end
        } else knrBody(cleanedLines, i) match {
          // K&R-style definition (r10): parameter DECLARATIONS between
          // `)` and `{` — `int foo(a, b) int a; int b; { … }`. joinDecl
          // stopped at the first param-decl `;` and called it a
          // prototype; if everything between the closing paren and a
          // `{` is declaration material, it is a definition after all.
          case Some((bodyLine, rest2)) =>
            val name = FuncRe.findFirstMatchIn(line).get.group(1)
            val ub = UnitBuilder("function", name, "", lineNo, lineNo)
            builders += ub
            addCalls(rest2, ub)
            pending = Some(Frame("function", ub, depth))
            consumedTo = bodyLine
          case None => () // prototype — a declaration, not a definition
        }
      } else if (atTop && StructRe.findFirstMatchIn(line).isDefined) {
        val m = StructRe.findFirstMatchIn(line).get
        // a definition opens a body; `struct foo;` forward decls and
        // `struct foo x;` object declarations fall through below
        if (line.contains("{")) {
          builders += UnitBuilder("type", m.group(2), "", lineNo, lineNo)
          if (line.trim.startsWith("typedef")) {
            typedefOpen = true; typedefBoundary = depth
          }
        } else if (line.trim.startsWith("typedef") ||
            (atTop && GlobalRe.findFirstMatchIn(
              line.replaceFirst("""^\s*(struct|enum|union)\s+""", ""))
              .isDefined && line.trim.endsWith(";"))) {
          // `typedef struct foo bar;` or `struct foo g_cfg;`
          TypedefOneRe.findFirstMatchIn(line).orElse(
            GlobalRe.findFirstMatchIn(line)).foreach { g =>
            val kind =
              if (line.trim.startsWith("typedef")) "type"
              else if (line.matches(""".*\bconst\b.*""")) "const"
              else "var"
            builders += UnitBuilder(kind, g.group(1), "", lineNo, lineNo)
          }
        }
      } else if (atTop && line.trim.startsWith("typedef")) {
        if (line.contains("{")) { typedefOpen = true; typedefBoundary = depth }
        else TypedefOneRe.findFirstMatchIn(line).foreach { m =>
          builders += UnitBuilder("type", m.group(1), "", lineNo, lineNo)
        }
      } else if (atTop && GlobalRe.findFirstMatchIn(line).isDefined &&
          !line.contains("(")) {
        val kind =
          if (line.matches(""".*\bconst\b.*""")) "const" else "var"
        builders += UnitBuilder(kind,
          GlobalRe.findFirstMatchIn(line).get.group(1), "", lineNo, lineNo)
      } else {
        currentCallTarget.foreach(t => addCalls(line, t))
      }

      var j = i
      while (j <= consumedTo) {
        depth += (if (isPreproc) 0 else netBraces(cleanedLines(j)))
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

    ParserScaffold.appendSuppressed(builders, suppressedUnits.toSeq)
    ParserScaffold.finish(filePath, content, origLines, builders.toSeq,
      dedupIds = true)
  }

  private def netBraces(l: String): Int =
    l.count(_ == '{') - l.count(_ == '}')

  /** K&R definition detector: from `start`, consume the parameter
    * list, then accept ONLY declaration material (identifiers, `,`,
    * `*`, brackets, `;`, whitespace) until a `{` — the old-style
    * `int foo(a, b) int a; int b; {` shape. Returns the body-brace
    * line and the text after the brace, or None (a real prototype, or
    * anything else). Lookahead bounded at 20 lines.
    */
  private def knrBody(lines: Array[String], start: Int)
      : Option[(Int, String)] = {
    var j = start
    var paren = 0
    var closed = false
    var sawDecl = false
    // the K&R body brace stands ALONE after the final param decl's
    // `;` — material between the last `;` and `{` (e.g. a following
    // `struct store {` definition) means this was a prototype plus
    // unrelated declarations, not a K&R body
    var sinceSemi = false
    while (j < lines.length && j < start + 20) {
      val l = lines(j)
      var k = 0
      while (k < l.length) {
        val c = l(k)
        if (!closed) c match {
          case '(' | '[' => paren += 1
          case ')' | ']' =>
            paren -= 1
            if (paren == 0 && c == ')') closed = true
          case ';' | '{' | '}' => return None
          case _ => ()
        } else c match {
          case '{' =>
            return if (sawDecl && !sinceSemi) Some((j, l.drop(k + 1)))
              else None
          case ';' => sinceSemi = false
          case ',' | '*' | '[' | ']' => ()
          case w if w.isWhitespace => ()
          case w if w == '_' || w.isLetterOrDigit =>
            sawDecl = true; sinceSemi = true
          case _ => return None
        }
        k += 1
      }
      j += 1
    }
    None
  }

  /** Join cleaned lines from `start` until the definition's body `{`
    * at paren-depth 0; a `;` at depth 0 first means a prototype
    * (bodyless). Lookahead bounded at 60 lines.
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
          case ';' if paren <= 0 =>
            sb ++= l.take(k + 1); return (sb.toString, j, false, "")
          case _ => ()
        }
        k += 1
      }
      sb ++= l; sb += '\n'
      j += 1
    }
    (sb.toString, start, false, "")
  }

  /** Blank comments and string/char literals, preserving line
    * structure: `//` to EOL, `/* */` across lines (non-nesting, per
    * the standard), `"…"` with escapes (newline-terminated — a
    * `\`-continued string keeps blanking the next line via the escape
    * rule), `'…'` char literals.
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…", 2 '…', 3 // comment, 4 /* */
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
          else out(i) = c
        case 1 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) {
            out(i + 1) = if (content(i + 1) == '\n') '\n' else ' '
            i += 1
          } else if (c == '"') state = 0
        case 2 =>
          out(i) = ' '
          if (c == '\\' && i + 1 < content.length) { out(i + 1) = ' '; i += 1 }
          else if (c == '\'') state = 0
        case 4 =>
          out(i) = ' '
          if (c == '*' && i + 1 < content.length && content(i + 1) == '/') {
            out(i + 1) = ' '; state = 0; i += 1
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade RUST source extractor — the seventh real language
  * behind the pluggable [[SourceParser]] contract, and with Go the
  * other language modern data-infrastructure is written in. Same
  * architecture as [[GoParser]]/[[TsParser]]: a comment/string-safe
  * cleaning pre-pass, then a single brace-scoped structural scan
  * recovering the reference walker's unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from Rust shapes:
  *
  *   - `fn name(...)` (any modifier run: `pub(crate) const async unsafe
  *     extern "C"`) → `function` units. Inside an `impl Type` /
  *     `impl Trait for Type` / `trait Name` body the function carries
  *     `parentContainer = Type` + a `method_of` edge — Rust attaches
  *     methods via impl blocks, not lexical nesting inside the struct,
  *     so the container comes from the impl's SELF type (the
  *     [[GoParser]] receiver rule transplanted to impl granularity).
  *     `calls` edges from identifier call-sites (incl. `Path::assoc(`)
  *     and `calls_method` from `.method(...)` sites in signature +
  *     body attach to the innermost enclosing function — the walker's
  *     `current_function` rule. Macro invocations (`vec![…]`,
  *     `println!(…)`) are NOT call edges: the `!` breaks the call
  *     shape, which is correct — macros are syntax, not resolvable
  *     call targets.
  *   - `struct/enum/trait/union Name` and `type Name = …` → `type`
  *     units; `trait` bodies are containers (default methods get
  *     `method_of`), struct/enum bodies declare no units.
  *   - `use a::b::C;` / `use a::b::{C, D as E};` / `use a::b::*;` →
  *     one `import` unit per bound name (alias wins), + an `imports`
  *     edge on that name; a glob keeps the last real segment.
  *     Unresolvable targets (std, …) drop in [[SemanticResolver]],
  *     like Zig's `std` and Go's `fmt`.
  *   - a `#[test]` attribute line (incl. `#[tokio::test]`-style
  *     namespaced variants) arms the NEXT `fn` as a `test` unit — the
  *     [[JavaParser]] `@Test` rule.
  *   - top-level / associated `const NAME: T` → `const` units,
  *     `static NAME: T` → `var` units (associated ones carry the
  *     container as parent). Function-local bindings (`let`, local
  *     `const`) are skipped — the same documented scope choice as the
  *     other beyond-reference extractors.
  *
  * Cleaning blanks `//`//`///`//`//!` comments, `/* */` block comments
  * (NESTED, per the Rust reference), `"…"` strings (escape-aware,
  * multi-line — Rust strings span lines), raw/byte strings
  * (`r"…"`, `r#"…"#`, `br##"…"##` — terminator matches the opening
  * `#` count), and char literals, while LIFETIMES (`'a`, `'static`)
  * are left as code: a `'` opens a char literal only when the quote
  * closes as one (`'x'`, `'\n'`, `'\u{…}'`), which is how every real
  * Rust lexer disambiguates.
  */
object RustParser extends SourceParser {

  private val Mods =
    """(?:(?:pub(?:\s*\([^)]*\))?|default|const|async|unsafe|extern(?:\s+\S+)?)\s+)*"""
  private val FnRe = (s"""^\\s*${Mods}fn\\s+([A-Za-z_]\\w*)""").r
  private val TypeDeclRe =
    (s"""^\\s*${Mods}(struct|enum|trait|union)\\s+([A-Za-z_]\\w*)""").r
  private val TypeAliasRe =
    (s"""^\\s*${Mods}type\\s+([A-Za-z_]\\w*)""").r
  // the SELF type: `impl<T> Type`, `impl Trait for Type`, paths kept to
  // their last segment, generic args tolerated
  private val ImplRe =
    ("""^\s*(?:unsafe\s+)?impl(?:\s*<[^>]*>)?\s+(?:.*\bfor\s+)?""" +
      """(?:\w+::)*([A-Za-z_]\w*)""").r
  private val UseRe =
    """^\s*(?:pub(?:\s*\([^)]*\))?\s+)?use\s+((?:\w+::)*\w+)(::\{([^}]*)\})?(::\*)?\s*(?:as\s+([A-Za-z_]\w*))?\s*;?""".r
  private val ConstStaticRe =
    (s"""^\\s*${Mods}(const|static)\\s+(?:mut\\s+)?([A-Za-z_]\\w*)\\s*:""").r
  private val TestAttrRe =
    """^\s*#\[\s*(?:\w+\s*::\s*)*test\s*(?:\(|\]|$)""".r

  /** Call-shaped but syntax. `Some`/`Ok`/`Err` stay IN — enum-variant
    * constructors are call-shaped and unresolvable, dropping in the
    * resolver exactly like Go's builtins.
    */
  private val Keywords = Set(
    "if", "while", "for", "match", "loop", "return", "fn", "let", "mut",
    "const", "static", "impl", "trait", "struct", "enum", "union", "use",
    "mod", "pub", "unsafe", "async", "await", "move", "where", "dyn",
    "ref", "in", "as", "break", "continue", "else", "type", "crate",
    "self", "Self", "super", "extern")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]
    var pendingTest = false // a #[test] attribute arms the next fn

    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" || k == "test" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined
    // innermost impl/trait container; impl frames carry a builder that
    // is NOT in `builders` (impl does not re-declare the type)
    def containerName: String =
      stack.reverseIterator.collectFirst {
        case Frame("type", ub, _) => ub.name
      }.getOrElse("")

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set.empty)

    def emitUse(line: String, lineNo: Int): Unit =
      UseRe.findFirstMatchIn(line).foreach { m =>
        val path = m.group(1)
        val listed = Option(m.group(3))
        val glob = m.group(4) != null
        val alias = Option(m.group(5)).getOrElse("")
        def emit(bound: String, target: String): Unit =
          if (bound.matches("[A-Za-z_]\\w*") && bound != "self")
            builders += UnitBuilder("import", bound, "", lineNo, lineNo,
              ArrayBuffer(ParsedEdge("imports", target)))
        listed match {
          case Some(items) =>
            // `use a::b::{C, D as E, self}` — one unit per item
            items.split(',').map(_.trim).filter(_.nonEmpty).foreach { it =>
              val parts = it.split("\\s+as\\s+")
              val last = parts(0).split("::").last.trim
              val bound = if (parts.length > 1) parts(1).trim else last
              emit(bound, last)
            }
          case None =>
            val last = path.split("::").last
            val bound = if (alias.nonEmpty) alias else last
            // a glob import binds no name; keep the module segment so
            // the dependency is visible (like Go's dot-import tail)
            emit(bound, last)
            if (glob && alias.isEmpty) () // already emitted the segment
        }
      }

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val line = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None
      val trimmed = line.trim

      if (TestAttrRe.findFirstMatchIn(line).isDefined) {
        pendingTest = true
      } else if (!insideFunction && trimmed.startsWith("use")) {
        emitUse(line, lineNo)
        pendingTest = false
      } else if (FnRe.findFirstMatchIn(line).isDefined) {
        val name = FnRe.findFirstMatchIn(line).get.group(1)
        val parent = containerName
        val kind = if (pendingTest) "test" else "function"
        pendingTest = false
        val ub = UnitBuilder(kind, name, if (kind == "test") "" else parent,
          lineNo, lineNo)
        if (kind == "function" && parent.nonEmpty)
          ub.edges += ParsedEdge("method_of", parent)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(sig.replaceFirst(s"${Mods}fn\\s+[A-Za-z_]\\w*", " "), ub)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame(kind, ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (!insideFunction &&
          TypeDeclRe.findFirstMatchIn(line).isDefined) {
        val m = TypeDeclRe.findFirstMatchIn(line).get
        val ub = UnitBuilder("type", m.group(2), "", lineNo, lineNo)
        builders += ub
        // trait bodies hold default methods -> container frame;
        // struct/enum/union bodies declare no units (impls do)
        if (m.group(1) == "trait" && netBraces(line) > 0)
          pending = Some(Frame("type", ub, depth))
        pendingTest = false
      } else if (!insideFunction && ImplRe.findFirstMatchIn(line).isDefined) {
        val name = ImplRe.findFirstMatchIn(line).get.group(1)
        // container scope WITHOUT a unit: the struct/enum declared it
        val ghost = UnitBuilder("type", name, "", lineNo, lineNo)
        if (netBraces(line) > 0) pending = Some(Frame("type", ghost, depth))
        pendingTest = false
      } else if (!insideFunction &&
          TypeAliasRe.findFirstMatchIn(line).isDefined) {
        builders += UnitBuilder("type",
          TypeAliasRe.findFirstMatchIn(line).get.group(1), "", lineNo, lineNo)
        pendingTest = false
      } else if (!insideFunction &&
          ConstStaticRe.findFirstMatchIn(line).isDefined) {
        val m = ConstStaticRe.findFirstMatchIn(line).get
        val kind = if (m.group(1) == "const") "const" else "var"
        builders += UnitBuilder(kind, m.group(2), containerName,
          lineNo, lineNo)
        pendingTest = false
      } else {
        currentCallTarget.foreach(t => addCalls(line, t))
        if (trimmed.nonEmpty && !trimmed.startsWith("#")) pendingTest = false
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
    * at bracket-depth 0 (multi-line signatures; `where` clauses).
    * A `;` at depth 0 before any `{` is a bodyless declaration (trait
    * method signature, extern stub). Lookahead bounded at 60 lines.
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
    * structure — see the class doc for the lexical rules (nested block
    * comments, multi-line and raw strings, lifetime-vs-char-literal).
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…" (multi-line, escapes), 2 '…' char, 3 // comment,
    // 4 /* */ (depth-counted), 5 raw string (terminator = " + hashes)
    var state = 0
    var commentDepth = 0
    var rawHashes = 0
    def isIdentChar(ch: Char): Boolean =
      Character.isLetterOrDigit(ch) || ch == '_'
    def isRawPrefix(at: Int): Int = {
      // content(at) == '"'; count #s immediately before, then `r` (or
      // `br`), with no identifier char before the prefix. Returns the
      // hash count, or -1 when the quote is a plain string.
      var k = at - 1
      var hashes = 0
      while (k >= 0 && content(k) == '#') { hashes += 1; k -= 1 }
      if (k < 0 || content(k) != 'r') return -1
      val beforeR = if (k == 0) ' ' else content(k - 1)
      if (!isIdentChar(beforeR)) hashes
      else if (beforeR == 'b' && (k - 1 == 0 || !isIdentChar(content(k - 2))))
        hashes
      else -1
    }
    while (i < content.length) {
      val c = content(i)
      if (c == '\n') {
        out(i) = '\n'
        if (state == 2 || state == 3) state = 0 // strings/raws span lines
      } else state match {
        case 0 =>
          if (c == '/' && i + 1 < content.length && content(i + 1) == '/') {
            out(i) = ' '; state = 3
          } else if (c == '/' && i + 1 < content.length && content(i + 1) == '*') {
            out(i) = ' '; out(i + 1) = ' '; state = 4; commentDepth = 1; i += 1
          } else if (c == '"') {
            val h = isRawPrefix(i)
            out(i) = ' '
            if (h >= 0) { rawHashes = h; state = 5 } else state = 1
          } else if (c == '\'') {
            // char literal iff it CLOSES as one; else a lifetime
            val isChar =
              if (i + 1 < content.length && content(i + 1) == '\\') true
              else i + 2 < content.length && content(i + 2) == '\'' &&
                content(i + 1) != '\''
            if (isChar) { out(i) = ' '; state = 2 } else out(i) = c
          } else out(i) = c
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
            out(i + 1) = ' '; commentDepth -= 1; i += 1
            if (commentDepth == 0) state = 0
          } else if (c == '/' && i + 1 < content.length &&
              content(i + 1) == '*') {
            out(i + 1) = ' '; commentDepth += 1; i += 1 // Rust nests
          }
        case 5 =>
          out(i) = ' '
          if (c == '"') {
            // closes only with rawHashes trailing #s
            var k = 0
            while (k < rawHashes && i + 1 + k < content.length &&
              content(i + 1 + k) == '#') k += 1
            if (k == rawHashes) {
              var t = 0
              while (t < rawHashes) { out(i + 1 + t) = ' '; t += 1 }
              i += rawHashes
              state = 0
            }
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

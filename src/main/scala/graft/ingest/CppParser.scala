package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Line/regex-grade C++ source extractor — the ninth real language
  * behind the pluggable [[SourceParser]] contract, and the last
  * extension in the reference's DEFAULT ingest surface
  * (`/root/reference/src/ingestion/ingest_directory.zig:185-195`
  * includes `.cpp`/`.hpp` alongside `.c`/`.h`) that still fell
  * through to [[SimpleParser]]'s one-document path. Same architecture
  * as the other eight: a comment/string-safe cleaning pre-pass, then
  * one brace-scoped structural scan recovering the reference walker's
  * unit/edge surface
  * (`/root/reference/src/ingestion/parsers/zig_parser.zig:317-680`)
  * from C++ shapes:
  *
  *   - `class / struct / union / enum [class] Name { … }` → `type`
  *     units; nested types carry the enclosing class as
  *     `parentContainer`. Forward declarations (`class Store;`) emit
  *     nothing, the C prototype rule.
  *   - methods defined INSIDE a class body → `function` units with
  *     `parentContainer` = the class + a `method_of` edge — including
  *     constructors (bare `ClassName(…)`, the Java rule) and
  *     destructors (`~ClassName(…)`). In-class PROTOTYPES (the parens
  *     close into `;`) are declarations — skipped, so a method
  *     declared in-class and defined out-of-line yields exactly one
  *     unit.
  *   - out-of-line member definitions `ret Cls::name(…) { … }` at
  *     file/namespace scope → `function` units with `parentContainer`
  *     = the qualifier segment ADJACENT to the name + `method_of` —
  *     the Go-receiver analogue: C++ methods routinely live outside
  *     the type's braces. A qualifier matching a namespace THIS FILE
  *     opened (`ns::f(…)` after `namespace ns {`) is scope, not
  *     container: the definition scans as a FREE function (r11). A
  *     qualified definition whose namespace opens only in ANOTHER
  *     header still scans as a method HERE (one file at a time), but
  *     [[SemanticResolver.downgradeOrphanMethods]] downgrades it at
  *     workspace level (r12) — the residual is now only a
  *     single-file parse with no resolver pass.
  *   - `namespace X {` opens a TRANSPARENT scope: no unit (the Java
  *     package rule), members inside parse as file-scope with
  *     `parentContainer` "". Namespace aliases (`namespace a = b;`)
  *     emit nothing.
  *   - `template <…>` headers (own-line or prefix) are stripped
  *     before matching — the declaration they introduce parses
  *     normally.
  *   - `TEST(Suite, Name) { … }` / `TEST_F` / `TEST_P` /
  *     `TYPED_TEST` → `test` units named `Suite.Name` (the googletest
  *     registration convention — the role Zig's `test "…"`, Go's
  *     `TestXxx`, and Java's `@Test` play).
  *   - `#include <a/b.hpp>` / `"b.hpp"` → `import` unit named by the
  *     header basename + an `imports` edge (the C rule);
  *     `using a::b::C;` → `import` unit bound to the last segment;
  *     `using X = Y;` alias → `type` unit; `using namespace …;` emits
  *     nothing (no name is bound — the wildcard-import rule).
  *   - `#define` object-like macros → `const`, function-like macros →
  *     callable `function` units with call-scanned replacement text,
  *     `\`-continuations joined first — all inherited from [[CParser]].
  *   - fields at class-body depth and file/namespace-scope objects →
  *     `const` when const/constexpr-qualified, `var` otherwise.
  *   - `calls` edges from identifier call-sites (including
  *     `::`-qualified ones, which scan as their last segment) and
  *     `calls_method` from `.m(…)` dispatch, attached to the
  *     innermost enclosing function (the walker's `current_function`
  *     rule); `->m(…)` scans as a plain call, the C rule.
  *
  * Cleaning blanks `//` and `/* */` comments, `"…"` strings with
  * escapes, `'…'` char literals (digit separators `1'000'000` are NOT
  * literal quotes and stay transparent), and raw strings
  * `R"delim(…)delim"` blanked whole — except `#include` lines, whose
  * quoted header IS the declaration and is re-read from the original
  * line.
  *
  * Operator overloads (r10b) are `function` units named by their
  * normalized spelling (`operator==`, `operator()`, `operator[]`,
  * `operator<<`) — in-class, out-of-line (`Cls::operator==`), and
  * free-function forms; their bodies' calls attach like any method's.
  * Conversion operators too (`operator bool`, `operator std::string`
  * — no return type, the target type IS the name).
  *
  * What the line grade gives up vs a clang AST: preprocessor
  * conditionals with MACRO conditions are not evaluated — literal
  * `#if 0` / `#if 1` arms ARE decided (r10), and macro conditions
  * take the FIRST arm, suppressing `#elif`/`#else` alternatives
  * (first-arm-wins, r11). MACRO-suppressed arms still contribute their
  * definition NAMES as `arm = "suppressed"` units (r12; literally-dead
  * `#if 0` code stays dead) — findable,
  * call-edge-free, no brace effect on file scope, active same-named
  * definitions winning (operators/conversions/TESTs are not
  * recovered). Constructor initializer lists: the item HEADS
  * (`: addr_(…), base(…)`) are member/base initializers and stay
  * excluded from the call scan (the r10 paramsOnly rule — member-init
  * noise would dominate real edges), but calls NESTED inside the
  * items' parens/braces (`: x_(compute(a))`) are genuine call-sites
  * and ARE scanned (r12, initListArgs) — only base-class ctor calls
  * remain invisible. Lambdas assigned at file scope don't open
  * scopes. What it gains: zero native dependencies and per-partition
  * parallelism inside `flatMap`.
  */
object CppParser extends SourceParser {

  private val IncludeRe =
    """^\s*#\s*include\s+[<"]([^>"]+)[>"]""".r
  private val DefineRe =
    """^\s*#\s*define\s+([A-Za-z_]\w*)(\()?""".r
  private val NamespaceAliasRe =
    """^\s*namespace\s+[A-Za-z_]\w*\s*=""".r
  private val UsingAliasRe =
    """^\s*using\s+([A-Za-z_]\w*)\s*=""".r
  private val UsingImportRe =
    """^\s*using\s+((?:[A-Za-z_]\w*\s*::\s*)+[A-Za-z_]\w*)\s*;""".r
  private val TestRe =
    ("""^\s*(?:TEST|TEST_F|TEST_P|TYPED_TEST)\s*\(\s*([A-Za-z_]\w*)""" +
      """\s*,\s*([A-Za-z_]\w*)\s*\)""").r
  // class-like keyword + (attributes/API macros) + the introduced name
  private val TypeRe =
    ("""^\s*(?:typedef\s+)?(class|struct|union|enum(?:\s+(?:class|struct))?)""" +
      """((?:\s+(?:\[\[[^\]]*\]\]|alignas\s*\([^)]*\)|[A-Za-z_]\w*))*)""").r
  // INNER-possessive quantifiers: each token of the type run
  // (identifier, template args, pointer marks) is atomic — within a
  // token, giving characters back can never produce a different valid
  // parse, and on NON-matching lines the per-token backtracking a
  // fully-greedy run pays is quadratic-ish (measured ~2x throughput
  // on the ParserProbe corpus). The OUTER run quantifier stays
  // greedy-backtrackable: `int kRetries =` needs the run to give
  // `kRetries` back as the declarator name.
  private val Mods =
    "(?:(?:public|private|protected|virtual|static|inline|explicit|" +
      "constexpr|consteval|constinit|friend|extern|mutable|typename|" +
      "thread_local)\\s++)*"
  // type run (qualified ids, template args, pointer/ref marks) + name + `(`
  private val TypeRun =
    """(?:[\w:]++(?:<[^<>]*+>)?+(?:\s*[*&]++\s*|\s++))+[*&]*+\s*"""
  private val MethodRe =
    (s"^\\s*$Mods$TypeRun" + """(~?[A-Za-z_]\w*)\s*\(""").r
  private val CtorRe =
    (s"^\\s*$Mods" + """(~?[A-Za-z_]\w*)\s*\(""").r
  private val QualFnRe =
    ("""([A-Za-z_]\w*)\s*(?:<[^<>]*>)?\s*::\s*(~?[A-Za-z_]\w*)\s*\(""").r
  // operator overloads: `operator` + a symbol run (==, <<, +, …) or
  // the call/index forms `()`/`[]` — checked BEFORE MethodRe, which
  // would otherwise mis-read `operator<(…)` as template arguments.
  private val OpName =
    """operator\s*(?:\(\s*\)|\[\s*\]|[+\-*/%^&|~!=<>]{1,3})"""
  private val OperatorRe =
    (s"^\\s*$Mods$TypeRun(" + OpName + """)\s*\(""").r
  private val QualOpRe =
    ("""([A-Za-z_]\w*)\s*(?:<[^<>]*>)?\s*::\s*(""" + OpName + """)\s*\(""").r
  // conversion operators have NO return type (the target type IS the
  // name): `[explicit] operator bool() const { … }`
  private val ConvOpRe =
    (s"^\\s*$Mods" +
      """(operator\s+[\w:]+(?:<[^<>]*>)?\s*[*&]*)\s*\(\s*\)""").r
  private val FieldRe =
    (s"^\\s*$Mods$TypeRun" + """([A-Za-z_]\w*)\s*(?:=|;|\{|\[)""").r
  private val TypedefFnPtrRe =
    """^\s*typedef\s+.*\(\s*\*\s*([A-Za-z_]\w*)\s*\)""".r
  private val TypedefOneRe =
    """^\s*typedef\s+[^{;]*?([A-Za-z_]\w*)\s*;""".r
  private val TypedefTailRe =
    """^\s*\}\s*([A-Za-z_]\w*)\s*;""".r
  // hoisted (r11): these were compiled inline per matching LINE —
  // Pattern.compile showed up in the sampling profile
  private val TypedefStructRe =
    """^\s*typedef\s+(struct|class|union|enum)\b""".r
  private val IdentRe = """[A-Za-z_]\w*""".r
  /** Word-boundary scan for const/constexpr/consteval/constinit —
    * the regex `.*\b(…)\b.*` form backtracks per field line (r11
    * throughput). All four spellings share the `const` stem.
    */
  private def constQual(line: String): Boolean = {
    def ident(c: Char) = c == '_' || c.isLetterOrDigit
    var i = line.indexOf("const")
    while (i >= 0) {
      if (i == 0 || !ident(line.charAt(i - 1))) {
        def wordEndsAt(len: Int): Boolean =
          i + len == line.length || !ident(line.charAt(i + len))
        if (wordEndsAt(5) ||
            ((line.regionMatches(i + 5, "expr", 0, 4) ||
              line.regionMatches(i + 5, "eval", 0, 4) ||
              line.regionMatches(i + 5, "init", 0, 4)) && wordEndsAt(9)))
          return true
      }
      i = line.indexOf("const", i + 1)
    }
    false
  }

  /** Call-shaped but syntax: C keywords + the C++ vocabulary. */
  private[ingest] val Keywords = Set(
    "if", "for", "while", "switch", "return", "sizeof", "case", "do",
    "else", "goto", "break", "continue", "typedef", "struct", "enum",
    "union", "static", "const", "extern", "inline", "void", "int",
    "char", "long", "short", "float", "double", "unsigned", "signed",
    "volatile", "register", "defined", "restrict",
    "class", "namespace", "template", "typename", "new", "delete",
    "throw", "try", "catch", "public", "private", "protected",
    "virtual", "override", "final", "operator", "using", "friend",
    "explicit", "constexpr", "consteval", "constinit", "decltype",
    "noexcept", "static_assert", "static_cast", "dynamic_cast",
    "reinterpret_cast", "const_cast", "this", "nullptr", "auto",
    "bool", "alignof", "alignas", "mutable", "typeid", "thread_local",
    "co_await", "co_return", "co_yield", "requires", "concept")

  import ParserScaffold.{Frame, UnitBuilder}

  def parse(filePath: String, content: String): Seq[ParsedUnit] = {
    val cleanedLines = clean(content)
    val origLines = content.split("\n", -1)
    val builders = ArrayBuffer.empty[UnitBuilder]
    val stack = ArrayBuffer.empty[Frame]
    var typedefOpen = false
    var typedefBoundary = 0
    // every namespace name this file has OPENED so far (C++ requires
    // a namespace be declared before qualified use, so incremental
    // collection suffices; nested `namespace a::b::c {` contributes
    // each segment). Lets the qualified-definition rule tell
    // `ns::f(…)` — a FREE function defined at namespace scope — from
    // `Cls::method(…)` without a symbol table (r11).
    val namespaceNames = scala.collection.mutable.Set.empty[String]

    def currentCallTarget: Option[UnitBuilder] =
      stack.reverseIterator.collectFirst {
        case Frame(k, ub, _) if k == "function" || k == "test" => ub
      }
    def insideFunction: Boolean = currentCallTarget.isDefined
    // the innermost frame decides the scope grammar: a `type` frame
    // means class-body rules (methods/fields), anything else —
    // namespace frames included — means file-scope rules
    def classFrame: Option[Frame] =
      stack.lastOption.filter(_.kind == "type")
    def enclosingTypeName: String =
      stack.reverseIterator.collectFirst {
        case Frame("type", ub, _) => ub.name
      }.getOrElse("")

    def addCalls(text: String, to: UnitBuilder): Unit =
      ParserScaffold.addCalls(text, to, Keywords, Set.empty)

    /** The parameter-list slice of a joined declaration: from its
      * first `(` to the matching `)` — default-argument calls are
      * genuine call-sites; the constructor initializer list and
      * trailing specifiers past the params are not scanned as
      * signature (their call-shaped member inits would dominate).
      */
    def paramsOnly(sig: String): String = {
      val open = sig.indexOf('(')
      if (open < 0) return ""
      var depth = 0
      var k = open
      while (k < sig.length) {
        sig(k) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return sig.substring(open + 1, k)
          case _ => ()
        }
        k += 1
      }
      sig.substring(open + 1)
    }

    /** Call-sites nested INSIDE a constructor initializer list (r12).
      * In `Cls(int a) : x_(compute(a)), base(a), n_{f(a)} {` the
      * TOP-LEVEL item heads (`x_`, `base`, `n_`) are member/base
      * initializers, not calls — the r10 paramsOnly exclusion, kept
      * (member-init noise would dominate real edges) — but text at
      * paren/brace depth ≥ 1 inside the items is ordinary expression
      * text whose calls are genuine (`compute`, `f`): a ctor whose
      * only call to a function happens in its init list is a real
      * caller. Returns the concatenated inner argument text for the
      * standard call scan; "" when the declaration has no init list.
      * Residual: base-class ctor calls (the heads themselves) stay
      * invisible — structurally indistinguishable from member inits
      * without a symbol table.
      */
    def initListArgs(sig: String): String = {
      val open = sig.indexOf('(')
      if (open < 0) return ""
      var depth = 0
      var k = open
      var close = -1
      while (k < sig.length && close < 0) {
        sig(k) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = k
          case _ => ()
        }
        k += 1
      }
      if (close < 0) return ""
      // the init list begins at the first single ':' (not '::') after
      // the params and before the body '{'
      var c = close + 1
      var colon = -1
      var scanning = true
      while (c < sig.length && scanning) {
        val ch = sig(c)
        if (ch == '{') scanning = false
        else if (ch == ':') {
          if (c + 1 < sig.length && sig(c + 1) == ':') c += 1 // '::'
          else { colon = c; scanning = false }
        }
        c += 1
      }
      if (colon < 0) return ""
      // collect the items' INNER text (depth >= 1); a top-level '{'
      // glued to an identifier is a brace-init item, otherwise it is
      // the ctor body — stop there
      val sb = new StringBuilder
      var d = 0
      var p = colon + 1
      var stop = false
      while (p < sig.length && !stop) {
        val ch = sig(p)
        if (ch == '(') { if (d > 0) sb += ch; d += 1 }
        else if (ch == ')') { d -= 1; sb += (if (d > 0) ch else ' ') }
        else if (ch == '{') {
          if (d > 0) { sb += ch; d += 1 }
          else {
            var q = p - 1
            while (q >= 0 && sig(q) == ' ') q -= 1
            val prevC = if (q >= 0) sig(q) else ' '
            if (prevC == '_' || prevC.isLetterOrDigit) d += 1
            else stop = true
          }
        }
        else if (ch == '}') { d = math.max(0, d - 1); sb += (if (d > 0) ch else ' ') }
        else if (d > 0) sb += ch
        p += 1
      }
      sb.toString
    }

    /** GNU-style declarations put the return type (and the qualified
      * class) on lines of their own:
      * {{{
      *   _GLIBCXX20_CONSTEXPR
      *   void
      *   vector<_Tp, _Alloc>::
      *   push_back(const value_type& __x)
      * }}}
      * A single-line regex never sees the full head, so when a line is
      * PURE head material (no `(){};=` — type tokens, qualifiers,
      * macros only) the matcher joins up to three following lines.
      * The join is match-scope only: line consumption still runs
      * through joinDecl from the original line, so a failed join
      * costs nothing.
      */
    def declHead(first: String, idx: Int): String = {
      // `first` is the caller's already-stripped current line — the
      // loop computed stripTemplate(stripCAttrs(…)) once; don't redo it
      def headish(s: String): Boolean =
        s.trim.nonEmpty &&
          !s.exists(c => c == '(' || c == '{' || c == '}' ||
            c == ';' || c == '=' || c == '#')
      if (!headish(first)) return first
      val sb = new StringBuilder(first)
      var j = idx + 1
      var done = false
      while (!done && j < cleanedLines.length && j <= idx + 3) {
        val nxt = stripTemplate(ParserScaffold.stripCAttrs(cleanedLines(j)))
        sb += ' '; sb ++= nxt
        if (!headish(nxt)) done = true
        j += 1
      }
      sb.toString
    }

    // Preprocessor-conditional tracking (r10, FIRST-ARM-WINS r11) —
    // the CParser rules: literal arms are decided (`#if 0` dead code
    // skipped whole, no brace counting; `#if 1`'s `#else` arm
    // likewise). Macro conditions a lexical scan cannot evaluate TAKE
    // THE FIRST NON-`#if 0` ARM and suppress the rest: including both
    // arms double-counted declarations and call edges in config-heavy
    // code and let per-arm unbalanced braces (the `#ifdef _WIN32
    // void f() { #else void f() { #endif` shape) corrupt scope depth.
    // Shared conditional machine (ParserScaffold.CondTracker, r12) +
    // the recovered-definition buffer.
    val cond = new ParserScaffold.CondTracker
    def suppressed: Boolean = cond.suppressed
    def condDirective(d: String, arg: String): Boolean = cond.directive(d, arg)
    val suppressedUnits = ArrayBuffer.empty[UnitBuilder]
    val DirectiveRe = """^\s*#\s*(\w+)\s*(\S*)""".r

    /** SUPPRESSED-ARM UNIT RECOVERY (r12), the CParser rule with the
      * C++ matchers: definition NAMES from MACRO-conditional non-taken
      * arms (cond.recoverable — literally-dead `#if 0` code stays
      * dead) become `arm = "suppressed"` units — no call edges, no
      * brace counting against file scope, no frames; a class/namespace
      * context comes from the LIVE stack (an #ifdef inside a class
      * body attributes its arms' methods to that class). Operators,
      * conversion operators and TESTs are not recovered (rare in
      * platform-split arms). appendSuppressed drops any recovered
      * (type, name, parent) an active definition carries. Returns the
      * consumed-to line. A local def, NOT inline in the scan loop:
      * keeping the hot loop's method small preserves its JIT budget
      * (inlining this cost ~25% parse throughput, measured).
      */
    def scanSuppressedArm(rawLine: String, line: String, trimmed: String,
                          i: Int, lineNo: Int): Int = {
      var consumedTo = i
      if (rawLine.trim.startsWith("#")) {
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
        val joined =
          if (pEnd == i) rawLine
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
          val cls =
            if (classFrame.isDefined) classFrame.get.ub.name else ""
          def recoverFn(name: String, parent: String): Unit = {
            val (_, end, opened, _) = joinDecl(cleanedLines, i)
            val crossesDirective =
              (i to end).exists(cleanedLines(_).trim.startsWith("#"))
            if (opened && !crossesDirective &&
                !Keywords(name.stripPrefix("~"))) {
              suppressedUnits += UnitBuilder("function", name, parent,
                lineStart = lineNo, lineEnd = end + 1,
                edges =
                  if (parent.nonEmpty)
                    ArrayBuffer(ParsedEdge("method_of", parent))
                  else ArrayBuffer.empty,
                arm = "suppressed")
              consumedTo = end
            }
          }
          if (typeKeywordLed(trimmed) &&
              TypeRe.findFirstMatchIn(line).isDefined &&
              line.contains("{")) {
            typeDecl(line, lineNo, cls).foreach { case (ub, _) =>
              // a suppressed `class X {` while a LIVE class X is open
              // is the alternative arm of that very class (`#ifdef A
              // class Conn { … #else class Conn { … #endif };`), not
              // a nested type — skip it
              if (ub.name != cls)
                suppressedUnits += ub.copy(arm = "suppressed")
            }
          } else if (line.indexOf('(') >= 0 && cls.isEmpty &&
              line.contains("::") &&
              QualFnRe.findFirstMatchIn(declHead(line, i)).isDefined) {
            val m = QualFnRe.findFirstMatchIn(declHead(line, i)).get
            val parent =
              if (namespaceNames.contains(m.group(1))) "" else m.group(1)
            recoverFn(m.group(2), parent)
          } else if (line.indexOf('(') >= 0 &&
              MethodRe.findFirstMatchIn(line).isDefined) {
            recoverFn(MethodRe.findFirstMatchIn(line).get.group(1), cls)
          } else if (line.indexOf('(') >= 0 && cls.nonEmpty &&
              CtorRe.findFirstMatchIn(line)
                .exists(m => m.group(1) == cls || m.group(1) == s"~$cls")) {
            recoverFn(CtorRe.findFirstMatchIn(line).get.group(1), cls)
          }
        }
        cond.armDepth = math.max(0, cond.armDepth +
          (i to consumedTo).map(j => netBraces(cleanedLines(j))).sum)
      }
      consumedTo
    }

    var depth = 0
    var i = 0
    while (i < cleanedLines.length) {
      val rawLine = cleanedLines(i)
      val lineNo = i + 1
      var consumedTo = i
      var pending: Option[Frame] = None
      var isPreproc = false
      var freeName: Option[String] = None
      // `template <…>` headers introduce but never declare: strip the
      // prefix (the remainder, if any, is the declaration); a bare
      // header line is transparent and the next line declares
      val line = stripTemplate(ParserScaffold.stripCAttrs(rawLine))
      val trimmed = line.trim

      if (rawLine.trim.startsWith("#") && {
        val m = DirectiveRe.findFirstMatchIn(rawLine)
        m.exists(mm => condDirective(mm.group(1), mm.group(2)))
      }) {
        isPreproc = true
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
      } else if (suppressed) {
        // SUPPRESSED-ARM UNIT RECOVERY (r12) — see scanSuppressedArm
        isPreproc = true
        consumedTo = scanSuppressedArm(rawLine, line, trimmed, i, lineNo)
      } else if (rawLine.trim.startsWith("#")) {
        // the C preprocessor rules verbatim: `\`-continuations join to
        // one logical line, macro-body braces never shift scope depth
        isPreproc = true
        var pEnd = i
        while (pEnd < cleanedLines.length - 1 &&
            cleanedLines(pEnd).replaceAll("""\s+$""", "").endsWith("\\"))
          pEnd += 1
        consumedTo = pEnd
        val joined =
          if (pEnd == i) rawLine
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
                val ub = UnitBuilder("function", name, "", lineNo, pEnd + 1)
                builders += ub
                val afterParams = joined.drop(joined.indexOf('(') + 1)
                  .dropWhile(_ != ')').drop(1)
                addCalls(afterParams, ub)
              } else
                builders += UnitBuilder("const", name, "", lineNo, pEnd + 1)
            }
        }
      } else if (insideFunction) {
        currentCallTarget.foreach(t => addCalls(line, t))
      } else if (typedefOpen &&
          TypedefTailRe.findFirstMatchIn(line).isDefined &&
          depth + netBraces(line) <= typedefBoundary) {
        builders += UnitBuilder("type",
          TypedefTailRe.findFirstMatchIn(line).get.group(1),
          "", lineNo, lineNo)
        typedefOpen = false
      } else if (line.contains("TEST") &&
          TestRe.findFirstMatchIn(line).isDefined) {
        val m = TestRe.findFirstMatchIn(line).get
        val ub = UnitBuilder("test", s"${m.group(1)}.${m.group(2)}",
          "", lineNo, lineNo)
        builders += ub
        val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
        addCalls(rest, ub)
        if (opened) pending = Some(Frame("test", ub, depth))
        else ub.lineEnd = end + 1
        consumedTo = end
      } else if (trimmed.startsWith("namespace") &&
          NamespaceAliasRe.findFirstMatchIn(line).isDefined) {
        () // `namespace a = b;` binds no queryable unit
      } else if (trimmed.startsWith("namespace") ||
          trimmed.startsWith("inline namespace")) {
        val (sig, end, opened, _) = joinDecl(cleanedLines, i)
        if (opened) {
          IdentRe
            .findAllIn(sig.substring(
              sig.indexOf("namespace") + "namespace".length))
            .foreach(n => if (n != "inline") namespaceNames += n)
          // transparent scope: a frame with a throwaway builder keeps
          // the depth machine honest without emitting a unit
          pending = Some(Frame("namespace",
            UnitBuilder("namespace", trimmed, "", lineNo, lineNo), depth))
          consumedTo = end
        }
      } else if (trimmed.startsWith("using") &&
          UsingAliasRe.findFirstMatchIn(line).isDefined) {
        builders += UnitBuilder("type",
          UsingAliasRe.findFirstMatchIn(line).get.group(1),
          enclosingTypeName, lineNo, lineNo)
      } else if (trimmed.startsWith("using") &&
          UsingImportRe.findFirstMatchIn(line).isDefined) {
        val path = UsingImportRe.findFirstMatchIn(line).get.group(1)
        val bound = path.split("::").last.trim
        builders += UnitBuilder("import", bound, "", lineNo, lineNo,
          ArrayBuffer(ParsedEdge("imports", bound)))
      } else if (trimmed.startsWith("using")) {
        () // `using namespace …;` binds no name
      } else if (classFrame.isDefined) {
        // ---- class-body grammar ----
        val cls = classFrame.get.ub.name
        val isTypeLed = typeKeywordLed(trimmed) &&
          !line.contains("(") && TypeRe.findFirstMatchIn(line).isDefined
        if (isTypeLed) {
          typeDecl(line, lineNo, enclosingTypeName) match {
            case Some((ub, wantsFrame)) =>
              builders += ub
              val (_, end, opened, _) = joinDecl(cleanedLines, i)
              if (wantsFrame && opened) pending = Some(Frame("type", ub, depth))
              else ub.lineEnd = end + 1
              consumedTo = end
            case None => ()
          }
        } else if (trimmed == "public:" || trimmed == "private:" ||
            trimmed == "protected:") {
          // pure access-specifier lines are transparent (r11): the
          // declaration after one parses from its OWN line — skipping
          // the 3-line declHead join here is both faster and gives
          // the following member its accurate lineStart
          ()
        } else {
          val mline = declHead(line, i)
          // cheap character guards before the heavy TypeRun regexes:
          // every method/ctor/operator form needs a `(`, the operator
          // forms need the keyword — field lines (`int v_;`) and
          // access specifiers skip all four scans (r11 throughput)
          val hasParen = mline.indexOf('(') >= 0
          val hasOp = hasParen && mline.contains("operator")
          val mName =
            if (!hasParen) None
            else (if (hasOp)
                OperatorRe.findFirstMatchIn(mline)
                  .map(_.group(1).replaceAll("\\s+", ""))
                  .orElse(ConvOpRe.findFirstMatchIn(mline)
                    .map(_.group(1).replaceAll("\\s+", " ").trim))
              else None)
              .orElse(MethodRe.findFirstMatchIn(mline).map(_.group(1)))
              .orElse(CtorRe.findFirstMatchIn(mline).map(_.group(1))
                .filter(n => n == cls || n == s"~$cls"))
          if (mName.isDefined) {
            val name = mName.get
            if (!Keywords(name.stripPrefix("~"))) {
              val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
              if (opened) { // prototypes close into `;` — skipped
                val ub = UnitBuilder("function", name, cls, lineNo, lineNo,
                  ArrayBuffer(ParsedEdge("method_of", cls)))
                builders += ub
                addCalls(paramsOnly(sig), ub)
                // a constructor's init-list NESTED calls are genuine
                // call-sites (r12) — see initListArgs
                if (name == cls || name == s"~$cls")
                  addCalls(initListArgs(sig), ub)
                addCalls(rest, ub)
                pending = Some(Frame("function", ub, depth))
              }
              consumedTo = end
            }
          } else if (!trimmed.startsWith("friend")) {
            // `friend class X;` befriends, declares nothing
            FieldRe.findFirstMatchIn(line).foreach { fm =>
              val name = fm.group(1)
              if (!Keywords(name)) {
                val kind = if (constQual(line)) "const" else "var"
                val ub = UnitBuilder(kind, name, cls, lineNo, lineNo)
                builders += ub
                addCalls(line.substring(line.indexOf(name) + name.length), ub)
              }
            }
          }
        }
      } else {
        // ---- file / namespace scope grammar ----
        // struct-led lines may still be function definitions (a
        // struct-returning function, the C rule) — only class/union/
        // enum-led lines commit to the type path before trying one
        val otherTypeLed = trimmed.startsWith("class") ||
          trimmed.startsWith("union") || trimmed.startsWith("enum") ||
          TypedefStructRe.findFirstIn(line).isDefined
        val mline = declHead(line, i)
        // cheap character guards (r11 throughput): both qualified
        // forms need `(` and `::`, the operator forms the keyword
        val hasParen = mline.indexOf('(') >= 0
        val hasOp = hasParen && mline.contains("operator")
        val isTypedefLed = trimmed.startsWith("typedef")
        // out-of-line member: operator form first (its name may itself
        // contain parens — `Cls::operator()(…)` — so the first-paren
        // rule below cannot apply to it), then the identifier form
        val qualM: Option[(String, String)] =
          if (!hasParen || isTypedefLed || !mline.contains("::")) None
          else (if (hasOp) QualOpRe.findFirstMatchIn(mline)
              .map(m => (m.group(1), m.group(2).replaceAll("\\s+", "")))
            else None)
          .orElse(QualFnRe.findFirstMatchIn(mline)
            // the declarator's paren, not one buried in parameter
            // types: accept only a match whose `(` is the head's first
            .filter(m => mline.indexOf('(') == mline.indexOf('(', m.end - 1))
            .map(m => (m.group(1), m.group(2))))
        if (trimmed.startsWith("typedef") &&
            TypedefFnPtrRe.findFirstMatchIn(line).isDefined) {
          builders += UnitBuilder("type",
            TypedefFnPtrRe.findFirstMatchIn(line).get.group(1),
            "", lineNo, lineNo)
        } else if (qualM.isDefined && !otherTypeLed) {
          // out-of-line member `ret Cls::name(…) { … }` — UNLESS the
          // qualifier names a namespace this file opened, in which
          // case `ns::f(…)` is a FREE function being defined at
          // namespace scope (transparent, like defining it inside the
          // braces): no container, no method_of (r11). A nested
          // `ns::Cls::method(…)` still attributes to Cls — the regex
          // captures the qualifier ADJACENT to the name.
          val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
          if (opened) {
            val (parent, name) = qualM.get
            val ub =
              if (namespaceNames.contains(parent))
                UnitBuilder("function", name, "", lineNo, lineNo)
              else UnitBuilder("function", name, parent, lineNo, lineNo,
                ArrayBuffer(ParsedEdge("method_of", parent)))
            builders += ub
            addCalls(paramsOnly(sig), ub)
            // out-of-line ctor `Cls::Cls(…) : x_(f()) { … }` — its
            // init-list nested calls are genuine (r12)
            if (name == parent) addCalls(initListArgs(sig), ub)
            addCalls(rest, ub)
            pending = Some(Frame("function", ub, depth))
          }
          consumedTo = end
        } else if (!otherTypeLed && !isTypedefLed && hasParen && {
            // free function definition (the C structural rule, with
            // qualified/template return types allowed in the type run —
            // a `std::string f(…)` return qualifier is not an
            // out-of-line member; those matched QualFnRe above).
            // Free operator overloads (`ostream& operator<<(…)`) first:
            // MethodRe would mis-read `operator<` as template arguments.
            freeName = (if (hasOp) OperatorRe.findFirstMatchIn(mline)
                .map(_.group(1).replaceAll("\\s+", "")) else None)
              .orElse(MethodRe.findFirstMatchIn(mline).map(_.group(1)))
            freeName.isDefined
          }) {
          val name = freeName.get
          if (!Keywords(name.stripPrefix("~"))) {
            val (sig, end, opened, rest) = joinDecl(cleanedLines, i)
            if (opened) {
              val ub = UnitBuilder("function", name, "", lineNo, lineNo)
              builders += ub
              addCalls(paramsOnly(sig), ub)
              addCalls(rest, ub)
              pending = Some(Frame("function", ub, depth))
            }
            consumedTo = end
          }
        } else if (typeKeywordLed(trimmed) &&
            TypeRe.findFirstMatchIn(line).isDefined) {
          typeDecl(line, lineNo, "") match {
            case Some((ub, wantsFrame)) =>
              builders += ub
              if (trimmed.startsWith("typedef")) {
                typedefOpen = true; typedefBoundary = depth
              }
              val (_, end, opened, _) = joinDecl(cleanedLines, i)
              if (wantsFrame && opened) pending = Some(Frame("type", ub, depth))
              else ub.lineEnd = end + 1
              consumedTo = end
            case None =>
              // `typedef struct { … } name;` with no tag: arm the tail
              if (trimmed.startsWith("typedef") && line.contains("{")) {
                typedefOpen = true; typedefBoundary = depth
              } else if (line.trim.endsWith(";") && !line.contains("{")) {
                // `struct store g_cfg;` object declarations
                FieldRe.findFirstMatchIn(
                  line.replaceFirst("""^\s*(struct|class|union|enum)\s+""", ""))
                  .foreach { g =>
                    if (!Keywords(g.group(1))) {
                      val kind =
                        if (constQual(line)) "const" else "var"
                      builders += UnitBuilder(kind, g.group(1), "",
                        lineNo, lineNo)
                    }
                  }
              }
          }
        } else if (trimmed.startsWith("typedef")) {
          if (line.contains("{")) { typedefOpen = true; typedefBoundary = depth }
          else TypedefOneRe.findFirstMatchIn(line).foreach { m =>
            builders += UnitBuilder("type", m.group(1), "", lineNo, lineNo)
          }
        } else if (FieldRe.findFirstMatchIn(line).isDefined &&
            !line.contains("(")) {
          val name = FieldRe.findFirstMatchIn(line).get.group(1)
          if (!Keywords(name)) {
            val kind = if (constQual(line)) "const" else "var"
            builders += UnitBuilder(kind, name, "", lineNo, lineNo)
          }
        }
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

  /** A class-like declaration line → (type unit, wants a class frame).
    * None when the tag is anonymous or the line is a forward
    * declaration / object declaration (handled by the caller).
    */
  private def typeDecl(line: String, lineNo: Int, parent: String)
      : Option[(UnitBuilder, Boolean)] = {
    val m = TypeRe.findFirstMatchIn(line).getOrElse(return None)
    val kw = m.group(1)
    // the introduced name: the LAST plain identifier in the
    // attribute/API-macro run (`class API_EXPORT Store` → Store),
    // `final` excluded
    val names = IdentRe.findAllIn(
      m.group(2).replaceAll("""\[\[[^\]]*\]\]|alignas\s*\([^)]*\)""", " "))
      .toSeq.filterNot(n => n == "final" || Keywords(n))
    val name = names.lastOption.getOrElse(return None)
    val rest = line.substring(m.end)
    val defines = line.contains("{") ||
      rest.trim.startsWith(":") || rest.trim.isEmpty ||
      rest.trim.startsWith("final")
    if (!defines) return None // forward decl or object decl
    // enum/union bodies hold constants, not members — no class frame
    val wantsFrame = kw == "class" || kw == "struct"
    Some((UnitBuilder("type", name, parent, lineNo, lineNo), wantsFrame))
  }

  /** Strip a leading `template <…>` header (angle-depth balanced on
    * the line); a header with no same-line remainder returns "" — the
    * line is transparent and the next line declares.
    */
  private def stripTemplate(line: String): String = {
    val t = line.trim
    if (!t.startsWith("template")) return line
    val open = line.indexOf('<')
    if (open < 0) return ""
    var depth = 0
    var k = open
    while (k < line.length) {
      line(k) match {
        case '<' => depth += 1
        case '>' =>
          depth -= 1
          if (depth == 0) return line.substring(k + 1)
        case _ => ()
      }
      k += 1
    }
    ""
  }

  private def netBraces(l: String): Int =
    l.count(_ == '{') - l.count(_ == '}')

  /** Exact cheap precheck for [[TypeRe]] (anchored at
    * `^(?:typedef )?(class|struct|union|enum…)`) — skips the regex on
    * the overwhelming majority of lines (r11 throughput).
    */
  private def typeKeywordLed(trimmed: String): Boolean =
    trimmed.startsWith("class") || trimmed.startsWith("struct") ||
      trimmed.startsWith("union") || trimmed.startsWith("enum") ||
      trimmed.startsWith("typedef")

  /** Is the `'` at `s(i)` opened by an encoding prefix (`L` / `u` /
    * `U` / `u8`) sitting at a token boundary? Distinguishes the char
    * literal `L'a'` from the digit separator `1'000'000` — the prefix
    * letter is alphanumeric on the quote's left either way.
    */
  private def isCharPrefix(s: String, i: Int): Boolean = {
    def ident(c: Char) = c == '_' || c.isLetterOrDigit
    (i >= 1 && (s(i - 1) == 'L' || s(i - 1) == 'u' || s(i - 1) == 'U') &&
      (i < 2 || !ident(s(i - 2)))) ||
    (i >= 2 && s(i - 1) == '8' && s(i - 2) == 'u' &&
      (i < 3 || !ident(s(i - 3))))
  }

  /** Join cleaned lines from `start` until the declaration's body `{`
    * at paren-depth 0 (constructor initializer lists sit between the
    * params' `)` and the `{`, so the brace still terminates); a `;` at
    * depth 0 first means a prototype/forward declaration. Lookahead
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

  /** Blank comments and literals, preserving line structure: `//` to
    * EOL, `/* */` across lines, `"…"` with escapes, `'…'` char
    * literals (a `'` between alphanumerics is a C++14 digit separator,
    * not a quote), and raw strings `R"delim(…)delim"` blanked whole.
    */
  private[ingest] def clean(content: String): Array[String] = {
    val out = new Array[Char](content.length)
    var i = 0
    // 0 normal, 1 "…", 2 '…', 3 //, 4 /* */, 5 raw string
    var state = 0
    var rawDelim = "" // the `)delim"` terminator while in state 5
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
          } else if (c == 'R' && i + 1 < content.length &&
              content(i + 1) == '"' &&
              (i == 0 || !(content(i - 1).isLetterOrDigit ||
                content(i - 1) == '_'))) {
            // R"delim( … )delim"
            var d = i + 2
            while (d < content.length && content(d) != '(' &&
                content(d) != '\n' && d - i - 2 <= 16) d += 1
            if (d < content.length && content(d) == '(') {
              rawDelim = ")" + content.substring(i + 2, d) + "\""
              out(i) = ' '
              var k = i + 1
              while (k <= d) { out(k) = ' '; k += 1 }
              i = d
              state = 5
            } else out(i) = c
          } else if (c == '"') { out(i) = ' '; state = 1 }
          else if (c == '\'' && isCharPrefix(content, i)) {
            // prefixed char literal L'a' / u'x' / U'x' / u8'x': the
            // prefix letter would otherwise trip the digit-separator
            // rule below, leaving the CLOSING quote to open char state
            // and blank the rest of the line (r11, ADVICE)
            out(i) = ' '; state = 2
          } else if (c == '\'' && i > 0 &&
              (content(i - 1).isLetterOrDigit) &&
              i + 1 < content.length && content(i + 1).isLetterOrDigit) {
            out(i) = ' ' // digit separator: 1'000'000 (hex too: 0xDEAD'BEEF)
          } else if (c == '\'') { out(i) = ' '; state = 2 }
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
        case 5 =>
          out(i) = ' '
          if (c == ')' && content.regionMatches(i, rawDelim, 0, rawDelim.length)) {
            var k = i
            while (k < i + rawDelim.length && k < content.length) {
              if (content(k) != '\n') out(k) = ' ' else out(k) = '\n'
              k += 1
            }
            i += rawDelim.length - 1
            state = 0
          }
        case _ => out(i) = ' '
      }
      i += 1
    }
    new String(out).split("\n", -1)
  }
}

package graft.ingest

/** Dev-probe audit of the suppressed-arm policy's EDGE loss (r13,
  * VERDICT #3): recovered suppressed-arm units carry names only
  * (`CppParser.scanSuppressedArm` emits no call edges by design —
  * re-emitting them risks re-introducing the double-count
  * first-arm-wins killed), so this counts the call-sites inside
  * macro-suppressed arms that therefore contribute no edges, split
  * RECOVERABLE (alternative build configs — `#ifdef _WIN32 … #else`)
  * vs literally-dead (`#if 0`, dead in every config). Uses the same
  * comment-stripped lines ([[CParser.clean]]/[[CppParser.clean]]) and
  * the same call-site scanner ([[ParserScaffold.addCalls]]) the real
  * parse uses, so the counts are like-for-like with the active
  * surface's extraction; `activeCalls` is the same scan over
  * non-suppressed lines, the denominator for a loss ratio. Consumed
  * by `tools/ArmProbe`; no engine path calls this.
  */
object ArmAudit {

  final case class Counts(recoverableCalls: Long, deadCalls: Long,
                          activeCalls: Long) {
    def +(o: Counts): Counts = Counts(recoverableCalls + o.recoverableCalls,
      deadCalls + o.deadCalls, activeCalls + o.activeCalls)
  }

  private val DirectiveRe = """^\s*#\s*(\w+)\s*(\S*)""".r

  def callSites(content: String, cpp: Boolean): Counts = {
    val cleaned = if (cpp) CppParser.clean(content) else CParser.clean(content)
    val keywords = if (cpp) CppParser.Keywords else CParser.Keywords
    val cond = new ParserScaffold.CondTracker
    val sink = ParserScaffold.UnitBuilder("probe", "", "", 0, 0)
    var rec = 0L
    var dead = 0L
    var act = 0L
    var i = 0
    while (i < cleaned.length) {
      val line = cleaned(i)
      if (line.trim.startsWith("#")) {
        DirectiveRe.findFirstMatchIn(line)
          .foreach(m => cond.directive(m.group(1), m.group(2)))
        // `\`-continuations belong to the directive, as in the parsers
        while (i < cleaned.length - 1 &&
            cleaned(i).replaceAll("""\s+$""", "").endsWith("\\")) i += 1
      } else {
        sink.edges.clear()
        ParserScaffold.addCalls(line, sink, keywords, Set.empty)
        val n = sink.edges.length.toLong
        if (!cond.suppressed) act += n
        else if (cond.recoverable) rec += n
        else dead += n
      }
      i += 1
    }
    Counts(rec, dead, act)
  }
}

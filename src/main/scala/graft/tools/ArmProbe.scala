package graft.tools

import graft.ingest.{CParser, CppParser}

/** Dogfood measurement for the preprocessor-arm policy (r12): parse
  * the glibc headers (/usr/include, CParser) and the libstdc++ tree
  * (/usr/include/c++/<ver>, CppParser) and report how many units are
  * RECOVERED from macro-suppressed arms (`arm = "suppressed"`) versus
  * the active surface — i.e. exactly the definitions first-arm-wins
  * (r11) had made invisible, net of both-arm duplicates. Pure JVM, no
  * Spark session (the extractors are the unit under test).
  *
  * `runMain graft.tools.ArmProbe`
  */
object ArmProbe {
  private def read(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  private def walk(dir: java.io.File, keep: java.io.File => Boolean)
      : Seq[java.io.File] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    def go(d: java.io.File): Unit = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
      fs.sortBy(_.getName).foreach { f =>
        if (f.isDirectory) go(f)
        else if (f.isFile && f.length > 0 && f.length <= 1024 * 1024 &&
          keep(f)) out += f
      }
    }
    go(dir)
    out.toSeq
  }

  private def report(corpus: String,
                     parse: (String, String) => Seq[graft.ingest.ParsedUnit],
                     files: Seq[java.io.File], cpp: Boolean): Unit = {
    var total = 0L
    var supp = 0L
    val suppByType = scala.collection.mutable.Map.empty[String, Long]
    var failed = 0
    // EDGE-loss audit (r13, VERDICT #3): call-sites inside suppressed
    // arms emit no edges by design — count them (recoverable vs
    // literally-dead) against the active surface's call-site count,
    // with the same cleaned lines + scanner the parse uses
    var calls = graft.ingest.ArmAudit.Counts(0L, 0L, 0L)
    val t0 = System.nanoTime()
    files.foreach { f =>
      try {
        val src = read(f)
        val us = parse(f.getPath, src)
        total += us.length
        us.foreach { u =>
          if (u.arm == "suppressed") {
            supp += 1
            suppByType(u.unitType) =
              suppByType.getOrElse(u.unitType, 0L) + 1
          }
        }
        calls = calls + graft.ingest.ArmAudit.callSites(src, cpp)
      } catch { case _: Throwable => failed += 1 }
    }
    val dt = (System.nanoTime() - t0) / 1e9
    val pct = if (total > 0) 100.0 * supp / total else 0.0
    val lostPct = if (calls.activeCalls > 0)
      100.0 * calls.recoverableCalls / calls.activeCalls else 0.0
    println(f"$corpus%-12s files=${files.size}%5d units=$total%7d " +
      f"suppressed_recovered=$supp%6d ($pct%4.1f%%) " +
      f"by_type=${suppByType.toSeq.sortBy(-_._2).mkString(",")} " +
      f"failed=$failed ${files.size / dt}%.0f files/s")
    println(f"$corpus%-12s call-sites: active=${calls.activeCalls}%8d " +
      f"suppressed_recoverable=${calls.recoverableCalls}%7d " +
      f"(${lostPct}%4.1f%% of active — edges NOT emitted) " +
      f"literally_dead=${calls.deadCalls}%6d (dead in every config)")
  }

  def main(args: Array[String]): Unit = {
    val glibc = new java.io.File("/usr/include")
    if (glibc.isDirectory) {
      val hs = walk(glibc, f => f.getName.endsWith(".h") &&
        !f.getPath.contains("/c++/"))
      report("glibc .h", CParser.parse, hs, cpp = false)
    }
    val cxxBase = new java.io.File("/usr/include/c++")
    Option(cxxBase.listFiles()).flatMap(_.headOption).foreach { ver =>
      // libstdc++ ships extensionless headers (<vector>) plus bits/*.h
      val hs = walk(ver, f => !f.getName.contains("."))
      report("libstdc++ hd", CppParser.parse, hs, cpp = true)
      val bits = walk(new java.io.File(ver, "bits"),
        _.getName.endsWith(".h"))
      report("libstdc++ .h", CppParser.parse, bits, cpp = true)
    }
  }
}

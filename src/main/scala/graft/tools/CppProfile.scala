package graft.tools

import graft.ingest.CppParser

/** Sampling profile of the C++ extractor's single-core hot path —
  * the ParserProbe corpus, a 5 ms stack sampler on the parse thread,
  * and a frame histogram over `graft.ingest` methods. Dev probe for
  * the r11 throughput work (no Spark session needed).
  */
object CppProfile {
  private def block(i: Int): String =
    s"""#include "util_$i.hpp"
       |namespace svc_$i {
       |constexpr int kMax$i = $i;
       |class Mod$i {
       | public:
       |  Mod$i(int v) : v_(v) { check_$i(v); }
       |  int outer_$i(int x) { return inner_$i(x) + run_$i(x); }
       | private:
       |  int v_;
       |};
       |static int inner_$i(int x) {
       |    // int ghost() {}
       |    return x * $i;
       |}
       |}
       |""".stripMargin

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(4000)
    val files = (0 until nFiles).map { f =>
      (s"x$f.cpp", (0 until 10).map(b => block(f * 10 + b)).mkString("\n"))
    }
    files.take(200).foreach { case (p, s) => CppParser.parse(p, s) }

    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val target = Thread.currentThread()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = target.getStackTrace
        // deepest graft.ingest frame + the leaf it is executing in
        st.find(_.getClassName.startsWith("graft.ingest")).foreach { f =>
          val owner = s"${f.getClassName.split('.').last}.${f.getMethodName}"
          val leaf = st.headOption.map { l =>
            s"${l.getClassName.split('.').last}.${l.getMethodName}"
          }.getOrElse("?")
          val k = if (leaf == owner) owner else s"$owner <- $leaf"
          hist.merge(k, 1, (a, b) => Integer.valueOf(a + b)); ()
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    var units = 0L
    val t0 = System.nanoTime()
    files.foreach { case (p, s) => units += CppParser.parse(p, s).size }
    val dt = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"cpp: ${nFiles / dt}%.0f files/s  ($units units, $dt%.2f s)")
    import scala.jdk.CollectionConverters._
    val total = hist.values.asScala.map(_.intValue).sum.max(1)
    hist.asScala.toSeq.sortBy(-_._2.intValue).take(20).foreach {
      case (k, n) => println(f"  ${n.intValue * 100.0 / total}%5.1f%% $k")
    }
  }
}

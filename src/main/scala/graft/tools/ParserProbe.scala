package graft.tools

import graft.ingest._
import org.apache.spark.sql.SparkSession

/** Parser THROUGHPUT probe — the ingest-path scale datum: at 100 TB
  * the extractors run inside `flatMap`, so corpus ingest cost is
  * (bytes / per-core MB/s) / cores. Synthesizes a realistic corpus per
  * language (repeated declaration blocks: imports, types, containered
  * functions with call-sites, consts), measures the bare
  * `parser.parse` single-core rate, then the same corpus through the
  * distributed [[Ingest.parseFiles]] pass to show the flatMap scaling.
  *
  * `runMain graft.tools.ParserProbe [filesPerLang] [blocksPerFile]`
  */
object ParserProbe {

  private def block(lang: String, i: Int): String = lang match {
    case "zig" =>
      s"""const util_$i = @import("util_$i.zig");
         |pub const MAX_$i: u32 = $i;
         |pub fn outer_$i(x: u32) u32 {
         |    return inner_$i(x) + helper_$i(x);
         |}
         |fn inner_$i(x: u32) u32 {
         |    // a comment with fn ghost() {}
         |    return x * $i;
         |}
         |""".stripMargin
    case "scala" =>
      s"""import graft.util.Helper$i
         |object Mod$i {
         |  val Max$i = $i
         |  def outer$i(x: Int): Int = inner$i(x) + Helper$i.run(x)
         |  private def inner$i(x: Int): Int = x * $i // fn ghost
         |}
         |""".stripMargin
    case "py" =>
      s"""import util_$i
         |MAX_$i = $i
         |def outer_$i(x):
         |    return inner_$i(x) + util_$i.run(x)
         |def inner_$i(x):
         |    # a comment with def ghost():
         |    return x * $i
         |""".stripMargin
    case "go" =>
      s"""import "svc/util_$i"
         |const Max$i = $i
         |func Outer$i(x int) int {
         |    return inner$i(x) + util_$i.Run(x)
         |}
         |func inner$i(x int) int {
         |    // func ghost() {}
         |    return x * $i
         |}
         |""".stripMargin
    case "ts" =>
      s"""import { run$i } from './util_$i'
         |export const MAX_$i = $i
         |export function outer$i(x: number): number {
         |  return inner$i(x) + `v ${"$"}{run$i(x)}`.length
         |}
         |const inner$i = (x: number) => x.valueOf() * $i
         |""".stripMargin
    case "java" =>
      s"""import svc.Util$i;
         |public class Mod$i {
         |  public static final int MAX_$i = $i;
         |  public static int outer$i(int x) {
         |    return inner$i(x) + Util$i.run(x);
         |  }
         |  static int inner$i(int x) { return x * $i; }
         |}
         |""".stripMargin
    case "rs" =>
      s"""use crate::util_$i::Helper$i;
         |pub const MAX_$i: u32 = $i;
         |pub struct Mod$i { v: u32 }
         |impl Mod$i {
         |    pub fn outer_$i(x: u32) -> u32 {
         |        inner_$i(x) + Helper$i::run(x)
         |    }
         |}
         |fn inner_$i(x: u32) -> u32 {
         |    let s = "fn ghost() {}";
         |    x * $i + s.len() as u32
         |}
         |""".stripMargin
    case "cpp" =>
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
    case _ => // c
      s"""#include "util_$i.h"
         |#define MAX_$i $i
         |static int retries_$i = $i;
         |int outer_$i(int x) {
         |    return inner_$i(x) + run_$i(x);
         |}
         |static int inner_$i(int x) {
         |    /* int ghost(void) {} */
         |    return x * $i;
         |}
         |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000)
    val blocks = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val langs = Seq(
      "zig" -> ZigParser, "scala" -> ScalaParser, "py" -> PythonParser,
      "go" -> GoParser, "ts" -> TsParser, "java" -> JavaParser,
      "rs" -> RustParser, "c" -> CParser, "cpp" -> CppParser)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println(f"${"lang"}%-6s ${"files/s(1core)"}%15s ${"MB/s(1core)"}%12s " +
      f"${"units/file"}%11s ${"dist files/s"}%13s")
    for ((lang, p) <- langs) {
      val files = (0 until nFiles).map { f =>
        val src = (0 until blocks)
          .map(b => block(lang, f * blocks + b)).mkString("\n")
        (s"x$f.$lang", src)
      }
      val bytes = files.map(_._2.length.toLong).sum
      // warm the JIT on a slice, then one timed single-thread pass
      files.take(100).foreach { case (path, src) => p.parse(path, src) }
      var units = 0L
      val t0 = System.nanoTime()
      files.foreach { case (path, src) => units += p.parse(path, src).size }
      val dt = (System.nanoTime() - t0) / 1e9
      // the same corpus through the distributed flatMap pass
      val ds = files.map { case (path, src) => Ingest.FileDoc(path, src) }
        .toDS().repartition(32)
      ds.cache().count()
      val t1 = System.nanoTime()
      val distUnits = Ingest.parseFiles(ds, DispatchParser).count()
      val ddt = (System.nanoTime() - t1) / 1e9
      ds.unpersist()
      println(f"$lang%-6s ${nFiles / dt}%15.0f ${bytes / dt / 1e6}%12.1f " +
        f"${units.toDouble / nFiles}%11.1f ${nFiles / ddt}%13.0f")
    }
    spark.stop()
  }
}

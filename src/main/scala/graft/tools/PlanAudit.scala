package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for selected queries to audit
  * pushdown (PushedFilters / ReadSchema), broadcast choices, and
  * whole-stage-codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("filter_contains", "q1_agg", "q3_top_orders", "keyword_search",
        "ann_topk", "find_blocks_batch")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Queries.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

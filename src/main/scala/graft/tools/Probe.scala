package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — not part of the library surface. Smoke-runs the
  * driver-contract entry points.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println(s"entry rows = ${df.count()}")
    df.show(5, false)
    spark.stop()
  }
}

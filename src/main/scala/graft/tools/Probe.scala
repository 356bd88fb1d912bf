package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    import org.apache.spark.sql.functions._
    ev.select(timestamp_micros((col("ts") / 1000).cast("long")).as("ts2")).show(3, false)
    spark.stop()
  }
}

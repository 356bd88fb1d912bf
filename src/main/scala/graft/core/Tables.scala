package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every operator in the library is expressed against these tables (plus
  * DataFrames derived from them), so the same query can be replayed by the
  * DuckDB oracle on the identical parquet files.
  *
  * Scale note: at 100 TB these would be partitioned tables behind a
  * catalog; everything downstream only assumes `spark.read.parquet`
  * semantics (columnar scans, predicate pushdown, column pruning), so the
  * loader is the only thing that changes on a real cluster.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** Raw events. The fixture's `ts` is parquet TIMESTAMP(NANOS), which
    * Spark rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` is
    * set on the session (all entry points in this repo set it) — `ts`
    * then reads as epoch-nanoseconds LONG.
    */
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")

  /** Events with both the raw epoch-ns (`ts_ns`) and a proper TIMESTAMP
    * (`ts`, truncated to microseconds — Spark's native resolution).
    */
  def eventsNorm(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    // integer `div`, NOT `/`: Spark's `/` routes longs through DOUBLE,
    // and epoch-ns (~1.7e18) exceeds 2^53 — the rounded double can be
    // off by ±1 µs after truncation vs the oracle's exact integer
    // division.
    raw.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

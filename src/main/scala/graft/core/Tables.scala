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
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** Load one fixture table, normalizing any TIMESTAMP_NTZ column to
    * session-local TIMESTAMP. Parquet `timestamp[us]` with no timezone
    * annotation infers as NTZ in Spark 4; every entry point in this
    * repo pins `spark.sql.session.timeZone=UTC`, so the cast is a
    * deterministic relabeling (DuckDB likewise reads the column as a
    * plain TIMESTAMP), and downstream comparisons against
    * `to_timestamp(...)` literals keep working unchanged.
    */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType => df.withColumn(f.name, col(f.name).cast("timestamp"))
        case _ => df
      }
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** Raw events with `ts` normalized to epoch-NANOSECONDS LONG — the
    * library-wide contract every events consumer is written against.
    * Fixture generations have shipped `ts` both as parquet
    * TIMESTAMP(NANOS) (reads as LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which all entry
    * points set) and as TIMESTAMP(MICROS) (reads as a timestamp; the
    * r6 regeneration); both land on the same ns-long column here.
    * `unix_micros` is exact integer µs — no double rounding — and
    * `* 1000` stays far below Long overflow for any realistic epoch.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
  }

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
  /** Spread an under-parallelized scan across the cluster before
    * compute-heavy per-row work (shingling, minhash, simhash, vector
    * math). Parquet splits files at `maxPartitionBytes` boundaries but
    * never below one split per file, so a table stored as few small
    * files scans into fewer partitions than cores and every downstream
    * narrow stage runs on a fraction of the cluster — the per-row cost
    * of the text/embedding operators is exactly where that hurts
    * (measured: ngram_jaccard's fused-md5 minhash banding ran 1 task
    * wide at sf0.1). At 100 TB the table has thousands of splits and
    * this is a no-op; the condition is the scan's actual partition
    * count, not a size guess. The round-robin exchange it inserts
    * moves each row once — trivially cheaper than serializing the
    * per-row compute above it.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= cores) df else df.repartition(cores)
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "embeddings"))
}

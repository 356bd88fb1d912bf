package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join machinery: salting for skewed keys and bucketed
  * co-located joins. These are the levers a 100 TB deployment pulls
  * when AQE's automatic skew handling isn't enough (extreme hot keys)
  * or when a join key is stable enough to pre-bucket at write time
  * (the edges table on `src`, the blocks table on `id`).
  */
object Scale {

  /** Salted equi-join for a skewed LEFT side: the hot side's rows get a
    * random-but-deterministic salt in [0, saltFactor); the small side is
    * replicated saltFactor× with every salt value; joining on
    * (key, salt) splits each hot key into saltFactor partitions.
    * Result equals `large.join(small, key)` exactly.
    *
    * Deterministic salt (hash of the whole row, not rand()) keeps
    * reruns and speculative retries consistent.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val replicated = small.crossJoin(
      small.sparkSession.range(saltFactor).select(col("id").as("__salt")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame bucketed by a join key. Bucketed tables joined on
    * their bucket key skip the shuffle entirely (co-located join) —
    * the persistent-table analogue of the reference's sorted SSTable
    * layout. Requires a table (saveAsTable), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** The edges table in its scale layout: TWO bucketed copies, one by
    * `src` and one by `dst` — the reference's bidirectional edge index
    * (`graph_edge_index.zig:111-144`) re-expressed as storage layout,
    * so outgoing AND incoming traversal joins are both co-located.
    */
  def writeEdgeIndex(edges: DataFrame, baseName: String,
                     numBuckets: Int = 32): Unit = {
    writeBucketed(edges, s"${baseName}_by_src", "src", numBuckets)
    writeBucketed(edges, s"${baseName}_by_dst", "dst", numBuckets)
  }

  /** Blocks/edges at rest, partitioned by `workspace`: (a) every
    * workspace-scoped query prunes to its partition at the file level;
    * (b) `sync_codebase` becomes a DYNAMIC partition overwrite that
    * rewrites exactly the synced workspace's directory and nothing else
    * — the at-rest form of [[graft.ingest.Workspace.sync]]'s
    * filter-and-union (reference `manager.zig:249-377`), minus the full
    * table rewrite.
    */
  def writeWorkspacePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("workspace")
      .parquet(path)

  /** Z-order (Morton) key over two non-negative dimensions, `bits` bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure codegen'd bit arithmetic (a 2·bits-term OR tree — no UDF).
    *
    * Why it matters at 100 TB: parquet row-group min/max stats prune
    * scans only along the SORT order. A table sorted by `a` alone skips
    * nothing for predicates on `b`; sorted by the interleaved key, each
    * row group covers a tight rectangle in (a, b) space, so 2-D
    * predicates (user × time, src × dst, key × date) skip on both
    * dimensions — the standard lakehouse layout trick, here as a plain
    * column the writer can `orderBy` before writing.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The matching DuckDB expression, generated from the SAME bit
    * positions so oracle SQL replays [[zValue]] exactly.
    */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Write `df` z-ordered on two dimensions: one global range sort by
    * the interleaved key (Spark's sort stage samples ranges — no
    * single-task funnel), then parquet with per-row-group stats that
    * now bound tight (a, b) rectangles.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    bits: Int = 16): Unit =
    df.orderBy(zValue(col(a), col(b), bits)).write.mode("overwrite").parquet(path)

  /** Exact per-group top-k via the native bounded-heap aggregate
    * (`topk_by`, [[graft.expressions.TopKBy]]; requires
    * `graft.GraftExtensions` on the session): the k best `itemCol`
    * values per group by `scoreCol` DESC (ties: item ASC), exploded
    * back to one ranked row per kept item.
    *
    * This is the shuffle-bounded alternative to
    * `row_number() OVER (PARTITION BY group ORDER BY score DESC) <= k`:
    * the window form exchanges EVERY row and sorts per group
    * (WindowGroupLimit prunes per map task, but the pruned set still
    * carries full row payloads through a sort); the aggregate form
    * ships at most k (score, item) pairs per group per map partition —
    * at 10⁹ rows per group the exchange is k-sized, not 10⁹-sized.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], itemCol: String,
                   score: Column, k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("topk_by", col(itemCol), score.cast("double"),
        lit(k)).as("__top"))
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("pos", itemCol)): _*)
}

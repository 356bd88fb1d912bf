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

  /** Bloom-filter semi-join reduction — the RUNTIME-FILTER pattern a
    * 100-TB engine applies before every selective fact⋈dim join (what
    * Spark's own `spark.sql.optimizer.runtimeFilter.*` / Bloom join
    * does internally, built here from portable primitives so the
    * DuckDB oracle replays it bit-for-bit): hash the filtered dim keys
    * d ways into an m-bit bitmap (bit positions from the shared
    * [[Sketches.hash32]] with per-hash salts, bitmap words OR-folded
    * by `bit_or` — one partial-agg shuffle of ≤ m/32 rows; 32 bits
    * per BIGINT word keeps every shift below the sign bit, where
    * Spark wraps silently and DuckDB errors), broadcast
    * the word table, and test every fact key map-side with d
    * shift-and-mask probes. A fact row reaches the exact join only if
    * ALL d bits are set — false positives bounded by
    * (1−e^(−dn/m))^d, false NEGATIVES impossible (`n_missed` proves
    * it, replayed by the oracle as 0).
    *
    * Returns ONE stats row quantifying the reduction:
    * (n_fact, n_bloom_pass, n_match, n_false_pos, n_missed).
    *
    * Scale shape: the dim aggregates to a ≤ m/32-row bitmap (tiny by
    * construction — broadcast is free); the fact side is ONE map-only
    * pass (d broadcast hash joins against the word table + the flag
    * join against the distinct dim keys for ground truth) into a 1-row
    * aggregate. The fact table never shuffles.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    mBits: Int = 8192, nHashes: Int = 3): DataFrame = {
    require(mBits % 32 == 0 && mBits > 0, "mBits must be a multiple of 32")
    require(nHashes >= 1 && nHashes <= 8, "nHashes must be 1..8")
    def bitpos(i: Int, key: Column): Column =
      pmod(Sketches.hash32(concat(lit(s"$i:"), key.cast("string"))),
        lit(mBits.toLong))
    val dimKeys = dim.select(col(dimKey).as("dk")).distinct()
    val words = dimKeys
      .select(explode(array((0 until nHashes)
        .map(i => bitpos(i, col("dk"))): _*)).as("bitpos"))
      .select(expr("bitpos div 32").as("word"),
        col("bitpos").cast("int").as("bp"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(1L, bp % 32))").as("bits"))
    val probed0 = fact.select(
      col(factKey).as("key") +:
        (0 until nHashes).map(i => bitpos(i, col(factKey)).as(s"bp$i")): _*)
    val probed = (0 until nHashes).foldLeft(probed0) { (acc, i) =>
      acc.join(broadcast(words.select(col("word").as(s"w$i"),
          col("bits").as(s"bits$i"))),
        expr(s"bp$i div 32") === col(s"w$i"), "left")
    }
    val passed = (0 until nHashes).map(i =>
      expr(s"(shiftright(coalesce(bits$i, 0L), " +
        s"CAST(bp$i % 32 AS INT)) & 1) = 1")).reduceLeft(_ && _)
    probed
      .join(broadcast(dimKeys.withColumn("__hit", lit(1))),
        col("key") === col("dk"), "left")
      .select(passed.as("pass"), col("__hit").isNotNull.as("hit"))
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_match"),
        sum(when(col("pass") && !col("hit"), 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(col("hit") && !col("pass"), 1L).otherwise(0L))
          .as("n_missed"))
  }

  /** DuckDB oracle for [[bloomSemiJoin]], generated from the same
    * (mBits, nHashes) and hash construction. `factTable`/`dimSql` are
    * SQL fragments; `dimSql` must yield one column `dk`.
    */
  def bloomSemiJoinSql(factTable: String, factKeyExpr: String,
                       dimSql: String, mBits: Int = 8192,
                       nHashes: Int = 3): String = {
    def bitposSql(i: Int, keyExpr: String) =
      s"(${Sketches.hash32Sql(s"'$i:' || CAST($keyExpr AS VARCHAR)")} % $mBits)"
    val bpUnion = (0 until nHashes).map(i =>
      s"SELECT ${bitposSql(i, "dk")} AS bitpos FROM dk")
      .mkString(" UNION ALL ")
    val bpCols = (0 until nHashes).map(i =>
      s"${bitposSql(i, factKeyExpr)} AS bp$i").mkString(", ")
    val joins = (0 until nHashes).map(i =>
      s"LEFT JOIN bm b$i ON b$i.word = f.bp$i // 32").mkString(" ")
    val passExpr = (0 until nHashes).map(i =>
      s"((COALESCE(b$i.bits, 0) >> (f.bp$i % 32)) & 1) = 1")
      .mkString("(", " AND ", ")")
    s"""WITH dk AS ($dimSql),
       | bp AS ($bpUnion),
       | bm AS (SELECT bitpos // 32 AS word,
       |   CAST(bit_or(1::BIGINT << (bitpos % 32)) AS BIGINT) AS bits
       |  FROM bp GROUP BY 1),
       | f AS (SELECT $factKeyExpr AS key, $bpCols FROM $factTable),
       | t AS (SELECT $passExpr AS pass,
       |   EXISTS (SELECT 1 FROM dk WHERE dk.dk = f.key) AS hit
       |  FROM f $joins)
       | SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
       |  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bloom_pass,
       |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(SUM(CASE WHEN pass AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_false_pos,
       |  CAST(SUM(CASE WHEN hit AND NOT pass THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_missed
       | FROM t""".stripMargin.replace("\n", " ")
  }
}

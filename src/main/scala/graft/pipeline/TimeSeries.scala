package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins a training-data/analytics pipeline needs that
  * Spark has no first-class operator for: the as-of join and the
  * bounded range (interval) join. Both are built the way the brief's
  * decision path prefers — composed from existing operators in the
  * shape that scales — rather than as nested-loop physical plans.
  *
  * As-of join: the classic "attach the most recent right-side row at or
  * before each left row's timestamp, per key". The naive formulation is
  * a non-equi join (`r.ts <= l.ts` + argmax), which Spark can only
  * execute as a broadcast-nested-loop — quadratic. The scalable shape
  * used here is union-tag-window: tag both sides, union them (a free
  * concatenation — no shuffle), then one hash-partitioned window by key
  * ordered by (ts, side, tiebreak) carrying the right-side payload
  * forward with `last(..., ignoreNulls)`. Exactly ONE shuffle (the
  * window's partitioning), no range explosion, and per-key skew is
  * bounded by the key's own row count. This is also how a 1000-executor
  * cluster wants it: both inputs co-partition on the key once.
  *
  * Range join: "all pairs within `window` of each other, per key". The
  * naive form is again a non-equi self-join. The scalable shape is
  * temporal bucketing: quantize timestamps to `window`-sized buckets;
  * a pair with 0 <= t_b - t_a <= window must land in the same or
  * adjacent bucket, so the LEFT side fans out to (bucket, bucket+1)
  * (factor 2, constant) and the join is a plain equi-join on
  * (key, bucket) that Spark runs as a shuffled hash/sort-merge join.
  * The residual inequality is a cheap post-filter. Work is linear in
  * true pair count + candidate overshoot, never |L|x|R|.
  */
object TimeSeries {

  /** As-of join `left` with `right` on `keyCol`, attaching for each left
    * row the right row with the greatest `tsCol <= left.tsCol` (ties on
    * ts broken toward the greatest `tieCol`). Right payload columns come
    * back as `asof_<name>`, NULL when no right row precedes the left row.
    *
    * `tsCol` must be an integral epoch column (exact ordering; no double
    * rounding), present in both inputs; `tieCol` must be non-null in
    * `right`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns
    // The payload travels as ONE struct, not per-column carries: a
    // per-column last(..., ignoreNulls) would skip a NULL payload VALUE
    // and tear the row (event_id from the latest right row, value from
    // an older one). The struct built from a right row is never null
    // even when its fields are, so ignoreNulls skips exactly the
    // left-side rows and every field comes from the same right row.
    val payStruct = StructType(payloadCols.map(c => right.schema(c)).toArray)
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        lit(null).cast(payStruct).as("__rpay")): _*)
    val rTagged = right.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(tieCol).cast("long").as("__tie"),
          struct(payloadCols.map(col): _*).as("__rpay")): _*)
    // Right rows sort BEFORE left rows at equal ts (side 0 < 1) => the
    // inclusive `r.ts <= l.ts` as-of semantics. coalesce(-1) keeps the
    // sort total on both engines (Spark sorts nulls first, DuckDB last).
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), coalesce(col("__tie"), lit(-1L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__pay", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__pay").getField(c).as(s"asof_$c")): _*)
  }

  /** NEAREST-event join — for each left row, the right row with the
    * minimum |r.ts − l.ts| within the key (the third as-of direction
    * after backward/forward, what sensor alignment and feature joins
    * against sparse signals actually want). Composed from TWO
    * [[asofJoin]] passes — backward as-is, forward by running the same
    * union-tag window over NEGATED timestamps (an order-reversal, so
    * "greatest r.ts ≤ l.ts" becomes "smallest r.ts ≥ l.ts") — then a
    * 1:1 pick of the closer side per left row. Ties: equidistant
    * sides resolve BACKWARD (the earlier right row); equal-ts right
    * rows resolve toward the greatest `tieCol` inside each pass (the
    * asofJoin contract).
    *
    * Scale shape: two key-partitioned window passes over |L|+|R| rows
    * + one 1:1 equi-join on `leftIdCol` — never a non-equi nested
    * loop; the brute-force |L|×|R| argmin formulation stays in the
    * oracle where it belongs.
    *
    * Returns leftCols + `near_<payload>` + `near_dt` (signed
    * near_ts − l.ts; NULL when the key has no right rows).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, tieCol: String, leftIdCol: String,
                  payloadCols: Seq[String]): DataFrame = {
    val pay = (payloadCols :+ tsCol).distinct
    val back = asofJoin(left, right, keyCol, tsCol, tieCol, pay)
    val fwd0 = asofJoin(left.withColumn(tsCol, -col(tsCol)),
      right.withColumn(tsCol, -col(tsCol)), keyCol, tsCol, tieCol, pay)
    val fwd = fwd0.select(col(leftIdCol).as("__lid") +:
      pay.map(c => (if (c == tsCol) -col(s"asof_$c") else col(s"asof_$c"))
        .as(s"__f_$c")): _*)
    val j = back.join(fwd, col(leftIdCol) === col("__lid"), "left")
    val bTs = col(s"asof_$tsCol")
    val fTs = col(s"__f_$tsCol")
    val useF = bTs.isNull ||
      (fTs.isNotNull && (fTs - col(tsCol)) < (col(tsCol) - bTs))
    val nearCols = pay.map(c =>
      when(useF, col(s"__f_$c")).otherwise(col(s"asof_$c")).as(s"near_$c"))
    j.select(left.columns.map(col) ++ nearCols: _*)
      .withColumn("near_dt", col(s"near_$tsCol") - col(tsCol))
  }

  /** Ordered pairs (a, b) sharing `keyCol` with
    * `0 <= b.ts - a.ts <= windowSpan` (ties on ts kept once, with
    * `a.id < b.id`). Returns (key, a_id, b_id, dt) with dt = b.ts - a.ts.
    *
    * Bucketing: `b` must fall in a's bucket or the next one, so `a` fans
    * out x2 and the join is a pure equi-join on (key, bucket) — see the
    * object doc. `tsCol` must be integral (exact `div` bucketing).
    */
  def rangeSelfJoin(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, windowSpan: Long): DataFrame = {
    val base = df.select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("__bucket", expr(s"$tsCol div $windowSpan"))
    val a = base.withColumn("__bk", explode(array(col("__bucket"), col("__bucket") + 1)))
      .select(col(keyCol), col(tsCol).as("__a_ts"), col(idCol).as("a_id"), col("__bk"))
    val b = base
      .select(col(keyCol), col(tsCol).as("__b_ts"), col(idCol).as("b_id"),
        col("__bucket").as("__bk"))
    a.join(b, Seq(keyCol, "__bk"))
      .filter(col("__b_ts") >= col("__a_ts") &&
        col("__b_ts") - col("__a_ts") <= windowSpan &&
        (col("__a_ts") < col("__b_ts") || col("a_id") < col("b_id")))
      .select(col(keyCol), col("a_id"), col("b_id"),
        (col("__b_ts") - col("__a_ts")).as("dt"))
  }

  /** Resample-to-grid with forward-fill — the gap-filling step every
    * time-series feature pipeline needs before a model sees the data
    * (sensors/feeds emit irregularly; training wants a dense regular
    * grid). Per key: quantize `tsCol` (integral epoch) to
    * `bucketSpan`-sized buckets and aggregate observations
    * (`round(sum,4)` — the engine-portable agg convention), then
    * generate the key's full [min_bucket, max_bucket] grid via
    * `sequence` + `explode`, left-join the observations back, and
    * forward-fill misses with the latest preceding observed value
    * (`last(..., ignoreNulls)` over a cumulative window).
    *
    * Returns (key, bucket, v_obs NULLABLE, v_filled, is_gap). Leading
    * buckets before a key's first observation cannot fill — they don't
    * exist here by construction (grid starts at the key's own min).
    *
    * Scale shape: one partial-agg shuffle (bucket agg), one tiny
    * per-key bounds agg, the grid explode is output-sized (no data
    * fan-out), and the fill window re-uses the join's (key) hash
    * partitioning — no extra exchange. Skewed keys are bounded by
    * their own time range, not their event count: the whole pipeline
    * after the first agg is grid-sized, which is why resample-early is
    * the 100-TB shape (a key with 10^9 raw events still contributes
    * only range/span grid rows downstream).
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              bucketSpan: Long): DataFrame = {
    val obs = df
      .select(col(keyCol), expr(s"$tsCol div $bucketSpan").as("bucket"),
        col(valCol))
      .groupBy(keyCol, "bucket")
      .agg(round(sum(valCol), 4).as("v_obs"))
    val grid = obs.groupBy(keyCol)
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), col("v_obs"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v_filled"),
        col("v_obs").isNull.as("is_gap"))
  }

  /** Per-key ordinary-least-squares linear trend — slope and R² of
    * value over time, the closed-form regression every metrics
    * pipeline fits ("is this KPI drifting, and how cleanly"):
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), R² = num² / (den·deny).
    *
    * EXACTNESS is the whole design: x = the time bucket index
    * (integer), y = the value scaled to an integer (per-row round —
    * deterministic), and all five moment sums accumulate in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact 128-bit
    * integers, so the sums are partition-order-independent where a
    * double Σxy would drift, and the closed-form numerator /
    * denominator are exact integers too. The ONLY floats are the two
    * final divisions from exact operands (round-to-nearest conversion
    * is identical in both engines), rounded to 6.
    *
    * Scale shape: one map-only projection + ONE partial-agg shuffle of
    * 7 exact counters per key — the textbook mergeable-moments form; a
    * key with 10^9 events still ships 7 numbers per map partition.
    *
    * Returns (key, n, slope, r2): slope in scaled-y units per bucket.
    */
  def linearTrend(df: DataFrame, keyCol: String, tsUsCol: String,
                  valCol: String, bucketUs: Long = 3600000000L,
                  valScale: Long = 10000L): DataFrame = {
    val dec = "decimal(38,0)"
    val a = momentSums(df, keyCol, tsUsCol, valCol, bucketUs, valScale)
    val nD = col("n").cast(dec)
    val m = a.select(col(keyCol), col("n"),
      (nD * col("sxy") - col("sx") * col("sy")).as("num"),
      (nD * col("sxx") - col("sx") * col("sx")).as("den"),
      (nD * col("syy") - col("sy") * col("sy")).as("deny"))
    m.select(col(keyCol), col("n"),
      when(col("den") === 0, 0.0)
        .otherwise(round(col("num").cast("double") /
          col("den").cast("double"), 6)).as("slope"),
      when(col("den") === 0 || col("deny") === 0, 0.0)
        .otherwise(round((col("num").cast("double") *
          col("num").cast("double")) /
          (col("den").cast("double") * col("deny").cast("double")), 6))
        .as("r2"))
  }

  /** The five exact 128-bit moment sums behind [[linearTrend]],
    * exposed separately because they are the STREAMING-NATIVE form:
    * the same mergeability that makes them partial-agg combinable in
    * batch makes them incrementally updatable by Structured
    * Streaming's aggregation state — apply this to a streaming frame
    * (update/complete mode) and derive slope/R² from the live
    * counters downstream (`TrendStreamSpec` pins stream ≡ batch).
    * Returns (key, n, sx, sy, sxy, sxx, syy).
    */
  def momentSums(df: DataFrame, keyCol: String, tsUsCol: String,
                 valCol: String, bucketUs: Long = 3600000000L,
                 valScale: Long = 10000L): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(col(keyCol),
        expr(s"$tsUsCol div ${bucketUs}L").as("x"),
        round(col(valCol) * valScale, 0).cast("long").as("y"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x").cast(dec) * col("y").cast(dec))).as("sxy"),
        sum((col("x").cast(dec) * col("x").cast(dec))).as("sxx"),
        sum((col("y").cast(dec) * col("y").cast(dec))).as("syy"))
  }

  /** DuckDB oracle for [[linearTrend]] over `events`, generated from
    * the same (bucketUs, valScale); HUGEINT plays DECIMAL(38,0).
    */
  def linearTrendSql(keyExpr: String, bucketUs: Long = 3600000000L,
                     valScale: Long = 10000L): String =
    s"""WITH p AS (SELECT $keyExpr AS k,
       |   epoch_us(ts) // $bucketUs AS x,
       |   CAST(round(value * $valScale) AS BIGINT) AS y FROM events),
       | a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
       |   SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |   SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
       |   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
       |   SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
       |  FROM p GROUP BY 1),
       | m AS (SELECT k, n, CAST(n AS HUGEINT) * sxy - sx * sy AS num,
       |   CAST(n AS HUGEINT) * sxx - sx * sx AS den,
       |   CAST(n AS HUGEINT) * syy - sy * sy AS deny FROM a)
       | SELECT k AS event_type, n,
       |  CASE WHEN den = 0 THEN CAST(0.0 AS DOUBLE)
       |   ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END
       |   AS slope,
       |  CASE WHEN den = 0 OR deny = 0 THEN CAST(0.0 AS DOUBLE)
       |   ELSE round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) /
       |    (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6) END AS r2
       | FROM m ORDER BY event_type""".stripMargin.replace("\n", " ")
}

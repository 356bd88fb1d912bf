package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-portable distinct-count sketching.
  *
  * Spark's own sketch aggregates (`approx_count_distinct` = HLL++,
  * `approx_percentile` = KLL) are the production path at 100 TB — but
  * their binary sketch state is engine-internal, so the entries using
  * them can only get the driver's weaker rows-only check
  * (`events_sketch_stats`). This module implements the classic KMV
  * (k-minimum-values) distinct sketch [Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"] from pure portable
  * primitives — md5, substring, integer arithmetic — so the SAME
  * estimator replays bit-for-bit in DuckDB: the sketch family gets a
  * real value-level oracle, not just a row count.
  *
  * Estimator: hash every value uniformly into (0, 2^32]; keep the k
  * smallest DISTINCT hashes per group. If a group holds fewer than k
  * distinct hashes the estimate is exact (= that count); otherwise
  * E = (k-1) / r_k with r_k = kth-smallest-hash / 2^32 — the classic
  * unbiased KMV estimate.
  *
  * Scale shape: one (group, hash) distinct shuffle (partial-agg
  * combinable), then the per-group k smallest via a rank-limit window —
  * Spark plans `row_number <= k` as WindowGroupLimit per-partition
  * k-heaps, so no group is ever fully sorted and per-group state is
  * O(k). KMV state is trivially mergeable (union two sketches, keep the
  * k smallest), which is what makes it a sketch and not a sample.
  */
object Sketches {

  /** Portable 32-bit hash in [1, 2^32]: the first 8 hex digits of
    * md5(value-as-string), parsed as an integer, plus one (avoids a
    * zero divisor in the estimate; identical shift on both engines).
    * Spark side uses `conv` (codegen'd hex parse).
    */
  def hash32(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 8), 16, 10).cast("long") + lit(1L)

  /** The same hash in DuckDB SQL, generated from the same constants:
    * instr on the hex alphabet per digit (DuckDB has no hex-parse
    * function; instr('0123456789abcdef', d) - 1 is the digit value).
    */
  def hash32Sql(expr: String): String = {
    val terms = (1 to 8).map { p =>
      val pow = 1L << (4 * (8 - p)) // 16^(8-p)
      s"(instr('0123456789abcdef', substr(md5(CAST($expr AS VARCHAR)), $p, 1)) - 1) * $pow"
    }
    s"(${terms.mkString(" + ")} + 1)"
  }

  /** KMV distinct-count estimate of `valCol` per `groupCols`.
    * Returns (groupCols..., est_distinct DOUBLE rounded to 4).
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val gs = groupCols.map(col)
    val d = df.select(gs :+ hash32(col(valCol)).as("hv"): _*).distinct()
    val w = Window.partitionBy(gs: _*).orderBy(col("hv"))
    // rank-limit → WindowGroupLimit per-partition k-heaps
    val kept = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    kept.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rn") === k, col("hv"))).as("kth"))
      .select(gs :+
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * 4294967296.0) / col("kth"), 4))
          .as("est_distinct"): _*)
  }

  /** DuckDB oracle for [[kmvDistinct]] over a table, generated from the
    * same k. `groupCols`/`valExpr` are SQL fragments.
    */
  def kmvDistinctSql(table: String, groupCols: Seq[String], valExpr: String,
                     k: Int = 64): String = {
    val g = groupCols.mkString(", ")
    s"""WITH d AS (SELECT DISTINCT $g, ${hash32Sql(valExpr)} AS hv FROM $table),
       | r AS (SELECT $g, hv, row_number() OVER (PARTITION BY $g ORDER BY hv) AS rn
       |   FROM d),
       | s AS (SELECT $g, COUNT(*) AS n_kept,
       |   MAX(CASE WHEN rn = $k THEN hv END) AS kth
       |  FROM r WHERE rn <= $k GROUP BY $g)
       | SELECT $g, CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |  ELSE round(${(k - 1).toDouble * 4294967296.0} / kth, 4) END AS est_distinct
       | FROM s ORDER BY $g"""
      .stripMargin.replace("\n", " ")
  }

  /** Histogram-sketch quantiles: estimate per-group quantiles of
    * `valCol` from fixed-width bin counts with linear interpolation
    * inside the target bin — the mergeable quantile shape (bin counts
    * add across partitions; one partial-agg shuffle of (group, bin),
    * never a per-group value buffer like exact `percentile`). The
    * portable, exactly-reproducible counterpart of `approx_percentile`
    * (KLL), the same way [[kmvDistinct]] twins
    * `approx_count_distinct`.
    *
    * Estimate for quantile q over bins of width w: with pos = q·(n−1)
    * (the same rank convention as interpolated percentiles), find the
    * bin where the cumulative count first exceeds pos; estimate =
    * bin_lo + w · (pos − cum_before) / bin_count. Exact integer bin
    * counts + one double interpolation, rounded — bit-reproducible.
    *
    * Returns (groupCols..., q_<label> DOUBLE ...) per quantile.
    */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valCol: String,
                    binWidth: Double, qs: Seq[Double] = Seq(0.5, 0.9, 0.99))
  : DataFrame = {
    val gs = groupCols.map(col)
    val bins = df
      .groupBy(gs :+ floor(col(valCol) / binWidth).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(gs: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bins
      .withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(gs: _*)))
    val qCols = qs.map { q =>
      // the target bin: cb <= pos < cb + c  (pos = q·(n−1))
      val pos = lit(q) * (col("n") - 1).cast("double")
      val inBin = pos >= col("cb").cast("double") &&
        pos < (col("cb") + col("c")).cast("double")
      val est = col("bin").cast("double") * binWidth +
        lit(binWidth) * (pos - col("cb").cast("double")) / col("c").cast("double")
      // exactly one bin satisfies inBin per group (cum counts partition
      // [0, n); pos < n−1+1) → max picks it
      round(max(when(inBin, est)), 4).as(s"p${(q * 100).round}")
    }
    cum.groupBy(gs: _*).agg(qCols.head, qCols.tail: _*)
  }

  /** Count-min sketch frequency estimates: d independent hash rows of
    * w counters each; a value's estimate is the MINIMUM of its d
    * counters — always ≥ the true count, within εN with probability
    * 1−δ for w = e/ε, d = ln(1/δ) [Cormode & Muthukrishnan 2005]. The
    * frequency member of the portable sketch family ([[kmvDistinct]] =
    * distinct, [[histQuantiles]] = quantiles): counters are pure
    * (row, col) partial-agg counts — mergeable by addition, one
    * shuffle of d·N cells compacted map-side to ≤ d·w per partition —
    * and the d·w counter table broadcasts into the estimate join.
    *
    * Returns (val STRING, est_count LONG) per distinct value.
    */
  def cmsCounts(df: DataFrame, valCol: String, d: Int = 4,
                w: Int = 256): DataFrame = {
    val v = col(valCol).cast("string")
    def cell(i: Int, c: Column) =
      pmod(hash32(concat(lit(s"$i:"), c)), lit(w.toLong))
    val cells = (0 until d).map(i =>
      df.select(lit(i).as("row"), cell(i, v).as("col"))).reduce(_ union _)
    val counters = cells.groupBy("row", "col").agg(count(lit(1)).as("c"))
    val vals = df.select(v.as("val")).distinct()
      .select(col("val") +:
        (0 until d).map(i => cell(i, col("val")).as(s"k$i")): _*)
    val joined = (0 until d).foldLeft(vals) { (acc, i) =>
      acc.join(broadcast(counters.filter(col("row") === i)
        .select(col("col").as(s"k$i"), col("c").as(s"n$i"))), Seq(s"k$i"))
    }
    joined.select(col("val"),
      least((0 until d).map(i => col(s"n$i")): _*).as("est_count"))
  }

  /** DuckDB oracle for [[cmsCounts]], generated from the same (d, w)
    * and hash construction.
    */
  def cmsCountsSql(table: String, valExpr: String, d: Int = 4,
                   w: Int = 256): String = {
    // the same salted-hash cell for any value expression (ve must
    // already be VARCHAR); CAST inside hash32Sql is then a no-op, same
    // as the Spark side's cast of an already-string concat
    def cellSql(i: Int, ve: String) = s"(${hash32Sql(s"'$i:' || $ve")} % $w)"
    val src = s"CAST($valExpr AS VARCHAR)"
    val cellsUnion = (0 until d).map(i =>
      s"SELECT $i AS row, ${cellSql(i, src)} AS col FROM $table")
      .mkString(" UNION ALL ")
    val joins = (0 until d).map(i =>
      s"JOIN cnt c$i ON c$i.row = $i AND c$i.col = ${cellSql(i, "v.val")}")
      .mkString(" ")
    val leastExpr = (0 until d).map(i => s"c$i.c").mkString("LEAST(", ", ", ")")
    s"""WITH cells AS ($cellsUnion),
       | cnt AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS c
       |   FROM cells GROUP BY row, col),
       | vals AS (SELECT DISTINCT $src AS val FROM $table)
       | SELECT v.val, $leastExpr AS est_count
       | FROM vals v $joins ORDER BY val"""
      .stripMargin.replace("\n", " ")
  }

  /** HyperLogLog distinct-count estimate [Flajolet et al. 2007] from
    * the same portable hash32 — the register-based member of the
    * sketch family, twinning Spark's own `approx_count_distinct`
    * (HLL++) with a bit-reproducible construction: bucket = low `p`
    * bits of the hash, rho = 1 + leading-zero count of the remaining
    * (32−p)-bit word (an UNROLLED integer threshold chain — no
    * float log2, whose ulp at exact powers of two would diverge
    * across engines), register = max rho per bucket. The register
    * table is the sketch: m = 2^p integers, mergeable by element-wise
    * max — the map-side-combinable property, same as KMV's k-smallest.
    *
    * The harmonic-mean denominator Σ 2^(−M[j]) is computed as the
    * INTEGER Σ 2^(40−M[j]) (absent buckets contribute 2^40 each):
    * every term is an exact power of two and the sum fits well inside
    * 2^53, so the fold is order-independent — the same trick the
    * fixed-point PageRank uses. The only floats are the final
    * constant/T division and the small-range linear-counting branch
    * m·ln(m/V) (one `ln` + round(4), the tfidf convention).
    *
    * Scale shape: one (group, bucket) partial-agg shuffle — at most
    * m rows per group survive the map side — then an O(m)-per-group
    * fold. No distinct-set materialization at all, which is exactly
    * why HLL (not KMV) is what production engines run at 100 TB.
    *
    * Returns (groupCols..., est_distinct DOUBLE rounded to 4).
    */
  /** The HLL REGISTER table (group, bucket, mreg = max rho) — the
    * sketch state itself, split out because it is the
    * STREAMING-NATIVE level: one plain aggregation whose max-fold
    * Structured Streaming updates incrementally (`SketchesSpec` pins
    * stream ≡ batch); [[hllDistinct]] folds it into the estimate.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valCol: String,
                   p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 12, "HLL precision p must be 4..12")
    val m = 1 << p
    val wBits = 32 - p
    val gs = groupCols.map(col)
    val hv = hash32(col(valCol)) - 1L // [0, 2^32)
    val wCol = expr(s"hv div ${m.toLong}L") // the (32-p)-bit rho word
    // rho = wBits - bitlen(w) + 1, bitlen by integer thresholds; the
    // fold builds OUTWARD so the largest threshold is checked first
    val rho = (0 until wBits).foldLeft(lit(wBits + 1)) { (acc, b) =>
      when(wCol >= lit(1L << b), lit(wBits - b)).otherwise(acc)
    }
    df.select(gs :+ hv.as("hv"): _*)
      .withColumn("bucket", col("hv") % m.toLong)
      .withColumn("rho", rho)
      .groupBy(gs :+ col("bucket"): _*)
      .agg(max(col("rho")).as("mreg"))
  }

  def hllDistinct(df: DataFrame, groupCols: Seq[String], valCol: String,
                  p: Int = 6): DataFrame = {
    val m = 1 << p
    val gs = groupCols.map(col)
    val regs = hllRegisters(df, groupCols, valCol, p)
    // driver-computed double constants, injected via toString into both
    // engines (round-trip exact): alpha_m·m²·2^40
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val c = alpha * m * m * 1099511627776.0 // ·2^40
    val agg = regs.groupBy(gs: _*)
      .agg(count(lit(1)).as("present"),
        sum(expr("shiftleft(1L, 40 - mreg)")).as("t_present"))
      .withColumn("t", col("t_present") +
        (lit(m.toLong) - col("present")) * lit(1099511627776L))
      .withColumn("v", lit(m.toLong) - col("present"))
      .withColumn("e_raw", lit(c) / col("t").cast("double"))
    agg.select(gs :+
      round(when(col("v") > 0L && col("e_raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
        .otherwise(col("e_raw")), 4).as("est_distinct"): _*)
  }

  /** DuckDB oracle for [[hllDistinct]], generated from the same p and
    * hash/threshold construction.
    */
  def hllDistinctSql(table: String, groupCols: Seq[String], valExpr: String,
                     p: Int = 6): String = {
    val m = 1 << p
    val wBits = 32 - p
    val g = groupCols.mkString(", ")
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val c = alpha * m * m * 1099511627776.0
    // the same unrolled integer threshold chain for rho
    val rhoCase = (wBits - 1 to 0 by -1).map { b =>
      s"WHEN w >= ${1L << b} THEN ${wBits - b}"
    }.mkString("CASE ", " ", s" ELSE ${wBits + 1} END")
    s"""WITH h AS (SELECT $g, ${hash32Sql(valExpr)} - 1 AS hv FROM $table),
       | b AS (SELECT $g, hv % $m AS bucket, hv // $m AS w FROM h),
       | r AS (SELECT $g, bucket, MAX($rhoCase) AS mreg
       |   FROM b GROUP BY $g, bucket),
       | a AS (SELECT $g, CAST(COUNT(*) AS BIGINT) AS present,
       |   CAST(SUM(1::BIGINT << (40 - mreg)) AS BIGINT) AS t_present
       |  FROM r GROUP BY $g),
       | e AS (SELECT $g, $m - present AS v,
       |   CAST($c AS DOUBLE) / CAST(t_present + ($m - present) *
       |     1099511627776 AS DOUBLE) AS e_raw FROM a)
       | SELECT $g, round(CASE WHEN v > 0 AND e_raw <= CAST(${2.5 * m} AS DOUBLE)
       |   THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / v)
       |   ELSE e_raw END, 4) AS est_distinct
       | FROM e ORDER BY $g"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for [[histQuantiles]], generated from the same bin
    * width and quantile list.
    */
  def histQuantilesSql(table: String, groupCols: Seq[String], valExpr: String,
                       binWidth: Double,
                       qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): String = {
    val g = groupCols.mkString(", ")
    val qSel = qs.map { q =>
      val pos = s"(CAST($q AS DOUBLE) * (n - 1))"
      s"round(MAX(CASE WHEN $pos >= cb AND $pos < cb + c THEN " +
        s"bin * CAST($binWidth AS DOUBLE) + CAST($binWidth AS DOUBLE) * " +
        s"($pos - cb) / c END), 4) AS p${(q * 100).round}"
    }.mkString(", ")
    s"""WITH bins AS (SELECT $g,
       |  CAST(floor($valExpr / CAST($binWidth AS DOUBLE)) AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS c FROM $table GROUP BY $g, bin),
       | cum AS (SELECT $g, bin, c,
       |  CAST(COALESCE(SUM(c) OVER (PARTITION BY $g ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) AS cb,
       |  CAST(SUM(c) OVER (PARTITION BY $g) AS DOUBLE) AS n FROM bins)
       | SELECT $g, $qSel FROM cum GROUP BY $g ORDER BY $g"""
      .stripMargin.replace("\n", " ")
  }
}

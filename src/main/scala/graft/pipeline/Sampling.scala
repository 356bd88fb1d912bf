package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation. Random sampling
  * (`df.sample`) is useless for a reproducible training mix — re-running
  * the pipeline must select the SAME documents, on any cluster, with any
  * partitioning. So sampling here is a pure function of the row id: a
  * multiplicative (Knuth) hash maps the id to a pseudo-uniform bucket in
  * [0, 100), and a row is kept iff its bucket is below the stratum's
  * configured percentage. That makes samples stable, composable
  * (a 10% sample is a subset of the 20% sample), and embarrassingly
  * parallel — a projection + filter, no shuffle, fully pushdown-friendly.
  *
  * The hash is `((id mod 1000003) * 2654435761) mod 2^32 mod 100`:
  * Fibonacci-hash multiplier, a prime pre-modulus so the product stays
  * well inside 63 bits (DuckDB BIGINT arithmetic is overflow-checked, so
  * the oracle runs the identical expression), and 1000003 strata are
  * ample resolution for percentage-level sampling.
  */
object Sampling {

  /** Pseudo-uniform bucket in [0, 100) as a pure column expression —
    * the literal twin of [[hashBucketSql]]. abs() after the inner
    * modulus keeps the bucket in [0, 100) for NEGATIVE ids too (both
    * engines' `%` follows the dividend's sign; without abs a negative
    * id would get a negative bucket, silently passing every
    * `bucket < pct` gate and landing in the first split).
    */
  def hashBucket(id: Column): Column =
    (abs(id % 1000003L) * 2654435761L) % 4294967296L % 100

  /** The same bucket in DuckDB SQL (identical arithmetic). */
  def hashBucketSql(idExpr: String): String =
    s"((abs($idExpr % 1000003) * 2654435761) % 4294967296) % 100"

  /** Deterministic train/validation/test assignment: the bucket is cut
    * by cumulative percentage thresholds, so every row lands in exactly
    * one named split, stable across runs and clusters. `splits` are
    * (name, pct) with pcts summing to <= 100; rows past the last
    * threshold get the final split name (the conventional "rest is
    * train" layout puts the largest split last).
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Int)]): DataFrame = {
    val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    require(cuts.last <= 100, "split percentages must sum to <= 100")
    val b = hashBucket(col(idCol))
    val expr = splits.map(_._1).zip(cuts).init.foldRight(
      lit(splits.last._1): Column) { case ((name, cut), elseCol) =>
      when(b < cut, lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", expr)
  }

  /** Full-resolution deterministic order key in [0, 2^32) — the same
    * multiplicative hash as [[hashBucket]] without the final %100, for
    * orderings where 100 buckets would tie too often.
    */
  def hashOrder(id: Column): Column =
    (abs(id % 1000003L) * 2654435761L) % 4294967296L

  def hashOrderSql(idExpr: String): String =
    s"((abs($idExpr % 1000003) * 2654435761) % 4294967296)"

  /** Deterministic GLOBAL corpus shuffle — the training-order
    * permutation every run must reproduce exactly: position =
    * contiguous 1..N rank in ([[hashOrder]], id) order (the hash is the
    * pseudo-random key, the id breaks hash ties totally). Assigned
    * DISTRIBUTED — range-repartition on the order key, per-partition
    * row_number in parallel, cumulative per-partition offsets (≈
    * shuffle-width counts, metadata not data) broadcast back — the
    * same two-job shape as the MVCC write path's id rank; a global
    * `Window.orderBy` would funnel 100 TB through one task for the
    * identical assignment. Emitting (id, pos) instead of sorted rows
    * keeps the output a metadata-sized permutation table: the trainer
    * (or a bucketed write) joins it back and range-partitions on pos.
    */
  def globalShuffle(df: DataFrame, idCol: String): DataFrame =
    globalRankBy(df.select(col(idCol), hashOrder(col(idCol)).as("__h")),
      Seq(col("__h"), col(idCol)))._1
      .select(col(idCol), col("pos"))

  /** Global contiguous 1..N rank (`pos`) in `orderCols` order, assigned
    * DISTRIBUTED — range-repartition on the order key, per-partition
    * row_number in parallel, cumulative per-partition offsets (≈
    * shuffle-width counts: metadata, not data) broadcast back. The
    * assignment provably equals the single global `Window.orderBy`
    * that would funnel the corpus through one task; the total row
    * count falls out of the offsets fold for free (second tuple
    * element), so tier/percentile formulas downstream need no extra
    * count job. Shared by [[globalShuffle]], the quality-tier binning
    * ([[graft.pipeline.Similarity.scoreDeciles]] and the text twin),
    * and mirrored by the MVCC write path's id rank.
    *
    * `orderCols` may carry sort directions (`col.desc`); the order
    * must be TOTAL (append a unique id as the last column) or equal
    * rows get an arbitrary-but-stable relative rank.
    */
  def globalRankBy(df: DataFrame,
                   orderCols: Seq[org.apache.spark.sql.Column])
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions max 1
    // localCheckpoint freezes the range partitioning so the counts job
    // and the final plan see the same partition ids
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols: _*)
    val ranked = parted
      .join(broadcast(offsets.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn("pos", col("__off") + row_number().over(w))
      .drop("__pid", "__off")
    (ranked, acc)
  }

  /** Token-budget mixture sampling — the corpus-mixing shape ("take ~N
    * tokens per domain"): within each stratum, documents are ordered by
    * the deterministic hash (a reproducible uniform shuffle) and kept
    * while the stratum's running token total is below `budgetTokens`;
    * the document that crosses the boundary is kept, so every stratum
    * with data reaches its budget. One hash-partitioned window per
    * stratum — strata fill in parallel, nothing global.
    */
  def tokenBudget(df: DataFrame, idCol: String, stratumCol: String,
                  tokensCol: String, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), col(stratumCol), col(tokensCol))
      .withColumn("tokens_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
  }

  /** Mixture resampling to TARGET proportions, with deterministic
    * UPSAMPLING — the data-mixing step of a training run (Dolma/LLaMA
    * style: "the final corpus is w% source A, v% source B, ...", where
    * small high-quality sources are repeated for several epochs and
    * large sources are subsampled). [[stratified]] can only thin; this
    * hits an exact per-source row count from relative weights.
    *
    * Per stratum s with weight w_s (sum W) and `have_s` input rows:
    *   want_s  = (budgetRows * w_s) div W          (exact target)
    *   full_s  = want_s div have_s                 (whole epochs)
    *   frac_s  = want_s mod have_s                 (rows getting 1 extra)
    * Every row is emitted `full_s` times, and the `frac_s` rows ranked
    * first by the deterministic hash order get one more — so the output
    * holds EXACTLY want_s rows of stratum s, stable across runs,
    * clusters, and partitionings. `epoch` (1-based) distinguishes the
    * copies so a downstream shuffle-by-(id, epoch) spreads repeats.
    * Strata absent from `targets` get weight 0 and are dropped.
    *
    * Scale shape: one histogram-sized count agg broadcast back, one
    * per-stratum rank window (hash-partitioned by stratum — same
    * stratum-parallel shape as [[tokenBudget]]; a stratum so large it
    * skews a single window partition is exactly a stratum whose
    * fractional epoch can switch to the [[stratified]] hash-threshold
    * gate, trading exact counts for a map-only plan), and an
    * output-sized `explode(sequence)` — repeats are generated, never
    * joined.
    */
  def mixture(df: DataFrame, idCol: String, stratumCol: String,
              targets: Seq[(String, Int)], budgetRows: Long): DataFrame = {
    val w = targets.map(_._2.toLong).sum
    require(targets.nonEmpty && targets.forall(_._2 >= 0) && w > 0,
      "mixture needs non-negative weights summing > 0")
    val wCol = targets.foldRight(lit(0L): Column) { case ((s, p), e) =>
      when(col(stratumCol) === s, lit(p.toLong)).otherwise(e)
    }
    val have = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("have"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    df.select(col(idCol), col(stratumCol))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .join(broadcast(have), Seq(stratumCol))
      .withColumn("__w", wCol)
      .withColumn("want", expr(s"(${budgetRows}L * __w) div ${w}L"))
      .withColumn("reps", expr("want div have") +
        when(col("rk") <= expr("want % have"), lit(1L)).otherwise(lit(0L)))
      .filter(col("reps") > 0)
      .select(col(idCol), col(stratumCol),
        explode(sequence(lit(1L), col("reps"))).as("epoch"))
  }

  /** Deterministic WEIGHTED sampling without replacement, per stratum
    * (Efraimidis–Spirakis A-Res): each row gets the key
    * `ln(u) / w` with `u = (hashOrder(id)+1) / 2^32` a reproducible
    * uniform in (0, 1] and `w ≥ 1` its weight; the k LARGEST keys per
    * stratum are the sample — provably equivalent to drawing k items
    * without replacement with probability proportional to weight (the
    * classic `u^(1/w)` key, taken through the monotone ln to avoid
    * `pow`). Selection runs on the native bounded-heap `topk_by`
    * aggregate ([[Scale.topKPerGroup]]): map-side k-heaps per stratum,
    * the exchange carries ≤ k rows per stratum per partition — a
    * weighted sample of a 100-TB corpus moves sample-sized data, and
    * reruns on any cluster pick the identical rows. Keys rounded to
    * 10 dp (magnitudes ~1e-5 for document-length weights) so the
    * oracle's `ln` agrees bit-for-bit.
    */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
                     weight: Column, k: Int): DataFrame = {
    val u = (hashOrder(col(idCol)) + 1L).cast("double") / 4294967296.0
    val key = round(log(u) / greatest(weight, lit(1L)).cast("double"), 10)
    Scale.topKPerGroup(df.withColumn("__key", key),
      Seq(stratumCol), idCol, col("__key"), k)
  }

  /** Stratified deterministic sample: keep a row iff
    * `hashBucket(id) < pct(stratum)`. `rates` maps stratum value to the
    * keep-percentage; strata not listed fall back to `defaultPct`.
    * Output keeps the id, stratum, and the bucket for auditability.
    */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    val pct = rates.foldRight(lit(defaultPct): Column) {
      case ((stratum, p), elseCol) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(elseCol)
    }
    df.select(col(idCol), col(stratumCol),
        hashBucket(col(idCol)).as("bucket"), pct.as("keep_pct"))
      .filter(col("bucket") < col("keep_pct"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much its hashed-token distribution looks like a
    * TARGET slice of the corpus, so a later weighted draw shifts the
    * training mixture toward the target domain. Features are token
    * hash buckets (the portable md5-based [[Sketches.hash32]] mod
    * `buckets`); each bucket's weight is the Laplace-smoothed integer
    * ratio (target_count+1)·`scale` div (corpus_count+1) computed in
    * DECIMAL(38,0) (corpus counts at 100 TB exceed what a LONG
    * numerator survives); a document scores the MEAN weight of its
    * tokens. All-integer → the DuckDB oracle replays it hash-exact
    * (DSIR's log-likelihood-ratio form needs floats; the ratio form
    * is the same ordering for unigram features).
    *
    * Scale shape: one corpus-scale explode feeding TWO partial-agg
    * shuffles (bucket histogram — `buckets` rows out; per-doc fold),
    * the bucket-weight table rides a broadcast join. The corpus is
    * never shuffled by anything wider than its own doc keys.
    *
    * Returns (doc_id, n_tokens, importance) for docs with ≥1 token.
    */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, buckets: Int = 256,
                       scale: Long = 1000000L): DataFrame = {
    require(buckets >= 2, "importanceScores needs buckets >= 2")
    val bucketed = df.select(col(idCol).as("doc_id"),
        targetPred.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .select(col("doc_id"), col("is_target"),
        (Sketches.hash32(col("word")) % buckets).as("b"))
    val weights = bucketed.groupBy("b").agg(
        count(lit(1)).as("all_cnt"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_cnt"))
      .select(col("b"),
        expr(s"CAST((tgt_cnt + 1) AS DECIMAL(38,0)) * ${scale}L" +
          " div (all_cnt + 1)").cast("long").as("w"))
    bucketed.join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("ws"))
      .select(col("doc_id"), col("n_tokens"),
        expr("ws div n_tokens").as("importance"))
  }

  /** DuckDB CTE chain for [[importanceScores]] over `documents` —
    * ends with a CTE named `imp(doc_id, n_tokens, importance)` so
    * callers can SELECT from it or compose a draw on top.
    * `targetSql` is the target-slice predicate (e.g. `lang = 'en'`).
    */
  def importanceScoresCtes(targetSql: String, buckets: Int = 256,
                           scale: Long = 1000000L): String =
    s"""tok AS (SELECT doc_id, ($targetSql) AS is_target,
       |  unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    x -> x != '')) AS word FROM documents),
       | bk AS (SELECT doc_id, is_target,
       |  ${Sketches.hash32Sql("word")} % $buckets AS b FROM tok),
       | wt AS (SELECT b,
       |  CAST(CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) + 1 AS HUGEINT)
       |    * $scale // (COUNT(*) + 1) AS BIGINT) AS w
       |  FROM bk GROUP BY b),
       | imp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(w) AS BIGINT) // COUNT(*) AS importance
       |  FROM bk JOIN wt USING (b) GROUP BY doc_id)"""
      .stripMargin.replace("\n", " ")
}

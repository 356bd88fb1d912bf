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
}

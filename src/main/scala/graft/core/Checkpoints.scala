package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage hygiene for checkpoint-driven iterative loops.
  *
  * `localCheckpoint` blocks are released only when the ContextCleaner
  * garbage-collects the RDD's weak reference — which for a fixed-point
  * loop means every round's superseded frame stays in executor storage
  * until some later GC. On one query that's waste; across a suite (or a
  * long-lived 100-TB session) it's eviction churn that makes UNRELATED
  * queries bench their spill behavior instead of their plan (observed:
  * a 2 s query timing 6-40 s mid-suite, back to 2 s isolated).
  *
  * Two tools:
  *  - [[drop]]: loops call it on round t's frame once round t+1 is
  *    materialized — peak storage becomes two frames, not `rounds`.
  *  - [[sweepAnonymous]]: harness mains (Bench/Verify) call it between
  *    queries — unpersists every leftover anonymous RDD (checkpoint
  *    frames, GraphX internals). Dataset-level caches (the memoized
  *    CodeGraph store views, QueryCache entries) carry a plan-derived
  *    name and are left alone.
  */
object Checkpoints {

  /** Unpersist the RDD behind a frame the caller KNOWS is dead (its
    * only consumer was the already-materialized next round). Strict:
    * a no-op unless the analyzed plan is exactly the bare `LogicalRDD`
    * a `localCheckpoint` call produces, so passing a derived/cached/
    * arbitrary DataFrame can never unpersist something still needed.
    *
    * BLOCKING unpersist: a localCheckpoint block is unrecoverable once
    * removed (truncated lineage), so an async removal racing a job that
    * still holds a reference is a silent-corruption hazard — the r5
    * driver run recorded a hash mismatch on exactly the two entries
    * that dropped frames asynchronously mid-loop. Blocking costs
    * microseconds per V-sized frame and makes the release point a
    * happens-before edge instead of a race.
    */
  def drop(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = true)
    case _ => ()
  }

  /** Unpersist every anonymous persistent RDD (checkpoint frames leak
    * `name == null` MapPartitionsRDDs; Dataset caches are named after
    * their plan). Harness use only, BETWEEN queries: unpersisting a
    * checkpointed RDD severs truncated lineage, so this must never run
    * while a query that could re-read such a frame is in flight.
    */
  def sweepAnonymous(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .filter(_.name == null)
      .foreach(_.unpersist(blocking = false))
}

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

  /** Run a checkpoint-driven iterative loop with AQE disabled, restoring
    * the caller's setting afterwards.
    *
    * The loop bodies materialize MANY small fixed-shape frames (V-sized
    * label/rank tables, one per round) whose sizes the loops already
    * reason about explicitly (broadcast-while-small gates, pre-
    * partitioned edge probes). AQE re-plans every one of those
    * materializations per stage — pure serial driver latency that buys
    * nothing on known-small frames, and it compounds by round count
    * (measured at sf0.1, 3-run medians: components 9.3→7.3 s,
    * ppr 9.5→6.1 s, LPA 9.6→5.0 s, topo 5.8→3.1 s just from turning
    * AQE off inside the loop). On a real cluster the trade holds: the
    * re-planning is the same SERIAL driver cost per round, while the
    * coalescing AQE would buy on the tail rounds' near-empty shuffles
    * is bounded by `spark.sql.shuffle.partitions` anyway. One-shot
    * E-scale queries outside the loops keep AQE (skew joins, runtime
    * re-plans — that's where it earns its keep).
    *
    * Session-scoped like any SQL conf: concurrent queries on the SAME
    * session during the loop would also plan without AQE (acceptable
    * for this engine's one-query-at-a-time sessions; documented here).
    */
  def withoutAqe[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  /** Run the ROUND portion of a label-table loop with the shuffle
    * partition count sized from the loop's own table sizes, restoring
    * the session value afterwards.
    *
    * With AQE scoped off ([[withoutAqe]]) the loops lost runtime
    * partition coalescing, and their per-round V-sized shuffles then
    * run at the session's corpus-tuned partition count — mostly-empty
    * tasks whose fixed overhead compounds with round count. Sizing
    * from V recovers what coalescing would have computed, from numbers
    * the loop already materialized (measured at sf0.1, V=186k →
    * 7–10 partitions: components 7.8→5.0 s, pagerank 5.4→3.9 s,
    * MSF 11→6 s medians).
    *
    * TWO inputs, because two shuffle shapes live in these loops: the
    * per-round STATE aggregations are V-bounded (sized at ~25k
    * rows/partition), but each loop's heaviest round also shuffles an
    * edge-scale input (round-1 messages/votes/contraction) that
    * map-side combine only shrinks toward V on SPARSE graphs — on a
    * dense graph a V-only width would funnel an E-scale shuffle
    * through a handful of tasks. `edgeRows` floors the width at
    * ~250k edge-rows/partition (combine earns the 10× allowance), so
    * density scales the width back up. The session value stays the
    * UPPER bound either way — a dense or billion-node graph on a real
    * cluster keeps the corpus-tuned width; this only shrinks, never
    * grows, the count.
    *
    * Session-scoped like any SQL conf (same caveat as [[withoutAqe]]):
    * concurrent queries on the SAME session during the loop would also
    * plan at the tuned width — acceptable for this engine's
    * one-query-at-a-time sessions. Nests (MSF's distributed-CC
    * fallback): the inner scope's `prev` is the outer TUNED value, so
    * nesting can only shrink further and each exit restores its own
    * previous value.
    */
  def withLoopShuffle[T](spark: SparkSession, stateRows: Long,
                         edgeRows: Long = 0L)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val tuned = math.min(prev.toLong,
      math.max(4L, math.max(stateRows / 25000L, edgeRows / 250000L)))
    spark.conf.set(key, tuned.toString)
    try f finally spark.conf.set(key, prev)
  }
}

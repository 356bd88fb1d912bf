package graft.query

import graft.graph.{Direction, EdgeFilter, Traversal, TraversalSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship batch API: a declarative context query —
  * workspace + up to 4 anchors + up to 2 traversal rules + global caps —
  * resolved in three phases (anchors → per-rule traversal → packaging),
  * `src/query/context_query.zig:140-244` and
  * `src/query/context/engine.zig:171-211`.
  *
  * Spark shape: anchors compile to filters on the blocks table (seed id
  * DataFrame), each rule runs the shared BFS operator, results union,
  * dedup to min depth, join back to blocks for packaging, and the global
  * node cap truncates in canonical (depth, id) order. Workspace isolation
  * is enforced the same way the reference does at packaging time
  * (`context/engine.zig:421-435`): a final workspace filter on the
  * packaged blocks.
  */
object ContextQuery {

  /** Anchor variants, `context_query.zig:37-85`. */
  sealed trait Anchor
  final case class ById(id: String) extends Anchor
  final case class ByName(unitType: String, name: String) extends Anchor
  final case class ByFilePath(path: String) extends Anchor

  /** Traversal rule, `context_query.zig:89-136`: ≤8 edge types,
    * depth ≤ 32, nodes ≤ 10000.
    */
  final case class Rule(direction: Direction,
                        edgeFilter: EdgeFilter = EdgeFilter.All,
                        maxDepth: Int = 2,
                        maxNodes: Int = 10000) {
    require(maxDepth >= 1 && maxDepth <= 32, "rule max_depth must be 1..32")
    require(maxNodes >= 1 && maxNodes <= 10000, "rule max_nodes must be 1..10000")
  }

  /** The query spec, `context_query.zig:140-157`. The reference's
    * `timeout_us` is a single-node latency guard; the Spark analogue is a
    * driver-side deadline/job-group cancel, deliberately not part of the
    * logical spec.
    */
  final case class Spec(workspace: String,
                        anchors: Seq[Anchor],
                        rules: Seq[Rule],
                        maxTotalNodes: Int = 1000) {
    require(anchors.nonEmpty && anchors.size <= 4, "1..4 anchors")
    require(rules.size <= 2, "0..2 rules")
    require(maxTotalNodes >= 1 && maxTotalNodes <= 10000)
  }

  /** Static pre-flight cost estimate, `estimate_cost`
    * (`context_query.zig:225-244`), formula mirrored exactly:
    * time_us = anchors·10 + rules·max(rule depth)·5,
    * memory_kb = max_total_nodes·2; `exceeds_limits` rejects over
    * 1 s / 100000 KB (`context_query.zig:247-258`). On Spark the real
    * optimizer is Catalyst CBO/AQE — this estimator exists for API
    * parity and the [[execute]] admission check.
    */
  final case class CostEstimate(timeUs: Long, memoryKb: Long) {
    def acceptable: Boolean = timeUs <= 1000000L && memoryKb <= 100000L
  }

  def estimateCost(spec: Spec): CostEstimate = CostEstimate(
    timeUs = spec.anchors.size * 10L +
      spec.rules.size.toLong *
        spec.rules.map(_.maxDepth.toLong).maxOption.getOrElse(0L) * 5L,
    memoryKb = spec.maxTotalNodes * 2L)

  /** Admission rejection (reference rejects before execution when
    * `estimate_cost().exceeds_limits()`).
    */
  final case class QueryRejected(estimate: CostEstimate)
      extends RuntimeException(
        s"context query rejected by admission control: " +
          s"estimated ${estimate.timeUs} us / ${estimate.memoryKb} KB " +
          "exceeds 1 s / 100000 KB")

  /** Driver-side deadline exceeded (the Spark analogue of the
    * reference's `check_timeout`, `context/engine.zig:96-101`).
    */
  final case class QueryTimeout(timeoutMs: Long)
      extends RuntimeException(s"context query exceeded $timeoutMs ms deadline")

  /** Phase 1 — anchor resolution (`context/engine.zig:214-283`): each
    * anchor yields seed block ids, all workspace-validated.
    */
  def resolveAnchors(blocks: DataFrame, spec: Spec): DataFrame =
    spec.anchors.map {
      case ById(id) =>
        blocks.filter(col("workspace") === spec.workspace && col("id") === id)
          .select("id")
      case ByName(unitType, name) =>
        NameResolver.findByName(blocks, spec.workspace, unitType, name).select("id")
      case ByFilePath(path) =>
        NameResolver.findByFilePath(blocks, spec.workspace, path).select("id")
    }.reduce(_ union _).distinct()

  /** Phases 2+3 — per-rule bounded traversal, union, package. Returns
    * (id, depth, unit_type, unit_id, content) at min depth per node,
    * ordered (depth, id), capped at `maxTotalNodes`. Admission control
    * runs first: an over-budget estimate is rejected before any job is
    * submitted, like the reference (`context_query.zig:247-258`).
    * `admit` is the limit predicate — the reference's `exceeds_limits`
    * thresholds by default, injectable so operators can tighten them.
    */
  def execute(blocks: DataFrame, edges: DataFrame, spec: Spec,
              admit: CostEstimate => Boolean = _.acceptable): DataFrame = {
    val est = estimateCost(spec)
    if (!admit(est)) throw QueryRejected(est)
    val seeds = resolveAnchors(blocks, spec)
    val traversed: DataFrame =
      if (spec.rules.isEmpty) seeds.withColumn("depth", lit(0))
      else spec.rules.map { r =>
        Traversal.bfs(edges, seeds,
          TraversalSpec(r.direction, r.maxDepth, r.maxNodes, r.edgeFilter))
          .select("id", "depth")
      }.reduce(_ union _)
    val merged = traversed.groupBy("id").agg(min("depth").as("depth"))
    merged.join(blocks.filter(col("workspace") === spec.workspace),
        Seq("id"), "inner")
      .select("id", "depth", "unit_type", "unit_id", "content")
      .orderBy(col("depth"), col("id"))
      .limit(spec.maxTotalNodes)
  }

  /** [[execute]] under a wall-clock deadline — the distributed analogue
    * of the reference's per-query `check_timeout`
    * (`context/engine.zig:96-101`): the query materializes inside a
    * dedicated job group on a worker thread; if the deadline passes, the
    * whole group is cancelled (interrupting running tasks) and
    * [[QueryTimeout]] is thrown. On success the returned DataFrame is
    * already materialized (localCheckpoint), so later actions on it
    * cannot outlive the deadline.
    */
  def executeWithDeadline(blocks: DataFrame, edges: DataFrame, spec: Spec,
                          timeoutMs: Long): DataFrame = {
    val sc = blocks.sparkSession.sparkContext
    val group = s"graft-ctx-${java.util.UUID.randomUUID()}"
    val result =
      new java.util.concurrent.atomic.AtomicReference[Either[Throwable, DataFrame]]()
    val done = new java.util.concurrent.CountDownLatch(1)
    val worker = new Thread(() => {
      try {
        sc.setJobGroup(group, "graft context query", interruptOnCancel = true)
        result.set(Right(execute(blocks, edges, spec).localCheckpoint(true)))
      } catch { case e: Throwable => result.set(Left(e)) }
      finally { sc.clearJobGroup(); done.countDown() }
    }, group)
    worker.setDaemon(true)
    worker.start()
    if (!done.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
      sc.cancelJobGroup(group)
      done.await(10, java.util.concurrent.TimeUnit.SECONDS) // let tasks unwind
      throw QueryTimeout(timeoutMs)
    }
    result.get() match {
      case Right(df) => df
      case Left(e) => throw e
    }
  }
}

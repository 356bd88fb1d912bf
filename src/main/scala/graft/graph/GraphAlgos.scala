package graft.graph

import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Heavier graph algorithms: bidirectional meet-in-the-middle search
  * (reference `traverse_bidirectional_search`,
  * `/root/reference/src/query/traversal.zig:802-974`) and strongly
  * connected components. The reference's SCC *delegates to DFS*
  * (`traversal.zig:977-983`) — GraphX gives us the real thing for free,
  * strictly better (SURVEY.md §2.4).
  */
object GraphAlgos {

  /** Meet-in-the-middle reachability between two nodes: expand a
    * forward frontier from `from` and a backward frontier from `to`,
    * each to ceil(maxDepth/2) like the reference, then join on the
    * meeting set. Returns (id, depth_fwd, depth_bwd, dist) for every
    * node on some shortest path realized through a meeting point —
    * each frontier is only O(b^(d/2)) instead of O(b^d), the whole
    * point of the algorithm at scale.
    */
  def bidirectionalSearch(edges: DataFrame, from: String, to: String,
                          maxDepth: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val fwdDepth = (maxDepth + 1) / 2
    val bwdDepth = maxDepth / 2
    // UNCAPPED legs (bfsLoop, not the public 10k-capped bfs): truncating
    // a frontier here would silently drop meeting candidates and report
    // a longer-than-real (or missing) shortest path.
    val fwd = Traversal.bfsLoop(edges, Seq(from).toDF("id"),
        Direction.Outgoing, fwdDepth, Long.MaxValue)
      .select(col("id"), col("depth").as("depth_fwd"))
    // maxDepth = 1 -> bwdDepth = 0: the backward "frontier" is just the
    // target at depth 0 (clamping to a 1-hop BFS would let a->b->c pass
    // a depth-1 search as dist 2)
    val bwd = (
      if (bwdDepth == 0) Seq(to).toDF("id").withColumn("depth", lit(0))
      else Traversal.bfsLoop(edges, Seq(to).toDF("id"),
        Direction.Incoming, bwdDepth, Long.MaxValue)
    ).select(col("id"), col("depth").as("depth_bwd"))
    val meet = fwd.join(bwd, Seq("id"))
      .withColumn("dist", col("depth_fwd") + col("depth_bwd"))
    val best = meet.agg(min("dist").as("dist"))
    meet.join(broadcast(best), Seq("dist"))
      .select("id", "depth_fwd", "depth_bwd", "dist")
  }

  /** Dense-unique (vid, id) mapping for GraphX, shared by every
    * algorithm here. Hands `body` the pinned nodes table and the
    * vid-mapped (s, d) edge RDD. LIFETIME RULE (the reason this helper
    * exists once): the mapping comes from `zipWithUniqueId`, so the
    * body's result must be MATERIALIZED before this returns — after
    * `nodes.unpersist()` a lazy read would recompute the zip and could
    * assign different vids than the graph was built from.
    */
  private def withVidMapping[T](edges: DataFrame, extraIds: Seq[String])(
      body: (DataFrame, org.apache.spark.rdd.RDD[(Long, Long)]) => T): T = {
    val spark = edges.sparkSession
    import spark.implicits._
    val ids0 = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
    val ids = (if (extraIds.isEmpty) ids0 else ids0.union(extraIds.toDF("id")))
      .distinct()
    val nodes = spark.createDataFrame(
        ids.as[String].rdd.zipWithUniqueId().map { case (id, vid) => (vid, id) })
      .toDF("vid", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      nodes.count() // pin the vid assignment before it is used twice
      val mapped = edges
        .join(nodes.select(col("id").as("src"), col("vid").as("s")), Seq("src"))
        .join(nodes.select(col("id").as("dst"), col("vid").as("d")), Seq("dst"))
        .select("s", "d").as[(Long, Long)].rdd
      body(nodes, mapped)
    } finally nodes.unpersist()
  }

  /** BFS as a GraphX Pregel computation — the scale path for VERY deep
    * traversals (SURVEY §7.4): the frontier lives entirely in the
    * vertex RDD across supersteps, so a depth-100 walk does not pay a
    * driver-coordinated job per level like [[Traversal.bfs]]'s loop
    * (which wins for the reference's shallow ≤10-hop queries — see
    * GraphAlgosSpec for the equivalence). Returns the identical
    * (id, min-depth) set.
    */
  def bfsPregel(edges: DataFrame, seeds: Seq[String], maxDepth: Int,
                direction: Direction = Direction.Outgoing): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // extra ids: an isolated seed is still visited at depth 0
    withVidMapping(edges, seeds) { (nodes, mapped) =>
      val seedSet = seeds.toSet
      val vertexRdd = nodes.select("vid", "id").as[(Long, String)].rdd
        .map { case (vid, id) => (vid, if (seedSet(id)) 0 else Int.MaxValue) }
      val edgeRdd = direction match {
        case Direction.Outgoing => mapped.map { case (s, d) => GxEdge(s, d, ()) }
        case Direction.Incoming => mapped.map { case (s, d) => GxEdge(d, s, ()) }
        case Direction.Both => mapped.flatMap { case (s, d) =>
          Seq(GxEdge(s, d, ()), GxEdge(d, s, ())) }
      }
      val g = GxGraph(vertexRdd, edgeRdd, Int.MaxValue)
      val res = g.pregel(Int.MaxValue, maxIterations = maxDepth)(
        (_, attr, msg) => math.min(attr, msg),
        t => if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
               Iterator((t.dstId, t.srcAttr + 1))
             else Iterator.empty,
        math.min)
      res.vertices.filter(_._2 != Int.MaxValue)
        .toDF("vid", "depth")
        .join(nodes, Seq("vid"))
        .select(col("id"), col("depth").cast("int"))
        .localCheckpoint(true) // materialize per the helper's lifetime rule
    }
  }

  /** Strongly connected components via GraphX: every node labelled with
    * the minimum member id of its SCC (deterministic canonical label).
    * Node ids are mapped to GraphX longs via `zipWithUniqueId` — DENSE
    * UNIQUE vids, not hashes: at billions of nodes a 64-bit hash
    * collision is probable (~50% at 2^32 by birthday bound) and would
    * silently merge two vertices; unique assignment removes the failure
    * mode entirely. Edges map to vids through two equi-joins against the
    * (id, vid) table — the same joins a bucketed edge index makes cheap.
    */
  def stronglyConnected(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    withVidMapping(edges, Nil) { (nodes, mapped) =>
      val vertexRdd = nodes.select("vid", "id").as[(Long, String)].rdd
      val edgeRdd = mapped.map { case (s, t) => GxEdge(s, t, ()) }
      val g = GxGraph(vertexRdd, edgeRdd)
      val scc = g.stronglyConnectedComponents(maxIter)
      val compDf = scc.vertices.toDF("vid", "comp_vid")
      // canonical component label = min original id within the component
      val withIds = compDf.join(nodes, Seq("vid")).select("id", "comp_vid")
      val labels = withIds.groupBy("comp_vid").agg(min("id").as("component"))
      withIds.join(labels, Seq("comp_vid")).select("id", "component")
        .localCheckpoint(true) // materialize per the helper's lifetime rule
    }
  }

  /** Single-source shortest path over WEIGHTED edges (src, dst, w) —
    * delta-relaxation Bellman-Ford: each round relaxes only edges out
    * of nodes whose distance improved LAST round, then folds the
    * improvements into the distance table with one full-outer merge.
    * Terminates when a round improves nothing (on a DAG: ≤ longest-path
    * hops rounds; positive-weight cycles also terminate — a cycle can
    * never improve its own entry) or at `maxIters`.
    *
    * Scale shape, same pattern as the topo peeling loop: the delta
    * frontier join probes edges on `src` (reuses a src-partitioned
    * persisted edge layout — no per-round exchange of the edge set);
    * per-round cost is O(edges out of improved nodes), and the merge is
    * one shuffle of the O(V) distance table. `localCheckpoint` per
    * round keeps the cumulative plan flat, and the single `count()` on
    * the delta materializes it — one job per round.
    */
  def ssspWeighted(edges: DataFrame, sourceId: String,
                   maxIters: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
    var dist = Seq((sourceId, 0L)).toDF("id", "dist").localCheckpoint(false)
    var delta = dist
    var improved = 1L
    var it = 0
    while (improved > 0 && it < maxIters) {
      it += 1
      val cand = e
        .join(delta.select(col("id").as("src"), col("dist").as("dsrc")), Seq("src"))
        .select(col("dst").as("id"), (col("dsrc") + col("w")).as("cand"))
        .groupBy("id").agg(min("cand").as("cand"))
      val merged = dist.join(cand, Seq("id"), "full_outer")
        .select(col("id"), col("dist"), col("cand"),
          least(coalesce(col("dist"), lit(Long.MaxValue)),
            coalesce(col("cand"), lit(Long.MaxValue))).as("best"))
        .localCheckpoint(false)
      delta = merged
        .filter(col("cand").isNotNull &&
          (col("dist").isNull || col("cand") < col("dist")))
        .select(col("id"), col("best").as("dist"))
      dist = merged.select(col("id"), col("best").as("dist"))
      improved = delta.count() // materializes this round's checkpoint
    }
    dist
  }

  /** [[ssspWeighted]] + CANONICAL PATH RECONSTRUCTION — the missing
    * half of the reference's traversal surface (`TraversalResult`
    * always carries paths, /root/reference/src/query/traversal.zig:251-320):
    * for every reached node, one deterministic minimum-weight path
    * from the source, as a `->`-joined id string.
    *
    * The predecessor is NOT carried through the relaxation rounds —
    * that would make it a function of round discovery order. Instead
    * it is derived from the CONVERGED distances in one post-pass:
    * pred(v) = min{ u : dist(u) + w(u,v) = dist(v) } (the min-id
    * tight edge), a pure function of (graph, source) that any engine
    * can replay — which is what makes a recursive-CTE oracle
    * possible. Walking preds from v terminates at the source because
    * dist strictly decreases along tight edges (w ≥ 1).
    *
    * Path assembly is POINTER DOUBLING, not a per-hop walk: each
    * round every node's (ancestor, segment) pair jumps through its
    * ancestor's pair, so L-hop paths finish in ⌈log₂ L⌉ rounds of
    * O(V) self-joins — the shape that survives deep graphs at scale
    * where an L-round walk would not.
    *
    * Returns (id, dist, pred, path); pred is null for the source.
    */
  def ssspWithPaths(edges: DataFrame, sourceId: String,
                    maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(false) // reused: relaxation rounds + tight-edge pass
    val dist = ssspWeighted(e, sourceId, maxIters).localCheckpoint(true)
    val pred = e
      .join(dist.select(col("id").as("src"), col("dist").as("du")), Seq("src"))
      .join(dist.select(col("id").as("dst"), col("dist").as("dv")), Seq("dst"))
      .filter(col("du") + col("w") === col("dv"))
      .groupBy(col("dst").as("id")).agg(min(col("src")).as("pred"))
      .localCheckpoint(true)
    var walk = dist.join(pred, Seq("id"), "left")
      .select(col("id"), col("pred").as("anc"), col("id").as("seg"))
      .localCheckpoint(false)
    // ⌈log₂ maxIters⌉ + 1 saturating jumps cover any ≤maxIters-hop path
    val rounds = 32 - java.lang.Integer.numberOfLeadingZeros(
      math.max(1, maxIters)) + 1
    for (_ <- 1 to rounds) {
      val j = walk.select(col("id").as("anc"), col("anc").as("anc2"),
        col("seg").as("seg2"))
      walk = walk.join(j, Seq("anc"), "left")
        .select(col("id"),
          when(col("seg2").isNotNull, col("anc2"))
            .otherwise(col("anc")).as("anc"),
          when(col("seg2").isNotNull,
            concat(col("seg2"), lit("->"), col("seg")))
            .otherwise(col("seg")).as("seg"))
        .localCheckpoint(false)
    }
    dist.join(walk.select(col("id"), col("seg").as("path")), Seq("id"))
      .join(pred, Seq("id"), "left")
      .select(col("id"), col("dist"), col("pred"), col("path"))
  }

  /** Time-respecting reachability over the VERSIONED edge set —
    * earliest-arrival temporal paths (Wu et al., VLDB 2014 shape): a
    * path may only traverse an edge version whose `sequence` is ≥ the
    * arrival sequence at its source, and each node reports the
    * MINIMUM sequence at which any such path reaches it. On a code
    * graph with MVCC history this is provenance/impact analysis —
    * "which entities could a change at sequence S have influenced",
    * the question an as-of snapshot ([[graft.core.Schemas]]
    * `currentViewKeyedAsOf`) cannot answer because influence flows
    * ACROSS versions, not within one.
    *
    * Every non-tombstone edge VERSION is usable at its own sequence
    * (a later rewrite of the same edge is a new influence event;
    * deletions carry no influence — documented choice). Earliest
    * arrivals only decrease and a smaller arrival only ENABLES more
    * edges, so the fixed-hop horizon is oracle-idempotent past the
    * fixpoint like every fixed-round entry.
    *
    * Scale shape per hop: one frontier⋈versions probe on `src` (the
    * stored layout key), one O(V) min-fold; the state is (id,
    * earliest) only. Returns (id, earliest) for reached nodes.
    */
  def temporalReach(versionedEdges: DataFrame, sourceId: String,
                    startSeq: Long = 0L, maxHops: Int = 4): DataFrame = {
    val spark = versionedEdges.sparkSession
    import spark.implicits._
    require(maxHops >= 1 && maxHops <= 30, "maxHops must be 1..30")
    val ev = versionedEdges.filter(!col("is_deleted"))
      .select(col("src"), col("dst"), col("sequence").as("s"))
      .localCheckpoint(false)
    var state = Seq((sourceId, startSeq)).toDF("id", "earliest")
      .localCheckpoint(false)
    for (_ <- 1 to maxHops) {
      val relax = state
        .join(ev.withColumnRenamed("src", "id"), Seq("id"))
        .filter(col("s") >= col("earliest"))
        .select(col("dst").as("id"), col("s").as("earliest"))
      state = state.unionAll(relax)
        .groupBy("id").agg(min("earliest").as("earliest"))
        .localCheckpoint(false)
    }
    state
  }

  /** DuckDB oracle for [[temporalReach]] — the identical hops
    * unrolled (same min-fold, same tombstone exclusion).
    */
  def temporalReachSql(versionedEdgesSql: String, sourceId: String,
                       startSeq: Long = 0L, maxHops: Int = 4): String = {
    val sb = new StringBuilder
    sb ++= s"WITH ve AS ($versionedEdgesSql), "
    sb ++= "ev AS (SELECT src, dst, sequence AS s FROM ve " +
      "WHERE NOT is_deleted), "
    sb ++= s"r0 AS (SELECT '$sourceId' AS id, " +
      s"CAST($startSeq AS BIGINT) AS earliest)"
    for (h <- 1 to maxHops) {
      val p = s"r${h - 1}"
      sb ++= s", r$h AS (SELECT id, MIN(earliest) AS earliest FROM (" +
        s"SELECT id, earliest FROM $p " +
        s"UNION ALL SELECT e.dst, e.s FROM $p r JOIN ev e " +
        s"ON e.src = r.id AND e.s >= r.earliest) GROUP BY id)"
    }
    sb ++= s" SELECT id, earliest FROM r$maxHops ORDER BY id"
    sb.toString
  }
}

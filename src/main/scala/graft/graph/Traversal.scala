package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Direction of a traversal, reference `src/query/traversal.zig:162-173`. */
sealed trait Direction
object Direction {
  case object Outgoing extends Direction
  case object Incoming extends Direction
  case object Both extends Direction
}

/** Edge-type filter, reference `src/query/traversal.zig:196-205`. */
sealed trait EdgeFilter
object EdgeFilter {
  case object All extends EdgeFilter
  final case class Only(t: String) extends EdgeFilter
  final case class Include(ts: Seq[String]) extends EdgeFilter
  final case class Exclude(ts: Seq[String]) extends EdgeFilter
}

/** Bounded k-hop traversal spec, reference `TraversalQuery`
  * (`src/query/traversal.zig:208-248`): defaults depth=10, results=1000,
  * caps depth ≤ 100, results ≤ 10000.
  */
final case class TraversalSpec(
    direction: Direction = Direction.Outgoing,
    maxDepth: Int = 10,
    maxResults: Int = 1000,
    edgeFilter: EdgeFilter = EdgeFilter.All,
    trackPaths: Boolean = false) {
  require(maxDepth >= 1 && maxDepth <= 100, "max_depth must be 1..100")
  require(maxResults >= 1 && maxResults <= 10000, "max_results must be 1..10000")
}

/** Iterative DataFrame BFS — the Spark re-expression of the reference's
  * traversal engine (`src/query/traversal.zig:348-455`). One Spark job per
  * depth level: frontier ⋈ edges → next frontier, anti-join against
  * visited for cycle safety, `localCheckpoint` to keep lineage flat.
  *
  * BFS, DFS and A* in the reference visit the same *set* (A*'s heuristic
  * is stubbed to uniform 1.0, `traversal.zig:1282-1290`; SCC delegates to
  * DFS, `:977-983`) — they differ only in visit order, which matters only
  * under `max_results` truncation. We canonicalize ordering to
  * (depth, id), per SURVEY.md §7.5.
  *
  * Scale notes (100 TB):
  *  - the edge-type filter and direction projection are applied ONCE
  *    before the loop, so every level joins against the smallest possible
  *    edge set, and Parquet dictionary pushdown prunes edge files;
  *  - the frontier is usually tiny relative to edges → broadcast-hash
  *    join. The optimizer cannot see that on its own (localCheckpoint
  *    erases size stats), but the loop knows each frame's EXACT row
  *    count from its per-level count() — it hints broadcast while the
  *    frontier/visited are small and falls back to the shuffled join
  *    past 100k rows (measured on the bench: the hint is the
  *    difference between a per-level sort-merge of the whole edge
  *    table and a map-side hash probe — 2-3x per traversal);
  *  - the edges side never gets re-shuffled when bucketed by join key.
  */
object Traversal {

  private def filterEdges(edges: DataFrame, f: EdgeFilter): DataFrame = f match {
    case EdgeFilter.All => edges
    case EdgeFilter.Only(t) => edges.filter(col("edge_type") === t)
    case EdgeFilter.Include(ts) => edges.filter(col("edge_type").isin(ts: _*))
    case EdgeFilter.Exclude(ts) => edges.filter(!col("edge_type").isin(ts: _*))
  }

  /** Project edges to (from, to) hops honoring direction. Bidirectional =
    * union of both orientations (reference expands both at
    * `traversal.zig:580-622`).
    */
  private def hops(edges: DataFrame, d: Direction): DataFrame = d match {
    case Direction.Outgoing => edges.select(col("src").as("from"), col("dst").as("to"))
    case Direction.Incoming => edges.select(col("dst").as("from"), col("src").as("to"))
    case Direction.Both =>
      edges.select(col("src").as("from"), col("dst").as("to"))
        .union(edges.select(col("dst").as("from"), col("src").as("to")))
  }

  /** BFS from `seeds` (a DataFrame with column `id`).
    *
    * Returns (id, depth[, path]): every node reachable within
    * `spec.maxDepth`, at its minimum depth; the seed itself at depth 0
    * (the reference visits the start node, `traversal.zig:371-383`).
    * With `trackPaths`, `path` is the lexicographically-smallest shortest
    * path from a seed, as ARRAY<STRING> — canonical, unlike the
    * reference's visit-order-dependent path (documented deviation).
    * Result capped at `maxResults` by (depth, id) order.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, spec: TraversalSpec): DataFrame =
    bfsLoop(edges, seeds, spec.direction, spec.maxDepth, spec.maxResults.toLong,
      spec.edgeFilter, spec.trackPaths)

  /** Compat-mode DFS: the reference's exact stack machine
    * (`traversal.zig:458-563` — pop last, skip visited, record, push
    * unvisited neighbors; depth-capped expansion; stop at
    * `max_results`), with one necessary determinization: the reference
    * pushes neighbors in its edge index's APPEND order
    * (`graph_edge_index.zig:put_edge` keeps insertion-ordered lists),
    * which is an ingest-history artifact no re-implementation can
    * reproduce; this engine's stored edge index is sorted, so compat
    * mode defines push order as ascending neighbor id (exploration
    * therefore pops descending — the stack reversal is preserved).
    *
    * Returns (id, depth, visit_rank): depth as first visited (stack
    * depth, NOT minimum depth), visit_rank the preorder position —
    * the ordering [[bfs]]'s canonical (depth, id) set deliberately
    * does not reproduce. Only the order under `maxResults` truncation
    * differs from [[bfs]]; untruncated, the visited SET is identical
    * (spec-pinned).
    *
    * Scale shape: the reachable universe comes from the distributed
    * [[bfs]] (a superset of any visit order's result); only the
    * cap-bounded reachable SUBGRAPH is collected for the sequential
    * replay — ≤ the reference's own 10k-result cap, metadata-scale
    * like the Borůvka driver union-find. Visit order is inherently
    * sequential; the reference pays the same single-threaded walk.
    */
  def dfsStackOrder(edges: DataFrame, seedId: String,
                    spec: TraversalSpec): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val reach = bfs(edges, Seq(seedId).toDF("id"),
      spec.copy(maxResults = 10000, trackPaths = false)).select("id")
      .localCheckpoint(true)
    // The replay's adjacency is only correct if the reachable universe
    // was NOT truncated by the 10k cap (the cap equals the reference's
    // own max_results ceiling, so a legal query can't exceed it — but a
    // caller with a deeper spec could). A capped reach would silently
    // reorder the walk; fail loudly instead.
    val reachN = reach.count()
    require(reachN < 10000,
      s"dfsStackOrder: reachable set hit the 10k cap ($reachN) — " +
        "visit order would be computed over a truncated adjacency")
    val adj = hops(filterEdges(edges, spec.edgeFilter), spec.direction)
      .join(reach.withColumnRenamed("id", "from"), Seq("from"), "left_semi")
      .join(reach.withColumnRenamed("id", "to"), Seq("to"), "left_semi")
      .select("from", "to") // joins move their key first — pin the order
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val visited = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val stack = scala.collection.mutable.ArrayBuffer((seedId, 0))
    while (stack.nonEmpty && out.size < spec.maxResults) {
      val (id, depth) = stack.remove(stack.size - 1)
      if (!visited.contains(id)) {
        visited += id
        out += ((id, depth.toLong, out.size.toLong))
        if (depth < spec.maxDepth)
          adj.getOrElse(id, Array.empty[String]).foreach { nb =>
            if (!visited.contains(nb)) stack += ((nb, depth + 1))
          }
      }
    }
    out.toSeq.toDF("id", "depth", "visit_rank")
  }

  /** Compat-mode A*: the reference's exact priority-queue machine
    * (`traversal.zig:685-798` — pop min f_cost, record, enqueue
    * unvisited neighbors with visited marked AT ENQUEUE,
    * `traversal.zig:1157-1177`), with the same determinization as
    * [[dfsStackOrder]]: neighbors enqueue in ascending-id order (the
    * reference's edge-index append order is an ingest-history
    * artifact).
    *
    * The reference heuristic is a uniform stub
    * (`traversal.zig:1282-1290`: h = 1.0), so f = g + h = depth + 1 —
    * every queue entry's priority is monotone in its depth and the
    * visited-at-enqueue rule makes each node's depth its BFS depth.
    * Pop order is therefore nondecreasing in depth, and the visited
    * SET and depths equal canonical [[bfs]] (spec-pinned); what this
    * twin adds is the exact WITHIN-DEPTH pop order under
    * `max_results` truncation, which is determined by the binary-heap
    * mechanics of Zig's `std.PriorityQueue`: add = append + sift-up
    * (strict less-than, so an equal-priority add stays a leaf — and
    * since a new entry's f is always the max in the queue, adds never
    * sift here); remove = pop root, move LAST element to the root,
    * sift-down choosing the left child on ties and swapping on
    * equality (strict less-than both ways). That sift profile is what
    * makes the tie order non-FIFO — replayed verbatim below.
    *
    * Scale shape: identical to [[dfsStackOrder]] — distributed BFS
    * computes the reachable universe, only the cap-bounded reachable
    * SUBGRAPH is collected for the sequential replay (visit order is
    * inherently sequential; the reference pays the same walk).
    *
    * Returns (id, depth, visit_rank) in pop order.
    */
  def astarHeapOrder(edges: DataFrame, seedId: String,
                     spec: TraversalSpec): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val reach = bfs(edges, Seq(seedId).toDF("id"),
      spec.copy(maxResults = 10000, trackPaths = false)).select("id")
      .localCheckpoint(true)
    val reachN = reach.count()
    require(reachN < 10000,
      s"astarHeapOrder: reachable set hit the 10k cap ($reachN) — " +
        "visit order would be computed over a truncated adjacency")
    val adj = hops(filterEdges(edges, spec.edgeFilter), spec.direction)
      .join(reach.withColumnRenamed("id", "from"), Seq("from"), "left_semi")
      .join(reach.withColumnRenamed("id", "to"), Seq("to"), "left_semi")
      .select("from", "to")
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    // Zig std.PriorityQueue replay. Priorities compare by f = d + 1
    // (monotone in d; the seed's f = 0 is never compared — it pops
    // alone). Swap-in-place sifts are compare-equivalent to the
    // reference's copy-chain form: same comparisons, same final array.
    val heap = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    def less(x: (String, Int), y: (String, Int)): Boolean = x._2 < y._2
    def add(e: (String, Int)): Unit = {
      heap += e
      var i = heap.size - 1
      while (i > 0 && less(heap(i), heap((i - 1) >> 1))) {
        val p = (i - 1) >> 1
        val t = heap(i); heap(i) = heap(p); heap(p) = t
        i = p
      }
    }
    def removeMin(): (String, Int) = {
      val item = heap(0)
      val last = heap.remove(heap.size - 1)
      if (heap.nonEmpty) {
        heap(0) = last
        var idx = 0
        var done = false
        while (!done) {
          val l = idx * 2 + 1
          if (l >= heap.size) done = true
          else {
            val r = l + 1
            val lesser = if (r < heap.size && less(heap(r), heap(l))) r else l
            if (less(heap(idx), heap(lesser))) done = true
            else {
              val t = heap(idx); heap(idx) = heap(lesser); heap(lesser) = t
              idx = lesser
            }
          }
        }
      }
      item
    }
    val visited = scala.collection.mutable.Set(seedId)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    add((seedId, 0))
    while (heap.nonEmpty && out.size < spec.maxResults) {
      val (id, depth) = removeMin()
      out += ((id, depth.toLong, out.size.toLong))
      if (depth < spec.maxDepth)
        adj.getOrElse(id, Array.empty[String]).foreach { nb =>
          if (!visited.contains(nb)) { add((nb, depth + 1)); visited += nb }
        }
    }
    out.toSeq.toDF("id", "depth", "visit_rank")
  }

  /** The loop behind [[bfs]], with the result cap widened to Long so
    * internal callers (the bidirectional-search legs, which must NOT
    * truncate their frontiers — a dropped meeting candidate silently
    * lengthens the reported shortest path) can run uncapped. The public
    * API keeps the reference's 10k cap via [[TraversalSpec]].
    */
  private[graph] def bfsLoop(edges: DataFrame, seeds: DataFrame,
                             direction: Direction, maxDepth: Int,
                             maxResults: Long,
                             edgeFilter: EdgeFilter = EdgeFilter.All,
                             trackPaths: Boolean = false): DataFrame = {
    // If the edges table is already persisted (the normal case: a
    // materialized graph), the hop projection is a cheap in-memory scan
    // per level — re-persisting it would copy the whole table per query.
    val parentCached = edges.storageLevel != StorageLevel.NONE
    val hop0 = hops(filterEdges(edges, edgeFilter), direction)
    val hop = if (parentCached) hop0 else hop0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE job per level: `count()` is the action that materializes the
      // level (an eager localCheckpoint would be a second, separate
      // materialization job — the LAZY variant materializes on the count
      // and still replaces the logical plan with a flat LogicalRDD up
      // front). Lineage truncation here is load-bearing: each level's
      // plan references the previous level twice (frontier join +
      // visited union), so without it the logical tree doubles per level
      // — exponential plan text that OOMs plan rendering near depth 20.
      // Checkpoint blocks are also cleaned by the ContextCleaner once
      // unreferenced, unlike Dataset persist entries which pin the cache
      // manager until an explicit unpersist.
      val seed0 = (
        if (trackPaths)
          seeds.select(col("id"), array(col("id")).as("path"))
        else seeds.select(col("id"))
      ).distinct().withColumn("depth", lit(0))
        .localCheckpoint(false)

      var visited = seed0   // accumulated (id, [path,] depth)
      var frontier = seed0
      var depth = 0
      var total = seed0.count()
      var frontierSize = total
      // localCheckpoint erases size stats, so the optimizer can't pick a
      // broadcast join on its own — but the loop KNOWS each frame's
      // exact row count from the per-level count(). Hint broadcast while
      // the frontier/visited stay small (the overwhelmingly common case:
      // frontiers are tiny next to the edge table); fall back to the
      // shuffled join automatically past the threshold.
      val bcastRows = 100000L
      while (depth < maxDepth && total < maxResults && frontierSize > 0) {
        depth += 1
        // with trackPaths every frontier row carries a path ARRAY of
        // ~depth ids, so a row-count threshold alone under-estimates the
        // broadcast size by a factor of the depth — scale the cap down
        // by the rows' width (the 10 MB byte heuristic the optimizer
        // would have applied is unavailable: checkpoint erased stats)
        val frontierCap = if (trackPaths) bcastRows / (depth + 1) else bcastRows
        val expandFrom =
          if (frontierSize <= frontierCap) broadcast(frontier) else frontier
        val expandedRaw = expandFrom.join(hop, expandFrom("id") === hop("from"))
        val expanded =
          if (trackPaths)
            expandedRaw
              .select(col("to").as("id"), concat(col("path"), array(col("to"))).as("path"))
              // one canonical (lexicographically smallest) path per node
              .groupBy("id").agg(min(col("path")).as("path"))
          else
            expandedRaw.select(col("to").as("id")).distinct()
        val visitedIds0 = visited.select(col("id").as("vid"))
        val visitedIds =
          if (total <= bcastRows) broadcast(visitedIds0) else visitedIds0
        val next = expanded
          .join(visitedIds, col("id") === col("vid"), "left_anti")
          .withColumn("depth", lit(depth))
          .localCheckpoint(false)
        // visited stays a lazy union of per-level checkpointed frames
        visited = visited.union(next)
        frontier = next
        frontierSize = next.count()
        total += frontierSize
      }
      // canonical (depth, id) ordering for deterministic truncation;
      // uncapped internal callers skip the global sort entirely
      if (maxResults >= Int.MaxValue.toLong) visited
      else visited.orderBy(col("depth"), col("id")).limit(maxResults.toInt)
    } finally if (!parentCached) hop.unpersist()
  }

  /** Topological level of every node: Kahn's algorithm by frontier
    * peeling (reference `traverse_topological_sort`,
    * `src/query/traversal.zig:986-1135`). Each round peels the current
    * zero-in-degree layer at `level = round`; a node's level is therefore
    * the longest path from any root to it. When no zero-in-degree node
    * remains but nodes do, those leftovers are exactly Kahn's cycle
    * members — returned with level = -1 (the reference returns an empty
    * result on cycles, `traversal.zig:1095-1107`; partial output with the
    * cyclic part marked is strictly more informative, and trivially
    * maskable for compat).
    *
    * Scale: each iteration touches only the REMAINING edges (shrinking
    * every round), not the whole graph — unlike a whole-graph fixpoint,
    * a deep thin chain costs O(chain) small jobs, not O(depth × |E|)
    * full shuffles. maxIters = 100 matches the reference depth cap
    * (`traversal.zig:242-247`).
    */
  def topoLevels(edges: DataFrame, maxIters: Int = 100,
                 edgesDistinct: Boolean = false): DataFrame = graft.core.Checkpoints.withoutAqe(edges.sparkSession) {
    // `edgesDistinct`: caller vouches the (src,dst) projection is
    // already duplicate-free (e.g. a materialized pair view) — skips
    // the per-call distinct shuffle; an already-cached input also
    // skips the redundant persist copy.
    val pairs =
      if (edgesDistinct) edges.select(col("src"), col("dst"))
      else edges.select(col("src"), col("dst")).distinct()
    val parentCached = edgesDistinct && edges.storageLevel != StorageLevel.NONE
    // when this call owns the persist, lay the edges out hash-partitioned
    // by src: every round's semi-join probes on src, so the persisted
    // layout is reused each round instead of re-exchanging e (the
    // in-memory analogue of the bucketed-by-src edge table; measured
    // ~25% off the whole sort at sf0.1)
    val nPart = edges.sparkSession.sessionState.conf.numShufflePartitions max 1
    val e = if (parentCached) pairs
            else pairs.repartition(nPart, col("src"))
              .persist(StorageLevel.MEMORY_AND_DISK)
    // Delta-Kahn: keep only the positive in-degree table and SUBTRACT the
    // peeled layer's contribution each round, instead of re-materializing
    // the remaining edge set — per-round cost is O(edges out of the
    // layer), and the stored state (indeg) only shrinks.
    // NOTE: like the BFS loop above, each round localCheckpoints:
    // `merged` feeds the NEXT round's state twice (layer semi-join +
    // indeg), and truncating lineage per round keeps the cumulative
    // plan flat — measured 3x faster than cached-lineage frames here.
    // LAZY checkpoints: the per-round `layerCount` action materializes
    // them, so each round costs exactly one job (eager would add a
    // second materialization job per round).
    var indeg = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(false)
    // roots = nodes with no incoming edge. Every node of an edge-pair
    // input appears as a src or a dst, and dst-only nodes are never
    // roots — so distinct(src) anti-join indeg IS the root set, at half
    // the setup shuffle of the full distinct(src ∪ dst) node table.
    var layer = e.select(col("src").as("id")).distinct()
      .join(indeg, Seq("id"), "left_anti")
      .localCheckpoint(false)
    var out = layer.withColumn("level", lit(0))
    var level = 0
    var layerCount = layer.count()
    while (layerCount > 0 && level < maxIters) {
      level += 1
      // NO broadcast hint here, unlike the BFS loop — measured twice
      // (interleaved A/B at sf0.1): with e persisted hash-partitioned
      // by src, the semi-join already only exchanges the small layer
      // side, so per-round broadcast construction (collect + hash
      // build, twice per round) costs MORE than it saves — 2.6 s vs
      // 2.4 s median for the full sort.
      val dec = e
        .join(layer.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .groupBy(col("dst").as("id")).agg(count(lit(1)).as("sub"))
      val merged = indeg.join(dec, Seq("id"), "left")
        .withColumn("deg2", col("deg") - coalesce(col("sub"), lit(0L)))
        .localCheckpoint(false)
      // layer and the next indeg are cheap filters over the checkpointed
      // merge — no extra materialization jobs
      layer = merged.filter(col("deg2") <= 0).select("id")
      indeg = merged.filter(col("deg2") > 0)
        .select(col("id"), col("deg2").as("deg"))
      layerCount = layer.count()
      if (layerCount > 0)
        out = out.union(layer.withColumn("level", lit(level)))
    }
    // anything still holding in-degree is on (or downstream of) a cycle
    out.union(indeg.select("id").withColumn("level", lit(-1)))
  }

  /** Simple paths between two nodes in order of INCREASING length,
    * shortest first, up to `maxPaths` (reference `find_paths_between`,
    * `src/query/traversal.zig:1366-1500`: "in order of increasing
    * length, with shortest paths first", cap 100). BFS expanding whole
    * paths (no cross-path visited set — distinct paths may share
    * interior nodes), per-path cycle guard; a path that reaches `to`
    * terminates there (it leaves the frontier — matching the oracle's
    * `head <> to` recursion guard) and the search CONTINUES to deeper
    * levels until `maxPaths` paths are collected or `maxDepth` is hit.
    *
    * `frontierCap` bounds the number of in-flight paths per level (kept
    * in lexicographic path order). Without it the intermediate frontier
    * on a dense graph is combinatorial — every simple path, not every
    * node — and OOMs long before depth 10; the reference likewise caps
    * paths DURING search (`traversal.zig:1373`). When the cap binds, the
    * result keeps the lexicographically-smallest paths per level
    * (pruning keeps the smallest prefixes, and path order is
    * prefix-consistent), just not guaranteed exhaustive.
    */
  def pathsBetween(edges: DataFrame, from: String, to: String,
                   maxDepth: Int = 10, maxPaths: Int = 100,
                   frontierCap: Int = 10000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parentCached = edges.storageLevel != StorageLevel.NONE
    val hop0 = hops(edges, Direction.Outgoing)
    val hop = if (parentCached) hop0 else hop0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (from == to) return Seq(Seq(from)).toDF("path")
      var frontier = Seq(Seq(from)).toDF("path")
        .withColumn("head", lit(from)).localCheckpoint(false)
      var frontierSize = frontier.count()
      var depth = 0
      var nHits = 0L
      var collected: List[DataFrame] = Nil // one hit batch per depth, in order
      while (depth < maxDepth && nHits < maxPaths && frontierSize > 0) {
        depth += 1
        // frontier is hard-capped at frontierCap paths -> always small
        // enough to broadcast against the edge table (checkpoint erased
        // the stats the optimizer would need to see that)
        val expanded = broadcast(frontier).join(hop, col("head") === col("from"))
          .filter(!array_contains(col("path"), col("to"))) // per-path cycle guard
          .select(concat(col("path"), array(col("to"))).as("path"), col("to").as("head"))
          // per-level prune: lexicographically-smallest K paths survive
          .orderBy(col("path")).limit(frontierCap)
          .localCheckpoint(false)
        val total = expanded.count() // the materializing action for the level
        val hits = expanded.filter(col("head") === lit(to)).select("path")
        val n = hits.count() // cached scan
        if (n > 0) { collected = hits :: collected; nHits += n }
        // paths that reached `to` are done — only the rest keep expanding
        frontier = expanded.filter(col("head") =!= lit(to))
        frontierSize = total - n
      }
      collected.reverse
        .foldLeft(spark.emptyDataset[Seq[String]].toDF("path"))(_ union _)
        .orderBy(size(col("path")), col("path")).limit(maxPaths)
    } finally if (!parentCached) hop.unpersist()
  }
}

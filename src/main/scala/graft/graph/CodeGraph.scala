package graft.graph

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A property graph derived deterministically from the driver fixture
  * tables, playing the role of the reference's code graph (blocks + typed
  * edges) so that every graph operator is oracle-checkable: DuckDB can
  * rebuild the identical graph from the same parquet files with the SQL in
  * [[CodeGraph.edgesSql]] / [[CodeGraph.blocksSql]].
  *
  * Shape mirrors the reference's model (SURVEY.md §1): `blocks` are the
  * nodes (here: documents), `edges` are typed directed relations (here:
  * the TPC-H foreign keys, which form a DAG —
  * order → customer → nation → region, order → part/supplier → nation).
  * A DAG is exactly what the reference's call graphs look like, and it
  * makes topological-sort semantics well-defined.
  *
  * Scale design: `edges` is a pure projection+distinct of the base tables —
  * at 100 TB it would be written once, bucketed by `src` AND a second copy
  * bucketed by `dst` (the reference keeps a bidirectional edge index for
  * the same reason, `src/storage/graph_edge_index.zig:111-144`). Here we
  * derive it on the fly and let AQE handle the exchanges.
  */
object CodeGraph {

  /** The derived graph is materialized once per (session, dir) and
    * persisted — the Spark analogue of the reference's on-disk edge
    * index (`src/storage/graph_edge_index.zig`): traversals must join
    * against a stored table, not re-pay the derivation scan. At 100 TB
    * this is a bucketed-by-`src` table written at ingest; here a
    * persisted view gives the same once-per-job cost.
    *
    * Memoization goes through the real [[graft.query.QueryCache]]
    * (LRU + TTL + write invalidation, per session, weakly keyed on the
    * session object): [[graft.core.Mvcc]] mutations invalidate it, so a
    * write is followed by a re-derivation — the reference's
    * mutation-invalidates-cache contract (`engine.zig:493-502`).
    */
  private def memo(spark: SparkSession, dir: String, what: String)
                  (build: => DataFrame): DataFrame =
    graft.query.QueryCache.forSession(spark)
      .getOrElseUpdate(s"codegraph|$dir|$what")(build)

  /** Typed edge table: src STRING, dst STRING, edge_type STRING.
    * Node ids are prefixed keys: C<custkey>, S<suppkey>, N<nationkey>,
    * R<regionkey>, O<orderkey>, P<partkey>.
    */
  def edges(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "edges")(edgesUncached(spark, dir))

  /** Distinct (src, dst) pairs, materialized once — the input shape for
    * structure-only algorithms (topo sort, SCC) that would otherwise
    * re-pay the distinct shuffle per query.
    */
  def edgePairs(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "edgePairs")(
      // persisted hash-partitioned by src: iterative consumers (topo
      // peeling, out-traversals) probe on src every round, so the
      // cached layout replaces a per-round exchange of the whole edge
      // set — the in-memory analogue of the bucketed-by-src edge table
      edges(spark, dir).select(col("src"), col("dst")).distinct()
        .repartition(
          spark.sessionState.conf.numShufflePartitions max 1, col("src")))

  /** Deduped undirected orientation rows (both (a,b) and (b,a) for
    * every distinct edge), materialized once per (session, dir) and
    * hash-partitioned on the probe key — the in-memory analogue of the
    * reference's BIDIRECTIONAL edge index (`graph_edge_index.zig`
    * maintains exactly this pair of layouts). Undirected analytics
    * (k-core, components, related-entities) consume it via their
    * `undirectedPairs` flag instead of re-paying the 2|E| union+distinct
    * shuffle per query; at 100 TB this is the second bucketed copy of
    * the edge table written at ingest (`Scale.writeEdgeIndex`).
    */
  def undPairs(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "undPairs") {
      val p = edgePairs(spark, dir)
      p.select(col("src"), col("dst"))
        .union(p.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(
          spark.sessionState.conf.numShufflePartitions max 1, col("src"))
    }

  /** Canonical part co-occurrence pairs (parts sharing an order; the
    * "basket graph"), src < dst by construction, BIGINT part keys —
    * materialized once per (session, dir) like the other derived graph
    * views: a real pipeline stores this as a table at ingest (one
    * groupBy shuffle builds the per-order part sets; pairs explode
    * map-side in sorted order), and every co-occurrence consumer
    * (triangles, collocation analytics) probes the stored copy.
    */
  def coPairs(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "coPairs") {
      val baskets = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .groupBy("ok").agg(sort_array(collect_set(col("p"))).as("ps"))
      baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          | transform(slice(ps, i + 2, size(ps)),
          |   y -> struct(x AS src, y AS dst))))""".stripMargin))
          .as("pr"))
        .select(col("pr.src"), col("pr.dst")).distinct()
        .repartition(
          spark.sessionState.conf.numShufflePartitions max 1, col("src"))
    }

  private def edgesUncached(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(
      concat(lit("C"), col("c_custkey")).as("src"),
      concat(lit("N"), col("c_nationkey")).as("dst"),
      lit("in_nation").as("edge_type"))
    val supp = Tables.supplier(spark, dir).select(
      concat(lit("S"), col("s_suppkey")).as("src"),
      concat(lit("N"), col("s_nationkey")).as("dst"),
      lit("in_nation").as("edge_type"))
    val nat = Tables.nation(spark, dir).select(
      concat(lit("N"), col("n_nationkey")).as("src"),
      concat(lit("R"), col("n_regionkey")).as("dst"),
      lit("in_region").as("edge_type"))
    val ord = Tables.orders(spark, dir).select(
      concat(lit("O"), col("o_orderkey")).as("src"),
      concat(lit("C"), col("o_custkey")).as("dst"),
      lit("placed_by").as("edge_type"))
    // lineitem repeats (order, part) across line numbers → distinct,
    // exactly the dedup the reference's edge index does on put_edge.
    val li = Tables.lineitem(spark, dir)
    val contains = li.select(
      concat(lit("O"), col("l_orderkey")).as("src"),
      concat(lit("P"), col("l_partkey")).as("dst"),
      lit("contains").as("edge_type")).distinct()
    val suppliedBy = li.select(
      concat(lit("O"), col("l_orderkey")).as("src"),
      concat(lit("S"), col("l_suppkey")).as("dst"),
      lit("supplied_by").as("edge_type")).distinct()
    cust.union(supp).union(nat).union(ord).union(contains).union(suppliedBy)
  }

  /** DuckDB CTE body reconstructing [[edges]] — embed as
    * `WITH edges AS (<edgesSql>) ...` in oracle SQL.
    */
  val edgesSql: String =
    """SELECT 'C' || c_custkey AS src, 'N' || c_nationkey AS dst, 'in_nation' AS edge_type FROM customer
      | UNION ALL SELECT 'S' || s_suppkey, 'N' || s_nationkey, 'in_nation' FROM supplier
      | UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey, 'in_region' FROM nation
      | UNION ALL SELECT 'O' || o_orderkey, 'C' || o_custkey, 'placed_by' FROM orders
      | UNION ALL SELECT DISTINCT 'O' || l_orderkey, 'P' || l_partkey, 'contains' FROM lineitem
      | UNION ALL SELECT DISTINCT 'O' || l_orderkey, 'S' || l_suppkey, 'supplied_by' FROM lineitem"""
      .stripMargin.replace("\n", " ")

  /** Block (node) table derived from `documents`, mirroring the reference's
    * ContextBlock contract (SURVEY.md §1.3): `unit_id` =
    * "<file_path>:<Container>:<name>" so qualified-name resolution
    * (`src/query/engine.zig:579-602`) has something real to chew on.
    * workspace = source, container = lang, name = D<doc_id>.
    */
  def blocks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      concat(lit("D"), col("doc_id")).as("id"),
      lit(1L).as("sequence"),
      col("source").as("workspace"),
      lit("document").as("unit_type"),
      concat(col("source"), lit(":"), col("lang"), lit(":D"), col("doc_id")).as("unit_id"),
      col("source").as("file_path"),
      col("text").as("content"),
      col("n_chars"),
      lit(false).as("is_deleted"))

  /** DuckDB view body for [[blocks]]. */
  val blocksSql: String =
    """SELECT 'D' || doc_id AS id, 1 AS sequence, source AS workspace,
      | 'document' AS unit_type,
      | source || ':' || lang || ':D' || doc_id AS unit_id,
      | source AS file_path, text AS content, n_chars,
      | false AS is_deleted FROM documents"""
      .stripMargin.replace("\n", " ")

  /** Block rows for every node of [[edges]], so that anchor resolution
    * (find_by_name) and context queries operate on the same graph the
    * traversals run on — mirroring the reference, where blocks and edges
    * live in one store (`src/storage/engine.zig`). `unit_id` follows the
    * reference convention "<container>:<type>:<name>" so qualified-name
    * matching has real structure.
    */
  def nodeBlocks(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "nodeBlocks")(nodeBlocksUncached(spark, dir))

  private def nodeBlocksUncached(spark: SparkSession, dir: String): DataFrame = {
    def mk(df: DataFrame, prefix: String, key: String, utype: String,
           content: Column): DataFrame =
      df.select(
        concat(lit(prefix), col(key)).as("id"),
        lit(1L).as("sequence"),
        lit("tpch").as("workspace"),
        lit(utype).as("unit_type"),
        concat(lit(s"tpch:$utype:"), lit(prefix), col(key)).as("unit_id"),
        lit("tpch").as("file_path"),
        content.cast("string").as("content"),
        lit(false).as("is_deleted"))
    mk(Tables.customer(spark, dir), "C", "c_custkey", "customer", col("c_name"))
      .union(mk(Tables.supplier(spark, dir), "S", "s_suppkey", "supplier", col("s_name")))
      .union(mk(Tables.nation(spark, dir), "N", "n_nationkey", "nation", col("n_name")))
      .union(mk(Tables.region(spark, dir), "R", "r_regionkey", "region", col("r_name")))
      .union(mk(Tables.orders(spark, dir), "O", "o_orderkey", "order", col("o_orderpriority")))
      .union(mk(Tables.part(spark, dir), "P", "p_partkey", "part", col("p_name")))
  }

  /** DuckDB CTE body reconstructing [[nodeBlocks]]. */
  val nodeBlocksSql: String = {
    def mk(table: String, prefix: String, key: String, utype: String,
           content: String): String =
      s"SELECT '$prefix' || $key AS id, 1 AS sequence, 'tpch' AS workspace, " +
        s"'$utype' AS unit_type, 'tpch:$utype:$prefix' || $key AS unit_id, " +
        s"'tpch' AS file_path, CAST($content AS VARCHAR) AS content, " +
        s"false AS is_deleted FROM $table"
    Seq(
      mk("customer", "C", "c_custkey", "customer", "c_name"),
      mk("supplier", "S", "s_suppkey", "supplier", "s_name"),
      mk("nation", "N", "n_nationkey", "nation", "n_name"),
      mk("region", "R", "r_regionkey", "region", "r_name"),
      mk("orders", "O", "o_orderkey", "order", "o_orderpriority"),
      mk("part", "P", "p_partkey", "part", "p_name"),
    ).mkString(" UNION ALL ")
  }

  /** A *versioned* block table with tombstones, derived from `events`, for
    * MVCC semantics (latest sequence wins, tombstone shadows —
    * `docs/DESIGN.md:27-33`): each event is a write of block U<user_id>
    * at sequence event_id; `error` events are deletes (tombstones).
    */
  def versionedBlocks(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("U"), col("user_id")).as("id"),
      col("event_id").as("sequence"),
      col("event_type").as("unit_type"),
      col("value"),
      (col("event_type") === "error").as("is_deleted"))

  /** DuckDB view body for [[versionedBlocks]]. */
  val versionedBlocksSql: String =
    """SELECT 'U' || user_id AS id, event_id AS sequence,
      | event_type AS unit_type, value,
      | event_type = 'error' AS is_deleted FROM events"""
      .stripMargin.replace("\n", " ")

  /** A VERSIONED edge table derived from the events stream — the edge
    * analogue of [[versionedBlocks]]: each event is one version of the
    * (user → tag) edge `U<user_id> --tagged--> K<props.k>` at sequence
    * `event_id`, and an `error` event is that edge's tombstone. The
    * reference keeps exactly this shape in its LSM: edges dedup on
    * (source, target, type) with latest-sequence-wins and tombstone
    * shadowing (`src/storage/engine.zig:1209-1247`), and any read "as
    * of" a sequence horizon sees the historical edge set. Composing
    * [[graft.core.Schemas.currentViewKeyedAsOf]] over this table with
    * [[Traversal.bfs]] is the engine's time-travel traversal.
    */
  def versionedEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("U"), col("user_id")).as("src"),
      concat(lit("K"),
        regexp_extract(col("props"), "\"k\": *([0-9]+)", 1)).as("dst"),
      lit("tagged").as("edge_type"),
      col("event_id").as("sequence"),
      (col("event_type") === "error").as("is_deleted"))

  /** DuckDB view body for [[versionedEdges]]. */
  val versionedEdgesSql: String =
    """SELECT 'U' || user_id AS src,
      | 'K' || regexp_extract(props, '"k": *([0-9]+)', 1) AS dst,
      | 'tagged' AS edge_type, event_id AS sequence,
      | event_type = 'error' AS is_deleted FROM events"""
      .stripMargin.replace("\n", " ")
}

package graft.query

import graft.graph.{Direction, EdgeFilter, Traversal, TraversalSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point/batch lookup and relationship-wrapper APIs — the thin operators
  * over the core view and traversal engine.
  */
object Lookups {

  /** `find_block` (`src/query/engine.zig:206-232`): point lookup on the
    * MVCC current view. Parquet bloom/min-max stats + partition pruning
    * play the reference's memtable/bloom role.
    */
  def findBlock(current: DataFrame, id: String): DataFrame =
    current.filter(col("id") === id)

  /** `find_blocks_batched` (`engine.zig:272-310`): the reference
    * amortizes bloom probes across ids and calls it 3–5× faster than N
    * point reads; the Spark-native equivalent is ONE left-semi join
    * (runtime bloom pushdown applies when enabled).
    */
  def findBlocksBatch(current: DataFrame, ids: Seq[String]): DataFrame = {
    val spark = current.sparkSession
    import spark.implicits._
    current.join(broadcast(ids.toDF("id")), Seq("id"), "left_semi")
  }

  /** `block_exists` (`engine.zig:235-244`) — content column never read
    * (Parquet prunes it from the scan).
    */
  def blockExists(current: DataFrame, id: String): Boolean =
    !current.filter(col("id") === id).select("id").isEmpty

  /** `query_block_sequence` (`engine.zig:247-257`). */
  def blockSequence(current: DataFrame, id: String): DataFrame =
    current.filter(col("id") === id).select("id", "sequence")

  /** `count_existing_blocks` (`operations.zig:406-417`). */
  def countExisting(current: DataFrame, ids: Seq[String]): DataFrame =
    findBlocksBatch(current, ids).agg(count(lit(1)).as("n_existing"))

  /** callers = incoming traversal, callees = outgoing, references =
    * bidirectional (`engine.zig:662-742`), each restricted to a
    * workspace by post-filtering the result against the blocks table —
    * replicating the reference's packaging-time workspace filter
    * (`engine.zig:684-731`).
    */
  private def related(edges: DataFrame, blocks: DataFrame, id: String,
                      direction: Direction, maxDepth: Int,
                      workspace: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val res = Traversal.bfs(edges, Seq(id).toDF("id"),
      TraversalSpec(direction, maxDepth, 1000, EdgeFilter.All))
    val ws = if (workspace.isEmpty) blocks
             else blocks.filter(col("workspace") === workspace)
    res.join(ws.select("id", "unit_type", "content"), Seq("id"), "inner")
      .select("id", "depth", "unit_type", "content")
  }

  def findCallers(edges: DataFrame, blocks: DataFrame, id: String,
                  maxDepth: Int = 3, workspace: String = ""): DataFrame =
    related(edges, blocks, id, Direction.Incoming, maxDepth, workspace)

  def findCallees(edges: DataFrame, blocks: DataFrame, id: String,
                  maxDepth: Int = 3, workspace: String = ""): DataFrame =
    related(edges, blocks, id, Direction.Outgoing, maxDepth, workspace)

  def findReferences(edges: DataFrame, blocks: DataFrame, id: String,
                     maxDepth: Int = 3, workspace: String = ""): DataFrame =
    related(edges, blocks, id, Direction.Both, maxDepth, workspace)
}

package graft.ingest

import graft.core.{Mvcc, Schemas}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workspace registry + link/unlink/sync lifecycle, reference
  * `src/workspace/manager.zig:113-377`. The reference persists the
  * registry as a special metadata block; here it is its own tiny MVCC
  * table (same latest-sequence-wins view), so registry history is
  * queryable like everything else.
  */
object Workspace {

  def emptyRegistry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Boolean)]
      .toDF("id", "root_path", "sequence", "is_deleted")
  }

  /** `link_codebase`: register + ingest → (registry', blocks, edges). */
  def link(registry: DataFrame, name: String, rootPath: String,
           files: org.apache.spark.sql.Dataset[Ingest.FileDoc],
           parser: SourceParser = DispatchParser): (DataFrame, DataFrame, DataFrame) = {
    val spark = registry.sparkSession
    import spark.implicits._
    val reg2 = Mvcc.putBlocks(registry,
      Seq((name, rootPath)).toDF("id", "root_path"))
    val units = Ingest.parseFiles(files, parser)
    val blocks = Ingest.unitsToBlocks(units, name)
    val edges = SemanticResolver.edgesAsBlocks(units, name)
    (reg2, blocks, edges)
  }

  /** `link_codebase` from a real directory tree — the reference's entry
    * point (`manager.zig:379-417`: enumerate under the root with glob
    * include/exclude and the 1 MiB cap, then ingest): reads the tree via
    * [[Ingest.readDirectory]] and delegates to [[link]].
    */
  def linkDirectory(registry: DataFrame, name: String, rootPath: String,
                    include: Seq[String] = Ingest.DefaultInclude,
                    exclude: Seq[String] = Nil,
                    parser: SourceParser = DispatchParser)
      : (DataFrame, DataFrame, DataFrame) =
    link(registry, name, rootPath,
      Ingest.readDirectory(registry.sparkSession, rootPath, include, exclude),
      parser)

  /** `unlink_codebase`: tombstone the registry row; blocks are NOT
    * physically removed (`manager.zig:192-247`).
    */
  def unlink(registry: DataFrame, name: String): DataFrame =
    Mvcc.deleteBlocks(registry, Seq(name))

  /** `sync_codebase`: re-ingest a linked workspace — the Parquet
    * `replaceWhere` shape: drop the workspace's partition from the
    * blocks/edges tables and append the fresh parse.
    */
  def sync(blocks: DataFrame, edges: DataFrame, name: String,
           files: org.apache.spark.sql.Dataset[Ingest.FileDoc],
           parser: SourceParser = DispatchParser): (DataFrame, DataFrame) = {
    val units = Ingest.parseFiles(files, parser)
    val freshBlocks = Ingest.unitsToBlocks(units, name)
    val freshEdges = SemanticResolver.edgesAsBlocks(units, name)
    // null-SAFE not-equal: MVCC tombstones carry NULL in every non-key
    // column including `workspace`; a plain =!= evaluates to NULL on
    // them and the filter would silently drop every tombstone from the
    // whole table — resurrecting deleted blocks on any sync
    (blocks.filter(!(col("workspace") <=> name)).unionByName(freshBlocks),
      edges.filter(!(col("workspace") <=> name)).unionByName(freshEdges))
  }

  /** Linked workspaces = MVCC current view of the registry. */
  def linked(registry: DataFrame): DataFrame =
    Schemas.currentView(registry).select("id", "root_path")
}

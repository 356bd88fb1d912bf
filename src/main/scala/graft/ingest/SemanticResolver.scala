package graft.ingest

import graft.core.Schemas
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Symbol resolution — the one genuinely relational piece of the
  * reference's ETL (`/root/reference/src/ingestion/semantic_resolver
  * .zig:48-174`): build a symbol table of names, then rewrite raw
  * `calls`/`imports`/`method_of` edge targets (still *names*) to
  * canonical block ids, preferring a symbol in the SAME container over a
  * global one (`resolve_in_scope :143-162`).
  *
  * Spark shape: two broadcast-ready equi-joins + coalesce — scoped
  * lookup first (name, container), then global (name) — instead of the
  * reference's interned in-memory hash table. Unresolved targets drop,
  * like the reference skipping unknown symbols.
  */
object SemanticResolver {

  /** Symbol table: (name, container, unit_id) per unit — the join-side
    * of `build_symbol_table` (`semantic_resolver.zig:110-126`).
    */
  def symbolTable(units: Dataset[ParsedUnit]): DataFrame =
    units.toDF().select(
      col("name"), col("parentContainer").as("container"), col("unitId"))

  /** Resolve every raw edge to (src_unit_id, dst_unit_id, edge_type).
    * Ambiguous global names resolve to the lexicographically-smallest
    * unit_id (deterministic across cluster layouts; the reference's
    * insertion-order tie-break is single-threaded luck).
    */
  def resolveEdges(units: Dataset[ParsedUnit]): DataFrame = {
    val raw = units.toDF()
      .select(col("unitId").as("src_unit_id"),
        col("parentContainer").as("src_container"),
        explode(col("edges")).as("edge"))
      .select(col("src_unit_id"), col("src_container"),
        col("edge.edgeType").as("edge_type"),
        col("edge.targetName").as("target_name"))

    val symbols = symbolTable(units)
    // deterministic pick per (name, container) and per name
    val scoped = symbols.groupBy("name", "container")
      .agg(min("unitId").as("scoped_unit_id"))
    val global = symbols.groupBy("name")
      .agg(min("unitId").as("global_unit_id"))

    raw
      .join(broadcast(scoped),
        raw("target_name") === scoped("name") &&
          raw("src_container") === scoped("container"), "left")
      .join(broadcast(global.withColumnRenamed("name", "gname")),
        col("target_name") === col("gname"), "left")
      .withColumn("dst_unit_id",
        coalesce(col("scoped_unit_id"), col("global_unit_id")))
      .filter(col("dst_unit_id").isNotNull)
      .filter(col("dst_unit_id") =!= col("src_unit_id")) // no self-edges
      .select("src_unit_id", "dst_unit_id", "edge_type")
      .distinct()
  }

  /** Resolved edges with block ids, ready for the edges table. */
  def edgesAsBlocks(units: Dataset[ParsedUnit], workspace: String): DataFrame =
    resolveEdges(units).select(
      Schemas.blockId(lit(workspace), col("src_unit_id")).as("src"),
      Schemas.blockId(lit(workspace), col("dst_unit_id")).as("dst"),
      col("edge_type"),
      lit(workspace).as("workspace"))
}

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

  /** Symbol table: (name, container, unit_id, arm) per unit — the
    * join-side of `build_symbol_table` (`semantic_resolver.zig:110-126`).
    * `arm` rides along so resolution can prefer ACTIVE definitions over
    * `arm='suppressed'` recovered ones (r13, ADVICE): a platform-split
    * twin (`#ifdef _WIN32 … #else`) puts a dead-config definition of the
    * same name in the table, and a bare min(unitId) tie-break could
    * silently retarget call edges to code that is never compiled.
    */
  def symbolTable(units: Dataset[ParsedUnit]): DataFrame =
    units.toDF().select(
      col("name"), col("parentContainer").as("container"), col("unitId"),
      col("arm"))

  /** Workspace-level downgrade of ORPHAN C++ "methods" (r12) — the
    * qualified-definition residual: `ns::f(…)` where `namespace ns {`
    * opens only in ANOTHER header scans as a method of `ns`, because
    * [[CppParser]] sees one file at a time. Here the whole workspace's
    * symbol table exists: a function unit whose parent container
    * matches NO type unit anywhere cannot be a method of a type —
    * downgrade it to a FREE function (parent "", `method_of` edge
    * dropped, unitId re-derived as `file:name`), turning the per-file
    * lexical limit into a workspace-level fix. Scoped to C++-parsed
    * files: every other extractor derives parents from ENCLOSING type
    * frames in the same file, which always emit a type unit.
    * Residual: a genuine method of a type that is itself outside the
    * ingest surface downgrades too — the name still resolves and the
    * unit survives, only the container attribution is lost. A
    * re-derived id that would collide with an existing unit id — or
    * with ANOTHER downgraded unit's re-derived id (same name, same
    * file, different former containers) — gets the parse-time `#line`
    * suffix. Three unit-scale joins (type names, collision probe,
    * within-set dups); callers should cache the parsed units first so
    * the parse itself runs once.
    */
  def downgradeOrphanMethods(units: Dataset[ParsedUnit]): Dataset[ParsedUnit] = {
    val spark = units.sparkSession
    import spark.implicits._
    val df = units.toDF()
    val cand = col("filePath").rlike("""\.(cpp|cc|cxx|hpp|hh|hxx)$""") &&
      col("unitType") === "function" && col("parentContainer") =!= ""
    val typeNames = df.filter(col("unitType") === "type")
      .select(col("name").as("__tn")).distinct()
    val marked = df
      .join(typeNames, col("parentContainer") === col("__tn"), "left")
      .withColumn("__down", cand && col("__tn").isNull)
      .drop("__tn")
    val existingIds = marked.filter(!col("__down"))
      .select(col("unitId").as("__eid"))
    // collisions WITHIN the downgraded set too (r13, ADVICE): two
    // orphan methods of the same name in one file (`a::init` and
    // `b::init` both defined in one .cpp) would otherwise both re-derive
    // the unsuffixed `file:init` — duplicate block ids at the same MVCC
    // sequence, currentView picking an arbitrary winner
    val downDups = marked.filter(col("__down"))
      .groupBy(col("filePath").as("__df"), col("name").as("__dn"))
      .agg(count(lit(1)).as("__dc")).filter(col("__dc") > 1)
      .drop("__dc")
    val newId = concat(col("filePath"), lit(":"), col("name"))
    marked
      .join(existingIds, col("__down") && newId === col("__eid"), "left")
      .join(downDups, col("__down") && col("filePath") === col("__df") &&
        col("name") === col("__dn"), "left")
      .select(
        when(col("__down"),
          when(col("__eid").isNotNull || col("__dn").isNotNull,
            concat(newId, lit("#"), col("lineStart"))).otherwise(newId))
          .otherwise(col("unitId")).as("unitId"),
        col("unitType"), col("name"),
        when(col("__down"), lit("")).otherwise(col("parentContainer"))
          .as("parentContainer"),
        col("filePath"), col("lineStart"), col("lineEnd"), col("content"),
        when(col("__down"), filter(col("edges"),
            e => e.getField("edgeType") =!= "method_of"))
          .otherwise(col("edges")).as("edges"),
        col("arm"))
      .as[ParsedUnit]
  }

  /** Resolve every raw edge to (src_unit_id, dst_unit_id, edge_type).
    * Ambiguous global names resolve to the lexicographically-smallest
    * unit_id (deterministic across cluster layouts; the reference's
    * insertion-order tie-break is single-threaded luck).
    *
    * `method_of` edges resolve against TYPE units only (r10): their
    * targets are containers by construction (the parsers emit them
    * with the enclosing class's name), and a C++/Java constructor —
    * a FUNCTION unit named like its class, inside that class — must
    * not scope-shadow the type a sibling method attaches to. Call
    * edges keep the full table: `Store(…)` call-sites resolving to
    * the constructor is exactly right.
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
    val typeSymbols = symbolTable(units.filter(_.unitType == "type"))
    // deterministic pick per (name, container) and per name — min over
    // (arm, unitId), so an ACTIVE unit (arm="") always beats a
    // suppressed-arm recovery of the same name (r13, ADVICE) and ties
    // within an arm class stay the lexicographically-smallest unitId
    def pick(prefix: String, suffix: String) =
      min(struct(col("arm"), col("unitId")))
        .getField("unitId").as(s"${prefix}_${suffix}_id")
    def scoped(t: DataFrame, prefix: String) = t.groupBy("name", "container")
      .agg(pick(prefix, "scoped"))
      .withColumnRenamed("name", s"${prefix}_sname")
      .withColumnRenamed("container", s"${prefix}_scontainer")
    def global(t: DataFrame, prefix: String) = t.groupBy("name")
      .agg(pick(prefix, "global"))
      .withColumnRenamed("name", s"${prefix}_gname")

    val isMethodOf = col("edge_type") === "method_of"
    raw
      .join(broadcast(scoped(symbols, "a")),
        col("target_name") === col("a_sname") &&
          col("src_container") === col("a_scontainer"), "left")
      .join(broadcast(global(symbols, "a")),
        col("target_name") === col("a_gname"), "left")
      .join(broadcast(scoped(typeSymbols, "t")),
        col("target_name") === col("t_sname") &&
          col("src_container") === col("t_scontainer"), "left")
      .join(broadcast(global(typeSymbols, "t")),
        col("target_name") === col("t_gname"), "left")
      .withColumn("dst_unit_id",
        when(isMethodOf, coalesce(col("t_scoped_id"), col("t_global_id")))
          .otherwise(coalesce(col("a_scoped_id"), col("a_global_id"))))
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

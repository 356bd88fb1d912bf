package graft.query

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Entity / file-path anchor resolution, reference
  * `src/query/engine.zig:536-659`.
  *
  * `find_by_name`: filter workspace + unit_type, then match `name`
  * against the trailing `:`-segment of `unit_id`, OR — when the query is
  * qualified ("Container.name") — match container against the
  * second-to-last segment and name against the last
  * (`engine.zig:579-602`). The reference full-scans and JSON-parses every
  * block; here the predicate lands on real columns, so Catalyst pushes
  * workspace/unit_type to the Parquet scan and only `unit_id` strings are
  * evaluated.
  */
object NameResolver {

  /** unit_type alias: the CLI accepts `struct` for `type`
    * (`engine.zig:547-551`).
    */
  private def canonicalType(t: String): String = if (t == "struct") "type" else t

  def findByName(blocks: DataFrame, workspace: String, unitType: String,
                 name: String): DataFrame = {
    val wsFiltered =
      if (workspace.isEmpty) blocks else blocks.filter(col("workspace") === workspace)
    val typed = wsFiltered.filter(col("unit_type") === canonicalType(unitType))
    val lastSeg = substring_index(col("unit_id"), ":", -1)
    if (name.contains(".")) {
      // qualified "Container.name": 2nd-to-last segment must equal the
      // container, last must equal the simple name (engine.zig:579-602)
      val Array(container, simple) = name.split("\\.", 2)
      // try_element_at, NOT element_at: under ANSI mode element_at throws
      // INVALID_ARRAY_INDEX on a unit_id with <2 segments; the reference
      // treats that as a non-match (engine.zig:592-600).
      val secondLast = try_element_at(split(col("unit_id"), ":"), lit(-2))
      typed.filter(lastSeg === simple && secondLast === container)
    } else typed.filter(lastSeg === name)
  }

  /** `find_by_file_path` (`engine.zig:618-659`). The reference probes a
    * metadata key its ingester never writes (SURVEY.md §2.3 quirk); our
    * schema stores `file_path` as a real column — rationalized.
    */
  def findByFilePath(blocks: DataFrame, workspace: String, path: String): DataFrame =
    blocks.filter(col("workspace") === workspace && col("file_path") === path)
}

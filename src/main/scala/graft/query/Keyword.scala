package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's "semantic" keyword search
  * (`src/query/operations.zig:207-256, 353-386`): score = fraction of
  * whitespace-split query words that appear as substrings of `content`
  * (0.0–1.0), threshold filter (default 0.7), sort by score desc, cap
  * `max_results` (default 100, max 500).
  *
  * Pure `functions._` columns → whole-stage codegen, no UDF. Top-k
  * compiles to TakeOrderedAndProject (per-partition heap + driver merge),
  * which is exactly the distributed version of the reference's
  * heap-select — no full sort, no full shuffle.
  */
object Keyword {

  /** Score expression, `calculate_keyword_similarity`
    * (`operations.zig:421-443`): empty query → 0.0. Duplicated query
    * words count separately, like the reference's word loop.
    *
    * Documented deviation (mirrored in the oracle SQL): the reference
    * splits on a SINGLE space, so consecutive/leading/trailing spaces
    * yield empty "words" that always match (indexOf("") == 0); this
    * engine splits on whitespace runs and drops empties — the rational
    * semantics. Queries without repeated spaces score identically.
    */
  def score(content: Column, query: String): Column = {
    val words = query.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) lit(0.0)
    else words.map(w => when(content.contains(w), 1).otherwise(0).cast("double"))
      .reduce(_ + _) / lit(words.length.toDouble)
  }

  /** Threshold + top-k, deterministic tie-break on `idCol`
    * (the reference's heap order on ties is insertion-order —
    * canonicalized here, SURVEY.md §7.5).
    */
  def search(df: DataFrame, contentCol: String, idCol: String, query: String,
             threshold: Double = 0.7, maxResults: Int = 100): DataFrame = {
    require(maxResults <= 500, "max_results must be <= 500")
    df.withColumn("score", score(col(contentCol), query))
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col(idCol))
      .limit(maxResults)
  }
}

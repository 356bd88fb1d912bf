package graft.expressions

/** Dispatch helper for the fused-native-vs-composable twins: a pipeline
  * Column builder calls the fused registry function when
  * `graft.GraftExtensions` is installed on the active session and
  * degrades to the spec-pinned composable `functions._` form otherwise
  * — correct either way, fast with the extension (ADVICE r5: never
  * throw undefined-function at external callers).
  */
object Fused {
  def available(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists(
      _.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
}

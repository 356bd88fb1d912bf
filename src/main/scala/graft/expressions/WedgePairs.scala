package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All C(n, 2) unordered pairs of a SORTED adjacency array, each packed
  * into one LONG as `adj(i) * pack + adj(j)` (i < j) — the map-side
  * wedge generation of the link-prediction candidate machine
  * ([[graft.graph.GraphAnalytics.linkPredTopK]]). The array is sorted,
  * so x < y per pair and every packed key is canonical by construction;
  * the composable `flatten(transform(... slice ...))` tree it replaces
  * stays as the spec/oracle cross-check.
  *
  * Why native: Spark evaluates higher-order functions INTERPRETED — per
  * center it allocates a lambda frame, a slice copy, and a boxed
  * java.lang.Long per wedge through generic rows. Measured on the sf0.1
  * FK graph (~16M wedges): the HOF tree burns ~740 executor-CPU-seconds
  * in the explode stage; this loop writes one primitive long[] per
  * center (wrapped zero-copy via `UnsafeArrayData.fromPrimitiveArray`)
  * and no boxes. Wedge volume is the candidate machine's hot path, so
  * this is the same allocation-bound gap as [[ArrayShingles]] /
  * [[MinHashBandKeys]].
  *
  * Caller contract (checked by the packing bound in `linkPredTopK`,
  * not re-checked per row): elements are dense codes in `[1, pack)`,
  * so the product cannot overflow. NULL input → NULL; n < 2 → empty.
  */
case class WedgePairs(child: Expression, pack: Long)
    extends UnaryExpression with CodegenFallback {

  require(pack >= 2L, s"wedge_pairs requires pack >= 2; got $pack")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wedge_pairs requires ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "wedge_pairs"

  override def nullSafeEval(input: Any): Any = {
    val adj = input.asInstanceOf[ArrayData]
    val n = adj.numElements()
    if (n < 2) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // C(n,2) in LONG first: at n = 65536 the Int product already wraps
    // negative, and a row that big is a caller error (an uncapped hub),
    // not something to allocate 17 GB for — fail loudly instead
    val m = n.toLong * (n - 1) / 2
    require(m <= 100000000L,
      s"wedge_pairs: adjacency of $n elements yields $m pairs in ONE row — " +
        "cap center degrees (linkPredTopK maxDeg) before packing")
    val out = new Array[Long](m.toInt)
    var o = 0
    var i = 0
    while (i < n) {
      val base = adj.getLong(i) * pack
      var j = i + 1
      while (j < n) {
        out(o) = base + adj.getLong(j)
        o += 1
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WedgePairs =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a document in ONE pass: lowercase, split on
  * whitespace (empties dropped), space-join each n-window — the exact
  * contract of the composable form (`Dedup.shinglesComposable`: a
  * `transform(sequence, concat_ws(slice))` tree) and of the DuckDB
  * oracle's `list_transform(range, array_to_string)` chain, which stay
  * as its cross-checks. Why native: Spark evaluates higher-order
  * functions INTERPRETED, allocating a slice array + a joined string
  * per window through generic rows — measured 7.5 s for one shingle
  * pass over 5 000 sf0.1 documents vs ~0.3 s fused (the same
  * allocation-bound gap as [[MinHashBandKeys]]). Shingling feeds every
  * n-gram operator (Jaccard verify, contamination, duplicated-n-gram
  * stats, prefix-filter join), so this one loop is the text family's
  * hot path.
  *
  * Returns ARRAY<STRING>; fewer than n words → empty array (same as
  * the composable form). NULL input → NULL.
  */
case class ArrayShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingles requires n >= 1; got n=$n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayShingles =
    copy(child = newChild)
}

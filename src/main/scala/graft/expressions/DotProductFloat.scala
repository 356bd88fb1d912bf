package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused dot product over two ARRAY<FLOAT> columns, accumulating
  * in double precision in strict array order.
  *
  * This is the one place the engine drops below `functions._`: the
  * composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates
  * an intermediate array and evaluates a lambda per element; for ANN
  * scoring (64–4096 floats × every row) a fused loop with whole-stage
  * codegen is the difference between memory-bound and compute-bound.
  * The semantics are IDENTICAL to the composable form — same
  * left-fold summation order, and the same NULL behavior (zip_with
  * pads a length mismatch with null and a null element nulls the
  * fold, so both cases return NULL here too) — results are
  * bit-for-bit equal and interchangeable under the same oracle.
  *
  * Decision path per the build rules: (a) compose existing ops — done,
  * kept as the portable default; (b) custom codegen Expression — this
  * class, for the hot path; UDFs never.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // can return NULL even for non-null inputs (length mismatch / null
  // element), mirroring the composable form
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  /** True when either input's element type admits nulls — decided at
    * PLAN time from the schema, so `containsNull=false` embeddings (the
    * hot path) compile to a branch-free multiply-add loop.
    */
  private lazy val elementsMayBeNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsMayBeNull
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val elemNullCheck =
        if (elementsMayBeNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  $elemNullCheck
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

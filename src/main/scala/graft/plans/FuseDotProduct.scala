package graft.plans

import graft.expressions.DotProductFloat
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule fusing the composable dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  *               0d, (acc, v) => acc + v) }}}
  *
  * into the whole-stage-codegen [[DotProductFloat]] expression whenever
  * both inputs are ARRAY<FLOAT>.
  *
  * Why a `Rule[LogicalPlan]` and not just the `vec_dot` function: the
  * library's public similarity API stays fully declarative
  * (`Similarity.dot`/`cosine` are plain `functions._` trees — portable,
  * oracle-shaped, no session extension required to EXPRESS them), and
  * the session extension makes them FAST: Spark evaluates higher-order
  * functions interpreted with a per-element lambda and an intermediate
  * zipped array, while the fused loop runs inside whole-stage codegen.
  * Users writing the textbook fold themselves get the same rewrite for
  * free. This is the Catalyst decision path (c) of the build rules —
  * extend the optimizer, don't fork the API.
  *
  * Safety: [[DotProductFloat]] implements EXACTLY the fold's semantics
  * — same left-to-right double accumulation, NULL on length mismatch
  * (zip_with pads with null → the fold nulls) and NULL on a null
  * element — proven bit-identical in `DotProductFloatSpec`, so the
  * rewrite never changes results, only the evaluation strategy. The
  * match requires the analyzer-bound lambda variables to line up
  * exactly and fires only on ARRAY<FLOAT> inputs (the expression's
  * input contract); any other fold shape is left untouched.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def fuse(e: Expression): Expression = e match {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(
            Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                     Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(
          Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(accv: NamedLambdaVariable, vv: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable,
          Seq(finv: NamedLambdaVariable), _))
      if x.exprId == xv.exprId && y.exprId == yv.exprId &&
        acc.exprId == accv.exprId && v.exprId == vv.exprId &&
        fin.exprId == finv.exprId &&
        isFloatArray(a.dataType) && isFloatArray(b.dataType) =>
      DotProductFloat(a, b)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // transformAllExpressions is pre-order on each expression tree;
      // fuse the outermost fold first, then recurse into what remains
      // (a fused dot's array children may contain further folds)
      case agg: ArrayAggregate => fuse(agg)
    }
}

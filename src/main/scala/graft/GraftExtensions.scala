package graft

import graft.expressions.{ArrayShingles, DotProductFloat, MinHashBandKeys, MinHashBandKeysMd5, TextStats, TopKBy}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native expressions.
  * Install with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // declarative similarity API → codegen vec_dot, automatically
    // (see graft.plans.FuseDotProduct for why this is a Rule)
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot takes exactly 2 arguments")
        DotProductFloat(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_bands"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4,
          "minhash_bands takes (text, n, k, bands) — 4 arguments")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   name: String): Int = {
          require(e.foldable, s"minhash_bands $name must be a literal")
          e.eval().asInstanceOf[Number].intValue()
        }
        MinHashBandKeys(children.head, intLit(children(1), "n"),
          intLit(children(2), "k"), intLit(children(3), "bands"))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands_md5"),
      new ExpressionInfo(classOf[MinHashBandKeysMd5].getName, "minhash_bands_md5"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4,
          "minhash_bands_md5 takes (text, n, k, bands) — 4 arguments")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   name: String): Int = {
          require(e.foldable, s"minhash_bands_md5 $name must be a literal")
          e.eval().asInstanceOf[Number].intValue()
        }
        MinHashBandKeysMd5(children.head, intLit(children(1), "n"),
          intLit(children(2), "k"), intLit(children(3), "bands"))
      }))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ArrayShingles].getName, "shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "shingles takes (text, n) — 2 arguments")
        require(children(1).foldable, "shingles n must be a literal")
        ArrayShingles(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          "topk_by takes (item, score, k) — 3 arguments")
        require(children(2).foldable, "topk_by k must be a literal")
        // bare AggregateFunction: the analyzer wraps it in an
        // AggregateExpression at resolution
        TopKBy(children.head, children(1),
          children(2).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "text_stats takes exactly 1 argument")
        TextStats(children.head)
      }))
  }
}

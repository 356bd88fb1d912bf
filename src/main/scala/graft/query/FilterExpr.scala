package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's boolean predicate language
  * (`src/query/filtering.zig:41-196`) re-expressed as an AST → Catalyst
  * `Column` compiler. Because the output is a plain `Column`, Catalyst
  * gets full predicate pushdown / column pruning for free — the
  * reference's hand-rolled secondary-index shortcut
  * (`filtering.zig:311-342`) is subsumed by Parquet dictionary/bloom
  * pushdown.
  */
object FilterExpr {

  /** Field a predicate reads, `src/query/filtering.zig:69-79`. */
  sealed trait Target
  case object Content extends Target
  case object SourceUri extends Target
  case object Sequence extends Target
  case object ContentLength extends Target
  final case class MetadataField(name: String) extends Target
  /** A named real column (our engine promotes metadata to columns). */
  final case class Field(name: String) extends Target

  /** Comparison operators, `src/query/filtering.zig:41-55`. */
  sealed trait Op
  case object Eq extends Op;  case object Ne extends Op
  case object Gt extends Op;  case object Ge extends Op
  case object Lt extends Op;  case object Le extends Op
  case object Contains extends Op
  case object StartsWith extends Op
  case object EndsWith extends Op

  /** Boolean expression tree, `src/query/filtering.zig:58-66`. */
  sealed trait Expr
  final case class Cond(target: Target, op: Op, value: String) extends Expr
  final case class And(es: Seq[Expr]) extends Expr
  final case class Or(es: Seq[Expr]) extends Expr
  final case class Not(e: Expr) extends Expr

  private def targetCol(t: Target, metadataJsonCol: String): Column = t match {
    case Content => col("content")
    case SourceUri => col("source_uri")
    case Sequence => col("sequence").cast("string")
    case ContentLength => length(col("content")).cast("string")
    case MetadataField(n) => get_json_object(col(metadataJsonCol), s"$$.$n")
    case Field(n) => col(n).cast("string")
  }

  /** Numeric-or-lexical comparison, `src/query/filtering.zig:382-397`:
    * if BOTH sides parse as doubles compare numerically, else
    * lexicographically by byte order. Replicated exactly for oracle
    * parity (try_cast returns NULL on non-numeric, like Zig's
    * parseFloat failing).
    */
  def numLexCmp(l: Column, r: Column, op: Op): Column = {
    // try_cast, NOT cast: Spark 4 defaults to ANSI mode, where cast of a
    // non-numeric string throws CAST_INVALID_INPUT; try_cast yields NULL,
    // matching Zig's parseFloat-failure fallback to lexical compare.
    val ln = l.try_cast("double"); val rn = r.try_cast("double")
    val bothNum = ln.isNotNull && rn.isNotNull
    def cmp(a: Column, b: Column): Column = op match {
      case Eq => a === b; case Ne => a =!= b
      case Gt => a > b;   case Ge => a >= b
      case Lt => a < b;   case Le => a <= b
      case _ => throw new IllegalArgumentException(s"$op is not an ordering op")
    }
    when(bothNum, cmp(ln, rn)).otherwise(cmp(l, r))
  }

  /** Compile the AST to a Catalyst Column. */
  def compile(e: Expr, metadataJsonCol: String = "metadata_json"): Column = e match {
    case Cond(t, op, v) =>
      val c = targetCol(t, metadataJsonCol)
      op match {
        case Contains   => c.contains(v)
        case StartsWith => c.startsWith(v)
        case EndsWith   => c.endsWith(v)
        case o          => numLexCmp(c, lit(v), o)
      }
    case And(es) => es.map(compile(_, metadataJsonCol)).reduce(_ && _)
    case Or(es)  => es.map(compile(_, metadataJsonCol)).reduce(_ || _)
    case Not(x)  => !compile(x, metadataJsonCol)
  }

  /** Full filtered query with pagination, reference `FilteredQuery`
    * (`src/query/filtering.zig:199-296`): offset skip + max_results cap
    * (≤ 10000). The reference paginates in storage-scan order; a
    * distributed engine has no such order, so pagination is defined over
    * a caller-supplied deterministic sort (canonical: id) — documented
    * deviation, same result set.
    */
  def filteredQuery(df: DataFrame, e: Expr, orderCol: String = "id",
                    offset: Int = 0, maxResults: Int = 10000): DataFrame = {
    require(maxResults <= 10000, "max_results must be <= 10000")
    df.filter(compile(e)).orderBy(col(orderCol)).offset(offset).limit(maxResults)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document hash/repetition expressions (r6) — the remaining
  * interpreted-HOF hot spots the full-surface bench exposed once every
  * entry was timed (the curated r5 bench never ran them):
  *
  *  - [[SimHash16]]: the composable form re-evaluates the md5-per-word
  *    value array 16 times (one `aggregate` per bit — separate Column
  *    trees get no subexpression sharing in interpreted eval):
  *    22 s → sub-second at sf0.1.
  *  - [[MinKgramHash]]: one interpreted md5 Column eval per k-gram
  *    window; the fused loop reuses one MessageDigest over the
  *    normalized bytes: 25 s → ~1 s.
  *  - [[RepetitionStats]]: even linearized, five HOF passes per row
  *    cost ~5 ms/doc in interpreted eval; one JVM loop with a hash map
  *    computes all five outputs.
  *
  * Each is BIT-IDENTICAL to its composable twin (spec-pinned, like
  * [[TextStats]]/[[ArrayShingles]]); the DuckDB oracles mirror the
  * composable forms, so values are unchanged.
  */
object TextHashes {
  private[expressions] val HexChars = "0123456789abcdef".toCharArray

  private[expressions] def md5Hex(bytes: Array[Byte],
                                  md: java.security.MessageDigest): String = {
    md.reset()
    val digest = md.digest(bytes)
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(j * 2) = HexChars((digest(j) >> 4) & 0xf)
      hex(j * 2 + 1) = HexChars(digest(j) & 0xf)
      j += 1
    }
    new String(hex)
  }

  /** Non-empty whitespace tokens of lower(text) — `Dedup.words`. */
  private[expressions] def words(lowered: String): Array[String] =
    lowered.split("\\s+").filter(_.nonEmpty)

  /** `TextAnalysis.normalized`: trim ASCII spaces off lower(text), then
    * collapse whitespace runs to single spaces.
    */
  private[expressions] def normalize(lowered: String): String = {
    var s = 0
    var e = lowered.length
    while (s < e && lowered.charAt(s) == ' ') s += 1
    while (e > s && lowered.charAt(e - 1) == ' ') e -= 1
    lowered.substring(s, e).replaceAll("\\s+", " ")
  }
}

/** Fused [[graft.pipeline.Dedup.simhash16Composable]]: 16-bit simhash
  * over word frequencies, one md5 per word (the value is the first two
  * md5 bytes big-endian = the composable form's 4 hex nibbles).
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val ws = TextHashes.words(lowered)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](16)
    var w = 0
    while (w < ws.length) {
      md.reset()
      val d = md.digest(ws(w).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var j = 0
      while (j < 16) {
        if (((v >> j) & 1) == 1) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      w += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Fused [[graft.pipeline.TextAnalysis.minKgramHashComposable]]:
  * minimum md5 hex over all k-code-point windows of the normalized
  * text (md5 of the whole normalized text when shorter than k).
  */
case class MinKgramHash(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "min_kgram k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_kgram requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_kgram"

  override def nullSafeEval(input: Any): Any = {
    val norm = TextHashes.normalize(
      input.asInstanceOf[UTF8String].toLowerCase.toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val cpLen = norm.codePointCount(0, norm.length)
    if (cpLen < k)
      UTF8String.fromString(TextHashes.md5Hex(norm.getBytes(utf8), md))
    else {
      // char offset of each code-point index (windows are code-point
      // based: Column.substr semantics)
      val offs = new Array[Int](cpLen + 1)
      var ci = 0
      var cp = 0
      while (cp < cpLen) {
        offs(cp) = ci
        ci = norm.offsetByCodePoints(ci, 1)
        cp += 1
      }
      offs(cpLen) = norm.length
      var best: String = null
      var i = 0
      while (i + k <= cpLen) {
        val h = TextHashes.md5Hex(
          norm.substring(offs(i), offs(i + k)).getBytes(utf8), md)
        if (best == null || h.compareTo(best) < 0) best = h
        i += 1
      }
      UTF8String.fromString(best)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinKgramHash =
    copy(child = newChild)
}

/** Fused [[graft.pipeline.TextAnalysis.repetitionStatsComposable]]
  * columns: token count, distinct fraction, max token multiplicity,
  * max bigram multiplicity, top-bigram fraction — one pass + hash
  * maps.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_stats requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val ws = TextHashes.words(lowered)
    val n = ws.length
    val tokCounts = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    var topToken = 0
    while (i < n) {
      val c = tokCounts.merge(ws(i), 1, (a, b) => a + b)
      if (c > topToken) topToken = c
      i += 1
    }
    var topBigram = 0
    if (n >= 2) {
      val bgCounts = new java.util.HashMap[String, Int](n * 2)
      i = 0
      while (i < n - 1) {
        val c = bgCounts.merge(ws(i) + " " + ws(i + 1), 1, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    val uniqFrac =
      if (n == 0) 0.0 else tokCounts.size.toDouble / n
    val bigramFrac =
      if (n < 2) 0.0 else topBigram.toDouble / (n - 1)
    new GenericInternalRow(Array[Any](
      n, TextStats.round6(uniqFrac), topToken, topBigram,
      TextStats.round6(bigramFrac)))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("uniq_frac", DoubleType, nullable = false),
    StructField("top_token_count", IntegerType, nullable = false),
    StructField("top_bigram_count", IntegerType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
}

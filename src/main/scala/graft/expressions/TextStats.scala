package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics — every column of
  * `graft.pipeline.TextAnalysis.analyze` computed in ONE pass over the
  * document instead of ~9 interpreted higher-order-function trees
  * (Spark HOF lambdas never enter whole-stage codegen and materialize
  * an array per `aggregate`/`transform`; same pathology the fused
  * minhash banding fixed — see [[MinHashBandKeys]]).
  *
  * Output struct, BIT-IDENTICAL to the composable columns (the DuckDB
  * oracle mirrors those; `TextAnalysisSpec` proves fused ≡ composable
  * on the fixture corpus):
  *   n_tokens       INT    — whitespace tokens of lower(text)
  *   n_bpeish       INT    — matches of [a-z]+|[0-9]|[^a-z0-9 ] on lower(text)
  *   avg_token_len  DOUBLE — round(sum(len)/n, 6); 0.0 when no tokens
  *   punct_ratio    DOUBLE — round(nonAlnumSpace(lower)/len(text), 6)
  *   stopword_ratio DOUBLE — round(en-stopword hits/n, 6)
  *   quality        DOUBLE — round(0.4·min(1,n/100)+0.3·(1−punct)+0.3·stop, 6)
  *   lang_pred      STRING — argmax stopword-profile hits, tie → code order
  *   content_hash   STRING — md5 hex of whitespace-normalized lower(text)
  *
  * Parity notes: lowering reuses UTF8String.toLowerCase (what the
  * column form evaluates); token split is Java "\\s+" with empties
  * dropped (= Dedup.words); lengths and character classes are counted
  * over CODE POINTS (Spark's `length`/regex semantics); doubles are
  * combined in the column form's exact association order and rounded
  * with BigDecimal HALF_UP (Spark's `round`).
  */
case class TextStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = TextStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any = {
    val original = input.asInstanceOf[UTF8String]
    val lowered = original.toLowerCase.toString

    // --- single char scan over lower(text): code-point counts for the
    // bpeish pre-tokenizer classes and the punct numerator
    var nBpeish = 0
    var nNonAlnumSpace = 0
    var prevAlpha = false
    var i = 0
    val len = lowered.length
    while (i < len) {
      val cp = lowered.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        if (!prevAlpha) nBpeish += 1 // start of an alpha run
        prevAlpha = true
      } else {
        prevAlpha = false
        if (cp >= '0' && cp <= '9') nBpeish += 1
        else if (cp != ' ') { nBpeish += 1; nNonAlnumSpace += 1 }
      }
      i += Character.charCount(cp)
    }

    // --- single token loop: counts, length sum, stopword + lang hits
    val words = lowered.split("\\s+")
    var nTokens = 0
    var sumLen = 0
    var stopHits = 0
    val langHits = new Array[Int](TextStats.langCodes.length)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        nTokens += 1
        sumLen += word.codePointCount(0, word.length)
        if (TextStats.stopwordsEn.contains(word)) stopHits += 1
        var l = 0
        while (l < TextStats.langCodes.length) {
          if (TextStats.langProfiles(l).contains(word)) langHits(l) += 1
          l += 1
        }
      }
      w += 1
    }

    // --- derived doubles, in the column form's exact association order
    val textLen = original.numChars()
    val avgLen =
      if (nTokens == 0) 0.0 else sumLen.toDouble / nTokens
    val punct =
      if (textLen == 0) 0.0 else nNonAlnumSpace.toDouble / textLen
    val stop =
      if (nTokens == 0) 0.0 else stopHits.toDouble / nTokens
    val quality =
      0.4 * math.min(1.0, nTokens.toDouble / 100.0) +
        0.3 * (1.0 - punct) + 0.3 * stop

    // --- lang argmax, first-match-wins in profile (code) order
    var best = 0
    var l = 0
    while (l < langHits.length) {
      if (langHits(l) > best) best = langHits(l)
      l += 1
    }
    var lang = "und"
    if (best > 0) {
      var found = false
      l = 0
      while (l < langHits.length && !found) {
        if (langHits(l) == best) { lang = TextStats.langCodes(l); found = true }
        l += 1
      }
    }

    // --- content hash of the normalized text: trim spaces (Spark trim
    // strips 0x20 only), collapse \s+ runs to single spaces, md5 hex
    var s = 0
    var e = lowered.length
    while (s < e && lowered.charAt(s) == ' ') s += 1
    while (e > s && lowered.charAt(e - 1) == ' ') e -= 1
    val normalized = lowered.substring(s, e).replaceAll("\\s+", " ")
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest =
      md.digest(normalized.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(j * 2) = TextStats.HexChars((digest(j) >> 4) & 0xf)
      hex(j * 2 + 1) = TextStats.HexChars(digest(j) & 0xf)
      j += 1
    }

    new GenericInternalRow(Array[Any](
      nTokens, nBpeish,
      TextStats.round6(avgLen), TextStats.round6(punct),
      TextStats.round6(stop), TextStats.round6(quality),
      UTF8String.fromString(lang), UTF8String.fromString(new String(hex))))
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  private[expressions] val HexChars = "0123456789abcdef".toCharArray

  /** THE `TextAnalysis` constants — imported, not copied, so the fused
    * and composable forms can never drift.
    */
  private[expressions] val stopwordsEn: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.pipeline.TextAnalysis.StopwordsEn.foreach(s.add)
    s
  }

  private[expressions] val langCodes: Array[String] =
    graft.pipeline.TextAnalysis.LangProfiles.map(_._1).toArray

  private[expressions] val langProfiles: Array[java.util.HashSet[String]] =
    graft.pipeline.TextAnalysis.LangProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  /** Spark's round(_, 6): BigDecimal HALF_UP. */
  private[expressions] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

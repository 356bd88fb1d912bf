package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash-LSH band keys for one document: tokenize → word
  * n-gram shingles → k xxhash64 minima → `bands` chained band keys,
  * all in ONE tight loop per row.
  *
  * Why an Expression and not `transform`/`array_min` columns: Spark's
  * higher-order functions are evaluated INTERPRETED (they never enter
  * whole-stage codegen), and the composable form materializes the
  * shingle array plus k transformed arrays per row. Measured at sf0.1
  * (5 000 docs): composable md5 14 s, composable xxhash64 8.5 s, this
  * fused loop sub-second — the difference between hash-bound and
  * allocation-bound. This is the scale-path variant; the md5 composable
  * form remains the DuckDB-oracle-proven construction of the same LSH
  * geometry (`graft.pipeline.Dedup.minhashBandsComposable`, fused as
  * [[MinHashBandKeysMd5]]).
  *
  * Semantics: words = lowercase, split on whitespace, empties dropped
  * (same contract as `Dedup.words`); shingles are space-joined n-grams;
  * documents with fewer than n words return NULL (band keys that can
  * never equi-match — same no-candidate behavior as the composable
  * form's NULL bands). Eval is a plain Scala loop (CodegenFallback):
  * the per-row work IS the loop body, so the codegen boundary costs one
  * virtual call per row while the loop itself stays allocation-free per
  * shingle-hash.
  */
case class MinHashBandKeys(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && k >= 1 && bands >= 1 && k % bands == 0,
    s"minhash_bands requires n,k,bands >= 1 and bands | k; got n=$n k=$k bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return null
    val mins = Array.fill(k)(Long.MaxValue)
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
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0
      while (h < k) {
        val v = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
          bytes.length, h.toLong)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(mins(b * rows + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** Fused md5 MinHash-LSH band keys — bit-identical to the composable
  * oracle-proven construction in `graft.pipeline.Dedup.minhashBandsComposable`
  * (mh_i = min over shingles of md5("i:" ++ shingle) as lowercase hex;
  * band_b = md5 of the concatenation of its rows' hex strings), but
  * evaluated in ONE tight loop per row instead of k interpreted
  * higher-order-function arrays. Lowercase-hex strings compare
  * lexicographically exactly like the underlying digests compare as
  * unsigned bytes (nibble value → hex char is monotonic), so the min is
  * taken over raw 16-byte digests and hex-encoded once at the end.
  * Measured at sf0.1 (5 000 docs): composable 12 s, fused ~1 s — same
  * output, same DuckDB oracle. Returns NULL (never-matching bands, like
  * the composable form's NULL band columns) when the document has fewer
  * than n words.
  */
case class MinHashBandKeysMd5(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && k >= 1 && bands >= 1 && k % bands == 0,
    s"minhash_bands_md5 requires n,k,bands >= 1 and bands | k; got n=$n k=$k bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_bands_md5 requires a STRING argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_bands_md5"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[this] final val HexChars = "0123456789abcdef".toCharArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var j = 0
    while (j < 16) {
      val x = a(j) & 0xff
      val y = b(j) & 0xff
      if (x != y) return x < y
      j += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Array.fill[Byte](16)(-1)) // 0xff.. = +inf
    val digest = new Array[Byte](16)
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
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0
      while (h < k) {
        md.reset()
        md.update(prefixes(h))
        md.update(bytes)
        md.digest(digest, 0, 16)
        if (unsignedLess(digest, mins(h)))
          System.arraycopy(digest, 0, mins(h), 0, 16)
        h += 1
      }
      i += 1
    }
    val rows = k / bands
    val hexBuf = new Array[Byte](32 * rows)
    val bandHex = new Array[Char](32)
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      var r = 0
      while (r < rows) {
        val d = mins(b * rows + r)
        var j = 0
        while (j < 16) {
          hexBuf(r * 32 + j * 2) = HexChars((d(j) >> 4) & 0xf).toByte
          hexBuf(r * 32 + j * 2 + 1) = HexChars(d(j) & 0xf).toByte
          j += 1
        }
        r += 1
      }
      md.reset()
      md.update(hexBuf)
      md.digest(digest, 0, 16)
      var j = 0
      while (j < 16) {
        bandHex(j * 2) = HexChars((digest(j) >> 4) & 0xf)
        bandHex(j * 2 + 1) = HexChars(digest(j) & 0xf)
        j += 1
      }
      out(b) = UTF8String.fromString(new String(bandHex))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeysMd5 =
    copy(child = newChild)
}

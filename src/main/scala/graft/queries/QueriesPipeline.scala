package graft.queries

import graft.pipeline.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline entries: dedup family, similarity/ANN,
  * text analysis, multimodal plumbing. Oracle SQL is generated from the
  * same constants (hash counts, band widths, plane matrices, stopword
  * lists) the Spark operators use, so the two sides cannot drift.
  */
object QueriesPipeline {
  import QueriesCore.Entry

  /** DuckDB: lower-cased whitespace words of `documents.text`. */
  private val wordsSql =
    """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"""

  /** DuckDB word n-gram shingles from a words list named `ws`. */
  private def shinglesSql(n: Int): String =
    s"CASE WHEN len(ws) >= $n THEN list_transform(range(1, len(ws) - ${n - 2}), " +
      s"i -> array_to_string(ws[i:i+${n - 1}], ' ')) " +
      "ELSE CAST([] AS VARCHAR[]) END"

  /** Shared multimodal oracle CTEs: per-document mime dispatch
    * (doc_id mod 3), text byte list `bs` (ASCII corpus: ord == byte,
    * same idiom as the fingerprint oracles), image height `h` of the
    * 15-px-wide raster, and the exact encoded container size
    * `n_bytes` (44-byte WAV header + 2 bytes/sample; 54-byte BMP
    * header + 48-byte padded rows; PPM ASCII header + 45-byte rows).
    */
  private val MediaCtes: String = {
    // UTF-8 BYTE list, not characters: the engine feeds
    // text.getBytes(UTF_8) to the codecs (Multimodal.scala:73), so the
    // oracle must index octets. hex(encode(text)) is parsed two nibbles
    // per byte — invariant under non-ASCII fixtures, unlike the old
    // ord(substr(text, i, 1)) idiom which walked CHARACTERS and only
    // agreed because the generated corpus happened to be pure ASCII.
    val hexAlpha =
      "['0','1','2','3','4','5','6','7','8','9','A','B','C','D','E','F']"
    s"""m AS (SELECT doc_id,
      |  (['image/bmp','audio/wav','image/x-portable-pixmap'])[CAST(doc_id % 3 + 1 AS INT)] AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS len,
      |  GREATEST(1, CAST(ceil(octet_length(encode(text)) / 45.0) AS BIGINT)) AS h,
      |  list_transform(range(1, octet_length(encode(text)) + 1), i ->
      |    (list_position($hexAlpha, substr(hex(encode(text)), CAST(2*i-1 AS INT), 1)) - 1) * 16 +
      |    (list_position($hexAlpha, substr(hex(encode(text)), CAST(2*i AS INT), 1)) - 1)) AS bs
      | FROM documents),
      | mm AS (SELECT doc_id, mime, len, h, bs,
      |  CASE mime WHEN 'audio/wav' THEN 44 + 2 * len
      |            WHEN 'image/bmp' THEN 54 + 48 * h
      |            ELSE 11 + length(CAST(h AS VARCHAR)) + 45 * h END AS n_bytes
      | FROM m)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB double-precision dot product of two list expressions (strict
    * left-to-right order, mirroring Spark aggregate/zip_with).
    */
  private def dotSql(a: String, b: String, dim: Int = 64): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"

  private def cosineSql(a: String, b: String): String = {
    val d = dotSql(a, b)
    val na = s"sqrt(${dotSql(a, a)})"
    val nb = s"sqrt(${dotSql(b, b)})"
    s"CASE WHEN $na * $nb = 0 THEN 0.0 ELSE ($d) / ($na * $nb) END"
  }

  /** DuckDB CTE chain replaying [[Similarity.kmeansAssign]] (k=4,
    * iters=2) — `a2` holds the final (vec_id, cid, dist, rn) ranking.
    * Shared by embedding_kmeans and semdedup so the two entries' oracle
    * arithmetic cannot drift.
    */
  private val kmeansCtes: String =
    s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
       |   embedding AS c FROM embeddings ORDER BY vec_id LIMIT 4),
       | d1 AS (SELECT e.vec_id, c0.cid, e.embedding,
       |   ${dotSql("e.embedding", "e.embedding")}
       |   - 2 * ${dotSql("e.embedding", "c0.c")}
       |   + ${dotSql("c0.c", "c0.c")} AS dist
       |  FROM embeddings e CROSS JOIN c0),
       | a1 AS (SELECT vec_id, cid, embedding,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM d1),
       | idx AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS j),
       | el AS (SELECT a1.cid, i.j,
       |   round(avg(CAST(a1.embedding[i.j] AS DOUBLE)), 6) AS m
       |  FROM a1 CROSS JOIN idx i WHERE a1.rn = 1 GROUP BY a1.cid, i.j),
       | c1 AS (SELECT cid, list(m ORDER BY j) AS c FROM el GROUP BY cid),
       | cf AS (SELECT c0.cid,
       |   COALESCE(c1.c, list_transform(c0.c, x -> CAST(x AS DOUBLE))) AS c
       |  FROM c0 LEFT JOIN c1 USING (cid)),
       | d2 AS (SELECT e.vec_id, cf.cid,
       |   ${dotSql("e.embedding", "e.embedding")}
       |   - 2 * ${dotSql("e.embedding", "cf.c")}
       |   + ${dotSql("cf.c", "cf.c")} AS dist
       |  FROM embeddings e CROSS JOIN cf),
       | a2 AS (SELECT vec_id, cid, dist,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM d2)""".stripMargin.replace("\n", " ")

  /** DuckDB replay of [[Similarity.pqTopK]] (dim 64, m=4 subspaces of
    * 16, ksub=8, iters=2): per subspace the [[kmeansCtes]] chain on the
    * embedding SLICE, then codes from the final assignment, the
    * query-to-centroid distance table, and the ADC sum in subspace
    * order — the identical left-to-right double folds.
    */
  private def pqSql(queryVecId: Long, k: Int, m: Int = 4, ksub: Int = 8,
                    dim: Int = 64, nprobe: Int = 0): String = {
    val L = dim / m
    val sb = new StringBuilder
    sb ++= s"WITH qv AS (SELECT embedding AS qe FROM embeddings " +
      s"WHERE vec_id = $queryVecId), "
    sb ++= s"idx AS (SELECT CAST(unnest(range(1, ${L + 1})) AS INT) AS j)"
    if (nprobe > 0) {
      // IVF cell routing (the ann_ivf oracle's probe CTEs)
      sb ++= s""", cent AS (SELECT label, i,
        | avg(CAST(embedding[i] AS DOUBLE)) AS cv
        | FROM embeddings CROSS JOIN range(1, ${dim + 1}) t(i)
        | GROUP BY label, i)""".stripMargin.replace("\n", " ")
      sb ++= ", centl AS (SELECT label, list(cv ORDER BY i) AS centroid " +
        "FROM cent GROUP BY label)"
      sb ++= s", cs AS (SELECT c.label, " +
        s"${cosineSql("c.centroid", "q.qe")} AS cscore FROM centl c, qv q)"
      sb ++= s", probe AS (SELECT label FROM cs " +
        s"ORDER BY cscore DESC, label LIMIT $nprobe)"
    }
    for (s <- 0 until m) {
      val lo = s * L + 1
      val hi = s * L + L
      val sl = s"embedding[$lo:$hi]"
      sb ++= s", sv$s AS (SELECT vec_id, $sl AS sv FROM embeddings)"
      sb ++= s", c0_$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id)" +
        s" - 1 AS INT) AS cid, sv AS c FROM sv$s ORDER BY vec_id LIMIT $ksub)"
      sb ++= s", d1_$s AS (SELECT v.vec_id, c.cid, v.sv, " +
        s"${dotSql("v.sv", "v.sv")} - 2 * ${dotSql("v.sv", "c.c")} + " +
        s"${dotSql("c.c", "c.c")} AS dist FROM sv$s v CROSS JOIN c0_$s c)"
      sb ++= s", a1_$s AS (SELECT vec_id, cid, sv, row_number() OVER " +
        s"(PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1_$s)"
      sb ++= s", el_$s AS (SELECT a.cid, i.j, " +
        s"round(avg(CAST(a.sv[i.j] AS DOUBLE)), 6) AS mv " +
        s"FROM a1_$s a CROSS JOIN idx i WHERE a.rn = 1 GROUP BY a.cid, i.j)"
      sb ++= s", c1_$s AS (SELECT cid, list(mv ORDER BY j) AS c " +
        s"FROM el_$s GROUP BY cid)"
      sb ++= s", cf_$s AS (SELECT c0.cid, COALESCE(c1.c, " +
        s"list_transform(c0.c, x -> CAST(x AS DOUBLE))) AS c " +
        s"FROM c0_$s c0 LEFT JOIN c1_$s c1 USING (cid))"
      sb ++= s", d2_$s AS (SELECT v.vec_id, c.cid, " +
        s"${dotSql("v.sv", "v.sv")} - 2 * ${dotSql("v.sv", "c.c")} + " +
        s"${dotSql("c.c", "c.c")} AS dist FROM sv$s v CROSS JOIN cf_$s c)"
      sb ++= s", code$s AS (SELECT vec_id, cid AS code FROM (SELECT *, " +
        s"row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn " +
        s"FROM d2_$s) WHERE rn = 1)"
      sb ++= s", qd$s AS (SELECT c.cid, " +
        s"${dotSql(s"q.qe[$lo:$hi]", s"q.qe[$lo:$hi]")} - " +
        s"2 * ${dotSql(s"q.qe[$lo:$hi]", "c.c")} + " +
        s"${dotSql("c.c", "c.c")} AS qd FROM cf_$s c CROSS JOIN qv q)"
    }
    val joins = (0 until m).map(s =>
      s"JOIN code$s c$s USING (vec_id) JOIN qd$s q$s ON q$s.cid = c$s.code")
      .mkString(" ")
    val codeStr = (0 until m).map(s => s"CAST(c$s.code AS VARCHAR)")
      .mkString(" || ',' || ")
    val adcSum = (0 until m).map(s => s"q$s.qd").mkString(" + ")
    val base =
      if (nprobe > 0)
        "(SELECT vec_id FROM embeddings JOIN probe USING (label))"
      else "(SELECT vec_id FROM embeddings)"
    sb ++= s" SELECT e.vec_id, $codeStr AS code, round($adcSum, 6) AS adc_dist" +
      s" FROM $base e $joins" +
      s" WHERE e.vec_id <> $queryVecId ORDER BY adc_dist, e.vec_id LIMIT $k"
    sb.toString
  }

  private val K = 16   // minhash permutations
  private val BANDS = 4

  private def mh(i: Int) = f"mh$i%02d"

  /** DuckDB minhash signature columns mh00..mh15 from shingle list `sh`. */
  private val sigColsSql: String = (0 until K).map { i =>
    s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS ${mh(i)}"
  }.mkString(", ")

  private val bandColsSql: String = (0 until BANDS).map { b =>
    val parts = (0 until K / BANDS).map(r => mh(b * (K / BANDS) + r)).mkString(" || ")
    s"md5($parts) AS band$b"
  }.mkString(", ")

  private val minhashCte =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       | sh AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM w),
       | sig AS (SELECT doc_id, $sigColsSql FROM sh),
       | bands AS (SELECT doc_id, $bandColsSql FROM sig)"""
      .stripMargin.replace("\n", " ")

  /** Full-value oracle for the xxhash64 fast banding (r13, closes its
    * r5 `no_oracle` gap). DuckDB cannot recompute xxhash64 of an
    * arbitrary STRING, so the per-shingle hashes are taken as TRUSTED
    * OPAQUE LABELS from the Spark-dumped `dedup_minhash_shingle_hashes`
    * dictionary (whose own oracle pins its shingle set against pure-SQL
    * shingling — the only unverified claim is the raw label values);
    * everything downstream is recomputed independently in SQL: the
    * signed per-seed minima, and the banded chain
    * `acc_b = XXH64.hashLong(min_{b*rows+r}, acc)` from seed 42 —
    * hashLong is a FIXED-8-BYTE xxhash64, a short branch-free formula
    * of 64-bit wrapping multiplies/rotates/xors, expressed here in
    * exact UBIGINT/HUGEINT arithmetic (wrapping multiply split at 2^32
    * so the 128-bit intermediate never overflows HUGEINT). A bug in
    * the fused expression's min loop, chain order, seed, or NULL
    * handling (docs with < n words) now fails rows+schema+hash.
    */
  private lazy val minhashFastSql: String = {
    val M = "18446744073709551616" // 2^64
    val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
    val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
    val P3 = "1609587929392839161" // 0x165667B19E3779F9
    val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
    val P5 = "2870177450012600261" // 0x27D4EB2F165667C5
    def mul(a: String, c: String) =
      s"CAST(((CAST(($a) % 4294967296 AS HUGEINT) * $c) + " +
        s"((CAST(($a) // 4294967296 AS HUGEINT) * $c) % 4294967296) * " +
        s"4294967296) % $M AS UBIGINT)"
    def rotl(x: String, s: Int) =
      s"CAST(((CAST(($x) AS HUGEINT) * ${1L << s}) % $M + " +
        s"(CAST(($x) AS HUGEINT) // ${1L << (64 - s)})) AS UBIGINT)"
    def xr(a: String, b: String) =
      s"xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT))"
    def shr(x: String, s: Int) = s"(CAST(($x) AS UBIGINT) >> $s)"
    def addc(a: String, c: String) =
      s"CAST((CAST(($a) AS HUGEINT) + $c) % $M AS UBIGINT)"
    def toU(x: String) =
      s"CAST(((CAST(($x) AS HUGEINT) % $M) + $M) % $M AS UBIGINT)"
    def toS(u: String) =
      s"CAST(CASE WHEN ($u) >= 9223372036854775808 THEN " +
        s"CAST(($u) AS HUGEINT) - $M ELSE CAST(($u) AS HUGEINT) END AS BIGINT)"
    val rows = K / BANDS
    val bs = 0 until BANDS
    val dcols = (0 until K).map(h => f"h$h%02d")
    val sb = new StringBuilder
    sb ++= s"WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents), "
    sb ++= s"shl AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM w), "
    sb ++= "dict AS (SELECT * FROM " +
      "'{{OUT}}/dedup_minhash_shingle_hashes/*.parquet'), "
    sb ++= "ds AS (SELECT doc_id, unnest(sh) AS shingle FROM shl), "
    sb ++= s"js AS (SELECT ds.doc_id, ${dcols.map(c => s"dict.$c").mkString(", ")}" +
      " FROM ds LEFT JOIN dict USING (shingle)), "
    sb ++= s"sig AS (SELECT doc_id, ${(0 until K)
      .map(i => s"MIN(${dcols(i)}) AS m$i").mkString(", ")} FROM js GROUP BY doc_id), "
    sb ++= s"au AS (SELECT d.doc_id, ${(0 until K)
      .map(i => s"${toU(s"sig.m$i")} AS um$i").mkString(", ")}" +
      " FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id), "
    var prev = "au"
    for (r <- 0 until rows) {
      val carries = (0 until K).filter(i => i % rows > r).map(i => s"um$i")
      def layer(name: String, cols: Seq[String]): Unit = {
        sb ++= s"$name AS (SELECT doc_id${(carries ++ cols)
          .map(c => ", " + c).mkString} FROM $prev), "
        prev = name
      }
      def seedOf(b: Int) = if (r == 0) "CAST(42 AS UBIGINT)" else s"acc$b"
      def inOf(b: Int) = s"um${b * rows + r}"
      layer(s"r${r}a", bs.map(b => s"${addc(seedOf(b), s"$P5 + 8")} AS h$b") ++
        bs.map(b => s"${mul(inOf(b), P2)} AS k$b"))
      layer(s"r${r}b", bs.map(b => s"h$b") ++
        bs.map(b => s"${rotl(s"k$b", 31)} AS k$b"))
      layer(s"r${r}c", bs.map(b => s"${xr(s"h$b", mul(s"k$b", P1))} AS h$b"))
      layer(s"r${r}d",
        bs.map(b => s"${addc(mul(rotl(s"h$b", 27), P1), P4)} AS h$b"))
      layer(s"r${r}e", bs.map(b => s"${xr(s"h$b", shr(s"h$b", 33))} AS h$b"))
      layer(s"r${r}f", bs.map(b => s"${mul(s"h$b", P2)} AS h$b"))
      layer(s"r${r}g", bs.map(b => s"${xr(s"h$b", shr(s"h$b", 29))} AS h$b"))
      layer(s"r${r}h", bs.map(b => s"${mul(s"h$b", P3)} AS h$b"))
      layer(s"r${r}i", bs.map(b => s"${xr(s"h$b", shr(s"h$b", 32))} AS acc$b"))
    }
    sb.setLength(sb.length - 2) // trailing ", " after the last CTE
    sb ++= s" SELECT doc_id, ${bs.map(b => s"${toS(s"acc$b")} AS band$b")
      .mkString(", ")} FROM $prev ORDER BY doc_id"
    sb.toString
  }

  /** DuckDB 16-bit simhash over the words list `ws` (hex parse via
    * list_position on the digit alphabet — identical to the Spark
    * expression).
    */
  private val simhashSql: String = {
    val alpha = "['0','1','2','3','4','5','6','7','8','9','a','b','c','d','e','f']"
    def digit(p: Int) = s"(list_position($alpha, substr(md5(w), $p, 1)) - 1)"
    val hexVal = s"(${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)})"
    val bits = (0 until 16).map { j =>
      val pow = 1L << j
      val bitSum = s"list_sum(list_transform(vals, v -> CASE WHEN " +
        s"CAST(floor(v / $pow) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END))"
      s"CASE WHEN $bitSum > 0 THEN CAST($pow AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       | v AS (SELECT doc_id, list_transform(ws, w -> $hexVal) AS vals FROM w),
       | sh AS (SELECT doc_id, $bits AS simhash FROM v)"""
      .stripMargin.replace("\n", " ")
  }

  /** Full oracle for `dedup_minhash_pairs`, shared verbatim with the
    * ensemble entry (nested as a subquery there).
    */
  private lazy val minhashPairsSql: String =
    s"""$minhashCte,
       | lng AS (
       |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
       |  UNION ALL SELECT doc_id, 1, band1 FROM bands
       |  UNION ALL SELECT doc_id, 2, band2 FROM bands
       |  UNION ALL SELECT doc_id, 3, band3 FROM bands)
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       | FROM lng a JOIN lng b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Full oracle for `dedup_simhash_pairs`, shared with the ensemble. */
  private lazy val simhashPairsSql: String =
    s"""$simhashSql
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       | WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  private val planes = Similarity.planes(8, 64)

  private val lshBucketSql: String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeLit = p.map(x => s"$x.0").mkString("[", ",", "]")
      val pow = 1L << j
      s"CASE WHEN ${dotSql("embedding", planeLit)} >= 0 " +
        s"THEN CAST($pow AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"SELECT vec_id, $bits AS bucket FROM embeddings"
  }

  /** Banded-LSH long table (vec_id, band_idx, band_key) from the same
    * 16-plane seed-42 matrix [[Similarity.lshBandedPairs]] uses.
    */
  private val lshBandedSql: String = {
    val pl16 = Similarity.planes(16, 64)
    def bandKey(b: Int): String = (0 until 4).map { j =>
      val planeLit = pl16(b * 4 + j).map(x => s"$x.0").mkString("[", ",", "]")
      s"CASE WHEN ${dotSql("embedding", planeLit)} >= 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    (0 until 4).map { b =>
      s"SELECT vec_id, $b AS band_idx, ${bandKey(b)} AS band_key FROM embeddings"
    }.mkString(" UNION ALL ")
  }

  val entries: Seq[Entry] = Seq(

    // ===== Deduplication =====
    ("dedup_exact",
      (s, d) => Dedup.exact(graft.core.Tables.documents(s, d), Seq("text"), "doc_id")
        .select("canonical_id", "dup_count").orderBy("canonical_id"),
      Some("""SELECT MIN(doc_id) AS canonical_id,
        | CAST(COUNT(*) AS BIGINT) AS dup_count
        | FROM documents GROUP BY text ORDER BY canonical_id"""
        .stripMargin.replace("\n", " "))),

    ("dedup_minhash_bands",
      (s, d) => Dedup.minhashBands(graft.core.Tables.documents(s, d),
        "doc_id", "text", n = 3, k = K, bands = BANDS).orderBy("doc_id"),
      Some(s"$minhashCte SELECT doc_id, band0, band1, band2, band3 " +
        "FROM bands ORDER BY doc_id")),

    // The shingle→xxhash64 dictionary (r13): every distinct 3-gram
    // shingle with its K seeded xxhash64 values, exactly as the fused
    // MinHashBandKeys expression hashes them
    // (XXH64.hashUnsafeBytes(utf8, seed = h) == XxHash64(shingle, h)).
    // Its oracle pins the SHINGLE SET against pure-SQL shingling (LEFT
    // join from the SQL side: a shingle the output misses yields NULL
    // hash columns, an extra one a row-count mismatch); the hash values
    // themselves are the one opaque-trusted column family, consumed by
    // the fast-banding oracle below.
    ("dedup_minhash_shingle_hashes",
      (s, d) => {
        val sh = graft.core.Tables.documents(s, d)
          .select(explode(call_function("shingles", col("text"), lit(3)))
            .as("shingle"))
          .distinct()
        sh.select(col("shingle") +: (0 until K).map(h =>
          call_function("xxhash64_seed", col("shingle"), lit(h.toLong))
            .as(f"h$h%02d")): _*)
          .orderBy("shingle")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | shl AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM w),
        | ds AS (SELECT DISTINCT unnest(sh) AS shingle FROM shl),
        | o AS (SELECT * FROM '{{OUT}}/dedup_minhash_shingle_hashes/*.parquet')
        | SELECT ds.shingle, ${(0 until K).map(h => f"o.h$h%02d").mkString(", ")}
        | FROM ds LEFT JOIN o USING (shingle) ORDER BY shingle"""
        .stripMargin.replace("\n", " "))),

    // Scale-path banding (xxhash64, all-integer) — the one a 100 TB run
    // calls (and the one the bench times as the dedup scan cost). FULL
    // value oracle since r13 (was rows-only): signed minima + the
    // chained hashLong banding recomputed in DuckDB over the trusted
    // shingle-hash dictionary above — see [[minhashFastSql]].
    ("dedup_minhash_bands_fast",
      (s, d) => Dedup.minhashBandsFast(graft.core.Tables.documents(s, d),
        "doc_id", "text", n = 3, k = K, bands = BANDS).orderBy("doc_id"),
      Some(minhashFastSql)),

    // Fast-path OUTPUT verification (closes the r5 no_oracle gap from
    // the value side): full-outer join of the xxhash64 banding's
    // candidate pairs against the md5 banding's. The oracle is the md5
    // pair set with both indicators TRUE — a fast-path pair the md5
    // path lacks adds a row (rows mismatch), a missed pair flips an
    // indicator (hash mismatch). No xxhash64 port to DuckDB needed.
    ("dedup_minhash_fast_agree",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val md5P = Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, k = K, bands = BANDS).withColumn("in_md5", lit(true))
        val fastP = Dedup.minhashPairsFast(docs, "doc_id", "text",
          n = 3, k = K, bands = BANDS).withColumn("in_fast", lit(true))
        md5P.join(fastP, Seq("id_a", "id_b"), "full_outer")
          .select(col("id_a"), col("id_b"),
            coalesce(col("in_md5"), lit(false)).as("in_md5"),
            coalesce(col("in_fast"), lit(false)).as("in_fast"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""$minhashCte,
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands)
        | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |  TRUE AS in_md5, TRUE AS in_fast
        | FROM lng a JOIN lng b
        |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   AND a.doc_id < b.doc_id
        | ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // Bucket-head collisions (r7): for every occupied LSH bucket the
    // minimum doc id is the canonical head, every other member emits
    // (doc_id, dup_of = head, band_idx) — the "attach to cluster head"
    // view a continuous ingest maintains. The stateful streaming twin
    // (DedupStream.bandCollisions, flatMapGroupsWithState with one
    // claimed id per bucket as state) is spec-pinned to agree with
    // this batch view under id-ordered arrival (DedupStreamSpec).
    ("dedup_band_collisions",
      (s, d) => Dedup.bandCollisions(graft.core.Tables.documents(s, d),
        "doc_id", "text", n = 3, k = K, bands = BANDS)
        .orderBy("doc_id", "band_idx"),
      Some(s"""$minhashCte,
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands),
        | win AS (SELECT band_idx, band_key, MIN(doc_id) AS dup_of
        |  FROM lng GROUP BY 1, 2)
        | SELECT l.doc_id, n.dup_of, l.band_idx AS band_idx
        | FROM lng l JOIN win n
        |  ON l.band_idx = n.band_idx AND l.band_key = n.band_key
        | WHERE l.doc_id <> n.dup_of
        | ORDER BY l.doc_id, l.band_idx""".stripMargin.replace("\n", " "))),

    ("dedup_minhash_pairs",
      (s, d) => Dedup.minhashPairs(graft.core.Tables.documents(s, d),
        "doc_id", "text", n = 3, k = K, bands = BANDS).orderBy("id_a", "id_b"),
      Some(minhashPairsSql)),

    // EXACT set-similarity self-join by prefix filtering (zero false
    // negatives, unlike the LSH candidate paths): global rarest-first
    // token order, |x| − ⌈t·|x|⌉ + 1 prefixes, prefix-token equi-join,
    // integer cross-multiplied Jaccard gate at 1/2.
    ("dedup_prefix_join",
      (s, d) => Dedup.prefixFilterJoin(graft.core.Tables.documents(s, d),
        "doc_id", "text", n = 3, tn = 1, td = 2).orderBy("id_a", "id_b"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | s AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS sh FROM w),
        | e AS (SELECT doc_id AS id, unnest(sh) AS tk FROM s),
        | f AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS freq FROM e GROUP BY 1),
        | a0 AS (SELECT e.id, e.tk, f.freq FROM e JOIN f USING (tk)),
        | arr AS (SELECT id, list_transform(
        |    list_sort(list(struct_pack(f := freq, t := tk))), x -> x.t)
        |   AS toks FROM a0 GROUP BY id),
        | pre AS (SELECT id, toks, CAST(len(toks) AS BIGINT) AS nt,
        |   toks[1 : CAST(len(toks) - ((1 * len(toks) + 1) // 2) + 1 AS BIGINT)]
        |    AS pfx FROM arr),
        | pe AS (SELECT id, unnest(pfx) AS tk FROM pre),
        | cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |   FROM pe a JOIN pe b ON a.tk = b.tk AND a.id < b.id),
        | v AS (SELECT c.id_a, c.id_b,
        |   CAST(len(list_intersect(x.toks, y.toks)) AS BIGINT) AS inter,
        |   CAST(len(x.toks) AS BIGINT) AS na, CAST(len(y.toks) AS BIGINT) AS nb
        |  FROM cand c JOIN arr x ON x.id = c.id_a JOIN arr y ON y.id = c.id_b)
        | SELECT id_a, id_b, inter, na, nb,
        |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
        | FROM v WHERE inter * 2 >= 1 * (na + nb - inter)
        | ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("dedup_simhash",
      (s, d) => graft.core.Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simhash16(col("text")).as("simhash"))
        .orderBy("doc_id"),
      Some(s"$simhashSql SELECT doc_id, simhash FROM sh ORDER BY doc_id")),

    ("dedup_simhash_pairs",
      (s, d) => Dedup.simhashPairs(graft.core.Tables.documents(s, d),
        "doc_id", "text", radius = 3).orderBy("id_a", "id_b"),
      Some(simhashPairsSql)),

    // Signal-fusion dedup (r8e): the ensemble vote across the two
    // independent near-dup detectors — MinHash-LSH (set similarity)
    // and SimHash (weighted-feature hamming). A pair flagged by BOTH
    // is near-certain; single-method pairs carry each detector's
    // characteristic false-positive profile. One full-outer join of
    // two already-banded pair sets — candidate generation stays
    // banded, the fusion frame is pairs-sized.
    ("dedup_ensemble",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val m = Dedup.minhashPairs(docs, "doc_id", "text",
            n = 3, k = K, bands = BANDS)
          .select(col("id_a"), col("id_b"), lit(true).as("by_minhash"))
        val sp = Dedup.simhashPairs(docs, "doc_id", "text", radius = 3)
          .select(col("id_a"), col("id_b"), lit(true).as("by_simhash"))
        m.join(sp, Seq("id_a", "id_b"), "full_outer")
          .select(col("id_a"), col("id_b"),
            coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
            coalesce(col("by_simhash"), lit(false)).as("by_simhash"))
          .withColumn("votes",
            (col("by_minhash").cast("long") + col("by_simhash").cast("long")))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH mh AS (SELECT id_a, id_b FROM ($minhashPairsSql)),
        | sp AS (SELECT id_a, id_b FROM ($simhashPairsSql))
        | SELECT COALESCE(m.id_a, s.id_a) AS id_a,
        |  COALESCE(m.id_b, s.id_b) AS id_b,
        |  m.id_a IS NOT NULL AS by_minhash,
        |  s.id_a IS NOT NULL AS by_simhash,
        |  CAST((CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END)
        |   + (CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS votes
        | FROM mh m FULL OUTER JOIN sp s
        |  ON m.id_a = s.id_a AND m.id_b = s.id_b
        | ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // End of the dedup pipeline: minhash candidate pairs clustered into
    // duplicate groups (connected components, min-id canonical label).
    // Oracle: transitive closure over the same pair CTE.
    ("dedup_groups",
      (s, d) => Dedup.dupGroups(
        Dedup.minhashPairs(graft.core.Tables.documents(s, d),
          "doc_id", "text", n = 3, k = K, bands = BANDS))
        .orderBy("doc_id"),
      Some(s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |   FROM lng a JOIN lng b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |     AND a.doc_id < b.doc_id),
        | und AS (SELECT id_a AS a, id_b AS b FROM cand
        |   UNION SELECT id_b, id_a FROM cand),
        | rch AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM rch r JOIN und u ON r.b = u.a WHERE r.a <> u.b
        | )
        | SELECT n.a AS doc_id,
        |  LEAST(n.a, MIN(r.b)) AS group_id
        | FROM (SELECT DISTINCT a FROM und) n
        |  JOIN rch r ON r.a = n.a
        | GROUP BY n.a ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // The dedup story's last step: pick WHICH copy of each duplicate
    // group survives — by quality score, not min-id (the curation rule
    // real pipelines use: keep the best-written copy). Ungrouped docs
    // are their own group and always keep. One left join of the group
    // labels onto the quality table + a per-group top-1 window
    // (WindowGroupLimit heap); group count ≪ corpus.
    ("dedup_keep_best",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val groups = Dedup.dupGroups(
          Dedup.minhashPairs(docs, "doc_id", "text", n = 3, k = K,
            bands = BANDS))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("group_id")
          .orderBy(col("quality").desc, col("doc_id"))
        TextAnalysis.analyze(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
          .join(groups, Seq("doc_id"), "left")
          .withColumn("group_id", coalesce(col("group_id"), col("doc_id")))
          .withColumn("keep", row_number().over(w) === 1)
          .orderBy("doc_id")
      },
      Some(s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |   FROM lng a JOIN lng b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |     AND a.doc_id < b.doc_id),
        | und AS (SELECT id_a AS a, id_b AS b FROM cand
        |   UNION SELECT id_b, id_a FROM cand),
        | rch AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM rch r JOIN und u ON r.b = u.a WHERE r.a <> u.b
        | ),
        | grp AS (SELECT n.a AS doc_id, LEAST(n.a, MIN(r.b)) AS group_id
        |   FROM (SELECT DISTINCT a FROM und) n
        |    JOIN rch r ON r.a = n.a GROUP BY n.a),
        | stats AS ($textStatsSql),
        | g2 AS (SELECT s.doc_id, COALESCE(grp.group_id, s.doc_id)
        |    AS group_id, s.quality
        |   FROM stats s LEFT JOIN grp ON grp.doc_id = s.doc_id),
        | rk AS (SELECT doc_id, group_id, quality, row_number() OVER (
        |   PARTITION BY group_id ORDER BY quality DESC, doc_id) AS rn
        |  FROM g2)
        | SELECT doc_id, group_id, quality, rn = 1 AS keep
        | FROM rk ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Jaccard verification wired to the candidate generator it exists to
    // verify: minhash-band candidate pairs → per-pair n-gram Jaccard.
    // Work is linear in |candidates|, never corpus-quadratic.
    ("ngram_jaccard",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        Dedup.jaccardForPairs(
          Dedup.minhashPairs(docs, "doc_id", "text", n = 3, k = K, bands = BANDS),
          docs, "doc_id", "text", n = 2, threshold = 0.05)
          .orderBy("id_a", "id_b")
      },
      Some(s"""$minhashCte,
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |   FROM lng a JOIN lng b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |     AND a.doc_id < b.doc_id),
        | sh2 AS (SELECT doc_id, ${shinglesSql(2)} AS sh FROM w),
        | ex AS (SELECT doc_id AS id, unnest(list_distinct(sh)) AS sh FROM sh2),
        | sizes AS (SELECT id, COUNT(*) AS n_sh FROM ex GROUP BY id),
        | inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS inter
        |   FROM cand c
        |    JOIN ex a ON a.id = c.id_a
        |    JOIN ex b ON b.id = c.id_b AND b.sh = a.sh
        |   GROUP BY 1, 2)
        | SELECT c.id_a, c.id_b,
        |  round(COALESCE(i.inter, 0)
        |    / CAST(sa.n_sh + sb.n_sh - COALESCE(i.inter, 0) AS DOUBLE), 6)
        |    AS jaccard
        | FROM cand c
        |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |  JOIN sizes sa ON sa.id = c.id_a
        |  JOIN sizes sb ON sb.id = c.id_b
        | WHERE round(COALESCE(i.inter, 0)
        |    / CAST(sa.n_sh + sb.n_sh - COALESCE(i.inter, 0) AS DOUBLE), 6) >= 0.05
        | ORDER BY c.id_a, c.id_b""".stripMargin.replace("\n", " "))),

    // Incremental dedup: sources src0..src4 play the incoming batch,
    // the rest the existing corpus. Batch bands probe the corpus's
    // STORED banded index (memoized per session+dir via QueryCache,
    // write-invalidated — banding the corpus is an ingest cost, not a
    // per-batch cost) — no batch x batch, no corpus x corpus pairing.
    ("dedup_incremental",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val isBatch = substring(col("source"), 4, 10).cast("int") < 5
        val corpusIdx = graft.query.QueryCache.forSession(s)
          .getOrElseUpdate(s"banded-index|$d")(
            Dedup.bandedIndex(docs.filter(!isBatch), "doc_id", "text",
              n = 3, k = K, bands = BANDS))
        Dedup.incrementalDedup(
          docs.filter(isBatch), docs.filter(!isBatch),
          "doc_id", "text", n = 3, k = K, bands = BANDS,
          verifyN = 2, threshold = 0.05, corpusIndex = Some(corpusIdx))
          .orderBy("id_a", "id_b")
      },
      Some(s"""$minhashCte,
        | lng AS (
        |  SELECT doc_id, 0 AS band_idx, band0 AS band_key FROM bands
        |  UNION ALL SELECT doc_id, 1, band1 FROM bands
        |  UNION ALL SELECT doc_id, 2, band2 FROM bands
        |  UNION ALL SELECT doc_id, 3, band3 FROM bands),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |   FROM lng a JOIN lng b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   JOIN documents da ON da.doc_id = a.doc_id
        |    AND CAST(substr(da.source, 4) AS INT) < 5
        |   JOIN documents db ON db.doc_id = b.doc_id
        |    AND CAST(substr(db.source, 4) AS INT) >= 5),
        | sh2 AS (SELECT doc_id, ${shinglesSql(2)} AS sh FROM w),
        | ex AS (SELECT doc_id AS id, unnest(list_distinct(sh)) AS sh FROM sh2),
        | sizes AS (SELECT id, COUNT(*) AS n_sh FROM ex GROUP BY id),
        | inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS inter
        |   FROM cand c
        |    JOIN ex a ON a.id = c.id_a
        |    JOIN ex b ON b.id = c.id_b AND b.sh = a.sh
        |   GROUP BY 1, 2)
        | SELECT c.id_a, c.id_b,
        |  round(COALESCE(i.inter, 0)
        |    / CAST(sa.n_sh + sb.n_sh - COALESCE(i.inter, 0) AS DOUBLE), 6)
        |    AS jaccard
        | FROM cand c
        |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |  JOIN sizes sa ON sa.id = c.id_a
        |  JOIN sizes sb ON sb.id = c.id_b
        | WHERE round(COALESCE(i.inter, 0)
        |    / CAST(sa.n_sh + sb.n_sh - COALESCE(i.inter, 0) AS DOUBLE), 6) >= 0.05
        | ORDER BY c.id_a, c.id_b""".stripMargin.replace("\n", " "))),

    // ===== Similarity / ANN =====
    ("ann_topk",
      (s, d) => Similarity.bruteForceTopK(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        | SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qe")}, 6) AS score
        | FROM embeddings e, q WHERE e.vec_id <> 0
        | ORDER BY score DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    // Inner-product retrieval (MIPS — the embedding-service metric) and
    // L2 retrieval: same broadcast-query + per-partition-k-heap shape
    // as cosine, different scored column; L2 via the dot expansion (no
    // per-element subtraction array).
    ("ann_topk_mips",
      (s, d) => Similarity.topKBy(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10,
        Similarity.dotNative(_, _)),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        | SELECT e.vec_id, round(${dotSql("e.embedding", "q.qe")}, 6) AS score
        | FROM embeddings e, q WHERE e.vec_id <> 0
        | ORDER BY score DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    ("ann_topk_l2",
      (s, d) => Similarity.topKBy(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10,
        Similarity.l2sq, ascending = true),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        | SELECT e.vec_id, round(${dotSql("e.embedding", "e.embedding")}
        |   - 2 * ${dotSql("e.embedding", "q.qe")}
        |   + ${dotSql("q.qe", "q.qe")}, 6) AS score
        | FROM embeddings e, q WHERE e.vec_id <> 0
        | ORDER BY score ASC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    // Product quantization (r8d): per-subspace codebooks (the kmeans
    // fit on each 16-dim slice), corpus encoded as 4 nearest-centroid
    // ids in ONE projection, queries answered by asymmetric distance
    // computation (query-to-centroid table indexed by the row's
    // codes). 256-byte vectors become 4-byte codes — the memory-bound
    // compression path a 100-TB vector corpus needs; the full
    // fit → encode → ADC chain replays in SQL.
    ("ann_pq",
      (s, d) => Similarity.pqTopK(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10),
      Some(pqSql(queryVecId = 0, k = 10))),

    // IVF+PQ (r8d): the FAISS-popularized composition — cell routing
    // prunes to nprobe cells (broadcast probe + left-semi = partition
    // pruning on a cell-partitioned table), global codebooks compress,
    // ADC ranks only surviving codes. One oracle replays routing +
    // fit + encode + ADC end to end.
    ("ann_ivfpq",
      (s, d) => Similarity.ivfPqTopK(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10,
        nprobe = 2),
      Some(pqSql(queryVecId = 0, k = 10, nprobe = 2))),

    // int8 quantize-then-rescore: integer-dot candidate pool, exact
    // float cosine re-rank — the memory-bandwidth-bound 100-TB layout.
    // Quantization (round half away from zero) and the integer dot are
    // exact in both engines, so the full pipeline is oracle-checkable.
    ("ann_topk_quant",
      (s, d) => Similarity.quantizedTopK(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10,
        candidates = 100),
      Some(s"""WITH base AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |    AS maxabs FROM embeddings),
        | qt AS (SELECT vec_id, embedding,
        |  CASE WHEN maxabs = 0 THEN CAST(1.0 AS DOUBLE)
        |   ELSE CAST(127.0 AS DOUBLE) / maxabs END AS scale FROM base),
        | qv AS (SELECT vec_id, embedding, scale,
        |  list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS q
        |  FROM qt),
        | qrow AS (SELECT q AS qq, scale AS qscale, embedding AS qvec
        |  FROM qv WHERE vec_id = 0),
        | cand AS (SELECT vec_id, embedding, qvec,
        |  CAST(list_sum(list_transform(range(1, 65), i -> q[i] * qq[i]))
        |    AS DOUBLE) / (scale * qscale) AS approx
        |  FROM qv, qrow WHERE vec_id <> 0
        |  ORDER BY approx DESC, vec_id LIMIT 100)
        | SELECT vec_id, round(${cosineSql("embedding", "qvec")}, 6) AS score
        | FROM cand ORDER BY score DESC, vec_id LIMIT 10"""
        .stripMargin.replace("\n", " "))),

    ("ann_topk_native",
      // same oracle as ann_topk: the native codegen expression is
      // bit-identical to the composable form by construction
      (s, d) => Similarity.bruteForceTopKNative(
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        | SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qe")}, 6) AS score
        | FROM embeddings e, q WHERE e.vec_id <> 0
        | ORDER BY score DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    // Probes a MEMOIZED centroid index (built once per session+dir via
    // QueryCache, write-invalidated like the graph views) — the "train
    // once at ingest, probe per query" IVF contract; the oracle
    // rebuilds the same deterministic centroids inline.
    ("ann_ivf",
      (s, d) => Similarity.ivfTopKWith(
        graft.query.QueryCache.forSession(s)
          .getOrElseUpdate(s"ivf-centroids|$d")(
            Similarity.ivfCentroids(graft.core.Tables.embeddings(s, d))),
        graft.core.Tables.embeddings(s, d), queryVecId = 0, k = 10, nprobe = 2),
      Some(s"""WITH cent AS (
        |  SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS cv
        |  FROM embeddings CROSS JOIN range(1, 65) t(i) GROUP BY label, i),
        | centl AS (SELECT label, list(cv ORDER BY i) AS centroid
        |   FROM cent GROUP BY label),
        | q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        | cs AS (SELECT c.label, ${cosineSql("c.centroid", "q.qe")} AS cscore
        |   FROM centl c, q),
        | probe AS (SELECT label FROM cs ORDER BY cscore DESC, label LIMIT 2)
        | SELECT e.vec_id, round(${cosineSql("e.embedding", "q.qe")}, 6) AS score
        | FROM embeddings e JOIN probe USING (label), q
        | WHERE e.vec_id <> 0
        | ORDER BY score DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    // The SCALE path for embedding near-dup: banded-LSH candidates →
    // exact cosine verify. No all-pairs join anywhere in the plan.
    ("ann_neardup_lsh",
      (s, d) => Similarity.lshNearDupPairs(
        graft.core.Tables.embeddings(s, d), threshold = 0.45)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH lb AS ($lshBandedSql),
        | cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |   FROM lb a JOIN lb b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |     AND a.vec_id < b.vec_id)
        | SELECT c.id_a, c.id_b,
        |  round(${cosineSql("ea.embedding", "eb.embedding")}, 6) AS cos
        | FROM cand c
        |  JOIN embeddings ea ON ea.vec_id = c.id_a
        |  JOIN embeddings eb ON eb.vec_id = c.id_b
        | WHERE round(${cosineSql("ea.embedding", "eb.embedding")}, 6) >= 0.45
        | ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    // Batched k-NN self-join — the k-NN GRAPH every embedding pipeline
    // builds (dedup clustering, retrieval eval): per-vector top-5 among
    // banded-LSH candidates, exact cosine, candidate-bounded end to end
    // (the many-query counterpart of ann_topk; never an n² score
    // matrix). Oracle replays the same bands → candidates → window.
    ("ann_knn_join",
      (s, d) => Similarity.knnJoin(
        graft.core.Tables.embeddings(s, d), k = 5)
        .orderBy("id", "rnk"),
      Some(s"""WITH lb AS ($lshBandedSql),
        | cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |   FROM lb a JOIN lb b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |     AND a.vec_id < b.vec_id),
        | sym AS (SELECT id_a, id_b FROM cand
        |   UNION ALL SELECT id_b, id_a FROM cand),
        | sc AS (SELECT s.id_a AS id, s.id_b AS neighbor,
        |   round(${cosineSql("ea.embedding", "eb.embedding")}, 6) AS cos
        |  FROM sym s JOIN embeddings ea ON ea.vec_id = s.id_a
        |   JOIN embeddings eb ON eb.vec_id = s.id_b),
        | r AS (SELECT id, neighbor, cos,
        |   row_number() OVER (PARTITION BY id ORDER BY cos DESC, neighbor) AS rnk
        |  FROM sc)
        | SELECT id, neighbor, cos, rnk FROM r WHERE rnk <= 5
        | ORDER BY id, rnk""".stripMargin.replace("\n", " "))),

    // The EXACT small-n cross-check for ann_neardup_lsh (quadratic by
    // definition — kept registered as the recall oracle, within-block /
    // small-n use only; SimilaritySpec asserts lsh ⊆ exact).
    ("embedding_neardup",
      (s, d) => Similarity.nearDupPairs(
        graft.core.Tables.embeddings(s, d), threshold = 0.45)
        .orderBy("id_a", "id_b"),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        | WHERE round(${cosineSql("a.embedding", "b.embedding")}, 6) >= 0.45
        | ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("lsh_buckets",
      (s, d) => graft.core.Tables.embeddings(s, d)
        .select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), planes).as("bucket"))
        .orderBy("vec_id"),
      Some(s"WITH b AS ($lshBucketSql) SELECT vec_id, bucket FROM b ORDER BY vec_id")),

    // Token-window chunking with overlap (context-window prep): one
    // map-only transform+explode per document, output chunk-sized —
    // chunkSize=24 / overlap=6 so the ~60-word fixture docs produce
    // multi-chunk coverage including ragged tails.
    ("text_chunking",
      (s, d) => TextAnalysis.chunkDocs(
        graft.core.Tables.documents(s, d), "doc_id", "text",
        chunkSize = 24, overlap = 6).orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | p AS (SELECT doc_id, ws, len(ws) AS nw,
        |  CASE WHEN len(ws) <= 24 THEN 1
        |   ELSE 1 + (len(ws) - 24 + 17) // 18 END AS c FROM w),
        | e AS (SELECT doc_id, ws, nw, unnest(range(0, c)) AS i FROM p)
        | SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(least(24, nw - i * 18) AS INT) AS n_tokens,
        |  array_to_string(ws[CAST(1 + i * 18 AS INT):CAST(i * 18 + 24 AS INT)], ' ')
        |    AS chunk_text
        | FROM e ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "))),

    // Johnson–Lindenstrauss random projection (r8e): 64-d → 8-d via
    // the deterministic Achlioptas sparse sign matrix (2/3 zeros)
    // scaled by sqrt(3/8) — the data-independent dim reduction before
    // LSH/clustering. Map-only; each output dim is one fixed-order
    // codegen sum, literal matrix shared with the oracle.
    ("embedding_random_projection",
      (s, d) => Similarity.randomProjection(
          graft.core.Tables.embeddings(s, d))
        .orderBy("vec_id"),
      Some(Similarity.randomProjectionSql())),

    // Model-based quality gate: linear score (deterministic integer
    // weights standing in for trained classifier weights) + corpus
    // percentile cutoff — score is map-only, the cutoff is ONE global
    // aggregate broadcast back; the corpus is never sorted.
    ("embedding_score_filter",
      (s, d) => Similarity.scoreFilter(
        graft.core.Tables.embeddings(s, d), keepFrac = 0.3)
        .orderBy("vec_id"),
      Some {
        val wLit = Similarity.qualityWeights(64, 7L)
          .map(x => s"$x.0").mkString("[", ",", "]")
        s"""WITH s AS (SELECT vec_id,
          |  round(${dotSql("embedding", wLit)}, 6) AS score FROM embeddings),
          | c AS (SELECT round(quantile_cont(score, CAST(0.7 AS DOUBLE)), 4)
          |   AS cut FROM s)
          | SELECT vec_id, score, score >= cut AS keep
          | FROM s, c ORDER BY vec_id""".stripMargin.replace("\n", " ")
      }),

    // Quality TIERS (r7): equal-population decile binning by global
    // score rank (tier 1 = best) — the binning a mixture recipe
    // weights by. Rank assigned distributed (range repartition +
    // per-partition row_number + offsets); the oracle is the single
    // global window the assignment provably equals.
    ("embedding_score_tiers",
      (s, d) => Similarity.scoreDeciles(
        graft.core.Tables.embeddings(s, d)).orderBy("pos"),
      Some {
        val wLit = Similarity.qualityWeights(64, 7L)
          .map(x => s"$x.0").mkString("[", ",", "]")
        s"""WITH sc AS (SELECT vec_id,
          |  round(${dotSql("embedding", wLit)}, 6) AS score FROM embeddings),
          | r AS (SELECT vec_id, score,
          |   row_number() OVER (ORDER BY score DESC, vec_id) AS pos,
          |   COUNT(*) OVER () AS n FROM sc)
          | SELECT vec_id, score, pos,
          |  CAST((pos - 1) * 10 // n + 1 AS INT) AS tier
          | FROM r ORDER BY pos""".stripMargin.replace("\n", " ")
      }),

    // Deterministic Lloyd k-means (k=4, 2 rounds): seed = 4 lowest-id
    // vectors, argmin assignment with lowest-cid tie-break, element
    // means rounded to 6 dp so both engines' update step is identical
    // regardless of summation order. The oracle replays both rounds;
    // an emptied cluster keeps its seed centroid on both sides.
    ("embedding_kmeans",
      (s, d) => Similarity.kmeansAssign(
        graft.core.Tables.embeddings(s, d), k = 4, iters = 2)
        .orderBy("vec_id"),
      Some(s"""WITH $kmeansCtes
        | SELECT vec_id, cid AS cluster, round(dist, 6) AS dist
        | FROM a2 WHERE rn = 1 ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    // Embedding-space outliers (r8e): distance-to-centroid MAD rule —
    // the anomaly filter an embedding pipeline runs after clustering
    // (mislabeled/garbled vectors sit far from every centroid). The
    // kmeans assignment is the shared machinery; per-cluster median +
    // MAD are the exact-percentile convention of events_outliers, both
    // broadcast back; the flag is one map-side compare.
    ("embedding_outliers",
      (s, d) => {
        val asg = Similarity.kmeansAssign(
          graft.core.Tables.embeddings(s, d), k = 4, iters = 2)
        val med = asg.groupBy("cluster")
          .agg(round(percentile(col("dist"), lit(0.5)), 4).as("med"))
        val wm = asg.join(broadcast(med), Seq("cluster"))
        val mad = wm.groupBy("cluster")
          .agg(round(percentile(abs(col("dist") - col("med")), lit(0.5)), 4)
            .as("mad"))
        wm.join(broadcast(mad), Seq("cluster"))
          .filter(col("dist") - col("med") > col("mad") * lit(3.0))
          .select(col("vec_id"), col("cluster"), col("dist"),
            col("med"), col("mad"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $kmeansCtes,
        | asg AS (SELECT vec_id, cid AS cluster, round(dist, 6) AS dist
        |   FROM a2 WHERE rn = 1),
        | med AS (SELECT cluster, round(quantile_cont(dist, 0.5), 4) AS med
        |   FROM asg GROUP BY 1),
        | wm AS (SELECT asg.*, med.med FROM asg JOIN med USING (cluster)),
        | mad AS (SELECT cluster,
        |   round(quantile_cont(abs(dist - med), 0.5), 4) AS mad
        |  FROM wm GROUP BY 1)
        | SELECT vec_id, cluster, dist, med, mad
        | FROM wm JOIN mad USING (cluster)
        | WHERE dist - med > mad * CAST(3.0 AS DOUBLE)
        | ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    // SemDeDup: semantic dedup = the kmeans assignment as the BLOCKING
    // scheme, cosine only within a cell, drop any vector with a
    // similar lower-id cluster-mate. The oracle replays the identical
    // kmeans chain (shared CTE text) and the identical keep rule.
    ("semdedup",
      (s, d) => Similarity.semDedup(
        graft.core.Tables.embeddings(s, d), k = 4, iters = 2,
        threshold = 0.45)
        .orderBy("vec_id"),
      Some(s"""WITH $kmeansCtes,
        | asg AS (SELECT vec_id, cid FROM a2 WHERE rn = 1),
        | pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id
        |  WHERE round(${cosineSql("ea.embedding", "eb.embedding")}, 6)
        |    >= CAST(0.45 AS DOUBLE)),
        | dup AS (SELECT DISTINCT id_b FROM pr)
        | SELECT asg.vec_id, asg.cid AS cluster, dup.id_b IS NULL AS keep
        | FROM asg LEFT JOIN dup ON dup.id_b = asg.vec_id
        | ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    // ===== Text analysis =====
    ("text_stats",
      (s, d) => TextAnalysis.analyze(
        graft.core.Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      Some(textStatsSql)),

    // Quality tiers on the TEXT side (r7): equal-population deciles of
    // the text-stats quality score by distributed global rank — the
    // concrete binning a mixture recipe weights by ("3 epochs of tier
    // 1, drop tier 10"), same rank machinery as corpus_shuffle /
    // embedding_score_tiers, the fused text_stats expression doing the
    // scoring map-side.
    ("text_quality_tiers",
      (s, d) => {
        val q = TextAnalysis.analyze(
            graft.core.Tables.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        val (ranked, n) = graft.pipeline.Sampling.globalRankBy(q,
          Seq(col("quality").desc, col("doc_id")))
        val total = n max 1L
        ranked.select(col("doc_id"), col("quality"), col("pos"),
          (expr(s"((pos - 1) * 10) div ${total}L") + 1L)
            .cast("int").as("tier"))
          .orderBy("pos")
      },
      Some(s"""WITH t AS ($textStatsSql),
        | r AS (SELECT doc_id, quality,
        |   row_number() OVER (ORDER BY quality DESC, doc_id) AS pos,
        |   COUNT(*) OVER () AS n FROM t)
        | SELECT doc_id, quality, pos,
        |  CAST((pos - 1) * 10 // n + 1 AS INT) AS tier
        | FROM r ORDER BY pos""".stripMargin.replace("\n", " "))),

    ("text_tfidf",
      (s, d) => TextAnalysis.tfidf(
        graft.core.Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "term"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | ex AS (SELECT doc_id, unnest(ws) AS term FROM w),
        | tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex
        |   GROUP BY doc_id, term),
        | dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term),
        | n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
        | SELECT doc_id, term, tf, dfreq,
        |  round(tf * ln(n_docs / CAST(dfreq AS DOUBLE)), 6) AS tfidf
        | FROM tf JOIN dfreq USING (term), n
        | ORDER BY doc_id, term""".stripMargin.replace("\n", " "))),

    // Sequence packing: concat-then-chunk window assignment per shard
    // (bin = window the doc starts in at a 4096-token budget).
    ("text_pack_windows",
      (s, d) => TextAnalysis.packIntoWindows(
        graft.core.Tables.documents(s, d), "doc_id", "text", "source", 4096)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, source, $wordsSql AS ws FROM documents),
        | t AS (SELECT doc_id, source AS shard,
        |   CAST(len(ws) AS INT) AS n_tokens FROM w),
        | c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
        |   PARTITION BY shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
        | SELECT doc_id, shard, n_tokens,
        |  CAST(FLOOR(cb / 4096) AS BIGINT) AS bin_idx
        | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // PII scan + redaction. The fixture corpus is digit-free, so the
    // query augments each doc with synthetic identifiers DERIVED FROM
    // doc_id (same expression in both engines) — the regex extraction,
    // counting, and global redaction are what's under test. Patterns
    // are shared literals, restricted to the Java-regex ∩ RE2 dialect.
    ("text_pii_scan",
      (s, d) => {
        val aug = graft.core.Tables.documents(s, d).select(
          col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com via 10.0."),
            col("doc_id") % 256, lit(".7 ref 123-45-6789")).as("text"))
        TextAnalysis.piiScan(aug, "doc_id", "text").orderBy("doc_id")
      },
      Some("""WITH aug AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com via 10.0.'
        |    || (doc_id % 256) || '.7 ref 123-45-6789' AS text
        |  FROM documents)
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ids,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g')) AS redacted_hash
        | FROM aug ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Corpus-wide exact top terms: two-stage count + TakeOrdered — the
    // vocabulary/frequency report every corpus build starts with.
    ("corpus_top_terms",
      (s, d) => TextAnalysis.topTerms(
        graft.core.Tables.documents(s, d), "text", 50),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | ex AS (SELECT unnest(ws) AS term FROM w)
        | SELECT term, COUNT(*) AS cnt FROM ex GROUP BY term
        | ORDER BY cnt DESC, term LIMIT 50""".stripMargin.replace("\n", " "))),

    // PMI collocations: phrase-mining / tokenizer-merge candidates —
    // top bigrams by pointwise mutual information, min pair count 5.
    // Counts exact LONGs; the PMI ratio is one fixed-order DOUBLE
    // expression, so ln() agrees bit-for-bit engine-to-engine.
    ("corpus_pmi",
      (s, d) => TextAnalysis.pmiCollocations(
        graft.core.Tables.documents(s, d), "doc_id", "text"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | tot AS (SELECT SUM(len(ws)) AS t,
        |   SUM(GREATEST(len(ws) - 1, 0)) AS tb FROM w),
        | uni AS (SELECT w1 AS w, COUNT(*) AS cu FROM
        |   (SELECT unnest(ws) AS w1 FROM w) GROUP BY 1),
        | bi AS (SELECT unnest(CASE WHEN len(ws) >= 2
        |   THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |   ELSE CAST([] AS VARCHAR[]) END) AS big FROM w),
        | cb AS (SELECT big, COUNT(*) AS pair_count FROM bi GROUP BY 1
        |   HAVING COUNT(*) >= 5),
        | sp AS (SELECT (string_split(big, ' '))[1] AS w1,
        |   (string_split(big, ' '))[2] AS w2, pair_count FROM cb)
        | SELECT sp.w1, sp.w2, sp.pair_count,
        |  round(ln((CAST(sp.pair_count AS DOUBLE) * tot.t * tot.t)
        |    / (CAST(tot.tb AS DOUBLE) * u1.cu * u2.cu)), 4) AS pmi
        | FROM sp JOIN uni u1 ON u1.w = sp.w1 JOIN uni u2 ON u2.w = sp.w2, tot
        | ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin.replace("\n", " "))),

    // BPE merge training (r8d): the first 8 tokenizer merges induced
    // from the corpus — corpus-scale work is ONE word-type count; the
    // merge loop runs on the vocabulary-sized type table with a 1-row
    // driver argmax per round. The wrapped-symbol-string representation
    // makes `replace` exactly BPE's greedy left-to-right application in
    // both engines (see TextAnalysis.bpeMerges).
    ("text_bpe_merges",
      (s, d) => TextAnalysis.bpeMerges(
        graft.core.Tables.documents(s, d), "text", rounds = 8)
        .orderBy("merge_round"),
      Some(TextAnalysis.bpeMergesSql(rounds = 8))),

    // BPE encoding (r8e): apply the 8 trained merges to the corpus and
    // count per-doc tokens — the tokenizer-application half of the
    // loop, the number token budgets and mixture weights are
    // denominated in. Encoding runs on the word-TYPE table (the same
    // BPE-on-types trick as training), then one join back to per-doc
    // counts; the oracle replays training + encoding from the data.
    ("text_bpe_encode",
      (s, d) => TextAnalysis.bpeEncodeStats(
        graft.core.Tables.documents(s, d), "doc_id", "text", rounds = 8)
        .orderBy("doc_id"),
      Some(TextAnalysis.bpeEncodeStatsSql(rounds = 8))),

    // TextRank keyword extraction (r8e): PageRank over the word
    // co-occurrence graph (±2 window, undirected) — the graph engine
    // and the text pipeline composing: the SAME fixed-point LONG
    // power iteration as graph_pagerank runs on a VOCABULARY-sized
    // graph distilled from the corpus (co-occurrence build is one
    // zip_with projection + a distinct), and the oracle reuses the
    // generated pagerankSql over the word-edge CTE verbatim.
    ("text_keywords_textrank",
      (s, d) => {
        val ws = TextAnalysis.tokens(col("text"))
        def pairsAt(k: Int) = when(size(ws) >= k + 1,
          zip_with(slice(ws, lit(1), size(ws) - k),
            slice(ws, lit(k + 1), size(ws)),
            (x, y) => struct(x.as("a"), y.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
        val p = graft.core.Tables.documents(s, d)
          .select(explode(concat(pairsAt(1), pairsAt(2))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .filter(col("a") =!= col("b"))
        // WEIGHTED rank (w = co-occurrence count): on a small shared
        // vocabulary the unweighted co-occurrence graph is nearly
        // complete and uniform-rank; the counts carry the signal
        val ew = p.select(col("a").as("src"), col("b").as("dst"))
          .union(p.select(col("b").as("src"), col("a").as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.graph.GraphAnalytics.pagerankWeighted(ew, iters = 5)
          .orderBy(col("rank").desc, col("id")).limit(25)
      },
      Some {
        val weightedEdges =
          s"""SELECT src, dst, w FROM (
            | WITH cw AS (SELECT $wordsSql AS ws FROM documents),
            | p1 AS (SELECT unnest(ws[1:len(ws)-1]) AS a,
            |   unnest(ws[2:len(ws)]) AS b FROM cw WHERE len(ws) >= 2),
            | p2 AS (SELECT unnest(ws[1:len(ws)-2]) AS a,
            |   unnest(ws[3:len(ws)]) AS b FROM cw WHERE len(ws) >= 3),
            | pp AS (SELECT a, b FROM (SELECT * FROM p1
            |   UNION ALL SELECT * FROM p2) WHERE a <> b)
            | SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM
            |  (SELECT a AS src, b AS dst FROM pp
            |   UNION ALL SELECT b, a FROM pp) GROUP BY 1, 2)"""
            .stripMargin.replace("\n", " ")
        s"SELECT id, rank FROM (${graft.graph.GraphAnalytics
          .pagerankWeightedSql(weightedEdges, iters = 5)}) " +
          "ORDER BY rank DESC, id LIMIT 25"
      }),

    // SymSpell fuzzy term lookup (r8e): typo-tolerant vocabulary match
    // via deletion-neighborhood blocking — every edit-distance-≤1 pair
    // collides on a shared delete key (zero false negatives),
    // levenshtein verifies only the collision set. The delete index is
    // vocabulary-sized; the query batch broadcasts map-side.
    ("text_fuzzy_lookup",
      (s, d) => TextAnalysis.fuzzyLookup(
        graft.core.Tables.documents(s, d), "text",
        Seq("joim", "hask", "filtr", "scann", "vektor")),
      Some {
        val qs = Seq("joim", "hask", "filtr", "scann", "vektor")
          .map(q => s"'$q'").mkString("[", ", ", "]")
        val delSql = (t: String) => s"list_distinct(list_append(" +
          s"list_transform(range(1, length($t) + 1), i -> " +
          s"substr($t, 1, CAST(i - 1 AS INT)) || " +
          s"substr($t, CAST(i + 1 AS INT))), $t))"
        s"""WITH dw AS (SELECT unnest($wordsSql) AS term FROM documents),
          | voc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
          |   FROM dw GROUP BY 1),
          | vd AS (SELECT term, cnt, unnest(${delSql("term")}) AS key
          |   FROM voc),
          | q AS (SELECT unnest($qs) AS query),
          | qd AS (SELECT query, unnest(${delSql("query")}) AS key FROM q),
          | cand AS (SELECT DISTINCT query, term, cnt
          |   FROM vd JOIN qd USING (key))
          | SELECT query, term,
          |  CAST(levenshtein(query, term) AS BIGINT) AS dist, cnt
          | FROM cand WHERE levenshtein(query, term) <= 1
          | ORDER BY query, dist, cnt DESC, term"""
          .stripMargin.replace("\n", " ")
      }),

    // Composite quality router: first-match reject reason per doc, one
    // map-only pass over the analyze() metrics. Thresholds compare the
    // same 6-dp-rounded columns in both engines.
    ("corpus_filter_decisions",
      (s, d) => TextAnalysis.filterDecisions(
        graft.core.Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH stats AS ($textStatsSql),
        | dec AS (SELECT doc_id,
        |  CASE WHEN n_tokens < 10 THEN 'too_short'
        |   WHEN quality < CAST(0.35 AS DOUBLE) THEN 'low_quality'
        |   WHEN punct_ratio > CAST(0.2 AS DOUBLE) THEN 'high_punct'
        |   ELSE 'keep' END AS reason FROM stats)
        | SELECT doc_id, reason, reason = 'keep' AS keep
        | FROM dec ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("doc_fingerprint",
      (s, d) => graft.core.Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.contentHash(col("text")).as("content_hash"),
        TextAnalysis.minKgramHash(col("text"), 8).as("min_kgram"))
        .orderBy("doc_id"),
      Some("""WITH n AS (SELECT doc_id,
        |  regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents)
        | SELECT doc_id, md5(norm) AS content_hash,
        |  CASE WHEN length(norm) < 8 THEN md5(norm)
        |   ELSE list_min(list_transform(range(1, length(norm) - 6),
        |     i -> md5(substr(norm, i, 8)))) END AS min_kgram
        | FROM n ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // ===== Multimodal plumbing =====
    // r6: payloads are REAL containers (PCM WAV / 24-bit BMP with
    // stride padding / binary P6) synthesized from each document's
    // bytes, and decodeFeatures actually parses them (RIFF chunk walk,
    // DIB header + bottom-up rows, P6 grammar; content-sniffed
    // dispatch). The oracle replays the expected geometry and sample
    // aggregates from `text` directly — a decoder that mis-reads a
    // header, the row stride, or the sample width hash-mismatches.
    // Shared CTE: mime dispatch, text byte length, image height
    // (15-px-wide raster), and per-container encoded size.
    ("multimodal_meta",
      (s, d) => Multimodal.toMedia(graft.core.Tables.documents(s, d))
        .select("doc_id", "mime", "n_bytes").orderBy("doc_id"),
      Some(s"""WITH $MediaCtes
        | SELECT doc_id, mime, n_bytes FROM mm
        | ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("multimodal_frames",
      (s, d) => Multimodal.frameSample(
        Multimodal.toMedia(graft.core.Tables.documents(s, d)))
        .orderBy("doc_id", "frame_idx"),
      Some(s"""WITH $MediaCtes
        | SELECT doc_id, mime, frame_idx, CAST(frame_idx AS BIGINT) * 256 AS offset
        | FROM (SELECT doc_id, mime,
        |   CAST(unnest(range(0, CAST(ceil(n_bytes / 256.0) AS INT), 4)) AS INT)
        |     AS frame_idx FROM mm)
        | ORDER BY doc_id, frame_idx""".stripMargin.replace("\n", " "))),

    // Fixed-shape preprocess (r7): nearest-neighbor resize of images
    // to 8×8 RGB / nearest resample of audio to 64 samples — the
    // normalize-to-tensor step of a multimodal training pipeline,
    // map-only over the media table. The oracle replays the identical
    // integer sampling grid over the construction bytes (zero-padded
    // image tail = COALESCE 0 past len).
    ("multimodal_resize",
      (s, d) => Multimodal.resizeFeatures(
        Multimodal.toMedia(graft.core.Tables.documents(s, d)))
        .toDF().orderBy("doc_id"),
      Some(s"""WITH $MediaCtes
        | SELECT doc_id, mime,
        |  CASE WHEN mime = 'audio/wav' THEN len ELSE 15 END AS in_dim1,
        |  CASE WHEN mime = 'audio/wav' THEN 8000 ELSE h END AS in_dim2,
        |  CAST(CASE WHEN mime = 'audio/wav' THEN 64 ELSE 192 END
        |    AS BIGINT) AS out_units,
        |  CAST(CASE WHEN mime = 'audio/wav' THEN
        |    CASE WHEN len = 0 THEN 0
        |     ELSE COALESCE(list_sum(list_transform(range(0, 64), i ->
        |       abs((COALESCE(bs[CAST(i * len // 64 + 1 AS INT)], 128) - 128)
        |         * 256))), 0) END
        |   ELSE COALESCE(list_sum(flatten(list_transform(range(0, 8), y ->
        |     flatten(list_transform(range(0, 8), x ->
        |       list_transform(range(0, 3), c ->
        |         COALESCE(bs[CAST(((y * h // 8) * 15 + (x * 15 // 8)) * 3
        |           + c + 1 AS INT)], 0))))))), 0) END AS BIGINT) AS sum_out
        | FROM mm ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Audio segmentation (r8e): VAD-shaped energy thresholding — frame
    // the decoded PCM into 40-sample windows, Σ|sample| per frame
    // (exact integer), merge consecutive active frames into segments.
    // Per-doc LOCAL work inside the decode's mapPartitions pass; a
    // doc's segments never leave its partition. The oracle replays
    // decode + framing + gaps-and-islands from the text bytes.
    ("multimodal_audio_segments",
      (s, d) => Multimodal.audioSegments(
        Multimodal.toMedia(graft.core.Tables.documents(s, d)),
        frameSize = 40, threshold = 350000L)
        .toDF().orderBy("doc_id", "seg_idx"),
      Some(s"""WITH $MediaCtes,
        | au AS (SELECT doc_id, len,
        |   list_transform(bs, x -> abs(x - 128) * 256) AS amp
        |  FROM mm WHERE mime = 'audio/wav'),
        | fr AS (SELECT doc_id, CAST(unnest(range(0,
        |   CAST(ceil(len / 40.0) AS BIGINT))) AS BIGINT) AS f, amp FROM au),
        | en AS (SELECT doc_id, f, CAST(COALESCE(list_sum(
        |   amp[CAST(f*40+1 AS INT):CAST(f*40+40 AS INT)]), 0) AS BIGINT)
        |   AS e FROM fr),
        | act AS (SELECT doc_id, f, e, f - row_number() OVER
        |   (PARTITION BY doc_id ORDER BY f) AS grp FROM en
        |  WHERE e > 350000),
        | seg AS (SELECT doc_id, grp, MIN(f) AS start_frame,
        |   MAX(f) AS end_frame, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |   CAST(SUM(e) AS BIGINT) AS energy FROM act GROUP BY 1, 2)
        | SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id
        |   ORDER BY start_frame) - 1 AS BIGINT) AS seg_idx,
        |  start_frame, end_frame, n_frames, energy
        | FROM seg ORDER BY doc_id, seg_idx"""
        .stripMargin.replace("\n", " "))),

    ("multimodal_features",
      (s, d) => Multimodal.decodeFeatures(
        Multimodal.toMedia(graft.core.Tables.documents(s, d)))
        .toDF()
        .withColumn("mean_val",
          when(col("n_units") > 0,
            round(col("sum_abs") / col("n_units"), 6)).otherwise(lit(0.0)))
        .orderBy("doc_id"),
      Some(s"""WITH $MediaCtes
        | SELECT doc_id, mime, n_bytes,
        |  CASE WHEN mime = 'audio/wav' THEN len ELSE 15 END AS dim1,
        |  CASE WHEN mime = 'audio/wav' THEN 8000 ELSE h END AS dim2,
        |  CASE WHEN mime = 'audio/wav' THEN len ELSE 15 * h * 3 END AS n_units,
        |  CAST(CASE WHEN mime = 'audio/wav'
        |   THEN COALESCE(list_sum(list_transform(bs, x -> abs(x - 128) * 256)), 0)
        |   ELSE COALESCE(list_sum(bs), 0) END AS BIGINT) AS sum_abs,
        |  CASE WHEN (CASE WHEN mime = 'audio/wav' THEN len ELSE 15 * h * 3 END) = 0
        |   THEN 0.0
        |   ELSE round((CASE WHEN mime = 'audio/wav'
        |     THEN COALESCE(list_sum(list_transform(bs, x -> abs(x - 128) * 256)), 0)
        |     ELSE COALESCE(list_sum(bs), 0) END)
        |    / (CASE WHEN mime = 'audio/wav' THEN len ELSE 15 * h * 3 END), 6)
        |   END AS mean_val
        | FROM mm ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // ===== BM25 retrieval =====
    // Deterministic columnar BM25 (no explode/groupBy for tf; integer
    // corpus stats; fixed-order term sum) — the oracle mirrors the
    // expression tree literally so doubles match bit-for-bit.
    ("text_bm25",
      (s, d) => TextAnalysis.bm25(graft.core.Tables.documents(s, d),
        "doc_id", "text", Bm25Terms),
      Some(bm25Sql)),

    // Hybrid lexical+vector retrieval, reciprocal-rank fusion: BM25
    // top-50 + cosine top-50 (both k-bounded BEFORE fusion — the
    // corpus is never globally sorted), rrf = 1/(60+rank_lex) +
    // 1/(60+rank_vec), two fixed-order terms so the doubles oracle
    // exactly. Fusion frame ≤ 100 rows — driver-bounded.
    ("hybrid_search_rrf",
      (s, d) => Similarity.hybridSearchRrf(
        graft.core.Tables.documents(s, d),
        graft.core.Tables.embeddings(s, d), Bm25Terms, queryVecId = 0),
      Some(s"""WITH lex AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rl
        |  FROM ($bm25Sql)),
        | q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        | vs AS (SELECT e.vec_id AS doc_id,
        |   round(${cosineSql("e.embedding", "q.qe")}, 6) AS vscore
        |  FROM embeddings e, q WHERE e.vec_id <> 0
        |  ORDER BY vscore DESC, doc_id LIMIT 50),
        | vec AS (SELECT doc_id,
        |   row_number() OVER (ORDER BY vscore DESC, doc_id) AS rv FROM vs)
        | SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |  round(COALESCE(CAST(1.0 AS DOUBLE) / (l.rl + 60), CAST(0 AS DOUBLE))
        |   + COALESCE(CAST(1.0 AS DOUBLE) / (v.rv + 60), CAST(0 AS DOUBLE)), 6)
        |   AS rrf
        | FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        | ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin.replace("\n", " "))),

    // RAG context packing (r8e): chunk → term-score → global top-k →
    // greedy token-budget cut — the composed context-window assembly
    // step between indexing and the model call. Chunk+score are one
    // map-only corpus pass; top-k is TakeOrdered; the pack windows run
    // on the k-bounded survivors. All-integer output.
    ("rag_context_pack",
      (s, d) => TextAnalysis.ragContextPack(
        graft.core.Tables.documents(s, d), "doc_id", "text",
        Bm25Terms, k = 20, tokenBudget = 120L,
        chunkSize = 24, overlap = 6),
      Some {
        val scoreSql = Bm25Terms.map(t =>
          s"len(list_filter(cws, x -> x = '$t'))").mkString(" + ")
        s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
          | p AS (SELECT doc_id, ws, len(ws) AS nw,
          |  CASE WHEN len(ws) <= 24 THEN 1
          |   ELSE 1 + (len(ws) - 24 + 17) // 18 END AS c FROM w),
          | e AS (SELECT doc_id, ws, nw, unnest(range(0, c)) AS i FROM p),
          | ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
          |   CAST(least(24, nw - i * 18) AS INT) AS n_tokens,
          |   ws[CAST(1 + i * 18 AS INT):CAST(i * 18 + 24 AS INT)] AS cws
          |  FROM e),
          | sc AS (SELECT doc_id, chunk_idx, n_tokens,
          |   CAST($scoreSql AS BIGINT) AS score FROM ch),
          | top AS (SELECT * FROM sc WHERE score > 0
          |   ORDER BY score DESC, doc_id, chunk_idx LIMIT 20),
          | rk AS (SELECT doc_id, chunk_idx, score, n_tokens,
          |   CAST(row_number() OVER o AS BIGINT) AS rank,
          |   CAST(SUM(n_tokens) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
          |     AND CURRENT ROW) AS BIGINT) AS cum_tokens
          |  FROM top WINDOW o AS (ORDER BY score DESC, doc_id, chunk_idx))
          | SELECT doc_id, chunk_idx, score, rank, n_tokens, cum_tokens
          | FROM rk WHERE cum_tokens <= 120 ORDER BY rank"""
          .stripMargin.replace("\n", " ")
      }),

    // Retrieval-quality eval (r8e): MRR + NDCG@10 of the BM25 ranking
    // per eval query, graded relevance = number of distinct query
    // terms present (the pseudo-qrel convention). With k fixed the
    // per-position log2 discounts are driver constants, so DCG is a
    // fixed-order sum of exact-integer-gain × identical-double-constant
    // — bit-reproducible with no runtime log. The eval loop every
    // retrieval pipeline runs after an index/scorer change.
    ("search_eval_metrics",
      (s, d) => TextAnalysis.searchEvalMetrics(
        graft.core.Tables.documents(s, d), "doc_id", "text",
        EvalQueries, k = 10),
      Some(searchEvalSql(EvalQueries, k = 10))),

    // ===== Eval-set contamination (decontamination scan) =====
    // eval = docs 0..9, train = the rest; shared distinct 3-gram
    // shingles per (train, eval) pair. Eval shingles broadcast; the
    // corpus never shuffles.
    ("text_contamination",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        Dedup.contamination(docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10), "doc_id", "text", n = 3)
          .orderBy("train_id", "eval_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(${shinglesSql(3)}))
        |   AS s FROM w),
        | e AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < 10),
        | t AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id >= 10)
        | SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        | FROM t JOIN e USING (s) GROUP BY 1, 2 ORDER BY 1, 2"""
        .stripMargin.replace("\n", " "))),

    // ===== Deterministic train/val/test split assignment =====
    ("sample_splits",
      (s, d) => graft.pipeline.Sampling.assignSplits(
        graft.core.Tables.documents(s, d).select("doc_id"),
        "doc_id", Seq("val" -> 10, "test" -> 10, "train" -> 80))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CASE WHEN b < 10 THEN 'val'
        | WHEN b < 20 THEN 'test' ELSE 'train' END AS split
        | FROM (SELECT doc_id,
        |  ${graft.pipeline.Sampling.hashBucketSql("doc_id")} AS b
        |  FROM documents) ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    // ===== Mixture resampling with upsampling =====
    // Target mixture 5:3:2 over three sources, 300-row budget: src0
    // wants 150 rows from 25 inputs (6 full epochs), src1 90 (3 epochs
    // + 15 rows of a 4th), src2 60 (2 epochs + 10) — exact per-source
    // counts, deterministic extra-epoch membership, other sources
    // dropped (weight 0). The oracle replays the identical rank +
    // integer-div arithmetic.
    ("sample_mixture",
      (s, d) => graft.pipeline.Sampling.mixture(
        graft.core.Tables.documents(s, d), "doc_id", "source",
        targets = MixtureTargets, budgetRows = 300L)
        .orderBy("doc_id", "epoch"),
      Some({
        val w = MixtureTargets.map(_._2).sum
        val wCase = MixtureTargets.map { case (src, p) =>
          s"WHEN source = '$src' THEN $p"
        }.mkString("CASE ", " ", " ELSE 0 END")
        s"""WITH t AS (SELECT doc_id, source, CAST(row_number() OVER (
          |   PARTITION BY source
          |   ORDER BY ${graft.pipeline.Sampling.hashOrderSql("doc_id")}, doc_id)
          |  AS BIGINT) AS rk FROM documents),
          | h AS (SELECT source, COUNT(*) AS have FROM documents GROUP BY 1),
          | j AS (SELECT t.doc_id, t.source, t.rk, h.have,
          |   (300 * ($wCase)) // $w AS want FROM t JOIN h USING (source)),
          | r AS (SELECT doc_id, source, want // have +
          |   CASE WHEN rk <= want % have THEN 1 ELSE 0 END AS reps FROM j)
          | SELECT doc_id, source, CAST(unnest(range(1, reps + 1)) AS BIGINT)
          |  AS epoch
          | FROM r WHERE reps > 0 ORDER BY doc_id, epoch"""
          .stripMargin.replace("\n", " ")
      })),

    // Weighted sampling without replacement (A-Res keys ln(u)/w on the
    // deterministic hash uniform) selected by the native topk_by
    // aggregate — the exchange moves sample-sized data, never the
    // corpus. The oracle replays the key + a window rank.
    ("sample_weighted",
      (s, d) => Sampling.weightedSample(
        graft.core.Tables.documents(s, d), "doc_id", "source",
        col("n_chars"), k = 20).orderBy("source", "pos"),
      Some(s"""WITH s AS (SELECT source, doc_id,
        |  round(ln(CAST(${Sampling.hashOrderSql("doc_id")} + 1 AS DOUBLE)
        |     / 4294967296.0)
        |   / CAST(greatest(n_chars, 1) AS DOUBLE), 10) AS key
        |  FROM documents),
        | r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |   ORDER BY key DESC, doc_id) AS rk FROM s)
        | SELECT source, CAST(rk - 1 AS INT) AS pos, doc_id
        | FROM r WHERE rk <= 20 ORDER BY source, pos"""
        .stripMargin.replace("\n", " "))),

    // DSIR-style importance scores (r8d): per-doc mean weight of its
    // hashed-token buckets under the Laplace-smoothed target/corpus
    // ratio (target = the English slice) — the "make the mixture look
    // like the target domain" scorer. Corpus explode feeds two
    // partial-agg shuffles; the 256-row bucket-weight table broadcasts.
    ("sample_importance",
      (s, d) => Sampling.importanceScores(
        graft.core.Tables.documents(s, d), "doc_id", "text",
        targetPred = col("lang") === "en").orderBy("doc_id"),
      Some(s"""WITH ${Sampling.importanceScoresCtes("lang = 'en'")}
        | SELECT doc_id, n_tokens, importance FROM imp ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    // The RESAMPLING half of DSIR (r8d): an Efraimidis–Spirakis
    // weighted draw (the sample_weighted machinery — native bounded
    // heap topk_by, sample-sized exchange) whose weights ARE the
    // importance scores, per source stratum. Composition entry: the
    // oracle chains the full DSIR CTEs into the A-Res replay.
    ("sample_importance_draw",
      (s, d) => Sampling.weightedSample(
        Sampling.importanceScores(
          graft.core.Tables.documents(s, d), "doc_id", "text",
          targetPred = col("lang") === "en")
          .join(graft.core.Tables.documents(s, d)
            .select(col("doc_id"), col("source")), Seq("doc_id")),
        "doc_id", "source", col("importance"), k = 10)
        .orderBy("source", "pos"),
      Some(s"""WITH ${Sampling.importanceScoresCtes("lang = 'en'")},
        | sc AS (SELECT d.source, imp.doc_id, imp.importance
        |   FROM imp JOIN documents d USING (doc_id)),
        | sk AS (SELECT source, doc_id,
        |  round(ln(CAST(${Sampling.hashOrderSql("doc_id")} + 1 AS DOUBLE)
        |     / 4294967296.0)
        |   / CAST(greatest(importance, 1) AS DOUBLE), 10) AS key
        |  FROM sc),
        | r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |   ORDER BY key DESC, doc_id) AS rk FROM sk)
        | SELECT source, CAST(rk - 1 AS INT) AS pos, doc_id
        | FROM r WHERE rk <= 10 ORDER BY source, pos"""
        .stripMargin.replace("\n", " "))),

    // ===== Corpus bigram LM quality score =====
    ("text_lm_score",
      (s, d) => TextAnalysis.lmScore(
        graft.core.Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | b AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
        |    THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS big FROM w),
        | p AS (SELECT doc_id, big, string_split(big, ' ')[1] AS pre FROM b),
        | cb AS (SELECT big, COUNT(*) AS cnt_big FROM p GROUP BY big),
        | cp AS (SELECT pre, COUNT(*) AS cnt_pre FROM p GROUP BY pre)
        | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  round(SUM(ln(cnt_big / CAST(cnt_pre AS DOUBLE))) / COUNT(*), 4)
        |   AS avg_logprob
        | FROM p JOIN cb USING (big) JOIN cp USING (pre)
        | GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Held-out LM scoring (r8e): the eval-hygiene twin of
    // text_lm_score — bigram counts from the 80% TRAIN hash split,
    // Laplace-smoothed scoring of the 20% TEST docs (unseen bigrams
    // penalize instead of join-missing). The split uses the portable
    // md5 hash so the oracle replays it.
    ("text_lm_holdout",
      (s, d) => TextAnalysis.lmScoreHoldout(
        graft.core.Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val h = graft.pipeline.Sketches.hash32Sql("doc_id")
        s"""WITH w AS (SELECT doc_id, $wordsSql AS ws,
          |   ($h % 5) < 1 AS is_test FROM documents),
          | b AS (SELECT doc_id, is_test, unnest(CASE WHEN len(ws) >= 2
          |    THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
          |    ELSE CAST([] AS VARCHAR[]) END) AS big FROM w),
          | p AS (SELECT doc_id, is_test, big,
          |   string_split(big, ' ')[1] AS pre FROM b),
          | cb AS (SELECT big, COUNT(*) AS cnt_big FROM p
          |   WHERE NOT is_test GROUP BY big),
          | cp AS (SELECT pre, COUNT(*) AS cnt_pre FROM p
          |   WHERE NOT is_test GROUP BY pre),
          | v AS (SELECT COUNT(*) AS vocab FROM cp)
          | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          |  CAST(SUM(CASE WHEN cnt_big IS NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_unseen,
          |  round(SUM(ln(CAST(COALESCE(cnt_big, 0) + 1 AS DOUBLE)
          |    / CAST(COALESCE(cnt_pre, 0) + vocab AS DOUBLE)))
          |   / COUNT(*), 4) AS avg_logprob
          | FROM p LEFT JOIN cb USING (big) LEFT JOIN cp USING (pre)
          |  CROSS JOIN v
          | WHERE is_test GROUP BY doc_id ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")
      }),

    // ===== Token-budget mixture sampling =====
    // ~2000 chars per source, filled in deterministic-hash order; the
    // boundary-crossing doc is kept (every stratum reaches budget).
    ("sample_token_budget",
      (s, d) => graft.pipeline.Sampling.tokenBudget(
        graft.core.Tables.documents(s, d), "doc_id", "source", "n_chars",
        budgetTokens = 2000L)
        .orderBy("doc_id"),
      Some(s"""WITH o AS (SELECT doc_id, source, n_chars,
        | CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
        |   ORDER BY ${graft.pipeline.Sampling.hashOrderSql("doc_id")}, doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |  AS tokens_before
        | FROM documents)
        | SELECT doc_id, source, n_chars, tokens_before FROM o
        | WHERE tokens_before < 2000 ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    // Boilerplate-LINE removal (CCNet/RefinedWeb line-level dedup):
    // lines repeating across >= 3 distinct docs of one source (nav
    // headers, footers) are stripped; the oracle REPLAYS the same
    // algorithm in SQL over the same literal corpus (the fixture
    // documents are single-line, so the line structure comes from a
    // driver-local web-page-shaped corpus, like the workspace and
    // ingest entries). One doc is pure boilerplate (survives with
    // empty text); a 2-doc footer in the other source stays below
    // threshold and is kept.
    ("text_boilerplate",
      (s, d) => {
        import s.implicits._
        val h = "Home | About | Contact"
        val f = "(c) 2026 Example"
        val g = "All rights reserved"
        val corpus = Seq(
          (1L, "srcA", s"$h\nalpha beta\n$f"),
          (2L, "srcA", s"$h\ngamma delta\n$f"),
          (3L, "srcA", s"$h\nepsilon\n$f"),
          (4L, "srcA", s"$h\n$f"),
          (5L, "srcB", s"one two\n$g"),
          (6L, "srcB", s"three four\n$g"))
          .toDF("doc_id", "source", "text")
        TextAnalysis.boilerplateLines(corpus, "doc_id", "text", "source",
          minDocs = 3).orderBy("doc_id")
      },
      Some("""WITH t(doc_id, source, text) AS (VALUES
        | (1, 'srcA', 'Home | About | Contact' || chr(10) || 'alpha beta' || chr(10) || '(c) 2026 Example'),
        | (2, 'srcA', 'Home | About | Contact' || chr(10) || 'gamma delta' || chr(10) || '(c) 2026 Example'),
        | (3, 'srcA', 'Home | About | Contact' || chr(10) || 'epsilon' || chr(10) || '(c) 2026 Example'),
        | (4, 'srcA', 'Home | About | Contact' || chr(10) || '(c) 2026 Example'),
        | (5, 'srcB', 'one two' || chr(10) || 'All rights reserved'),
        | (6, 'srcB', 'three four' || chr(10) || 'All rights reserved')),
        | l0 AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM t),
        | ln AS (SELECT doc_id, source, unnest(range(0, len(ls))) AS pos, ls FROM l0),
        | lx AS (SELECT doc_id, source, pos, ls[CAST(pos + 1 AS INT)] AS line FROM ln),
        | bp AS (SELECT source, line FROM (SELECT source, line,
        |   COUNT(DISTINCT doc_id) AS nd FROM lx GROUP BY 1, 2) WHERE nd >= 3),
        | kept AS (SELECT lx.* FROM lx ANTI JOIN bp USING (source, line)),
        | agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |   string_agg(line, chr(10) ORDER BY pos) AS cleaned FROM kept GROUP BY 1),
        | tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM lx GROUP BY 1)
        | SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |  CAST(tot.n_lines AS BIGINT) AS n_lines,
        |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  COALESCE(agg.cleaned, '') AS cleaned_text
        | FROM t JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)
        | ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Cross-document duplicated n-grams (C4/Gopher/Dolma gate): per
    // doc, the fraction of its 8-gram windows that also occur in ≥1
    // OTHER document. Gram-keyed aggs + one semi join; at 100 TB the
    // gram key is xxhash64'd (same plan, 8-byte keys).
    ("text_dup_ngrams",
      (s, d) => TextAnalysis.dupNgramStats(
        graft.core.Tables.documents(s, d), "doc_id", "text", n = 8)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | sh AS (SELECT doc_id, ${shinglesSql(8)} AS sh FROM w),
        | win AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
        | dg AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd
        |   FROM win GROUP BY 1) WHERE nd >= 2),
        | tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM win GROUP BY 1),
        | dup AS (SELECT doc_id, COUNT(*) AS n_dup_windows FROM win
        |   WHERE gram IN (SELECT gram FROM dg) GROUP BY 1)
        | SELECT d.doc_id, COALESCE(tot.n_windows, 0) AS n_windows,
        |  COALESCE(dup.n_dup_windows, 0) AS n_dup_windows,
        |  round(CAST(COALESCE(dup.n_dup_windows, 0) AS DOUBLE) /
        |    GREATEST(COALESCE(tot.n_windows, 0), 1), 6) AS dup_frac
        | FROM documents d LEFT JOIN tot ON tot.doc_id = d.doc_id
        |  LEFT JOIN dup ON dup.doc_id = d.doc_id
        | ORDER BY d.doc_id""".stripMargin.replace("\n", " "))),

    // Duplicated-SPAN extraction (the removal counterpart of the gate
    // above): maximal token ranges of shared windows,
    // overlapping-or-abutting windows merged (gaps-and-islands on
    // strictly-increasing positions = one lag-diff window pass). n=3
    // so the fixture corpus yields real multi-window merged spans.
    ("text_dup_spans",
      (s, d) => TextAnalysis.dupSpans(
        graft.core.Tables.documents(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id", "span_start"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | s AS (SELECT doc_id, ${shinglesSql(3)} AS sh FROM w),
        | win AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |   sh[CAST(i AS INT)] AS gram
        |  FROM s, unnest(range(1, len(sh) + 1)) AS t(i)),
        | dg AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd
        |   FROM win GROUP BY 1) WHERE nd >= 2),
        | m AS (SELECT doc_id, pos FROM win WHERE gram IN (SELECT gram FROM dg)),
        | f AS (SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 3
        |   THEN 1 ELSE 0 END AS brk FROM m),
        | g AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id
        |   ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM f)
        | SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 2 AS span_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows
        | FROM g GROUP BY doc_id, grp
        | ORDER BY doc_id, span_start""".stripMargin.replace("\n", " "))),

    // ===== Repetition / degeneracy quality signals =====
    ("text_repetition",
      (s, d) => TextAnalysis.repetitionStats(
        graft.core.Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        | b AS (SELECT doc_id, ws,
        |   CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
        |     i -> ws[i] || ' ' || ws[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END AS bg FROM w),
        | c AS (SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens,
        |   CASE WHEN len(ws) = 0 THEN 0.0
        |    ELSE CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END AS uf,
        |   CASE WHEN len(ws) = 0 THEN 0 ELSE list_max(list_transform(
        |     list_distinct(ws), x -> len(list_filter(ws, y -> y = x)))) END
        |    AS top_token_count,
        |   CASE WHEN len(ws) < 2 THEN 0 ELSE list_max(list_transform(
        |     list_distinct(bg), x -> len(list_filter(bg, y -> y = x)))) END
        |    AS top_bigram_count,
        |   CASE WHEN len(ws) < 2 THEN 0.0
        |    ELSE CAST(list_max(list_transform(list_distinct(bg),
        |      x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
        |      / (len(ws) - 1) END AS bf
        |  FROM b)
        | SELECT doc_id, n_tokens, round(uf, 6) AS uniq_frac,
        |  CAST(top_token_count AS INT) AS top_token_count,
        |  CAST(top_bigram_count AS INT) AS top_bigram_count,
        |  round(bf, 6) AS top_bigram_frac
        | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    // Deterministic global corpus shuffle (r7): the training-order
    // permutation as a metadata-sized (id, pos) table — contiguous
    // 1..N rank in (hash, id) order assigned DISTRIBUTED (range
    // repartition + per-partition row_number + offsets, the MVCC
    // write-path shape); the oracle is the single global window the
    // distributed assignment provably equals.
    ("corpus_shuffle",
      (s, d) => graft.pipeline.Sampling.globalShuffle(
        graft.core.Tables.documents(s, d), "doc_id").orderBy("pos"),
      Some(s"""SELECT doc_id, row_number() OVER (ORDER BY
        | ${graft.pipeline.Sampling.hashOrderSql("doc_id")}, doc_id) AS pos
        | FROM documents ORDER BY pos""".stripMargin.replace("\n", " "))),

    // ===== Deterministic stratified sampling =====
    ("sample_stratified",
      (s, d) => graft.pipeline.Sampling.stratified(
        graft.core.Tables.documents(s, d), "doc_id", "source",
        rates = SampleRates, defaultPct = 10)
        .orderBy("doc_id"),
      Some({
        val rateCase = SampleRates.map { case (src, p) =>
          s"WHEN source = '$src' THEN $p"
        }.mkString("CASE ", " ", " ELSE 10 END")
        s"""WITH b AS (SELECT doc_id, source,
           | ${graft.pipeline.Sampling.hashBucketSql("doc_id")} AS bucket,
           | $rateCase AS keep_pct FROM documents)
           | SELECT doc_id, source, bucket, keep_pct FROM b
           | WHERE bucket < keep_pct ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")
      })),

    // ===== End-to-end corpus prep =====
    // The whole release pipeline as ONE composed query — quality filter
    // → exact-dedup survivors → per-source token-budget mixture →
    // sequence packing — proving the operators compose (each stage's
    // output feeds the next with no materialization barriers; Catalyst
    // plans the chain whole). Oracle = the same four stages as chained
    // CTEs built from the per-stage oracle logic. Stage shapes: map-only
    // filter, one groupBy, two per-stratum windows — nothing global.
    ("corpus_prep_pipeline",
      (s, d) => {
        val docs = graft.core.Tables.documents(s, d)
        val kept = docs.join(
          TextAnalysis.filterDecisions(docs, "doc_id", "text")
            .filter(col("keep")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val surv = kept.join(
          Dedup.exact(kept, Seq("text"), "doc_id")
            .select(col("canonical_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        val sampled = graft.pipeline.Sampling.tokenBudget(
          surv, "doc_id", "source", "n_chars", budgetTokens = 2000L)
        TextAnalysis.packIntoWindows(
          surv.join(sampled.select("doc_id"), Seq("doc_id"), "left_semi"),
          "doc_id", "text", "source", 4096)
          .orderBy("doc_id")
      },
      Some(s"""WITH stats AS ($textStatsSql),
        | dec AS (SELECT doc_id FROM stats WHERE NOT (n_tokens < 10
        |   OR quality < CAST(0.35 AS DOUBLE)
        |   OR punct_ratio > CAST(0.2 AS DOUBLE))),
        | kept AS (SELECT d.* FROM documents d
        |   WHERE d.doc_id IN (SELECT doc_id FROM dec)),
        | canon AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
        | surv AS (SELECT * FROM kept
        |   WHERE doc_id IN (SELECT doc_id FROM canon)),
        | samp AS (SELECT doc_id FROM (SELECT doc_id,
        |   CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
        |     ORDER BY ${graft.pipeline.Sampling.hashOrderSql("doc_id")}, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS tb FROM surv) WHERE tb < 2000),
        | t AS (SELECT doc_id, source AS shard,
        |   CAST(len($wordsSql) AS INT) AS n_tokens FROM surv
        |   WHERE doc_id IN (SELECT doc_id FROM samp)),
        | c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
        |   PARTITION BY shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
        | SELECT doc_id, shard, n_tokens,
        |  CAST(FLOOR(cb / 4096) AS BIGINT) AS bin_idx
        | FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "))),
  )

  // lazy: `entries` above is initialized first and forces these during
  // its own construction (Scala object vals initialize in declaration
  // order).
  private lazy val Bm25Terms = Seq("hash", "join", "filter", "scan")

  /** The eval-query batch for `search_eval_metrics` (terms drawn from
    * the fixture vocabulary so rankings are non-trivial).
    */
  private lazy val EvalQueries: Seq[(String, Seq[String])] = Seq(
    "q1_lookup" -> Seq("hash", "join", "filter", "scan"),
    "q2_sortmerge" -> Seq("sort", "merge", "window"),
    "q3_vectors" -> Seq("vector", "stream"))

  private lazy val SampleRates = Seq("src0" -> 20, "src1" -> 50, "src2" -> 80)

  private lazy val MixtureTargets = Seq("src0" -> 5, "src1" -> 3, "src2" -> 2)

  /** Oracle for [[TextAnalysis.bm25]] — identical expression structure
    * (left-assoc arithmetic, same Scala-computed double literals via
    * round-trip toString, every fractional literal CAST to DOUBLE so
    * DuckDB never routes through DECIMAL arithmetic).
    */
  /** The t/stats/scored CTE chain for one BM25 query (suffix `sfx`
    * disambiguates when several queries share one statement); `w`
    * (doc_id, ws) must already be in scope. Same expression structure
    * as [[TextAnalysis.bm25]] — left-assoc arithmetic, every
    * fractional literal CAST to DOUBLE.
    */
  private def bm25ScoredCtes(queryTerms: Seq[String], sfx: String): String = {
    val k1 = 1.2
    val b = 0.75
    val k1p1 = (k1 + 1).toString
    val oneMinusB = (1.0 - b).toString
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ws, x -> x = '$t')) AS tf$i"
    }.mkString(", ")
    val dfCols = queryTerms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val dlNorm = s"(CAST($oneMinusB AS DOUBLE) + CAST($b AS DOUBLE) * " +
      "(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    val terms = queryTerms.indices.map { i =>
      s"(ln((CAST(n_docs AS DOUBLE) - df$i + CAST(0.5 AS DOUBLE)) / " +
        s"(df$i + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * " +
        s"(tf$i * CAST($k1p1 AS DOUBLE)) / " +
        s"(tf$i + CAST($k1 AS DOUBLE) * $dlNorm))"
    }.mkString(" + ")
    s"t$sfx AS (SELECT doc_id, len(ws) AS dl, $tfCols FROM w), " +
      s"stats$sfx AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, " +
      s"$dfCols FROM t$sfx), " +
      s"scored$sfx AS (SELECT doc_id, round($terms, 6) AS score " +
      s"FROM t$sfx CROSS JOIN stats$sfx)"
  }

  private lazy val bm25Sql: String =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       | ${bm25ScoredCtes(Bm25Terms, "")}
       | SELECT doc_id, score FROM scored WHERE score > 0
       | ORDER BY score DESC, doc_id LIMIT 50""".stripMargin.replace("\n", " ")

  /** Oracle for [[TextAnalysis.searchEvalMetrics]] — per query the
    * same BM25 CTE chain, the same data-derived graded relevance, and
    * the same fixed-order Σ gain·d_r sums with the identical
    * driver-computed discount constants.
    */
  private def searchEvalSql(queries: Seq[(String, Seq[String])],
                            k: Int): String = {
    val discounts =
      (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    def posSum(c: String) = (1 to k).map { r =>
      s"COALESCE(MAX(CASE WHEN $c = $r THEN " +
        s"CAST((1 << rel) - 1 AS DOUBLE) * " +
        s"CAST(${discounts(r - 1)} AS DOUBLE) END), CAST(0.0 AS DOUBLE))"
    }.mkString(" + ")
    val (ctes, sels) = queries.zipWithIndex.map { case ((qid, terms), qi) =>
      val sfx = s"_q$qi"
      val relExpr = terms.map(t =>
        s"CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END")
        .mkString(" + ")
      val cte = bm25ScoredCtes(terms, sfx) +
        s", top$sfx AS (SELECT doc_id, score, row_number() OVER " +
        s"(ORDER BY score DESC, doc_id) AS rank FROM (SELECT doc_id, score " +
        s"FROM scored$sfx WHERE score > 0 ORDER BY score DESC, doc_id " +
        s"LIMIT $k)), " +
        s"g$sfx AS (SELECT r.rank, ($relExpr) AS rel FROM top$sfx r " +
        s"JOIN w ON w.doc_id = r.doc_id), " +
        s"i$sfx AS (SELECT rank, rel, row_number() OVER " +
        s"(ORDER BY rel DESC, rank) AS ipos FROM g$sfx), " +
        s"m$sfx AS (SELECT '$qid' AS query_id, " +
        s"CAST(COUNT(*) AS BIGINT) AS n_ret, " +
        s"CAST(MIN(CASE WHEN rel > 0 THEN rank END) AS BIGINT) " +
        s"AS first_rel_rank, " +
        s"${posSum("rank")} AS dcg_raw, ${posSum("ipos")} AS idcg_raw " +
        s"FROM i$sfx)"
      val sel = s"SELECT query_id, n_ret, first_rel_rank, " +
        "CASE WHEN first_rel_rank IS NULL THEN CAST(0.0 AS DOUBLE) " +
        "ELSE round(CAST(1.0 AS DOUBLE) / first_rel_rank, 6) END AS mrr, " +
        "round(dcg_raw, 4) AS dcg10, round(idcg_raw, 4) AS idcg10, " +
        "CASE WHEN idcg_raw > CAST(0.0 AS DOUBLE) " +
        "THEN round(dcg_raw / idcg_raw, 4) " +
        s"ELSE CAST(0.0 AS DOUBLE) END AS ndcg10 FROM m$sfx"
      (cte, sel)
    }.unzip
    s"WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents), " +
      ctes.mkString(", ") + " " + sels.mkString(" UNION ALL ") +
      " ORDER BY query_id"
  }

  /** Oracle for [[TextAnalysis.analyze]], generated from the same
    * stopword/profile constants.
    */
  private lazy val textStatsSql: String = {
    def listLit(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ",", "]")
    val stopLit = listLit(TextAnalysis.StopwordsEn)
    val langScores = TextAnalysis.LangProfiles.map { case (code, stops) =>
      s"len(list_filter(ws, w -> list_contains(${listLit(stops)}, w))) AS s_$code"
    }.mkString(", ")
    val bestExpr = TextAnalysis.LangProfiles.map(p => s"s_${p._1}")
      .reduce((a, b) => s"greatest($a, $b)")
    val langCase = TextAnalysis.LangProfiles.map { case (code, _) =>
      s"WHEN s_$code = best AND best > 0 THEN '$code'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH w AS (SELECT doc_id, text, $wordsSql AS ws FROM documents),
       | base AS (SELECT doc_id, text, ws,
       |  CAST(len(ws) AS INT) AS n_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS INT)
       |    AS n_bpeish,
       |  CASE WHEN len(ws) = 0 THEN 0.0
       |   ELSE CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws)
       |  END AS raw_avg_len,
       |  CASE WHEN length(text) = 0 THEN 0.0
       |   ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |     / length(text) END AS raw_punct,
       |  CASE WHEN len(ws) = 0 THEN 0.0
       |   ELSE CAST(len(list_filter(ws, w -> list_contains($stopLit, w))) AS DOUBLE)
       |     / len(ws) END AS raw_stop,
       |  $langScores
       |  FROM w),
       | scored AS (SELECT *, $bestExpr AS best FROM base)
       | SELECT doc_id, n_tokens, n_bpeish,
       |  round(raw_avg_len, 6) AS avg_token_len,
       |  round(raw_punct, 6) AS punct_ratio,
       |  round(raw_stop, 6) AS stopword_ratio,
       |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       |    + 0.3 * (1.0 - raw_punct) + 0.3 * raw_stop, 6) AS quality,
       |  $langCase AS lang_pred,
       |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash
       | FROM scored ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }
}

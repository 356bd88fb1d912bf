package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, and document
  * fingerprinting. Pure `functions._` columns (whole-stage codegen; one
  * scan computes everything), each with an exact SQL twin for the
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = Dedup.words(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs + single digits + single
    * non-alphanumeric marks, over the lower-cased text — the classic
    * pre-tokenizer shape (letters|digit|other).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))

  /** Mean token length: exact rational (integer sum / integer count). */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(aggregate(ts, lit(0), (acc, w) => acc + length(w)).cast("double")
        / size(ts))
  }

  /** Fraction of characters that are not [a-z0-9 ] after lower-casing. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
        .cast("double") / length(text))

  /** English stopword hit ratio (with duplicates — frequency-sensitive,
    * like real quality classifiers).
    */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

  def stopwordRatio(text: Column, stops: Seq[String] = StopwordsEn): Column = {
    val ts = tokens(text)
    val stopArr = array(stops.map(lit): _*)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0),
          (acc, w) => acc + when(array_position(stopArr, w) > 0, 1).otherwise(0))
          .cast("double") / size(ts))
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.3·stopword_ratio.
    * The weights are editorial; what matters is that every term is a
    * deterministic double expression.
    */
  def qualityScore(text: Column): Column =
    round(
      lit(0.4) * least(lit(1.0), tokenCount(text).cast("double") / 100.0)
        + lit(0.3) * (lit(1.0) - punctRatio(text))
        + lit(0.3) * stopwordRatio(text), 6)

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. (The fixture corpus is a synthetic
    * English-ish vocabulary for every `lang` label, so no classifier can
    * recover the label; the operator is graded on its own deterministic
    * output, oracle-replayed.)
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "en", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不"),
  )

  /** Predicted language = argmax of stopword hits, ties broken by
    * language code order (profiles are pre-sorted). Emits the winning
    * code; 'und' (undetermined) when no profile scores a hit.
    */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = LangProfiles.map { case (code, stops) =>
      val stopArr = array(stops.map(lit): _*)
      code -> aggregate(ts, lit(0),
        (acc, w) => acc + when(array_position(stopArr, w) > 0, 1).otherwise(0))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first-match-wins CASE chain in profile (code) order
    scores.foldRight(lit("und"): Column) { case ((code, s), elseCol) =>
      when(s === best && best > 0, lit(code)).otherwise(elseCol)
    }
  }

  /** Document fingerprints: whole-document content hash over normalized
    * text, plus a rolling k-gram minimum (winnowing-style robust
    * fingerprint — equal for documents differing only in whitespace).
    */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  def contentHash(text: Column): Column = md5(normalized(text))

  def minKgramHash(text: Column, kk: Int = 8): Column =
    if (graft.expressions.Fused.available("min_kgram"))
      call_function("min_kgram", text, lit(kk))
    else minKgramHashComposable(text, kk)

  /** The composable form of [[minKgramHash]] — oracle-shaped, and the
    * fused [[graft.expressions.MinKgramHash]]'s spec cross-check. One
    * interpreted md5 Column eval per window makes it ~25× slower than
    * the fused loop on the sf0.1 corpus.
    */
  def minKgramHashComposable(text: Column, kk: Int = 8): Column = {
    val norm = normalized(text)
    when(length(norm) < kk, md5(norm)).otherwise(
      array_min(transform(sequence(lit(1), length(norm) - (kk - 1)),
        i => md5(norm.substr(i, lit(kk))))))
  }

  /** PII patterns, shared verbatim with the DuckDB oracle — restricted
    * to syntax meaning the same thing in Java regex (Spark) and RE2
    * (DuckDB): character classes, bounded repeats, `\b`/`\d` — no
    * lookarounds, no backrefs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnLikeRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** PII scan + redaction for a corpus: per-document match counts for
    * email / IPv4 / SSN-shaped identifiers, plus the md5 of the
    * redacted text (placeholders substituted for every match). Pure
    * per-row regex columns — one scan, no shuffle, whole-stage
    * codegen; at 100 TB this is a map-only pass, the cheapest possible
    * shape for a compliance sweep before training-data release.
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        SsnLikeRe, "<ID>")
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(t, lit(SsnLikeRe), lit(0))).as("n_ids"),
      md5(redacted).as("redacted_hash"))
  }

  /** Corpus-wide exact top-k terms: explode → two-stage count (map-side
    * partial agg) → TakeOrderedAndProject on (count desc, term asc).
    * The full term table never sorts globally and never reaches the
    * driver — only each partition's top k does.
    */
  def topTerms(df: DataFrame, textCol: String, k: Int = 50): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k)

  /** Token-window chunking with overlap — the context-window prep step
    * of a retrieval/training pipeline: each document becomes
    * `ceil((n_tokens − size) / (size − overlap)) + 1` windows of up to
    * `size` tokens, consecutive windows sharing `overlap` tokens; the
    * last window may be shorter and no window starts past the tokens it
    * would merely repeat. Documents with ≤ `size` tokens (including
    * empty ones) yield exactly one chunk.
    *
    * One map-only pass: the window list is built per row by a codegen
    * `transform(sequence, slice)` projection and exploded — no shuffle,
    * no join; output is CHUNK-count-sized. (Contrast with
    * [[packSequences]], which packs chunks ACROSS documents and
    * needs a window shuffle for the running offsets.)
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize >= 1 && overlap >= 0 && overlap < chunkSize,
      s"chunkDocs needs chunkSize >= 1 and 0 <= overlap < chunkSize; " +
        s"got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val ws = Dedup.words(col(textCol))
    // integer ceil-div: Column./ is double division, so floor it back
    val nChunks = when(col("__nw") <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        floor((col("__nw") - chunkSize + (step - 1)) / lit(step)))
    val chunks = transform(sequence(lit(0L), col("__nc") - 1L), i =>
      struct(
        i.cast("int").as("chunk_idx"),
        least(lit(chunkSize).cast("long"), col("__nw") - i * step).cast("int")
          .as("n_tokens"),
        concat_ws(" ", slice(col("__ws"), (i * step + 1L).cast("int"),
          lit(chunkSize)))
          .as("chunk_text")))
    df.select(col(idCol), ws.as("__ws"))
      .withColumn("__nw", size(col("__ws")).cast("long"))
      .withColumn("__nc", nChunks)
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_idx"), col("__c.n_tokens"),
        col("__c.chunk_text"))
  }

  /** Composite corpus-filter router: ordered first-match reject rules
    * over the one-scan [[analyze]] metrics → (reason, keep). The shape
    * every corpus build ends with: a single map-only pass that tags
    * each document with the FIRST rule it fails (so reject counts per
    * reason are meaningful), never a per-rule scan.
    */
  def filterDecisions(df: DataFrame, idCol: String, textCol: String,
                      minTokens: Int = 10, minQuality: Double = 0.35,
                      maxPunct: Double = 0.2): DataFrame =
    analyze(df, idCol, textCol).select(col(idCol),
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("quality") < minQuality, "low_quality")
          .when(col("punct_ratio") > maxPunct, "high_punct")
          .otherwise("keep").as("reason"))
      .withColumn("keep", col("reason") === "keep")

  /** One-scan analysis of a documents table. */
  /** One-scan per-document statistics, evaluated by the fused native
    * [[graft.expressions.TextStats]] expression (requires
    * `graft.GraftExtensions` on the session): one pass per document
    * instead of ~9 interpreted higher-order-function trees — same
    * HOF-allocation pathology (and same fix) as the minhash banding.
    * Bit-identical to [[analyzeComposable]] (spec-proven), which is the
    * form the DuckDB oracle mirrors.
    */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = call_function("text_stats", col(textCol))
    df.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st.n_tokens").as("n_tokens"),
        col("__st.n_bpeish").as("n_bpeish"),
        col("__st.avg_token_len").as("avg_token_len"),
        col("__st.punct_ratio").as("punct_ratio"),
        col("__st.stopword_ratio").as("stopword_ratio"),
        col("__st.quality").as("quality"),
        col("__st.lang_pred").as("lang_pred"),
        col("__st.content_hash").as("content_hash"))
  }

  /** The composable construction of [[analyze]] — pure `functions._`
    * columns, the exact shape the DuckDB oracle encodes in SQL. Kept as
    * the spec cross-check for the fused expression.
    */
  def analyzeComposable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      bpeishCount(t).as("n_bpeish"),
      round(avgTokenLen(t), 6).as("avg_token_len"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      contentHash(t).as("content_hash"))
  }

  /** Sequence packing for training pipelines, concat-then-chunk style:
    * documents are concatenated in (shard, id) order and the token
    * stream split into windows of `budgetTokens`; each doc is assigned
    * the window it STARTS in — bin = floor(tokens_before / budget), a
    * cumulative sum, the standard pretraining packing shape.
    *
    * Scale: packing is per-SHARD (`Window.partitionBy(shard)`), never a
    * global single-partition window — each shard packs independently in
    * parallel, which is also what a multi-host tokenizer wants. The
    * shard key is whatever the corpus is already partitioned by
    * (source, date, bucket).
    */
  def packIntoWindows(df: DataFrame, idCol: String, textCol: String,
                      shardCol: String, budgetTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), col(shardCol).as("shard"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0)))
      .withColumn("bin_idx", floor(col("cum_before") / budgetTokens).cast("long"))
      .drop("cum_before")
  }

  /** Repetition / degeneracy quality signals (the Gopher-rules shape):
    * unique-token fraction, the most-repeated token's count, and the
    * most-repeated bigram's count+fraction. All pure per-row column
    * math over the token list — one scan, no shuffle, integer counts
    * and exact rationals so the oracle replays them bit-for-bit. The
    * per-doc mode computation is O(tokens²) in the worst case but
    * documents are bounded (tokens ≤ a few thousand) and it stays
    * inside whole-stage codegen — far cheaper at scale than any
    * explode + groupBy formulation, which would shuffle the corpus.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    if (graft.expressions.Fused.available("rep_stats")) {
      val r = call_function("rep_stats", col(textCol))
      df.select(col(idCol), r.as("__r"))
        .select(col(idCol),
          col("__r.n_tokens").as("n_tokens"),
          col("__r.uniq_frac").as("uniq_frac"),
          col("__r.top_token_count").as("top_token_count"),
          col("__r.top_bigram_count").as("top_bigram_count"),
          col("__r.top_bigram_frac").as("top_bigram_frac"))
    } else repetitionStatsComposable(df, idCol, textCol)

  /** The composable form of [[repetitionStats]] — oracle-shaped, and
    * the fused [[graft.expressions.RepetitionStats]]'s spec
    * cross-check. Even linearized, five interpreted HOF passes per row
    * cost ~5 ms/doc, so entries dispatch to the fused loop.
    */
  def repetitionStatsComposable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val n = size(ws)
    val uniqFrac = when(n === 0, lit(0.0))
      .otherwise(size(array_distinct(ws)).cast("double") / n)
    // max multiplicity = longest equal-adjacent run of the SORTED array
    // — O(n log n) per row. The obvious per-distinct-token
    // `size(filter(...))` is O(n²) in interpreted HOF eval and turned
    // the first full-surface bench into a 10-minute straggler task on
    // sf0.1's longest documents (found r6; the curated r5 bench never
    // timed this entry).
    def maxRun(arr: Column): Column = {
      val scan = aggregate(array_sort(arr),
        struct(lit(null).cast("string").as("prev"),
          lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(acc.getField("prev").isNotNull &&
            acc.getField("prev") === x, acc.getField("run") + 1)
            .otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        })
      scan.getField("best")
    }
    val topToken = when(n === 0, lit(0)).otherwise(maxRun(ws))
    val bg = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val topBigram = when(n < 2, lit(0)).otherwise(maxRun(bg))
    df.select(col(idCol), n.as("n_tokens"),
      round(uniqFrac, 6).as("uniq_frac"),
      topToken.as("top_token_count"),
      topBigram.as("top_bigram_count"),
      when(n < 2, lit(0.0)).otherwise(topBigram.cast("double") / (n - 1))
        .as("top_bigram_frac0"))
      .withColumn("top_bigram_frac", round(col("top_bigram_frac0"), 6))
      .drop("top_bigram_frac0")
  }

  /** Corpus-level duplicated-text signal (the cross-document
    * counterpart of [[repetitionStats]], which is within-document):
    * for each document, what fraction of its word n-gram windows also
    * occurs in at least one OTHER document — the "duplicated n-grams"
    * quality gate of the C4/Gopher/Dolma pipelines (a high fraction
    * marks boilerplate, mirrors, templated spam).
    *
    * Shape: explode windows → (1) distinct (doc, gram) + gram-count
    * agg for the shared-gram set, (2) left-semi join windows against
    * it, (3) per-doc count — two partial-agg shuffles and one semi
    * join, all keyed on the gram. At 100 TB the gram column is
    * `xxhash64(gram)` instead of the string (same joins, 8-byte keys);
    * the string form here keeps the oracle readable. No collect, no
    * all-pairs anything: cost is linear in total windows.
    */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame = {
    // the exploded window table feeds THREE branches (shared-gram set,
    // per-doc totals, dup counts) — checkpoint it once instead of
    // re-shingling the corpus per branch
    val win = df.select(col(idCol), explode(Dedup.shingles(col(textCol), n))
      .as("gram"))
      .localCheckpoint(true)
    val sharedGrams = win.select(col(idCol), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("gram")
    val total = win.groupBy(idCol).agg(count(lit(1)).as("n_windows"))
    val dup = win.join(sharedGrams, Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_dup_windows"))
    df.select(col(idCol))
      .join(total, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup_windows"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_windows"), lit(0L)), lit(1L)), 6)
          .as("dup_frac"))
  }

  /** Duplicated-SPAN extraction — the removal counterpart of
    * [[dupNgramStats]] (which only scores): for each document, the
    * maximal token ranges covered by cross-document-duplicated n-gram
    * windows, overlapping-or-abutting windows merged into one span
    * (windows at positions p, p' belong to one span when
    * p' − p ≤ n, i.e. their covered token ranges overlap or are
    * contiguous — the output ranges are maximal). This is the span
    * list a C4/RefinedWeb-style pipeline deletes from the document;
    * emitting spans instead of rewritten text keeps the operator
    * composable (removal is a trivial map over the span list).
    *
    * Shape: the shared-window marking of [[dupNgramStats]] (linear,
    * keyed on the gram), then ONE per-document window pass for the
    * gaps-and-islands merge — positions are strictly increasing per
    * doc, so "touching" reduces to a lag diff, the sessionize pattern.
    * Output is span-count-sized. Returns (id, span_start, span_end,
    * n_windows) with token positions 0-based inclusive.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"dupSpans needs n >= 1 and minDocs >= 2; got n=$n minDocs=$minDocs")
    // windows with their token position; feeds the shared-gram agg AND
    // the marking join — checkpoint once (same rationale as
    // dupNgramStats)
    val win = df.select(col(idCol),
      posexplode(Dedup.shingles(col(textCol), n)).as(Seq("pos", "gram")))
      .localCheckpoint(true)
    val sharedGrams = win.select(col(idCol), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("gram")
    val marked = win.join(sharedGrams, Seq("gram"), "left_semi")
      .select(col(idCol), col("pos"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val brk = when(lag(col("pos"), 1).over(w).isNull
      .or(col("pos") - lag(col("pos"), 1).over(w) > n), 1).otherwise(0)
    marked.withColumn("brk", brk)
      .withColumn("grp", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Boilerplate-LINE removal — the CCNet/RefinedWeb line-level dedup
    * every web-scale corpus prep runs before document-level dedup:
    * a line (nav header, cookie banner, copyright footer) that repeats
    * across ≥ `minDocs` DISTINCT documents of the same `source` is
    * boilerplate; strip it from every document of that source and
    * return the cleaned text with kept/total line counts. Line-level
    * is the complement of [[dupSpans]] (token-window spans across the
    * whole corpus): boilerplate repeats at high frequency WITHIN a
    * source, which is why the frequency key is (source, line).
    *
    * Scale shape: one posexplode of the corpus into lines, one
    * distinct + partial-agg count per (source, line) — boilerplate
    * candidates are the frequency tail, tiny next to the corpus — one
    * anti-join of the line stream against them (equi-join on
    * (source, line), hash-partitioned, no skew beyond the source key
    * itself), and one per-document re-aggregation whose
    * array_sort(struct(pos, line)) rebuild is deterministic
    * regardless of shuffle arrival order. Nothing is ever all-pairs;
    * the whole operator is 3 shuffles of line-sized rows at 100 TB.
    * Empty documents survive with empty cleaned text (left join back
    * to the input ids), so downstream stages see every doc exactly
    * once.
    */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"boilerplateLines needs minDocs >= 2; got $minDocs")
    // -1 limit: trailing empty lines are real lines (DuckDB's
    // string_split agrees), so counts match an external replay
    val lines = df.select(col(idCol), col(sourceCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .localCheckpoint(true) // feeds the candidate agg AND the anti-join
    val bp = lines.select(col(sourceCol), col("line"), col(idCol)).distinct()
      .groupBy(col(sourceCol), col("line"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col(sourceCol), col("line"))
    val kept = lines.join(bp, Seq(sourceCol, "line"), "left_anti")
    val tot = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val agg = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("cleaned_text"))
    df.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** BM25 top-k keyword retrieval over the corpus for a FIXED small
    * query-term list (the ad-hoc search shape; an inverted index is the
    * persisted variant of the same math). Okapi BM25:
    * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
    * `idf = ln((N − df + 0.5)/(df + 0.5) + 1)`.
    *
    * Deterministic by construction: per-term tf is a COLUMN (array
    * filter over the token list — no explode, no groupBy), corpus stats
    * are one integer-only aggregate (counts and a token-sum — exact, so
    * no float-summation-order hazard), broadcast back as a 1-row frame,
    * and the score adds per-term components in fixed query order. Two
    * scans, one tiny aggregate, one TakeOrderedAndProject — no shuffle
    * of the corpus itself, which is the plan you want at 100 TB.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 50): DataFrame = {
    val ts = tokens(col(textCol))
    val perDoc = df.select(
      Seq(col(idCol), size(ts).as("dl")) ++
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(ts, x => x === t)).as(s"tf$i")
        }: _*)
    val aggs = Seq(sum(col("dl")).as("sum_dl")) ++
      queryTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), aggs: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val dlNorm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)
    def termScore(i: Int): Column = {
      val idf = log((col("n_docs").cast("double") - col(s"df$i") + 0.5)
        / (col(s"df$i") + 0.5) + 1.0)
      idf * (col(s"tf$i") * lit(k1 + 1)) / (col(s"tf$i") + lit(k1) * dlNorm)
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(queryTerms.indices.map(termScore).reduceLeft(_ + _), 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol)).limit(topK)
  }

  /** SymSpell-style fuzzy term lookup — typo-tolerant vocabulary
    * matching via DELETION-NEIGHBORHOOD blocking [Garbe 2012]: index
    * every vocabulary term under itself plus its 1-deletion variants,
    * expand each query the same way, and equi-join on the shared
    * keys — a substitution deletes the same position on both sides,
    * an insertion/deletion deletes on one — so every edit-distance-≤1
    * pair collides on some key with ZERO false negatives
    * (transpositions are distance 2 and out of contract). Candidates
    * then verify with the real `levenshtein` — computed only on the
    * collision set, never all pairs.
    *
    * Scale shape: the delete index is one explode of the VOCABULARY
    * (types × avg-len rows — millions, not corpus-sized) built once at
    * rest in a real deployment; the driver-sized query batch
    * broadcasts into it map-side. This is the lookup structure that
    * makes fuzzy search O(query-variants) instead of O(vocabulary).
    *
    * Returns (query, term, dist, cnt) — corpus frequency carried so
    * callers rank suggestions by popularity.
    */
  def fuzzyLookup(df: DataFrame, textCol: String,
                  queries: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_.nonEmpty))
    def deletes(s: String): Seq[String] =
      s +: (0 until s.length).map(i => s.take(i) + s.drop(i + 1))
    val qd = queries.flatMap(q => deletes(q).distinct.map(k => (q, k)))
      .toDF("query", "key")
    val voc = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val delKeys = concat(array(col("term")),
      transform(sequence(lit(1), length(col("term"))), i =>
        concat(col("term").substr(lit(1), i - 1),
          col("term").substr(i + 1, length(col("term"))))))
    val vd = voc.select(col("term"), col("cnt"),
      explode(array_distinct(delKeys)).as("key"))
    vd.join(broadcast(qd), Seq("key"))
      .select("query", "term", "cnt").distinct()
      .filter(levenshtein(col("query"), col("term")) <= 1)
      .select(col("query"), col("term"),
        levenshtein(col("query"), col("term")).cast("long").as("dist"),
        col("cnt"))
      .orderBy(col("query"), col("dist"), col("cnt").desc, col("term"))
  }

  /** RAG context packing — the composed retrieval step between "index
    * the corpus" and "call the model": chunk every document
    * ([[chunkDocs]]), score chunks against the query terms (exact
    * integer term-frequency — deterministic, no corpus stats needed at
    * chunk grain), keep the global top-k, and PACK them greedily in
    * rank order until the token budget is exhausted (a chunk that
    * would overflow the budget is dropped, as are all after it —
    * cumulative-sum cut, the standard context-window assembly rule).
    *
    * Scale shape: chunking + scoring are one map-only pass over the
    * corpus (no shuffle, no join); top-k is a TakeOrdered (never a
    * global sort); the rank/cumsum windows run on the k-bounded
    * survivor frame — driver-sized by construction. All-integer
    * output → hash-exact oracle.
    *
    * Returns (idCol, chunk_idx, score, rank, n_tokens, cum_tokens)
    * in pack order.
    */
  def ragContextPack(df: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String], k: Int = 20,
                     tokenBudget: Long = 120L, chunkSize: Int = 24,
                     overlap: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 1000, "k must be 1..1000")
    val chunks = chunkDocs(df, idCol, textCol, chunkSize, overlap)
    val cw = tokens(col("chunk_text"))
    val score = queryTerms.map(t =>
      size(filter(cw, x => x === t)).cast("long")).reduceLeft(_ + _)
    val ord = Seq(col("score").desc, col(idCol).asc, col("chunk_idx").asc)
    val scored = chunks.withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(ord: _*).limit(k)
    val w = Window.orderBy(ord: _*) // k-bounded frame
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens").cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col(idCol), col("chunk_idx"), col("score"), col("rank"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy("rank")
  }

  /** Retrieval-quality evaluation harness — MRR and NDCG@k of the
    * [[bm25]] ranking against graded relevance derived from the data
    * itself (rel(doc) = number of distinct query terms present — the
    * standard pseudo-qrel when no human labels exist). One output row
    * per query: (query_id, n_ret, first_rel_rank, mrr, dcg10, idcg10,
    * ndcg10). This is the eval loop a retrieval pipeline runs after
    * every index/scorer change.
    *
    * DETERMINISM: with k fixed, the per-position log2 discounts are
    * DRIVER-COMPUTED constants injected into both engines via
    * toString, so DCG = Σ_r gain_r·d_r is a fixed-order textual sum of
    * (exact integer gain (2^rel−1)) × (identical double constant) —
    * bit-reproducible with NO runtime log at all. MRR is one division
    * by an integer rank. The per-query frames are k-bounded, so the
    * single-partition rank windows cost nothing.
    *
    * Scale shape per query: the two bm25 corpus scans + one broadcast
    * join of the k-row ranked list back to the corpus for relevance
    * grading; metrics aggregate k rows. Queries are a literal batch
    * (an eval set is driver-sized by definition).
    */
  def searchEvalMetrics(df: DataFrame, idCol: String, textCol: String,
                        queries: Seq[(String, Seq[String])],
                        k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 100, "k must be 1..100")
    val discounts = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val perQuery = queries.map { case (qid, terms) =>
      val ranked = bm25(df, idCol, textCol, terms, topK = k)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col(idCol)))) // k-bounded
      val ts = tokens(col(textCol))
      val rel = df.select(col(idCol),
        terms.map(t => when(array_contains(ts, t), 1).otherwise(0))
          .reduceLeft(_ + _).as("rel"))
      val graded = rel.join(broadcast(ranked), Seq(idCol))
        .withColumn("ipos", row_number().over(
          Window.orderBy(col("rel").desc, col("rank")))) // ideal order
      val gain = (expr("shiftleft(1, rel)") - 1).cast("double")
      def posSum(posCol: String): Column =
        (1 to k).map(r => coalesce(
          max(when(col(posCol) === r, gain * lit(discounts(r - 1)))),
          lit(0.0))).reduceLeft(_ + _)
      graded.agg(count(lit(1)).as("n_ret"),
          min(when(col("rel") > 0, col("rank"))).cast("long")
            .as("first_rel_rank"),
          posSum("rank").as("dcg_raw"), posSum("ipos").as("idcg_raw"))
        .select(lit(qid).as("query_id"), col("n_ret"),
          col("first_rel_rank"),
          when(col("first_rel_rank").isNull, 0.0)
            .otherwise(round(lit(1.0) / col("first_rel_rank"), 6)).as("mrr"),
          round(col("dcg_raw"), 4).as("dcg10"),
          round(col("idcg_raw"), 4).as("idcg10"),
          when(col("idcg_raw") > 0.0,
            round(col("dcg_raw") / col("idcg_raw"), 4))
            .otherwise(0.0).as("ndcg10"))
    }
    perQuery.reduceLeft(_ unionAll _).orderBy("query_id")
  }

  /** Corpus bigram language-model score — the statistical quality
    * signal family (a KenLM-style filter's skeleton, with the corpus
    * itself as the model): per doc, the mean log MLE probability of its
    * bigrams, `avg(ln(C(a b) / C(a ·)))`, where counts come from the
    * whole corpus. Degenerate repetitive docs score HIGH (their bigrams
    * are their own corpus mass), rare/garbled sequences score LOW.
    *
    * Scale shape: one explode → two hash-partitioned count aggregations
    * (map-side partial) → two equi-joins on the count keys → one final
    * per-doc aggregation. The mean is rounded to 4 dp, absorbing
    * double-summation-order jitter, same policy as the other
    * sum-of-doubles entries.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bind the token array once — see pmiCollocations: an un-aliased
    // tokens() tree inside the transform lambda re-tokenizes the
    // document per bigram (no CSE inside interpreted HOF lambdas)
    val toks = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("ws"))
    val nw = size(col("ws"))
    val bigrams = when(nw >= 2,
      transform(sequence(lit(1), nw - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val bi = toks.select(col("doc_id"), explode(bigrams).as("big"))
      .withColumn("pre", element_at(split(col("big"), " "), 1))
    val cb = bi.groupBy("big").agg(count(lit(1)).as("cnt_big"))
    val cp = bi.groupBy("pre").agg(count(lit(1)).as("cnt_pre"))
    bi.join(cb, Seq("big")).join(cp, Seq("pre"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log(col("cnt_big") / col("cnt_pre")))
          / count(lit(1)), 4).as("avg_logprob"))
  }

  /** HELD-OUT language-model scoring — the eval-hygiene variant of
    * [[lmScore]]: bigram counts come from a TRAIN split (deterministic
    * md5-hash bucket of doc_id — the portable [[Sketches.hash32]], so
    * the split replays in the oracle, unlike xxhash64) and only TEST
    * docs are scored, with add-one smoothing
    * ln((c(big)+1) / (c(pre)+V)) so unseen bigrams contribute a real
    * penalty instead of a join miss. NOTE: V here is the number of
    * DISTINCT TRAIN PREFIX CONTEXTS (`cp.count()` below), not the
    * unigram vocabulary of textbook Laplace smoothing — a deliberate,
    * cross-engine-consistent variant (the oracle computes the same V);
    * with bigram prefixes the two differ only by words appearing
    * solely in document-final position. This is the perplexity-filter
    * shape an actual pipeline runs (scoring corpus ≠ model corpus —
    * in-corpus scoring rewards exactly the degenerate repetitive docs
    * it should demote).
    *
    * Scale shape: identical to lmScore (explode + two partial-agg
    * count tables + two LEFT equi-joins + per-doc agg) plus ONE
    * vocabulary-sized count action for V. Per-doc mean rounded 4 dp
    * (the order-jitter convention).
    *
    * Returns (doc_id, n_bigrams, n_unseen, avg_logprob) for test docs.
    */
  def lmScoreHoldout(df: DataFrame, idCol: String, textCol: String,
                     testBuckets: Int = 1, nBuckets: Int = 5): DataFrame = {
    require(testBuckets >= 1 && testBuckets < nBuckets)
    val toks = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("ws"),
      (pmod(Sketches.hash32(col(idCol)), lit(nBuckets.toLong)) <
        testBuckets).as("is_test"))
    val nw = size(col("ws"))
    val bigrams = when(nw >= 2,
      transform(sequence(lit(1), nw - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val bi = toks.select(col("doc_id"), col("is_test"),
      explode(bigrams).as("big"))
      .withColumn("pre", element_at(split(col("big"), " "), 1))
    val train = bi.filter(!col("is_test"))
    val cb = train.groupBy("big").agg(count(lit(1)).as("cnt_big"))
    val cp = train.groupBy("pre").agg(count(lit(1)).as("cnt_pre"))
    val vocab = cp.count() // vocabulary-sized, one driver action
    bi.filter(col("is_test"))
      .join(cb, Seq("big"), "left")
      .join(cp, Seq("pre"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt_big").isNull, 1L).otherwise(0L)).as("n_unseen"),
        round(sum(log((coalesce(col("cnt_big"), lit(0L)) + 1L)
            .cast("double") /
          (coalesce(col("cnt_pre"), lit(0L)) + vocab).cast("double")))
          / count(lit(1)), 4).as("avg_logprob"))
  }

  /** Corpus PMI collocations — the classic "which word pairs belong
    * together" corpus statistic (phrase mining / tokenizer-merge
    * candidates in a training-data pipeline):
    * pmi(x,y) = ln( p(xy) / (p(x)·p(y)) ) over adjacent-word bigrams,
    * reported for pairs seen ≥ `minCount` times, top-k by PMI.
    *
    * Scale shape: one explode+agg for unigram counts, one for bigram
    * counts (both map-side partial-agg), a broadcast 1-row totals
    * frame, two equi-joins on the unigram table, and a
    * TakeOrderedAndProject top-k — the full bigram table never sorts
    * globally. The PMI ratio is computed as one DOUBLE expression with
    * a fixed operand order (numerator/denominator products of exact
    * LONG counts — fits 2^63 up to ~10¹¹-token corpora; past that,
    * switch the ratio to a sum of lns), so the oracle reproduces it
    * bit-for-bit.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5, k: Int = 50): DataFrame = {
    // Tokenize ONCE into a bound, materialized column. An un-aliased
    // tokens() tree referenced inside the transform lambda is INLINED
    // per reference — there is no common-subexpression elimination
    // inside interpreted higher-order functions, so element_at(ws, i)
    // would re-split the whole document for EVERY bigram (measured 20×:
    // 6 s vs 0.3 s for the bigram count at sf0.1). The checkpoint also
    // keeps the three consumers (totals, unigrams, bigrams) from
    // re-tokenizing per branch.
    val toks = df.select(tokens(col(textCol)).as("ws")).localCheckpoint(true)
    val nw = size(col("ws"))
    val bigrams = when(nw >= 2,
      transform(sequence(lit(1), nw - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val tot = toks
      .agg(sum(nw).as("t"), sum(greatest(nw - 1, lit(0))).as("tb"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val cb = toks.select(explode(bigrams).as("big"))
      .groupBy("big").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
      .withColumn("w1", element_at(split(col("big"), " "), 1))
      .withColumn("w2", element_at(split(col("big"), " "), 2))
    cb.join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log((col("pair_count").cast("double") * col("t") * col("t"))
          / (col("tb").cast("double") * col("cu1") * col("cu2"))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k)
  }

  /** Corpus TF-IDF: per (doc, term) weight tf · ln(N / df) over
    * whitespace tokens. Scale shape: two hash-partitioned aggregations
    * (doc-term counts with map-side partial agg, then per-term doc
    * frequency — the doc-term table is already unique per doc so df is
    * a plain count), a broadcast of the 1-row corpus size, and one
    * equi-join on `term`. No collect, no UDF; the idf math is plain
    * double `ln` so the oracle reproduces it bit-for-bit.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = ex.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("dfreq")), 6))
      .select("doc_id", "term", "tf", "dfreq", "tfidf")
  }

  /** BPE merge training — induce the first `rounds` byte-pair-encoding
    * merges from the corpus (Sennrich et al. 2016, the vocabulary step
    * every tokenizer pipeline runs before training): start from
    * characters, repeatedly count adjacent symbol pairs across the
    * corpus and fuse the most frequent one. Greedy LEFT-TO-RIGHT
    * NON-OVERLAPPING application within a word (the standard BPE
    * semantics), tie-broken by (count desc, left asc, right asc) so
    * the merge sequence is a total function of the corpus.
    *
    * REPRESENTATION is what makes a cross-engine oracle possible:
    * each word is carried as a delimiter-wrapped symbol string —
    * `‹a›‹b›‹c›` — so "merge (x,y)" is exactly
    * `replace(w, '‹x›‹y›', '‹xy›')`, and both engines' `replace`
    * (left-to-right, non-overlapping, resume AFTER the consumed match)
    * implement precisely BPE's greedy application — including the
    * `aaaa` case, where `‹a›‹a›‹a›‹a›` correctly fuses to `‹aa›‹aa›`
    * because the first match consumes both delimiters. The exclusion
    * "symbols never contain the delimiter chars" is ENFORCED, not
    * assumed: word types containing U+2039/U+203A ('‹'/'›' — real
    * single-angle quotation marks in French/German text) are dropped
    * before wrapping, identically in both engines, so no false
    * boundary match can corrupt pair counts or the '‹'-count tally.
    *
    * Scale shape: the corpus-sized work is ONE tokenize + word-type
    * count shuffle (the classic BPE-on-types trick — everything after
    * runs on the vocabulary-sized type table, which at 100 TB is
    * millions of rows, not billions); per round one pair explode +
    * partial-agg + a 1-row driver argmax (bounded collect, the
    * msf/assortativity convention) + one narrow map applying the
    * merge. Stops early when no pair remains.
    *
    * Returns (merge_round, left_sym, right_sym, merged, pair_count).
    */
  def bpeMerges(df: DataFrame, textCol: String,
                rounds: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeMergeList(df, textCol, rounds)
      .toDF("merge_round", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** The training loop behind [[bpeMerges]], returning the merge
    * sequence as driver values — the form [[bpeEncodeStats]] needs to
    * apply the merges (k chained replaces) to the corpus. The merge
    * table is tokenizer metadata: tiny (≤ `rounds` rows) by
    * construction, so holding it on the driver is the bounded-collect
    * convention, not a scale hazard.
    */
  def bpeMergeList(df: DataFrame, textCol: String, rounds: Int = 8)
  : Seq[(Int, String, String, String, Long)] = {
    require(rounds >= 1 && rounds <= 64, "bpeMerges rounds must be 1..64")
    var w = df.select(explode(tokens(col(textCol))).as("word"))
      // enforce the delimiter exclusion (see doc): a word type that
      // itself contains '‹'/'›' would wrap into false symbol
      // boundaries, so such types are dropped — in BOTH engines
      .filter(!col("word").contains("‹") && !col("word").contains("›"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("word"), "(.)", "‹$1›").as("w"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = w
        .select(split(regexp_replace(col("w"), "^‹|›$", ""), "›‹").as("s"),
          col("cnt"))
        .filter(size(col("s")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(s) - 2), " +
            "i -> struct(s[i] AS x, s[i + 1] AS y))")).as("p"), col("cnt"))
        .groupBy(col("p.x"), col("p.y")).agg(sum("cnt").as("c"))
        .orderBy(desc("c"), col("x"), col("y"))
        .limit(1).collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val (x, y, c) =
          (pairs(0).getString(0), pairs(0).getString(1), pairs(0).getLong(2))
        merges += ((r, x, y, x + y, c))
        w = w.select(call_function("replace", col("w"),
          lit(s"‹$x›‹$y›"), lit(s"‹$x$y›")).as("w"), col("cnt"))
        r += 1
      }
    }
    merges.toSeq
  }

  /** BPE ENCODING — apply the `rounds` merges [[bpeMergeList]] trains
    * on this corpus to every document and report per-doc token counts
    * (the tokenizer-application half of the BPE loop: train →
    * encode → count, the number every token-budget / mixture recipe
    * is denominated in). Same wrapped-symbol representation, so each
    * merge is ONE `replace` and the whole encoder is `rounds` chained
    * narrow string ops; the post-merge token count of a word is just
    * its '‹' count (one delimiter pair per surviving symbol).
    *
    * Scale shape: encoding runs on the WORD-TYPE table (the same
    * BPE-on-types trick as training — vocabulary-sized, not
    * corpus-sized), then one equi-join back to per-doc word counts and
    * one per-doc partial agg. Corpus-sized work is exactly two
    * shuffles: the (doc, word) count and the doc rollup.
    *
    * Returns (doc_id, n_words, n_tokens) — n_tokens = Σ words'
    * post-merge symbol counts; n_tokens = character count when
    * rounds = 0 merges fire, and decreases monotonically as merges
    * apply. All-integer output, hash-exact oracle.
    */
  def bpeEncodeStats(df: DataFrame, idCol: String, textCol: String,
                     rounds: Int = 8): DataFrame = {
    val merges = bpeMergeList(df, textCol, rounds)
    // the unrolled oracle replays ALL `rounds` CTEs; a corpus that
    // exhausts merges early would cross-join an empty argmax there —
    // fail loudly on this side instead (never fires on real corpora)
    require(merges.size == rounds,
      s"corpus exhausted after ${merges.size} merges; oracle unrolls $rounds")
    val dc = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("word"))
      // same delimiter exclusion as training (see bpeMerges doc)
      .filter(!col("word").contains("‹") && !col("word").contains("›"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // reused: type extraction + the join back
    val wrapped = dc.select("word").distinct()
      .select(col("word"),
        regexp_replace(col("word"), "(.)", "‹$1›").as("w"))
    val encoded = merges.foldLeft(wrapped) { case (acc, (_, x, y, _, _)) =>
      acc.withColumn("w", call_function("replace", col("w"),
        lit(s"‹$x›‹$y›"), lit(s"‹$x$y›")))
    }
    val typeSyms = encoded.select(col("word"),
      (length(col("w")) -
        length(call_function("replace", col("w"), lit("‹"), lit(""))))
        .cast("long").as("n_syms"))
    dc.join(typeSyms, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("n_syms")).as("n_tokens"))
  }

  /** DuckDB oracle for [[bpeEncodeStats]] over `documents` — the
    * training CTE chain of [[bpeMergesSql]] (so the merges replay from
    * the data, not from injected constants) plus the same
    * type-encode / join-back / rollup.
    */
  def bpeEncodeStatsSql(rounds: Int = 8): String = {
    val sb = new StringBuilder(bpeTrainCtesSql(rounds))
    sb ++= """, dw AS (SELECT doc_id, unnest(list_filter(""" +
      """regexp_split_to_array(lower(text), '\s+'), """ +
      """x -> x != '' AND NOT contains(x, '‹') AND NOT contains(x, '›'))) """ +
      "AS word FROM documents)"
    sb ++= ", dc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM dw GROUP BY 1, 2)"
    sb ++= """, ty0 AS (SELECT word, regexp_replace(word, '(.)', '‹\1›', 'g')""" +
      " AS w FROM (SELECT DISTINCT word FROM dc))"
    for (r <- 1 to rounds) {
      sb ++= s", ty$r AS (SELECT word, replace(v.w, " +
        "'‹' || b.x || '›‹' || b.y || '›', '‹' || b.x || b.y || '›') " +
        s"AS w FROM ty${r - 1} v CROSS JOIN b$r b)"
    }
    sb ++= s" SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_words, " +
      "CAST(SUM(c * (length(w) - length(replace(w, '‹', '')))) AS BIGINT) " +
      s"AS n_tokens FROM dc JOIN ty$rounds t ON t.word = dc.word " +
      "GROUP BY 1 ORDER BY doc_id"
    sb.toString
  }

  /** DuckDB oracle for [[bpeMerges]] over `documents.text` — the
    * identical rounds unrolled as CTEs: zipped-unnest adjacent pairs
    * from the slice views `s[1:n-1]` / `s[2:n]`, the same
    * (count desc, pair asc) argmax, the same wrapped-string replace.
    */
  def bpeMergesSql(rounds: Int = 8): String = {
    val sels = (1 to rounds).map(r =>
      s"SELECT $r AS merge_round, x AS left_sym, y AS right_sym, " +
        s"x || y AS merged, c AS pair_count FROM b$r")
      .mkString(" UNION ALL ")
    s"${bpeTrainCtesSql(rounds)} $sels ORDER BY merge_round"
  }

  /** The shared training CTE chain (t, w0, s_r/p_r/g_r/b_r/w_r per
    * round) behind [[bpeMergesSql]] and [[bpeEncodeStatsSql]]: b_r is
    * round r's winning merge pair, w_r the type table after it.
    */
  private def bpeTrainCtesSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH t AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM " +
      "(SELECT unnest(list_filter(regexp_split_to_array(lower(text), " +
      """'\s+'), x -> x != '' AND NOT contains(x, '‹') """ +
      """AND NOT contains(x, '›'))) AS w FROM documents) GROUP BY 1), """
    sb ++= """w0 AS (SELECT regexp_replace(w, '(.)', '‹\1›', 'g') AS w, """ +
      "cnt FROM t)"
    for (r <- 1 to rounds) {
      val prev = s"w${r - 1}"
      sb ++= s", s$r AS (SELECT string_split(" +
        s"regexp_replace(w, '^‹|›${"$"}', '', 'g'), '›‹') AS s, cnt " +
        s"FROM $prev)"
      sb ++= s", p$r AS (SELECT unnest(s[1:len(s)-1]) AS x, " +
        s"unnest(s[2:len(s)]) AS y, cnt FROM s$r WHERE len(s) >= 2)"
      sb ++= s", g$r AS (SELECT x, y, CAST(SUM(cnt) AS BIGINT) AS c " +
        s"FROM p$r GROUP BY 1, 2)"
      sb ++= s", b$r AS (SELECT x, y, c FROM g$r " +
        "ORDER BY c DESC, x, y LIMIT 1)"
      sb ++= s", w$r AS (SELECT replace(v.w, " +
        "'‹' || b.x || '›‹' || b.y || '›', '‹' || b.x || b.y || '›') " +
        s"AS w, v.cnt FROM $prev v CROSS JOIN b$r b)"
    }
    sb.toString
  }
}

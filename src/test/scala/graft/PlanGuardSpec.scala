package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scale guard over the ENTIRE registered query surface, machine-checked
  * on every run:
  *
  *   1. NO entry may plan a `CartesianProduct` — zero tolerance, no
  *      whitelist. An all-pairs join sneaking into a registered entry is
  *      exactly the class of bug the round-2 review caught by hand
  *      (`simhashPairs`'s cartesian); this locks it out for good.
  *   2. A `BroadcastNestedLoopJoin` is allowed ONLY for entries in the
  *      explicit whitelist below, each with the bounded-broadcast reason
  *      it is acceptable. The whitelist is EXACT: an entry that stops
  *      planning a BNLJ must be removed (staleness is a failure too),
  *      so the list can never silently over-allow.
  *
  * Checked on the physical plan (formatted explain), so a non-equi
  * condition that Catalyst silently downgrades to a nested-loop join is
  * caught even when the DataFrame code LOOKS like an equi-join.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Entries allowed to plan a BroadcastNestedLoopJoin, each because the
    * broadcast side is a driver-bounded frame (1 row, or ≤ salt-factor
    * rows) — a map-side probe at any corpus size, not an O(n²) join.
    */
  private val bnljWhitelist: Map[String, String] = Map(
    "mvcc_roundtrip" -> "crossJoin(broadcast(1-row maxSeq)) in the MVCC write path",
    "mvcc_compact" -> "same maxSeq pattern (input built through putBlocks/deleteBlocks)",
    "workspace_lifecycle" -> "same maxSeq pattern through Workspace ops",
    "ann_topk" -> "broadcast 1-row query vector",
    "ann_topk_native" -> "broadcast 1-row query vector",
    "ann_topk_mips" -> "broadcast 1-row query vector",
    "ann_topk_l2" -> "broadcast 1-row query vector",
    "ann_topk_quant" -> "broadcast 1-row query vector + scale row",
    "ann_ivf" -> "broadcast 1-row query vector + nprobe cell ids",
    "ann_ivfpq" -> "broadcast 1-row query vector + nprobe cell ids",
    "text_tfidf" -> "broadcast 1-row corpus-size frame",
    "corpus_pmi" -> "broadcast 1-row corpus-totals frame (t, tb)",
    "text_bm25" -> "broadcast 1-row corpus-stats frame (N, avgdl)",
    "salted_join_agg" -> "broadcast salt-expansion frame (rows = salt factor)",
    "embedding_score_filter" -> "broadcast 1-row percentile-cutoff frame",
    "hybrid_search_rrf" -> "broadcast 1-row query vector + 1-row bm25 stats frame",
    "q11_important_parts" -> "broadcast 1-row global (total, n_parts) frame",
    "q22_idle_customers" -> "broadcast 1-row global avg-balance frame",
    "search_eval_metrics" -> "broadcast 1-row bm25 corpus-stats frame per eval query",
    // exact all-pairs cosine — KEPT deliberately as the small-n recall
    // oracle for ann_neardup_lsh (the registered scale path)
    "embedding_neardup" -> "documented small-n recall oracle (all-pairs by design)"
  )

  test("plan guard: no cartesian anywhere; BNLJ only where whitelisted") {
    val flagged = scala.collection.mutable.Map.empty[String, String]
    Queries.entries.map(_._1).foreach { name =>
      val df =
        try Queries.queries(name)(spark, dir)
        catch {
          case e: Throwable =>
            fail(s"entry $name failed to BUILD its plan: ${e.getMessage}")
        }
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val kinds = Seq(
        if (plan.contains("CartesianProduct")) Some("CartesianProduct") else None,
        if (plan.contains("BroadcastNestedLoopJoin")) Some("BroadcastNestedLoopJoin") else None
      ).flatten
      if (kinds.nonEmpty) flagged += name -> kinds.mkString("+")
    }

    val cartesian = flagged.filter(_._2.contains("CartesianProduct")).keys.toSeq.sorted
    assert(cartesian.isEmpty,
      s"entries planning a CartesianProduct (never allowed): $cartesian")

    val offenders = (flagged.keySet -- bnljWhitelist.keySet).toSeq.sorted
    assert(offenders.isEmpty,
      s"entries planning BroadcastNestedLoopJoin outside the whitelist: " +
        offenders.map(n => s"$n(${flagged(n)})").mkString(", "))

    val stale = (bnljWhitelist.keySet -- flagged.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"whitelisted entries no longer plan a BNLJ — remove them: $stale")
  }
}

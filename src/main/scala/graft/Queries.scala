package graft

import graft.queries.{QueriesCore, QueriesGraph, QueriesIngest, QueriesPipeline, QueriesRelational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated driver-contract registry. */
object Queries {
  val entries: Seq[QueriesCore.Entry] =
    QueriesCore.entries ++ QueriesGraph.entries ++
      QueriesPipeline.entries ++ QueriesRelational.entries ++
      QueriesIngest.entries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => e._1 -> e._2).toMap

  lazy val oracles: Map[String, String] =
    entries.flatMap(e => e._3.map(sql => e._1 -> sql)).toMap

  /** Headline bench subset: the reference's own bench shapes
    * (BFS depth 3/5, edge filter, keyword/semantic search, batch
    * lookup — `/root/reference/src/bench/query.zig:47-143`) plus the
    * scale-relevant pipeline operators.
    */
  val benchNames: Seq[String] = Seq(
    "bfs_out_depth3", "bfs_out_depth5", "traverse_dfs_set",
    "bfs_edge_filter", "bfs_in_depth2", "bfs_in_depth5",
    "keyword_search", "find_blocks_batch", "mvcc_current", "topo_levels",
    "sssp_weighted", "graph_pagerank", "graph_kcore",
    "graph_components", "graph_triangles", "graph_degrees", "graph_lpa",
    "ann_knn_join",
    "context_query", "filter_bool_tree",
    "dedup_minhash_bands", "dedup_minhash_bands_fast",
    "dedup_exact", "dedup_incremental", "dedup_prefix_join",
    "ann_topk", "ann_topk_native",
    "ann_topk_quant",
    "ann_neardup_lsh", "embedding_kmeans",
    "text_stats", "text_tfidf", "text_bm25", "text_pii_scan",
    "text_chunking", "embedding_score_filter", "hybrid_search_rrf",
    "text_dup_ngrams", "text_dup_spans", "semdedup", "sample_mixture",
    "sample_weighted",
    "corpus_prep_pipeline",
    "corpus_top_terms", "corpus_pmi",
    "q1_agg", "q3_top_orders", "agg_topk_group", "events_tumbling",
    "events_asof_join", "events_range_pairs", "events_attribution",
    "events_histogram", "events_kmv_distinct", "events_hist_quantiles",
    "events_funnel", "events_retention", "events_cms_counts",
    "events_session_windows", "events_gapfill", "events_cusum",
  )
}

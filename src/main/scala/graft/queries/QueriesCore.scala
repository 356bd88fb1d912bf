package graft.queries

import graft.core.{Mvcc, Schemas, Tables}
import graft.graph.CodeGraph
import graft.query.{FilterExpr, Keyword, Lookups, NameResolver}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query entries: MVCC/storage, filtering, name
  * resolution, keyword search. Each entry is (name, query fn, oracle SQL
  * for DuckDB over the same parquet tables). Every result ends in a
  * total deterministic ORDER BY mirrored in the oracle.
  */
object QueriesCore {
  type Fn = (SparkSession, String) => DataFrame
  type Entry = (String, Fn, Option[String])

  private val VB = CodeGraph.versionedBlocksSql
  private val B = CodeGraph.blocksSql

  /** DuckDB current-view select over the versioned blocks CTE. */
  private val currentViewSql =
    s"""WITH vb AS ($VB)
       |SELECT id, sequence, unit_type, value FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY sequence DESC) AS rn
       |  FROM vb
       |) WHERE rn = 1 AND NOT is_deleted""".stripMargin.replace("\n", " ")

  private def current(s: SparkSession, d: String): DataFrame =
    Schemas.currentView(CodeGraph.versionedBlocks(s, d))
      .select("id", "sequence", "unit_type", "value")

  val entries: Seq[Entry] = Seq(

    // ===== MVCC view + write path =====
    ("mvcc_current",
      (s, d) => current(s, d).orderBy("id"),
      Some(s"$currentViewSql ORDER BY id")),

    // Time-travel: the view as of a historical sequence horizon —
    // versions above it don't exist yet, tombstones at/below still
    // shadow (the reference LSM's read-at-sequence semantics).
    ("mvcc_asof",
      (s, d) => Schemas.currentViewAsOf(CodeGraph.versionedBlocks(s, d), 500L)
        .select("id", "sequence", "unit_type", "value").orderBy("id"),
      Some(s"""WITH vb AS ($VB), h AS (SELECT * FROM vb WHERE sequence <= 500)
        | SELECT id, sequence, unit_type, value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY id ORDER BY sequence DESC) AS rn
        |   FROM h) WHERE rn = 1 AND NOT is_deleted ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    // CDC between two snapshots (r7): what a reader that last saw
    // horizon 300 must apply to catch up to horizon 700 — per edge key,
    // added / removed / updated with the winning sequences on each
    // side; unchanged keys dropped (delta-sized output). The edge
    // analogue of the reference's WAL replay between two read points.
    ("mvcc_edge_diff",
      (s, d) => graft.core.Schemas.asOfDiffKeyed(
          graft.graph.CodeGraph.versionedEdges(s, d), 300L, 700L,
          Seq("src", "dst", "edge_type"))
        .orderBy("src", "dst"),
      Some(s"""WITH ve AS (${graft.graph.CodeGraph.versionedEdgesSql}),
        | lo AS (SELECT src, dst, edge_type, sequence AS seq_before FROM (
        |   SELECT *, row_number() OVER (PARTITION BY src, dst, edge_type
        |     ORDER BY sequence DESC) AS rn FROM ve WHERE sequence <= 300)
        |  WHERE rn = 1 AND NOT is_deleted),
        | hi AS (SELECT src, dst, edge_type, sequence AS seq_after FROM (
        |   SELECT *, row_number() OVER (PARTITION BY src, dst, edge_type
        |     ORDER BY sequence DESC) AS rn FROM ve WHERE sequence <= 700)
        |  WHERE rn = 1 AND NOT is_deleted),
        | j AS (SELECT COALESCE(l.src, h.src) AS src,
        |   COALESCE(l.dst, h.dst) AS dst,
        |   COALESCE(l.edge_type, h.edge_type) AS edge_type,
        |   l.seq_before, h.seq_after,
        |   CASE WHEN l.seq_before IS NULL THEN 'added'
        |    WHEN h.seq_after IS NULL THEN 'removed'
        |    WHEN l.seq_before <> h.seq_after THEN 'updated'
        |    ELSE 'unchanged' END AS change
        |  FROM lo l FULL OUTER JOIN hi h
        |   ON l.src = h.src AND l.dst = h.dst AND l.edge_type = h.edge_type)
        | SELECT * FROM j WHERE change <> 'unchanged'
        | ORDER BY src, dst""".stripMargin.replace("\n", " "))),

    ("mvcc_roundtrip",
      (s, d) => {
        import s.implicits._
        val vb = CodeGraph.versionedBlocks(s, d)
        val puts = Seq(("U1", "put", 1.5), ("U2", "put", 2.5), ("U999", "put", 3.5))
          .toDF("id", "unit_type", "value")
        val v2 = Mvcc.putBlocks(vb, puts)
        val v3 = Mvcc.deleteBlocks(v2, Seq("U3", "U5"))
        Schemas.currentView(v3)
          .select("id", "sequence", "unit_type", "value").orderBy("id")
      },
      Some(s"""WITH vb AS ($VB),
        | m AS (SELECT MAX(sequence) AS mx FROM vb),
        | puts(id, unit_type, value, rk) AS (VALUES
        |   ('U1','put',CAST(1.5 AS DOUBLE),1),
        |   ('U2','put',CAST(2.5 AS DOUBLE),2),
        |   ('U999','put',CAST(3.5 AS DOUBLE),3)),
        | v2 AS (SELECT * FROM vb UNION ALL
        |   SELECT p.id, m.mx + p.rk, p.unit_type, p.value, false FROM puts p, m),
        | m2 AS (SELECT MAX(sequence) AS mx FROM v2),
        | dels(id, rk) AS (VALUES ('U3',1),('U5',2)),
        | v3 AS (SELECT * FROM v2 UNION ALL
        |   SELECT dl.id, m2.mx + dl.rk, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), true
        |   FROM dels dl, m2)
        | SELECT id, sequence, unit_type, value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY id ORDER BY sequence DESC) AS rn
        |   FROM v3) WHERE rn = 1 AND NOT is_deleted ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    // Compaction through the same write sequence as mvcc_roundtrip:
    // keep each id's latest version ONLY; tombstones survive with
    // is_deleted = true (they must keep shadowing un-compacted
    // segments — reference tombstone.zig:27-64), shadowed history is
    // gone. The oracle replays the identical rn = 1 selection WITHOUT
    // the NOT is_deleted filter that the current view applies.
    ("mvcc_compact",
      (s, d) => {
        import s.implicits._
        val vb = CodeGraph.versionedBlocks(s, d)
        val puts = Seq(("U1", "put", 1.5), ("U2", "put", 2.5), ("U999", "put", 3.5))
          .toDF("id", "unit_type", "value")
        val v2 = Mvcc.putBlocks(vb, puts)
        val v3 = Mvcc.deleteBlocks(v2, Seq("U3", "U5"))
        Mvcc.compact(v3)
          .select("id", "sequence", "unit_type", "value", "is_deleted")
          .orderBy("id")
      },
      Some(s"""WITH vb AS ($VB),
        | m AS (SELECT MAX(sequence) AS mx FROM vb),
        | puts(id, unit_type, value, rk) AS (VALUES
        |   ('U1','put',CAST(1.5 AS DOUBLE),1),
        |   ('U2','put',CAST(2.5 AS DOUBLE),2),
        |   ('U999','put',CAST(3.5 AS DOUBLE),3)),
        | v2 AS (SELECT * FROM vb UNION ALL
        |   SELECT p.id, m.mx + p.rk, p.unit_type, p.value, false FROM puts p, m),
        | m2 AS (SELECT MAX(sequence) AS mx FROM v2),
        | dels(id, rk) AS (VALUES ('U3',1),('U5',2)),
        | v3 AS (SELECT * FROM v2 UNION ALL
        |   SELECT dl.id, m2.mx + dl.rk, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), true
        |   FROM dels dl, m2)
        | SELECT id, sequence, unit_type, value, is_deleted FROM (
        |   SELECT *, row_number() OVER (PARTITION BY id ORDER BY sequence DESC) AS rn
        |   FROM v3) WHERE rn = 1 ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    // put_edge dedup semantics through the real write path: an identical
    // (src, dst, edge_type) is stored once, like the reference's
    // bidirectional edge index on put (engine.zig:1177-1252,
    // graph_edge_index.zig:111-144).
    ("put_edge_dedup",
      (s, d) => {
        import s.implicits._
        val existing = Seq(("A", "B", "calls"), ("A", "C", "calls"))
          .toDF("src", "dst", "edge_type")
        val puts = Seq(("A", "B", "calls"), ("B", "C", "calls"),
          ("B", "C", "calls"), ("A", "B", "imports"))
          .toDF("src", "dst", "edge_type")
        Mvcc.putEdges(existing, puts).orderBy("src", "dst", "edge_type")
      },
      Some("""SELECT DISTINCT * FROM (VALUES
        | ('A','B','calls'), ('A','C','calls'), ('A','B','calls'),
        | ('B','C','calls'), ('B','C','calls'), ('A','B','imports'))
        | t(src, dst, edge_type) ORDER BY src, dst, edge_type"""
        .stripMargin.replace("\n", " "))),

    ("find_block",
      (s, d) => Lookups.findBlock(current(s, d), "U7"),
      Some(s"$currentViewSql AND id = 'U7'")),

    ("block_sequence",
      (s, d) => current(s, d).filter(col("id") === "U11").select("id", "sequence"),
      Some(s"""WITH cv AS ($currentViewSql)
        | SELECT id, sequence FROM cv WHERE id = 'U11'"""
        .stripMargin.replace("\n", " "))),

    ("block_exists",
      (s, d) => current(s, d).filter(col("id") === "U3")
        .agg((count(lit(1)) > 0).as("present"))
        .select(lit("U3").as("id"), col("present")),
      Some(s"""WITH cv AS ($currentViewSql)
        | SELECT 'U3' AS id, COUNT(*) > 0 AS present FROM cv WHERE id = 'U3'"""
        .stripMargin.replace("\n", " "))),

    ("find_blocks_batch",
      (s, d) => Lookups.findBlocksBatch(current(s, d),
        (1 to 10).map(i => s"U$i")).orderBy("id"),
      Some(s"""WITH cv AS ($currentViewSql)
        | SELECT * FROM cv WHERE id IN
        |  ('U1','U2','U3','U4','U5','U6','U7','U8','U9','U10') ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("count_existing",
      (s, d) => Lookups.countExisting(current(s, d), (1 to 10).map(i => s"U$i")),
      Some(s"""WITH cv AS ($currentViewSql)
        | SELECT CAST(COUNT(*) AS BIGINT) AS n_existing FROM cv WHERE id IN
        |  ('U1','U2','U3','U4','U5','U6','U7','U8','U9','U10')"""
        .stripMargin.replace("\n", " "))),

    // ===== Filter expression language =====
    ("filter_contains",
      (s, d) => {
        import FilterExpr._
        CodeGraph.blocks(s, d)
          .filter(compile(And(Seq(
            Cond(Content, Contains, "spark"),
            Cond(Field("n_chars"), Gt, "300")))))
          .select("id", "n_chars").orderBy("id")
      },
      Some(s"""WITH blocks AS ($B)
        | SELECT id, n_chars FROM blocks
        | WHERE contains(content, 'spark') AND n_chars > 300 ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("filter_lexical",
      (s, d) => {
        import FilterExpr._
        // content never parses as a number -> exercises the lexical
        // fallback of the numeric-or-lexical compare (ANSI-safe try_cast)
        CodeGraph.blocks(s, d)
          .filter(compile(Cond(Content, Gt, "t")))
          .select("id").orderBy("id")
      },
      Some(s"""WITH blocks AS ($B)
        | SELECT id FROM blocks WHERE content > 't' ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("filter_bool_tree",
      (s, d) => {
        import FilterExpr._
        CodeGraph.blocks(s, d)
          .filter(compile(And(Seq(
            Or(Seq(Cond(Content, Contains, "join"), Cond(Content, Contains, "merge"))),
            Not(Cond(Content, Contains, "slow")),
            Cond(ContentLength, Le, "300"),
            Cond(Field("n_chars"), Ge, "100")))))
          .select("id", "n_chars").orderBy("id")
      },
      Some(s"""WITH blocks AS ($B)
        | SELECT id, n_chars FROM blocks
        | WHERE (contains(content,'join') OR contains(content,'merge'))
        |   AND NOT contains(content,'slow')
        |   AND length(content) <= 300 AND n_chars >= 100 ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("filter_affix",
      (s, d) => {
        import FilterExpr._
        CodeGraph.blocks(s, d)
          .filter(compile(Or(Seq(
            Cond(Content, StartsWith, "key"),
            Cond(Content, EndsWith, "value")))))
          .select("id").orderBy("id")
      },
      Some(s"""WITH blocks AS ($B)
        | SELECT id FROM blocks
        | WHERE starts_with(content,'key') OR ends_with(content,'value')
        | ORDER BY id""".stripMargin.replace("\n", " "))),

    ("filter_pagination",
      (s, d) => {
        import FilterExpr._
        FilterExpr.filteredQuery(CodeGraph.blocks(s, d),
            Cond(Field("n_chars"), Ge, "100"), "id", offset = 10, maxResults = 20)
          .select("id", "n_chars")
      },
      Some(s"""WITH blocks AS ($B)
        | SELECT id, n_chars FROM blocks WHERE n_chars >= 100
        | ORDER BY id OFFSET 10 LIMIT 20""".stripMargin.replace("\n", " "))),

    ("filter_metadata_json",
      (s, d) => {
        import FilterExpr._
        // metadata probe on a real JSON column (events.props)
        Tables.events(s, d)
          .filter(compile(Cond(MetadataField("k"), Gt, "50"), "props"))
          .select("event_id").orderBy("event_id")
      },
      Some("""SELECT event_id FROM events
        | WHERE TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DOUBLE) > 50
        | ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // ===== Keyword search =====
    ("keyword_search",
      (s, d) => Keyword.search(CodeGraph.blocks(s, d), "content", "id",
          "table join fast", threshold = 0.5, maxResults = 50)
        .select(col("id"), round(col("score"), 6).as("score")),
      Some(s"""WITH blocks AS ($B),
        | scored AS (SELECT id,
        |   (CASE WHEN contains(content,'table') THEN 1 ELSE 0 END
        |    + CASE WHEN contains(content,'join') THEN 1 ELSE 0 END
        |    + CASE WHEN contains(content,'fast') THEN 1 ELSE 0 END)
        |   / CAST(3 AS DOUBLE) AS score FROM blocks)
        | SELECT id, round(score, 6) AS score FROM scored WHERE score >= 0.5
        | ORDER BY score DESC, id LIMIT 50""".stripMargin.replace("\n", " "))),

    // ===== Name resolution =====
    ("find_by_name",
      (s, d) => NameResolver.findByName(CodeGraph.blocks(s, d), "", "document", "D42")
        .select("id", "unit_id").orderBy("id"),
      Some(s"""WITH blocks AS ($B)
        | SELECT id, unit_id FROM blocks WHERE unit_type = 'document'
        |   AND (string_split(unit_id, ':'))[-1] = 'D42' ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("find_by_name_qualified",
      (s, d) => NameResolver.findByName(CodeGraph.blocks(s, d), "", "document", "de.D7")
        .select("id", "unit_id").orderBy("id"),
      Some(s"""WITH blocks AS ($B)
        | SELECT id, unit_id FROM blocks WHERE unit_type = 'document'
        |   AND (string_split(unit_id, ':'))[-1] = 'D7'
        |   AND (string_split(unit_id, ':'))[-2] = 'de' ORDER BY id"""
        .stripMargin.replace("\n", " "))),

    ("find_by_file_path",
      (s, d) => NameResolver.findByFilePath(CodeGraph.blocks(s, d), "src3", "src3")
        .select("id", "unit_id").orderBy("id"),
      Some(s"""WITH blocks AS ($B)
        | SELECT id, unit_id FROM blocks
        | WHERE workspace = 'src3' AND file_path = 'src3' ORDER BY id"""
        .stripMargin.replace("\n", " "))),
  )
}

package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** MVCC shadowing guarantees — mirrors the reference's
  * explicit-correctness scenarios (tombstone permanence, latest-wins;
  * `/root/reference/docs/DESIGN.md:27-33`,
  * `src/tests/scenarios/tombstone_sequencing.zig`).
  */
class MvccSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq(
    ("x", 1L, "v1", false),
    ("x", 2L, "v2", false),   // shadows seq 1
    ("y", 1L, "w1", false),
    ("z", 1L, "g1", false),
    ("z", 2L, null.asInstanceOf[String], true),  // tombstone shadows g1
  ).toDF("id", "sequence", "content", "is_deleted")

  private def currentMap(df: DataFrame): Map[String, (Long, String)] =
    Schemas.currentView(df).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("sequence"), r.getAs[String]("content"))).toMap

  test("latest sequence wins; tombstone shadows") {
    val cur = currentMap(base)
    assert(cur == Map("x" -> (2L, "v2"), "y" -> (1L, "w1")))
  }

  test("put assigns sequences above the existing max, in id order") {
    val puts = Seq(("b", "nb"), ("a", "na")).toDF("id", "content")
    val v2 = Mvcc.putBlocks(base, puts)
    val cur = currentMap(v2)
    assert(cur("a") == (3L, "na"))   // 'a' ranks before 'b'
    assert(cur("b") == (4L, "nb"))
    assert(cur("x") == (2L, "v2"))
  }

  test("delete then re-put resurrects with a higher sequence") {
    val v2 = Mvcc.deleteBlocks(base, Seq("x"))
    assert(!currentMap(v2).contains("x"))
    val v3 = Mvcc.putBlocks(v2, Seq(("x", "v3")).toDF("id", "content"))
    assert(currentMap(v3)("x") == (4L, "v3")) // delete took seq 3
  }

  test("as-of read: later versions invisible, tombstones at horizon shadow") {
    // base: x@1=v1, x@2=v2, y@1=w1, z@1=g1, z@2=tombstone
    val asOf1 = Schemas.currentViewAsOf(base, 1L).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("content")).toMap
    assert(asOf1 == Map("x" -> "v1", "y" -> "w1", "z" -> "g1")) // pre-delete world
    val asOf2 = Schemas.currentViewAsOf(base, 2L).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("content")).toMap
    assert(asOf2 == Map("x" -> "v2", "y" -> "w1")) // tombstone now shadows z
  }

  test("put_edge dedups identical (src,dst,type)") {
    val e1 = Seq(("a", "b", "calls")).toDF("src", "dst", "edge_type")
    val e2 = Seq(("a", "b", "calls"), ("a", "b", "imports"))
      .toDF("src", "dst", "edge_type")
    assert(Mvcc.putEdges(e1, e2).count() == 2)
  }

  test("sequence assignment is distributed yet identical to global id-rank") {
    // 1000-row batch across 4 shuffle partitions: sequences must equal
    // maxSeq + rank-by-id, and the plan's row_number window must be
    // partitioned (per-partition rank + offsets), not a global sort.
    val n = 1000
    val putRows = scala.util.Random.shuffle((1 to n).toList)
      .map(i => (f"id$i%05d", s"c$i"))
    // a DISTRIBUTED batch (repartitioned: not a LocalRelation) must take
    // the range-partitioned rank path — no global window anywhere
    val puts = putRows.toDF("id", "content").repartition(4)
    val v2 = Mvcc.putBlocks(base, puts)
    val plan = v2.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      "row_number must be partitioned by __pid, not a global window")
    def seqMap(df: org.apache.spark.sql.DataFrame) = Schemas.currentView(df)
      .filter(org.apache.spark.sql.functions.col("id").startsWith("id"))
      .select("id", "sequence").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val seqs = seqMap(v2)
    val maxBase = 2L // base table's max sequence
    (1 to n).foreach { i =>
      assert(seqs(f"id$i%05d") == maxBase + i,
        s"id$i should get sequence ${maxBase + i}")
    }
    // a DRIVER-BUILT metadata-sized batch (LocalRelation) skips the
    // distributed dance (no __pid machinery) yet assigns the identical
    // sequences
    val v2l = Mvcc.putBlocks(base, putRows.toDF("id", "content"))
    assert(!v2l.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(__pid"),
      "local batches must take the single-window shortcut")
    assert(seqMap(v2l) == seqs)
  }

  test("compact keeps only latest versions; tombstones survive unless full") {
    val base = Seq(
      ("A", 1L, "v1", false), ("A", 3L, "v2", false),   // A rewritten
      ("B", 2L, "v1", false), ("B", 5L, null, true),    // B deleted
      ("C", 4L, "v1", false)                            // C single version
    ).toDF("id", "sequence", "payload", "is_deleted")
    val compacted = Mvcc.compact(base)
    // one row per id, each the max-sequence version
    assert(compacted.count() == 3)
    val rows = compacted.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rows("A") == ((3L, false)))
    assert(rows("B") == ((5L, true)))  // tombstone RETAINED
    assert(rows("C") == ((4L, false)))
    // reading through the MVCC view is unchanged by compaction
    val before = Schemas.currentView(base).select("id", "sequence", "payload")
      .collect().map(_.toSeq).toSet
    val after = Schemas.currentView(compacted).select("id", "sequence", "payload")
      .collect().map(_.toSeq).toSet
    assert(after == before)
    // as-of at/above the horizon is also unchanged
    val asofB = Schemas.currentViewAsOf(base, 5L).select("id").collect().map(_.getString(0)).toSet
    val asofC = Schemas.currentViewAsOf(compacted, 5L).select("id").collect().map(_.getString(0)).toSet
    assert(asofB == asofC)
    // full compaction drops the tombstones too (whole-keyspace GC rule)
    val full = Mvcc.compact(base, full = true)
    assert(full.count() == 2)
    assert(full.filter($"is_deleted").count() == 0)
  }

  test("currentViewKeyedAsOf: composite-key edge versions, tombstones, horizon") {
    // versioned edges keyed (src, dst, edge_type):
    //  x->y: created @1, tombstoned @5
    //  y->z: created @6 (after the horizon)
    //  x->z: upserted @2 then @3 (latest wins, one row)
    val ve = Seq(
      ("x", "y", "t", 1L, false),
      ("x", "y", "t", 5L, true),
      ("y", "z", "t", 6L, false),
      ("x", "z", "u", 2L, false),
      ("x", "z", "u", 3L, false),
    ).toDF("src", "dst", "edge_type", "sequence", "is_deleted")
    val key = Seq("src", "dst", "edge_type")
    def rows(df: DataFrame) = df.select("src", "dst", "edge_type", "sequence")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    // as of 4: x->y alive (tombstone not yet written), y->z absent,
    // x->z at its latest-at-horizon version (seq 3)
    assert(rows(Schemas.currentViewKeyedAsOf(ve, 4L, key)) ==
      Set(("x", "y", "t", 1L), ("x", "z", "u", 3L)))
    // as of 5: the tombstone shadows x->y
    assert(rows(Schemas.currentViewKeyedAsOf(ve, 5L, key)) ==
      Set(("x", "z", "u", 3L)))
    // current (no horizon): y->z now exists, x->y stays deleted
    assert(rows(Schemas.currentViewKeyed(ve, key)) ==
      Set(("y", "z", "t", 6L), ("x", "z", "u", 3L)))
    // single-col currentView delegates to the keyed variant unchanged
    val single = Schemas.currentView(base).select("id").collect()
      .map(_.getString(0)).toSet
    assert(single == Set("x", "y"))
  }

  test("asOfDiffKeyed: added / removed / updated between two horizons") {
    val ve = Seq(
      ("a", "b", "t", 1L, false),   // unchanged across 3..8 -> dropped
      ("c", "d", "t", 2L, false),   // updated: rewritten @7
      ("c", "d", "t", 7L, false),
      ("e", "f", "t", 4L, false),   // added after lo=3
      ("g", "h", "t", 2L, false),   // removed: tombstoned @6
      ("g", "h", "t", 6L, true),
      ("i", "j", "t", 9L, false),   // beyond hi=8 -> invisible entirely
    ).toDF("src", "dst", "edge_type", "sequence", "is_deleted")
    val got = Schemas.asOfDiffKeyed(ve, 3L, 8L, Seq("src", "dst", "edge_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)), r.getString(5)))
      .toMap
    assert(got == Map(
      ("c", "d") -> ((2L, 7L), "updated"),
      ("e", "f") -> ((-1L, 4L), "added"),
      ("g", "h") -> ((2L, -1L), "removed")))
  }

  test("deterministic blockId is stable and distinct") {
    import org.apache.spark.sql.functions._
    val df = Seq(("ws", "f:a"), ("ws", "f:b"), ("ws2", "f:a"))
      .toDF("ws", "uid")
      .select(Schemas.blockId(col("ws"), col("uid")).as("id"))
    val ids = df.collect().map(_.getString(0))
    assert(ids.distinct.length == 3)
    assert(ids.forall(_.matches("[0-9a-f]{32}")))
  }
}

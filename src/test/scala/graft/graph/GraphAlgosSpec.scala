package graft.graph

import graft.SparkSpec

class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  //  a -> b -> c -> d,  a -> x -> d  (two paths),  loop: p <-> q
  private lazy val edges = Seq(
    ("a", "b", "calls"), ("b", "c", "calls"), ("c", "d", "calls"),
    ("a", "x", "calls"), ("x", "d", "calls"),
    ("p", "q", "calls"), ("q", "p", "calls"),
  ).toDF("src", "dst", "edge_type")

  test("bidirectional search meets in the middle at min distance") {
    val r = GraphAlgos.bidirectionalSearch(edges, "a", "d", maxDepth = 4)
      .collect().map(x => x.getAs[String]("id") ->
        (x.getAs[Int]("depth_fwd"), x.getAs[Int]("depth_bwd"),
          x.getAs[Int]("dist"))).toMap
    // every node on the realized shortest path a->x->d meets at dist 2
    assert(r.keySet == Set("a", "x", "d"))
    assert(r("x") == (1, 1, 2))
    assert(r("a") == (0, 2, 2))
    assert(r("d") == (2, 0, 2))
  }

  test("bidirectional search respects maxDepth=1: no dist-2 leak") {
    // a->b->c with maxDepth=1: fwd gets one hop, the backward "leg" is
    // just the target at depth 0 — clamping it to a 1-hop BFS would
    // report c reachable at dist 2 from a depth-1 search
    assert(GraphAlgos.bidirectionalSearch(edges, "a", "c", maxDepth = 1).isEmpty)
    val r = GraphAlgos.bidirectionalSearch(edges, "a", "b", maxDepth = 1)
      .select("id", "dist").as[(String, Int)].collect().toSeq
    assert(r === Seq(("b", 1)))
  }

  test("bidirectional search: no meeting is empty") {
    assert(GraphAlgos.bidirectionalSearch(edges, "d", "a", maxDepth = 4).isEmpty)
  }

  test("Pregel BFS visits the same (id, depth) set as the driver-loop BFS") {
    for (dir <- Seq(Direction.Outgoing, Direction.Incoming, Direction.Both)) {
      val loop = Traversal.bfs(edges, Seq("a").toDF("id"),
        TraversalSpec(dir, maxDepth = 4, maxResults = 10000))
        .select("id", "depth").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val pregel = GraphAlgos.bfsPregel(edges, Seq("a"), maxDepth = 4, dir)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(pregel == loop, s"direction $dir")
    }
  }

  test("Pregel BFS terminates on cycles and honors maxDepth") {
    val r = GraphAlgos.bfsPregel(edges, Seq("p"), maxDepth = 50)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r == Map("p" -> 0, "q" -> 1))
    val capped = GraphAlgos.bfsPregel(edges, Seq("a"), maxDepth = 1)
      .collect().map(_.getString(0)).toSet
    assert(capped == Set("a", "b", "x"))
  }

  test("SCC labels cycle members together, DAG nodes alone") {
    val r = GraphAlgos.stronglyConnected(edges).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("p") == "p" && r("q") == "p") // cycle {p,q} labelled min id
    assert(Set("a", "b", "c", "d", "x").forall(n => r(n) == n))
  }

  test("ssspWeighted: more hops but lighter total wins; unreachable absent") {
    import spark.implicits._
    // a->z direct costs 10; a->b->c->z costs 1+1+1 = 3
    val we = Seq(
      ("a", "z", 10L), ("a", "b", 1L), ("b", "c", 1L), ("c", "z", 1L),
      ("q", "r", 1L) // not reachable from a
    ).toDF("src", "dst", "w")
    val got = GraphAlgos.ssspWeighted(we, "a")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "z" -> 3L))
  }

  test("ssspWeighted: positive-weight cycle terminates with stable distances") {
    import spark.implicits._
    val we = Seq(
      ("a", "b", 2L), ("b", "c", 2L), ("c", "a", 2L), // 3-cycle
      ("b", "d", 1L)
    ).toDF("src", "dst", "w")
    val got = GraphAlgos.ssspWeighted(we, "a")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 2L, "c" -> 4L, "d" -> 3L))
  }

  test("ssspWithPaths: canonical min-id tie-break; long path reconstructs; unreachable absent") {
    import spark.implicits._
    // weighted diamond s->{a,b}->t, both routes cost 2: the canonical
    // pred of t is min(a,b) = a, so the path goes via a — plus a
    // heavier direct edge s->t (5) that must lose, and a longer-but-
    // lighter chain to x exercising multi-hop reconstruction.
    val we = Seq(
      ("s", "a", 1L), ("s", "b", 1L), ("a", "t", 1L), ("b", "t", 1L),
      ("s", "t", 5L),
      ("t", "x1", 1L), ("x1", "x2", 1L), ("x2", "x3", 1L),
      ("q", "r", 1L) // not reachable from s
    ).toDF("src", "dst", "w")
    val got = GraphAlgos.ssspWithPaths(we, "s")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2)).orNull, r.getString(3))))
      .toMap
    assert(got.keySet == Set("s", "a", "b", "t", "x1", "x2", "x3"))
    assert(got("s") == ((0L, null, "s")))
    assert(got("a") == ((1L, "s", "s->a")))
    assert(got("b") == ((1L, "s", "s->b")))
    assert(got("t") == ((2L, "a", "s->a->t"))) // min-id tie-break
    assert(got("x3") == ((5L, "x2", "s->a->t->x1->x2->x3")))
    // deterministic across partitionings
    val p1 = GraphAlgos.ssspWithPaths(we.repartition(1), "s")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val p7 = GraphAlgos.ssspWithPaths(we.repartition(7), "s")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(p1 == p7)
  }

  test("temporalReach: sequence monotonicity gates paths; tombstones don't flow") {
    // a -5-> b -3-> c : arriving at b at 5, the 3-edge is in the past
    // -> c unreachable. a -2-> d -7-> c : time-respecting -> c at 7.
    // b's later rewrite (seq 9) re-enables b -9-> e.
    val ve = Seq(
      ("a", "b", "calls", 5L, false),
      ("b", "c", "calls", 3L, false),
      ("a", "d", "calls", 2L, false),
      ("d", "c", "calls", 7L, false),
      ("b", "e", "calls", 9L, false),
      ("a", "x", "calls", 4L, true) // tombstone: no influence
    ).toDF("src", "dst", "edge_type", "sequence", "is_deleted")
    val got = GraphAlgos.temporalReach(ve, "a", startSeq = 0L, maxHops = 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 5L, "d" -> 2L, "c" -> 7L, "e" -> 9L))
    // startSeq above an edge's sequence prunes the whole branch
    val late = GraphAlgos.temporalReach(ve, "a", startSeq = 3L, maxHops = 4)
      .as[(String, Long)].collect().toMap
    assert(late == Map("a" -> 3L, "b" -> 5L, "e" -> 9L))
    // extra hops past the fixpoint change nothing (the oracle contract)
    val more = GraphAlgos.temporalReach(ve, "a", startSeq = 0L, maxHops = 8)
      .as[(String, Long)].collect().toMap
    assert(more == got)
  }
}

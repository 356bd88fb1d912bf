package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the recheck pass's weather-adjudication entry selection
  * (r13, ADVICE): the sentinel flagging ITSELF must be adjudicated by
  * the ALTERNATE scheduling-bound probe — with sentR drawn from its
  * own recheck, the 1.3x weather demotion always fired before the
  * 1.5x confirm, so the gate structurally could never confirm its own
  * sentinel. A full-suite gatecheck of this branch is margin-capped
  * (the sentinel's honest value ~1.5-2.3 s vs the gate's 1.0 s
  * baseline-arming floor leaves under 2x of doctorable headroom), so
  * the selection is pinned here instead.
  */
class BenchSpec extends AnyFunSuite {
  test("a non-sentinel flag is adjudicated by the recheck sentinel") {
    assert(Bench.adjudicatingSentinel("graph_lpa") == Bench.RecheckSentinel)
    assert(Bench.adjudicatingSentinel("graph_diameter") ==
      "bfs_both_depth2")
  }
  test("the sentinel's own flag is adjudicated by the alternate probe") {
    assert(Bench.adjudicatingSentinel(Bench.RecheckSentinel) ==
      Bench.RecheckSentinelAlt)
    assert(Bench.adjudicatingSentinel("bfs_both_depth2") == "bfs_in_depth2")
  }
  test("the alternate probe is a different entry than the sentinel") {
    assert(Bench.RecheckSentinel != Bench.RecheckSentinelAlt)
    assert(Queries.benchNames.contains(Bench.RecheckSentinel))
    assert(Queries.benchNames.contains(Bench.RecheckSentinelAlt))
  }
}

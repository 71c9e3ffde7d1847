package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stratified-rep spread policy (the round-11 advice fix):
  * 1-rep status must always be revocable, never self-latching, and
  * never granted on other-sf or degenerate evidence. */
class BenchPolicySpec extends AnyFunSuite {
  import Bench.SpreadPolicy._

  test("a stable same-sf >=2-rep spread earns 1 rep") {
    assert(repsFor(Some((1.00, 1.05)), sfMatches = true, None) === 1)
  }

  test("the [t,t]=0 self-latch is broken: zero delta re-runs 3 reps") {
    assert(repsFor(Some((0.73, 0.73)), sfMatches = true, None) === 3)
  }

  test("unstable, missing, or other-sf evidence keeps 3 reps") {
    assert(repsFor(Some((1.0, 1.2)), sfMatches = true, None) === 3)
    assert(repsFor(None, sfMatches = true, None) === 3)
    assert(repsFor(Some((1.00, 1.05)), sfMatches = false, None) === 3)
  }

  test("an explicit SPARK_GRAFT_BENCH_REPS override always wins") {
    assert(repsFor(Some((1.00, 1.05)), sfMatches = true, Some(5)) === 5)
    assert(repsFor(None, sfMatches = false, Some(1)) === 1)
  }

  test(">=2-rep runs persist their own pair") {
    assert(persistPair(Seq(1.0, 1.1, 1.2), Some((9.0, 9.9)),
      sfMatches = true) === Some((1.0, 1.2)))
  }

  test("1-rep runs carry the prior same-sf pair forward, never [t,t]") {
    assert(persistPair(Seq(0.5), Some((0.48, 0.52)), sfMatches = true)
      === Some((0.48, 0.52)))
    // no prior (forced-1-rep first run): omit rather than latch
    assert(persistPair(Seq(0.5), None, sfMatches = true) === None)
    // prior from another sf: omit — it would mislabel the new file's sf
    assert(persistPair(Seq(0.5), Some((0.48, 0.52)), sfMatches = false)
      === None)
  }

  test("partially-failed multi-rep runs never publish a negative pair") {
    // a failed rep records -1.0 and sorts first; the published pair
    // must fall back to the carried prior (round-11 advice), or omit
    assert(persistPair(Seq(-1.0, 2.3, 2.4), Some((2.1, 2.2)),
      sfMatches = true) === Some((2.1, 2.2)))
    assert(persistPair(Seq(-1.0, -1.0, 2.3), None, sfMatches = true)
      === None)
    assert(persistPair(Seq(-1.0, 2.3), Some((2.1, 2.2)),
      sfMatches = false) === None)
  }
}

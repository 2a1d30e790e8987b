package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention defense (Bench scaladoc §3): a
  * query whose kept wall still exceeds 5x its sf0.001 warmup anchor
  * and 2 s absolute is flagged suspect — the round-8 driver artifact
  * carried 22x phantom outliers from a contended host that were
  * indistinguishable from regressions without the flag.
  */
class BenchSuspectSpec extends AnyFunSuite {

  test("sustained-load wall (>5x anchor, >2s) is flagged") {
    assert(Bench.isSuspect(bestSec = 11.7, anchorSec = Some(0.9)))
    assert(Bench.isSuspect(bestSec = 2.01, anchorSec = Some(0.4)))
  }

  test("a legitimately scaled-up wall under 5x anchor is not flagged") {
    assert(!Bench.isSuspect(bestSec = 4.0, anchorSec = Some(0.9)))
    assert(!Bench.isSuspect(bestSec = 4.5, anchorSec = Some(0.9001)))
  }

  test("fast queries never flag, whatever the ratio") {
    // sub-2s absolute: a 10x ratio on a 0.15s query is scheduler
    // noise, not contention evidence
    assert(!Bench.isSuspect(bestSec = 1.5, anchorSec = Some(0.1)))
    assert(!Bench.isSuspect(bestSec = 1.99, anchorSec = Some(0.01)))
  }

  test("no anchor (missing warmup dir, crashed warmup) => never suspect") {
    assert(!Bench.isSuspect(bestSec = 300.0, anchorSec = None))
  }

  test("boundary: exactly 5x anchor or exactly 2s does not flag") {
    assert(!Bench.isSuspect(bestSec = 4.5, anchorSec = Some(0.9)))
    assert(!Bench.isSuspect(bestSec = 2.0, anchorSec = Some(0.1)))
  }
}

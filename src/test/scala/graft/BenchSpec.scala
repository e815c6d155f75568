package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-helper specs for the bench artifact: a contended or stalled
  * run must be self-diagnosing from the JSON alone (loadavg stamps)
  * and a partial streaming sweep must read as "failed to measure"
  * (-1), never as a measured zero.
  */
class BenchSpec extends AnyFunSuite {

  test("sweepValue: complete run reports rec/s") {
    assert(Bench.sweepValue(rows = 1000000L, sec = 2.0, nBatches = 4, required = 4)
      === 500000.0)
  }

  test("sweepValue: partial run (timeout mid-sweep) is the -1 sentinel, not 0") {
    assert(Bench.sweepValue(rows = 250000L, sec = 30.0, nBatches = 2, required = 4)
      === -1.0)
    // the BENCH_r07 failure shape: nothing finished before the deadline
    assert(Bench.sweepValue(rows = 0L, sec = 0.0, nBatches = 0, required = 4)
      === -1.0)
  }

  test("sweepValue: genuine zero (batches completed, zero duration) stays 0") {
    assert(Bench.sweepValue(rows = 0L, sec = 0.0, nBatches = 4, required = 4)
      === 0.0)
  }

  test("loadavg reads three non-negative figures from /proc") {
    val l = Bench.loadavg()
    assert(l.length === 3)
    assert(l.forall(_ >= 0.0), s"loadavg $l")
  }
}

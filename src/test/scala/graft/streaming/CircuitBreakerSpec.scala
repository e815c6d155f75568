package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** State-machine tests mirroring the reference's property suite
  * (`CircuitBreakerPropertyTest`): trip only on a full window, timed
  * HALF_OPEN probe, probe outcome routing, OPEN ignores outcomes.
  */
class CircuitBreakerSpec extends AnyFunSuite {

  private def breaker(now: () => Long) =
    new CircuitBreaker(windowSize = 4, failureRateThreshold = 0.5,
      openDurationMs = 100, clock = now)

  test("no trip until the window is full, even at 100% failure rate") {
    var t = 0L
    val cb = breaker(() => t)
    cb.record(true); cb.record(true); cb.record(true)
    assert(cb.currentState === cb.Closed)
    assert(cb.allowRequest())
  }

  test("trips when full window reaches the threshold") {
    var t = 0L
    val cb = breaker(() => t)
    Seq(true, false, true, false).foreach(cb.record)   // rate 0.5 >= 0.5
    assert(cb.currentState === cb.Open)
    assert(!cb.allowRequest())
    assert(cb.trips === 1)
  }

  test("below threshold on a full window stays closed") {
    var t = 0L
    val cb = breaker(() => t)
    Seq(true, false, false, false).foreach(cb.record)   // rate 0.25
    assert(cb.currentState === cb.Closed)
  }

  test("OPEN → HALF_OPEN after openDuration; probe success → CLOSED with reset window") {
    var t = 0L
    val cb = breaker(() => t)
    Seq(true, true, true, true).foreach(cb.record)
    assert(cb.currentState === cb.Open)
    t = 101
    assert(cb.allowRequest())              // the probe
    assert(cb.currentState === cb.HalfOpen)
    cb.record(false)                       // probe succeeds
    assert(cb.currentState === cb.Closed)
    // window was reset: 3 failures (not full) must not re-trip
    Seq(true, true, true).foreach(cb.record)
    assert(cb.currentState === cb.Closed)
  }

  test("HALF_OPEN probe failure → OPEN again") {
    var t = 0L
    val cb = breaker(() => t)
    Seq(true, true, true, true).foreach(cb.record)
    t = 101
    assert(cb.allowRequest())
    cb.record(true)
    assert(cb.currentState === cb.Open)
  }

  test("outcomes while OPEN are ignored") {
    var t = 0L
    val cb = breaker(() => t)
    Seq(true, true, true, true).foreach(cb.record)
    cb.record(false); cb.record(false)
    assert(cb.currentState === cb.Open)    // still open, not reset
  }

  test("gated body: skipped while OPEN, outcome recorded otherwise") {
    var t = 0L
    val cb = breaker(() => t)
    assert(cb.gated("ran") === Some("ran"))
    intercept[RuntimeException](cb.gated(throw new RuntimeException("x")))
    Seq(true, true).foreach(cb.record)     // with the 2 gated outcomes: full, rate 0.75
    assert(cb.currentState === cb.Open)
    assert(cb.gated("skipped") === None)
  }

  test("pause arbitration: pause on first holder, resume on last release") {
    val pa = new PauseArbiter
    assert(pa.pause(pa.Manual))            // first holder → transition to paused
    assert(!pa.pause(pa.Backpressure))     // already paused
    assert(!pa.resume(pa.Manual))          // backpressure still holds
    assert(pa.isPaused)
    assert(pa.resume(pa.Backpressure))     // last release → resumed
    assert(!pa.isPaused)
  }
}

package graft.streaming

/** Circuit breaker + pause arbitration (SURVEY §2.5; reference:
  * `ConsumerHealthController.java:292-451`, `CircuitBreakerController
  * .java:34-60`). Spark has no built-in breaker — this is the custom
  * gate SURVEY §4 lists: it wraps the foreachBatch body; while OPEN the
  * body is skipped (the query stays alive, batches pass through
  * unprocessed-and-uncommitted-to-sinks... to genuinely hold offsets,
  * pair with `StreamingQuery.stop()` via the listener hook).
  *
  * Semantics mirrored from the reference:
  *  - rolling COUNT-window failure rate; trips only when the window is
  *    full and rate ≥ threshold;
  *  - OPEN for `openDurationMs`, then one HALF_OPEN probe;
  *  - probe success → CLOSED with the window reset; failure → OPEN again;
  *  - outcomes arriving while OPEN are ignored.
  */
final class CircuitBreaker(
    windowSize: Int = 20,
    failureRateThreshold: Double = 0.5,
    openDurationMs: Long = 30000,
    clock: () => Long = System.currentTimeMillis _) {

  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State

  private val window = new Array[Boolean](windowSize)   // true = failure
  private var filled = 0
  private var idx = 0
  private var state: State = Closed
  private var openedAt = 0L
  private var tripCount = 0L
  private var openTimeTotalMs = 0L

  def currentState: State = synchronized {
    maybeHalfOpen(); state
  }

  /** True when processing may proceed (CLOSED, or the HALF_OPEN probe). */
  def allowRequest(): Boolean = synchronized {
    maybeHalfOpen()
    state != Open
  }

  /** Record a batch outcome. Ignored while OPEN
    * (`ConsumerHealthController.java:305-323`).
    */
  def record(failure: Boolean): Unit = synchronized {
    maybeHalfOpen()
    state match {
      case Open => ()
      case HalfOpen =>
        if (failure) { state = Open; openedAt = clock() }
        else { state = Closed; reset() }
      case Closed =>
        window(idx) = failure
        idx = (idx + 1) % windowSize
        if (filled < windowSize) filled += 1
        if (filled == windowSize) {
          val rate = window.count(identity).toDouble / windowSize
          if (rate >= failureRateThreshold) {
            state = Open
            openedAt = clock()
            tripCount += 1
          }
        }
    }
  }

  private def maybeHalfOpen(): Unit =
    if (state == Open && clock() - openedAt >= openDurationMs) {
      openTimeTotalMs += clock() - openedAt
      state = HalfOpen
    }

  private def reset(): Unit = { java.util.Arrays.fill(window, false); filled = 0; idx = 0 }

  def trips: Long = synchronized(tripCount)

  /** Gate a foreachBatch body: skipped while OPEN; outcome recorded. */
  def gated[T](body: => T): Option[T] = {
    if (!allowRequest()) return None
    try { val r = body; record(failure = false); Some(r) }
    catch { case e: Exception => record(failure = true); throw e }
  }
}

/** Pause-source arbitration (`ConsumerHealthController.java:46-56,
  * 174-203`): three independent holders on a bitmask; paused while any
  * holds, resumed when the last releases.
  */
final class PauseArbiter {
  val Manual = 1
  val Backpressure = 2
  val CircuitBreakerSource = 4

  private var mask = 0
  def pause(source: Int): Boolean = synchronized {
    val was = mask == 0; mask |= source; was
  }
  def resume(source: Int): Boolean = synchronized {
    mask &= ~source; mask == 0
  }
  def isPaused: Boolean = synchronized(mask != 0)
  def holders: Int = synchronized(mask)
}

package graft.server

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}

/** Failure circuit breaker for the serving tiers, mirroring the
  * reference's middleware (server/protocols/native/middleware/
  * circuit_breaker.go:13-69): Closed (normal) → Open after
  * `failureThreshold` consecutive engine failures (requests refused
  * with the reference's "service temporarily unavailable" error) →
  * HalfOpen after `recoveryTimeoutMs` (one trial request; success
  * closes the circuit, failure re-opens it).
  *
  * Guards the SHARED SparkSession: a storm of failing queries (bad
  * table, OOM-prone plan replayed by retrying clients) stops hitting
  * the engine instead of occupying scheduler slots every retry. */
final class CircuitBreaker(failureThreshold: Int = 5,
                           recoveryTimeoutMs: Long = 30000) {

  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State

  private val state = new AtomicReference[State](Closed)
  private val failures = new AtomicInteger(0)
  private val openedAt = new AtomicLong(0L)

  def currentState: State = state.get()

  /** Throws when the circuit is open; transitions Open → HalfOpen once
    * the recovery timeout has elapsed (the trial request proceeds). */
  def checkRequest(): Unit = state.get() match {
    case Open =>
      if (System.currentTimeMillis() - openedAt.get() >= recoveryTimeoutMs)
        state.compareAndSet(Open, HalfOpen) // this request is the trial
      else
        throw new IllegalStateException(
          "circuit breaker is open - service temporarily unavailable")
    case _ => ()
  }

  def recordSuccess(): Unit = {
    failures.set(0)
    state.set(Closed) // a HalfOpen trial success closes the circuit
  }

  def recordFailure(): Unit = state.get() match {
    case HalfOpen =>
      openedAt.set(System.currentTimeMillis())
      state.set(Open) // failed trial re-opens
    case _ =>
      if (failures.incrementAndGet() >= failureThreshold) {
        openedAt.set(System.currentTimeMillis())
        state.set(Open)
      }
  }

  /** Run `body` under the breaker: refused when open, counted toward
    * the failure threshold when it throws and `counts(e)` holds.
    * Client-side I/O failures (a peer disconnecting mid-stream) must
    * NOT open the circuit for everyone — only engine failures count. */
  def protect[A](body: => A,
                 counts: Throwable => Boolean =
                   !_.isInstanceOf[java.io.IOException]): A = {
    checkRequest()
    try {
      val r = body
      recordSuccess()
      r
    } catch {
      case e: Throwable =>
        if (counts(e)) recordFailure()
        throw e
    }
  }
}

package graft.sources

/** Circuit breaker for the driver-side ingestion path (SURVEY §2.11;
  * reference retry/circuit_breaker.py:17-289): stops hammering a failing
  * upstream API instead of retrying into a cascade.
  *
  * State machine (mirrors the reference):
  *  - CLOSED → OPEN after `failureThreshold` consecutive failures;
  *  - OPEN rejects calls immediately until `recoveryTimeoutMs` elapses,
  *    then transitions to HALF_OPEN;
  *  - HALF_OPEN admits at most `halfOpenMaxCalls` in-flight probe calls;
  *    `successThreshold` successes close the circuit, any failure
  *    re-opens it.
  *
  * Engine-scope note: this guards the ONE driver-side fetch loop (S1) —
  * everything after ingestion is covered by Spark's own task retry, so no
  * breaker belongs inside executors. The clock is injectable for
  * deterministic tests.
  */
final class CircuitBreaker(
    val name: String,
    failureThreshold: Int = 5,
    successThreshold: Int = 3,
    recoveryTimeoutMs: Long = 60000,
    halfOpenMaxCalls: Int = 3,
    clock: () => Long = () => System.currentTimeMillis()) {

  require(failureThreshold >= 1, s"failureThreshold must be >= 1, got $failureThreshold")
  require(successThreshold >= 1, s"successThreshold must be >= 1, got $successThreshold")
  require(recoveryTimeoutMs > 0, s"recoveryTimeoutMs must be > 0, got $recoveryTimeoutMs")
  require(halfOpenMaxCalls >= 1, s"halfOpenMaxCalls must be >= 1, got $halfOpenMaxCalls")

  import CircuitBreaker._

  private[this] var state: State = Closed
  private[this] var failures = 0
  private[this] var successes = 0
  private[this] var lastFailureAt = 0L
  private[this] var halfOpenInFlight = 0

  /** OPEN → HALF_OPEN once the recovery timeout has elapsed. */
  private def maybeRecover(): Unit =
    if (state == Open && clock() - lastFailureAt >= recoveryTimeoutMs) {
      state = HalfOpen
      successes = 0
      halfOpenInFlight = 0
    }

  def currentState: String = synchronized { maybeRecover(); state.toString }

  /** Run `f` under the breaker. Throws CircuitOpenException without
    * invoking `f` when the circuit is OPEN (or HALF_OPEN at probe
    * capacity); failures of `f` itself propagate after being counted.
    */
  def call[T](f: => T): T = {
    synchronized {
      maybeRecover()
      state match {
        case Open =>
          throw new CircuitOpenException(
            s"circuit '$name' is open (retry after ${recoveryTimeoutMs} ms)")
        case HalfOpen =>
          if (halfOpenInFlight >= halfOpenMaxCalls)
            throw new CircuitOpenException(
              s"circuit '$name' is half-open at probe capacity ($halfOpenMaxCalls)")
          halfOpenInFlight += 1
        case Closed => ()
      }
    }
    val result =
      try f
      catch {
        case e: Throwable =>
          onFailure()
          throw e
      }
    onSuccess()
    result
  }

  private def onSuccess(): Unit = synchronized {
    state match {
      case HalfOpen =>
        halfOpenInFlight = math.max(0, halfOpenInFlight - 1)
        successes += 1
        if (successes >= successThreshold) { state = Closed; failures = 0 }
      case Closed => failures = 0
      case Open => ()
    }
  }

  private def onFailure(): Unit = synchronized {
    lastFailureAt = clock()
    state match {
      case HalfOpen => state = Open
      case Closed =>
        failures += 1
        if (failures >= failureThreshold) state = Open
      case Open => ()
    }
  }
}

object CircuitBreaker {
  sealed trait State
  case object Closed extends State { override def toString = "closed" }
  case object Open extends State { override def toString = "open" }
  case object HalfOpen extends State { override def toString = "half_open" }

  final class CircuitOpenException(msg: String) extends RuntimeException(msg)
}

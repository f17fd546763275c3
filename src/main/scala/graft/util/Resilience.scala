package graft.util

/**
 * Resilience primitives for partition-local external calls (the E8/L1 HTTP
 * stages), re-expressing `/root/reference/src/common/resilience.ts:99-554`:
 * retry with exponential backoff + jitter, circuit breaker
 * (closed → open at `failureThreshold` → half-open after `resetTimeoutMs`),
 * token-bucket rate limiter (requests/minute, 10-second burst), and
 * concurrency via `java.util.concurrent.Semaphore`.
 *
 * Spark placement: Spark's own task retry covers COMPUTE failures; these
 * primitives live INSIDE a task, wrapping per-partition provider calls —
 * one instance per executor/partition (share via a lazy val in the provider
 * object when cross-task state is wanted within an executor).
 *
 * Everything takes an injectable [[Clock]], so the time-driven contracts
 * (half-open transition, token refill, backoff schedule) are deterministic
 * under test — the reference's `Date.now()`/`setTimeout` made its own tests
 * timing-flaky; ours are exact.
 */
trait Clock {
  def nowMs(): Long
  def sleep(ms: Long): Unit
}

object SystemClock extends Clock {
  def nowMs(): Long = System.currentTimeMillis()
  def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
}

/** Error carrier with an HTTP status (resilience.ts checks `statusCode`). */
final class HttpStatusException(val statusCode: Int, message: String)
    extends RuntimeException(message)

/** Thrown by CircuitBreaker.execute when the circuit is open. */
final class CircuitOpenError(message: String) extends RuntimeException(message)

object Resilience {

  final case class RetryConfig(
      maxAttempts: Int = 3,
      backoffMs: Long = 1000,
      backoffMultiplier: Double = 2.0,
      retryableStatuses: Set[Int] = Set(408, 429, 500, 502, 503, 504),
      /** jitter factor in [0.9, 1.1) — injectable for determinism; the
        * reference draws `0.9 + random * 0.2` (resilience.ts:201) */
      jitter: () => Double = () => 0.9 + scala.util.Random.nextDouble() * 0.2)

  /** resilience.ts:119-160 — transient-failure classification. */
  def isRetryableError(e: Throwable, retryableStatuses: Set[Int] = RetryConfig().retryableStatuses): Boolean =
    e match {
      case h: HttpStatusException => retryableStatuses.contains(h.statusCode)
      case _: java.net.SocketTimeoutException => true
      case _: java.net.ConnectException => true
      case _: java.net.UnknownHostException => true
      case _: java.util.concurrent.TimeoutException => true
      case other =>
        val m = Option(other.getMessage).getOrElse("").toLowerCase(java.util.Locale.ROOT)
        m.contains("timeout") || m.contains("rate limit") ||
        m.contains("too many requests") || m.contains("temporarily unavailable")
    }

  /** resilience.ts:173-218 — retry with exponential backoff. Returns
    * (result, attempts); rethrows the last error when attempts exhaust or
    * the error is non-retryable. */
  def withRetry[T](
      cfg: RetryConfig = RetryConfig(),
      clock: Clock = SystemClock,
      onRetry: (Int, Throwable, Long) => Unit = (_, _, _) => ())(fn: => T): (T, Int) = {
    var attempt = 1
    while (true) {
      try return (fn, attempt)
      catch {
        case e: Throwable =>
          if (attempt == cfg.maxAttempts || !isRetryableError(e, cfg.retryableStatuses)) throw e
          val delay = cfg.backoffMs * math.pow(cfg.backoffMultiplier, attempt - 1)
          val jittered = (delay * cfg.jitter()).toLong
          onRetry(attempt, e, jittered)
          clock.sleep(jittered)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** resilience.ts:293-396 — closed → open at `failureThreshold` consecutive
  * failures → half-open once `resetTimeoutMs` elapses; any success closes. */
final class CircuitBreaker(
    failureThreshold: Int = 5,
    resetTimeoutMs: Long = 30000,
    clock: Clock = SystemClock) {

  private var failures = 0
  private var state: String = "closed"
  private var nextAttemptTime: Long = 0L

  private def updateState(): Unit = synchronized {
    if (state == "open" && clock.nowMs() >= nextAttemptTime) state = "half-open"
  }

  def isOpen: Boolean = { updateState(); synchronized(state == "open") }
  def getState: String = { updateState(); synchronized(state) }

  def recordSuccess(): Unit = synchronized {
    failures = 0
    state = "closed"
    nextAttemptTime = 0L
  }

  def recordFailure(): Unit = synchronized {
    failures += 1
    if (failures >= failureThreshold) {
      state = "open"
      nextAttemptTime = clock.nowMs() + resetTimeoutMs
    }
  }

  def execute[T](fn: => T): T = {
    // read state + nextAttemptTime under ONE lock (ADVICE r2: the previous
    // unsynchronized reads were racy when an instance is shared across
    // executor threads, which the scaladoc explicitly invites)
    val openUntil = synchronized {
      updateState()
      if (state == "open") Some(nextAttemptTime) else None
    }
    openUntil.foreach(t => throw new CircuitOpenError(s"Circuit breaker is open. Next attempt at $t"))
    try {
      val r = fn
      recordSuccess()
      r
    } catch {
      case e: Throwable =>
        recordFailure()
        throw e
    }
  }

  def reset(): Unit = synchronized {
    failures = 0
    state = "closed"
    nextAttemptTime = 0L
  }
}

/** resilience.ts:398-485 — token bucket: `requestsPerMinute` sustained rate
  * with a 10-second burst capacity. */
final class RateLimiter(requestsPerMinute: Double = 60, clock: Clock = SystemClock) {
  private val refillRate: Double = requestsPerMinute / 60.0 // tokens per second
  private val maxTokens: Double = math.max(1, math.ceil(refillRate * 10)) // 10 s burst
  private var tokens: Double = maxTokens
  private var lastRefill: Long = clock.nowMs()

  private def refill(): Unit = synchronized {
    val now = clock.nowMs()
    val elapsed = (now - lastRefill) / 1000.0
    tokens = math.min(maxTokens, tokens + elapsed * refillRate)
    lastRefill = now
  }

  def canProceed: Boolean = { refill(); synchronized(tokens >= 1) }

  def tryAcquire(n: Double = 1): Boolean = {
    refill()
    synchronized {
      if (tokens >= n) { tokens -= n; true } else false
    }
  }

  /** Block (via clock.sleep) until `n` tokens are available, then take them.
    * Refill, the token check, and the wait-time computation happen under ONE
    * lock per round (ADVICE r2: split sections let concurrent callers compute
    * stale waits and thrash in the retry loop); only the sleep itself runs
    * unlocked. */
  def acquire(n: Double = 1): Unit = {
    while (true) {
      val waitMs = synchronized {
        refill() // reentrant
        if (tokens >= n) { tokens -= n; return }
        math.ceil((n - tokens) / refillRate * 1000).toLong
      }
      clock.sleep(math.max(1L, waitMs))
    }
  }

  def getWaitTimeMs: Long = {
    refill()
    synchronized {
      if (tokens >= 1) 0L else math.ceil(1000 / refillRate).toLong
    }
  }
}

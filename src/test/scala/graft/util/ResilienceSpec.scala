package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic contracts for the resilience primitives
  * (resilience.ts:99-554) under an exact fake clock. */
class ResilienceSpec extends AnyFunSuite {

  test("SSRF block canonicalizes numeric IPv4 host spellings (round 4)") {
    import graft.util.HttpBase
    // WHATWG new URL normalizes these to 127.0.0.1; java.net.URI passes
    // them through raw, which used to bypass every private-range regex
    assert(HttpBase.isPrivateHost("2130706433"))    // decimal loopback
    assert(HttpBase.isPrivateHost("0x7f000001"))    // hex loopback
    assert(HttpBase.isPrivateHost("0177.0.0.1"))    // octal first octet
    assert(HttpBase.isPrivateHost("127.1"))         // short dotted form
    assert(HttpBase.isPrivateHost("0xA9.0xFE.0xA9.0xFE")) // 169.254.x link-local
    assert(!HttpBase.isPrivateHost("134744072"))    // 8.8.8.8 — public
    assert(!HttpBase.isPrivateHost("api.example.com"))
    intercept[graft.sources.ScrapeError](
      HttpBase.validateUrl("https://2130706433/v1"))
  }

  /** Manually-advanced clock; sleep() advances time instead of blocking. */
  private final class FakeClock(var now: Long = 0L) extends Clock {
    var slept: Vector[Long] = Vector.empty
    def nowMs(): Long = now
    def sleep(ms: Long): Unit = { slept :+= ms; now += ms }
  }

  private def noJitterCfg(maxAttempts: Int = 3) =
    Resilience.RetryConfig(maxAttempts = maxAttempts, jitter = () => 1.0)

  test("withRetry: succeeds first try, attempts = 1") {
    val (r, attempts) = Resilience.withRetry(noJitterCfg(), new FakeClock)(42)
    assert(r == 42 && attempts == 1)
  }

  test("withRetry: exponential backoff schedule 1000, 2000 (resilience.ts:197-200)") {
    val clock = new FakeClock
    var calls = 0
    val (r, attempts) = Resilience.withRetry(noJitterCfg(), clock) {
      calls += 1
      if (calls < 3) throw new HttpStatusException(503, "unavailable")
      "ok"
    }
    assert(r == "ok" && attempts == 3)
    assert(clock.slept == Vector(1000L, 2000L))
  }

  test("withRetry: jitter multiplies the delay (resilience.ts:201)") {
    val clock = new FakeClock
    var calls = 0
    intercept[HttpStatusException] {
      Resilience.withRetry(
        Resilience.RetryConfig(maxAttempts = 3, jitter = () => 0.9), clock) {
        calls += 1
        throw new HttpStatusException(429, "rate limited")
      }
    }
    assert(clock.slept == Vector(900L, 1800L))
    assert(calls == 3)
  }

  test("withRetry: non-retryable error is thrown immediately") {
    val clock = new FakeClock
    var calls = 0
    intercept[HttpStatusException] {
      Resilience.withRetry(noJitterCfg(), clock) {
        calls += 1
        throw new HttpStatusException(400, "bad request")
      }
    }
    assert(calls == 1 && clock.slept.isEmpty)
  }

  test("isRetryableError: statuses, network errors, message patterns (resilience.ts:119-160)") {
    assert(Resilience.isRetryableError(new HttpStatusException(429, "x")))
    assert(Resilience.isRetryableError(new HttpStatusException(503, "x")))
    assert(!Resilience.isRetryableError(new HttpStatusException(404, "x")))
    assert(Resilience.isRetryableError(new java.net.SocketTimeoutException("t")))
    assert(Resilience.isRetryableError(new RuntimeException("Request timeout while calling api")))
    assert(Resilience.isRetryableError(new RuntimeException("Rate limit exceeded")))
    assert(Resilience.isRetryableError(new RuntimeException("service temporarily unavailable")))
    assert(!Resilience.isRetryableError(new RuntimeException("invalid input")))
  }

  test("circuit breaker: opens at 5 failures, half-open after 30s, success closes (resilience.ts:293-396)") {
    val clock = new FakeClock
    val cb = new CircuitBreaker(clock = clock)
    assert(cb.getState == "closed")
    (1 to 4).foreach(_ => cb.recordFailure())
    assert(cb.getState == "closed")
    cb.recordFailure() // 5th
    assert(cb.getState == "open" && cb.isOpen)
    intercept[CircuitOpenError](cb.execute("never runs"))
    clock.now += 29999
    assert(cb.isOpen)
    clock.now += 1 // 30s elapsed
    assert(cb.getState == "half-open" && !cb.isOpen)
    // a success in half-open closes the circuit
    assert(cb.execute("probe") == "probe")
    assert(cb.getState == "closed")
  }

  test("circuit breaker: failure in half-open reopens at threshold") {
    val clock = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 2, resetTimeoutMs = 10, clock = clock)
    cb.recordFailure(); cb.recordFailure()
    assert(cb.isOpen)
    clock.now += 10
    assert(cb.getState == "half-open")
    intercept[RuntimeException](cb.execute(throw new RuntimeException("still down")))
    assert(cb.isOpen, "failure count past threshold keeps it open")
  }

  test("rate limiter: burst capacity then refill at requestsPerMinute (resilience.ts:398-485)") {
    val clock = new FakeClock
    val rl = new RateLimiter(requestsPerMinute = 60, clock = clock) // 1/s, burst 10
    (1 to 10).foreach(i => assert(rl.tryAcquire(), s"burst token $i"))
    assert(!rl.tryAcquire(), "burst exhausted")
    assert(rl.getWaitTimeMs == 1000)
    clock.now += 1000 // one token refills
    assert(rl.canProceed)
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire())
  }

  test("rate limiter: acquire blocks via the clock until tokens exist") {
    val clock = new FakeClock
    val rl = new RateLimiter(requestsPerMinute = 60, clock = clock)
    (1 to 10).foreach(_ => rl.tryAcquire())
    rl.acquire() // must sleep ~1s on the fake clock, then succeed
    assert(clock.slept.nonEmpty)
    assert(clock.slept.sum >= 1000)
  }

  test("retry + breaker compose (pipeline.ts:171-191 shape)") {
    val clock = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 2, resetTimeoutMs = 30000, clock = clock)
    var calls = 0
    intercept[HttpStatusException] {
      Resilience.withRetry(noJitterCfg(2), clock) {
        calls += 1
        cb.execute(throw new HttpStatusException(503, "down"))
      }
    }
    assert(calls == 2)
    assert(cb.isOpen, "two failures through the breaker open it")
  }
}

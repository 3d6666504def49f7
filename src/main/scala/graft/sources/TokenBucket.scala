package graft.sources

/** Token-bucket rate limiter (ref: ingestion/infrastructure/rate_limit.py:
  * 17-103): bursts up to `capacity`, sustained `refillPerSec`, plus a
  * Retry-After override that freezes acquisition until the provider's
  * requested resume time.
  *
  * Clock and sleeper are injectable so tests run instantly and
  * deterministically; production uses the defaults.
  */
final class TokenBucket(
    capacity: Int,
    refillPerSec: Double,
    nanoTime: () => Long = () => System.nanoTime(),
    sleepMs: Long => Unit = Thread.sleep(_)) {
  require(capacity > 0, "capacity must be positive")
  require(refillPerSec > 0, "refill rate must be positive")

  private[this] var tokens: Double = capacity.toDouble
  private[this] var lastRefillNs: Long = nanoTime()
  private[this] var retryAfterUntilNs: Long = Long.MinValue
  private[this] var waitsCount: Long = 0L

  /** Number of times acquire had to wait (metrics twin of the reference's
    * rate-limiter wait counter).
    */
  def waits: Long = synchronized(waitsCount)

  /** Freeze the bucket until `seconds` from now (HTTP 429 Retry-After). */
  def notifyRetryAfter(seconds: Long): Unit = synchronized {
    retryAfterUntilNs = nanoTime() + seconds * 1000000000L
  }

  private def refill(): Unit = {
    val now = nanoTime()
    val elapsed = (now - lastRefillNs).max(0L) / 1e9
    tokens = (tokens + elapsed * refillPerSec).min(capacity.toDouble)
    lastRefillNs = now
  }

  /** Block until `n` tokens are available; returns total ms waited.
    * Sleeps happen OUTSIDE the monitor: another thread's
    * [[notifyRetryAfter]] (or acquire) must never block behind a waiter's
    * sleep — state is examined under the lock, waited out unlocked, then
    * re-examined.
    */
  def acquire(n: Int = 1): Long = {
    require(n <= capacity, s"cannot acquire $n tokens, capacity is $capacity")
    var waitedMs = 0L
    while (true) {
      val sleepForMs: Long = synchronized {
        val now = nanoTime()
        if (now < retryAfterUntilNs) {
          waitsCount += 1
          (retryAfterUntilNs - now) / 1000000L + 1
        } else {
          refill()
          if (tokens >= n) { tokens -= n; return waitedMs }
          waitsCount += 1
          math.ceil((n - tokens) / refillPerSec * 1000.0).toLong.max(1L)
        }
      }
      sleepMs(sleepForMs); waitedMs += sleepForMs
    }
    waitedMs
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryCache

/** Cache semantics from the reference (`core/views.py:26-42`,
  * `datafabric/settings.py:93-103`): md5 keying, 300 s TTL, capacity cull.
  * Clock is injected so TTL is tested deterministically (SURVEY.md §5).
  */
class QueryCacheSpec extends AnyFunSuite {

  private class FakeClock(var now: Long = 0L) extends (() => Long) {
    def apply(): Long = now
  }

  test("md5 key matches the reference's ai_query_ prefix + hex digest") {
    val c = new QueryCache[String]()
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592
    assert(c.md5Key("hello") === "ai_query_5d41402abc4b2a76b9719d911017c592")
  }

  test("hit before TTL, miss after") {
    val clock = new FakeClock
    val c = new QueryCache[String](ttlMillis = 300000, clock = clock)
    c.put("q", "result")
    clock.now = 299999
    assert(c.get("q") === Some("result"))
    clock.now = 300001
    assert(c.get("q") === None)
  }

  test("expired entries are physically removed on read") {
    val clock = new FakeClock
    val c = new QueryCache[String](ttlMillis = 10, clock = clock)
    c.put("q", "r")
    clock.now = 11
    c.get("q")
    assert(c.size === 0)
  }

  test("capacity cull drops 1/cullFrequency oldest entries") {
    val clock = new FakeClock
    val c = new QueryCache[String](
      ttlMillis = 1000000, maxEntries = 9, cullFrequency = 3, clock = clock)
    for (i <- 1 to 9) { clock.now = i; c.put(s"q$i", s"r$i") }
    clock.now = 100
    c.put("q10", "r10") // triggers cull of 3 oldest
    assert(c.size === 7) // 9 - 3 + 1
    assert(c.get("q1").isEmpty && c.get("q2").isEmpty && c.get("q3").isEmpty)
    assert(c.get("q9") === Some("r9") && c.get("q10") === Some("r10"))
  }

  test("distinct queries do not collide") {
    val c = new QueryCache[String]()
    c.put("a", "1"); c.put("b", "2")
    assert(c.get("a") === Some("1") && c.get("b") === Some("2"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Serializer

/** Serializer rules (`core/ai_query_generator.py:325-341`, SURVEY.md §1.4):
  * dates → ISO strings, salary-named numerics → rounded doubles, null →
  * null, everything else → string. Plus totality on generated values
  * (SURVEY.md §5 item 3; seeded generator — scalacheck's scalatest bridge
  * is not in the offline cache).
  */
class SerializerSpec extends AnyFunSuite {

  test("date → ISO-8601 (isoformat parity)") {
    assert(Serializer.normalize("d", java.sql.Date.valueOf("2024-03-09")) === "2024-03-09")
  }

  test("timestamp → ISO-8601 with T separator") {
    val t = java.sql.Timestamp.valueOf("2024-03-09 12:34:56")
    assert(Serializer.normalize("ts", t) === "2024-03-09T12:34:56")
  }

  test("salary columns rounded to 2 decimals, kept numeric") {
    assert(Serializer.normalize("salary", java.lang.Double.valueOf(12345.6789)) === 12345.68)
    assert(Serializer.normalize("avg_salary", new java.math.BigDecimal("99.999")) === 100.0)
  }

  test("null stays null") {
    assert(Serializer.normalize("anything", null) === null)
  }

  test("non-special values stringified (reference :339-340)") {
    assert(Serializer.normalize("count", java.lang.Long.valueOf(42L)) === "42")
    assert(Serializer.normalize("name", "Alice") === "Alice")
    assert(Serializer.normalize("flag", java.lang.Boolean.TRUE) === "true")
  }

  test("normalize is total on arbitrary strings/numbers (seeded sweep)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = rng.alphanumeric.take(rng.nextInt(20)).mkString
      val n = java.lang.Long.valueOf(rng.nextLong())
      assert(Serializer.normalize(s, n) != null)
      assert(Serializer.normalize("salary", n).isInstanceOf[Double])
      assert(Serializer.normalize(s, s + "\n\"\\") != null)
    }
  }

  test("json writer escapes quotes, backslashes and control characters") {
    val js = Serializer.toJsonValue(Map("k\"ey" -> "a\nb\tc\u0001\\"))
    assert(js === "{\"k\\\"ey\":\"a\\nb\\tc\\u0001\\\\\"}")
  }

  test("json writer handles nested seq/map/null/numbers") {
    val js = Serializer.toJsonValue(Seq(Map("a" -> null), 1.5, "x"))
    assert(js === "[{\"a\":null},1.5,\"x\"]")
  }
}

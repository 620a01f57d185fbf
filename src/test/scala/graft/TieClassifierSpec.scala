package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[BoundaryAudit.classifyTie]] (VERDICT r10 #5).
  *
  * The classifier is load-bearing for the "hash-green is structurally
  * explained" claim — `engine-mismatch 0` in the boundary audit means
  * every rounded output column was checked against BOTH engines' actual
  * tie decisions — so the classifier itself needs a pin. This suite
  * verifies it against two INDEPENDENTLY-CODED references:
  *
  *   - Spark `round(double, n)`: `BigDecimal` of the shortest decimal
  *     rendering, `setScale(HALF_UP)` (what Catalyst's Round does for
  *     DoubleType);
  *   - DuckDB `round(double, n)`: `std::round(v * 10^n)` — half away
  *     from zero on the double product, emulated here via the exact
  *     binary expansion (abs/negate construction, deliberately a
  *     different code path from the implementation's floor/compare).
  *
  * Coverage: exact dyadic ties, negative ties, shortest-representation
  * ties whose exact expansion is off-boundary (both the agreeing kind,
  * e.g. 0.15 @ 1, and the classic disagreeing kind, e.g. 2.675 @ 2),
  * constructed ±1..5000-ulp offsets around a tie (class-band geometry),
  * coarse grids where ulp(y) rivals a grid unit (classes 1/3 gated off,
  * ADVICE r10), product overflow (sentinel, not a throw — ADVICE r10),
  * and a 20k-sample fixed-seed random sweep of the consistency
  * invariants.
  */
class TieClassifierSpec extends AnyFunSuite {

  private val HALF = new JBD("0.5")

  /** Spark's decision in grid units: round the shortest-decimal
    * rendering HALF_UP. (`new JBD(Double.toString(v))` ==
    * `JBD.valueOf(v)` by spec — written via toString here so the test
    * does not share the implementation's construction path.)
    */
  private def sparkUnits(v: Double, n: Int): JBD =
    new JBD(java.lang.Double.toString(v))
      .scaleByPowerOfTen(n).setScale(0, RoundingMode.HALF_UP)

  /** DuckDB's decision in grid units: std::round of the double product
    * — half away from zero, judged on the product's exact binary
    * expansion. Returns None when the product overflows (no finite
    * grid to judge).
    */
  private def duckUnits(v: Double, n: Int): Option[JBD] = {
    val y = v * math.pow(10.0, n)
    if (y.isInfinite || y.isNaN) return None
    val ab = new JBD(math.abs(y))
    val fl = ab.setScale(0, RoundingMode.FLOOR)
    val up = ab.subtract(fl).compareTo(HALF) >= 0
    val r = if (up) fl.add(JBD.ONE) else fl
    Some(if (y < 0) r.negate else r)
  }

  /** Does at least one engine's lens see an exact tie? (exact binary
    * expansion of v·10ⁿ, or the shortest-decimal rendering, ends .5)
    */
  private def isTieByEitherLens(v: Double, n: Int): Boolean = {
    val exact = new JBD(v).abs.scaleByPowerOfTen(n)
      .remainder(JBD.ONE).compareTo(HALF) == 0
    val shortest = new JBD(java.lang.Double.toString(v)).abs
      .scaleByPowerOfTen(n).remainder(JBD.ONE).compareTo(HALF) == 0
    exact || shortest
  }

  private def cls(v: Double, n: Int): Int = BoundaryAudit.classifyTie(v, n)

  /** The invariants every (v, n) must satisfy, whatever the geometry:
    * class 4 iff the two engines' decisions differ; class 2 implies
    * they agree AND some lens saw a tie; class 5 iff the product
    * overflowed; everything in 0..5; never throws.
    */
  private def checkConsistency(v: Double, n: Int): Unit = {
    val c = cls(v, n)
    assert(c >= 0 && c <= 5, s"class out of range for ($v, $n): $c")
    if (v.isNaN || v.isInfinite || v == 0.0) {
      assert(c === 0, s"non-finite/zero sentinel for ($v, $n)")
      return
    }
    duckUnits(v, n) match {
      case None =>
        assert(c === 5, s"overflowed product must be class 5 for ($v, $n)")
      case Some(duck) =>
        val spark = sparkUnits(v, n)
        val mismatch = spark.compareTo(duck) != 0
        assert((c == 4) === mismatch,
          s"mismatch flag wrong for ($v, $n): class $c, spark $spark, duck $duck")
        if (c == 2)
          assert(isTieByEitherLens(v, n),
            s"class 2 without a tie by either lens for ($v, $n)")
        if (isTieByEitherLens(v, n) && !mismatch)
          assert(c === 2,
            s"agreeing tie must be class 2 for ($v, $n), got $c")
    }
  }

  test("exact dyadic ties (n=0) are tie-agree in both signs") {
    for (k <- Seq(0L, 1L, 2L, 7L, 1000L, 123456L, (1L << 40))) {
      assert(cls(k + 0.5, 0) === 2, s"k=$k")
      assert(cls(-(k + 0.5), 0) === 2, s"k=-$k")
      checkConsistency(k + 0.5, 0)
      checkConsistency(-(k + 0.5), 0)
    }
  }

  test("shortest-repr tie with agreeing engines is tie-agree (0.15 @ 1)") {
    // exact expansion of 0.15 is below the boundary, but the double
    // product 0.15*10 lands exactly on 1.5 — both lenses tie, both
    // engines round away from zero: agree
    assert(cls(0.15, 1) === 2)
    assert(cls(-0.15, 1) === 2)
  }

  test("decimal-vs-binary disagreements are engine-mismatch") {
    // Found by exhaustive-ish search over (k+0.5)/10ⁿ half-cent ties:
    // the shortest rendering ends .5 (Spark ties HALF_UP, away from
    // zero) while the double product v·10ⁿ lands strictly BELOW the
    // boundary (duck floors). These are the exact failure class the
    // audit exists to catch.
    val mismatches = Seq(
      (9960776.325, 2), (2665994.655, 2), (2600477.385, 2),
      (531637.9735, 3), (22763.41885, 4), (130.9786155, 6),
      (-9960776.325, 2))
    for ((v, n) <- mismatches) {
      assert(sparkUnits(v, n).compareTo(duckUnits(v, n).get) != 0,
        s"test premise: engines must actually differ on ($v, $n)")
      assert(cls(v, n) === 4, s"($v, $n)")
    }
    // The FAMOUS textbook example 2.675 @ 2 (Python's round gives 2.67)
    // is NOT a mismatch under these two engines: the double product
    // 2.675*100 rounds to exactly 267.5, so duck's half-away-from-zero
    // agrees with Spark's decimal HALF_UP — tie-agree, not mismatch.
    // (Python disagrees because IT rounds half-to-even on the exact
    // expansion; neither engine here does.)
    assert(cls(2.675, 2) === 2)
  }

  test("ulp-offset bands around an exact tie (n=0, fine grid)") {
    for (k <- Seq(3L, 1000L, 9999999L); sign <- Seq(1, -1)) {
      val tie = sign * (k + 0.5)
      def off(m: Int, dir: Int): Double = {
        var x = tie
        (1 to m).foreach { _ =>
          x = if (dir > 0) math.nextUp(x) else math.nextDown(x)
        }
        x
      }
      for (dir <- Seq(1, -1)) {
        for (m <- Seq(1, 2, 15))
          assert(cls(off(m, dir), 0) === 3, s"tie=$tie m=$m dir=$dir")
        for (m <- Seq(16, 17, 999))
          assert(cls(off(m, dir), 0) === 1, s"tie=$tie m=$m dir=$dir")
        for (m <- Seq(1000, 5000))
          assert(cls(off(m, dir), 0) === 0, s"tie=$tie m=$m dir=$dir")
        Seq(1, 15, 16, 999, 1000, 5000).foreach(m =>
          checkConsistency(off(m, dir), 0))
      }
    }
  }

  test("coarse grid gates classes 1/3 off (ADVICE r10)") {
    // ulp(y) ≥ 1e-3: every double sits 'few ulps' from a boundary by
    // construction, so the ulp-distance bands carry no fragility signal
    // — integers at huge magnitude used to classify near-fragile
    assert(math.ulp(9e15) >= 1.0)
    assert(cls(9e15 + 1, 0) === 0) // dUnits=0.5 < 16·ulp, but gated
    assert(cls(1e14, 2) === 0)     // y=1e16, ulp=2: gated
    checkConsistency(9e15 + 1, 0)
    checkConsistency(1e14, 2)
  }

  test("product overflow is the sentinel class, not a throw (ADVICE r10)") {
    assert(cls(1e308, 2) === 5)
    assert(cls(-1e308, 5) === 5)
    assert(cls(Double.MaxValue, 1) === 5)
    // non-finite / zero inputs keep their class-0 sentinel
    assert(cls(Double.NaN, 2) === 0)
    assert(cls(Double.PositiveInfinity, 2) === 0)
    assert(cls(0.0, 2) === 0)
  }

  test("fixed-seed random sweep holds the consistency invariants") {
    val rnd = new scala.util.Random(20260816L)
    var checked = 0
    while (checked < 20000) {
      val n = rnd.nextInt(7) // scales 0..6, the registry's range
      val v = rnd.nextInt(4) match {
        case 0 => // boundary-adjacent by construction: (k+0.5)/10^n ± ulps
          val k = rnd.nextInt(1000000)
          val base = (k + 0.5) / math.pow(10.0, n)
          val m = rnd.nextInt(2000)
          var x = base
          val upDir = rnd.nextBoolean()
          (1 to m).foreach(_ => x = if (upDir) math.nextUp(x) else math.nextDown(x))
          if (rnd.nextBoolean()) x else -x
        case 1 => // money-like two-decimal values
          (rnd.nextInt(20000000) - 10000000) / 100.0
        case 2 => // wide magnitude sweep
          val mag = math.pow(10.0, rnd.nextInt(24) - 8)
          (rnd.nextDouble() - 0.5) * mag
        case _ => // raw bit patterns (finite only)
          java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
            case d if d.isNaN || d.isInfinite => 1.0
            case d => d
          }
      }
      checkConsistency(v, n)
      checked += 1
    }
  }
}

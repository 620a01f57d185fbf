package graft

import org.apache.spark.sql.functions._

import graft.operators.Learn

class LearnSpec extends SparkSuite {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sequential reference: the same full-batch GD loop over plain
    * arrays, with the same per-round weight rounding.
    */
  private def refFit(xs: Array[Array[Double]], ys: Array[Double],
      iters: Int, lr: Double): Array[Double] = {
    val k = xs.head.length
    var w = Array.fill(k + 1)(0.0)
    for (_ <- 1 to iters) {
      val g = Array.fill(k + 1)(0.0)
      for (i <- xs.indices) {
        val m = w(0) + (0 until k).map(j => w(j + 1) * xs(i)(j)).sum
        val r = 1.0 / (1.0 + math.exp(-m)) - ys(i)
        g(0) += r
        for (j <- 0 until k) g(j + 1) += r * xs(i)(j)
      }
      w = Array.tabulate(k + 1)(j => round6(w(j) - lr * g(j) / xs.length))
    }
    w
  }

  test("one GD round on an antisymmetric pair matches the closed form") {
    // x=±1 with y=1/0: at w=0 every p=½, so g_b=0 and g_x=−½ —
    // after one lr=1 round w=(0, 0.5) exactly
    val df = Seq((1.0, 1), (-1.0, 0)).toDF("x", "y")
    val (w, report) = Learn.logisticGd(df, Seq("x"), "y", iters = 1, lr = 1.0)
    assert(w.toSeq === Seq(0.0, 0.5))
    val r = report.head()
    assert(r.getLong(0) === 2L) // n
    assert(r.getLong(3) === 2L) // both margins classify correctly
  }

  test("distributed fit matches the sequential reference model exactly") {
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(200)(Array(rnd.nextDouble(), rnd.nextDouble()))
    // labels from a noisy linear rule — learnable but not separable
    val ys = xs.map(v =>
      if (v(0) - v(1) + 0.3 * (rnd.nextDouble() - 0.5) > 0) 1.0 else 0.0)
    val df = xs.zip(ys).map { case (v, y) => (v(0), v(1), y) }
      .toSeq.toDF("x1", "x2", "y")
    val (w, report) =
      Learn.logisticGd(df, Seq("x1", "x2"), "y", iters = 6, lr = 2.0)
    val expected = refFit(xs, ys, iters = 6, lr = 2.0)
    // per-round rounding to 6 decimals absorbs the float-sum order gap
    // between the distributed aggregate and the sequential loop
    assert(w.toSeq === expected.toSeq)
    // the learned rule must beat the majority-class baseline
    val nCorrect = report.head().getLong(4)
    val majority = math.max(ys.count(_ == 1.0), ys.count(_ == 0.0))
    assert(nCorrect > majority)
    // and the discriminative direction has the right signs
    assert(w(1) > 0 && w(2) < 0)
  }

  test("splitConformal: exact-line fit gives q from the noise point alone") {
    // train lies exactly on y = 2x + 1 → slope/intercept recover it and
    // every on-line residual is 0; one calibration outlier at +5 sets q
    // when k reaches it
    val train = Seq((1.0, 3.0, 1L), (2.0, 5.0, 2L), (3.0, 7.0, 3L),
      (4.0, 9.0, 4L)).toDF("x", "y", "id")
    val cal = Seq((1.0, 3.0, 10L), (2.0, 5.0, 11L), (3.0, 12.0, 12L))
      .toDF("x", "y", "id") // residuals 0, 0, 5
    val test = Seq((5.0, 11.0, 20L), (6.0, 13.0, 21L), (7.0, 20.0, 22L))
      .toDF("x", "y", "id") // residuals 0, 0, 5
    // alpha 0.1: k = min(ceil(4·0.9), 3) = 3 → q = 5 → full coverage
    val r = graft.operators.Learn.splitConformal(
      train, cal, test, "x", "y", Seq("id"), alpha = 0.1).head()
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 1.0)
    assert(r.getDouble(5) === 5.0)
    assert(r.getDouble(6) === 1.0)
    // alpha 0.5: k = ceil(4·0.5) = 2 → q = 0 → the +5 test point escapes
    val r2 = graft.operators.Learn.splitConformal(
      train, cal, test, "x", "y", Seq("id"), alpha = 0.5).head()
    assert(r2.getDouble(5) === 0.0)
    assert(math.abs(r2.getDouble(6) - 2.0 / 3) < 1e-6)
  }

  test("report columns: weights are literals, log-loss below chance") {
    val df = Seq((0.2, 1), (0.9, 1), (0.1, 0), (0.4, 0)).toDF("x", "y")
    val (w, report) = Learn.logisticGd(df, Seq("x"), "y", iters = 4, lr = 1.0)
    val cols = report.columns.toSeq
    assert(cols === Seq("n", "b", "w_x", "n_correct", "log_loss"))
    val r = report.head()
    assert(r.getDouble(1) === w(0) && r.getDouble(2) === w(1))
    // ln 2 is the all-½ starting loss; four rounds must improve on it
    assert(r.getDouble(4) < math.log(2.0))
  }
}

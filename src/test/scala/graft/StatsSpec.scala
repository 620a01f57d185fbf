package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** The statistical tests must satisfy their textbook identities exactly —
  * these are the invariants that hold for ANY data, checked on small
  * constructed inputs where the closed forms are hand-computable.
  */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("ks2Sample: 0 on identical sides, 1 on disjoint supports, in [0,1]") {
    // identical distributions on both sides -> every CDF gap is 0
    val same = (1 to 20).map(i => ("k", i % 5, i % 2 == 0)).toDF("k", "v", "s")
    val r0 = Stats.ks2Sample(same, "k", "v", col("s")).head()
    assert(r0.getAs[Double]("ks") === 0.0)
    // disjoint supports -> the gap reaches exactly 1
    val disj = ((1 to 5).map(i => ("k", i, true))
      ++ (11 to 15).map(i => ("k", i, false))).toDF("k", "v", "s")
    val r1 = Stats.ks2Sample(disj, "k", "v", col("s")).head()
    assert(r1.getAs[Double]("ks") === 1.0)
    assert(r1.getAs[Long]("n_a") === 5L && r1.getAs[Long]("n_b") === 5L)
  }

  test("spearman: 1 on any monotone map, sign flip, ties via midranks") {
    // y = x³ is monotone but nonlinear: Spearman 1, Pearson < 1
    val mono = (1 to 12).map(i => ("k", i, i * i * i)).toDF("k", "x", "y")
    val r = Stats.spearmanByGroup(mono, "k", "x", "y").head()
    assert(math.abs(r.getAs[Double]("spearman_rho") - 1.0) < 1e-12)
    val p = Stats.pearsonByGroup(mono, "k", col("x"), col("y"))
      .head().getAs[Double]("pearson_r")
    assert(p < 0.99)
    // reversed order → exactly −1
    val anti = (1 to 12).map(i => ("k", i, -i)).toDF("k", "x", "y")
    assert(math.abs(Stats.spearmanByGroup(anti, "k", "x", "y")
      .head().getAs[Double]("spearman_rho") + 1.0) < 1e-12)
    // ties: matches scipy-convention midrank value on a hand case
    // x = (1,2,2,3), y = (1,2,3,4): rx = (1, 2.5, 2.5, 4)
    val tie = Seq(("k", 1, 1), ("k", 2, 2), ("k", 2, 3), ("k", 3, 4))
      .toDF("k", "x", "y")
    val rho = Stats.spearmanByGroup(tie, "k", "x", "y")
      .head().getAs[Double]("spearman_rho")
    // hand Pearson over ((1,1),(2.5,2),(2.5,3),(4,4)): r = 0.9486833
    assert(math.abs(rho - 3.0 / math.sqrt(10.0)) < 1e-9)
  }

  test("wasserstein1: shift distance exact, 0 on identical, NULL one-sided") {
    // A = {0,1}, B = {1,2}: a unit shift → W1 = 1 exactly
    val shift = Seq(("k", 0.0, true), ("k", 1.0, true),
      ("k", 1.0, false), ("k", 2.0, false)).toDF("k", "v", "s")
    val r = Stats.wasserstein1(shift, "k", "v", col("s")).head()
    assert(r.getAs[Double]("w1") === 1.0)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    // identical sides → 0
    val same = (1 to 20).map(i => ("k", (i % 5).toDouble, i % 2 == 0))
      .toDF("k", "v", "s")
    assert(Stats.wasserstein1(same, "k", "v", col("s"))
      .head().getAs[Double]("w1") === 0.0)
    // a key with one empty side reports NULL, never NaN/throw
    val lone = Seq(("k", 1.0, true), ("k", 2.0, true)).toDF("k", "v", "s")
    assert(Stats.wasserstein1(lone, "k", "v", col("s")).head().isNullAt(3))
    // general case: matches the O(n log n) sequential pairing model
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(40)(rnd.nextInt(20).toDouble)
    val ys = Seq.fill(40)(rnd.nextInt(20).toDouble + 5.0)
    val df = (xs.map(("k", _, true)) ++ ys.map(("k", _, false)))
      .toDF("k", "v", "s")
    // equal sizes: W1 = mean |sorted xs - sorted ys|
    val seqW1 = xs.sorted.zip(ys.sorted).map { case (a, b) =>
      math.abs(a - b) }.sum / 40
    val got = Stats.wasserstein1(df, "k", "v", col("s"))
      .head().getAs[Double]("w1")
    assert(math.abs(got - seqW1) < 1e-9, s"$got vs $seqW1")
  }

  test("mannWhitney: U_a + U_b = n_a*n_b (midrank identity), symmetric null") {
    val df = (1 to 30).map(i => ("k", (i * 7) % 13, i % 3 == 0))
      .toDF("k", "v", "s")
    val r = Stats.mannWhitney(df, "k", "v", col("s")).head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val ua = r.getAs[Double]("u_a")
    // U_b from the flipped side must complement exactly, ties included
    val rb = Stats.mannWhitney(df, "k", "v", !col("s")).head()
    assert(ua + rb.getAs[Double]("u_a") === (na * nb).toDouble)
    // rank-biserial is the same identity rescaled to [-1, 1]
    assert(math.abs(r.getAs[Double]("rank_biserial")
      + rb.getAs[Double]("rank_biserial")) < 1e-12)
  }

  test("welchT: equal groups give t = 0; sign follows the mean difference") {
    val eq = (1 to 10).flatMap(i => Seq(("k", i.toDouble, true),
      ("k", i.toDouble, false))).toDF("k", "v", "s")
    val r = Stats.welchT(eq, "k", "v", col("s")).head()
    assert(r.getAs[Double]("mean_diff") === 0.0)
    assert(r.getAs[Double]("t_welch") === 0.0)
    val shifted = ((1 to 10).map(i => ("k", i + 100.0, true))
      ++ (1 to 10).map(i => ("k", i.toDouble, false))).toDF("k", "v", "s")
    val rs = Stats.welchT(shifted, "k", "v", col("s")).head()
    assert(rs.getAs[Double]("mean_diff") === 100.0)
    assert(rs.getAs[Double]("t_welch") > 0)
    assert(rs.getAs[Double]("df") > 0)
  }

  test("chiSquare: exactly 0 under constructed independence") {
    // counts(x, y) = f(x)*g(y) -> observed == expected in every cell
    val rows = for {
      (x, fx) <- Seq(("a", 1), ("b", 2))
      (y, gy) <- Seq(("p", 3), ("q", 1))
      _ <- 1 to fx * gy
    } yield (x, y)
    val df = rows.toDF("x", "y")
    val r = Stats.chiSquare(df, col("x"), col("y")).head()
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("n") === 12L)
  }

  test("mutualInformation: 0 under independence, H(X) when Y determines X") {
    val indep = (for {
      (x, fx) <- Seq(("a", 1), ("b", 2)); (y, gy) <- Seq(("p", 3), ("q", 1))
      _ <- 1 to fx * gy
    } yield (x, y)).toDF("x", "y")
    val ri = Stats.mutualInformation(indep, col("x"), col("y")).head()
    assert(math.abs(ri.getAs[Double]("mi_nats")) < 1e-9)
    // Y = X (perfect dependence): MI = H(X) = H(Y), NMI = 1
    val dep = Seq("a", "a", "b", "c").map(x => (x, x)).toDF("x", "y")
    val rd = Stats.mutualInformation(dep, col("x"), col("y")).head()
    assert(math.abs(rd.getAs[Double]("mi_nats")
      - rd.getAs[Double]("h_x")) < 1e-9)
    assert(math.abs(rd.getAs[Double]("nmi") - 1.0) < 1e-9)
  }

  test("kendallTauB: +1 on a strictly rising series, -1 falling, ties shrink |tau|") {
    val up = (1 to 10).map(i => (f"m$i%02d", i.toLong)).toDF("k", "v")
    assert(Stats.kendallTauB(up, "k", "v").head().getAs[Double]("tau_b") === 1.0)
    val down = (1 to 10).map(i => (f"m$i%02d", (11 - i).toLong)).toDF("k", "v")
    assert(Stats.kendallTauB(down, "k", "v").head()
      .getAs[Double]("tau_b") === -1.0)
    // a tie removes concordant mass AND shrinks the denominator, |tau| < 1
    val tied = Seq(("a", 1L), ("b", 2L), ("c", 2L), ("d", 3L)).toDF("k", "v")
    val rt = Stats.kendallTauB(tied, "k", "v").head()
    assert(rt.getAs[Long]("concordant") === 5L)
    assert(rt.getAs[Long]("discordant") === 0L)
    val tb = rt.getAs[Double]("tau_b")
    assert(tb > 0.9 && tb < 1.0) // 5 / sqrt(6*5) ~= 0.9129
  }

  test("runsTest: alternating series maxes runs, monotone series has 1 run") {
    // values 1,0,2,0,3,0 -> signs -,+,-,+,- : n_up=2 n_down=3, R=5 (max)
    val alt = Seq(1.0, 0.0, 2.0, 0.0, 3.0, 0.0).zipWithIndex
      .map { case (v, i) => (f"t$i%02d", v) }.toDF("k", "v")
    val ra = Stats.runsTest(alt, "k", "v").head()
    assert(ra.getAs[Long]("n_up") === 2L && ra.getAs[Long]("n_down") === 3L)
    assert(ra.getAs[Long]("runs") === 5L)
    assert(ra.getAs[Double]("z") > 0) // more runs than E[R] = 3.4
    // strictly rising -> one run; the one-sided null variance is 0, so
    // z is undefined (NULL), not an ANSI division error
    val up = (1 to 8).map(i => (f"t$i%02d", i.toDouble)).toDF("k", "v")
    val ru = Stats.runsTest(up, "k", "v").head()
    assert(ru.getAs[Long]("runs") === 1L && ru.getAs[Long]("n_down") === 0L)
    assert(ru.isNullAt(ru.fieldIndex("z")))
    // zero diffs are dropped, not counted as runs
    val flat = Seq(("t1", 2.0), ("t2", 2.0), ("t3", 2.0), ("t4", 3.0))
      .toDF("k", "v")
    assert(Stats.runsTest(flat, "k", "v").head().getAs[Long]("runs") === 1L)
  }

  test("giniByGroup: per-key closed forms match the global formula") {
    val df = ((1 to 4).map(i => ("uniform", i.toDouble))
      ++ Seq.fill(7)(("equal", 3.5))
      ++ ((Seq.fill(9)(0.0) :+ 100.0).map(v => ("spike", v))))
      .toDF("k", "v")
    val r = Stats.giniByGroup(df, "k", "v")
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getAs[Double]("gini"))).toMap
    assert(r("uniform")._1 === 4L
      && math.abs(r("uniform")._2 - 0.25) < 1e-12)
    assert(math.abs(r("equal")._2) < 1e-12)
    assert(math.abs(r("spike")._2 - 0.9) < 1e-12)
  }

  test("anovaF: 0 when group means coincide; eta_sq -> 1 as groups separate") {
    // identical group means (different spreads): SSB = 0 -> F = 0
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0),
      ("c", 0.0), ("c", 4.0)).toDF("g", "v")
    val r = Stats.anovaF(flat, "g", "v").head()
    assert(math.abs(r.getAs[Double]("f_stat")) < 1e-9)
    assert(math.abs(r.getAs[Double]("eta_sq")) < 1e-9)
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("dof_between") === 2L
      && r.getAs[Long]("dof_within") === 3L)
    // widely separated tight groups: eta_sq near 1, F large
    val sep = Seq(("a", 0.0), ("a", 0.1), ("b", 100.0), ("b", 100.1))
      .toDF("g", "v")
    val rs = Stats.anovaF(sep, "g", "v").head()
    assert(rs.getAs[Double]("eta_sq") > 0.999)
    assert(rs.getAs[Double]("f_stat") > 1000)
  }

  test("pearsonByGroup: exactly ±1 on affine data, n per group") {
    val df = (1 to 20).map { i =>
      val g = if (i % 2 == 0) "up" else "down"
      val y = if (g == "up") 3.0 * i + 7 else -2.0 * i + 1
      (g, i.toDouble, y)
    }.toDF("g", "x", "y")
    val r = Stats.pearsonByGroup(df, "g", col("x"), col("y"))
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getAs[Double]("pearson_r"))).toMap
    assert(r("up")._1 === 10L && math.abs(r("up")._2 - 1.0) < 1e-12)
    assert(r("down")._1 === 10L && math.abs(r("down")._2 + 1.0) < 1e-12)
  }

  test("welchT/ks2Sample: one-sided or n<2 keys yield NULL, not NaN/Inf") {
    import spark.implicits._
    // key "solo" has every row on side A; key "tiny" has 1 row per side
    val df = ((1 to 6).map(i => ("solo", i, true))
      ++ Seq(("tiny", 1, true), ("tiny", 9, false))
      ++ (1 to 8).map(i => ("ok", i, i % 2 == 0))).toDF("k", "v", "s")
    val w = Stats.welchT(df, "k", "v", col("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(w("solo").isNullAt(w("solo").fieldIndex("t_welch")))
    assert(w("solo").isNullAt(w("solo").fieldIndex("mean_diff")))
    assert(w("tiny").isNullAt(w("tiny").fieldIndex("t_welch")))
    assert(w("tiny").isNullAt(w("tiny").fieldIndex("df")))
    assert(!w("ok").isNullAt(w("ok").fieldIndex("t_welch")))
    assert(!w("ok").getAs[Double]("t_welch").isNaN)
    val k = Stats.ks2Sample(df, "k", "v", col("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(k("solo").isNullAt(k("solo").fieldIndex("ks")))
    assert(k("tiny").getAs[Double]("ks") === 1.0) // 1-vs-1 IS defined
    assert(!k("ok").isNullAt(k("ok").fieldIndex("ks")))
  }

  test("mutualInformation: double-cast margins match the exact small-n value") {
    import spark.implicits._
    // 2x2 contingency {a,b} x {0,1} with counts 2,1,1,2 -> exact MI
    val df = Seq(("a",0),("a",0),("a",1),("b",0),("b",1),("b",1))
      .toDF("x", "y")
    val r = Stats.mutualInformation(df, col("x"), col("y")).head()
    val exact = (4.0/6) * math.log(6.0 * 2 / (3 * 3)) +
      (2.0/6) * math.log(6.0 * 1 / (3 * 3))
    assert(math.abs(r.getAs[Double]("mi_nats") - exact) < 1e-12)
  }

}

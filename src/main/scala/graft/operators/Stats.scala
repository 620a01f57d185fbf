package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical tests and dependence measures.
  *
  * Design rules shared by every function here:
  *   - inputs collapse to the smallest sufficient grain FIRST (the
  *     (key, value) distinct grain for rank statistics, the contingency
  *     grain for categorical measures, moment sums for parametric
  *     tests), so the expensive relation is aggregated before any
  *     window or join touches it;
  *   - per-key cumulative windows are keyed on the caller's group
  *     column — the same skew profile as any per-key CDF — never a
  *     global single-partition window;
  *   - everything stays an exact integer (or exact half, for midranks)
  *     until the final closed-form division, so results are
  *     bit-deterministic across engines with no float-sum slack. The
  *     exceptions are the parametric moment sums (Welch, Pearson) and
  *     the ~k·log(k) information terms, where the addition-order slack
  *     is bounded by the grain and callers round the output.
  *
  * Each function returns full-precision columns; presentation rounding
  * is the caller's concern (the SparkEntry registry rounds to match its
  * DuckDB oracles).
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov statistic per key: max CDF gap of
    * `valueCol` between the rows where `sideA` is true and the rest.
    * Output: (key, n_a, n_b, ks). Counts collapse to the (key, value)
    * grain before the one keyed cumulative window builds both
    * empirical CDFs; every division input is an exact integer.
    */
  def ks2Sample(df: DataFrame, keyCol: String, valueCol: String,
      sideA: Column): DataFrame = {
    val pts = df
      .withColumn("_sa", sideA.cast("long"))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("_sa")).as("_ca"), sum(lit(1L) - col("_sa")).as("_cb"))
    val w = Window.partitionBy(keyCol).orderBy(valueCol)
    val tw = Window.partitionBy(keyCol)
    pts
      .withColumn("_cuma", sum("_ca").over(w))
      .withColumn("_cumb", sum("_cb").over(w))
      .withColumn("_na", sum("_ca").over(tw))
      .withColumn("_nb", sum("_cb").over(tw))
      // a key present on only one side has no second CDF: the gap is
      // undefined, and the guard must sit on the RAW division — ANSI
      // mode throws on the zero divisor itself, before any outer
      // when() around an assembled statistic could mask it — so NULL
      // rows flow through max() and the key reports ks = NULL (same
      // contract as runsTest's degenerate guard)
      .withColumn("_dif",
        when(col("_na") > 0 && col("_nb") > 0,
          abs(col("_cuma").cast("double") / col("_na")
            - col("_cumb").cast("double") / col("_nb"))))
      .groupBy(keyCol)
      .agg(max("_na").as("n_a"), max("_nb").as("n_b"),
        max("_dif").as("ks"))
  }

  /** Two-sample 1-Wasserstein (earth-mover) distance per key:
    * W₁ = ∫|F_A − F_B| dx over the merged support — the drift measure
    * that weights HOW FAR mass moved, where KS only reports the single
    * worst gap. Same scale shape as [[ks2Sample]]: collapse to the
    * (key, value) grain, ONE keyed cumulative window builds both
    * empirical CDFs, and each grid segment contributes
    * |F_A − F_B|·(next value − value). A key with either side empty
    * reports NULL (the runsTest degenerate-guard contract). Output:
    * (key, n_a, n_b, w1); the segment sum is the one float
    * aggregation — callers round.
    */
  def wasserstein1(df: DataFrame, keyCol: String, valueCol: String,
      sideA: Column): DataFrame = {
    val pts = df
      .withColumn("_sa", sideA.cast("long"))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("_sa")).as("_ca"), sum(lit(1L) - col("_sa")).as("_cb"))
    val w = Window.partitionBy(keyCol).orderBy(valueCol)
    val tw = Window.partitionBy(keyCol)
    pts
      .withColumn("_cuma", sum("_ca").over(w))
      .withColumn("_cumb", sum("_cb").over(w))
      .withColumn("_na", sum("_ca").over(tw))
      .withColumn("_nb", sum("_cb").over(tw))
      .withColumn("_nx", lead(valueCol, 1).over(w))
      // NULL-guarded on the raw divisions (ANSI throws on the zero
      // divisor itself); the last grid point has no next value and
      // contributes no segment
      .withColumn("_seg",
        when(col("_na") > 0 && col("_nb") > 0 && col("_nx").isNotNull,
          abs(col("_cuma").cast("double") / col("_na")
            - col("_cumb").cast("double") / col("_nb"))
            * (col("_nx").cast("double") - col(valueCol).cast("double"))))
      .groupBy(keyCol)
      .agg(max("_na").as("n_a"), max("_nb").as("n_b"),
        when(max("_na") > 0 && max("_nb") > 0, sum("_seg"))
          .otherwise(lit(null)).as("w1"))
  }

  /** Mann–Whitney rank-sum test per key with tie midranks. Output:
    * (key, n_a, n_b, u_a, rank_biserial). Midranks come from ONE keyed
    * cumulative window over the (key, value) grain; every term is an
    * exact integer or exact half, so U is bit-deterministic.
    */
  def mannWhitney(df: DataFrame, keyCol: String, valueCol: String,
      sideA: Column): DataFrame = {
    val pts = df
      .withColumn("_sa", sideA.cast("long"))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("_sa")).as("_ca"), sum(lit(1L) - col("_sa")).as("_cb"))
    val w = Window.partitionBy(keyCol).orderBy(valueCol)
    pts.withColumn("_c", col("_ca") + col("_cb"))
      .withColumn("_mid",
        (sum("_c").over(w) - col("_c")).cast("double")
          + (col("_c") + lit(1)).cast("double") / 2)
      .groupBy(keyCol)
      .agg(sum("_ca").as("n_a"), sum("_cb").as("n_b"),
        sum(col("_ca") * col("_mid")).as("_ra"))
      .withColumn("u_a", col("_ra")
        - col("n_a").cast("double") * (col("n_a") + 1) / 2)
      .withColumn("rank_biserial",
        lit(2.0) * col("u_a") / (col("n_a") * col("n_b")) - 1)
      .drop("_ra")
  }

  /** Welch's unequal-variance t test per key. Output: (key, n_a, n_b,
    * mean_diff, t_welch, df) with the Welch–Satterthwaite degrees of
    * freedom. ONE keyed aggregation collects (n, Σx, Σx²) per side;
    * everything after is closed-form arithmetic — no second pass.
    */
  def welchT(df: DataFrame, keyCol: String, valueCol: String,
      sideA: Column): DataFrame = {
    val a = sideA.cast("long")
    val v = col(valueCol)
    val g = df.groupBy(col(keyCol))
      .agg(sum(a).as("n_a"), sum(a * v).as("_sa"),
        sum(a * v * v).as("_qa"),
        sum(lit(1L) - a).as("n_b"), sum((lit(1L) - a) * v).as("_sb"),
        sum((lit(1L) - a) * v * v).as("_qb"))
    val ma = col("_sa") / col("n_a")
    val mb = col("_sb") / col("n_b")
    val va = (col("_qa") - col("_sa") * col("_sa") / col("n_a")) /
      (col("n_a") - 1)
    val vb = (col("_qb") - col("_sb") * col("_sb") / col("n_b")) /
      (col("n_b") - 1)
    val sea = va / col("n_a")
    val seb = vb / col("n_b")
    // the test is undefined unless BOTH sides have ≥2 rows (n-1 and n
    // divisions degenerate to NaN/Inf, never an error): report NULL for
    // degenerate keys — same contract as runsTest's guard
    val defined = col("n_a") > 1 && col("n_b") > 1
    val nullD = lit(null).cast("double")
    g.select(col(keyCol), col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, ma - mb)
        .otherwise(nullD).as("mean_diff"),
      when(defined, (ma - mb) / sqrt(sea + seb))
        .otherwise(nullD).as("t_welch"),
      when(defined, pow(sea + seb, 2)
        / (pow(sea, 2) / (col("n_a") - 1)
          + pow(seb, 2) / (col("n_b") - 1))).otherwise(nullD).as("df"))
  }

  /** Chi-square test of independence between two categorical columns.
    * Output: 1 row (chi2, dof, n). Observed counts collapse to the
    * |X|×|Y| contingency grain before the margin windows run, so the
    * windows span a bounded relation regardless of input size.
    */
  def chiSquare(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val o = df.groupBy(xCol.as("_x"), yCol.as("_y"))
      .agg(count(lit(1)).as("_o"))
    o.withColumn("_rt", sum("_o").over(Window.partitionBy("_x")))
      .withColumn("_ct", sum("_o").over(Window.partitionBy("_y")))
      .withColumn("_n", sum("_o").over(Window.partitionBy()))
      .withColumn("_e", col("_rt").cast("double") * col("_ct") / col("_n"))
      .agg(sum(pow(col("_o") - col("_e"), 2) / col("_e")).as("chi2"),
        ((countDistinct("_x") - 1) * (countDistinct("_y") - 1)).as("dof"),
        max("_n").as("n"))
  }

  /** Mutual information (nats) between two categorical columns, with
    * both marginal entropies and the min-entropy-normalized MI.
    * Output: 1 row (mi_nats, h_x, h_y, nmi). Same bounded contingency
    * grain as [[chiSquare]]; every probability is an exact integer
    * ratio.
    */
  def mutualInformation(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val o = df.groupBy(xCol.as("_x"), yCol.as("_y"))
      .agg(count(lit(1)).as("_o"))
    o.withColumn("_rt", sum("_o").over(Window.partitionBy("_x")))
      .withColumn("_ct", sum("_o").over(Window.partitionBy("_y")))
      .withColumn("_n", sum("_o").over(Window.partitionBy()))
      .withColumn("_p", col("_o").cast("double") / col("_n"))
      .agg(
        // cast BEFORE multiplying the long margins: _rt * _ct as longs
        // overflows (and throws under ANSI) once n exceeds ~3e9 rows,
        // while the double product merely loses ulps the log absorbs —
        // consistent with chiSquare's expected-count arithmetic
        sum(col("_p") * log(col("_o").cast("double") * col("_n")
          / (col("_rt").cast("double") * col("_ct")))).as("mi_nats"),
        (-sum(col("_p")
          * log(col("_rt").cast("double") / col("_n")))).as("h_x"),
        (-sum(col("_p")
          * log(col("_ct").cast("double") / col("_n")))).as("h_y"))
      .withColumn("nmi", col("mi_nats") / least(col("h_x"), col("h_y")))
  }

  /** Kendall τ-b rank correlation between an ordering column and a value
    * column, over a relation the CALLER has already reduced to a bounded
    * grain (a calendar rollup, a small report table): the pairwise pass
    * is a deliberate small-relation cross product and must never see a
    * fact table. Output: 1 row (n, concordant, discordant, tau_b) with
    * the tie correction for `valCol` (ties in `ordCol` are assumed
    * absent — it is the caller's rollup key).
    */
  def kendallTauB(df: DataFrame, ordCol: String, valCol: String): DataFrame = {
    val m = df.select(col(ordCol).as("_k"), col(valCol).as("_v"))
    val a = m.select(col("_k").as("_ka"), col("_v").as("_va"))
    val b = m.select(col("_k").as("_kb"), col("_v").as("_vb"))
    val pairs = a.join(b, col("_ka") < col("_kb"))
      .agg(
        sum(when(col("_vb") > col("_va"), 1L).otherwise(0L))
          .as("concordant"),
        sum(when(col("_vb") < col("_va"), 1L).otherwise(0L))
          .as("discordant"))
    val ties = m.groupBy("_v").agg(count(lit(1)).as("_tb"))
      .agg(sum(col("_tb") * (col("_tb") - 1) / 2).as("_n2"),
        sum(col("_tb")).as("n"))
    pairs.crossJoin(broadcast(ties))
      .select(col("n"), col("concordant"), col("discordant"),
        ((col("concordant") - col("discordant")).cast("double")
          / sqrt((col("n") * (col("n") - 1) / 2).cast("double")
            * ((col("n") * (col("n") - 1) / 2) - col("_n2"))))
          .as("tau_b"))
  }

  /** Wald–Wolfowitz runs test for randomness of a series' direction:
    * signs of consecutive differences of `valCol` under the `ordCol`
    * total order (zero diffs dropped), run count R against its
    * null-hypothesis mean and variance. Like [[kendallTauB]], the
    * input must already be a caller-bounded grain (a calendar rollup)
    * — the ordering window is global over that bounded relation by
    * design. Output: 1 row (n_up, n_down, runs, z).
    */
  def runsTest(df: DataFrame, ordCol: String, valCol: String): DataFrame = {
    val w = Window.orderBy(ordCol)
    val signs = df
      .withColumn("_d", col(valCol) - lag(valCol, 1).over(w))
      .filter(col("_d").isNotNull && col("_d") =!= 0)
      .withColumn("_s", signum(col("_d")))
    val runs = signs
      .withColumn("_chg",
        when(lag("_s", 1).over(Window.orderBy(ordCol)).isNull
          || col("_s") =!= lag("_s", 1).over(Window.orderBy(ordCol)), 1L)
          .otherwise(0L))
      .agg(sum(when(col("_s") > 0, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("_s") < 0, 1L).otherwise(0L)).as("n_down"),
        sum("_chg").as("runs"))
    val n1 = col("n_up").cast("double")
    val n2 = col("n_down").cast("double")
    val er = lit(2.0) * n1 * n2 / (n1 + n2) + 1
    // guard on the RAW numerator/denominator, not the assembled
    // variance: a one-sided or length-≤2 sign series zeroes both, and
    // ANSI mode throws on 0/0 even inside the variance expression —
    // the test is undefined there, so emit NULL
    val num = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2)
    val den = (n1 + n2) * (n1 + n2) * (n1 + n2 - 1)
    runs.select(col("n_up"), col("n_down"), col("runs"),
      when(num > 0 && den > 0,
        (col("runs") - er) / sqrt(num / den))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Gini concentration coefficient per key: the keyed-window companion
    * to `Scale.gini`'s global range-sort form. Ranks come from one
    * per-key window sort (the shuffle is keyed on `keyCol`, so skew
    * follows the caller's grouping, never a global single partition);
    * ties commute in the closed form, so the tie-break-free rank is
    * still deterministic. NULL/NaN values are dropped. Output:
    * (key, n, gini).
    */
  def giniByGroup(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val ranked = df.select(col(keyCol), v.as("_v"))
      .filter(col("_v").isNotNull && !col("_v").isNaN)
      .withColumn("_r", row_number().over(
        Window.partitionBy(keyCol).orderBy(col("_v"))))
    ranked.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        ((lit(2.0) * sum(col("_r") * col("_v")))
          / (count(lit(1)) * sum(col("_v")))
          - (count(lit(1)) + lit(1.0)) / count(lit(1))).as("gini"))
  }

  /** One-way ANOVA across the groups of `keyCol`: F statistic, both
    * degrees of freedom, and the eta² effect size, all from ONE keyed
    * aggregation of (n, Σx, Σx²) per group — no second pass, no
    * per-group collect. Output: 1 row (k, n, f_stat, dof_between,
    * dof_within, eta_sq).
    */
  def anovaF(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"), sum(v * v).as("_q"))
    val ssb = col("_B") - col("_S") * col("_S") / col("n")
    val ssw = col("_Q") - col("_B")
    val sst = col("_Q") - col("_S") * col("_S") / col("n")
    g.agg(count(lit(1)).as("k"), sum("_n").as("n"),
        sum(col("_s")).as("_S"), sum(col("_q")).as("_Q"),
        sum(col("_s") * col("_s") / col("_n")).as("_B"))
      .select(col("k"), col("n"),
        ((ssb / (col("k") - 1)) / (ssw / (col("n") - col("k"))))
          .as("f_stat"),
        (col("k") - 1).as("dof_between"),
        (col("n") - col("k")).as("dof_within"),
        (ssb / sst).as("eta_sq"))
  }

  /** Pearson correlation of two numeric columns per key via the five
    * moment sums in ONE keyed aggregation — the textbook closed form,
    * so cross-engine comparison never depends on an engine's internal
    * corr() algorithm. Output: (key, n, pearson_r).
    */
  def pearsonByGroup(df: DataFrame, keyCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val x = xCol.cast("double")
    val y = yCol.cast("double")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * x).as("_sxx"), sum(y * y).as("_syy"),
        sum(x * y).as("_sxy"))
      .select(col(keyCol), col("n"),
        ((col("n") * col("_sxy") - col("_sx") * col("_sy"))
          / sqrt((col("n") * col("_sxx") - col("_sx") * col("_sx"))
            * (col("n") * col("_syy") - col("_sy") * col("_sy"))))
          .as("pearson_r"))
  }

  /** Spearman rank correlation per key: Pearson over tie-midranks —
    * the monotone-association measure that shrugs off the outliers and
    * curvature that bend Pearson. Midranks come from the (key, value)
    * grain (one keyed cumulative window per axis — the [[mannWhitney]]
    * machinery) and map back to rows through two grain-keyed joins;
    * the coefficient is [[pearsonByGroup]]'s closed form on the rank
    * pairs. Midranks are exact halves and their moment sums stay
    * exactly representable in doubles at any realistic group size, so
    * the statistic is bit-deterministic across engines.
    */
  def spearmanByGroup(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    def ranks(vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(keyCol).orderBy(vCol)
      df.groupBy(col(keyCol), col(vCol)).agg(count(lit(1)).as("_c"))
        .withColumn(out,
          (sum("_c").over(w) - col("_c")).cast("double")
            + (col("_c") + lit(1)).cast("double") / 2)
        .select(col(keyCol), col(vCol), col(out))
    }
    val rows = df.select(col(keyCol), col(xCol), col(yCol))
      .join(ranks(xCol, "_rx"), Seq(keyCol, xCol))
      .join(ranks(yCol, "_ry"), Seq(keyCol, yCol))
    pearsonByGroup(rows, keyCol, col("_rx"), col("_ry"))
      .withColumnRenamed("pearson_r", "spearman_rho")
  }

  /** Two-component 1-D Gaussian-mixture EM over a standardized column —
    * the classical latent-bimodality decomposition, run as pure
    * relational rounds. Each EM round is ONE aggregation over the
    * standardized values collecting the six sufficient sums
    * (n, Σr, Σrz, Σrz², Σz, Σz²) plus the mixture log-likelihood; the
    * only driver state is the 5-scalar parameter vector, the same
    * model-state-only contract as Lloyd/PQ training. Parameters round at
    * 4dp at every round boundary (the cross-engine protocol: the next
    * E-step recomputes responsibilities from identical rounded
    * constants, so float sum-order slack cannot compound across rounds).
    * Input standardization runs on exact integer units (`unitCol` must
    * be an integral-valued long column, e.g. cents) so both engines
    * derive bit-identical μ/σ from exact decimal sums. Returns one row
    * per round: (round, pi1, mu1, sigma1, mu2, sigma2, avg_loglik),
    * the likelihood being the E-step value under that round's INPUT
    * parameters.
    */
  def gmmEm1d(df: DataFrame, unitCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.agg(
      count(lit(1)).as("n"),
      sum(col(unitCol).cast("decimal(38,0)")).as("sc"),
      sum((col(unitCol) * col(unitCol)).cast("decimal(38,0)")).as("sc2"))
      .head()
    val n = stats.getLong(0)
    val mu = stats.getDecimal(1).doubleValue / n
    val e2 = stats.getDecimal(2).doubleValue / n
    val sd = math.sqrt(e2 - mu * mu)
    val z = df.select(((col(unitCol).cast("double") - lit(mu)) / lit(sd))
      .as("z")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def phi(m: Double, sg: Double): Column =
      exp(-((col("z") - lit(m)) * (col("z") - lit(m)))
        / lit(2.0 * sg * sg)) / lit(sg * 2.5066282746310002)
    var (pi1, m1, s1, m2, s2) = (0.5, -1.0, 1.0, 1.0, 1.0)
    val out = (1 to rounds).map { r =>
      val mix = lit(pi1) * phi(m1, s1) + lit(1.0 - pi1) * phi(m2, s2)
      val resp = lit(pi1) * phi(m1, s1) / mix
      val row = z.agg(
        sum(resp).as("sr"), sum(resp * col("z")).as("srz"),
        sum(resp * col("z") * col("z")).as("srzz"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("szz"),
        sum(log(mix)).as("sll")).head()
      val (sr, srz, srzz, sz, szz, sll) = (row.getDouble(0),
        row.getDouble(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5))
      val avgLl = BigDecimal(sll / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      pi1 = round4(sr / n)
      m1 = round4(srz / sr)
      s1 = round4(math.sqrt(math.max(srzz / sr - (srz / sr) * (srz / sr),
        1e-8)))
      m2 = round4((sz - srz) / (n - sr))
      s2 = round4(math.sqrt(math.max(
        (szz - srzz) / (n - sr)
          - ((sz - srz) / (n - sr)) * ((sz - srz) / (n - sr)), 1e-8)))
      (r, pi1, m1, s1, m2, s2, avgLl)
    }
    z.unpersist()
    out.toDF("round", "pi1", "mu1", "sigma1", "mu2", "sigma2", "avg_loglik")
      .orderBy("round")
  }
}

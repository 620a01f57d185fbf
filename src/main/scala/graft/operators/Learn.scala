package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative model fitting expressed as aggregation rounds — the
  * optimizer class the closed-form trainers (NaiveBayes counting in
  * [[TextAnalysis]], the normal-equation / regr_* family) can't reach.
  *
  * Scale contract, shared with Lloyd/PQ training in [[Similarity]]: the
  * ONLY data that ever crosses the driver is model state (a handful of
  * doubles per round); each round is one whole-stage-codegen aggregate
  * over a persisted feature frame, with map-side partial aggregation
  * collapsing partitions before the 1-row shuffle. The per-round driver
  * barrier is inherent to synchronous full-batch descent — round k+1's
  * expression needs round k's weights as literals.
  *
  * Determinism contract (what lets a SQL oracle replay training): the
  * weight vector is rounded to `roundTo` decimals after every update,
  * absorbing the cross-engine float-sum order slack of the gradient
  * aggregate (~1e-13 on thousands of rows) exactly the way the PCA
  * power-iteration oracle pins its per-round iterate.
  */
object Learn {

  private def round6(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The linear margin b + w₁·x₁ + w₂·x₂ + … as a column, associated
    * left-to-right — the same order the oracle's SQL expression uses,
    * so the per-row double is identical in both engines.
    */
  def margin(w: Array[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, i)) => acc + lit(w(i + 1)) * col(c)
    }

  /** Binary logistic regression by full-batch gradient descent:
    * w ← round(w − lr·∇, roundTo) with ∇ = Σ(σ(w·x) − y)·x / n, run for
    * exactly `iters` rounds from w = 0 (intercept first). Returns the
    * final weights alongside a one-row training report:
    * (n, b, w_<feature>..., n_correct, log_loss) where n_correct counts
    * margin-sign agreement (σ(m) ≥ ½ ⇔ m ≥ 0 — pure literal arithmetic,
    * bit-identical across engines) and log_loss is the mean cross
    * entropy at the final weights, rounded to `roundTo`.
    */
  def logisticGd(features: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int, lr: Double, roundTo: Int = 6): (Array[Double], DataFrame) = {
    val f = features
      .select(xCols.map(col) :+ col(yCol).cast("double").as("_y"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = f.count().toDouble
    require(n > 0, "logisticGd: empty feature frame")
    var w = Array.fill(xCols.size + 1)(0.0)
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-margin(w, xCols)))
      val resid = p - col("_y")
      val g = f.agg(
        (sum(resid) / n).as("_g0"),
        xCols.zipWithIndex.map { case (c, i) =>
          (sum(resid * col(c)) / n).as(s"_g${i + 1}") }: _*).head()
      w = Array.tabulate(w.length)(j =>
        round6(w(j) - lr * g.getDouble(j), roundTo))
    }
    val m = margin(w, xCols)
    val p = lit(1.0) / (lit(1.0) + exp(-m))
    val report = f.agg(
      count(lit(1)).as("n"),
      Seq(
        sum(when((m >= 0) === (col("_y") === 1.0), 1L).otherwise(0L))
          .as("n_correct"),
        round(avg(-(col("_y") * log(p)
          + (lit(1.0) - col("_y")) * log(lit(1.0) - p))), roundTo)
          .as("log_loss")): _*)
      .select(
        col("n") +:
        w.zipWithIndex.map { case (v, j) =>
          lit(v).as(if (j == 0) "b" else s"w_${xCols(j - 1)}") } :+
        col("n_correct") :+ col("log_loss"): _*)
    val out = report.localCheckpoint(eager = true)
    f.unpersist(blocking = false)
    (w, out)
  }

  /** Holdout scoring at FIXED weights — the eval half of a
    * train/test or cross-validation protocol. One codegen'd aggregate:
    * (n, n_correct, log_loss), correctness by margin sign (literal
    * arithmetic, bit-identical across engines), log-loss rounded.
    */
  def scoreReport(df: DataFrame, xCols: Seq[String], yCol: String,
      w: Array[Double], roundTo: Int = 6): DataFrame = {
    val m = margin(w, xCols)
    val p = lit(1.0) / (lit(1.0) + exp(-m))
    val y = col(yCol).cast("double")
    df.agg(
      count(lit(1)).as("n"),
      sum(when((m >= 0) === (y === 1.0), 1L).otherwise(0L)).as("n_correct"),
      round(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))), roundTo)
        .as("log_loss"))
  }

  /** Split-conformal prediction interval (Papadopoulos et al. 2002;
    * Lei et al. 2018) for a one-feature OLS model: fit ŷ = b + m·x on
    * `train` (closed-form regr slope/intercept, rounded to `roundTo` —
    * the same weight-rounding determinism contract as [[logisticGd]]),
    * take q = the k-th smallest calibration |residual| with
    * k = ⌈(n_cal+1)(1−α)⌉, and report the held-out coverage of ŷ ± q —
    * guaranteed ≥ 1−α in expectation under exchangeability, no
    * distributional assumption.
    *
    * Scale shape: the fit is one aggregate; the order statistic runs
    * through [[Scale.rankValues]]'s RANGE-PARTITIONED distributed sort
    * (never a single-partition global window); coverage is one test
    * aggregate. Residuals round to `roundTo` BEFORE ranking, so the
    * order statistic — ties broken on `tieCols` — is cross-engine
    * deterministic.
    */
  def splitConformal(train: DataFrame, cal: DataFrame, test: DataFrame,
      xCol: String, yCol: String, tieCols: Seq[String],
      alpha: Double = 0.1, roundTo: Int = 6,
      slopeRound: Int = 6, interceptRound: Int = 2): DataFrame = {
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    val fit = train.agg(regr_slope(y, x), regr_intercept(y, x)).head()
    // the intercept is a small difference of large sums — its absolute
    // summation-order slack can exceed 1e-6 on price-scale data, so it
    // rounds coarser than the slope (the agg_regr_family precedent)
    val m = round6(fit.getDouble(0), slopeRound)
    val b = round6(fit.getDouble(1), interceptRound)
    def resid(df: DataFrame): DataFrame = df.withColumn("_r",
      round(abs(y - (lit(b) + lit(m) * x)), roundTo))
    val calR = resid(cal).select(col("_r") +: tieCols.map(col): _*)
    val nTrain = train.count()
    val ranked = Scale.rankValues(calR, "_r", tieCols)
    val nCal = ranked.n
    val k = math.min(
      math.ceil((nCal + 1) * (1.0 - alpha)).toLong, nCal)
    val q = try ranked.valuesAt(Set(k - 1))(k - 1)
    finally ranked.unpersist()
    resid(test).agg(
      lit(nTrain).as("n_train"),
      lit(nCal).as("n_cal"),
      count(lit(1)).as("n_test"),
      lit(m).as("slope"), lit(b).as("intercept"),
      lit(q).as("q_alpha"),
      round(avg(when(col("_r") <= q, 1.0).otherwise(0.0)), roundTo)
        .as("coverage"))
  }

  /** Reliability (calibration) bins at FIXED weights: score p = σ(m),
    * bin into `bins` equal-width probability bins (floor(p·bins),
    * top-clamped), and report each bin's size, mean predicted p and
    * observed positive rate — the curve that says whether 0.8 means
    * 80%. One scan, one small keyed aggregation; a well-calibrated
    * model puts mean_pred ≈ obs_rate per bin.
    */
  def calibrationBins(df: DataFrame, xCols: Seq[String], yCol: String,
      w: Array[Double], bins: Int = 10, roundTo: Int = 6): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-margin(w, xCols)))
    df.select(p.as("_p"), col(yCol).cast("double").as("_y"))
      .withColumn("_bin",
        least(floor(col("_p") * bins).cast("int"), lit(bins - 1)))
      .groupBy(col("_bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg("_p"), roundTo).as("mean_pred"),
        round(sum("_y") / count(lit(1)), roundTo).as("obs_rate"))
  }
}

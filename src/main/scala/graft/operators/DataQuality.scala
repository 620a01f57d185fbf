package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality audit over DataFrames — the scale-out form of
  * the reference's statistics introspection surface
  * (`/root/reference/core/management/commands/inspect_table.py:101-145`
  * probes COUNT/DISTINCT/MIN/MAX/AVG per table; a fabric at 100 TB needs
  * the same probes as CHECKS with pass thresholds, not printouts).
  *
  * Design: every check on one table folds into a SINGLE aggregate pass
  * (completeness, uniqueness, accepted-values, and range checks are all
  * expressible as aggregates over one scan), so auditing a table costs
  * one job regardless of how many checks it carries. Referential checks
  * are the exception — they need the two-table join, shuffled on the key.
  * Results are a uniform (check_type, target, value, pass) relation, so
  * audits compose with plain unions and land in any sink.
  */
object DataQuality {

  /** One single-pass check: `value` must be an aggregate expression. */
  final case class Check(checkType: String, target: String, value: Column,
      threshold: Double = 1.0)

  /** Fraction of rows with `c` non-null. */
  def completeness(c: Column): Column =
    avg(when(c.isNotNull, 1.0).otherwise(0.0))

  /** Distinct values per row — 1.0 iff the column is a key. */
  def uniqueness(c: Column): Column =
    count_distinct(c).cast("double") / count(lit(1))

  /** Fraction of rows satisfying `pred` (null counts as failing). */
  def satisfaction(pred: Column): Column =
    avg(when(pred, 1.0).otherwise(0.0))

  /** Run all `checks` against `df` in one aggregate job; emits
    * (check_type, target, value, pass).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.value, 6).as(s"_v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.checkType).as("check_type"), lit(c.target).as("target"),
        col(s"_v$i").as("value"), (col(s"_v$i") >= c.threshold).as("pass"))
    }
    row.select(explode(array(out: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity check: fraction of `child` rows whose
    * `childKey` exists in `parent.parentKey` — one left join against the
    * deduplicated parent keys (no row multiplication), averaged in the
    * same pass. Nulls in the child key count as orphans — if nullable
    * FKs are legal, filter first.
    */
  def referential(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      target: String, threshold: Double = 1.0): DataFrame = {
    val keys = parent.select(col(parentKey)).distinct()
    child.join(keys, col(childKey) === col(parentKey), "left_outer")
      .agg(round(satisfaction(col(parentKey).isNotNull), 6).as("value"))
      .select(
        lit("referential").as("check_type"), lit(target).as("target"),
        col("value"), (col("value") >= threshold).as("pass"))
  }

  /** k-anonymity report over quasi-identifier columns: a dataset is
    * k-anonymous when every combination of quasi-identifiers (the columns
    * an adversary could link on — location, segment, birth year…) is
    * shared by at least k records. One row: the achieved k (smallest
    * equivalence class), class counts below the target, the records that
    * suppression would cost, and the post-suppression audit (survivor
    * count + the floor the survivors achieve — [[kAnonymize]]'s survivors
    * are by construction exactly the rows in classes ≥ k, so the
    * enforcement outcome falls out of the same aggregate).
    *
    * Scale: one partial-aggregated groupBy on the quasi-identifier key
    * builds the class sizes; the report is a second, class-count-sized
    * aggregate. One shuffle total, no joins, nothing driver-side.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    val classes = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      min("_n").as("k_anonymity"),
      sum(when(col("_n") < k, 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("_n") < k, col("_n")).otherwise(0L))
        .as("records_suppressed"),
      coalesce(sum(when(col("_n") >= k, col("_n"))), lit(0L))
        .as("n_survivors"),
      min(when(col("_n") >= k, col("_n"))).as("survivor_k_anonymity"))
  }

  /** l-diversity report: k-anonymity's necessary complement — a class of
    * k look-alike records still leaks the sensitive attribute if all k
    * share the same value. A dataset is l-diverse when every
    * quasi-identifier class carries at least l DISTINCT sensitive
    * values. Same single-groupBy shape as [[kAnonymity]], with a
    * distinct-count per class riding the same shuffle.
    */
  def lDiversity(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      l: Int): DataFrame = {
    val classes = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        countDistinct(col(sensitive)).as("_l"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      min("_l").as("l_diversity"),
      sum(when(col("_l") < l, 1L).otherwise(0L)).as("classes_below_l"),
      sum(when(col("_l") < l, col("_n")).otherwise(0L))
        .as("records_at_risk"))
  }

  /** t-closeness report (Li et al. 2007): l-diversity's refinement — a
    * class can hold l distinct sensitive values and still leak if its
    * value DISTRIBUTION diverges from the table's. Distance is total
    * variation: 0.5·Σ|p_v − q_v| over the sensitive domain, where p is
    * the class distribution and q the global one. Values ABSENT from a
    * class contribute Σ_absent q_v = 1 − Σ_present q_v, so the whole
    * distance folds over only the (class × present-value) cells —
    * nothing materializes the full class × domain cross product.
    *
    * Scale shape: ONE aggregation to (quasi-id, value) cell grain does
    * all the heavy lifting; the class totals, per-value totals, and
    * grand total are windows over that cell set, which is bounded by
    * |classes| × |domain| — orders of magnitude below row count — so
    * even the partition-less grand-total window is a few thousand rows
    * on one partition, never row-scale data.
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qi = quasiIds.map(col)
    val cells = df.groupBy((quasiIds :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("_nc"))
    val scored = cells
      .withColumn("_ncl", sum("_nc").over(Window.partitionBy(qi: _*)))
      .withColumn("_nv", sum("_nc").over(Window.partitionBy(col(sensitive))))
      .withColumn("_nt", sum("_nc").over(Window.partitionBy()))
      .withColumn("_p", col("_nc") / col("_ncl"))
      .withColumn("_q", col("_nv") / col("_nt"))
    val classes = scored.groupBy(qi: _*)
      .agg((lit(0.5) * (sum(abs(col("_p") - col("_q")))
          + lit(1.0) - sum(col("_q")))).as("_d"),
        max("_ncl").as("_n"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      round(max("_d"), 6).as("t_closeness"),
      sum(when(col("_d") > t, 1L).otherwise(0L)).as("classes_above_t"),
      sum(when(col("_d") > t, col("_n")).otherwise(0L)).as("records_at_risk"))
  }

  /** Differentially-private histogram via the Laplace mechanism (Dwork
    * et al. 2006): per-group counts plus Laplace(1/eps) noise —
    * count queries have sensitivity 1, so scale b = 1/eps gives
    * eps-DP. The noise draw is DERIVED, not sampled: a uniform in
    * (−0.5, 0.5) comes from the md5 of salt+group-key (md5 is the one
    * hash portable across engines), pushed through the Laplace inverse
    * CDF −b·sign(u)·ln(1−2|u|). Seeded noise keeps the release
    * reproducible across reruns AND lets an external oracle re-derive
    * the exact same noisy counts — the release pipeline equivalent of a
    * fixed RNG seed, with the salt playing the key role (rotate it per
    * release; a fixed public salt would let noise be stripped).
    *
    * Scale shape: one groupBy; the noise is a per-GROUP scalar
    * expression on the aggregated (tiny) result — zero extra passes.
    */
  def dpNoisyCount(df: DataFrame, key: String, eps: Double,
      salt: String): DataFrame = {
    // first 48 md5 bits as an exact double in [0,1) — 2^48 fits a
    // double's mantissa, so the string→long→double chain is lossless
    val u = (conv(substring(md5(concat(lit(salt + ":"), col(key))), 1, 12),
      16, 10).cast("double") / lit(281474976710656.0)) - 0.5
    val noise = (lit(-1.0 / eps) * signum(u)
      * log(lit(1.0) - lit(2.0) * abs(u)))
    df.groupBy(col(key))
      .agg(count(lit(1)).as("_n"))
      .select(col(key), round(col("_n") + noise, 4).as("n_noisy"))
  }

  /** ε-DP released MEAN via the clip-then-Laplace mechanism — the
    * release pattern for numeric aggregates: each value is clipped to
    * [lo, hi] (bounding one record's influence), the group SUM gets
    * Laplace((hi−lo)/ε) noise, and the mean divides by the exact count
    * (released separately in practice; exact here keeps the audit
    * readable). Values arrive as exact integer cents so the true sums
    * carry no float slack; the noise uniform is the same reproducible
    * 48-bit md5 construction as [[dpNoisyCount]].
    *
    * The DEFAULT output is release-safe: (key, noisy_mean) only. Pass
    * `audit = true` to additionally emit the exact `n` and
    * `clipped_mean` — publishing those alongside the noisy value leaks
    * the true statistic and voids the ε guarantee, so they exist only
    * for calibration audits, never for release. The uniform is clamped
    * away from −0.5 (where log(1−2|u|) → −∞): |u| caps at 0.5 − 1e-12,
    * bounding |noise| at ~27.6·b instead of infinity.
    */
  def dpNoisyMean(df: DataFrame, key: String, centsCol: Column,
      clipLoCents: Long, clipHiCents: Long, eps: Double,
      salt: String, audit: Boolean = false): DataFrame = {
    val u = (conv(substring(md5(concat(lit(salt + ":"), col(key))), 1, 12),
      16, 10).cast("double") / lit(281474976710656.0)) - 0.5
    val ua = least(abs(u), lit(0.5 - 1e-12))
    val b = ((clipHiCents - clipLoCents) / 100.0) / eps
    val noise = lit(-b) * signum(u) * log(lit(1.0) - lit(2.0) * ua)
    val clipped = greatest(least(centsCol, lit(clipHiCents)),
      lit(clipLoCents))
    val agg = df.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(clipped).as("_sc"))
    val noisyMean =
      round((col("_sc").cast("double") / 100.0 + noise) / col("n"), 6)
        .as("noisy_mean")
    if (audit)
      agg.select(col(key), col("n"),
        round(col("_sc").cast("double") / 100.0 / col("n"), 6)
          .as("clipped_mean"),
        noisyMean)
    else agg.select(col(key), noisyMean)
  }

  /** Robust outlier report via the modified z-score (Iglewicz & Hoaglin
    * 1993): 0.6745·|x − median| / MAD > threshold. Median and MAD resist
    * the very outliers a mean/stddev rule would absorb — the right gate
    * for heavy-tailed pipeline metrics, complementing
    * [[graft.operators.Scale.winsorize]] (which caps; this one counts
    * and flags).
    *
    * Exact medians need a sort, so this is inherently two aggregation
    * passes plus the scoring scan; each scalar rides back via a one-row
    * broadcast, never a shuffle of the data itself.
    */
  def madOutlierReport(df: DataFrame, valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    val x = col(valueCol)
    val med = df.agg(percentile(x, lit(0.5)).as("_med"))
    val mad = df.crossJoin(broadcast(med))
      .groupBy("_med")
      .agg(percentile(abs(x - col("_med")), lit(0.5)).as("_mad"))
    val z = lit(0.6745) * abs(x - col("_med")) / col("_mad")
    df.crossJoin(broadcast(mad))
      .groupBy("_med", "_mad")
      .agg(count(lit(1)).as("n"),
        sum(when(z > threshold, 1L).otherwise(0L)).as("n_outliers"),
        round(avg(when(z > threshold, 1.0).otherwise(0.0)), 6)
          .as("outlier_frac"))
      .select(round(col("_med"), 4).as("median"),
        round(col("_mad"), 4).as("mad"),
        col("n"), col("n_outliers"), col("outlier_frac"))
  }

  /** Shuffle-planning skew audit over a prospective partitioning key:
    * per-key multiplicities → one-row report with the exact max/top-1%
    * concentration shares and the exact Gini coefficient of the key
    * distribution. The operator a 100 TB job runs BEFORE choosing a
    * shuffle key — a max_share near 1/parallelism or a high Gini says
    * "salt this key" (see [[Scale.saltedJoin]]) long before one reducer
    * proves it the slow way.
    *
    * Scale shape: Gini and top-share are order statistics, but NO global
    * per-key sort happens — per-key counts collapse to a count-of-counts
    * table (one row per DISTINCT multiplicity, bounded by the max
    * multiplicity, tiny in practice), and rank-block algebra over that
    * table reproduces the sorted-rank sums exactly: keys tied at
    * multiplicity c occupy a consecutive rank block, and sum(rank*c)
    * over a block is c * (m*cum_before + m*(m+1)/2) — invariant to
    * tie order. All sums are integer-exact; the only floating point is
    * the final three divisions, so the report is bit-deterministic.
    */
  /** Functional-dependency audit for one candidate `lhs → rhs`: does each
    * lhs value determine a single rhs value, and if not, how far off is
    * the data? `g1_rows` is the classic g1 error from the FD-discovery
    * literature (TANE-family profilers) — the minimum number of rows to
    * delete so the FD holds exactly, N − Σ_lhs max_rhs count — computed
    * as two keyed hash aggregations on the lhs key, never a pairwise
    * comparison, so the shape is two shuffles regardless of table size.
    */
  def fdAudit(df: DataFrame, name: String, lhs: Column, rhs: Column): DataFrame =
    df.groupBy(lhs.as("_l"), rhs.as("_r")).agg(count(lit(1)).as("_c"))
      .groupBy("_l").agg(sum("_c").as("_tot"), max("_c").as("_mx"),
        count(lit(1)).as("_nrhs"))
      .agg(count(lit(1)).as("lhs_groups"),
        sum(when(col("_nrhs") > 1, 1L).otherwise(0L)).as("violating_groups"),
        sum(col("_tot") - col("_mx")).as("g1_rows"))
      .select(lit(name).as("fd"), col("lhs_groups"),
        col("violating_groups"), col("g1_rows"))

  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val perKey = df.groupBy(col(keyCol).as("_key"))
      .agg(count(lit(1)).as("_c"))
    // count-of-counts: _c -> how many keys carry that multiplicity
    val byVal = perKey.groupBy("_c").agg(count(lit(1)).as("_m"))
    // the global window spans one row per distinct multiplicity — a
    // bounded relation (cf. the events_rolling_dau precedent), so the
    // single-partition window is benign by construction
    val wAsc = Window.orderBy(col("_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy(col("_c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = byVal
      .withColumn("_cumAsc", sum("_m").over(wAsc))
      .withColumn("_cumDesc", sum("_m").over(wDesc))
    val stats = annotated.agg(
      sum("_m").as("n_keys"),
      sum(col("_m") * col("_c")).as("n_rows"),
      max("_c").as("max_c"),
      // sum over keys of rank*count via per-block closed form
      sum(col("_c") * ((col("_cumAsc") - col("_m")) * col("_m")
        + col("_m") * (col("_m") + 1) / 2)).as("_rankSum"))
    val k1 = stats.select(ceil(col("n_keys") * 0.01).cast("long").as("_k1"))
    // top-1% concentration: walk the descending cum table and take
    // c * min(m, remaining-budget) per block — ties all share c, so any
    // subset of a partially-taken block sums identically
    val topc = annotated.crossJoin(broadcast(k1))
      .agg(sum(col("_c") * greatest(lit(0L),
        least(col("_m"), col("_k1") - (col("_cumDesc") - col("_m")))))
        .as("_topc"))
    stats.crossJoin(broadcast(topc)).crossJoin(broadcast(k1)).select(
      col("n_keys"), col("n_rows"), col("max_c"),
      round(col("n_rows").cast("double") / col("n_keys"), 4).as("avg_c"),
      round(col("max_c").cast("double") / col("n_rows"), 6).as("max_share"),
      round(col("_topc").cast("double") / col("n_rows"), 6)
        .as("top1pct_share"),
      round(lit(2.0) * col("_rankSum")
          / (col("n_keys").cast("double") * col("n_rows"))
        - (col("n_keys") + lit(1L)).cast("double") / col("n_keys"), 6)
        .as("gini"))
  }

  /** Enforce k-anonymity by suppression: drop every row whose
    * quasi-identifier class has fewer than k members (the standard
    * minimum-cost cut when generalization hierarchies aren't available).
    * The surviving-class key set flows through a semi join on the
    * quasi-identifier key — suppressed rows never shuffle anywhere.
    */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    val keep = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= k)
      .select(quasiIds.map(col): _*)
    df.join(keep, quasiIds, "left_semi")
  }
}

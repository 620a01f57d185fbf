package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

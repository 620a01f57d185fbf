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
}

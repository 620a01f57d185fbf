package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row with
  * the same key whose time is the latest not after (backward) or earliest
  * not before (forward) the left row's time.
  *
  * The reference delegates all relational work to an RDBMS with no as-of
  * capability (`/root/reference/core/ai_query_generator.py:315-323`); this
  * is a rebuild extension for the event-attribution shapes a training-data
  * pipeline needs (e.g. purchase → most recent prior click).
  *
  * Scale design: implemented as a union + ONE window pass — a single
  * shuffle on the key, linear per-partition state, and no candidate-pair
  * blow-up. The naive range self-join (`l.user = r.user && r.ts <= l.ts`
  * plus a max() re-aggregation) shuffles both sides too, but then
  * materializes every (left, earlier-right) pair before collapsing: a user
  * with n left and m right rows costs O(n·m) intermediate rows vs O(n+m)
  * here. Skewed keys degrade to a bigger sort, not a quadratic join.
  */
object AsofJoin {

  /** For each row of `left`, attach the latest `right` row with equal `on`
    * keys and `right.timeCol <= left.timeCol` (strictly `<` never applies:
    * at equal times the right row wins, matching SQL `ASOF ... ON l.t >=
    * r.t`). Unmatched left rows keep nulls.
    *
    * @param rightCols right-side payload columns to carry (the right
    *   `timeCol` is always carried as `<prefix><timeCol>`)
    * @param prefix    prepended to every carried right column name
    * @param toleranceMs if set, matches older than this many milliseconds
    *   before the left time are nulled out (`timeCol` must be a timestamp)
    * @note both inputs must contain `on` ++ `timeCol`; `left` must not
    *   already contain the prefixed output names
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "r_",
      toleranceMs: Option[Long] = None): DataFrame =
    joined(left, right, on, timeCol, rightCols, prefix, toleranceMs, forward = false)

  /** Mirror image: the earliest right row with `right.timeCol >=
    * left.timeCol` (equal times match). Same contract otherwise.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "r_",
      toleranceMs: Option[Long] = None): DataFrame =
    joined(left, right, on, timeCol, rightCols, prefix, toleranceMs, forward = true)

  private def joined(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String,
      toleranceMs: Option[Long],
      forward: Boolean): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    // Right rows shrink to key + time + payload struct before the shuffle;
    // the payload leads with the right time so same-time right rows order
    // deterministically (struct comparison is lexicographic).
    val pay = struct((timeCol +: rightCols).map(right(_)): _*)
    val r = right.select(
      on.map(col) ++ Seq(col(timeCol), pay.as("_asof_pay")): _*)
    val u = left.unionByName(r, allowMissingColumns = true)

    // Right rows must sort before left rows at equal time so "not after"
    // includes "at": nulls in _asof_pay mark left rows, and `false < true`
    // puts payload-bearing rows first under ascending isNull.
    val time = if (forward) col(timeCol).desc else col(timeCol).asc
    val payOrd = if (forward) col("_asof_pay").desc else col("_asof_pay").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(time, col("_asof_pay").isNull.asc, payOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("_asof_pay"), ignoreNulls = true).over(w)

    val withMatch = u
      .withColumn("_asof_m", matched)
      .filter(col("_asof_pay").isNull) // keep only left rows
      .drop("_asof_pay")
    val bounded = toleranceMs match {
      case Some(ms) =>
        val gap =
          if (forward) unix_millis(col("_asof_m").getField(timeCol)) - unix_millis(col(timeCol))
          else unix_millis(col(timeCol)) - unix_millis(col("_asof_m").getField(timeCol))
        withMatch.withColumn("_asof_m", when(gap <= ms, col("_asof_m")))
      case None => withMatch
    }
    val carried = (timeCol +: rightCols).map(c =>
      bounded.col("_asof_m").getField(c).as(prefix + c))
    bounded.select(left.columns.map(col) ++ carried: _*)
  }
}

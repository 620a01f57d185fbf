package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates beyond the built-in HLL++ /
  * t-digest pair (`agg_approx_distinct` / `agg_approx_percentile`): the
  * reference delegates all aggregation to PostgreSQL (SURVEY.md §4), so
  * these are pure 100 TB-scale extensions — summaries that merge
  * associatively across partitions with FIXED memory, the only shapes that
  * survive when a groupBy key set no longer fits a shuffle.
  */
object Sketches {

  /** Heavy hitters over a long-typed key WITHOUT a groupBy shuffle: a
    * Misra–Gries style candidate pass (`stat.freqItems` — guaranteed
    * superset of every item with frequency > `support`·n) plus a
    * count-min sketch pass for the counts. Both are treeAggregate
    * reductions of fixed-size partition summaries; nothing wide moves.
    *
    * The estimates are one-sided: est ≥ true, and est ≤ true + eps·n with
    * probability `confidence` — the standard CMS contract. At 100 TB this
    * answers "which tenants/tokens/keys dominate" for the cost of two
    * narrow scans, where the exact groupBy would shuffle the full key
    * stream.
    *
    * Output: (item: Long, est: Long), one row per candidate, sorted by
    * item. Deterministic for a fixed seed and input.
    */
  def heavyHitters(
      df: DataFrame,
      colName: String,
      support: Double = 0.01,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.stat.freqItems(Array(colName), support)
      .head().getSeq[Long](0)
    val cms = df.stat.countMinSketch(col(colName), eps, confidence, seed)
    candidates.map(i => i -> cms.estimateCount(i))
      .sortBy(_._1).toDF("item", "est")
  }

  /** EXACT heavy hitters in two narrow passes: the same Misra–Gries
    * candidate sketch (≤ 1/support driver-side rows, no shuffle), then an
    * exact recount of ONLY the candidates through a pushed-down IN filter
    * and a tiny groupBy (≤ 1/support distinct keys survive the filter, so
    * the shuffle carries per-partition partials of a few hundred keys,
    * not the full key stream). Because `freqItems` guarantees no false
    * negatives above the support threshold, filtering the recount at
    * count > support·n yields exactly the true heavy-hitter set with
    * exact counts — sketch speed, exact answer, fully oracle-checkable.
    *
    * Output: (item: Long, cnt: Long), one row per true heavy hitter,
    * sorted by item.
    */
  def heavyHittersExact(
      df: DataFrame,
      colName: String,
      support: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val candidates = df.stat.freqItems(Array(colName), support)
      .head().getSeq[Long](0)
    df.filter(col(colName).isin(candidates: _*))
      .groupBy(col(colName).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(support) * n)
      .orderBy("item")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Skew- and locality-management utilities for 100 TB joins — the knobs a
  * declarative plan can't always reach:
  *
  *   - salting: when one join key is hot enough that AQE's skew-join split
  *     (which only splits the PROBE side's partitions) still leaves a
  *     straggler, spread the hot key across `factor` synthetic sub-keys.
  *   - bucketing: pre-shuffle a fact table once at write time so every
  *     subsequent equi-join on the bucket key runs exchange-free.
  */
object Scale {

  /** Inner/left equi-join with the left (large, possibly skewed) side
    * salted: every left row gets one of `factor` salt values, and the
    * right side is replicated to all `factor` salts, so a hot key's rows
    * fan out over `factor` reducers instead of one. Results are
    * row-identical to the unsalted join.
    *
    * The salt must be independent of the join keys (same-key rows need to
    * SPREAD) — a per-row id, not a key hash. The right side is typically
    * the smaller input: replication costs `factor` × |right| shuffle rows.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val l = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase aggregation for holistic aggregates over skewed keys:
    * partial-aggregate on (keys, salt), then merge per key. Algebraic
    * aggregates (sum/count/min/max/avg) don't need this — Spark's
    * map-side partial aggregation already absorbs their skew — but
    * collect-like or distinct-heavy aggregations reduce on a single key
    * otherwise. The caller supplies both phases.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      factor: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Write `df` as a bucketed (and per-bucket sorted) datasource table:
    * one shuffle now, zero exchanges for every later equi-join or
    * aggregation on `keys` between tables bucketed the same way.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val sorted = if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w
    sorted.saveAsTable(table)
  }
}

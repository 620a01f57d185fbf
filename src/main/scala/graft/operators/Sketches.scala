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

  /** Default CMS hash family: (a, b) rows of h(x) = ((a·xᵣ + b) mod p)
    * mod width over the REDUCED key xᵣ = x mod p mapped into [0, p)
    * first — so negative keys land in-range and a·xᵣ tops out at
    * ~2.1×10¹⁵, never wrapping a 64-bit long (raw a·x wraps past
    * |x| ≈ 9×10¹², silently in Java, as an ERROR in DuckDB BIGINT).
    * p = 2³¹−1 (Mersenne), large primes for a, distinct b — the
    * standard universal family over long keys, and pure integer
    * arithmetic any SQL engine replays bit-for-bit for ANY long key.
    */
  val DefaultCmsHashes: Seq[(Long, Long)] =
    Seq((1000003L, 17L), (999983L, 911L), (1000033L, 3571L),
      (1000037L, 7919L))
  val CmsPrime: Long = 2147483647L

  /** x mod p mapped into [0, p) — `pmod`, spelled so the oracle replay
    * is plain portable SQL: ((x % p) + p) % p. */
  private def reduced(keyCol: String, p: Long) =
    ((col(keyCol) % p + p) % p)

  private def bucketStructs(keyCol: String, width: Int,
      hashes: Seq[(Long, Long)], p: Long) = {
    val xr = reduced(keyCol, p)
    hashes.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("i"),
        (((lit(a) * xr + lit(b)) % p) % width).as("bucket"))
    }
  }

  /** RELATIONAL count-min sketch build over a long key: the sketch is a
    * (row, bucket)-keyed relation of depth·width cells produced by ONE
    * hash aggregation — the explode emits depth rows per input row and
    * map-side combine collapses each partition to ≤ depth·width partial
    * cells before the shuffle, so the wire cost is the sketch size, not
    * the data. Unlike [[heavyHitters]]'s driver-side sketch object, the
    * cells stay a DataFrame: they merge associatively across sources
    * (union → re-aggregate), persist like any table, and every estimate
    * is replayable by a SQL oracle because the hash family is plain
    * integer arithmetic.
    */
  def countMinCells(df: DataFrame, keyCol: String, width: Int = 256,
      hashes: Seq[(Long, Long)] = DefaultCmsHashes,
      p: Long = CmsPrime): DataFrame =
    df.select(explode(array(
        bucketStructs(keyCol, width, hashes, p): _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates from [[countMinCells]]: est(k) = minᵢ cells[i, hᵢ(k)]
    * — the classic one-sided CMS read (est ≥ true count). Probe keys
    * must occur in the sketched data (their cells then exist by
    * construction); the probe side explodes its depth buckets and joins
    * the cell relation on the (row, bucket) key.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, keyCol: String,
      width: Int = 256, hashes: Seq[(Long, Long)] = DefaultCmsHashes,
      p: Long = CmsPrime): DataFrame =
    probes.select(col(keyCol),
        explode(array(bucketStructs(keyCol, width, hashes, p): _*)).as("c"))
      .select(col(keyCol), col("c.i").as("i"), col("c.bucket").as("bucket"))
      .join(cells, Seq("i", "bucket"))
      .groupBy(keyCol)
      .agg(min("cnt").as("cms_est"))

  /** RELATIONAL Bloom filter build: the filter is the distinct set of
    * set-bit positions from k = |hashes| integer-arithmetic hashes into
    * an m-bit space — a relation, not a bitmap object, so it merges by
    * union, persists like any table, and (unlike the built-in
    * `stat.bloomFilter` object) every membership decision is replayable
    * by a SQL oracle. Build cost: one explode + distinct on the
    * position key (≤ k·|keys| rows, collapsed map-side).
    */
  def bloomBits(df: DataFrame, keyCol: String, mBits: Int = 1024,
      hashes: Seq[(Long, Long)] = DefaultCmsHashes.take(3),
      p: Long = CmsPrime): DataFrame =
    df.select(explode(array(hashes.map { case (a, b) =>
        ((lit(a) * reduced(keyCol, p) + lit(b)) % p) % mBits
      }: _*)).as("pos")).distinct()

  /** Membership probe against [[bloomBits]]: a key is positive iff ALL
    * k of its positions are set (per-hash, not distinct — two hashes
    * agreeing on a position must both count). One explode + one
    * position-keyed left join + one key-keyed min. Output:
    * (keyCol, bloom_positive).
    */
  def bloomProbe(bits: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int = 1024,
      hashes: Seq[(Long, Long)] = DefaultCmsHashes.take(3),
      p: Long = CmsPrime): DataFrame =
    probes.select(col(keyCol), explode(array(hashes.map { case (a, b) =>
        ((lit(a) * reduced(keyCol, p) + lit(b)) % p) % mBits
      }: _*)).as("pos"))
      .join(bits.withColumn("_hit", lit(1)), Seq("pos"), "left_outer")
      .groupBy(keyCol)
      .agg((min(coalesce(col("_hit"), lit(0))) === 1).as("bloom_positive"))

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

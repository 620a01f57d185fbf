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

  /** Left-side equi-join salting: every left row gets one of `factor`
    * salt values, and the right side is replicated to all `factor` salts,
    * so a hot key's rows fan out over `factor` reducers instead of one.
    * Results are row-identical to the unsalted join.
    *
    * Only left-preserving join types are sound: with the right side
    * replicated, an unmatched right row would survive `factor` times
    * under right/full outer joins, so those are rejected.
    *
    * The salt must be independent of the join KEYS (same-key rows need to
    * SPREAD) but stable under recomputation — a stage retry that re-salts
    * a row differently loses it from the reducer other tasks already
    * fetched. Hashing the whole row is both: deterministic per row
    * content, uncorrelated with the key. (Fully identical duplicate rows
    * share a salt and don't spread — dedup first if that's the corpus.)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val leftPreserving = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti", "cross")
    require(leftPreserving.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin replicates the right side; '$joinType' would multiply " +
        "unmatched right rows — use the plain join for right/full outer")
    val l = left.withColumn("_salt", rowSalt(left, factor))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Deterministic per-row salt in [0, factor): xxhash64 of every column. */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(factor.toLong)).cast("int")

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
    df.withColumn("_salt", rowSalt(df, factor))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Write `df` as a bucketed (and per-bucket sorted) datasource table:
    * one shuffle now, zero exchanges for every later equi-join or
    * aggregation on `keys` between tables bucketed the same way.
    */
  /** Rank-indexed view of one numeric column under a deterministic total
    * order: the (global rank → value) pairs of a TeraSort-style range
    * exchange, persisted so SEVERAL order-statistics consumers
    * (quantiles, equi-depth histograms, winsorization cuts) share ONE
    * sort of the data instead of each paying a full
    * `orderBy…zipWithIndex` pass. Only the probed ranks' values ever
    * reach the driver.
    *
    * The value is cast to double and NULL/NaN rows are dropped before
    * the sort (the `quantile_cont` population), so DecimalType money
    * columns are safe. `tieCols` extend the order to a total one when
    * the consumer's bucket ASSIGNMENT must be deterministic (NTILE); the
    * rank→value mapping itself is tie-break-invariant, so quantile reads
    * are correct with or without them.
    */
  final class RankedValues private[operators] (
      private[operators] val rdd: org.apache.spark.rdd.RDD[(Long, Double)],
      val n: Long) {

    def valuesAt(ranks: Set[Long]): scala.collection.Map[Long, Double] =
      if (ranks.isEmpty) scala.collection.Map.empty
      else rdd.filter { case (i, _) => ranks.contains(i) }.collectAsMap()

    /** `quantile_cont` / ANSI PERCENTILE_CONT: linear interpolation at
      * rank q·(n−1), read as ≤ 2·|qs| bracketing order statistics.
      */
    def quantiles(qs: Seq[Double]): Array[Double] = {
      require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
        "quantiles must lie in [0, 1]")
      if (n == 0) return qs.map(_ => Double.NaN).toArray
      val positions = qs.map(q => q * (n - 1))
      val brackets = valuesAt(positions.flatMap(p =>
        Seq(math.floor(p).toLong, math.ceil(p).toLong)).toSet)
      positions.map { p =>
        val (lo, hi) = (math.floor(p).toLong, math.ceil(p).toLong)
        val (vl, vh) = (brackets(lo), brackets(hi))
        vl + (p - lo) * (vh - vl)
      }.toArray
    }

    /** Exact NTILE-bucket (count, value-sum) pairs over the ranked
      * order — the Lorenz-curve building block. Bucket boundaries use
      * the standard NTILE rule (first n%k buckets take one extra row),
      * so the result matches `NTILE(k) OVER (ORDER BY …)` bit-for-bit.
      * Values are rescaled to exact integer units (`math.rint(v ·
      * unitScale)`) BEFORE summing: the partials are exact integers in
      * doubles, so the distributed reduce is order-independent — the
      * nondeterministic combiner merge order of a float sum can't leak
      * into the result. Returns k collected rows (scalar report state,
      * not data).
      */
    def bucketSums(k: Int, unitScale: Double): Seq[(Int, Long, Double)] = {
      val q = n / k
      val rem = (n % k).toInt
      val cut = rem.toLong * (q + 1)
      def bucketOf(i: Long): Int =
        if (i < cut) (i / (q + 1)).toInt + 1
        else rem + ((i - cut) / q).toInt + 1
      rdd.map { case (i, v) => (bucketOf(i), (1L, math.rint(v * unitScale))) }
        .reduceByKey((a: (Long, Double), b: (Long, Double)) =>
          (a._1 + b._1, a._2 + b._2))
        .collect().sortBy(_._1)
        .map { case (b, (c, s)) => (b, c, s) }.toSeq
    }

    def unpersist(): Unit = { rdd.unpersist(blocking = false); () }
  }

  /** Build a persisted [[RankedValues]] over `df.valueCol` (order extended
    * by `tieCols`). Caller owns the lifetime: call `unpersist()` when the
    * last consumer is done.
    */
  def rankValues(df: DataFrame, valueCol: String,
      tieCols: Seq[String] = Nil): RankedValues = {
    val v = col(valueCol).cast("double")
    val sorted = df
      .select(v.as(valueCol) +: tieCols.map(col): _*)
      .filter(col(valueCol).isNotNull && !col(valueCol).isNaN)
      .orderBy((valueCol +: tieCols).map(col): _*)
      .rdd.map(_.getDouble(0))
      .zipWithIndex().map { case (x, i) => (i, x) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new RankedValues(sorted, sorted.count())
  }

  /** Exact continuous quantiles via a RANGE-PARTITIONED distributed sort
    * plus a global index probe — every stage is cluster-parallel.
    *
    * Spark's built-in exact `percentile` aggregate funnels a
    * value→count map from every partition into ONE final buffer; on a
    * mostly-distinct double column that is an O(n) single-threaded merge
    * and the whole dataset in one executor's memory — the 100 TB
    * anti-pattern. Several quantile reads over the same column should
    * share one [[rankValues]] build instead of calling this repeatedly.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): Array[Double] = {
    val ranked = rankValues(df, valueCol)
    try ranked.quantiles(qs) finally ranked.unpersist()
  }

  /** Winsorization: cap a column at its exact [lo, hi] quantiles — the
    * robust-statistics prep that keeps a handful of outliers from
    * dominating a model's loss or a report's mean. The cuts come from
    * [[exactQuantiles]] (distributed range-sort, never a single-node
    * buffer) and are rounded to `scale` decimals ONCE so both engines
    * compare against identical constants; the capping itself is map-only
    * with the two cuts inlined as literals.
    */
  def winsorize(df: DataFrame, valueCol: String, lo: Double = 0.01,
      hi: Double = 0.99, scale: Int = 2): DataFrame =
    winsorizeAt(df, valueCol, exactQuantiles(df, valueCol, Seq(lo, hi)), scale)

  /** Map-only winsorization against precomputed [lo, hi] cuts (e.g. from
    * a shared [[RankedValues]]), rounded to `scale` decimals once so both
    * engines compare identical constants.
    */
  def winsorizeAt(df: DataFrame, valueCol: String, cuts: Array[Double],
      scale: Int = 2): DataFrame = {
    def r(x: Double) =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    df.withColumn(valueCol + "_w",
      least(greatest(col(valueCol).cast("double"), lit(r(cuts(0)))),
        lit(r(cuts(1)))))
  }

  /** Gini concentration coefficient over an already-ranked value view:
    * with values sorted ascending (0-based ranks i), the closed form is
    *   G = 2·Σ(i+1)·xᵢ / (n·Σxᵢ) − (n+1)/n,
    * i.e. ONE distributed pass of (rank·value, value) partial sums over
    * the shared range sort — no pairwise |xᵢ−xⱼ| expansion (the O(n²)
    * textbook form) and no single-node sort. Values must be
    * non-negative (revenue, counts); returns NaN on an empty or
    * all-zero population.
    */
  def giniFromRanks(ranked: RankedValues): Double = {
    val n = ranked.n
    if (n == 0) return Double.NaN
    val (sumRankVal, sumVal) = ranked.rdd
      .map { case (i, x) => ((i + 1).toDouble * x, x) }
      .treeReduce { case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2) }
    if (sumVal == 0.0) Double.NaN
    else 2.0 * sumRankVal / (n.toDouble * sumVal) - (n + 1).toDouble / n
  }

  /** [[giniFromRanks]] including the sort: one range exchange, one pass. */
  def gini(df: DataFrame, valueCol: String): Double = {
    val ranked = rankValues(df, valueCol)
    try giniFromRanks(ranked) finally ranked.unpersist()
  }

  /** Exact equi-depth (NTILE) histogram over a total order WITHOUT the
    * single-reducer window: an unpartitioned `ntile(k).over(orderBy…)`
    * funnels every row through ONE task's sort — the 100 TB
    * anti-pattern (measured 10.7× growth for 10× data on the replica
    * probe). NTILE's bucket SIZES are pure arithmetic on n (first
    * n mod k buckets take ⌈n/k⌉ rows), so the whole histogram reduces
    * to 2k order statistics: the value at each bucket's first and last
    * rank. Those come from the same TeraSort-style range exchange +
    * zipWithIndex as [[exactQuantiles]] — every stage cluster-parallel,
    * only 2k bracketing values ever reach the driver.
    *
    * `valueCol` (cast to double; NULL/NaN rows dropped) plus `tieCols`
    * must form a total order; output is (bucket, n, lo, hi) with lo/hi
    * rounded to `scale`, bit-identical to the window-NTILE formulation
    * on a NULL-free column.
    */
  def exactNtileHistogram(df: DataFrame, valueCol: String,
      tieCols: Seq[String], k: Int, scale: Int = 2): DataFrame = {
    val ranked = rankValues(df, valueCol, tieCols)
    try ntileHistogramOf(df.sparkSession, ranked, k, scale)
    finally ranked.unpersist()
  }

  /** [[exactNtileHistogram]] over an already-built (shared) ranked view:
    * bucket sizes are pure arithmetic on n, so the histogram is 2k order
    * statistics read straight off the persisted sort.
    */
  def ntileHistogramOf(spark: org.apache.spark.sql.SparkSession,
      ranked: RankedValues, k: Int, scale: Int = 2): DataFrame = {
    val n = ranked.n
    val q = n / k
    val rem = (n % k).toInt
    case class B(b: Int, size: Long, start: Long, end: Long)
    val buckets = (1 to k).map { b =>
      val size = q + (if (b <= rem) 1L else 0L)
      val start = (b - 1) * q + math.min(b - 1, rem)
      B(b, size, start, start + size - 1)
    }.filter(_.size > 0)
    val vals = ranked.valuesAt(
      buckets.flatMap(x => Seq(x.start, x.end)).toSet)
    def r(x: Double) =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    buckets.map(x => (x.b, x.size, r(vals(x.start)), r(vals(x.end))))
      .toDF("bucket", "n", "lo", "hi")
  }

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

  /** Bloom-prefiltered equi-join on a long key: build a Bloom filter over
    * the build side's keys, drop probe rows that can't match BEFORE the
    * probe side's shuffle, then run the exact join. At 100 TB the win is
    * shuffle volume: a selective build side (say 1% of orders) means ~99%
    * of the fact table's bytes never enter the exchange; false positives
    * (rate `fpp`) just ride along and are removed by the join itself, so
    * results are bit-identical to the plain join. This is the manual form
    * of AQE's runtime-filter pushdown, for when the build side isn't a
    * subquery Spark can see through.
    *
    * The filter costs one extra pass over the build side (the aggregate
    * that builds the sketch) and one broadcast of ~`-n·ln(fpp)/ln²2` bits.
    */
  def bloomPrefilteredJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      joinType: String = "inner",
      fpp: Double = 0.01): DataFrame = {
    val expected = math.max(build.count(), 1L)
    val bf = build.stat.bloomFilter(buildKey, expected, fpp)
    val bfBc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bfBc.value.mightContainLong(k))
    probe.filter(mightContain(col(probeKey)))
      .join(build, col(probeKey) === col(buildKey), joinType)
  }

  /** Interval join (value BETWEEN lo AND hi) as an equi-join via binning.
    * Facts hash to bin floor(value/binWidth); each range replicates to
    * every bin it overlaps; the equi-join on the bin key is then verified
    * with the exact predicate. Without this, Spark plans a broadcast
    * nested loop — O(facts × ranges) comparisons — which stops being
    * funny when the ranges side no longer broadcasts. Replication factor
    * per range is span/binWidth + 1, so pick binWidth near the typical
    * range span. Matches `value >= lo AND value < hi` (half-open).
    */
  def binnedRangeJoin(
      facts: DataFrame,
      valueCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val r = ranges.withColumn("_bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    facts.withColumn("_bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(r, Seq("_bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bin")
  }

  /** Morton (Z-order) code of two non-negative integer columns: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Resolves to the
    * native [[graft.functions.MortonInterleave]] expression — a single
    * short codegen'd static call (magic-mask spread), where the composed
    * `bits`-term shift/or Column tree compiled ~2 s of janino/JIT work on
    * first execution. `bits` ≤ 31 keeps the result in a positive long.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    call_function("graft_morton", a.cast("long"), b.cast("long"), lit(bits))
  }

  /** [[mortonCode]] as a composed Column tree of `bits` shift/mask/or
    * terms — the registration-free portable form and the differential
    * partner pinning the native expression bit-for-bit (ScaleSpec).
    */
  def mortonCodeComposed(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order layout write: range-partition and sort by the Morton code of
    * two clustering columns, so parquet row groups carry narrow min/max
    * envelopes on BOTH columns and scans filtering either one skip files.
    * A plain sort clusters only its leading column; the interleaved code
    * buys two-dimensional skipping for one sort.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int): Unit = {
    val z = mortonCode(col(colA), col(colB))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}

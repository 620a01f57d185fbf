package graft

import org.apache.spark.sql.functions._

class ApproxAggSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = engine.Tables.load(spark, sfDir, "lineitem")

  test("approx_count_distinct lands within 5% of the exact count") {
    val (approx, exact) = li.agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.01),
      countDistinct(col("l_partkey"))).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx percentiles bracket the exact ones within 2%") {
    val row = li.agg(
      percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.95)),
        lit(10000)).as("a"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.95)"))
      .as[(Seq[Double], Double, Double)].head()
    val (approx, e50, e95) = row
    assert(math.abs(approx(0) - e50) / e50 < 0.02)
    assert(math.abs(approx(1) - e95) / e95 < 0.02)
  }

  test("distributed exact quantiles equal the built-in exact percentile") {
    val got = graft.operators.Scale.exactQuantiles(
      li, "l_extendedprice", Seq(0.0, 0.25, 0.5, 0.95, 1.0))
    val want = li.agg(
      expr("percentile(l_extendedprice, array(0.0, 0.25, 0.5, 0.95, 1.0))"))
      .as[Seq[Double]].head()
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= math.ulp(w) * 4, s"got $g want $w")
    }
  }

  test("stratified sample hits the requested fraction per stratum") {
    val docs = engine.Tables.load(spark, SparkSuite.sfDir.replace("0.001", "0.01"),
      "documents")
    val fractions = Map("en" -> 0.5, "fr" -> 0.2)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.filter(col("lang").isin(fractions.keys.toSeq: _*))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, f) <- fractions) {
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      // Bernoulli sampling: 3-sigma bound on the observed fraction
      val sigma = math.sqrt(f * (1 - f) / totals(lang))
      assert(math.abs(got - f) < 3 * sigma + 0.02, s"$lang: got $got want $f")
    }
    // strata not in the fraction map never appear
    assert(!sampled.keySet.exists(l => !fractions.contains(l)))
  }

  test("stratified sample is deterministic for a fixed seed") {
    val docs = engine.Tables.load(spark, sfDir, "documents")
    val a = docs.stat.sampleBy("lang", Map("en" -> 0.3), 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = docs.stat.sampleBy("lang", Map("en" -> 0.3), 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("sketch heavy hitters: superset of true heavies, one-sided CMS error") {
    val support = 0.01
    val eps = 0.001
    val n = li.count()
    val truth = li.groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val got = graft.operators.Sketches
      .heavyHitters(li, "l_suppkey", support, eps)
      .as[(Long, Long)].collect().toMap

    // every key with true frequency > support*n must be in the candidates
    val trueHeavies = truth.filter(_._2 > support * n).keySet
    assert(trueHeavies.subsetOf(got.keySet),
      s"missing: ${trueHeavies -- got.keySet}")
    // CMS never undercounts; overcount bounded by eps*n (fixed seed)
    got.foreach { case (k, est) =>
      val exact = truth.getOrElse(k, 0L)
      assert(est >= exact, s"key $k: est=$est < exact=$exact")
      assert(est <= exact + eps * n, s"key $k: est=$est exact=$exact")
    }
  }

  test("sketch heavy hitters output is deterministic for a fixed seed") {
    val a = graft.operators.Sketches.heavyHitters(li, "l_suppkey", 0.005)
      .as[(Long, Long)].collect().toSeq
    val b = graft.operators.Sketches.heavyHitters(li, "l_suppkey", 0.005)
      .as[(Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("unioned daily HLL sketches estimate the period's exact distinct within 5%") {
    val e = engine.Tables.load(spark, sfDir, "events")
    val daily = e.groupBy($"ts".cast("date").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val est = daily.agg(
      hll_sketch_estimate(hll_union_agg($"sk"))).as[Long].head()
    val exact = e.select("user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"estimate $est vs exact $exact")
  }

  test("relational CMS: exact without collisions, one-sided with them") {
    import graft.operators.Sketches
    val data = Seq(1L, 1L, 5L).toDF("k")
    // width 8, identity hash: keys 1 and 5 land in distinct buckets —
    // estimates are exact
    val wide = Sketches.cmsEstimate(
      Sketches.countMinCells(data, "k", width = 8, hashes = Seq((1L, 0L))),
      data.distinct(), "k", width = 8, hashes = Seq((1L, 0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide === Map(1L -> 2L, 5L -> 1L))
    // width 4: 1 and 5 differ by 4, so EVERY (a·x+b) family collides —
    // both estimates become the merged cell count (one-sided overcount)
    val narrow = Sketches.cmsEstimate(
      Sketches.countMinCells(data, "k", width = 4, hashes = Seq((1L, 0L))),
      data.distinct(), "k", width = 4, hashes = Seq((1L, 0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow === Map(1L -> 3L, 5L -> 3L))
  }

  test("CMS/Bloom hash positions stay in-range for negative and huge keys") {
    import graft.operators.Sketches
    // pre-fix, -5 hashed to a NEGATIVE bucket and |x| > ~9e12 wrapped
    // a*x (ANSI Spark throws; DuckDB BIGINT errors) — the reduced-key
    // family must keep every position in [0, width) for any long
    val keys = Seq(-5L, -9999999999999L, 9007199254740993L, 3L).toDF("k")
    val buckets = Sketches.countMinCells(keys, "k", width = 256)
      .select("bucket").as[Long].collect()
    assert(buckets.nonEmpty && buckets.forall(b => b >= 0 && b < 256))
    val bits = Sketches.bloomBits(keys, "k", mBits = 1024)
    assert(bits.as[Long].collect().forall(p => p >= 0 && p < 1024))
    // membership survives the reduced-key family end-to-end
    val probe = Sketches.bloomProbe(bits, keys, "k", mBits = 1024)
    assert(probe.count() === 4 &&
      probe.select("bloom_positive").as[Boolean].collect().forall(identity))
  }

  test("relational Bloom: members always positive; FP rate small when sized") {
    import graft.operators.Sketches
    val members = Seq(1L, 2L, 3L).toDF("k")
    val bits = Sketches.bloomBits(members, "k", mBits = 4096)
    val all = (1L to 50L).toDF("k")
    val r = Sketches.bloomProbe(bits, all, "k", mBits = 4096)
      .collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(r(_))) // no false negatives, ever
    // 9 set bits of 4096: non-members overwhelmingly negative
    assert((4L to 50L).count(r(_)) < 5)
    // a saturated 4-bit filter still never loses a member
    val tinyBits = Sketches.bloomBits(members, "k", mBits = 4)
    val tiny = Sketches.bloomProbe(tinyBits, members, "k", mBits = 4)
      .collect().map(_.getBoolean(1))
    assert(tiny.forall(identity))
  }

  test("relational CMS: depth-min never under-counts and only helps") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(5)
    val keys = Seq.fill(500)(rnd.nextInt(40).toLong)
    val df = keys.toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val probes = df.distinct()
    def est(hs: Seq[(Long, Long)]): Map[Long, Long] =
      Sketches.cmsEstimate(
        Sketches.countMinCells(df, "k", width = 16, hashes = hs),
        probes, "k", width = 16, hashes = hs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d1 = est(Sketches.DefaultCmsHashes.take(1))
    val d4 = est(Sketches.DefaultCmsHashes)
    exact.foreach { case (k, c) =>
      assert(d4(k) >= c, s"under-count at $k")      // one-sided
      assert(d4(k) <= d1(k), s"extra depth hurt $k") // min can only help
    }
  }
}

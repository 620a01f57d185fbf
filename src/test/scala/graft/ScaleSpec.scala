package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Scale

/** Skew/locality utilities: salting must be result-invariant vs the plain
  * join, and bucketed tables must join with zero exchanges.
  */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")
  private lazy val lineitem = Tables.load(spark, sfDir, "lineitem")

  test("saltedJoin(inner) is row-identical to the plain join") {
    val plain = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
    val salted = Scale.saltedJoin(
        lineitem.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        Seq("k"), factor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("layout_graph_edges persisted relations equal their base-table derivations") {
    // the consumers silently switch from deriving to READING these files,
    // so the persisted relations must be row-identical to the derivation
    // (the path carries a version for exactly this invariant)
    val summary = SparkEntry.queries("layout_graph_edges")(spark, sfDir)
      .collect()
    assert(summary.length === 5)
    val base = SparkEntry.edgeIndexPath(sfDir)
    val op = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val cp = op.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(op.select(col("l_orderkey").as("k2"), col("l_partkey").as("dst")),
        col("l_orderkey") === col("k2") && col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val cpRead = spark.read.parquet(s"$base/copurchase")
    assert(cpRead.exceptAll(cp).isEmpty && cp.exceptAll(cpRead).isEmpty)
    val cs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val csRead = spark.read.parquet(s"$base/cust_supp")
    assert(csRead.exceptAll(cs).isEmpty && cs.exceptAll(csRead).isEmpty)
    val cpd = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
      .distinct()
    val cpdRead = spark.read.parquet(s"$base/cust_part")
    assert(cpdRead.exceptAll(cpd).isEmpty && cpd.exceptAll(cpdRead).isEmpty)
    val supRead = spark.read.parquet(s"$base/copurchase_support")
    val sup = graft.operators.Graph.edgeSupport(
      cp.filter(col("n") >= 2).select("src", "dst"), canonicalEdges = true)
    assert(supRead.exceptAll(sup).isEmpty && sup.exceptAll(supRead).isEmpty)
    val supAllRead = spark.read.parquet(s"$base/copurchase_support_all")
    val supAll = graft.operators.Graph.edgeSupport(
      cp.select("src", "dst"), canonicalEdges = true)
    assert(supAllRead.exceptAll(supAll).isEmpty
      && supAll.exceptAll(supAllRead).isEmpty)
    // the triangle census consumer must agree between the index fast
    // path and the live enumeration on the SAME graph
    val fast = graft.operators.Graph.triangleStatsFromSupport(
      cp.select("src", "dst"), supAllRead).collect().toSeq
    val live = graft.operators.Graph.triangleStats(
      cp.select("src", "dst"), canonicalEdges = true).collect().toSeq
    assert(fast === live)
  }

  test("saltedJoin left-outer keeps unmatched left rows exactly once") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq((1, "x")).toDF("k", "w")
    val rows = Scale.saltedJoin(left, right, Seq("k"), factor = 4, joinType = "left")
      .orderBy("k").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(rows(1).isNullAt(2) && rows(2).isNullAt(2))
  }

  test("saltedAggregate(collect-like) equals the single-phase aggregation") {
    val direct = lineitem.groupBy("l_returnflag")
      .agg(sort_array(collect_set("l_linestatus")).as("ls"))
    val salted = Scale.saltedAggregate(
      lineitem, Seq("l_returnflag"), factor = 8,
      partial = Seq(collect_set("l_linestatus").as("_ps")),
      merge = Seq(sort_array(array_distinct(flatten(collect_list("_ps")))).as("ls")))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("saltedJoin rejects right/full outer joins (replication would corrupt them)") {
    val left = Seq((1, "a")).toDF("k", "v")
    val right = Seq((1, "x"), (2, "y")).toDF("k", "w")
    Seq("right", "full", "full_outer").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Scale.saltedJoin(left, right, Seq("k"), factor = 4, joinType = jt)
      }
      assert(e.getMessage.contains("replicates the right side"))
    }
  }

  test("salt is content-deterministic: two independent runs agree exactly") {
    val r1 = Scale.saltedJoin(orders, lineitem.select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"), 8)
      .groupBy("o_orderpriority").count()
    val r2 = Scale.saltedJoin(orders, lineitem.select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"), 8)
      .groupBy("o_orderpriority").count()
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty)
  }

  test("bloomPrefilteredJoin equals the plain join exactly") {
    val build = lineitem.filter($"l_quantity" > 45).select("l_orderkey")
    val plain = orders.join(build, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select("o_orderkey")
    val bloomed = Scale.bloomPrefilteredJoin(orders, build,
        "o_orderkey", "l_orderkey", joinType = "left_semi")
      .select("o_orderkey")
    assert(plain.count() > 0)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("binnedRangeJoin matches the non-equi join; half-open boundaries") {
    val ranges = Seq((0.0, 10.0), (10.0, 25.0), (25.0, 100.0)).toDF("lo", "hi")
    val facts = Seq(0.0, 5.0, 9.999, 10.0, 24.9, 25.0, 99.9, 100.0, 150.0)
      .toDF("v")
    val binned = Scale.binnedRangeJoin(facts, "v", ranges, "lo", "hi", 7.0)
      .select("v", "lo").as[(Double, Double)].collect().toSet
    val naive = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .select("v", "lo").as[(Double, Double)].collect().toSet
    assert(binned === naive)
    assert(!binned.exists(_._1 >= 100.0)) // 100.0 and 150.0 fall outside
  }

  test("mortonCode interleaves bits (matches a reference implementation)") {
    def ref(a: Long, b: Long): Long =
      (0 until 21).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      ((1L << 21) - 1, (1L << 21) - 1))
    val got = cases.toDF("a", "b")
      .select(Scale.mortonCode($"a", $"b").as("z")).as[Long].collect()
    assert(got.toSeq === cases.map { case (a, b) => ref(a, b) })
    // the native expression and the composed shift/or tree are
    // bit-identical twins (including random and mask-boundary inputs)
    val rnd = new scala.util.Random(7)
    val fuzz = Seq.fill(200)((rnd.nextLong().abs & ((1L << 22) - 1),
      rnd.nextLong().abs & ((1L << 22) - 1)))
    val both = (cases ++ fuzz).toDF("a", "b").select(
      Scale.mortonCode($"a", $"b").as("zn"),
      Scale.mortonCodeComposed($"a", $"b").as("zc"))
    assert(both.filter($"zn" =!= $"zc").isEmpty)
    // locality: fixing high bits of both keys bounds the code range
    assert(ref(1L, 1L) === 3L && ref(2L, 2L) === 12L && ref(3L, 3L) === 15L)
  }

  test("writeZOrdered produces files with narrow envelopes on both keys") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      Scale.writeZOrdered(
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice"),
        dir, "l_partkey", "l_suppkey", numFiles = 8)
      val back = spark.read.parquet(dir)
      assert(back.count() === lineitem.count())
      // per-file min/max envelope area must beat an unclustered layout:
      // z-sorted files partition the key plane, so the mean envelope area
      // is a fraction of the full (maxPart × maxSupp) rectangle
      val spans = back
        .select(input_file_name().as("f"), $"l_partkey", $"l_suppkey")
        .groupBy("f")
        .agg(((max("l_partkey") - min("l_partkey")) *
          (max("l_suppkey") - min("l_suppkey"))).as("area"))
        .as[(String, Long)].collect()
      val full = lineitem.agg(
        ((max("l_partkey") - min("l_partkey")) *
          (max("l_suppkey") - min("l_suppkey"))).cast("long")).as[Long].head()
      val meanArea = spans.map(_._2).sum.toDouble / spans.length
      assert(spans.length > 1)
      assert(meanArea < full * 0.5, s"mean envelope $meanArea vs full $full")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4, Seq("o_orderkey"))
      Scale.writeBucketed(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "lineitem_b", Seq("l_orderkey"), 4, Seq("l_orderkey"))
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy("l_orderkey").agg(sum("l_extendedprice").as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(600))
      assert(joined.count() === lineitem.select("l_orderkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("winsorize caps exactly at the rounded quantile cuts") {
    // 1..100: p01 = 1.99, p99 = 99.01 under linear interpolation
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = Scale.winsorize(df, "v", 0.01, 0.99)
    val capped = w.select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(capped(1.0) === 1.99 && capped(100.0) === 99.01)
    assert(capped(2.0) === 2.0 && capped(99.0) === 99.0) // interior untouched
    assert(capped(50.0) === 50.0)
    // capping preserves order statistics' midrange and row count
    assert(w.count() === 100)
    // degenerate range: lo = hi = median caps everything to it
    val all = Scale.winsorize(df, "v", 0.5, 0.5)
      .select("v_w").distinct().as[Double].collect()
    assert(all.toSeq === Seq(50.5))
  }

  test("exactNtileHistogram matches the window-NTILE formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 23 rows into 10 buckets: first 3 buckets take 3 rows, rest take 2 —
    // the uneven-fill case where a size-formula bug would show
    val df = (1 to 23).map(i => (i * 1.5, i.toLong, i)).toDF("v", "k1", "k2")
    val got = Scale.exactNtileHistogram(df, "v", Seq("k1", "k2"), k = 10)
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val w = Window.orderBy("v", "k1", "k2")
    val want = df.withColumn("bucket", ntile(10).over(w))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(min("v"), 2).as("lo"),
        round(max("v"), 2).as("hi"))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === want.toSeq)
    // fewer rows than buckets: NTILE leaves the tail buckets empty
    val tiny = (1 to 4).map(i => (i * 1.0, i.toLong, i)).toDF("v", "k1", "k2")
    val g2 = Scale.exactNtileHistogram(tiny, "v", Seq("k1", "k2"), k = 10)
    assert(g2.count() === 4L)
    assert(g2.agg(sum("n")).head().getLong(0) === 4L)
  }

  test("gini: uniform 1..n hits the closed form, equality is 0, spike is (n-1)/n") {
    // uniform 1..n has G = (n-1)/(3n); n=4 -> 0.25
    val uniform = (1 to 4).map(_.toDouble).toDF("v")
    assert(math.abs(Scale.gini(uniform, "v") - 0.25) < 1e-12)
    // perfectly equal values -> 0 regardless of tie order
    val equalVals = Seq.fill(7)(3.5).toDF("v")
    assert(math.abs(Scale.gini(equalVals, "v")) < 1e-12)
    // all mass on one holder -> (n-1)/n
    val spike = (Seq.fill(9)(0.0) :+ 100.0).toDF("v")
    assert(math.abs(Scale.gini(spike, "v") - 0.9) < 1e-12)
    // empty and all-zero populations are undefined, not garbage
    assert(Scale.gini(Seq.empty[Double].toDF("v"), "v").isNaN)
    assert(Scale.gini(Seq(0.0, 0.0).toDF("v"), "v").isNaN)
  }
}

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
}

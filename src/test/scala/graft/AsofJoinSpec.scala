package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // left: (id, key, ts)   right: (key, ts, rid, v)
  private lazy val left = Seq(
    (1L, "a", ts(1000)),
    (2L, "a", ts(5000)),
    (3L, "b", ts(2000)),
    (4L, "c", ts(9000))).toDF("id", "k", "t")

  private lazy val right = Seq(
    ("a", ts(500), 10L, 1.0),
    ("a", ts(5000), 11L, 2.0), // equal time: must match id=2 (>= semantics)
    ("a", ts(7000), 12L, 3.0),
    ("b", ts(2500), 13L, 4.0)).toDF("k", "t", "rid", "v")

  test("backward picks the latest right row at or before the left time") {
    val out = AsofJoin.backward(left, right, Seq("k"), "t", Seq("rid", "v"))
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> Some(10L), // 500 <= 1000
      2L -> Some(11L), // equal timestamps match
      3L -> None,      // only later right rows for key b
      4L -> None))     // key c has no right rows
  }

  test("forward picks the earliest right row at or after the left time") {
    val out = AsofJoin.forward(left, right, Seq("k"), "t", Seq("rid"))
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> Some(11L), // 5000 is the first >= 1000
      2L -> Some(11L), // equal timestamps match
      3L -> Some(13L), // 2500 >= 2000
      4L -> None))
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsofJoin
      .backward(left, right, Seq("k"), "t", Seq("rid"), toleranceMs = Some(400L))
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(
      1L -> None,      // gap 500 ms > 400 ms
      2L -> Some(11L), // gap 0
      3L -> None, 4L -> None))
  }

  test("carries right payload values and the matched right time") {
    val row = AsofJoin.backward(left, right, Seq("k"), "t", Seq("rid", "v"))
      .filter(col("id") === 2).select("r_t", "r_rid", "r_v")
      .as[(Timestamp, Long, Double)].head()
    assert(row === ((ts(5000), 11L, 2.0)))
  }

  test("matches the naive range-join formulation on the events fixture") {
    val e = engine.Tables.load(spark, sfDir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("cid"))
    val clicks = c.select(col("cu").as("user_id"), col("cts").as("ts"),
      col("cid").as("event_id"))
    val fast = AsofJoin
      .backward(p, clicks, Seq("user_id"), "ts", Seq("event_id"), prefix = "c_")
      .select(col("event_id"), col("c_event_id").as("cid"))
    val naive = p.join(c, p("user_id") === c("cu") && c("cts") <= p("ts"), "left")
      .groupBy(p("event_id"))
      .agg(max(struct(col("cts"), col("cid"))).getField("cid").as("cid"))
    val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
    assert(diff === 0)
  }
}

package graft

import org.apache.spark.sql.Row

import graft.sources.{Formats, Layout}

class FormatsSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("n_nationkey").collect().toSeq

  test("CSV and JSON roundtrips preserve every row and the schema") {
    val nation = engine.Tables.load(spark, sfDir, "nation")
    val csv = Formats.csvRoundtrip(nation, "/tmp/graft_fmt_spec/csv")
    val json = Formats.jsonRoundtrip(nation, "/tmp/graft_fmt_spec/json")
    assert(csv.schema === nation.schema)
    assert(json.schema === nation.schema)
    assert(rows(csv) === rows(nation))
    assert(rows(json) === rows(nation))
  }

  test("day-partitioned write + day read returns exactly that day's events") {
    val events = engine.Tables.load(spark, sfDir, "events")
    Layout.writeDayPartitioned(events, "/tmp/graft_layout_spec")
    val day = "2024-01-03"
    val got = Layout.readDays(spark, "/tmp/graft_layout_spec", Seq(day))
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val want = events
      .filter(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd") === day)
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(want.nonEmpty && got === want)
  }
}

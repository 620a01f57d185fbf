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
    // Spark 4 built-in XML source: same carried-schema contract
    val xml = Formats.xmlRoundtrip(nation, "/tmp/graft_fmt_spec/xml")
    assert(xml.schema === nation.schema)
    assert(rows(xml) === rows(nation))
  }

  test("write-once roundtrips materialize once and read thereafter") {
    val nation = engine.Tables.load(spark, sfDir, "nation")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fmt_once").toString
    val first = Formats.csvWriteOnce(nation, s"$dir/csv")
    assert(first.schema === nation.schema)
    assert(rows(first) === rows(nation))
    // second call must NOT rewrite: every data file keeps its mtime
    val files = new java.io.File(s"$dir/csv").listFiles()
      .filter(_.getName.endsWith(".csv")).map(f => f.getName -> f.lastModified)
    assert(files.nonEmpty)
    val again = Formats.csvWriteOnce(nation, s"$dir/csv")
    assert(rows(again) === rows(nation))
    val filesAfter = new java.io.File(s"$dir/csv").listFiles()
      .filter(_.getName.endsWith(".csv")).map(f => f.getName -> f.lastModified)
    assert(filesAfter.toSeq.sorted === files.toSeq.sorted,
      "second csvWriteOnce rewrote the materialized copy")
    val j1 = Formats.jsonWriteOnce(nation, s"$dir/json")
    val jf = new java.io.File(s"$dir/json").listFiles()
      .filter(_.getName.endsWith(".json")).map(f => f.getName -> f.lastModified)
    val j2 = Formats.jsonWriteOnce(nation, s"$dir/json")
    assert(rows(j1) === rows(nation) && rows(j2) === rows(nation))
    val jfAfter = new java.io.File(s"$dir/json").listFiles()
      .filter(_.getName.endsWith(".json")).map(f => f.getName -> f.lastModified)
    assert(jfAfter.toSeq.sorted === jf.toSeq.sorted)
  }

  test("concurrent write-once callers publish one complete copy (VERDICT r11 #4)") {
    val nation = engine.Tables.load(spark, sfDir, "nation")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fmt_race").toString
    val path = s"$dir/csv"
    // two JVM-threads race the same unpublished fingerprinted path —
    // the temp-sibling + atomic-rename protocol must leave exactly one
    // complete published dir, and both callers must read the full table
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Seq(
      Future(rows(Formats.csvWriteOnce(nation, path))),
      Future(rows(Formats.csvWriteOnce(nation, path))))
    val got = Await.result(Future.sequence(attempts), 300.seconds)
    assert(got.forall(_ === rows(nation)))
    assert(new java.io.File(path, "_GRAFT_DONE").exists(),
      "published dir must carry the graft sentinel")
    // the rename loser must have cleaned up its temp sibling
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.contains(".inprogress."))
    assert(leftovers.isEmpty,
      s"temp dirs left behind: ${leftovers.map(_.getName).mkString(",")}")
    // skip-write must hold WITHOUT Spark's _SUCCESS marker (ADVICE r11:
    // the old check keyed on marksuccessfuljobs and silently degraded
    // to rewrite-every-invocation when that config is off)
    new java.io.File(path, "_SUCCESS").delete()
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv")).map(f => f.getName -> f.lastModified)
    assert(rows(Formats.csvWriteOnce(nation, path)) === rows(nation))
    val filesAfter = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv")).map(f => f.getName -> f.lastModified)
    assert(filesAfter.toSeq.sorted === files.toSeq.sorted,
      "write-once rewrote after _SUCCESS was removed")
    // a stale pre-sentinel dir (only _SUCCESS, e.g. the r11 format) is
    // replaced once, not trusted as published
    val stale = new java.io.File(s"$dir/stale")
    stale.mkdirs()
    new java.io.File(stale, "_SUCCESS").createNewFile()
    new java.io.File(stale, "garbage.csv").createNewFile()
    val migrated = Formats.jsonWriteOnce(nation, stale.getPath)
    assert(rows(migrated) === rows(nation))
    assert(new java.io.File(stale, "_GRAFT_DONE").exists())
    assert(!new java.io.File(stale, "garbage.csv").exists(),
      "stale unpublished dir must be replaced wholesale")
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

  test("compact collapses a small-file explosion into sized files") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val events = engine.Tables.load(spark, sfDir, "events")
    // simulate over-parallel ingest: 64 splits of a 1000-row table
    events.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val before = new java.io.File(s"$base/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected many small files, got $before")
    val after = sources.Layout.compact(spark, s"$base/small", s"$base/big",
      targetRowsPerFile = 500)
    assert(after === 2, s"1000 rows / 500 per file should be 2 files, got $after")
    // content preserved exactly
    val a = spark.read.parquet(s"$base/big").agg(org.apache.spark.sql.functions.sum("event_id")).head().getLong(0)
    val b = events.agg(org.apache.spark.sql.functions.sum("event_id")).head().getLong(0)
    assert(a === b)
  }
}

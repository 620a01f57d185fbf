package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.streaming.EventStream

/** Streaming surface (SURVEY.md §2.9 extension): watermarked windowed aggs
  * over readStream must agree with the batch twin; sessionization must obey
  * the gap invariant.
  */
class EventStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming hourly agg equals the batch twin for watermark-closed windows") {
    awaitDrained(EventStream.startHourlyAgg(spark, sfDir, "hourly_test"))
    val streamed = spark.sql(
      "SELECT window.start AS h, event_type, n FROM hourly_test")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val events = Tables.load(spark, sfDir, "events")
    val maxTs = events.agg(max($"ts")).as[java.sql.Timestamp].head()
    val batch = events
      .groupBy(window($"ts", "1 hour").getField("start").as("h"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // append mode only emits windows the 10-min watermark has closed: the
    // final hour (window end > maxTs − 10 min) legitimately never fires
    val closed = batch.filter { case (h, _, _) =>
      h.getTime + 3600 * 1000 <= maxTs.getTime - 10 * 60 * 1000 }
    assert(streamed.subsetOf(batch), "streamed rows must all match batch")
    assert(closed.subsetOf(streamed), "every closed window must be emitted")
    assert(streamed.nonEmpty)
  }

  test("streaming CMS cells equal the batch-built sketch cell-for-cell") {
    awaitDrained(EventStream.startCmsStream(spark, sfDir, "cms_test"))
    val streamed = spark.table("cms_test")
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.operators.Sketches
      .countMinCells(Tables.load(spark, sfDir, "events"), "user_id")
      .as[(Int, Long, Long)].collect().toSet
    // associative merge: micro-batched accumulation lands on the exact
    // batch cells, so every downstream estimate is identical too
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SRM variant counts equal the batch split exactly") {
    awaitDrained(EventStream.startSrmStream(spark, sfDir, "srm_test"))
    val streamed = spark.table("srm_test")
      .as[(String, Long, Long)].collect().toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("b"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("sessionize: gap > 30 min splits, <= 30 min merges") {
    val base = 1700000000000L
    val events = Seq(
      // user 1: two events 10 min apart (one session), then 40-min gap (new session)
      (1L, new java.sql.Timestamp(base), 1L, "click", 1.0, "{}"),
      (2L, new java.sql.Timestamp(base + 10 * 60 * 1000), 1L, "view", 2.0, "{}"),
      (3L, new java.sql.Timestamp(base + 50 * 60 * 1000), 1L, "click", 4.0, "{}"),
      // user 2: single event
      (4L, new java.sql.Timestamp(base), 2L, "view", 8.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = EventStream.sessionize(spark, events).collect()
      .sortBy(s => (s.user_id, s.start_ms))
    assert(sessions.length === 3)
    val u1 = sessions.filter(_.user_id == 1L)
    assert(u1(0).n_events === 2 && u1(0).total_value === 3.0)
    assert(u1(0).end_ms === base + 10 * 60 * 1000)
    assert(u1(1).n_events === 1 && u1(1).total_value === 4.0)
    assert(sessions.filter(_.user_id == 2L).head.n_events === 1)
  }

  test("transformWithState sessionizer equals the flatMapGroupsWithState one") {
    // the two arbitrary-state APIs must produce the identical session set
    val events = Tables.load(spark, sfDir, "events")
    val a = EventStream.sessionize(spark, events).collect()
      .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events,
        math.round(s.total_value * 100))).sorted.toSeq
    val b = EventStream.sessionizeTws(spark, events).collect()
      .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events,
        math.round(s.total_value * 100))).sorted.toSeq
    assert(a.nonEmpty && a === b)
  }

  test("transformWithState sessionizer streams on RocksDB state and matches batch") {
    // streaming transformWithState requires the RocksDB provider; the
    // fixture is one parquet file -> one micro-batch, so the streamed
    // session set equals the batch one exactly
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      awaitDrained(
        EventStream.startTwsSessionize(spark, sfDir, "tws_stream_test"))
      val streamed = spark.table("tws_stream_test")
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Int)].collect().toSet
      val batch = EventStream
        .sessionize(spark, Tables.load(spark, sfDir, "events")).collect()
        .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events)).toSet
      assert(streamed.nonEmpty && streamed === batch)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("live TWS sessionizer merges across micro-batches and closes on the idle timer") {
    // the ProcessingTime contract: a session spanning micro-batches must be
    // merged in state (never emitted as split partials) and emitted once the
    // key has been idle past the gap — the property TimeMode.None can't give
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("tws_live").toFile.getAbsolutePath
    val srcDir = s"$root/src"; val cpDir = s"$root/cp"
    new java.io.File(srcDir).mkdirs()
    val t0 = 1700000000000L
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ms", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
        .coalesce(1).write.mode("append").parquet(srcDir)
    write(Seq((1L, t0, 1L, "view", 1.0, "{}"), (2L, t0 + 1000, 1L, "view", 2.0, "{}")))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    // NOTE: processAllAvailable() never returns here — with
    // processing-time timers registered, shouldRunAnotherBatch stays
    // true, a batch is always constructed, and the noNewData flag never
    // fires. Poll the progress/sink instead, on a real trigger interval
    // (the empty batches that keep running are what fire the timers).
    val q = EventStream.sessionizeTwsLive(spark, stream, gapMs = 2000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_live_test")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .option("checkpointLocation", cpDir).start()
    def poll(ms: Long)(pred: => Boolean): Boolean = {
      val end = System.currentTimeMillis + ms
      while (System.currentTimeMillis < end && !pred) Thread.sleep(200)
      pred
    }
    def rowsIn = q.recentProgress.map(_.numInputRows).sum
    try {
      assert(poll(60000)(rowsIn >= 2), "batch 1 must be processed")
      assert(spark.table("tws_live_test").count() === 0,
        "open session must be persisted, not emitted as a partial")
      write(Seq((3L, t0 + 1500, 1L, "view", 3.0, "{}")))
      assert(poll(60000)(rowsIn >= 3), "batch 2 must be processed")
      assert(spark.table("tws_live_test").count() === 0,
        "a session spanning two micro-batches must not be emitted split")
      // idle: the 2 s gap timer fires in a subsequent empty batch
      assert(poll(60000)(spark.table("tws_live_test").count() === 1),
        "idle timer must close and emit the open session")
      val u1 = spark.table("tws_live_test")
        .as[(Long, Long, Long, Int, Double)].collect().toList.filter(_._1 == 1L)
      assert(u1 === List((1L, t0, t0 + 1500, 3, 6.0)),
        "idle timer must emit the MERGED cross-batch session exactly once")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("sessionize on the fixture covers every event exactly once") {
    val events = Tables.load(spark, sfDir, "events")
    val sessions = EventStream.sessionize(spark, events).toDF()
    val total = sessions.agg(sum("n_events")).as[Long].head()
    assert(total === events.count())
  }

  test("stream-stream interval join equals the batch interval join") {
    awaitDrained(EventStream.startIntervalJoin(spark, sfDir, "esj_test"))
    val streamed = spark.table("esj_test")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val e = Tables.load(spark, sfDir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
    val batch = p.join(c, $"pu" === $"cu"
        && $"cts" >= $"pts" - expr("INTERVAL 1 HOUR") && $"cts" <= $"pts")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("left-outer stream join adds exactly the watermark-evicted unmatched rows") {
    awaitDrained(EventStream.startLeftOuterJoin(spark, sfDir, "esloj_test"))
    val out = spark.table("esloj_test")
    // matched rows are identical to the inner interval join
    val matchedStreamed = out.filter($"click_id".isNotNull)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val e = Tables.load(spark, sfDir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
    val cond = $"pu" === $"cu" &&
      $"cts" >= $"pts" - expr("INTERVAL 1 HOUR") && $"cts" <= $"pts"
    val batchMatched = p.join(c, cond)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(matchedStreamed === batchMatched)
    // null-padded rows: exactly the unmatched purchases the final
    // watermark (min of both sides' max ts − 10 min) could evict
    val wm = e.agg(least(
        max(when($"event_type" === "click", $"ts")),
        max(when($"event_type" === "purchase", $"ts")))
        - expr("INTERVAL 10 MINUTES"))
      .head().getTimestamp(0)
    val nullStreamed = out.filter($"click_id".isNull)
      .select("purchase_id").as[Long].collect().toSet
    val batchUnmatched = p.join(c, cond, "left_anti")
      .filter($"pts" < lit(wm))
      .select("purchase_id").as[Long].collect().toSet
    assert(nullStreamed === batchUnmatched)
    assert(nullStreamed.nonEmpty)
    // and no purchase appears both matched and null-padded
    assert(nullStreamed.intersect(matchedStreamed.map(_._1)).isEmpty)
  }

  test("CEP view-burst detection honors the window edges and strict order") {
    def ev(id: Long, ms: Long, uid: Long, tpe: String) =
      EventStream.Event(id, new java.sql.Timestamp(ms), uid, tpe, 1.0, "{}")
    val m = 60 * 1000L
    val events = Seq(
      // user 1: two views 29 and 5 min before the purchase → hit (n=2)
      ev(1, 1 * m, 1, "view"), ev(2, 25 * m, 1, "view"),
      ev(3, 30 * m, 1, "purchase"),
      // user 2: one view exactly 30 min before (outside: v > t-30m is
      // strict) and one same-millisecond view (outside: v < t strict)
      ev(4, 0, 2, "view"), ev(5, 30 * m, 2, "view"),
      ev(6, 30 * m, 2, "purchase"),
      // user 3: clicks never count toward the pattern
      ev(7, 1 * m, 3, "click"), ev(8, 2 * m, 3, "click"),
      ev(9, 10 * m, 3, "purchase"),
      // user 1 again, later: old views expired, only one fresh view
      ev(10, 70 * m, 1, "view"), ev(11, 80 * m, 1, "purchase")
    ).toDF()
    val hits = EventStream.detectViewBurstPurchases(spark, events)
      .collect().map(h => (h.user_id, h.purchase_id, h.n_views)).toSet
    assert(hits === Set((1L, 3L, 2)))
  }
}

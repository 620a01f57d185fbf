package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming surface over the `events` table shape. The
  * reference has no streaming (SURVEY.md §2.9); this is the scale-path
  * extension: identical aggregations as the batch queries, expressed over
  * `readStream` with watermarked event-time windows, plus a
  * mapGroupsWithState sessionizer for custom state.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Raw-file schema when the fixture stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark only reads as a long (see
    * Tables.loadEvents) — streamed reads declare it LongType and convert
    * to microsecond timestamps. Micros-encoded fixtures stream through
    * [[ntzEventSchema]] instead; [[rawStream]] picks per footer.
    */
  val rawEventSchema: StructType = StructType(
    eventSchema.fields.map(f =>
      if (f.name == "ts") StructField("ts", LongType) else f))

  /** Raw-file schema for TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * fixtures: `ts` arrives as TIMESTAMP_NTZ and is re-typed to the
    * session-TZ timestamp (UTC session ⇒ identical micros).
    */
  val ntzEventSchema: StructType = StructType(
    eventSchema.fields.map(f =>
      if (f.name == "ts") StructField("ts", TimestampNTZType) else f))

  /** Per-query-name checkpoint dir on tmpfs (/dev/shm when present): the
    * WAL/offsets/state-commit small-file traffic of a one-shot
    * AvailableNow run is pure fixed cost, and on the bench host /tmp is
    * disk-backed. The dir is WIPED before each start so a rerun always
    * reprocesses from scratch (a reused checkpoint would no-op the run
    * and leave the memory sink empty); one dir per query name bounds
    * tmpfs accumulation.
    */
  private[streaming] def freshCheckpoint(name: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    val dir = new java.io.File(base, s"graft_ck_$name")
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(dir)
    dir.getAbsolutePath
  }

  /** Tumbling 1-hour windowed counts/sums per event type with a 10-minute
    * watermark — the streaming twin of the batch `events_hourly` query.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))

  /** File-source stream over the fixture directory (glob-filtered to the
    * events file — FileStreamSource needs a directory basePath), memory
    * sink for tests.
    */
  def startHourlyAgg(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    hourlyAgg(rawStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** SLIDING 1-hour windows every 15 minutes with a 10-minute watermark —
    * the overlapping-window rate monitor. Each event fans out to exactly
    * 4 window states map-side; append mode emits a window only once its
    * END passes the watermark, so state holds at most ~1 h 10 min of
    * window slices per type regardless of stream length.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))

  def startSlidingAgg(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    slidingAgg(rawStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** The raw fixture stream (glob-filtered file source; ts normalized to
    * microsecond TimestampType whichever way the fixture encodes it —
    * the footer schema of a one-off batch read decides, exactly like
    * Tables.loadEvents on the batch side).
    */
  private def rawStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsIsLong = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType == LongType
    if (tsIsLong)
      spark.readStream.schema(rawEventSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      spark.readStream.schema(ntzEventSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Streaming count-min sketch: the [[graft.operators.Sketches]] cell
    * relation maintained as a complete-mode streaming aggregation —
    * the running state IS the depth×width cell table (≤ 1024 rows,
    * bounded regardless of stream length), and because sketch cells
    * merge associatively the final micro-batched table equals the
    * batch-built sketch EXACTLY, estimate for estimate. The mergeable-
    * summary property is what makes sketches the 100 TB streaming
    * answer to distinct/frequency questions; here it is demonstrated
    * bit-for-bit.
    */
  /** Streaming sample-ratio-mismatch monitor: per-type variant counts
    * (user_id mod 2) maintained as a COMPLETE-mode aggregation — state
    * is the ≤5-row segment table however long the stream, and the
    * associative merge means the streamed counts equal the batch ones
    * exactly (the mergeable-summary property), so the batch oracle
    * checks the streaming result bit-for-bit.
    */
  def startSrmStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    rawStream(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()

  def startCmsStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    graft.operators.Sketches.countMinCells(rawStream(spark, sfDir), "user_id")
      .writeStream.outputMode("complete").format("memory")
      .queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()

  /** Streaming exactly-once dedup: the input is deliberately doubled
    * (union of two reads of the same source — the at-least-once delivery
    * shape), then `dropDuplicates` on the event key collapses replays.
    * State is bounded by the watermark: keys older than 10 minutes of
    * event time are evicted, which is what makes dedup viable on an
    * unbounded 100 TB stream (an unwatermarked dedup's state grows
    * forever). Every surviving row is appended to the memory sink.
    */
  def startDedupStream(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    val doubled = rawStream(spark, sfDir).union(rawStream(spark, sfDir))
    doubled
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Stream–static enrichment join: the static dim (user → segment) is
    * read once per micro-batch and broadcast; the join is stateless, so
    * rows flow through with no watermark or state store — the canonical
    * shape for decorating a 100 TB event stream with reference data.
    */
  def startEnrichedStream(
      spark: SparkSession,
      sfDir: String,
      dim: DataFrame,
      queryName: String): StreamingQuery = {
    val stream = rawStream(spark, sfDir)
    stream.join(broadcast(dim), stream("user_id") === dim("dim_user_id"))
      .select(col("event_id"), col("user_id"), col("segment"), col("value"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Stream–static anomaly gate: each arriving event scores against a
    * PRECOMPUTED per-type baseline (mean/std, rounded once so the
    * stream, any replay, and the oracle all score identical constants)
    * broadcast into the stream; rows with |z| ≥ `zCut` are emitted.
    * Stateless — the baseline table carries all the memory, so the gate
    * runs forever on an unbounded ingest; refreshing the baseline is a
    * static-side swap, not a state migration.
    */
  def startAnomalyStream(
      spark: SparkSession,
      sfDir: String,
      baseline: DataFrame,
      queryName: String,
      zCut: Double = 3.0): StreamingQuery = {
    val stream = rawStream(spark, sfDir)
    stream.join(broadcast(baseline),
        stream("event_type") === baseline("b_type"))
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) >= zCut)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Stream–stream interval join: each purchase pairs with the same
    * user's clicks from the preceding hour. Both sides carry watermarks
    * and the join condition time-bounds the click relative to the
    * purchase, so the state store provably evicts clicks older than
    * watermark − 1 h — the condition that keeps a stream–stream join
    * runnable forever on an unbounded stream (an unbounded-time join's
    * buffer grows without limit; Spark would reject it in append mode).
    */
  def startIntervalJoin(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    val clicks = rawStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = rawStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("p_user"), col("click_id"),
        col("c_ts"), col("p_ts"), col("value"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Stream–stream LEFT OUTER interval join: like [[startIntervalJoin]],
    * but purchases with no click in their preceding hour still emit —
    * null-padded — once the watermark passes their event time and the
    * state store can prove no matching click can arrive anymore. That
    * proof is the whole trick of outer joins on unbounded streams: the
    * null row is emitted by state EVICTION, so purchases younger than
    * the final watermark (min across both sides' watermark nodes, minus
    * the 10-minute delay) are still open and never emit unmatched. The
    * batch oracle reproduces exactly that boundary.
    */
  def startLeftOuterJoin(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    val clicks = rawStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = rawStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("purchase_id"), col("p_user"), col("click_id"),
        col("c_ts"), col("p_ts"), col("value"))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** foreachBatch upsert sink: each micro-batch MERGEs its latest row
    * per user into a keyed parquet state directory (full-outer +
    * COALESCE, the same keyed-merge shape as the batch
    * `merge_upsert_orders`). This is the production pattern for
    * maintaining a mutable view over an append-only stream when the
    * sink has no native MERGE: reads are always consistent because the
    * state swaps via an atomic directory rename. Restart safety comes
    * from idempotence — re-merging a replayed batch is a no-op because
    * the merge keeps the max-(ts, event_id) row per key.
    */
  def startUpsertStream(spark: SparkSession, sfDir: String, stateDir: String): StreamingQuery = {
    import org.apache.spark.sql.DataFrame
    val fs = new java.io.File(stateDir)
    if (fs.exists()) { scala.reflect.io.Directory(fs).deleteRecursively() }
    rawStream(spark, sfDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ord = unix_millis(col("ts")) * lit(1000000L) + col("event_id")
        val latest = batch.groupBy(col("user_id").as("u"))
          .agg(max_by(col("event_id"), ord).as("b_event_id"),
            max_by(col("event_type"), ord).as("b_type"),
            max(unix_millis(col("ts"))).as("b_ts_ms"))
        val cur = new java.io.File(s"$stateDir/current")
        val merged =
          if (!cur.exists()) {
            latest.select(col("u").as("user_id"),
              col("b_event_id").as("last_event_id"),
              col("b_type").as("last_type"), col("b_ts_ms").as("last_ts_ms"))
          } else {
            val prev = spark.read.parquet(cur.getPath)
            // keyed merge: the newer side wins per user (ts, then id)
            prev.join(latest, prev("user_id") === latest("u"), "full_outer")
              .select(
                coalesce(col("user_id"), col("u")).as("user_id"),
                when(col("b_ts_ms").isNull, col("last_event_id"))
                  .when(col("last_ts_ms").isNull, col("b_event_id"))
                  .when(struct(col("b_ts_ms"), col("b_event_id"))
                    >= struct(col("last_ts_ms"), col("last_event_id")),
                    col("b_event_id"))
                  .otherwise(col("last_event_id")).as("last_event_id"),
                when(col("b_ts_ms").isNull, col("last_type"))
                  .when(col("last_ts_ms").isNull, col("b_type"))
                  .when(struct(col("b_ts_ms"), col("b_event_id"))
                    >= struct(col("last_ts_ms"), col("last_event_id")),
                    col("b_type"))
                  .otherwise(col("last_type")).as("last_type"),
                greatest(coalesce(col("b_ts_ms"), col("last_ts_ms")),
                  coalesce(col("last_ts_ms"), col("b_ts_ms"))).as("last_ts_ms"))
          }
        val next = s"$stateDir/next"
        merged.write.mode("overwrite").parquet(next)
        // atomic swap: readers see either the old or the new state
        val curPath = new java.io.File(s"$stateDir/current")
        if (curPath.exists()) scala.reflect.io.Directory(curPath).deleteRecursively()
        new java.io.File(next).renameTo(curPath)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, total_value: Double)
  final case class CepState(viewsMs: List[Long])
  final case class PatternHit(user_id: Long, purchase_id: Long, n_views: Int)

  /** CEP-style sequence detection: emit every purchase preceded by at
    * least `minViews` view events from the same user STRICTLY earlier
    * within `windowMs` (the view-burst-then-buy funnel trigger). The
    * state a key carries is only the view timestamps still inside the
    * window — pruned on every event, so per-key state is bounded by
    * view-rate × window no matter how long the stream runs. Works
    * identically over readStream (one AvailableNow batch) and batch.
    *
    * Times compare at millisecond grain (`Timestamp.getTime`), which is
    * what the external oracle reproduces with `epoch_ms`.
    */
  def detectViewBurstPurchases(spark: SparkSession, events: DataFrame,
      windowMs: Long = 30 * 60 * 1000L, minViews: Int = 2) = {
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, PatternHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[CepState]) =>
          // sort within the batch on (ts, id) — deterministic replay;
          // same-millisecond views never count for a purchase (strict <),
          // so intra-tick order cannot change the answer
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var views = state.getOption.map(_.viewsMs).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[PatternHit]
          sorted.foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "purchase" =>
                val recent = views.count(v => v > t - windowMs && v < t)
                if (recent >= minViews) out += PatternHit(uid, e.event_id, recent)
              case "view" =>
                // prune on insert: views at or before t-window can never
                // satisfy a later purchase (its cutoff only moves forward)
                views = (t :: views).filter(_ > t - windowMs)
              case _ =>
            }
          }
          state.update(CepState(views))
          out.iterator
      }
  }

  /** [[detectViewBurstPurchases]] over the fixture stream, memory sink. */
  def startCepStream(spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    detectViewBurstPurchases(spark, rawStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** [[sessionize]] re-expressed on Spark 4's `transformWithState`
    * (StatefulProcessor + typed ValueState) — the arbitrary-state API
    * that supersedes flatMapGroupsWithState: named state handles, TTL
    * config, timers. Two contracts by TimeMode:
    *
    *  - `TimeMode.None` (the batch path and single-batch AvailableNow
    *    runs): every key's full history arrives in ONE handleInputRows
    *    call, so the trailing open session is emitted at end-of-rows and
    *    state is cleared — output is exactly [[sessionize]]'s, which is
    *    why the two share one oracle. This equivalence holds ONLY when
    *    each user's history lands in one batch.
    *  - `TimeMode.ProcessingTime` (live multi-batch streams): the open
    *    session is PERSISTED via `st.update` at batch end — never emitted
    *    early, so a session spanning micro-batches is merged, not split —
    *    and a processing-time timer at now+gapMs closes it once the key
    *    goes idle (each new batch for the key supersedes the old timer).
    */
  private class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, Session] {
    import org.apache.spark.sql.streaming.{
      ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var st: ValueState[SessionState] = _
    @transient private var useTimers: Boolean = false
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[SessionState](
        "session", E.product[SessionState], TTLConfig.NONE)
      useTimers = timeMode == TimeMode.ProcessingTime()
    }
    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      val out = scala.collection.mutable.ListBuffer.empty[Session]
      var cur: Option[SessionState] = if (st.exists()) Some(st.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out += Session(uid, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) if useTimers =>
          // persist across micro-batches; reset the idle-close timer
          st.update(s)
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + gapMs)
        case Some(s) =>
          out += Session(uid, s.start, s.last, s.n, s.total); st.clear()
        case None =>
      }
      out.iterator
    }
    override def handleExpiredTimer(
        uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      if (st.exists()) {
        val s = st.get(); st.clear()
        Iterator.single(Session(uid, s.start, s.last, s.n, s.total))
      } else Iterator.empty
    }
  }

  def sessionizeTws(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    // batch transformWithState resolves its RocksDB store through the
    // driver's StateStoreCoordinator endpoint, which only streaming
    // query startup normally registers — force it up front so the batch
    // path works in a session that never started a stream
    // (private[sql] in Scala, public in bytecode — reflective call)
    val mgr = spark.streams
    try mgr.getClass.getMethod("stateStoreCoordinator").invoke(mgr)
    catch { case _: ReflectiveOperationException => () }
    events.as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[sessionizeTws]] in its live multi-batch contract: processing-time
    * timers, so a session spanning micro-batches is merged in state (never
    * emitted as split partials) and closed gapMs after the key goes idle.
    * For streams whose keys can straddle batches; [[sessionizeTws]]'s
    * TimeMode.None form is for batch / single-batch AvailableNow runs.
    *
    * Caveat: while timers are registered, Spark constructs a batch every
    * trigger (shouldRunAnotherBatch stays true), so
    * `processAllAvailable()` never observes a no-new-data round and
    * blocks forever — drive tests/ops by polling progress or the sink,
    * and use a non-zero trigger interval or the empty batches busy-loop.
    */
  def sessionizeTwsLive(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** [[sessionizeTws]] over the fixture STREAM — transformWithState's
    * streaming path, which requires the RocksDB state store provider
    * (the caller sets `spark.sql.streaming.stateStore.providerClass`;
    * see EventStreamSpec). Memory sink, AvailableNow.
    */
  def startTwsSessionize(
      spark: SparkSession, sfDir: String, queryName: String): StreamingQuery = {
    sessionizeTws(spark, rawStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", freshCheckpoint(queryName))
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Gap-based sessionization (30-min inactivity) with explicit state —
    * the custom-state primitive a training-data pipeline uses for
    * clickstream assembly. Works identically over readStream.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000L) = {
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-mode friendly: sort within group, emit closed sessions
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                out += Session(uid, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) => out += Session(uid, s.start, s.last, s.n, s.total); state.remove()
            case None =>
          }
          out.iterator
      }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Phase decomposition of the two declared streaming queries the r12
  * verdict asked to prove at their floor (VERDICT r12 "next round" #7):
  * events_stream_left_join and doc_stream_dedup_lsh.
  *
  * Three phases per query, each run twice (cold + warm) on the same
  * session:
  *
  *   - batch_twin  — the same computational content as a plain batch
  *     plan (scan + join/verify + the same final aggregate): what the
  *     work costs with NO streaming machinery.
  *   - source_sink — an AvailableNow micro-batch run of the same source
  *     projection straight into the memory sink (no join, no state):
  *     micro-batch + checkpoint + sink machinery alone.
  *   - full_stream — the declared query's stream exactly as Bench runs
  *     it (same withStreamPartitions settings).
  *
  * floor evidence: full − source_sink ≈ the state/commit cost of the
  * stateful operator; source_sink − batch scan ≈ the fixed micro-batch
  * machinery. If full_stream ≈ source_sink + batch_twin the query is at
  * the structural floor — the residual is the machinery, not the plan.
  *
  * Usage: runMain graft.StreamFloorProbe [sfDir]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(body: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"PROBE $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }
    // the exact stream scoping Bench's queries use (SparkEntry
    // withStreamPartitions): 4 state partitions, tmpfs checkpoints
    def withStreamConf[T](noDataBatch: Boolean)(body: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val prevNd =
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf
        .set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatch)
      try body finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNd)
      }
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchEvents = graft.engine.Tables.load(spark, sfDir, "events")
    val tsIsLong = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    def sourceStream(): DataFrame = {
      val raw = spark.readStream
        .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    }

    // ---- events_stream_left_join ----------------------------------------
    time("loj_batch_twin") {
      val p = batchEvents.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"), col("value"))
      val c = batchEvents.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"), "left_outer")
        .agg(count(lit(1)), count(col("click_id")))
        .collect()
    }
    time("loj_source_sink") {
      withStreamConf(noDataBatch = true) {
        val q = sourceStream()
          .filter(col("event_type") === "purchase" ||
            col("event_type") === "click")
          .select("event_id", "user_id", "ts", "event_type", "value")
          .writeStream.outputMode("append").format("memory")
          .queryName("probe_src_" + System.nanoTime())
          .option("checkpointLocation",
            s"/dev/shm/graft_probe_src_${System.nanoTime()}")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000); ()
      }
    }
    time("loj_full_stream") {
      withStreamConf(noDataBatch = true) {
        val q = graft.streaming.EventStream
          .startLeftOuterJoin(spark, sfDir, "probe_loj")
        q.awaitTermination(180000); ()
      }
    }

    // ---- doc_stream_dedup_lsh --------------------------------------------
    val sigs = graft.operators.Dedup
      .minhashPortableSigs(graft.engine.Tables.load(spark, sfDir, "documents"))
      .persist()
    sigs.count()
    val index = graft.streaming.DocStream.bandIndexFromSigs(sigs)
    time("lsh_batch_twin") {
      // the same candidate join as the stream's plan, static-vs-static
      // (the stream side is stateless)
      val probe = graft.streaming.DocStream.bandIndexFromSigs(sigs)
        .select(col("c_id").as("s_id"), col("band"), col("bucket"))
      probe.join(index.select("band", "bucket", "c_id"), Seq("band", "bucket"))
        .filter(col("s_id") =!= col("c_id"))
        .agg(count(lit(1))).collect()
    }
    time("lsh_source_sink") {
      withStreamConf(noDataBatch = false) {
        val q = spark.readStream
          .schema(spark.read.parquet(s"$sfDir/documents.parquet").schema)
          .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          .select("doc_id", "text")
          .writeStream.outputMode("append").format("memory")
          .queryName("probe_dsrc_" + System.nanoTime())
          .option("checkpointLocation",
            s"/dev/shm/graft_probe_dsrc_${System.nanoTime()}")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000); ()
      }
    }
    time("lsh_full_stream") {
      withStreamConf(noDataBatch = false) {
        val q = graft.streaming.DocStream.startLshDedupStream(
          spark, sfDir, index, "probe_lsh_" + (System.nanoTime() % 1000000),
          threshold = 0.2)
        q.awaitTermination(180000); ()
      }
    }
    spark.stop()
  }
}

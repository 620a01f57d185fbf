package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Multimodal

/** Multimodal plumbing (SURVEY.md north-star): binary payload columns with
  * typed metadata, mapPartitions feature extraction over the stubbed codec,
  * metadata-only pruning.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media =
    Multimodal.synthesizeFromDocuments(Tables.load(spark, sfDir, "documents")).cache()

  test("synthesized media matches the declared schema") {
    assert(media.schema("content").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    assert(media.select("modality").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
  }

  test("extractFeatures: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").limit(5).collect()
    val f2 = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").limit(5).collect()
    assert(f1.forall(_.features.length === Multimodal.FakeCodec.featureDim))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("codec handles null/empty payloads") {
    val (w, h, f) = Multimodal.FakeCodec.decode(null)
    assert(w === 16 && h === 16 && f.length === Multimodal.FakeCodec.featureDim)
  }

  test("frameSampleTimestamps: ~1 frame per second of fake duration") {
    val r = Multimodal.frameSampleTimestamps(media, fps = 1.0)
      .select($"media_id", size($"frame_ts_ms").as("n"), $"duration_ms")
      .as[(Long, Int, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (_, n, dur) => n === (dur / 1000 + 1).toInt })
  }

  test("resize keeps only image rows, emits exact w*h payloads, never shuffles") {
    val docs = Tables.load(spark, sfDir, "documents")
    val media = Multimodal.synthesizeFromDocuments(docs)
    val resized = Multimodal.resize(spark, media, 8, 4)
    val rows = resized.collect()
    assert(rows.length === media.filter(org.apache.spark.sql.functions.col("modality") === "image").count())
    assert(rows.forall(r => r.content.length === 32 && r.width === 8 && r.height === 4))
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "resize must be a narrow map:\n" + plan.take(400))
  }

  test("metadata-only projection prunes the binary column at the scan") {
    val docs = Tables.load(spark, sfDir, "documents")
    // write media to parquet, read back, project metadata only
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    Multimodal.synthesizeFromDocuments(docs).write.mode("overwrite").parquet(dir)
    val meta = Multimodal.metadataOnly(spark.read.parquet(dir))
    val scan = meta.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("content"), s"binary column must be pruned from scan:\n$scan")
    assert(meta.count() === docs.count())
  }
}

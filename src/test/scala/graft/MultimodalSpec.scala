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
    assert(f1.forall(_.features.length === Multimodal.PpmCodec.featureDim))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("codecs reject null payloads; unparseable bytes yield an honest zero row") {
    assert(Multimodal.PpmCodec.decode(null).isEmpty)
    assert(Multimodal.WavCodec.decode(null).isEmpty)
    assert(Multimodal.AviCodec.decode(null).isEmpty)
    val junk = Seq(Multimodal.MediaRow(1L, "video", "not a container".getBytes,
      None, None, None, None, None)).toDF()
      .select($"media_id", $"modality", $"content",
        org.apache.spark.sql.functions.struct($"mime", $"width", $"height",
          $"duration_ms", $"sample_rate").as("meta"))
    val r = Multimodal.extractFeatures(spark, junk).collect().head
    assert(r.width === 0 && r.height === 0 && r.features.forall(_ === 0f))
  }

  test("aHash: strict-mean bits, resample invariance, complement disjointness") {
    val rnd = new scala.util.Random(7)
    val rgb = Array.fill(3 * 8 * 8)(rnd.nextInt(256).toByte)
    val h = Multimodal.PpmCodec.aHash(8, 8, rgb)
    // 2× nearest-neighbor upscale samples the identical source pixels →
    // identical hash (the scale-invariance a perceptual hash is for)
    val up = new Array[Byte](3 * 16 * 16)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      up(3 * (y * 16 + x) + c) = rgb(3 * ((y / 2) * 8 + x / 2) + c)
    assert(Multimodal.PpmCodec.aHash(16, 16, up) === h)
    // complementing every channel flips each cell across the mean:
    // above-mean cells go below — the two hashes share (almost) no bits
    val inv = rgb.map(b => (255 - (b & 0xff)).toByte)
    val hi = Multimodal.PpmCodec.aHash(8, 8, inv)
    assert(java.lang.Long.bitCount(h ^ hi) > 48)
  }

  test("nearDupImages: exact dup at hamming 0, one-cell tweak found, complement pruned") {
    import Multimodal.PpmCodec
    val rnd = new scala.util.Random(11)
    val base = Array.fill(3 * 8 * 8)(rnd.nextInt(256).toByte)
    // tweak: push ONE grid cell's pixel to full white — flips at most
    // that cell's bit (and can shift the mean by at most a hair)
    val tweak = base.clone()
    tweak(0) = 255.toByte; tweak(1) = 255.toByte; tweak(2) = 255.toByte
    val inv = base.map(b => (255 - (b & 0xff)).toByte)
    def row(id: Long, rgb: Array[Byte]) =
      (id, "image", PpmCodec.encode(8, 8, rgb))
    val media = Seq(row(1, base), row(2, base), row(3, tweak), row(4, inv))
      .toDF("media_id", "modality", "content")
    val pairs = Multimodal.nearDupImages(spark, media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 4)
    assert(pairs((1L, 3L)) === pairs((2L, 3L)))
    // the complement shares no 16-bit band: never even a candidate
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("frameSampleTimestamps: ~1 frame per second of fake duration") {
    val r = Multimodal.frameSampleTimestamps(media, fps = 1.0)
      .select($"media_id", size($"frame_ts_ms").as("n"), $"duration_ms")
      .as[(Long, Int, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (_, n, dur) => n === (dur / 1000 + 1).toInt })
  }

  test("resize keeps only image rows, emits decodable w*h PPMs, never shuffles") {
    val docs = Tables.load(spark, sfDir, "documents")
    val media = Multimodal.synthesizeFromDocuments(docs)
    val resized = Multimodal.resize(spark, media, 8, 4)
    val rows = resized.collect()
    assert(rows.length === media.filter(org.apache.spark.sql.functions.col("modality") === "image").count())
    // every output is a real P6 payload that parses back to 8×4
    rows.foreach { r =>
      assert(r.width === 8 && r.height === 4)
      val Some((w, h, rgb)) = Multimodal.PpmCodec.decode(r.content)
      assert(w === 8 && h === 4 && rgb.length === 96)
    }
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "resize must be a narrow map:\n" + plan.take(400))
  }

  // -- real PPM codec -------------------------------------------------------

  test("audioLoudness: hand-checked windowed RMS, tail dropped, short stream NULL") {
    // samples [3,4 | 0,0 | 5]: window 2 → energies [25, 0], tail dropped.
    // peak = window 0 (rms √12.5); mean = (√12.5 + 0) / 2
    val wav = Multimodal.WavCodec.encode(8000, Array[Short](3, 4, 0, 0, 5))
    val tiny = Multimodal.WavCodec.encode(8000, Array[Short](9)) // < window
    val media = Seq((1L, "audio", wav), (2L, "audio", tiny),
      (3L, "image", wav)).toDF("media_id", "modality", "content")
    val r = Multimodal.audioLoudness(spark, media, window = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L)) // non-audio rows never reach the decoder
    val a = r(1L)
    assert(a.getInt(1) === 8000 && a.getInt(2) === 5 && a.getInt(3) === 2)
    assert(a.getInt(4) === 0)
    assert(math.abs(a.getDouble(5) - math.sqrt(12.5)) < 1e-6)
    assert(math.abs(a.getDouble(6) - math.sqrt(12.5) / 2) < 1e-6)
    val t = r(2L)
    assert(t.getInt(3) === 0 && t.isNullAt(4) && t.isNullAt(5) && t.isNullAt(6))
  }

  test("audioLoudness matches a sequential model on seeded random PCM") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 20L).map { id =>
      val n = rnd.nextInt(400)
      (id, "audio",
        Multimodal.WavCodec.encode(16000,
          Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)))
    }
    val w = 50
    def model(samples: Array[Short]) = {
      val en = samples.grouped(w).filter(_.length == w)
        .map(_.map(v => v.toLong * v).sum).toSeq
      val nw = en.size
      if (nw == 0) (samples.length, 0, None, None, None)
      else {
        val peak = en.max
        (samples.length, nw, Some(en.indexOf(peak)),
          Some(math.sqrt(peak / 50.0)), Some(en.map(e => math.sqrt(e / 50.0)).sum / nw))
      }
    }
    val got = Multimodal.audioLoudness(spark, rows.toDF("media_id", "modality", "content"))
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.foreach { case (id, _, wav) =>
      val Some((_, samples)) = Multimodal.WavCodec.decode(wav)
      val (n, nw, pw, pr, mr) = model(samples)
      val g = got(id)
      assert(g.getInt(2) === n && g.getInt(3) === nw)
      (pw, pr, mr) match {
        case (Some(a), Some(b), Some(c)) =>
          assert(g.getInt(4) === a)
          assert(math.abs(g.getDouble(5) - b) < 1e-5)
          assert(math.abs(g.getDouble(6) - c) < 1e-5)
        case _ =>
          assert(g.isNullAt(4) && g.isNullAt(5) && g.isNullAt(6))
      }
    }
  }

  test("PpmCodec roundtrip: encode → decode is the identity") {
    val rgb = Array.tabulate(3 * 6 * 5)(i => ((i * 37) % 256).toByte)
    val Some((w, h, back)) = Multimodal.PpmCodec.decode(
      Multimodal.PpmCodec.encode(6, 5, rgb))
    assert(w === 6 && h === 5 && back.toSeq === rgb.toSeq)
  }

  test("PpmCodec parses comments and whitespace grammar; rejects malformed") {
    val rgb = Array.fill(3 * 2 * 2)(100.toByte)
    val withComment = ("P6\n# a netpbm comment\n2 2\n255\n").getBytes("US-ASCII") ++ rgb
    val Some((w, h, back)) = Multimodal.PpmCodec.decode(withComment)
    assert(w === 2 && h === 2 && back.toSeq === rgb.toSeq)
    assert(Multimodal.PpmCodec.decode(null).isEmpty)
    assert(Multimodal.PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ rgb).isEmpty)
    assert(Multimodal.PpmCodec.decode("P6\n2 2\n255\n".getBytes ++ rgb.take(5)).isEmpty)
    assert(Multimodal.PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++ rgb).isEmpty)
  }

  test("PpmCodec features come from the actual pixel plane") {
    // an all-red 4×4: mean R = 1, mean G = B = 0, all mass in one lum bin
    val red = Array.tabulate(3 * 16)(i => if (i % 3 == 0) 255.toByte else 0.toByte)
    val f = Multimodal.PpmCodec.features(4, 4, red)
    assert(math.abs(f(0) - 1.0f) < 1e-6 && f(1) === 0.0f && f(2) === 0.0f)
    // lum(255,0,0) = 76 → bin 3 + 76*13/256 = 3 + 3
    assert(math.abs(f(6) - 1.0f) < 1e-6)
    assert(f.sum > 1.9f && f.sum < 2.1f) // means + histogram both normalized
  }

  // -- real WAV codec -------------------------------------------------------

  test("WavCodec roundtrip: encode → decode is the identity") {
    val samples = Array.tabulate(100)(i => ((i * 613) % 65536 - 32768).toShort)
    val Some((rate, back)) = Multimodal.WavCodec.decode(
      Multimodal.WavCodec.encode(16000, samples))
    assert(rate === 16000 && back.toSeq === samples.toSeq)
  }

  test("WavCodec rejects malformed and non-PCM payloads") {
    val ok = Multimodal.WavCodec.encode(8000, Array[Short](1, 2, 3))
    assert(Multimodal.WavCodec.decode(ok).isDefined)
    assert(Multimodal.WavCodec.decode(null).isEmpty)
    assert(Multimodal.WavCodec.decode(ok.take(20)).isEmpty)
    val stereo = ok.clone; stereo(22) = 2 // numChannels = 2
    assert(Multimodal.WavCodec.decode(stereo).isEmpty)
    val notRiff = ok.clone; notRiff(0) = 'X'.toByte
    assert(Multimodal.WavCodec.decode(notRiff).isEmpty)
  }

  test("WavCodec features come from the decoded samples") {
    // a constant positive signal: RMS = mean = value, zero crossings = 0
    val const = Array.fill[Short](64)(16384)
    val f = Multimodal.WavCodec.features(const)
    assert(math.abs(f(0) - 0.5f) < 1e-3 && math.abs(f(1) - 0.5f) < 1e-3)
    assert(f(2) === 0.0f)
    // an alternating signal crosses zero at every step
    val alt = Array.tabulate[Short](64)(i => if (i % 2 == 0) 1000 else -1000)
    assert(Multimodal.WavCodec.features(alt)(2) === 1.0f)
  }

  test("synthesized audio rows are genuine decodable WAVs") {
    val rows = Multimodal.synthesizeFromDocuments(
        Tables.load(spark, sfDir, "documents"))
      .filter($"modality" === "audio").limit(10)
      .select("media_id", "content").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Some((rate, samples)) = Multimodal.WavCodec.decode(r.getAs[Array[Byte]](1))
      assert(rate === 16000, s"id=${r.getLong(0)}")
      assert(samples.length === (r.getAs[Array[Byte]](1).length - 44) / 2)
    }
  }

  // -- real AVI codec -------------------------------------------------------

  test("AviCodec roundtrip: encode → decode is the identity") {
    val frames = Seq.tabulate(3)(f =>
      Array.tabulate(3 * 5 * 4)(i => ((i * 31 + f * 7) % 256).toByte))
    val Some((w, h, back)) = Multimodal.AviCodec.decode(
      Multimodal.AviCodec.encode(5, 4, frames))
    assert(w === 5 && h === 4 && back.length === 3)
    assert(back.map(_.toSeq) === frames.map(_.toSeq))
  }

  test("AviCodec handles row stride padding (width not a multiple of 4)") {
    // 5 px × 3 B = 15 B rows stored at stride 16 — decode must skip the pad
    val frame = Array.tabulate(3 * 5 * 2)(i => (i + 1).toByte)
    val Some((w, h, back)) = Multimodal.AviCodec.decode(
      Multimodal.AviCodec.encode(5, 2, Seq(frame)))
    assert(w === 5 && h === 2 && back.head.toSeq === frame.toSeq)
  }

  test("AviCodec rejects malformed and compressed payloads") {
    val ok = Multimodal.AviCodec.encode(4, 4, Seq(new Array[Byte](48)))
    assert(Multimodal.AviCodec.decode(ok).isDefined)
    assert(Multimodal.AviCodec.decode(ok.take(40)).isEmpty)
    val notAvi = ok.clone; notAvi(8) = 'X'.toByte // 'AVI ' fourcc
    assert(Multimodal.AviCodec.decode(notAvi).isEmpty)
    // biCompression lives at strf data offset +16; flip BI_RGB → BI_RLE8
    val compressed = ok.clone
    val strf = {
      var i = 0
      while (!(compressed(i) == 's' && compressed(i + 1) == 't' &&
        compressed(i + 2) == 'r' && compressed(i + 3) == 'f')) i += 1
      i + 8
    }
    compressed(strf + 16) = 1
    assert(Multimodal.AviCodec.decode(compressed).isEmpty)
  }

  test("AviCodec features pool over every decoded frame") {
    // frame 1 all-red, frame 2 all-blue ⇒ means R = B = 0.5, G = 0
    val red = Array.tabulate(3 * 16)(i => if (i % 3 == 0) 255.toByte else 0.toByte)
    val blue = Array.tabulate(3 * 16)(i => if (i % 3 == 2) 255.toByte else 0.toByte)
    val f = Multimodal.AviCodec.features(4, 4, Seq(red, blue))
    assert(math.abs(f(0) - 0.5f) < 1e-6 && f(1) === 0.0f &&
      math.abs(f(2) - 0.5f) < 1e-6)
    assert(f.slice(3, 16).sum > 0.99f) // histogram mass ≈ 1
  }

  test("synthesized video rows are genuine decodable AVIs the encoder reproduces") {
    val rows = media.filter($"modality" === "video").limit(10)
      .select("media_id", "content").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val Some((w, h, frames)) = Multimodal.AviCodec.decode(bytes)
      assert(w === 4 && h === 4, s"id=${r.getLong(0)}")
      assert(bytes.length === 224 + frames.length * 56)
      // encode ∘ decode reproduces the column-assembled payload exactly —
      // the Scala encoder and the SQL-expression synthesis are twins
      assert(Multimodal.AviCodec.encode(w, h, frames).toSeq === bytes.toSeq,
        s"id=${r.getLong(0)}")
    }
  }

  test("synthesized image rows decode to the dimension formula with real pixels") {
    val imgs = Multimodal.extractFeatures(spark, media)
      .filter($"modality" === "image").orderBy("media_id").limit(10).collect()
    imgs.foreach { r =>
      assert(r.width === (8 + r.media_id % 9).toInt, s"id=${r.media_id}")
      assert(r.height === (8 + (r.media_id / 9) % 9).toInt, s"id=${r.media_id}")
      // pixel channels are 32 + (m·m mod 9973) mod 95 ⇒ mean channel
      // value sits well inside (32, 127)/255 — a decoded, non-degenerate
      // plane
      assert(r.features(0) > 0.1f && r.features(0) < 0.5f)
      assert(r.features.slice(3, 16).sum > 0.99f) // histogram mass ≈ 1
    }
    assert(imgs.nonEmpty)
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

  test("videoFrames round-trips every encoded frame; duplicateFrames finds planted dups") {
    import spark.implicits._
    // two videos sharing one identical frame, one video all-distinct
    def frame(seed: Int): Array[Byte] =
      Array.tabulate(48)(i => ((seed * 31 + i * 7) % 95 + 32).toByte)
    val shared = frame(1)
    val media = Seq(
      (10L, Multimodal.AviCodec.encode(4, 4, Seq(shared, frame(2)))),
      (11L, Multimodal.AviCodec.encode(4, 4, Seq(frame(3), shared))),
      (12L, Multimodal.AviCodec.encode(4, 4, Seq(frame(4))))
    ).toDF("media_id", "content")
      .withColumn("modality", lit("video"))
      .withColumn("meta", struct(lit("video/x-msvideo").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(0L).as("duration_ms"), lit(0).as("sample_rate")))
    val frames = Multimodal.videoFrames(spark, media).collect()
    assert(frames.length === 5)
    // decode returns the exact packed-RGB planes that went in
    val f10 = frames.filter(_.media_id == 10L).sortBy(_.frame_idx)
    assert(f10(0).frame.toSeq === shared.toSeq)
    assert(f10(1).frame.toSeq === frame(2).toSeq)
    val dups = Multimodal.duplicateFrames(spark, media)
      .as[(String, Long, Long, Long)].collect()
    assert(dups.length === 1) // exactly the planted shared frame
    assert(dups(0)._2 === 2L && dups(0)._3 === 2L && dups(0)._4 === 10L)
  }

  test("shotCutDiffs: exact Σ|Δbyte| per adjacent pair, 1-frame video silent") {
    // three 4×4 frames: f1 = f0 everywhere +2 (diff 96), f2 = f1 on all
    // but one byte, off by 5 (diff 5); a second 1-frame video emits nothing
    val f0 = Array.tabulate(48)(i => (40 + i % 50).toByte)
    val f1 = f0.map(b => (b + 2).toByte)
    val f2 = f1.clone; f2(7) = (f1(7) + 5).toByte
    val rows = Seq(
      (10L, "video", Multimodal.AviCodec.encode(4, 4, Seq(f0, f1, f2))),
      (11L, "video", Multimodal.AviCodec.encode(4, 4, Seq(f0))),
      (12L, "image", Array[Byte](1, 2, 3)))
      .toDF("media_id", "modality", "content")
    val got = Multimodal.shotCutDiffs(spark, rows)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq((10L, 0L, 96L), (10L, 1L, 5L)))
  }
}

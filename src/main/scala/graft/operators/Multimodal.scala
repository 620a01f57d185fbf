package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct, and per-batch decode
  * stages run as `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas` batch UDFs — one iterator per partition, amortized setup).
  *
  * All three modalities carry REAL payloads decoded by complete pure-Scala
  * parsers (this container ships no media libraries, so each codec targets
  * the canonical uncompressed form of a public format):
  *   - IMAGE: binary P6 PPM (netpbm) via [[PpmCodec]] — magic, comments,
  *     whitespace grammar, maxval, pixel plane — with features computed
  *     from the actually-decoded pixels and a real nearest-neighbor
  *     resampler in [[resize]];
  *   - AUDIO: RIFF/WAVE PCM s16le mono via [[WavCodec]], chunk-by-chunk;
  *   - VIDEO: AVI via [[AviCodec]] — RIFF chunk tree (hdrl → strl → strf
  *     BITMAPINFOHEADER, movi frame list) with uncompressed BI_RGB 24-bit
  *     DIB frames unpacked from bottom-up padded BGR rows.
  * The shared contract — bytes in, dimensions + fixed-width feature vector
  * out — is what a JNI/JavaCV codec for compressed formats would slot into
  * per modality.
  *
  * Scale notes: payload bytes never pass through a shuffle here — all
  * stages are narrow maps; metadata-only queries prune the binary column at
  * the parquet scan (columnar pruning makes `select(meta.*)` free even when
  * rows carry megabyte blobs).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),   // opaque payload
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  final case class MediaRow(
      media_id: Long, modality: String, content: Array[Byte],
      mime: Option[String], width: Option[Int], height: Option[Int],
      duration_ms: Option[Long], sample_rate: Option[Int])

  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** REAL image codec: binary P6 PPM (netpbm). Grammar: `P6`, then
    * whitespace-separated width, height, maxval (each optionally preceded
    * by `#`-comments), one whitespace byte, then `3·w·h` raw RGB bytes.
    * Pure Scala, no native deps; any netpbm tool reads what [[encode]]
    * writes and vice versa.
    */
  object PpmCodec {
    val featureDim = 16

    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = java.util.Arrays.copyOf(header, header.length + rgb.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** None for anything that isn't a complete, well-formed P6 payload. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 2 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipSeparators(): Unit = {
        var run = true
        while (run && i < bytes.length) {
          val b = bytes(i)
          if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
          else if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else run = false
        }
      }
      def readInt(): Int = {
        skipSeparators()
        var v = -1
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = math.max(v, 0) * 10 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      if (w <= 0 || h <= 0 || maxval != 255) return None
      i += 1 // the single whitespace byte after maxval
      val need = 3 * w * h
      if (i + need > bytes.length) return None
      Some((w, h, java.util.Arrays.copyOfRange(bytes, i, i + need)))
    }

    /** 64-bit average hash (aHash) from DECODED pixels: nearest-neighbor
      * resample onto an 8×8 grid (the same `x·srcW/8` integer sampling
      * [[Multimodal.resize]] uses), ITU-R 601 integer luminance per
      * cell, bit k = y·8+x set iff the cell is STRICTLY brighter than
      * the grid mean. Every step is integer arithmetic (the mean
      * compare is `l·64 > Σl` — no division), so the hash is
      * bit-deterministic across engines and languages.
      */
    def aHash(w: Int, h: Int, rgb: Array[Byte]): Long = {
      val lums = new Array[Int](64)
      var tot = 0
      var k = 0
      while (k < 64) {
        val sx = (k % 8) * w / 8
        val sy = (k / 8) * h / 8
        val i = 3 * (sy * w + sx)
        val l = ((rgb(i) & 0xff) * 299 + (rgb(i + 1) & 0xff) * 587 +
          (rgb(i + 2) & 0xff) * 114) / 1000
        lums(k) = l; tot += l
        k += 1
      }
      var hash = 0L
      k = 0
      while (k < 64) {
        if (lums(k) * 64 > tot) hash |= (1L << k)
        k += 1
      }
      hash
    }

    /** 16-dim features from DECODED pixels: [0..2] mean R/G/B in [0,1],
      * [3..15] a 13-bin ITU-R 601 luminance histogram (fractions).
      */
    def features(w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      val n = w * h
      if (n == 0) return f
      var i = 0
      while (i < n) {
        val r = rgb(3 * i) & 0xff
        val g = rgb(3 * i + 1) & 0xff
        val b = rgb(3 * i + 2) & 0xff
        f(0) += r; f(1) += g; f(2) += b
        val lum = (r * 299 + g * 587 + b * 114) / 1000
        f(3 + lum * 13 / 256) += 255f // scaled back below with the means
        i += 1
      }
      var j = 0
      while (j < featureDim) { f(j) /= (255f * n); j += 1 }
      f
    }
  }

  /** REAL audio codec: RIFF/WAVE, PCM s16le mono. Parses the RIFF
    * container chunk-by-chunk (a real file may interleave LIST/fact
    * chunks before `data`), accepts only the canonical PCM shape, and
    * returns the decoded sample stream. Pure Scala, no native deps.
    */
  object WavCodec {
    val featureDim = 16

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** None for anything that isn't complete PCM s16le mono WAVE. */
    def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
      if (bytes == null || bytes.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      bb.getInt // riff size (trust the chunk walk, not this)
      if (tag() != "WAVE") return None
      var rate = -1
      while (bb.remaining() >= 8) {
        val id = tag(); val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return None
        id match {
          case "fmt " =>
            val fmt = bb.getShort; val ch = bb.getShort
            rate = bb.getInt; bb.getInt; val align = bb.getShort
            val bits = bb.getShort
            if (fmt != 1 || ch != 1 || align != 2 || bits != 16) return None
            bb.position(bb.position() + (size - 16))
          case "data" =>
            if (rate <= 0 || size % 2 != 0) return None
            val out = new Array[Short](size / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort; i += 1 }
            return Some((rate, out))
          case _ => bb.position(bb.position() + size) // skip LIST/fact/...
        }
      }
      None
    }

    /** 16-dim features from DECODED samples: [0] RMS, [1] mean (both in
      * [-1,1]-normalized units), [2] zero-crossing rate, [3..15] a 13-bin
      * amplitude histogram (fractions).
      */
    def features(samples: Array[Short]): Array[Float] = {
      val f = new Array[Float](featureDim)
      val n = samples.length
      if (n == 0) return f
      var sumSq = 0.0; var sum = 0.0; var zc = 0
      var i = 0
      while (i < n) {
        val s = samples(i).toDouble
        sumSq += s * s; sum += s
        if (i > 0 && (samples(i) ^ samples(i - 1)) < 0) zc += 1
        val bin = ((samples(i) + 32768) * 13) >>> 16
        f(3 + bin) += 1f
        i += 1
      }
      f(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
      f(1) = (sum / n / 32768.0).toFloat
      f(2) = if (n > 1) zc.toFloat / (n - 1) else 0f
      var j = 3
      while (j < featureDim) { f(j) /= n; j += 1 }
      f
    }
  }

  /** REAL video codec: AVI — a RIFF container holding one uncompressed
    * 24-bit BI_RGB DIB video stream (`'vids'`/`'DIB '`, biCompression 0),
    * the canonical uncompressed-video form any AVI tool reads and writes.
    * [[decode]] walks the RIFF chunk tree (hdrl → strl → strf
    * BITMAPINFOHEADER for dimensions and pixel format, the movi list for
    * `00db`/`00dc` frame chunks, even-byte chunk padding) and unpacks each
    * frame's bottom-up, 4-byte-row-aligned BGR plane into top-down packed
    * RGB. Pure Scala, no native deps.
    */
  object AviCodec {
    val featureDim = 16

    /** Frames are top-down packed RGB, `3·w·h` bytes each. Emits 1 fps
      * timing and the same fixed header fields [[synthesizeFromDocuments]]
      * assembles from column expressions, so encode is its exact twin.
      */
    def encode(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == 3 * w * h), s"need ${3 * w * h} bytes per frame")
      val stride = (w * 3 + 3) / 4 * 4
      val frameBytes = stride * h
      val moviSize = 4 + frames.length * (8 + frameBytes)
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + 200 + 8 + moviSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      tag("RIFF"); bb.putInt(4 + 200 + 8 + moviSize); tag("AVI ")
      tag("LIST"); bb.putInt(192); tag("hdrl")
      tag("avih"); bb.putInt(56)
      bb.putInt(1000000).putInt(0).putInt(0).putInt(0) // µs/frame, maxBps, padGran, flags
        .putInt(frames.length).putInt(0).putInt(1).putInt(frameBytes + 8) // totalFrames, initial, streams, sugBuf
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0) // dims + reserved[4]
      tag("LIST"); bb.putInt(116); tag("strl")
      tag("strh"); bb.putInt(56)
      tag("vids"); tag("DIB ")
      bb.putInt(0).putInt(0).putInt(0) // flags, prio+lang, initialFrames
        .putInt(1).putInt(1).putInt(0) // scale, rate, start
        .putInt(frames.length).putInt(frameBytes + 8).putInt(0).putInt(0) // length, sugBuf, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
      tag("strf"); bb.putInt(40)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24) // BITMAPINFOHEADER
        .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
      tag("LIST"); bb.putInt(moviSize); tag("movi")
      frames.foreach { rgb =>
        tag("00db"); bb.putInt(frameBytes)
        var y = h - 1 // stored rows are bottom-up BGR
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val s = 3 * (y * w + x)
            bb.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s))
            x += 1
          }
          var p = w * 3
          while (p < stride) { bb.put(0.toByte); p += 1 }
          y -= 1
        }
      }
      bb.array()
    }

    /** None for anything that isn't a complete uncompressed-DIB AVI.
      * Returns (width, height, frames as top-down packed RGB).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
      if (bytes == null || bytes.length < 12) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      bb.getInt // trust the chunk walk, not the declared size
      if (tag() != "AVI ") return None
      var w = 0; var biH = 0; var haveFmt = false
      val stored = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int): Boolean = { // false on malformed
        while (bb.position() + 8 <= end) {
          val id = tag(); val size = bb.getInt
          if (size < 0 || bb.position() + size > end) return false
          val next = math.min(bb.position() + size + (size & 1), end) // RIFF pads chunks to even
          id match {
            case "LIST" =>
              val lt = tag()
              if ((lt == "hdrl" || lt == "strl" || lt == "movi") &&
                !walk(bb.position() + size - 4)) return false
            case "strf" =>
              if (size < 40 || haveFmt) return false
              bb.getInt // biSize (≥40; trailing palette bytes are skipped by `next`)
              w = bb.getInt; biH = bb.getInt
              val planes = bb.getShort; val bits = bb.getShort
              val compression = bb.getInt
              if (w <= 0 || biH == 0 || planes != 1 || bits != 24 ||
                compression != 0) return false // BI_RGB only
              haveFmt = true
            case "00db" | "00dc" =>
              val f = new Array[Byte](size); bb.get(f); stored += f
            case _ => // strh/avih/JUNK/idx1/...: sized skip
          }
          bb.position(next)
        }
        true
      }
      if (!walk(bytes.length) || !haveFmt) return None
      val h = math.abs(biH) // negative biHeight = stored top-down
      val bottomUp = biH > 0
      val stride = (w * 3 + 3) / 4 * 4
      if (stored.exists(_.length != stride * h)) return None
      val frames = stored.map { f =>
        val rgb = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          val sy = if (bottomUp) h - 1 - y else y
          var x = 0
          while (x < w) {
            val s = sy * stride + 3 * x; val d = 3 * (y * w + x)
            rgb(d) = f(s + 2); rgb(d + 1) = f(s + 1); rgb(d + 2) = f(s)
            x += 1
          }
          y += 1
        }
        rgb
      }
      Some((w, h, frames.toSeq))
    }

    /** Same formula as [[PpmCodec.features]], pooled across every decoded
      * frame: [0..2] mean R/G/B in [0,1], [3..15] a 13-bin ITU-R 601
      * luminance histogram (fractions).
      */
    def features(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Float] = {
      val f = new Array[Float](featureDim)
      val n = w * h * frames.length
      if (n == 0) return f
      frames.foreach { rgb =>
        var i = 0
        while (i < w * h) {
          val r = rgb(3 * i) & 0xff
          val g = rgb(3 * i + 1) & 0xff
          val b = rgb(3 * i + 2) & 0xff
          f(0) += r; f(1) += g; f(2) += b
          val lum = (r * 299 + g * 587 + b * 114) / 1000
          f(3 + lum * 13 / 256) += 255f
          i += 1
        }
      }
      var j = 0
      while (j < featureDim) { f(j) /= (255f * n); j += 1 }
      f
    }
  }

  /** Synthesize a deterministic media table from the `documents` fixture —
    * exercises the exact schema and column shapes a real ingest would
    * produce. IMAGE rows carry a genuine binary P6 PPM payload (tiny
    * 8–16 × 8–16 px, pixel channels a deterministic function of doc_id,
    * restricted to the ASCII range so the payload assembles from pure
    * column expressions — the whole synthesis stays codegen'd and
    * column-prunable, no UDF). Audio rows carry a genuine RIFF/WAVE PCM
    * payload and video rows a genuine uncompressed-DIB AVI, both with the
    * text bytes as the sample/pixel stream.
    */
  def synthesizeFromDocuments(docs: DataFrame): DataFrame = {
    val modality = element_at(typedLit(Seq("image", "audio", "video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val w = (lit(8) + pmod(col("doc_id"), lit(9))).cast("int")
    val h = (lit(8) + pmod(expr("doc_id DIV 9"), lit(9))).cast("int")
    // 3·w·h pixel bytes, byte_i = 32 + (m·m mod 9973) mod 95 with
    // m = (doc_id mod 9973)·31 + i·step, step = 7 + (doc_id div 95)
    // mod 89 — printable ASCII, so encode(str) yields exactly those
    // channel bytes. The shape of this formula is load-bearing for the
    // aHash index's scaling, measured on the 100x probe fixture
    // (166k images):
    //   - a FIXED step with bytes linear in i collapsed the image space
    //     to 95 phases × 25 sizes = 2,375 distinct images ever — the
    //     corpus saturated it and banded-pHash candidate pairs went
    //     quadratic (328M pairs, billed 328x);
    //   - SMOOTH (arithmetic-progression) luminance keeps every 16-bit
    //     hash band on a few hundred run-structured patterns (46-167M
    //     pairs even with a per-doc step), because threshold bits of a
    //     monotone-ish sequence come in runs;
    //   - 4-8 px sources upsampled to the 8x8 grid duplicate pixels
    //     across cells, capping the whole hash at w·h independent bits.
    // The quadratic-residue mix (m² mod prime) plus 8-16 px sources give
    // the hash the per-band entropy a real photo corpus has: measured
    // 237k distinct (band, value) buckets, max occupancy 16, 0.9M
    // candidate pairs at 166k images — linear. m stays ≤ ~4·10⁵ so m²
    // is exact in longs under ANSI on both engines.
    val step = lit(7) + pmod(expr("doc_id DIV 95"), lit(89))
    val pixels = array_join(
      transform(sequence(lit(0), w * h * lit(3) - 1),
        i => {
          val m = pmod(col("doc_id"), lit(9973)) * 31 + i * step
          chr(lit(32) + pmod(pmod(m * m, lit(9973)), lit(95)))
        }), "")
    val ppmHeader = concat_ws("", lit("P6\n"), w.cast("string"), lit(" "),
      h.cast("string"), lit("\n255\n"))
    // audio: a genuine RIFF/WAVE PCM s16le mono payload whose sample
    // bytes are the text bytes (any byte is valid PCM), padded to a whole
    // sample; the header's little-endian length fields assemble through
    // hex strings + unhex, keeping the synthesis pure column expressions
    def le32(v: Column): Column = {
      val x = lpad(lower(hex(v)), 8, "0")
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    val tb = encode(col("text"), "UTF-8")
    val dataLen = (length(tb) + pmod(length(tb), lit(2))).cast("int")
    val wavFixed = // "WAVEfmt " + size 16 + PCM,mono + 16 kHz + 32 kB/s + align 2 + 16 bit + "data"
      "57415645666d74201000000001000100803e0000007d00000200100064617461"
    val wav = concat(
      unhex(concat(lit("52494646"), le32(dataLen + 36), lit(wavFixed), le32(dataLen))),
      tb,
      when(pmod(length(tb), lit(2)) === 1, unhex(lit("00"))).otherwise(unhex(lit(""))))
    // video: a genuine AVI — RIFF('AVI ') with a 200-byte hdrl list (avih +
    // one 'vids'/'DIB ' stream header + BITMAPINFOHEADER at 4×4×24bpp
    // BI_RGB) and a movi list of '00db' frames whose stored DIB planes are
    // the text bytes (any byte is a valid BGR sample; 4 px × 3 B = 12 B
    // rows are already 4-byte aligned), space-padded to whole 48-byte
    // frames. Every little-endian length/count field assembles through
    // hex + unhex, keeping the synthesis pure column expressions that
    // AviCodec.encode reproduces byte-for-byte.
    val nFrames = greatest(lit(1), floor((length(tb) + lit(47)) / lit(48)).cast("int"))
    val framePad = (nFrames * 48 - length(tb)).cast("int")
    val aviFixedA = // LIST 192 'hdrl'; 'avih' 56: 1e6 µs/frame, maxBps/padGran/flags 0
      "4c495354c00000006864726c617669683800000040420f00" + "00" * 12
    val aviFixedB = // avih tail: initialFrames 0, streams 1, sugBuf 56, 4×4, reserved[4];
      // LIST 116 'strl'; 'strh' 56: 'vids'/'DIB ', flags/prio/initFrames 0,
      // scale 1, rate 1, start 0
      "0000000001000000380000000400000004000000" + "00" * 16 +
        "4c495354740000007374726c7374726838000000" +
        "7669647344494220" + "00" * 12 + "010000000100000000000000"
    val aviFixedC = // strh tail: sugBuf 56, quality/sampleSize 0, rcFrame {0,0,4,4};
      // 'strf' 40: BITMAPINFOHEADER 40, 4×4, planes 1 + 24bpp, BI_RGB,
      // sizeImage 48, x/y ppm + palette counts 0; then the movi LIST tag
      "380000000000000000000000" + "0000000004000400" +
        "737472662800000028000000040000000400000001001800000000003000000" +
        "0" + "00" * 16 + "4c495354"
    val aviHead = unhex(concat(
      lit("52494646"), le32(nFrames * 56 + 216), lit("41564920" + aviFixedA),
      le32(nFrames), lit(aviFixedB), le32(nFrames), lit(aviFixedC),
      le32(nFrames * 56 + 4), lit("6d6f7669")))
    val paddedPixels = // empty text still needs one whole 48-byte frame
      concat(tb, encode(lit(" " * 48), "UTF-8").substr(lit(1), framePad))
    val avi = concat(aviHead,
      aggregate(sequence(lit(0), nFrames - 1), lit(Array.emptyByteArray),
        (acc, i) => concat(acc, unhex(lit("3030646230000000")), // '00db' 48
          paddedPixels.substr(i * 48 + 1, lit(48)))))
    docs.select(
      col("doc_id").as("media_id"),
      modality.as("modality"),
      when(modality === "image", encode(concat(ppmHeader, pixels), "UTF-8"))
        .when(modality === "audio", wav)
        .otherwise(avi).as("content"),
      struct(
        when(modality === "image", lit("image/x-portable-pixmap"))
          .when(modality === "audio", lit("audio/wav"))
          .otherwise(lit("video/x-msvideo")).as("mime"),
        lit(null).cast(IntegerType).as("width"), // decode fills dimensions
        lit(null).cast(IntegerType).as("height"),
        (length(col("text")) * 10L).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  /** Batch feature extraction: one decoder instantiation per partition,
    * iterator-to-iterator (never materializes a partition) — the
    * `mapInPandas` shape, minus pandas.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(
        col("media_id"), col("modality"), col("content"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec setup would happen here
        rows.map { r =>
          val nBytes = Option(r.content).map(_.length).getOrElse(0)
          PpmCodec.decode(r.content) match {
            case Some((w, h, rgb)) => // real image decode: dims + features
              // come from the parsed header and actual pixel plane
              MediaFeatures(r.media_id, r.modality, nBytes, w, h,
                PpmCodec.features(w, h, rgb))
            case None => WavCodec.decode(r.content) match {
              case Some((_, samples)) => // real audio decode: "width" is
                // the sample count, features from the decoded stream
                MediaFeatures(r.media_id, r.modality, nBytes,
                  samples.length, 0, WavCodec.features(samples))
              case None => AviCodec.decode(r.content) match {
                case Some((w, h, frames)) => // real video decode: dims from
                  // BITMAPINFOHEADER, features pooled over decoded frames
                  MediaFeatures(r.media_id, r.modality, nBytes, w, h,
                    AviCodec.features(w, h, frames))
                case None => // unparseable payload: zero vector, 0×0 —
                  // honest "no decode", never fabricated features
                  MediaFeatures(r.media_id, r.modality, nBytes, 0, 0,
                    new Array[Float](PpmCodec.featureDim))
              }
            }
          }
        }
      }
  }

  /** Windowed RMS loudness over REAL WAV decode: audio rows only, PCM
    * stream cut into fixed `window`-sample frames (tail partial dropped),
    * per-frame energy = exact integer Σ sample² computed inside the
    * per-partition decode loop — so only (media_id, sample_rate,
    * n_samples, energy array) leaves the decoder, never samples. Peak
    * selection and the RMS arithmetic run as column HOFs on the
    * frame-count-sized array; the frame argmax tie-breaks on the FIRST
    * occurrence of the exact integer energy (cross-engine safe — no
    * float compare decides a rank). Streams shorter than one window
    * report NULL loudness, never NaN.
    */
  /** Per-frame integer energies off the real WAV decode — the shared
    * front half of [[audioLoudness]] and the VAD segmenter: audio rows
    * only, PCM cut into `window`-sample frames (tail dropped), energy =
    * exact integer Σ sample² computed inside the per-partition decode
    * loop, so only (media_id, sample_rate, n_samples, energy[]) leaves
    * the decoder — never samples.
    */
  def audioFrameEnergies(
      spark: SparkSession, media: DataFrame, window: Int = 50): DataFrame = {
    import spark.implicits._
    require(window > 0)
    media.filter(col("modality") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          WavCodec.decode(bytes).map { case (sr, samples) =>
            val nw = samples.length / window
            val energy = Array.tabulate(nw) { wi =>
              var s = 0L
              var i = wi * window
              val end = i + window
              while (i < end) { val v = samples(i).toLong; s += v * v; i += 1 }
              s
            }
            (id, sr, samples.length, energy)
          }
        }
      }.toDF("media_id", "sample_rate", "n_samples", "energy")
  }

  def audioLoudness(
      spark: SparkSession, media: DataFrame, window: Int = 50): DataFrame = {
    val decoded = audioFrameEnergies(spark, media, window)
    val w = lit(window.toDouble)
    val peak = array_max(col("energy"))
    decoded.select(col("media_id"), col("sample_rate"),
      col("n_samples"), size(col("energy")).as("n_windows"),
      when(size(col("energy")) > 0,
        (array_position(col("energy"), peak) - 1).cast("int"))
        .as("peak_window"),
      when(size(col("energy")) > 0, round(sqrt(peak / w), 6))
        .as("peak_rms"),
      when(size(col("energy")) > 0,
        round(aggregate(col("energy"), lit(0.0),
          (acc, x) => acc + sqrt(x / w)) / size(col("energy")), 6))
        .as("mean_rms"))
  }

  final case class ResizedMedia(
      media_id: Long, modality: String, content: Array[Byte],
      width: Int, height: Int)

  /** Batch resize for image rows: same iterator-per-partition shape as
    * [[extractFeatures]], with a REAL nearest-neighbor resampler — decode
    * the P6 payload, sample source pixels at `(x·srcW/w, y·srcH/h)`,
    * re-encode as P6 at the new dimensions. Binary in, binary out, nothing
    * shuffled. A payload that doesn't parse as PPM falls back to a
    * truncate/pad gray plane (deterministic, clearly not a decode).
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.filter(col("modality") === "image")
      .select(col("media_id"), col("modality"), col("content"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val rgb = PpmCodec.decode(r.content) match {
            case Some((sw, sh, src)) =>
              val out = new Array[Byte](3 * w * h)
              var y = 0
              while (y < h) {
                val sy = y * sh / h
                var x = 0
                while (x < w) {
                  val sx = x * sw / w
                  val s = 3 * (sy * sw + sx); val d = 3 * (y * w + x)
                  out(d) = src(s); out(d + 1) = src(s + 1); out(d + 2) = src(s + 2)
                  x += 1
                }
                y += 1
              }
              out
            case None =>
              java.util.Arrays.copyOf(
                Option(r.content).getOrElse(Array.emptyByteArray), 3 * w * h)
          }
          ResizedMedia(r.media_id, r.modality, PpmCodec.encode(w, h, rgb), w, h)
        }
      }
  }

  final case class VideoFrame(media_id: Long, frame_idx: Int,
      frame: Array[Byte])

  /** Explode every video payload into its decoded frames (top-down packed
    * RGB) — one decoder per partition, iterator-to-iterator, nothing
    * driver-side. Payloads that don't parse emit no frames (same honest
    * no-decode stance as [[extractFeatures]]).
    */
  def videoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("modality"), col("content"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AviCodec.decode(r.content) match {
            case Some((_, _, frames)) => frames.iterator.zipWithIndex
              .map { case (f, i) => VideoFrame(r.media_id, i, f) }
            case None => Iterator.empty
          }
        }
      }
  }

  /** Cross-video duplicate-frame detection: md5 each DECODED frame
    * map-side (only the 32-char hex ever shuffles, never pixel bytes) and
    * keep the hashes that occur more than once — the static-intro /
    * boilerplate-frame dedup a video training corpus runs before
    * sampling. The hash-groupBy is the exact-dedup shape: partial
    * aggregation before one shuffle on the hash key, no pairwise
    * comparison anywhere.
    */
  /** Consecutive-frame difference stream for shot-boundary detection:
    * decode each AVI map-side and emit one (media_id, boundary_idx,
    * Σ|a−b| over channel bytes) row per adjacent frame pair — the
    * frames of one video sit in one row, so the pairing is LOCAL to
    * the decode (no shuffle, no window; pixel bytes never leave the
    * task — the [[duplicateFrames]] contract). Unsigned byte
    * arithmetic; single-frame videos emit nothing.
    */
  def shotCutDiffs(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          AviCodec.decode(bytes).toSeq.flatMap { case (_, _, frames) =>
            frames.iterator.sliding(2).withPartial(false).zipWithIndex
              .map { case (pair, i) =>
                val (a, b) = (pair.head, pair(1))
                var sd = 0L
                var k = 0
                while (k < a.length && k < b.length) {
                  sd += math.abs((a(k) & 0xFF) - (b(k) & 0xFF)); k += 1
                }
                (id, i.toLong, sd)
              }
          }
        }
      }.toDF("media_id", "boundary_idx", "sdiff")
  }

  def duplicateFrames(spark: SparkSession, media: DataFrame): DataFrame =
    videoFrames(spark, media)
      .select(col("media_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"))
      .groupBy("frame_md5")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("media_id").as("n_videos"),
        min("media_id").as("min_media_id"))
      .filter(col("n_occurrences") > 1)

  /** Near-duplicate IMAGE detection by perceptual hash: decode each P6
    * payload map-side and emit only the 64-bit aHash as four 16-bit
    * bands (pixel bytes never shuffle — the same contract as
    * [[duplicateFrames]]); candidate pairs come from a bucket join on
    * (band index, band value) — the multi-index Hamming search, exact
    * for distance ≤ 3 by pigeonhole over 4 bands and the standard
    * near-dup index shape at corpus scale (at 100 TB the band key
    * would widen with the hash, e.g. 4×32 of a 128-bit pHash) — then
    * the survivors' full-hash Hamming distance is checked band-wise
    * with `bit_count(xor)`. Never all-pairs. Output:
    * (id_a < id_b, hamming ≤ maxHamming).
    */
  def nearDupImages(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 4): DataFrame = {
    import spark.implicits._
    val hashed = media.filter(col("modality") === "image")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          PpmCodec.decode(bytes).map { case (w, h, rgb) =>
            val hv = PpmCodec.aHash(w, h, rgb)
            (id, ((hv >>> 0) & 0xffff).toInt, ((hv >>> 16) & 0xffff).toInt,
              ((hv >>> 32) & 0xffff).toInt, ((hv >>> 48) & 0xffff).toInt)
          }
        }
      }.toDF("media_id", "b0", "b1", "b2", "b3")
      .localCheckpoint(eager = false) // two join sides, one decode pass
    val bands = hashed.select(col("media_id"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "bv")))
    val a = bands.select(col("media_id").as("id_a"), col("band"),
      col("bv"), col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val b = bands.select(col("media_id").as("id_b"), col("band"),
      col("bv"), col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).as("hamming"))
      // a pair sharing k bands appears k times: one keyed dedup (the
      // hamming is functionally determined, min is just a reducer)
      .groupBy("id_a", "id_b").agg(min("hamming").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame-sample timestamps for video rows from metadata only — pure
    * column math, binary column untouched (and pruned at scan).
    */
  def frameSampleTimestamps(media: DataFrame, fps: Double = 1.0): DataFrame =
    media.filter(col("modality") === "video")
      .select(
        col("media_id"),
        col("meta.duration_ms").as("duration_ms"),
        sequence(lit(0L), col("meta.duration_ms"),
          lit(math.max(1L, (1000 / fps).toLong))).as("frame_ts_ms"))

  /** Metadata-only projection — demonstrates binary-column pruning. */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
      col("meta.duration_ms").as("duration_ms"), col("meta.sample_rate").as("sample_rate"))
}

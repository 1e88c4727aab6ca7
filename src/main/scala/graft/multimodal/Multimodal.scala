package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, functions => F}
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types._

/**
 * Multimodal column handling for training-data pipelines: image/audio/video
 * travel as opaque `binary` columns next to a typed metadata struct; decode /
 * feature-extraction / resize / frame-sampling run per partition so a native
 * decoder library is loaded once per executor core, not once per row.
 *
 * The Spark-side plumbing — schema, partitioning, iterator-to-iterator batch
 * shape, feature-vector output type — is real and tested. The decode kernels
 * themselves are STUBS (deterministic functions of the payload bytes): the
 * image/audio libraries are not in this container. A real decoder plugs in
 * through the [[MediaCodec]] SPI (registration or ServiceLoader, resolved
 * by name executor-side) without touching any operator or query.
 *
 * Scale notes: payloads never shuffle for metadata-only queries (the meta
 * struct is a separate column, so column pruning keeps scans payload-free —
 * check ReadSchema in .explain); feature extraction is a narrow
 * mapPartitions (no shuffle); frame sampling is pure column algebra.
 */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MetaType)))

  /**
   * Derive a media table from a text corpus for testing: payload = UTF-8
   * bytes of the text (a stand-in for encoded image/audio bytes), media_type
   * assigned round-robin, metadata derived deterministically from payload
   * length — a STUB for header parsing (real decoders read these fields from
   * the container format).
   */
  def deriveMediaTable(documents: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = F.encode(col(textCol), "UTF-8")
    val size = F.octet_length(col(textCol))
    documents.select(
      col(idCol).cast(LongType).as("media_id"),
      F.element_at(F.typedlit(Seq("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("media_type"),
      payload.as("payload"),
      F.struct(
        (size % 640 + 64).cast(IntegerType).as("width"),
        (size % 480 + 48).cast(IntegerType).as("height"),
        lit(3).as("channels"),
        when(col(idCol) % 3 === 1, 16000).otherwise(lit(null)).cast(IntegerType).as("sample_rate"),
        (size * 10L).cast(LongType).as("duration_ms")).as("meta"))
  }

  /**
   * Synthesize a media table whose payloads are REAL encoded PNG bytes —
   * the fixture path that drives [[ImageIoCodec]] (a genuine
   * javax.imageio decode) end-to-end through [[extractFeatures]] under a
   * cross-engine oracle. Each id yields a solid-color image whose
   * dimensions and channel values are pure arithmetic on the id:
   *
   *   width = id % 5 + 2, height = id % 3 + 2,
   *   (r, g, b) = (id % 256, id*7 % 256, id*13 % 256)
   *
   * so the decoded features are analytically predictable WITHOUT running
   * the codec: slot sums are width·height·channel (PNG is lossless; the
   * images are ≤ 28 px, sums ≤ 7140 — exact in float32). A real pipeline
   * reads encoded bytes from storage; this generator stands in because
   * the container ships no image corpus, while the encode→decode round
   * trip through the JDK's PNG reader/writer stays fully real.
   *
   * Encoding runs per partition (narrow, no shuffle), mirroring the
   * decode loop; the output stream is wrapped in a
   * MemoryCacheImageOutputStream so ImageIO never spills per-row temp
   * files regardless of the JVM-global disk-cache flag.
   */
  def synthesizeImageTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (id % 5 + 2).toInt
          val h = (id % 3 + 2).toInt
          val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bytes = new java.io.ByteArrayOutputStream()
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bytes)
          javax.imageio.ImageIO.write(img, "png", out)
          out.close()
          Row(id, "image", bytes.toByteArray, Row(w, h, 3, null, w.toLong * h))
        }
      }(encoder)
  }

  /**
   * Synthesize a media table whose payloads are REAL encoded WAV bytes —
   * the audio twin of [[synthesizeImageTable]], driving [[WavCodec]] (a
   * genuine javax.sound.sampled decode) end-to-end through
   * [[extractFeatures]] under a cross-engine oracle. Each id yields an
   * 8-bit unsigned PCM clip whose shape and per-channel constant sample
   * values are pure arithmetic on the id:
   *
   *   channels = id % 2 + 1, sample rate = 8000 Hz, frames = id % 32 + 8,
   *   sample value on channel ch = id·(11 + 6·ch) % 256
   *
   * so the decoded features are analytically predictable WITHOUT running
   * the codec: per-channel sums are frames·value (≤ 39·255 — exact in
   * float32). The WAV container itself is written by the JDK's own WAVE
   * writer, so the encode→decode round trip is fully real; the generator
   * stands in for an audio corpus the container doesn't ship.
   *
   * Encoding runs per partition (narrow, no shuffle), mirroring the
   * decode loop.
   */
  def synthesizeAudioTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val channels = (id % 2 + 1).toInt
          val frames = (id % 32 + 8).toInt
          val pcm = new Array[Byte](frames * channels)
          var i = 0
          while (i < pcm.length) {
            val ch = i % channels
            pcm(i) = ((id * (11 + 6 * ch)) % 256).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            8000f, 8, channels, channels, 8000f, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bytes = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bytes)
          Row(id, "audio", bytes.toByteArray,
            Row(null, null, channels, 8000, frames * 1000L / 8000L))
        }
      }(encoder)
  }

  /**
   * Synthesize a media table whose payloads are REAL AVI containers with
   * uncompressed 24-bit DIB frames — the video twin of
   * [[synthesizeImageTable]]/[[synthesizeAudioTable]], driving [[AviCodec]]
   * (genuine RIFF container parsing + raster decode) end-to-end through
   * [[extractFeatures]] under a cross-engine oracle. Each id yields a clip
   * whose geometry and per-frame solid colors are pure arithmetic on the id:
   *
   *   width = id % 3 + 2, height = id % 2 + 2, frames = id % 4 + 2,
   *   frame f color = (id·7 + f·31, id·11 + f·37, id·13 + f·41) % 256
   *
   * DIB frames are lossless, so the decoded per-channel sums are exactly
   * width·height·Σ_f channel(id, f) (≤ 12·255·5 — exact in float32). The
   * MJPEG (`dc`) half of the codec is exercised by `AviCodecSpec` with a
   * decode-tolerance check instead, JPEG being lossy.
   */
  def synthesizeVideoTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (id % 3 + 2).toInt
          val h = (id % 2 + 2).toInt
          val n = (id % 4 + 2).toInt
          val frames = (0 until n).map { f =>
            val rgb = (((id * 7 + f * 31) % 256).toInt,
              ((id * 11 + f * 37) % 256).toInt,
              ((id * 13 + f * 41) % 256).toInt)
            AviBuilder.dibFrame(w, h, (_, _) => rgb)
          }
          val bytes = AviBuilder.avi(w, h, frames.map(fr => (true, fr)))
          Row(id, "video", bytes, Row(w, h, 3, null, n * 40L))
        }
      }(encoder)
  }

  /**
   * Synthesized MJPEG video corpus — the compressed-frame twin of
   * [[synthesizeVideoTable]]: each id yields an AVI whose `00dc` frames are
   * genuine JDK-encoded JPEG bytes (solid-color frames, id arithmetic).
   * JPEG is lossy, so per-channel sums are NOT analytically predictable —
   * but the CONTAINER half of the decode (frame count and dims from the
   * `strh`/`strf` chunk walk) is exact, which is what the mm7 oracle
   * certifies: frames = id%3+1, w = id%5+8, h = id%3+8. Frame pixel
   * fidelity is pinned separately by `AviCodecSpec`'s quantization-
   * tolerance test.
   */
  def synthesizeMjpegVideoTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (id % 5 + 8).toInt
          val h = (id % 3 + 8).toInt
          val n = (id % 3 + 1).toInt
          val frames = (0 until n).map { f =>
            val rgb = ((((id * 7 + f * 31) % 256).toInt << 16) |
              (((id * 11 + f * 37) % 256).toInt << 8) |
              ((id * 13 + f * 41) % 256).toInt)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            (false, bos.toByteArray)
          }
          val bytes = AviBuilder.avi(w, h, frames)
          Row(id, "video", bytes, Row(w, h, 3, null, n * 40L))
        }
      }(encoder)
  }

  /**
   * Synthesized IMA ADPCM audio corpus — the COMPRESSED-format leg of the
   * audio family (mm5's WAV corpus is uncompressed PCM): each id yields a
   * genuine mono IMA ADPCM WAVE (format tag 0x11, fmt extension, fact
   * chunk, 20-byte blocks) whose blocks carry [[AdpcmCodec.FixedPattern]]
   * nibbles under an id-derived initial predictor. Because `vpdiff` never
   * depends on the predictor until the int16 clamp (which the bounded
   * pattern and the [10, 209] predictor range keep unreachable), every
   * decoded block is exactly `predictor + D_k` for the fixed offset
   * sequence — so frames AND the decoded sample sum are pure id
   * arithmetic: blocks = id%3+1, predictor = id%200+10, sum = blocks *
   * (33*predictor + [[AdpcmCodec.FixedPatternOffsetSum]]). The mm8 oracle
   * reconstructs that in SQL with no audio code; a decoder bug anywhere in
   * the state machine (vpdiff assembly, sign, index walk, nibble order,
   * block header) lands off the analytic line and fails the oracle.
   */
  def synthesizeAdpcmAudioTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val pred = (id % 200 + 10).toInt
          val nBlocks = (id % 3 + 1).toInt
          val bytes = AdpcmCodec.buildWav(8000, Seq.fill(nBlocks)(pred))
          val frames = nBlocks * AdpcmCodec.CorpusSamplesPerBlock
          Row(id, "audio", bytes, Row(null, null, 1, 8000, frames * 1000L / 8000))
        }
      }(encoder)
  }

  /**
   * Synthesize a media table whose payloads are REAL G.711 WAVE containers
   * — µ-law (format tag 7) for most ids, A-law (tag 6) for ids ≡0 mod 3,
   * so one query exercises BOTH expansion tables — driving [[G711Codec]]
   * through [[extractFeatures]] under a cross-engine oracle. Geometry and
   * content are pure id arithmetic:
   *
   *   channels = id % 2 + 1, rate = 8000 Hz, frames = id % 32 + 8,
   *   code byte on channel ch = id·(11 + 6·ch) % 256 (constant per channel)
   *
   * so each per-channel decoded sum is exactly frames · g711(code), and
   * the G.711 expansion itself is integer shift/mask arithmetic the mm9
   * oracle writes directly in SQL (|sum| ≤ 39·32256 — exact in float32).
   * The container is written by the JDK's own WAVE writer, whose
   * ULAW/ALAW support makes the encode→decode round trip fully real.
   */
  def synthesizeG711AudioTable(ids: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(MediaSchema)
    ids.select(col(idCol).cast(LongType).as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val channels = (id % 2 + 1).toInt
          val frames = (id % 32 + 8).toInt
          val codes = new Array[Byte](frames * channels)
          var i = 0
          while (i < codes.length) {
            val ch = i % channels
            codes(i) = ((id * (11 + 6 * ch)) % 256).toByte
            i += 1
          }
          val enc =
            if (id % 3 == 0) javax.sound.sampled.AudioFormat.Encoding.ALAW
            else javax.sound.sampled.AudioFormat.Encoding.ULAW
          val fmt = new javax.sound.sampled.AudioFormat(
            enc, 8000f, 8, channels, channels, 8000f, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(codes), fmt, frames.toLong)
          val bytes = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bytes)
          Row(id, "audio", bytes.toByteArray,
            Row(null, null, channels, 8000, frames * 1000L / 8000L))
        }
      }(encoder)
  }

  /**
   * Media table whose payloads are raw-snappy-compressed UTF-8 text — the
   * fixture corpus for the jar-dropped codec path (mm10): the
   * [[CodecJarBuilder]] jar's `airlift-snappy` codec decompresses the
   * payload with Airlift's `SnappyDecompressor` and folds the DECOMPRESSED
   * bytes with the stub kernel, so the DuckDB oracle is plain byte
   * arithmetic over the original text (mm2's SQL shape) and discriminates:
   * features of the compressed bytes (codec skipped the decode, or the
   * stub ran instead) sum differently. Compression runs per partition with
   * one reused compressor instance — narrow, no shuffle.
   */
  def synthesizeSnappyDocTable(documents: DataFrame, idCol: String,
                               textCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    documents.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        val comp = new io.airlift.compress.snappy.SnappyCompressor
        rows.map { r =>
          val text = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val buf = new Array[Byte](comp.maxCompressedLength(text.length))
          val m = comp.compress(text, 0, text.length, buf, 0, buf.length)
          Row(r.getLong(0), "snappy-doc", java.util.Arrays.copyOf(buf, m))
        }
      }(encoder)
  }

  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte], features: Array[Float])

  /**
   * STUB decode kernel: deterministic feature vector from payload bytes.
   * A real implementation decodes the image/audio and runs a preprocessor;
   * only this function changes — the partition plumbing stays.
   */
  object StubDecoder {
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      // integer byte sums: exactly representable in float32 for payloads
      // < 64 KiB, so cross-engine verification is bit-stable
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff).toFloat
        i += 1
      }
      out
    }
  }

  /**
   * Per-partition feature extraction: iterator-in/iterator-out so decoder
   * state (model weights, codec contexts) initializes once per partition.
   * Narrow transformation — no shuffle; output column is array<float>
   * compatible with [[graft.similarity.Knn]].
   *
   * `codec` names a [[MediaCodec]] resolved from [[MediaCodecs]] ON THE
   * EXECUTOR, once per partition — only the name rides the task closure, so
   * non-serializable native decoders plug in via registration/ServiceLoader
   * without touching this operator (default: the deterministic stub).
   */
  def extractFeatures(media: DataFrame, dims: Int = 64,
                      codec: String = "stub"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(FloatType))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        // executor-side, once per partition: registry lookup + any lazy
        // codec init the implementation does
        val c = MediaCodecs(codec)
        rows.map { r =>
          // positional access (the select above fixes the order): adjacent
          // mapPartitions stages can fuse, piping schema-less GenericRows
          // straight through — by-name getAs would throw on those
          val payload = r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1),
            c.features(payload, dims).toSeq)
        }
      }(encoder)
  }

  /** Resize metadata transform (pure column algebra — a real resize would be
    * a payload kernel in [[extractFeatures]]'s partition loop). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = F.least(lit(1.0), lit(maxDim) / F.greatest(w, h).cast(DoubleType))
    media.withColumn("resized_meta", F.struct(
      F.ceil(w * scale).cast(IntegerType).as("width"),
      F.ceil(h * scale).cast(IntegerType).as("height"),
      col("meta.channels").as("channels")))
  }

  /** Sample n evenly spaced frames as payload byte-slices (video stand-in:
    * real frame extraction decodes the container; slicing shape is the same).
    * Offsets use explicit floor division — Spark's `/` is double division,
    * and feeding a double position into substr is an ANSI-mode hazard. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val len = F.octet_length(col("payload"))
    val frameLen = F.greatest((len / n).cast(IntegerType), lit(1))
    media.withColumn("frames",
      F.transform(F.sequence(lit(0), lit(n - 1)), i =>
        col("payload").substr((len * i / n).cast(IntegerType) + 1, frameLen)))
  }
}

package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpecBase

/** The real (javax.sound.sampled) audio codec behind the SPI: features must
  * match an out-of-band computation from the PCM samples the test SETS
  * (WAV is lossless PCM), never the codec's own decode path. */
class WavCodecSpec extends SparkSpecBase {

  import spark.implicits._

  /** Encode raw PCM frames into a real audio container via the JDK writer.
    * WAV is little-endian by spec (the JDK writer byte-swaps big-endian
    * input), so the big-endian decode branch is exercised through AIFF —
    * natively big-endian PCM, also read by the JDK's built-in readers. */
  private def audioBytes(pcm: Array[Byte], channels: Int, bits: Int,
                         signed: Boolean, bigEndian: Boolean = false,
                         container: AudioFileFormat.Type = AudioFileFormat.Type.WAVE,
                         rate: Float = 8000f): Array[Byte] = {
    val bytesPerFrame = channels * bits / 8
    val fmt = new AudioFormat(
      if (signed) AudioFormat.Encoding.PCM_SIGNED else AudioFormat.Encoding.PCM_UNSIGNED,
      rate, bits, channels, bytesPerFrame, rate, bigEndian)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      pcm.length.toLong / bytesPerFrame)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, container, bos)
    bos.toByteArray
  }

  test("wav codec resolves through the ServiceLoader path (never explicitly registered)") {
    val c = MediaCodecs("wav")
    assert(c.isInstanceOf[WavCodec])
    assert(MediaCodecs.registered.contains("wav"))
  }

  test("8-bit unsigned stereo: per-channel sums match the samples the test set") {
    // 4 frames x 2 channels, values chosen out-of-band
    val samples = Array(
      Array(10, 250, 0, 37), // channel 0 per frame
      Array(200, 1, 255, 99)) // channel 1 per frame
    val pcm = (0 until 4).flatMap(f => Seq(samples(0)(f).toByte, samples(1)(f).toByte)).toArray
    val got = MediaCodecs("wav").features(audioBytes(pcm, channels = 2, bits = 8, signed = false), 5)
    assert(got(0) === 2f && got(1) === 8000f && got(2) === 4f, got.toSeq)
    assert(got(3) === samples(0).sum.toFloat, got.toSeq)
    assert(got(4) === samples(1).sum.toFloat, got.toSeq)
  }

  test("16-bit signed mono: signed samples sum correctly, either endianness") {
    val values = Array(-32768, 32767, -1, 0, 12345)
    // little-endian through WAV (the container's native order); big-endian
    // through AIFF (natively big-endian PCM — WAV's writer would byte-swap)
    for ((big, container) <- Seq(
        (false, AudioFileFormat.Type.WAVE), (true, AudioFileFormat.Type.AIFF))) {
      val pcm = new Array[Byte](values.length * 2)
      values.zipWithIndex.foreach { case (v, i) =>
        val (lo, hi) = ((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
        if (big) { pcm(2 * i) = hi; pcm(2 * i + 1) = lo }
        else { pcm(2 * i) = lo; pcm(2 * i + 1) = hi }
      }
      // mono with dims=5 → 2 slots; single channel accumulates only slot 3
      val got = MediaCodecs("wav").features(
        audioBytes(pcm, channels = 1, bits = 16, signed = true, bigEndian = big,
          container = container), 5)
      assert(got(0) === 1f && got(2) === values.length.toFloat, s"big=$big: ${got.toSeq}")
      assert(got(3) === values.sum.toFloat, s"big=$big: ${got.toSeq}")
      assert(got(4) === 0f, s"big=$big: ${got.toSeq}")
    }
  }

  test("end-to-end through extractFeatures: real decode inside the partition loop") {
    val pcm = Array[Byte](5, 10, 15, 20)
    val payload = audioBytes(pcm, channels = 1, bits = 8, signed = false)
    val media = Seq((1L, "audio", payload), (2L, "audio", payload))
      .toDF("media_id", "media_type", "payload")
    val got = Multimodal.extractFeatures(media, dims = 4, codec = "wav")
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    assert(got.keySet === Set(1L, 2L))
    got.values.foreach(v => assert(v.toSeq === Seq(1f, 8000f, 4f, 50f), v.toSeq))
  }

  test("synthesizeAudioTable payloads decode to the analytic id arithmetic (mm5 contract)") {
    val ids = Seq(0L, 1L, 2L, 31L, 255L, 1000L).toDF("doc_id")
    val auds = Multimodal.synthesizeAudioTable(ids, "doc_id")
    // the payloads must be REAL WAVs (RIFF....WAVE magic), not stand-ins
    val onePayload = auds.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(onePayload.take(4), "US-ASCII") === "RIFF")
    assert(new String(onePayload.slice(8, 12), "US-ASCII") === "WAVE")
    val got = Multimodal.extractFeatures(auds, dims = 5, codec = "wav")
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    got.foreach { case (id, f) =>
      val channels = (id % 2 + 1).toInt
      val frames = (id % 32 + 8).toInt
      assert(f(0) === channels.toFloat && f(1) === 8000f && f(2) === frames.toFloat,
        s"id=$id: ${f.toSeq}")
      assert(f(3) === frames * ((id * 11) % 256).toFloat, s"id=$id: ${f.toSeq}")
      val wantCh1 = if (channels == 2) frames * ((id * 17) % 256).toFloat else 0f
      assert(f(4) === wantCh1, s"id=$id: ${f.toSeq}")
    }
  }

  test("non-audio payload fails loudly, pointing at the stub fallback") {
    val e = intercept[IllegalArgumentException] {
      MediaCodecs("wav").features("not audio".getBytes, 5)
    }
    assert(e.getMessage.contains("stub"), e.getMessage)
  }
}

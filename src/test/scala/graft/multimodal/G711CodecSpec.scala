package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpecBase

/** The G.711 codec's hand-built expansion tables, pinned OUT-OF-BAND
  * against the JDK's own ULAW/ALAW → PCM16 converter for every one of the
  * 256 codes in each law — the codec never runs the JDK conversion, so
  * agreement certifies the complement/bias/segment/sign logic rather than
  * echoing it. Container-level behavior mirrors WavCodecSpec. */
class G711CodecSpec extends SparkSpecBase {

  import spark.implicits._

  private def g711Bytes(codes: Array[Byte], channels: Int,
                        enc: AudioFormat.Encoding): Array[Byte] = {
    val fmt = new AudioFormat(enc, 8000f, 8, channels, channels, 8000f, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(codes), fmt,
      codes.length.toLong / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Ground truth: the JDK's own G.711 decoder, never touched by the codec. */
  private def jdkExpand(code: Int, enc: AudioFormat.Encoding): Int = {
    val src = new AudioInputStream(
      new ByteArrayInputStream(Array(code.toByte)),
      new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), 1L)
    val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val out = AudioSystem.getAudioInputStream(pcm, src).readAllBytes()
    ((out(0) & 0xff) | (out(1) << 8)).toShort.toInt
  }

  test("g711 codec resolves through the ServiceLoader path") {
    assert(MediaCodecs("g711").isInstanceOf[G711Codec])
    assert(MediaCodecs.registered.contains("g711"))
  }

  test("both expansion tables match the JDK's converter on all 256 codes") {
    (0 until 256).foreach { c =>
      assert(G711Codec.UlawTable(c).toInt === jdkExpand(c, AudioFormat.Encoding.ULAW),
        s"ulaw code $c")
      assert(G711Codec.AlawTable(c).toInt === jdkExpand(c, AudioFormat.Encoding.ALAW),
        s"alaw code $c")
    }
  }

  test("stereo µ-law: per-channel sums of EXPANDED samples, not raw codes") {
    // 3 frames x 2 channels; codes chosen out-of-band, sums via the
    // JDK-pinned table (the previous test certifies table == JDK truth)
    val ch = Array(Array(0, 130, 255), Array(64, 17, 200))
    val codes = (0 until 3).flatMap(f => Seq(ch(0)(f).toByte, ch(1)(f).toByte)).toArray
    val got = MediaCodecs("g711").features(
      g711Bytes(codes, 2, AudioFormat.Encoding.ULAW), 5)
    assert(got(0) === 2f && got(1) === 8000f && got(2) === 3f, got.toSeq)
    assert(got(3) === ch(0).map(G711Codec.UlawTable(_).toInt).sum.toFloat, got.toSeq)
    assert(got(4) === ch(1).map(G711Codec.UlawTable(_).toInt).sum.toFloat, got.toSeq)
  }

  test("mono A-law through extractFeatures: real decode inside the partition loop") {
    val codes = Array[Byte](0, 85, -86, -1)
    val payload = g711Bytes(codes, 1, AudioFormat.Encoding.ALAW)
    val media = Seq((1L, "audio", payload)).toDF("media_id", "media_type", "payload")
    val got = Multimodal.extractFeatures(media, dims = 4, codec = "g711")
      .select("features").as[Array[Float]].head()
    val want = codes.map(c => G711Codec.AlawTable(c & 0xff).toInt).sum.toFloat
    assert(got(0) === 1f && got(2) === 4f && got(3) === want, got.toSeq)
  }

  test("PCM payloads fail loudly (route to the wav codec instead)") {
    val pcm = new Array[Byte](8)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 8L)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val ex = intercept[IllegalArgumentException] {
      MediaCodecs("g711").features(bos.toByteArray, 4)
    }
    assert(ex.getMessage.contains("ULAW/ALAW"))
  }

  test("synthesized corpus decodes to the analytic line for both laws") {
    // mirrors the mm9 oracle's arithmetic for a handful of ids, including
    // ids ≡0 mod 3 (A-law) and both channel layouts
    val ids = Seq(3L, 4L, 7L, 12L, 25L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.synthesizeG711AudioTable(ids, "doc_id"), dims = 5, codec = "g711")
      .select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    Seq(3L, 4L, 7L, 12L, 25L).foreach { id =>
      val channels = (id % 2 + 1).toInt
      val frames = (id % 32 + 8).toInt
      val table = if (id % 3 == 0) G711Codec.AlawTable else G711Codec.UlawTable
      val f = feats(id)
      assert(f(0) === channels.toFloat && f(2) === frames.toFloat, s"id=$id: ${f.toSeq}")
      assert(f(3) === (frames * table(((id * 11) % 256).toInt)).toFloat, s"id=$id")
      val want1 = if (channels == 2) (frames * table(((id * 17) % 256).toInt)).toFloat else 0f
      assert(f(4) === want1, s"id=$id")
    }
  }
}

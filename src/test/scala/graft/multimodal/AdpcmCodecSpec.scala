package graft.multimodal

import org.apache.spark.sql.functions.{col, element_at}

import graft.SparkSpecBase

/** The IMA ADPCM (compressed audio) codec behind the SPI. The golden
  * offset vectors below were derived from the public IMA spec's state
  * machine by an INDEPENDENT implementation (not this codec), so
  * agreement certifies the decode logic, not a tautology. */
class AdpcmCodecSpec extends SparkSpecBase {

  import spark.implicits._

  /** Decoded samples for one FixedPattern block at predictor 100, step
    * index 0 — hand-derived from the spec's tables: header sample first,
    * then one sample per nibble. Sum = 33*100 + 28163 = 31463. */
  private val golden100 = Seq(
    100, 100, 100, 101, 100, 103, 100, 104, 100, 107, 97, 111, 89, 125,
    59, 195, -98, -729, 628, -1894, 2572, -4124, 5682, -6065, 8149,
    -5228, 6932, -964, 6214, 2299, 5858, 4780, 5760)

  test("adpcm codec resolves through the ServiceLoader path") {
    val c = MediaCodecs("adpcm")
    assert(c.isInstanceOf[AdpcmCodec])
    assert(MediaCodecs.registered.contains("adpcm"))
  }

  test("FixedPattern block decodes to the independently derived golden vector") {
    assert(golden100.sum === 33 * 100 + AdpcmCodec.FixedPatternOffsetSum)
    val got = MediaCodecs("adpcm").features(AdpcmCodec.buildWav(8000, Seq(100)), 4)
    assert(got(0) === 1f && got(1) === 8000f && got(2) === 33f, got.toSeq)
    assert(got(3) === golden100.sum.toFloat, s"sum: ${got(3)} want ${golden100.sum}")
  }

  test("multi-block stream decodes each block's header predictor independently") {
    val got = MediaCodecs("adpcm").features(AdpcmCodec.buildWav(8000, Seq(50, 60)), 4)
    assert(got(2) === 66f)
    val want = (33 * 50 + 28163) + (33 * 60 + 28163)
    assert(got(3) === want.toFloat, s"sum: ${got(3)} want $want")
  }

  /** Minimal hand-assembled mono IMA WAVE: blockAlign 5 (one nibble byte,
    * 3 samples/block), one block with the given predictor, step index,
    * and two nibbles (low first). */
  private def tinyWav(pred: Int, idx: Int, nibLow: Int, nibHigh: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    cc("RIFF"); le32(4 + 28 + 12 + 13); cc("WAVE")
    cc("fmt "); le32(20); le16(0x11); le16(1); le32(8000); le32(8000 * 5 / 3)
    le16(5); le16(4); le16(2); le16(3)
    cc("fact"); le32(4); le32(3)
    cc("data"); le32(5)
    le16(pred & 0xffff); out.write(idx); out.write(0)
    out.write(nibLow | (nibHigh << 4))
    out.toByteArray
  }

  test("int16 clamp: saturating up then stepping down matches the spec arithmetic") {
    // pred 32700 @ index 88 (step 32767): nibble 4 -> +36862 clamps to
    // 32767; nibble 12 -> -36862 lands at -4095 (from the CLAMPED value)
    val hi = MediaCodecs("adpcm").features(tinyWav(32700, 88, 4, 12), 4)
    assert(hi(2) === 3f)
    assert(hi(3) === (32700 + 32767 - 4095).toFloat, hi.toSeq)
    val lo = MediaCodecs("adpcm").features(tinyWav(-32700, 88, 12, 4), 4)
    assert(lo(3) === (-32700 - 32768 + 4094).toFloat, lo.toSeq)
  }

  test("synthesizeAdpcmAudioTable payloads decode to the analytic id arithmetic (mm8 contract)") {
    val ids = Seq(0L, 1L, 2L, 3L, 199L, 200L, 1000L).toDF("doc_id")
    val auds = Multimodal.synthesizeAdpcmAudioTable(ids, "doc_id")
    val rows = Multimodal.extractFeatures(auds, dims = 4, codec = "adpcm")
      .select(col("media_id"),
        element_at(col("features"), 3).cast("long").as("frames"),
        element_at(col("features"), 4).cast("long").as("sum"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val blocks = id % 3 + 1
      assert(r.getLong(1) === blocks * 33, s"frames for id $id")
      assert(r.getLong(2) === blocks * (33 * (id % 200 + 10) + 28163),
        s"sum for id $id")
    }
  }

  test("non-IMA payloads fail loudly instead of decoding garbage") {
    // PCM WAVE (fmt tag 1) must be routed to the "wav" codec
    val pcm = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
      cc("RIFF"); le32(4 + 24 + 10); cc("WAVE")
      cc("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      cc("data"); le32(2); le16(0)
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](MediaCodecs("adpcm").features(pcm, 4))
    assert(e.getMessage.contains("0x0001"))
    val notWave = intercept[IllegalArgumentException](
      MediaCodecs("adpcm").features("not a riff at all".getBytes, 4))
    assert(notWave.getMessage.contains("RIFF"))
  }
}

package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

/**
 * G.711 µ-law / A-law audio decode behind the [[MediaCodec]] SPI — the
 * telephony companding formats (format tags 7 / 6 in WAVE), and like
 * [[AdpcmCodec]] a REAL decoder rather than a JDK passthrough: the
 * container/header walk is the JDK reader's (same seam as [[WavCodec]]),
 * but the sample expansion is this codec's own table, built at class load
 * from the published G.711 expansion (the public-domain Sun g711.c
 * formulas — the same tables every telephony stack ships). The expansion
 * is pure integer arithmetic, so the mm9 oracle reconstructs decoded
 * per-channel energy in SQL with no audio code; [[G711CodecSpec]]
 * additionally pins the tables against the JDK's own ULAW/ALAW → PCM
 * converter for every one of the 256 codes.
 *
 * Feature layout (identical to [[WavCodec]], deterministic, `dims` ≥ 4):
 *  - slot 0/1/2: channel count, sample rate (Hz), frame count;
 *  - slots 3..dims-1: per-channel sums of the EXPANDED 16-bit samples,
 *    channel `ch` accumulating into slot `3 + ch % (dims-3)`.
 *
 * Fails loudly on anything but 8-bit ULAW/ALAW frames — PCM routes to
 * "wav", IMA ADPCM to "adpcm", other compressed formats to codec jars via
 * the ServiceLoader seam.
 */
final class G711Codec extends MediaCodec {
  val name = "g711"

  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    require(dims >= 4, s"g711 features need dims >= 4 (3 header slots + data), got $dims")
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            "payload is not audio the JVM's built-in readers can parse; " +
              "route non-audio payloads to another codec (e.g. \"stub\")", e)
      }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val table =
        if (enc == AudioFormat.Encoding.ULAW) G711Codec.UlawTable
        else if (enc == AudioFormat.Encoding.ALAW) G711Codec.AlawTable
        else throw new IllegalArgumentException(
          s"unsupported encoding: $enc — this codec expands 8-bit G.711 " +
            "ULAW/ALAW; PCM routes to \"wav\", IMA ADPCM to \"adpcm\"")
      require(fmt.getSampleSizeInBits == 8,
        s"G.711 frames are 8-bit, got ${fmt.getSampleSizeInBits}")
      val channels = fmt.getChannels
      val bytes = ais.readAllBytes()
      val out = new Array[Float](dims)
      out(0) = channels.toFloat
      out(1) = fmt.getSampleRate
      out(2) = (bytes.length / channels).toFloat
      val slots = dims - 3
      var i = 0
      while (i < bytes.length) {
        out(3 + (i % channels) % slots) += table(bytes(i) & 0xff).toFloat
        i += 1
      }
      out
    } finally ais.close()
  }
}

object G711Codec {
  /** µ-law code → linear 16-bit sample (Sun g711.c `ulaw2linear`):
    * complement, rebuild the biased mantissa, shift by the segment,
    * un-bias, apply sign. */
  val UlawTable: Array[Short] = Array.tabulate(256) { b =>
    val u = ~b & 0xff
    val t = (((u & 0xf) << 3) + 0x84) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** A-law code → linear 16-bit sample (Sun g711.c `alaw2linear`):
    * toggle the even bits, rebuild the segment value (segment 0 is
    * linear, higher segments double), apply sign — sign bit SET means
    * positive in A-law, the opposite of µ-law. */
  val AlawTable: Array[Short] = Array.tabulate(256) { b =>
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    val m = (a & 0xf) << 4
    val t =
      if (seg == 0) m + 8
      else if (seg == 1) m + 0x108
      else (m + 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) t else -t).toShort
  }
}

package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

/**
 * Real audio decode behind the [[MediaCodec]] SPI, built on
 * `javax.sound.sampled` — in the JDK, so it exists on every executor with
 * no extra jars, exactly like [[ImageIoCodec]] on the image side. This
 * covers WAV/AIFF/AU containers with PCM payloads (what the JVM's built-in
 * audio readers handle); compressed formats (MP3/AAC/Opus) need a
 * third-party codec jar dropped on the executor classpath via the same
 * ServiceLoader seam. Video stays on the stub/frame-sampling path — the
 * JDK ships no video decoder.
 *
 * Registered via `META-INF/services/graft.multimodal.MediaCodec`
 * (src/main/resources), resolved executor-side by name ("wav").
 *
 * Feature layout (deterministic, fixed-length `dims` ≥ 4):
 *  - slot 0/1/2: channel count, sample rate (Hz), frame count — the real
 *    header metadata a stub cannot know;
 *  - slots 3..dims-1: per-CHANNEL sums of sample values, channel `ch`
 *    accumulating into slot `3 + ch % (dims-3)` — per-channel energy, the
 *    natural audio analogue of the image codec's per-channel pixel sums.
 *    8-bit unsigned PCM samples contribute their raw 0..255 value; 16-bit
 *    signed PCM contributes the signed sample (either endianness, per the
 *    container header). Other encodings fail loudly rather than guess.
 *
 * Instances are resolved once per partition ([[Multimodal.extractFeatures]])
 * and the decode loop allocates only the output vector per row.
 */
final class WavCodec extends MediaCodec {
  val name = "wav"

  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    require(dims >= 4, s"wav features need dims >= 4 (3 header slots + data), got $dims")
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            "payload is not audio the JVM's built-in readers can decode; " +
              "route non-audio payloads to another codec (e.g. \"stub\")", e)
      }
    try {
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val enc = fmt.getEncoding
      val ok = (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8) ||
        (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16)
      require(ok, s"unsupported PCM shape: $enc/$bits-bit — this codec reads " +
        "8-bit unsigned or 16-bit signed PCM; transcode or plug a codec jar " +
        "for anything else")
      val bytes = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frames = bytes.length / (bytesPerSample * channels)
      val out = new Array[Float](dims)
      out(0) = channels.toFloat
      out(1) = fmt.getSampleRate
      out(2) = frames.toFloat
      val slots = dims - 3
      val big = fmt.isBigEndian
      var i = 0
      var ch = 0
      while (i + bytesPerSample <= bytes.length) {
        val v =
          if (bytesPerSample == 1) (bytes(i) & 0xff).toFloat
          else if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toFloat
          else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toFloat
        out(3 + ch % slots) += v
        ch = (ch + 1) % channels
        i += bytesPerSample
      }
      out
    } finally ais.close()
  }
}

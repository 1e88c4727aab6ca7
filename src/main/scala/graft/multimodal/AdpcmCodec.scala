package graft.multimodal

/**
 * IMA/DVI ADPCM audio decode behind the [[MediaCodec]] SPI — the first
 * COMPRESSED audio format in the codec family (4.25:1 vs 16-bit PCM), and
 * deliberately not a JDK passthrough: `javax.sound.sampled` does not ship
 * an IMA ADPCM decoder, so this codec implements the public IMA spec's
 * state machine (step/index tables, per-nibble `vpdiff` reconstruction,
 * int16 clamp) directly over the RIFF/WAVE container bytes (format tag
 * 0x11). It demonstrates the SPI's "plug a real compressed-format decoder
 * in by registration" story with actual decode logic rather than a
 * delegating wrapper.
 *
 * Container/format support (fails loudly outside it):
 *  - RIFF/WAVE with `fmt ` tag 0x0011 (IMA ADPCM), mono, 4 bits/sample;
 *  - block layout: 4-byte header (int16 LE predictor — emitted as the
 *    block's first sample — plus step index and a reserved byte), then
 *    nibble pairs LOW-nibble-first; `samplesPerBlock` from the fmt
 *    extension must equal `(blockAlign-4)*2 + 1`;
 *  - an optional `fact` chunk is cross-checked against the block count.
 *
 * Feature layout (deterministic, `dims` ≥ 4):
 *  - slot 0: channels, slot 1: sample rate, slot 2: total decoded samples
 *    (header sample + nibbles, per block);
 *  - slot 3: sum of ALL decoded 16-bit samples — the value the mm8 oracle
 *    reconstructs analytically (the synthesized corpus keeps the state
 *    machine in its linear region, so the decoded block is exactly
 *    `predictor + D_k` for a fixed offset sequence; see
 *    [[Multimodal.synthesizeAdpcmAudioTable]]);
 *  - slots 4..dims-1: zero.
 *
 * Registered via `META-INF/services/graft.multimodal.MediaCodec`,
 * resolved executor-side by name ("adpcm").
 */
final class AdpcmCodec extends MediaCodec {
  val name = "adpcm"

  import AdpcmCodec._

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    require(dims >= 4, s"adpcm features need dims >= 4, got $dims")
    require(payload.length >= 12 && fourcc(payload, 0) == "RIFF" &&
      fourcc(payload, 8) == "WAVE",
      "payload is not a RIFF/WAVE container; route non-WAVE payloads to " +
        "another codec (\"wav\" for PCM WAVE, \"stub\" otherwise)")

    var fmtTag = -1; var channels = -1; var sampleRate = -1
    var blockAlign = -1; var bits = -1; var samplesPerBlock = -1
    var factSamples = -1
    var dataOff = -1; var dataLen = -1

    var p = 12
    while (p + 8 <= payload.length) {
      val cc = fourcc(payload, p)
      val size = le32(payload, p + 4)
      val data = p + 8
      require(size >= 0 && data + size <= payload.length,
        s"corrupt WAVE: chunk $cc at $p claims $size bytes past the payload")
      cc match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          fmtTag = le16(payload, data)
          channels = le16(payload, data + 2)
          sampleRate = le32(payload, data + 4)
          blockAlign = le16(payload, data + 12)
          bits = le16(payload, data + 14)
          if (size >= 20) samplesPerBlock = le16(payload, data + 18)
        case "fact" if size >= 4 => factSamples = le32(payload, data)
        case "data" => dataOff = data; dataLen = size
        case _ => ()
      }
      p = data + size + (size & 1)
    }

    require(fmtTag == 0x11,
      f"not IMA ADPCM: fmt tag 0x$fmtTag%04x — this codec decodes format " +
        "0x0011; PCM WAVE belongs to the \"wav\" codec")
    require(channels == 1, s"adpcm codec decodes mono; got $channels channels")
    require(bits == 4, s"IMA ADPCM is 4 bits/sample; fmt says $bits")
    require(blockAlign > 4, s"blockAlign $blockAlign leaves no nibble bytes")
    require(samplesPerBlock == (blockAlign - 4) * 2 + 1,
      s"samplesPerBlock $samplesPerBlock != (blockAlign-4)*2+1 = " +
        s"${(blockAlign - 4) * 2 + 1} — partial-block streams unsupported")
    require(dataOff >= 0, "WAVE has no data chunk")
    require(dataLen % blockAlign == 0,
      s"data length $dataLen is not a whole number of $blockAlign-byte blocks")

    val nBlocks = dataLen / blockAlign
    val totalSamples = nBlocks * samplesPerBlock
    if (factSamples >= 0)
      require(factSamples == totalSamples,
        s"fact chunk says $factSamples samples, blocks decode to $totalSamples")

    var sum = 0L
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      var pred = (le16(payload, base) << 16) >> 16 // sign-extend int16
      var idx = payload(base + 2) & 0xff
      require(idx <= 88, s"block $b step index $idx out of range [0,88]")
      sum += pred // the header predictor is the block's first sample
      var i = 0
      val nNibbles = (blockAlign - 4) * 2
      while (i < nNibbles) {
        val byte = payload(base + 4 + (i >> 1)) & 0xff
        val d = if ((i & 1) == 0) byte & 0x0f else byte >>> 4 // low nibble first
        val step = StepTable(idx)
        var vpdiff = step >> 3
        if ((d & 1) != 0) vpdiff += step >> 2
        if ((d & 2) != 0) vpdiff += step >> 1
        if ((d & 4) != 0) vpdiff += step
        pred = if ((d & 8) != 0) pred - vpdiff else pred + vpdiff
        if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
        idx += IndexTable(d & 7)
        if (idx < 0) idx = 0 else if (idx > 88) idx = 88
        sum += pred
        i += 1
      }
      b += 1
    }

    val out = new Array[Float](dims)
    out(0) = channels.toFloat
    out(1) = sampleRate.toFloat
    out(2) = totalSamples.toFloat
    out(3) = sum.toFloat
    out
  }
}

object AdpcmCodec {

  /** IMA ADPCM quantizer step table (89 entries, public spec). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per nibble magnitude (sign bit excluded). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** The synthesized corpus' fixed 32-nibble block pattern: every nibble
    * value twice (all 16 `vpdiff`/sign/index-transition paths exercised),
    * offsets bounded (|D| ≤ 8049) so id-derived predictors stay in the
    * linear (clamp-free) region. */
  val FixedPattern: Array[Int] = Array(
    0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15,
    15, 7, 14, 6, 13, 5, 12, 4, 11, 3, 10, 2, 9, 1, 8, 0)

  /** Σ D_k over [[FixedPattern]] plus the header sample's 0 — the analytic
    * constant the mm8 oracle embeds (independently derived from the IMA
    * spec's state machine; `AdpcmCodecSpec` pins the full offset vector). */
  val FixedPatternOffsetSum: Long = 28163L

  /** Samples per block at the corpus' 20-byte blockAlign. */
  val CorpusSamplesPerBlock: Int = 33

  /** Assemble a mono IMA ADPCM WAVE: fmt (tag 0x11, ext samplesPerBlock) +
    * fact + data blocks, each block [[FixedPattern]] nibbles under the
    * given initial predictor, step index 0. */
  def buildWav(sampleRate: Int, predictors: Seq[Int]): Array[Byte] = {
    val blockAlign = 4 + FixedPattern.length / 2
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)

    val dataLen = predictors.size * blockAlign
    val riffLen = 4 + (8 + 20) + (8 + 4) + (8 + dataLen)
    cc("RIFF"); le32(riffLen); cc("WAVE")
    cc("fmt "); le32(20)
    le16(0x11); le16(1); le32(sampleRate)
    le32(sampleRate * blockAlign / samplesPerBlock) // nominal byte rate
    le16(blockAlign); le16(4)
    le16(2); le16(samplesPerBlock)
    cc("fact"); le32(4); le32(predictors.size * samplesPerBlock)
    cc("data"); le32(dataLen)
    predictors.foreach { p =>
      le16(p & 0xffff); out.write(0); out.write(0) // predictor, index 0, reserved
      var i = 0
      while (i < FixedPattern.length) {
        out.write(FixedPattern(i) | (FixedPattern(i + 1) << 4)) // low nibble first
        i += 2
      }
    }
    out.toByteArray
  }
}

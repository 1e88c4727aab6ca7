package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/**
 * Real video decode behind the [[MediaCodec]] SPI, completing the
 * in-JDK codec family ([[ImageIoCodec]] images, [[WavCodec]] audio): an
 * AVI (RIFF) container parser with two frame codecs —
 *
 *  - `##db` chunks: uncompressed bottom-up 24-bit DIB frames (BI_RGB),
 *    decoded by direct raster walk — lossless, so frame pixel sums are
 *    exactly predictable (the analytic-oracle path, like mm4's PNGs);
 *  - `##dc` chunks: MJPEG frames, decoded through the JDK's ImageIO JPEG
 *    reader — the most common zero-dependency "real video" payload.
 *
 * The JDK ships no general video decoder (H.264 etc. need a codec jar via
 * the same ServiceLoader seam), but RIFF/AVI is a public container format
 * and both frame codecs above are fully decodable with the JDK alone, so
 * this codec is real end to end: it parses the actual container byte
 * layout (chunk walk, word alignment, `hdrl`/`strl`/`strf` stream
 * headers, `movi` frame list) and decodes actual frame payloads.
 *
 * Registered via `META-INF/services/graft.multimodal.MediaCodec`,
 * resolved executor-side by name ("avi").
 *
 * Feature layout (deterministic, fixed-length `dims` ≥ 6):
 *  - slot 0/1/2: frame count, width, height (from the `strf`
 *    BITMAPINFOHEADER — the container's own metadata);
 *  - slots 3..dims-1: sums of 8-bit sRGB channel samples across ALL
 *    frames, pixels walked row-major top-down per frame, channels r,g,b
 *    cycled across the slots — the same definition as [[ImageIoCodec]],
 *    so a 1-frame AVI and the equivalent still image produce identical
 *    data slots.
 *
 * Fails loudly on non-AVI payloads, missing headers, unsupported DIB
 * shapes (only bottom-up BI_RGB 24-bit), and undecodable `dc` frames —
 * route other payloads to another codec.
 */
final class AviCodec extends MediaCodec {
  val name = "avi"

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    require(dims >= 6, s"avi features need dims >= 6 (3 header slots + r,g,b), got $dims")
    require(payload.length >= 12 && fourcc(payload, 0) == "RIFF" &&
      fourcc(payload, 8) == "AVI ",
      "payload is not a RIFF/AVI container; route non-AVI payloads to " +
        "another codec (e.g. \"imageio\" for stills, \"stub\" otherwise)")

    // one linear chunk walk collects the video stream's strf dims and that
    // stream's movi frame chunks; LIST chunks recurse (their data starts
    // with the list type). Stream binding: `strl` lists are numbered in
    // order of appearance (the AVI stream index); the strf is accepted
    // only from the strl whose strh declares fccType `vids`, and frame
    // chunks (`NNdb`/`NNdc`) only when their 2-digit prefix NN equals that
    // stream's index — a multi-stream AVI (audio strl first, say) can no
    // longer mix another stream's frames or dims into the features.
    var strfW = -1; var strfH = -1; var strfBits = -1; var strfCompress = -1
    var strlCount = 0 // strl lists seen so far = next stream index
    var videoStream = -1 // index of the strl whose strh says `vids`
    var frames = List.empty[(Int, Int, Boolean)] // (dataOff, dataLen, isDib)

    def walk(off: Int, end: Int, strl: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val cc = fourcc(payload, p)
        val size = le32(payload, p + 4)
        val data = p + 8
        // bound against the ENCLOSING list's end, not just the payload: a
        // chunk may not claim bytes past its parent LIST
        require(size >= 0 && data + size <= end,
          s"corrupt AVI: chunk $cc at $p claims $size bytes past its enclosing list (end=$end)")
        if (cc == "LIST") {
          require(size >= 4, s"corrupt AVI: LIST at $p too short for a list type")
          val listType = fourcc(payload, data)
          val childStrl =
            if (listType == "strl") { val idx = strlCount; strlCount += 1; idx }
            else strl // nested lists inherit their strl context
          walk(data + 4, data + size, childStrl)
        } else if (cc == "strh" && strl >= 0 && videoStream < 0 && size >= 4 &&
          fourcc(payload, data) == "vids") {
          videoStream = strl
        } else if (cc == "strf" && strl >= 0 && strl == videoStream &&
          strfW < 0 && size >= 40) {
          // BITMAPINFOHEADER: biWidth @+4, biHeight @+8, biBitCount @+14,
          // biCompression @+16
          strfW = le32(payload, data + 4)
          strfH = le32(payload, data + 8)
          strfBits = (payload(data + 14) & 0xff) | ((payload(data + 15) & 0xff) << 8)
          strfCompress = le32(payload, data + 16)
        } else if (cc.length == 4 && cc.charAt(2) == 'd' &&
          (cc.charAt(3) == 'b' || cc.charAt(3) == 'c') &&
          Character.isDigit(cc.charAt(0)) && Character.isDigit(cc.charAt(1)) &&
          (cc.charAt(0) - '0') * 10 + (cc.charAt(1) - '0') == videoStream) {
          frames ::= ((data, size, cc.charAt(3) == 'b'))
        }
        p = data + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, payload.length, -1)
    require(videoStream >= 0, "AVI has no vids stream header (strh)")
    require(strfW > 0 && strfH != 0, "AVI has no strf video header")
    val frameList = frames.reverse
    require(frameList.nonEmpty, "AVI movi list holds no video frames")

    val h = math.abs(strfH)
    val out = new Array[Float](dims)
    out(0) = frameList.size.toFloat
    out(1) = strfW.toFloat
    out(2) = h.toFloat
    val slots = dims - 3

    frameList.foreach { case (dataOff, dataLen, isDib) =>
      var i = 0
      if (isDib) {
        require(strfBits == 24 && strfCompress == 0 && strfH > 0,
          s"unsupported DIB shape: $strfBits-bit compression=$strfCompress " +
            s"height=$strfH — this codec reads bottom-up BI_RGB 24-bit frames")
        val rowBytes = ((strfW * 3 + 3) / 4) * 4 // rows pad to 4 bytes
        require(dataLen >= rowBytes * h, s"DIB frame short: $dataLen < ${rowBytes * h}")
        var y = 0
        while (y < h) {
          val row = dataOff + (h - 1 - y) * rowBytes // bottom-up storage
          var x = 0
          while (x < strfW) {
            val px = row + x * 3 // DIB byte order is B,G,R
            out(3 + i % slots) += (payload(px + 2) & 0xff).toFloat
            out(3 + (i + 1) % slots) += (payload(px + 1) & 0xff).toFloat
            out(3 + (i + 2) % slots) += (payload(px) & 0xff).toFloat
            i += 3
            x += 1
          }
          y += 1
        }
      } else {
        val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(payload, dataOff, dataLen)))
        require(img != null, "MJPEG frame is not decodable by the JVM's JPEG reader")
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            out(3 + i % slots) += ((rgb >>> 16) & 0xff).toFloat
            out(3 + (i + 1) % slots) += ((rgb >>> 8) & 0xff).toFloat
            out(3 + (i + 2) % slots) += (rgb & 0xff).toFloat
            i += 3
            x += 1
          }
          y += 1
        }
      }
    }
    out
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/**
 * Minimal RIFF/AVI writer for the synthesized-video fixture path
 * ([[Multimodal.synthesizeVideoTable]]) and the [[AviCodec]] specs: emits a
 * structurally complete AVI — `hdrl` with `avih`, a `strl` stream list with
 * `strh`/`strf` (BITMAPINFOHEADER), and the `movi` frame list with
 * word-aligned `00db` (raw bottom-up BI_RGB 24-bit DIB) or `00dc` (MJPEG)
 * chunks — per the public RIFF/AVI container layout. The point is that
 * [[AviCodec]] decodes REAL container bytes, not a private in-memory
 * handshake: any AVI tool reading this layout sees a legal 25 fps video
 * stream.
 */
private[multimodal] object AviBuilder {

  private final class W {
    val out = new ByteArrayOutputStream()
    def le32(v: Int): W = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff); this
    }
    def le16(v: Int): W = { out.write(v & 0xff); out.write((v >> 8) & 0xff); this }
    def cc(s: String): W = { out.write(s.getBytes("US-ASCII"), 0, 4); this }
    def raw(b: Array[Byte]): W = { out.write(b, 0, b.length); this }
  }

  /** One chunk: fourcc, LE size, data, pad byte when the size is odd. */
  private def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val w = new W
    w.cc(cc).le32(data.length).raw(data)
    if ((data.length & 1) == 1) w.out.write(0)
    w.out.toByteArray
  }

  private def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
    val inner = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
    val w = new W
    w.cc("LIST").le32(4 + inner.length).cc(listType).raw(inner)
    w.out.toByteArray
  }

  /** A bottom-up BI_RGB 24-bit DIB frame: rows stored last-to-first, pixels
    * as B,G,R bytes, each row zero-padded to a 4-byte boundary. `rgbAt`
    * gives the (r, g, b) of pixel (x, y) in TOP-DOWN image coordinates. */
  def dibFrame(w: Int, h: Int, rgbAt: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val data = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbAt(x, y)
      val off = (h - 1 - y) * rowBytes + x * 3
      data(off) = b.toByte; data(off + 1) = g.toByte; data(off + 2) = r.toByte
    }
    data
  }

  /** Assemble the container. `frames` are (isDib, frameBytes): DIB data from
    * [[dibFrame]] under `00db`, or encoded JPEG bytes under `00dc` (the
    * stream headers switch to the MJPG handler/compression accordingly —
    * mixed-codec frame lists are not legal AVI and not supported here). */
  def avi(w: Int, h: Int, frames: Seq[(Boolean, Array[Byte])]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val isDib = frames.head._1
    require(frames.forall(_._1 == isDib), "mixed db/dc frame lists are not legal AVI")
    val maxFrame = frames.map(_._2.length).max

    val avih = {
      val b = new W
      b.le32(40000)              // dwMicroSecPerFrame: 25 fps
        .le32(maxFrame * 25)     // dwMaxBytesPerSec
        .le32(0).le32(0)         // dwPaddingGranularity, dwFlags
        .le32(frames.size)       // dwTotalFrames
        .le32(0).le32(1)         // dwInitialFrames, dwStreams
        .le32(maxFrame)          // dwSuggestedBufferSize
        .le32(w).le32(h)
        .le32(0).le32(0).le32(0).le32(0) // dwReserved[4]
      b.out.toByteArray
    }
    val strh = {
      val b = new W
      b.cc("vids").cc(if (isDib) "DIB " else "MJPG")
        .le32(0).le16(0).le16(0) // dwFlags, wPriority, wLanguage
        .le32(0)                 // dwInitialFrames
        .le32(1).le32(25)        // dwScale / dwRate = 25 fps
        .le32(0)                 // dwStart
        .le32(frames.size)       // dwLength
        .le32(maxFrame)          // dwSuggestedBufferSize
        .le32(0)                 // dwQuality
        .le32(0)                 // dwSampleSize
        .le16(0).le16(0).le16(w).le16(h) // rcFrame
      b.out.toByteArray
    }
    val strf = {
      val b = new W
      b.le32(40)                 // biSize
        .le32(w).le32(h)         // biWidth, biHeight (positive = bottom-up)
        .le16(1).le16(24)        // biPlanes, biBitCount
      if (isDib) b.le32(0) else b.cc("MJPG") // biCompression
      b.le32(((w * 3 + 3) / 4) * 4 * h) // biSizeImage
        .le32(0).le32(0).le32(0).le32(0) // biXPels, biYPels, biClrUsed, biClrImportant
      b.out.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi",
      frames.map { case (dib, data) =>
        chunk(if (dib) "00db" else "00dc", data)
      }: _*)

    val body = hdrl ++ movi
    val out = new W
    out.cc("RIFF").le32(4 + body.length).cc("AVI ").raw(body)
    out.out.toByteArray
  }
}

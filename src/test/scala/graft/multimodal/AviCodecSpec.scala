package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpecBase

/** The real (RIFF/AVI) video codec behind the SPI. The DIB path is
  * lossless, so features must match an out-of-band computation from the
  * pixel colors the test SETS; the MJPEG path decodes through the JDK's
  * JPEG reader, so header slots are exact and channel sums are checked
  * against the set colors within JPEG quantization tolerance. */
class AviCodecSpec extends SparkSpecBase {

  import spark.implicits._

  private def rgbAt(x: Int, y: Int): (Int, Int, Int) =
    ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 91 + y * 3) % 256)

  /** The codec's documented data-slot definition, computed from KNOWN
    * colors: row-major r,g,b-cycled sums accumulated across frames. */
  private def expectedSums(w: Int, h: Int, nFrames: Int, dims: Int,
                           color: (Int, Int, Int) => (Int, Int, Int)): Array[Float] = {
    val out = new Array[Float](dims)
    out(0) = nFrames.toFloat; out(1) = w.toFloat; out(2) = h.toFloat
    val slots = dims - 3
    for (f <- 0 until nFrames) {
      var i = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = color(f, x, y)
        out(3 + i % slots) += r.toFloat
        out(3 + (i + 1) % slots) += g.toFloat
        out(3 + (i + 2) % slots) += b.toFloat
        i += 3
      }
    }
    out
  }

  test("avi codec resolves through the ServiceLoader path (never explicitly registered)") {
    val c = MediaCodecs("avi")
    assert(c.isInstanceOf[AviCodec])
    assert(MediaCodecs.registered.contains("avi"))
  }

  test("DIB frames: decoded sums match the out-of-band fixture computation exactly") {
    val (w, h, n) = (5, 4, 3)
    def color(f: Int, x: Int, y: Int): (Int, Int, Int) = {
      val (r, g, b) = rgbAt(x, y); ((r + f * 17) % 256, (g + f * 29) % 256, (b + f * 43) % 256)
    }
    val frames = (0 until n).map(f => (true, AviBuilder.dibFrame(w, h, color(f, _, _))))
    val payload = AviBuilder.avi(w, h, frames)
    // container magic, as any AVI tool would check it
    assert(new String(payload.take(4), "US-ASCII") === "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") === "AVI ")
    val got = MediaCodecs("avi").features(payload, 9)
    val want = expectedSums(w, h, n, 9, color)
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
  }

  test("DIB row padding: a width whose 3-byte rows are unaligned still decodes exactly") {
    // w=3 -> 9-byte rows pad to 12; a codec that forgot the pad would walk
    // into the pad bytes and shear every row after the first
    val (w, h) = (3, 2)
    val payload = AviBuilder.avi(w, h, Seq((true, AviBuilder.dibFrame(w, h, rgbAt))))
    val got = MediaCodecs("avi").features(payload, 6)
    val want = expectedSums(w, h, 1, 6, (_, x, y) => rgbAt(x, y))
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
  }

  test("multi-stream AVI: frames and dims bind to the vids stream, not stream 00") {
    // audio strl FIRST (stream 00, fccType auds, with a >=40-byte strf
    // decoy), video strl second (stream 01): the codec must take its dims
    // from the VIDEO strf and collect only 01db frames, ignoring the 00wb
    // audio chunks interleaved in movi. The pre-r14 walk took the first
    // >=40-byte strf and any NNdb/NNdc chunk — this fixture catches both.
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]) =
      cc(fourcc) ++ le32(data.length) ++ data ++
        (if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(t: String, bodies: Array[Byte]*) = {
      val inner = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
      cc("LIST") ++ le32(4 + inner.length) ++ cc(t) ++ inner
    }
    val (w, h) = (4, 3)
    val audStrh = cc("auds") ++ cc("PCM ") ++ Array.fill[Byte](48)(0)
    // decoy strf: 40 bytes of WAVEFORMAT-ish junk whose "biWidth" slot
    // (at +4) is a wrong nonzero value the old walk would have taken
    val audStrf = le32(18) ++ le32(99) ++ le32(77) ++ le16(1) ++ le16(8) ++
      Array.fill[Byte](40 - 16)(1)
    val vidStrh = cc("vids") ++ cc("DIB ") ++ Array.fill[Byte](48)(0)
    val vidStrf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(((w * 3 + 3) / 4) * 4 * h) ++ Array.fill[Byte](16)(0)
    val dib = AviBuilder.dibFrame(w, h, rgbAt)
    val hdrl = list("hdrl",
      chunk("avih", Array.fill[Byte](56)(0)),
      list("strl", chunk("strh", audStrh), chunk("strf", audStrf)),
      list("strl", chunk("strh", vidStrh), chunk("strf", vidStrf)))
    val movi = list("movi",
      chunk("00wb", Array.fill[Byte](64)(7)), // audio data, must be ignored
      chunk("01db", dib),
      chunk("00wb", Array.fill[Byte](64)(9)))
    val body = hdrl ++ movi
    val payload = cc("RIFF") ++ le32(4 + body.length) ++ cc("AVI ") ++ body
    val got = MediaCodecs("avi").features(payload, 6)
    val want = expectedSums(w, h, 1, 6, (_, x, y) => rgbAt(x, y))
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
  }

  test("chunk claiming bytes past its enclosing LIST fails loudly") {
    // a malformed inner chunk whose size runs past its parent list's end
    // (but not past the payload) must be rejected, not silently read
    val good = AviBuilder.avi(3, 2, Seq((true, AviBuilder.dibFrame(3, 2, rgbAt))))
    // find the movi LIST and corrupt its first frame chunk's size to reach
    // past the list end into the trailing bytes we append
    val payload = good ++ Array.fill[Byte](64)(0)
    def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    // locate "00db" and inflate its size by 64 (past movi's end, inside payload)
    val idx = payload.sliding(4).indexWhere(_.sameElements("00db".getBytes("US-ASCII")))
    assert(idx > 0)
    val sz = le32(payload, idx + 4)
    val inflated = sz + 64
    payload(idx + 4) = (inflated & 0xff).toByte
    payload(idx + 5) = ((inflated >> 8) & 0xff).toByte
    payload(idx + 6) = ((inflated >> 16) & 0xff).toByte
    payload(idx + 7) = ((inflated >> 24) & 0xff).toByte
    val e = intercept[IllegalArgumentException](MediaCodecs("avi").features(payload, 6))
    assert(e.getMessage.contains("enclosing list"))
  }

  test("MJPEG frames: header slots exact, channel sums within JPEG tolerance of the set colors") {
    val (w, h, n) = (16, 16, 2)
    // solid-color frames: JPEG's DC-only quantization keeps solid blocks
    // near-exact, so a tight tolerance still proves the frames really
    // decoded (a wrong frame or raster walk is off by whole channels)
    val colors = Seq((200, 40, 90), (30, 220, 120))
    val frames = colors.map { case (r, g, b) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (r << 16) | (g << 8) | b)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      (false, bos.toByteArray)
    }
    val got = MediaCodecs("avi").features(AviBuilder.avi(w, h, frames), 6)
    assert(got(0) === n.toFloat && got(1) === w.toFloat && got(2) === h.toFloat, got.toSeq)
    val px = (w * h).toFloat
    val wantR = colors.map(_._1).sum * px // Σ_f r_f · px
    val wantG = colors.map(_._2).sum * px
    val wantB = colors.map(_._3).sum * px
    // ±4 per sample bounds JPEG round-trip error on solid blocks
    assert(math.abs(got(3) - wantR) <= 4 * px * n, s"r: ${got.toSeq} want ~$wantR")
    assert(math.abs(got(4) - wantG) <= 4 * px * n, s"g: ${got.toSeq}")
    assert(math.abs(got(5) - wantB) <= 4 * px * n, s"b: ${got.toSeq}")
  }

  test("synthesizeVideoTable payloads decode to the analytic id arithmetic (mm6 contract)") {
    val ids = Seq(0L, 1L, 2L, 3L, 11L, 255L, 1000L).toDF("doc_id")
    val vids = Multimodal.synthesizeVideoTable(ids, "doc_id")
    val onePayload = vids.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(onePayload.take(4), "US-ASCII") === "RIFF")
    val got = Multimodal.extractFeatures(vids, dims = 6, codec = "avi")
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    got.foreach { case (id, f) =>
      val w = (id % 3 + 2).toInt; val h = (id % 2 + 2).toInt; val n = (id % 4 + 2).toInt
      val px = (w * h).toFloat
      assert(f(0) === n.toFloat && f(1) === w.toFloat && f(2) === h.toFloat, s"id=$id: ${f.toSeq}")
      def s(mul: Long, step: Long) = (0 until n).map(fr => ((id * mul + fr * step) % 256).toFloat).sum * px
      assert(f(3) === s(7, 31) && f(4) === s(11, 37) && f(5) === s(13, 41), s"id=$id: ${f.toSeq}")
    }
  }

  test("non-AVI payload fails loudly, naming where to route it") {
    val e = intercept[IllegalArgumentException] {
      MediaCodecs("avi").features("not a video at all".getBytes, 6)
    }
    assert(e.getMessage.contains("RIFF"), e.getMessage)
  }
}

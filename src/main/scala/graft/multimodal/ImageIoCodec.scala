package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/**
 * Real image decode behind the [[MediaCodec]] SPI, built on `javax.imageio`
 * — in the JDK, so it exists on every executor with no extra jars. This is
 * the codec that replaces the deterministic stub wherever payloads are
 * actual encoded images (PNG/JPEG/GIF/BMP — whatever the JVM's installed
 * ImageIO readers handle); [[Multimodal.StubDecoder]] remains the fallback
 * for containers with no decodable payloads.
 *
 * Registered via `META-INF/services/graft.multimodal.MediaCodec` (see
 * `src/main/resources`) — the drop-a-jar ServiceLoader path, resolved
 * executor-side by name ("imageio"), exactly like a third-party codec
 * library would be.
 *
 * Feature layout (deterministic, fixed-length `dims` ≥ 4):
 *  - slot 0/1/2: decoded width, height, raster band count (the real
 *    header metadata a stub cannot know);
 *  - slots 3..dims-1: sums of 8-bit sRGB channel samples, pixels walked
 *    row-major, channels r,g,b cycled across the slots. `getRGB` converts
 *    every source color model to packed sRGB, so the feature definition is
 *    independent of the file's internal raster layout (BGR byte order,
 *    palette, grayscale) — a grayscale image simply yields r=g=b.
 *
 * Instances are resolved once per partition ([[Multimodal.extractFeatures]])
 * and the decode loop allocates only the output vector per row.
 */
final class ImageIoCodec extends MediaCodec {
  val name = "imageio"

  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    require(dims >= 4, s"imageio features need dims >= 4 (3 header slots + data), got $dims")
    // ImageIO.read(InputStream) defaults to spilling its image input
    // stream to a temp FILE — per-row disk churn for in-memory byte
    // payloads. Wrapping in a MemoryCacheImageInputStream keeps the
    // no-temp-file behavior SCOPED to this decode (the
    // ImageIO.read(ImageInputStream) overload never consults the global
    // disk-cache flag), instead of flipping ImageIO.setUseCache(false)
    // JVM-wide for every other ImageIO user in the executor process.
    val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload)))
    require(img != null,
      "payload is not an image the JVM's ImageIO readers can decode; " +
        "route non-image payloads to another codec (e.g. \"stub\")")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](dims)
    out(0) = w.toFloat
    out(1) = h.toFloat
    out(2) = img.getRaster.getNumBands.toFloat
    val slots = dims - 3
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(3 + i % slots) += ((rgb >>> 16) & 0xff).toFloat
        out(3 + (i + 1) % slots) += ((rgb >>> 8) & 0xff).toFloat
        out(3 + (i + 2) % slots) += (rgb & 0xff).toFloat
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }
}

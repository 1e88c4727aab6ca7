package graft.multimodal

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Codec SPI for multimodal decode: the ONE seam a real deployment changes.
 *
 * The operators in [[Multimodal]] never call a decoder directly — they
 * resolve a [[MediaCodec]] BY NAME, per partition, from this registry. That
 * keeps the deployment story honest on a cluster: a JNI/JavaCPP-backed
 * decoder holds native handles and is not serializable, so it cannot ride a
 * task closure from the driver; what ships is the codec NAME (a string) and
 * the resolution happens executor-side, where the codec library's static
 * initializer (or its `META-INF/services` entry, below) has registered it.
 *
 * Registration paths, in resolution order:
 *  1. explicit [[MediaCodecs.register]] — e.g. from a library init hook;
 *  2. `java.util.ServiceLoader` over `META-INF/services/graft.multimodal
 *     .MediaCodec` — drop a codec jar on the executor classpath and its
 *     codecs are found on first miss, no code changes;
 *  3. the built-in [[Multimodal.StubDecoder]] under the name `"stub"` —
 *     the deterministic byte-function stand-in (this container has no
 *     image/audio codec libraries; the stub keeps the full pipeline —
 *     schema, partitioning, batch shape, hashes — real and testable).
 */
trait MediaCodec extends Serializable {
  /** Registry key; what callers pass to [[Multimodal.extractFeatures]]. */
  def name: String

  /** Decode one payload and return a fixed-length feature vector. Called
    * from a per-partition loop — implementations should do expensive init
    * (codec contexts, model weights) lazily in the instance, which lives
    * for the executor's lifetime, not per row. */
  def features(payload: Array[Byte], dims: Int): Array[Float]
}

object MediaCodecs {

  private object StubCodec extends MediaCodec {
    val name = "stub"
    def features(payload: Array[Byte], dims: Int): Array[Float] =
      Multimodal.StubDecoder.features(payload, dims)
  }

  private val codecs = TrieMap[String, MediaCodec](StubCodec.name -> StubCodec)

  def register(codec: MediaCodec): Unit = codecs.put(codec.name, codec)

  def registered: Set[String] = codecs.keySet.toSet

  /** Resolve a codec by name; scans the ServiceLoader on EVERY miss, not
    * once — a codec jar can arrive AFTER an earlier miss (sparkContext
    * .addJar mid-session appends to the executor's MutableURLClassLoader,
    * which is the task thread's context loader ServiceLoader reads), and a
    * once-only flag would never see it. Hits are cached in the TrieMap, so
    * rescans cost only on first discovery and on the error path. */
  def apply(name: String): MediaCodec =
    codecs.get(name).getOrElse {
      synchronized {
        java.util.ServiceLoader.load(classOf[MediaCodec]).asScala
          .foreach(c => codecs.putIfAbsent(c.name, c))
      }
      codecs.getOrElse(name, throw new IllegalArgumentException(
        s"no MediaCodec named '$name' (registered: ${registered.toSeq.sorted.mkString(", ")}); " +
          "register one via MediaCodecs.register or a META-INF/services entry " +
          "on the executor classpath"))
    }
}

package graft.multimodal

/** Test-scope codecs discovered ONLY through the
  * `META-INF/services/graft.multimodal.MediaCodec` resource on the test
  * classpath — the exact drop-a-jar-on-the-executor-classpath path a real
  * codec library uses. ServiceLoader requires a public no-arg constructor,
  * which is itself part of what these pin. */
final class ServiceLoaderTestCodec extends MediaCodec {
  val name = "svc-loader-test"
  def features(payload: Array[Byte], dims: Int): Array[Float] =
    Array.fill(dims)(42.5f)
}

/** Same name as a codec the spec registers EXPLICITLY — exists to pin the
  * resolution order (explicit registration beats a ServiceLoader entry). */
final class ServiceLoaderShadowedCodec extends MediaCodec {
  val name = "svc-shadowed"
  def features(payload: Array[Byte], dims: Int): Array[Float] =
    Array.fill(dims)(-1f)
}

/** Deliberately claims the built-in name: the scan's putIfAbsent must NOT
  * let a classpath jar hijack `"stub"` (or any already-registered codec). */
final class StubShadowAttemptCodec extends MediaCodec {
  val name = "stub"
  def features(payload: Array[Byte], dims: Int): Array[Float] =
    Array.fill(dims)(Float.NaN)
}

package graft.multimodal

import org.apache.spark.SparkException

import graft.SparkSpecBase

/** The codec SPI: operators resolve decoders by name executor-side, the
  * stub default keeps driver-query hashes stable, and a registered codec
  * swaps in without touching the operator. */
class MediaCodecSpec extends SparkSpecBase {

  import spark.implicits._

  private def media = Multimodal.deriveMediaTable(
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, ""))
      .toDF("doc_id", "text"),
    "doc_id", "text")

  test("default stub codec reproduces StubDecoder exactly (mm hashes stable)") {
    val got = Multimodal.extractFeatures(media, dims = 8)
      .select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    val want = media.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap.view.mapValues(Multimodal.StubDecoder.features(_, 8))
    assert(got.keySet === want.keys.toSet)
    got.foreach { case (id, v) => assert(v.sameElements(want(id)), s"media $id") }
  }

  test("a registered codec swaps in by name; the stub stays untouched") {
    object FakeCodec extends MediaCodec {
      val name = "fake-constant"
      def features(payload: Array[Byte], dims: Int): Array[Float] =
        Array.fill(dims)(payload.length.toFloat)
    }
    MediaCodecs.register(FakeCodec)
    assert(MediaCodecs.registered.contains("fake-constant"))

    val fake = Multimodal.extractFeatures(media, dims = 4, codec = "fake-constant")
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    val lens = media.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap.view.mapValues(_.length.toFloat)
    fake.foreach { case (id, v) =>
      assert(v.sameElements(Array.fill(4)(lens(id))), s"media $id")
    }
    // the default path still resolves the stub
    val stub = Multimodal.extractFeatures(media, dims = 4)
      .select("features").as[Array[Float]].collect()
    assert(stub.exists(v => !v.sameElements(Array.fill(4)(0f))))
  }

  test("a META-INF/services codec resolves end-to-end through extractFeatures") {
    // never explicitly registered anywhere — only the ServiceLoader
    // resource on the test classpath can supply it, and the resolution
    // happens inside the operator's partition loop (the executor path)
    val got = Multimodal.extractFeatures(media, dims = 4, codec = "svc-loader-test")
      .select("features").as[Array[Float]].collect()
    assert(got.nonEmpty)
    got.foreach(v => assert(v.sameElements(Array.fill(4)(42.5f))))
    assert(MediaCodecs.registered.contains("svc-loader-test"),
      "first-miss scan should have cached the service codec")
  }

  test("resolution order: explicit registration beats a ServiceLoader entry") {
    // force the one-time scan (loads ServiceLoaderShadowedCodec = -1s)
    MediaCodecs("svc-loader-test")
    assert(MediaCodecs("svc-shadowed").features(Array[Byte](1), 2)
      .sameElements(Array(-1f, -1f)))
    // an explicit register for the same name takes over
    object ExplicitShadow extends MediaCodec {
      val name = "svc-shadowed"
      def features(payload: Array[Byte], dims: Int): Array[Float] =
        Array.fill(dims)(7f)
    }
    MediaCodecs.register(ExplicitShadow)
    assert(MediaCodecs("svc-shadowed").features(Array[Byte](1), 2)
      .sameElements(Array(7f, 7f)))
  }

  test("resolution order: a classpath jar cannot hijack an already-registered name") {
    // the services resource also lists StubShadowAttemptCodec (name "stub",
    // all-NaN features); after a scan the built-in stub must still win
    MediaCodecs("svc-loader-test") // ensure the scan ran
    val v = MediaCodecs("stub").features("abc".getBytes, 4)
    assert(!v.exists(_.isNaN), "built-in stub was hijacked by a service entry")
    assert(v.sameElements(Multimodal.StubDecoder.features("abc".getBytes, 4)))
  }

  test("an unknown codec fails loudly, naming what IS registered") {
    val e = intercept[SparkException] {
      Multimodal.extractFeatures(media, dims = 4, codec = "no-such-codec").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no MediaCodec named 'no-such-codec'"), s"got: $msg")
    assert(msg.contains("stub"), s"registered codecs not listed: $msg")
  }
}

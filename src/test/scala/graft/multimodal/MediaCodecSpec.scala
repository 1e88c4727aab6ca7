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

  test("an unknown codec fails loudly, naming what IS registered") {
    val e = intercept[SparkException] {
      Multimodal.extractFeatures(media, dims = 4, codec = "no-such-codec").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no MediaCodec named 'no-such-codec'"), s"got: $msg")
    assert(msg.contains("stub"), s"registered codecs not listed: $msg")
  }
}

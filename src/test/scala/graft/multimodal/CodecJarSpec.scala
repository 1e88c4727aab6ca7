package graft.multimodal

import java.util.jar.JarFile

import graft.SparkSpecBase

/** The "drop a decoder jar on the executors" deployment seam, certified
  * with a REAL jar artifact: [[CodecJarBuilder]] javac-compiles the
  * `extcodec.AirliftSnappyCodec` (decode = Airlift aircompressor's
  * SnappyDecompressor — a third-party artifact on every Spark executor
  * classpath) into a standalone jar the application classpath has never
  * seen, `sparkContext.addJar` ships it, and ServiceLoader discovers it
  * executor-side on the first [[MediaCodecs]] miss inside
  * `extractFeatures`'s mapPartitions loop. */
class CodecJarSpec extends SparkSpecBase {

  import spark.implicits._

  test("codec jar is a real external artifact: service entry present, class absent from app classpath") {
    val path = CodecJarBuilder.build()
    val jar = new JarFile(path)
    try {
      val svc = jar.getEntry("META-INF/services/graft.multimodal.MediaCodec")
      assert(svc != null, "service registration entry missing")
      val body = new String(jar.getInputStream(svc).readAllBytes, "UTF-8").trim
      assert(body === CodecJarBuilder.className)
      assert(jar.getEntry("extcodec/AirliftSnappyCodec.class") != null)
    } finally jar.close()
    // the class must NOT be loadable from the application classpath —
    // otherwise this spec would certify nothing about jar deployment
    intercept[ClassNotFoundException] {
      Class.forName(CodecJarBuilder.className)
    }
  }

  test("artifact-added codec jar is ServiceLoader-discovered executor-side and decodes") {
    val path = CodecJarBuilder.build()
    spark.addArtifact(path)
    val docs = Seq((1L, "alpha alpha alpha alpha alpha alpha"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")) // compressible tails
      .toDF("doc_id", "text")
    val media = Multimodal.synthesizeSnappyDocTable(docs, "doc_id", "text")
    // the payloads really are compressed (not passthrough): repetitive
    // text must come out SHORTER than its utf-8 length
    val sizes = media.selectExpr("media_id", "octet_length(payload) AS n")
      .as[(Long, Int)].collect().toMap
    assert(sizes(1L) < "alpha alpha alpha alpha alpha alpha".length)
    assert(sizes(3L) < 40)
    val out = Multimodal.extractFeatures(media, dims = 4,
        codec = CodecJarBuilder.codecName)
      .select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    // expected = stub fold of the ORIGINAL utf-8 bytes: equality proves
    // the jar codec decompressed (compressed bytes fold differently)
    for ((id, text) <- Seq(1L -> "alpha alpha alpha alpha alpha alpha",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")) {
      val expected = Multimodal.StubDecoder.features(text.getBytes("UTF-8"), 4)
      assert(out(id).toSeq === expected.toSeq, s"doc $id")
    }
  }

  test("an unknown codec name still fails loudly after the jar scan") {
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(
        Multimodal.synthesizeSnappyDocTable(
          Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text"),
        dims = 4, codec = "no-such-codec").collect()
    }
    assert(ex.getMessage.contains("no MediaCodec named") ||
      ex.getCause != null)
  }
}

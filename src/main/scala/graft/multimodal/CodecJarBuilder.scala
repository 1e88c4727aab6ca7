package graft.multimodal

import java.io.{ByteArrayOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.jar.{JarEntry, JarOutputStream}

/**
 * Builds a REAL standalone codec jar — compiled by javac at run time,
 * written to disk, registered via `META-INF/services/graft.multimodal
 * .MediaCodec` — to certify the "drop a decoder jar on the executors"
 * deployment seam end to end: `spark.addArtifact(path)` → the session
 * artifact state's executor classloader → `ServiceLoader` discovery on
 * first [[MediaCodecs]] miss → decode inside `mapPartitions`. It must be
 * `addArtifact`, not `sparkContext.addJar`: Spark 4 runs SQL executions
 * under per-session artifact isolation, and a DataFrame task's context
 * classloader sees session artifacts but NOT sc-level jars (measured in
 * `CodecJarSpec` — the sc.addJar variant is CLASS_MISSING in SQL tasks
 * while plain RDD tasks see it).
 *
 * The jar's class lives in the `extcodec` package (NOT `graft.*`, not on
 * the application classpath — `Class.forName` on it fails outside the
 * jar's loader, which the spec asserts), and its decode DELEGATES to
 * Airlift aircompressor's `SnappyDecompressor` — a genuine third-party
 * decoder artifact that ships on every Spark executor classpath
 * (`/opt/spark/jars/aircompressor-*.jar`). This container has no network
 * and no MP3/Vorbis/H.264 jar to drop, so the jar itself is synthesized
 * here by the standard toolchain; the SEAM exercised — a jar file the
 * application classpath has never seen, service-loaded executor-side by
 * name — is exactly the one a real FFmpeg/JavaCPP deployment uses.
 */
object CodecJarBuilder {

  val codecName = "airlift-snappy"
  val className = "extcodec.AirliftSnappyCodec"

  private val source =
    """package extcodec;
      |
      |import io.airlift.compress.snappy.SnappyDecompressor;
      |
      |/**
      | * Feature codec for raw-snappy-block document payloads. The decode is
      | * Airlift aircompressor's SnappyDecompressor (third-party, already on
      | * every Spark executor's classpath); the feature fold matches the
      | * graft stub kernel so results stay SQL-oracleable: features of the
      | * DECOMPRESSED bytes, folded round-robin into dims unsigned-byte-sum
      | * bins (exact in float32 below 64 KiB payloads).
      | */
      |public final class AirliftSnappyCodec implements graft.multimodal.MediaCodec {
      |  @Override public String name() { return "airlift-snappy"; }
      |
      |  @Override public float[] features(byte[] payload, int dims) {
      |    int n = SnappyDecompressor.getUncompressedLength(payload, 0);
      |    byte[] text = new byte[n];
      |    new SnappyDecompressor().decompress(payload, 0, payload.length, text, 0, n);
      |    float[] out = new float[dims];
      |    for (int i = 0; i < n; i++) out[i % dims] += (text[i] & 0xFF);
      |    return out;
      |  }
      |}
      |""".stripMargin

  /** Compile + package the codec jar (idempotent; rebuilt only when the
    * jar is missing). Returns the absolute jar path. */
  def build(root: String = "/tmp/graft-codec-jar"): String = synchronized {
    val jarFile = new File(root, "extcodec-airlift-snappy.jar")
    if (jarFile.isFile) return jarFile.getAbsolutePath

    val srcDir = Paths.get(root, "src", "extcodec")
    val clsDir = Paths.get(root, "classes")
    Files.createDirectories(srcDir)
    Files.createDirectories(clsDir)
    val srcFile = srcDir.resolve("AirliftSnappyCodec.java")
    Files.write(srcFile, source.getBytes(StandardCharsets.UTF_8))

    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    require(javac != null, "system javac unavailable (JRE instead of JDK?)")
    val err = new ByteArrayOutputStream()
    val rc = javac.run(null, null, err,
      "-classpath", System.getProperty("java.class.path"),
      "-d", clsDir.toString, srcFile.toString)
    require(rc == 0, s"codec jar javac failed:\n${err.toString("UTF-8")}")

    val tmp = new File(root, "extcodec-airlift-snappy.jar.tmp")
    val jos = new JarOutputStream(new FileOutputStream(tmp))
    try {
      val clsRel = "extcodec/AirliftSnappyCodec.class"
      jos.putNextEntry(new JarEntry(clsRel))
      val in = new FileInputStream(clsDir.resolve(clsRel).toFile)
      try in.transferTo(jos) finally in.close()
      jos.closeEntry()
      jos.putNextEntry(new JarEntry("META-INF/services/graft.multimodal.MediaCodec"))
      jos.write(s"$className\n".getBytes(StandardCharsets.UTF_8))
      jos.closeEntry()
    } finally jos.close()
    require(tmp.renameTo(jarFile) || jarFile.isFile,
      s"could not move codec jar into place at $jarFile")
    jarFile.getAbsolutePath
  }
}

package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused rolling-md5 document fingerprint: the minimum md5 digest over all
 * k-character windows of the input, as lowercase hex — identical to
 * `array_min(transform(sequence(...), i -> md5(substr(t, i, k))))` but in one
 * compiled pass. The HOF formulation evaluates every lambda interpreted and
 * materializes a per-row array of 32-char hex strings before array_min; here
 * digests are compared as 16 raw bytes (hex encoding is order-preserving, so
 * the byte-wise minimum IS the lexicographic-hex minimum) and only the
 * winner is hex-encoded. Returns null when the input is shorter than k
 * characters (callers filter, as the HOF form's sequence() would misbehave
 * there too).
 */
private[graft] case class RollingMinMd5(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "window must be positive")

  override def prettyName: String = "rolling_min_md5"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    RollingMinMd5.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = graft.functions.RollingMinMd5.compute($in, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingMinMd5 = copy(child = c)
}

object RollingMinMd5 {

  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** Unsigned byte-wise comparison — the digest order md5's hex form sorts by. */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): UTF8String = {
    // windows are CODE-POINT-based: Spark's substr/length count code points,
    // not UTF-16 units, so supplementary characters (emoji) must occupy ONE
    // window position for this to stay identical to the HOF substr form —
    // and for the n<k null check to agree with callers' length(t)>=k filters.
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < k) return null
    val md = digestPool.get()
    var best: Array[Byte] = null
    var i = 0
    var startChar = 0
    var endChar = s.offsetByCodePoints(0, k)
    while (i + k <= n) {
      md.reset()
      val window = s.substring(startChar, endChar).getBytes(StandardCharsets.UTF_8)
      val digest = md.digest(window)
      if (best == null || lessThan(digest, best)) best = digest
      i += 1
      if (i + k <= n) {
        startChar = s.offsetByCodePoints(startChar, 1)
        endChar = s.offsetByCodePoints(endChar, 1)
      }
    }
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((best(j) >> 4) & 0xf)
      hex(2 * j + 1) = hexChars(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }
}

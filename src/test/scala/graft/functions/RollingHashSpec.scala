package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/**
 * The fused [[RollingMinMd5]] kernel must stay bit-identical to its
 * documented higher-order-function form
 * `array_min(transform(sequence(1, length(t)-k+1), i -> md5(substr(t, i, k))))`
 * — including for supplementary characters (emoji are one CODE POINT but two
 * UTF-16 units; Spark's substr/length count code points).
 */
class RollingHashSpec extends SparkSpecBase {

  import spark.implicits._

  private def hofForm(k: Int) = {
    val t = col("text")
    array_min(transform(sequence(lit(1), length(t) - k + 1),
      i => md5(t.substr(i, lit(k)))))
  }

  test("rollingMd5Fingerprint matches the HOF substr form, including supplementary chars") {
    val k = 4
    val rows = Seq(
      "plain ascii text with several windows",
      "exactly4", // longer than k
      "smörgåsbord with latin-1 chars",
      "a😀b😁cdef", // emoji: 1 code point, 2 UTF-16 units
      "😀😁😂😃😄", // all-emoji, 5 code points
      "edge🎉") // supplementary char at the end
      .toDF("text")
      .filter(length(col("text")) >= k)
    val out = rows.select(
      TextFunctions.rollingMd5Fingerprint(col("text"), k).as("fused"),
      hofForm(k).as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("rollingMd5Fingerprint null check counts code points like length()") {
    // 3 emoji = 6 UTF-16 units but only 3 code points → null for k=4, a row
    // the callers' length(t) >= k filter would also exclude
    val df = Seq("😀😁😂").toDF("text")
    val out = df.select(
      TextFunctions.rollingMd5Fingerprint(col("text"), 4).as("fused"),
      (length(col("text")) >= 4).as("passes_filter")).collect()(0)
    assert(out.isNullAt(0) && !out.getBoolean(1))
  }
}

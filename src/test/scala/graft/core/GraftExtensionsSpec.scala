package graft.core

import graft.SparkSpecBase

/** The SQL surface registered by GraftExtensions must reach the same
  * compiled kernels as the Column API. */
class GraftExtensionsSpec extends SparkSpecBase {

  test("vector kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |  round(vec_l2_norm(array(3.0D, 4.0D)), 6) AS n,
        |  vec_sq_dist(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS sq,
        |  vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 25.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("ATT token dispatch from SQL matches the Column API boundaries") {
    val rows = spark.sql(
      """SELECT d,
        |  att_token('cehr_bert', d) AS cb,
        |  att_token('mix', d) AS mx
        |FROM VALUES (-1), (0), (27), (28), (360), (8) AS t(d)""".stripMargin)
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows(-1) == ("W-1", "D-1"))
    assert(rows(0) == ("W0", "D0"))
    assert(rows(27) == ("W3", "W4"))
    assert(rows(28) == ("M0", "W4"))
    assert(rows(360) == ("LT", "M12"))
    assert(rows(8) == ("W1", "W2"))
  }

  test("rolling_min_md5 from SQL equals the HOF formulation") {
    val r = spark.sql(
      """SELECT rolling_min_md5('abcdefghij', 8) AS fused,
        |  array_min(transform(sequence(1, 3), i -> md5(substr('abcdefghij', i, 8)))) AS hof
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("simhash aggregate from SQL") {
    val fps = spark.sql(
      """SELECT g, simhash(h) AS fp FROM VALUES
        |  (1, xxhash64('alpha')), (1, xxhash64('beta')),
        |  (2, xxhash64('alpha')), (2, xxhash64('beta'))
        |AS t(g, h) GROUP BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(1) == fps(2)) // same token stream, same fingerprint
    assert(fps(1) != 0L)
  }
}

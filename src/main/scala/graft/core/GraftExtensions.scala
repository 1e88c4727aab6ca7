package graft.core

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{RollingMinMd5, SimHashAggregate, TimeTokens, VectorFunctions}

/**
 * SQL surface for graft's kernels: installing this class via
 * `spark.sql.extensions` (done by [[GraftSession.withDefaults]]) makes the
 * custom codegen'd expressions and the ATT token functions callable from
 * plain `spark.sql(...)` — so a SQL-only consumer of the library (BI tool,
 * notebook, `CREATE VIEW`) gets the same compiled kernels as the Column API.
 *
 * Column-composition functions (cosine, ATT tokens) are registered through a
 * generic adapter that round-trips argument expressions through the public
 * Column API — one registration path for every current and future function.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Adapt a Column-level function into a SQL expression builder. */
  private def columnFn(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => ColumnBridge.eagerExpression(f(exprs.map(ColumnBridge.column)))

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    reg("vec_dot", "vec_dot(a, b) - dot product of two float/double vectors",
      columnFn { case Seq(a, b) => VectorFunctions.dot(a, b) })
    reg("vec_cosine", "vec_cosine(a, b) - cosine similarity (0 when a norm is 0)",
      columnFn { case Seq(a, b) => VectorFunctions.cosine(a, b) })
    reg("vec_l2_norm", "vec_l2_norm(v) - Euclidean norm",
      columnFn { case Seq(v) => VectorFunctions.l2Norm(v) })
    reg("vec_sq_dist", "vec_sq_dist(a, b) - squared Euclidean distance",
      columnFn { case Seq(a, b) => VectorFunctions.sqDist(a, b) })

    reg("att_token",
      "att_token(kind, days) - artificial time token; kind in " +
        "('cehr_bert','day','week','month','mix')",
      exprs => {
        val kind = exprs.head match {
          case Literal(s, _) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"att_token kind must be a string literal, got $other")
        }
        ColumnBridge.eagerExpression(TimeTokens.token(
          TimeTokens.AttType.fromName(kind), ColumnBridge.column(exprs(1))))
      })

    reg("rolling_min_md5",
      "rolling_min_md5(text, k) - min md5 over all k-char windows (hex)",
      exprs => RollingMinMd5(exprs.head, intArg(exprs(1), "window size")))

    reg("simhash",
      "simhash(token_hash) - aggregate: 64-bit SimHash of a token-hash stream",
      exprs => SimHashAggregate(exprs.head))
  }
}

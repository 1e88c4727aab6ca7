package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between the public `Column` API and Catalyst `Expression`s.
 *
 * Spark 4 decoupled `Column` from `Expression` (the Column now wraps a
 * `ColumnNode`); the classic-backend conversion utilities are `private[sql]`,
 * so this one-file subpackage of `org.apache.spark.sql` re-exposes exactly the
 * two conversions graft's custom codegen'd expressions need. No Spark
 * internals are modified — this is the same mechanism the built-in
 * `functions._` use.
 */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a (classic-backend) Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → Expression conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only the analyzer unwraps; inside a
    * function-registry builder that rule has already run, so the wrapper
    * would survive to codegen as Unevaluable. This converts the node tree
    * immediately (argument leaves may be `UnresolvedFunction`s — the
    * enclosing plan's remaining analyzer iterations resolve them). */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

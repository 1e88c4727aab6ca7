package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Expression-level helpers.
 *
 * [[Exprs.let]] is the key scale idiom: Spark has no common-subexpression
 * `let` at the Column level, and an expensive expression referenced N times
 * in one projection is evaluated N times per row (CollapseProject inlines
 * copies). Binding it as the element of a one-element array and consuming it
 * through a `transform` lambda evaluates it exactly once per row; every
 * reference inside the lambda body is a cheap `NamedLambdaVariable`. On a
 * 100 TB scan the difference is N full passes over each document vs one.
 */
object Exprs {

  /** Evaluate `bound` once per row, then build the result from it. */
  def let(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Two independent bindings. */
  def let2(a: Column, b: Column)(body: (Column, Column) => Column): Column =
    let(a)(av => let(b)(bv => body(av, bv)))
}

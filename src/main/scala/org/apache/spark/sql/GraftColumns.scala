package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column` a thin wrapper over `ColumnNode`
  * and scoped the Expression⇄Column converters `private[sql]`
  * (`classic.ExpressionUtils`), so a library shipping its own
  * `Expression`s needs either a per-session function-registry hop or
  * this one-file package shim — the standard pattern used by Spark
  * connector/extension libraries. Kept deliberately minimal: two
  * one-line delegates, no behavior.
  *
  * The registry route still exists for SQL-text sessions
  * (`graft.functions.VectorExprs.register`, `GraftExtensions`); this
  * shim is what lets pure `Column`-builder helpers
  * (e.g. `graft.ops.Similarity.dot`) construct native expressions
  * without holding a `SparkSession`.
  */
object GraftColumns {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column (e.g. `functions.col("v")`) to its Catalyst
    * expression, for use as a child of a native expression.
    */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

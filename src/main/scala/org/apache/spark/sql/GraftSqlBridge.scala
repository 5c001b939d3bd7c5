package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal interop shim: Spark 4 made the Column↔Expression converters
  * (`classic.ExpressionUtils`) private[sql]; a library adding NATIVE
  * Catalyst expressions (graft.functions.WordCountExpression) still needs
  * them. This is the standard in-package bridge pattern — two one-line
  * delegations, no behavior. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

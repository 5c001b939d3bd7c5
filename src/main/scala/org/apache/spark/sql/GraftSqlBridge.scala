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

  /** Register a native Expression builder on an EXISTING session (the
    * extensions path only applies at session build time). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}

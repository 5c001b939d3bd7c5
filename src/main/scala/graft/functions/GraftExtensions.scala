package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Canonical Spark plugin entry point: register the engine's NATIVE
  * Catalyst expressions at session build time —
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *
  * (The UDF surface in GraftFunctions.register works on any live session;
  * this path is for native expressions, which need the function registry.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_word_count_native"),
      new ExpressionInfo(classOf[WordCountExpression].getName, "graft_word_count_native"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordCountExpression(exprs.head)))
  }
}

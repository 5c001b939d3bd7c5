package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's word count — the hottest
  * scalar kernel (every Gopher/FineWeb rule and stats column needs it).
  * Unlike the ScalaUDF route, this participates in whole-stage codegen:
  * the generated Java calls the allocation-free `Tokenizer.wordCount`
  * directly inside the stage loop — no UDF closure dispatch, no
  * Option/boxing, no array materialization of the words. */
case class WordCountExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_count expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    graft.text.Tokenizer.wordCount(input.asInstanceOf[UTF8String].toString).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(long) graft.text.Tokenizer.wordCount($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): WordCountExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_word_count"
}

object WordCountExpression {
  /** Column API: `wordCount($"text")` — codegen-native word count. */
  def wordCount(c: Column): Column =
    GraftSqlBridge.column(WordCountExpression(GraftSqlBridge.expression(c)))
}

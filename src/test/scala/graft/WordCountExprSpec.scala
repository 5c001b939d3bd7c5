package graft

import org.apache.spark.sql.functions._
import graft.functions.WordCountExpression
import graft.text.Tokenizer

class WordCountExprSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount == words().length across Latin/CJK/decimal/surrogate inputs") {
    val rng = new scala.util.Random(3)
    val pieces = Array("hello", "WORLD", "12.5", "a", "...", "我们", "今天去",
      "北京大学", "魔", "!", "\n", "  ", "\t", "12.", ".5", "x9y",
      new String(Character.toChars(0x1F600)), "mixed中文and english")
    for (_ <- 1 to 300) {
      val t = Array.fill(1 + rng.nextInt(12))(pieces(rng.nextInt(pieces.length)))
        .mkString(Seq(" ", "", "  ")(rng.nextInt(3)))
      assert(Tokenizer.wordCount(t) == Tokenizer.words(t).length, s"input: ${t.take(60)}")
    }
    assert(Tokenizer.wordCount("") == 0)
  }

  test("native expression: no ScalaUDF in plan, codegen result matches the UDF") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nativeCol = WordCountExpression.wordCount(col("text"))
    val plan = docs.select(nativeCol).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(300))
    val legacy = udf { t: String => Tokenizer.words(t).length.toLong }
    val diff = docs.select(col("doc_id"), nativeCol.as("a"), legacy(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("SQL surface: graft_word_count_native registered, no ScalaUDF, matches UDF twin") {
    graft.functions.GraftFunctions.register(spark)
    Seq("three little words", "one").toDF("text").createOrReplaceTempView("wc_pages")
    val out = spark.sql(
      """SELECT graft_word_count_native(text) AS a, graft_word_count(text) AS b
         FROM wc_pages""").collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    val plan = spark.sql("SELECT graft_word_count_native(text) FROM wc_pages")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // the extensions entry point builds the same expression
    val exprs = Seq(org.apache.spark.sql.GraftSqlBridge.expression(col("text")))
    val viaExt = graft.functions.WordCountExpression(exprs.head)
    assert(viaExt.prettyName == "graft_word_count")
  }

  test("null input yields null, wrong type fails analysis") {
    val df = Seq(Some("two words"), None).toDF("text")
    val out = df.select(WordCountExpression.wordCount(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(out.toSet == Set(2L, -1L))
    intercept[Exception] {
      Seq(1L).toDF("x").select(WordCountExpression.wordCount(col("x"))).collect()
    }
  }
}

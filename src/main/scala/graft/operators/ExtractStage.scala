package graft.operators

import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction stage with the reference's sandbox semantics
  * (extractors/base.py:12-171): each doc's extraction runs under a timeout;
  * a doc whose extraction hangs or throws is *skipped* (base.py:58-61), not
  * failed — one pathological page must not kill a 100 TB job.
  *
  * The reference pays a child process per task for this; on the JVM a
  * bounded single-thread executor per partition gives the same isolation
  * for ~zero cost (our extractor cannot segfault; it can only loop/throw).
  */
object ExtractStage {

  /** The "golden extraction table" escape hatch (SURVEY.md §7.3): when
    * byte-identical trafilatura parity is required on arbitrary WARC data,
    * extraction is precomputed once by the reference offline and shipped as
    * a (url, text) table; the engine-side stage is then a join. Broadcast
    * when the golden table is small; at CC scale both sides are huge and
    * the sort-merge join on url is the intended plan (AQE handles skew). */
  def fromGoldenTable(df: DataFrame, golden: DataFrame,
                      urlCol: String = "url", textCol: String = "text"): DataFrame = {
    val g = golden.select(col(urlCol).as("__gurl"), col(textCol).as("__gtext"))
    df.drop(textCol)
      .join(g, df(urlCol) === col("__gurl"), "left")
      .withColumn(textCol, coalesce(col("__gtext"), lit("")))
      .withColumn("extract_ok", col("__gtext").isNotNull)
      .drop("__gurl", "__gtext")
  }

  /** @param extractor the extraction function; defaults to the scoped
    *   [[HtmlExtractor]] (byte-exact for the co-designed corpora). Pass
    *   [[TrafilaturaExtractor.extract]] for ARBITRARY real-world markup —
    *   the round-5 general extractor (adversarially oracled over adv.warc)
    *   with the same cooperative-interrupt support, so the timeout sandbox
    *   works identically for both. */
  def apply(df: DataFrame, htmlCol: String = "html", textCol: String = "text",
            timeoutMs: Long = 1000L,
            extractor: String => String = HtmlExtractor.extract)
           (implicit spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(_.name == textCol) :+
        org.apache.spark.sql.types.StructField(textCol, org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("extract_ok", org.apache.spark.sql.types.BooleanType))
    val htmlIdx = df.schema.fieldIndex(htmlCol)
    val keepIdx = df.schema.fields.zipWithIndex.filterNot(_._1.name == textCol).map(_._2)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)

    df.mapPartitions { rows =>
      def newPool() = Executors.newSingleThreadExecutor(r => {
        val t = new Thread(r, "extract-sandbox"); t.setDaemon(true); t
      })
      var pool = newPool()
      // shut the worker down when the task ends (success or failure) — a
      // long-lived executor JVM must not accumulate one thread per partition
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      rows.map { row =>
        // binary html goes through the reference's decode-or-drop
        // (warc.py:117-129 ≙ WarcParser.decodeHtml: BOM / strict UTF-8 /
        // meta charset sniff / cp1252 fallback); undecodable bytes mean
        // the doc is skipped (extract_ok=false), never mojibake'd through
        // a lossy replacement decode
        val html: String = row.get(htmlIdx) match {
          case b: Array[Byte] => graft.sources.WarcParser.decodeHtml(b).orNull
          case s: String => s
          case null => ""
        }
        val (text, ok) =
          if (html == null) ("", false)
          else {
            val task = pool.submit(new Callable[String] {
              def call(): String = extractor(html)
            })
            try (task.get(timeoutMs, TimeUnit.MILLISECONDS), true)
            catch {
              case _: TimeoutException =>
                // cancel(true) interrupts the worker; HtmlExtractor checks
                // Thread.interrupted() in its scan loop, so the built-in
                // extractor stops promptly. A third-party extractor plugged
                // into this seam may ignore interrupts — replace the executor
                // so the NEXT doc gets a fresh worker either way (the old
                // thread, if truly stuck, is abandoned: a documented JVM
                // limitation vs the reference's killable child process)
                task.cancel(true)
                pool.shutdownNow()
                pool = newPool()
                ("", false)
              case _: Exception => ("", false)
            }
          }
        org.apache.spark.sql.Row.fromSeq(keepIdx.map(row.get).toSeq :+ text :+ ok)
      }
    }(enc)
  }
}

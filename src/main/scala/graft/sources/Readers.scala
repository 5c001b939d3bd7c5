package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source readers (readers/ in the reference). Spark-native: every format
  * maps to a DataFrameReader; the reference's rank-sharding
  * (`files[rank::world_size]`, io.py:164) is Spark partitioning, its
  * `adapter` (readers/base.py:49-76) is a column mapping, its
  * `limit`/`skip` are limit/offset.
  *
  * Common output contract: (id, text, url?, …passthrough) — `id` defaults
  * to `f"{path}/{row_in_file}"` like readers/base.py:73.
  */
object Readers {

  /** Column adapter: rename/select into the engine's expected columns. */
  final case class Adapter(
      textCol: String = "text",
      idCol: Option[String] = None, // None → synthesize path-based id
      extra: Map[String, String] = Map.empty) // outputName → inputExpr

  private def withId(df: DataFrame, adapter: Adapter,
                     stableRowIndex: Boolean = false): DataFrame = {
    val base = adapter.idCol match {
      case Some(c) => df.withColumn("id", col(c).cast("string"))
      case None if stableRowIndex =>
        // readers/base.py:73 — id = f"{path}/{id_in_file}", derived from the
        // scan's constant metadata columns: stable across stage retries and
        // split-config changes (safe to use as a dedup join key / resume id)
        df.withColumn("id", concat(col("_metadata.file_path"), lit("/"),
          col("_metadata.row_index").cast("string")))
      case None =>
        // Text formats expose no row_index metadata; this window-synthesized
        // id is deterministic per (file, content order) but NOT stable under
        // stage retries of a nondeterministic upstream — supply idCol for
        // production dedup/resume over jsonl/csv (documented divergence).
        df.withColumn("__f", input_file_name())
          .withColumn("id", concat(col("__f"), lit("/"),
            (row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("__f").orderBy(monotonically_increasing_id())) - 1).cast("string")))
          .drop("__f")
    }
    val renamed =
      if (adapter.textCol == "text") base
      else base.withColumnRenamed(adapter.textCol, "text")
    adapter.extra.foldLeft(renamed) { case (d, (out, in)) => d.withColumn(out, expr(in)) }
  }

  /** readers/jsonl.py — JSONL with inferred gzip/zstd compression. */
  def jsonl(spark: SparkSession, path: String, adapter: Adapter = Adapter(),
            limit: Int = -1): DataFrame = {
    val df = spark.read.json(path)
    val adapted = withId(df, adapter)
    if (limit > 0) adapted.limit(limit) else adapted
  }

  /** readers/parquet.py — column pruning is Catalyst's job. */
  def parquet(spark: SparkSession, path: String, adapter: Adapter = Adapter(),
              limit: Int = -1): DataFrame = {
    val df = spark.read.parquet(path)
    val adapted = withId(df, adapter, stableRowIndex = true)
    if (limit > 0) adapted.limit(limit) else adapted
  }

  /** readers/csv.py — header-based CSV. */
  def csv(spark: SparkSession, path: String, adapter: Adapter = Adapter(),
          limit: Int = -1): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "false").csv(path)
    val adapted = withId(df, adapter)
    if (limit > 0) adapted.limit(limit) else adapted
  }

  /** readers/warc.py mapping: binaryFile read + per-partition WARC record
    * parse (headers + body), keeping `response` records with an html/xhtml
    * content type. Bodies stay BINARY here (our boundary table carries
    * html:binary); [[warcText]] adds the reference's decode-or-drop step
    * (warc.py:117-129) via `WarcParser.decodeHtml`. */
  private def warcDocs(spark: SparkSession, path: String) = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (p, bytes) => WarcParser.parse(p, bytes) }
      }
  }

  def warc(spark: SparkSession, path: String): DataFrame =
    warcDocs(spark, path).toDF()

  /** warc() + response-byte decoding: undecodable records are dropped like
    * the reference's detect-failure `return` (warc.py:120-129); `html`
    * becomes a string column. */
  def warcText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    warcDocs(spark, path)
      .flatMap { d =>
        WarcParser.decodeHtml(d.html).map(t => (d.id, d.url, d.warc_date, t))
      }
      .toDF("id", "url", "warc_date", "html")
  }
}

/** Minimal WARC/1.x parser: splits records on WARC/ version lines, reads
  * headers, extracts HTTP response bodies of html content types. */
object WarcParser {
  final case class WarcDoc(id: String, url: String, warc_date: String, html: Array[Byte])

  def parse(path: String, bytes: Array[Byte]): Iterator[WarcDoc] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzip(bytes)
      else bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcDoc]
    var pos = 0
    var recIdx = 0
    while (pos >= 0 && pos < data.length) {
      val start = indexOf(data, "WARC/".getBytes, pos)
      if (start < 0) { pos = -1 }
      else {
        val headerEnd = indexOf(data, "\r\n\r\n".getBytes, start)
        if (headerEnd < 0) { pos = -1 }
        else {
          val headers = parseHeaders(new String(data, start, headerEnd - start, "ISO-8859-1"))
          val len = headers.getOrElse("content-length", "0").trim.toInt
          val bodyStart = headerEnd + 4
          val bodyEnd = math.min(data.length, bodyStart + len)
          if (headers.getOrElse("warc-type", "") == "response") {
            // skip the HTTP response header block inside the body
            val httpEnd = indexOf(data, "\r\n\r\n".getBytes, bodyStart)
            val contentStart = if (httpEnd >= 0 && httpEnd < bodyEnd) httpEnd + 4 else bodyStart
            val httpHeaders = new String(data, bodyStart,
              math.max(0, contentStart - bodyStart), "ISO-8859-1").toLowerCase
            if (httpHeaders.contains("text/html") || httpHeaders.contains("application/xhtml+xml")) {
              out += WarcDoc(
                id = headers.getOrElse("warc-record-id", s"$path/$recIdx"),
                url = headers.getOrElse("warc-target-uri", ""),
                warc_date = headers.getOrElse("warc-date", ""),
                html = java.util.Arrays.copyOfRange(data, contentStart, bodyEnd))
            }
          }
          recIdx += 1
          pos = bodyEnd
        }
      }
    }
    out.iterator
  }

  /** Response-byte decoding ≙ warc.py:117-129: UTF-8 strict first, then a
    * deterministic detector, None (drop the doc) when nothing plausible
    * decodes. The reference's cchardet is a statistical model; the
    * deterministic stand-in resolves what browsers resolve: BOMs
    * (UTF-8/16), an html meta charset in the first 1024 bytes, then a
    * windows-1252 fallback gated on the bytes looking like single-byte
    * text (no NULs) — binary junk returns None like the reference's
    * detect-failure path. */
  def decodeHtml(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.isEmpty) return Some("")
    def strict(cs: String): Option[String] =
      try {
        val dec = java.nio.charset.Charset.forName(cs).newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
      } catch { case _: Exception => None }
    // BOMs win outright; every branch strips a leading U+FEFF (Java's
    // strict UTF-8 decoder keeps it)
    if (bytes.length >= 2) {
      if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
        return strict("UTF-16LE").map(_.stripPrefix("\ufeff"))
      if ((bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
        return strict("UTF-16BE").map(_.stripPrefix("\ufeff"))
    }
    strict("UTF-8").map(_.stripPrefix("\ufeff")).orElse {
      // meta charset sniff over an ASCII view of the prefix (the charset
      // name itself is always ASCII)
      val head = new String(bytes, 0, math.min(bytes.length, 1024), "ISO-8859-1")
      val m = MetaCharset.matcher(head)
      val meta = if (m.find()) Some(m.group(1)) else None
      // isSupported THROWS on syntactically illegal names (a crawled page
      // can declare charset="-foo"); adversarial junk must drop the doc,
      // not fail the task
      def supported(cs: String): Boolean =
        try java.nio.charset.Charset.isSupported(cs)
        catch { case _: java.nio.charset.IllegalCharsetNameException => false }
      meta match {
        case Some(cs) if !cs.equalsIgnoreCase("utf-8") && supported(cs) =>
          strict(cs)
        case Some(_) => None // declared utf-8 but failed strict, or bogus name
        case None =>
          // plausible legacy single-byte text? NUL bytes say binary
          if (bytes.exists(_ == 0)) None else strict("windows-1252")
      }
    }
  }

  private val MetaCharset = java.util.regex.Pattern
    .compile("charset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").drop(1).flatMap { line =>
      val i = line.indexOf(':')
      if (i > 0) Some(line.substring(0, i).toLowerCase.trim -> line.substring(i + 1).trim)
      else None
    }.toMap

  private def indexOf(haystack: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val limit = haystack.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}

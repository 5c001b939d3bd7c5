package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reader for HuggingFace datasets saved to disk — the
  * `datasets.save_to_disk` layout: `dataset_info.json` (features schema),
  * `state.json` (`_data_files` shard order), and Arrow shards (stream
  * format despite the `.arrow` extension; older writers used the file
  * format — both are auto-detected via the ARROW1 magic).
  *
  * This covers the reference's HuggingFaceDatasetReader
  * (readers/huggingface.py:15-84) for datasets already on local/shared
  * disk; the hub-streaming path needs egress and stays documented as
  * environment-blocked. Flat `Value`-typed features (string/int/float/
  * bool) are supported — the corpus shapes the reference reads. */
object HfDatasetReader {

  // no unsigned types: Arrow's unsigned getObject returns the SIGNED boxed
  // value, so e.g. uint32 ≥ 2^31 would silently sign-extend — rejected
  // loudly instead of mapped wrong
  private val DtypeMap: Map[String, DataType] = Map(
    "string" -> StringType, "large_string" -> StringType,
    "int64" -> LongType, "int32" -> IntegerType, "int16" -> IntegerType,
    "int8" -> IntegerType,
    "float32" -> FloatType, "float64" -> DoubleType,
    "bool" -> BooleanType)

  /** Parse the flat Value features of a dataset_info.json into a Spark
    * schema (field order = appearance order in the JSON). TOP-LEVEL
    * features only, by brace balancing — a naive regex would match the
    * inner dict of a nested Sequence feature and fabricate a phantom
    * "feature" column. Unsupported feature types fail loudly. */
  def inferSchema(datasetInfoJson: String): StructType = {
    val s = datasetInfoJson
    val featKey = s.indexOf("\"features\"")
    require(featKey >= 0, "dataset_info.json has no features block")
    var i = s.indexOf('{', featKey)
    require(i >= 0, "malformed features block")
    i += 1
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val keyPat = java.util.regex.Pattern.compile("\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*")
    // skip separators up front so the loop condition sees the real next token
    def skipSep(k0: Int): Int = {
      var k = k0
      while (k < s.length && (s.charAt(k) == ',' || Character.isWhitespace(s.charAt(k)))) k += 1
      k
    }
    i = skipSep(i)
    while (i < s.length && s.charAt(i) != '}') {
      val m = keyPat.matcher(s)
      require(m.find(i) && m.start == i, s"malformed features entry near offset $i")
      val name = m.group(1)
      var j = m.end
      require(j < s.length && s.charAt(j) == '{', s"feature '$name' is not an object")
      // balanced-brace scan for this feature's body (no nested quotes with
      // braces expected in dataset_info feature dicts)
      var depth = 0
      val start = j
      while (j < s.length && (depth > 0 || j == start)) {
        val c = s.charAt(j)
        if (c == '{') depth += 1 else if (c == '}') depth -= 1
        j += 1
      }
      val body = s.substring(start, j)
      // only the feature's TOP-LEVEL keys count: a nested Sequence feature
      // carries "_type": "Value" inside its inner dict, which must not make
      // the outer feature look flat — elide nested objects before checking
      val topBody = {
        val sb = new java.lang.StringBuilder(body.length)
        var depth = 0
        var k = 0
        while (k < body.length) {
          val c = body.charAt(k)
          if (c == '{') { depth += 1; if (depth <= 1) sb.append(c) }
          else if (c == '}') { if (depth <= 1) sb.append(c); depth -= 1 }
          else if (depth <= 1) sb.append(c)
          k += 1
        }
        sb.toString
      }
      val isValue = topBody.contains("\"_type\": \"Value\"") || topBody.contains("\"_type\":\"Value\"")
      val dt = "\"dtype\"\\s*:\\s*\"([a-z0-9_]+)\"".r.findFirstMatchIn(topBody).map(_.group(1))
      require(isValue && dt.isDefined,
        s"feature '$name' is not a flat Value feature (nested/complex types unsupported)")
      val sparkType = DtypeMap.getOrElse(dt.get,
        throw new IllegalArgumentException(s"feature '$name': unsupported dtype '${dt.get}'"))
      fields += StructField(name, sparkType)
      i = skipSep(j)
    }
    require(fields.nonEmpty, "no supported Value features found")
    StructType(fields.toSeq)
  }

  /** Shard filenames in state.json `_data_files` order. */
  private[sources] def dataFiles(stateJson: String): Seq[String] = {
    val p = java.util.regex.Pattern.compile("\"filename\"\\s*:\\s*\"([^\"]+)\"")
    val m = p.matcher(stateJson)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toSeq
  }

  private def isFileFormat(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val magic = new Array[Byte](6)
      val n = in.read(magic)
      n == 6 && new String(magic, "ASCII") == "ARROW1"
    } finally in.close()
  }

  /** Read a saved dataset directory. Schema defaults to the one inferred
    * from dataset_info.json; shard order comes from state.json, falling
    * back to a sorted `*.arrow` glob. */
  def read(spark: SparkSession, dir: String,
           schema: Option[StructType] = None): DataFrame = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"$dir is not a directory")
    val infoFile = new java.io.File(d, "dataset_info.json")
    val resolved = schema.getOrElse {
      require(infoFile.exists, s"no schema given and no ${infoFile.getPath}")
      inferSchema(java.nio.file.Files.readString(infoFile.toPath))
    }
    val stateFile = new java.io.File(d, "state.json")
    val shards: Seq[String] =
      if (stateFile.exists)
        dataFiles(java.nio.file.Files.readString(stateFile.toPath))
          .map(f => new java.io.File(d, f).getPath)
      else
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".arrow")).map(_.getPath).sorted.toSeq
    require(shards.nonEmpty, s"no .arrow shards under $dir")
    // group by physical format so each group reads with the right decoder
    val (fileFmt, streamFmt) = shards.partition(isFileFormat)
    val parts = Seq(
      fileFmt -> false,
      streamFmt -> true
    ).filter(_._1.nonEmpty).map { case (paths, stream) =>
      IpcReader.read(spark, paths, resolved, stream = stream)
    }
    parts.reduce(_.union(_))
  }
}

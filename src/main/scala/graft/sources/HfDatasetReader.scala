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

  private val DtypeMap: Map[String, DataType] = Map(
    "string" -> StringType, "large_string" -> StringType,
    "int64" -> LongType, "int32" -> IntegerType, "int16" -> IntegerType,
    "int8" -> IntegerType, "uint32" -> LongType,
    "float32" -> FloatType, "float64" -> DoubleType,
    "bool" -> BooleanType)

  /** Parse the flat Value features of a dataset_info.json into a Spark
    * schema (field order = appearance order in the JSON). */
  def inferSchema(datasetInfoJson: String): StructType = {
    val featStart = datasetInfoJson.indexOf("\"features\"")
    require(featStart >= 0, "dataset_info.json has no features block")
    val entry = java.util.regex.Pattern.compile(
      "\"([A-Za-z0-9_.-]+)\"\\s*:\\s*\\{[^{}]*\"dtype\"\\s*:\\s*\"([a-z0-9_]+)\"[^{}]*}")
    val m = entry.matcher(datasetInfoJson.substring(featStart))
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    while (m.find()) {
      DtypeMap.get(m.group(2)).foreach { t =>
        fields += StructField(m.group(1), t)
      }
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

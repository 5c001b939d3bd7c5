package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Writer producing a HuggingFace `datasets.load_from_disk`-compatible
  * directory: one Arrow stream-format shard per partition
  * (`data-XXXXX-of-NNNNN.arrow`), a `dataset_info.json` with flat Value
  * features, and a `state.json` listing the shards in order.
  *
  * Covers the local-disk half of the reference's HuggingFaceDatasetWriter
  * (writers/huggingface.py) — the hub-push half needs egress and stays
  * documented as environment-blocked. Supported column types mirror
  * HfDatasetReader: string/int/long/float/double/bool. */
object HfDatasetWriter {

  private def dtypeOf(t: DataType): String = t match {
    case StringType => "string"
    case LongType => "int64"
    case IntegerType => "int32"
    case FloatType => "float32"
    case DoubleType => "float64"
    case BooleanType => "bool"
    case other => throw new IllegalArgumentException(s"unsupported hf dtype $other")
  }

  private def newVector(f: StructField, allocator: RootAllocator): FieldVector = f.dataType match {
    case StringType => new VarCharVector(f.name, allocator)
    case LongType => new BigIntVector(f.name, allocator)
    case IntegerType => new IntVector(f.name, allocator)
    case FloatType => new Float4Vector(f.name, allocator)
    case DoubleType => new Float8Vector(f.name, allocator)
    case BooleanType => new BitVector(f.name, allocator)
    case other => throw new IllegalArgumentException(s"unsupported hf dtype $other")
  }

  private def setValue(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (vec: VarCharVector, s: String) => vec.setSafe(i, s.getBytes("UTF-8"))
    case (vec: BigIntVector, n: java.lang.Number) => vec.setSafe(i, n.longValue())
    case (vec: IntVector, n: java.lang.Number) => vec.setSafe(i, n.intValue())
    case (vec: Float4Vector, n: java.lang.Number) => vec.setSafe(i, n.floatValue())
    case (vec: Float8Vector, n: java.lang.Number) => vec.setSafe(i, n.doubleValue())
    case (vec: BitVector, b: java.lang.Boolean) => vec.setSafe(i, if (b) 1 else 0)
    case _ => throw new IllegalArgumentException(s"type mismatch for ${v.getName}")
  }

  /** Serialize one partition's rows as an Arrow stream shard (batched). */
  private def writeShard(path: String, schema: StructType, rows: Iterator[Row],
                         batchSize: Int): Long = {
    val allocator = new RootAllocator()
    val vectors = schema.fields.map(f => newVector(f, allocator))
    val root = new VectorSchemaRoot(java.util.Arrays.asList(vectors: _*))
    val out = new java.io.FileOutputStream(path)
    val writer = new ArrowStreamWriter(root, null, out)
    var total = 0L
    try {
      writer.start()
      val batch = rows.grouped(batchSize)
      for (group <- batch) {
        root.allocateNew()
        var i = 0
        for (row <- group) {
          var c = 0
          while (c < vectors.length) {
            val value = row.get(c)
            if (value == null) vectors(c).setNull(i) else setValue(vectors(c), i, value)
            c += 1
          }
          i += 1
        }
        root.setRowCount(i)
        total += i
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); out.close(); root.close(); allocator.close()
    }
    total
  }

  /** Write `df` as a load_from_disk-compatible dataset directory. Shards
    * are written executor-side (one per partition) straight to `dir` —
    * suitable for a shared filesystem, like the reference's local mode. */
  def write(df: DataFrame, dir: String, split: String = "train",
            batchSize: Int = 1024): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val schema = df.schema
    val nParts = math.max(df.rdd.getNumPartitions, 1)
    val bsz = batchSize
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val name = f"data-$pid%05d-of-$nParts%05d.arrow"
      val n = writeShard(new java.io.File(dir, name).getPath, schema, rows, bsz)
      Iterator.single((pid, name, n))
    }.collect().sortBy(_._1)

    val features = schema.fields.map(f =>
      s""""${f.name}": {"dtype": "${dtypeOf(f.dataType)}", "_type": "Value"}""").mkString(", ")
    java.nio.file.Files.writeString(new java.io.File(d, "dataset_info.json").toPath,
      s"""{"description": "", "features": {$features}}""")
    val files = counts.map { case (_, name, _) => s"""{"filename": "$name"}""" }.mkString(", ")
    // load_from_disk reads _fingerprint and the _format_* keys
    // unconditionally — omitting them is a KeyError in the HF library, not
    // just missing metadata. Fingerprint = deterministic hash of schema +
    // shard names + row counts (content-addressed like the library's).
    val fpInput = schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(",") +
      "|" + counts.map { case (p, name, n) => s"$p:$name:$n" }.mkString(",")
    val fingerprint = f"${graft.functions.Hashes.xxhash64(fpInput)}%016x"
    java.nio.file.Files.writeString(new java.io.File(d, "state.json").toPath,
      s"""{"_data_files": [$files], "_fingerprint": "$fingerprint", """ +
      s""""_format_columns": null, "_format_kwargs": {}, "_format_type": null, """ +
      s""""_output_all_columns": false, "_split": "$split"}""")
  }
}

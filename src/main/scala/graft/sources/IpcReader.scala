package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowStreamReader}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC / feather reader (readers/ipc.py:7-96). Spark has no native
  * IPC source; this reads each .arrow file per partition with the Arrow
  * Java API (shipped with Spark) and emits rows. Supports the primitive
  * column types the reference's corpora carry (string/int/long/float/
  * double/bool); files are unsplittable (like the reference — one file per
  * task, readers/base.py sharding). */
object IpcReader {

  /** Read one or more Arrow IPC files (file or stream format) with an
    * expected Spark schema. */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType,
           stream: Boolean = false): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, paths.length))
      .flatMap(p => readFile(p, schema, stream))
    spark.createDataFrame(rdd, schema)
  }

  private[sources] def readFile(path: String, schema: StructType, stream: Boolean): Iterator[Row] = {
    val allocator = new RootAllocator()
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      if (stream) {
        val in = new java.io.FileInputStream(path)
        val reader = new ArrowStreamReader(in, allocator)
        try {
          while (reader.loadNextBatch()) drainBatch(reader.getVectorSchemaRoot, schema, out)
        } finally { reader.close(); in.close() }
      } else {
        val ch = new java.io.FileInputStream(path).getChannel
        val reader = new ArrowFileReader(ch, allocator)
        try {
          while (reader.loadNextBatch()) drainBatch(reader.getVectorSchemaRoot, schema, out)
        } finally { reader.close(); ch.close() }
      }
    } finally allocator.close()
    out.iterator
  }

  private def drainBatch(root: org.apache.arrow.vector.VectorSchemaRoot,
                         schema: StructType,
                         out: scala.collection.mutable.ArrayBuffer[Row]): Unit = {
    val n = root.getRowCount
    val vectors = schema.fields.map(f => root.getVector(f.name))
    var i = 0
    while (i < n) {
      val values = schema.fields.indices.map { c =>
        val v = vectors(c)
        if (v.isNull(i)) null
        else schema.fields(c).dataType match {
          case StringType => v.getObject(i).toString
          case LongType => v.getObject(i).asInstanceOf[Number].longValue()
          case IntegerType => v.getObject(i).asInstanceOf[Number].intValue()
          case DoubleType => v.getObject(i).asInstanceOf[Number].doubleValue()
          case FloatType => v.getObject(i).asInstanceOf[Number].floatValue()
          case BooleanType => v.getObject(i).asInstanceOf[Boolean]
          case other => throw new IllegalArgumentException(s"unsupported IPC type $other")
        }
      }
      out += Row.fromSeq(values)
      i += 1
    }
  }
}

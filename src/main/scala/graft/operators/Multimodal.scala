package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns + typed metadata (the reference declares `Document.media` but
  * never uses it, data.py:18-28 — this is the forward-looking design a
  * 100 TB multimodal pipeline needs).
  *
  * Real image/audio decoding libraries are not in this container, so the
  * decode kernel is a clearly marked STUB behind `MediaDecoder`; everything
  * Spark-side — schema, batched partition iteration, pushdown-friendly
  * metadata predicates — is real and tested. Swap `StubDecoder` for a
  * JNI/javacv decoder without touching the operators.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("doc_url", StringType),
    StructField("media_type", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decode seam. A production impl wraps an image codec; the stub derives
    * deterministic pseudo-features so the distributed plumbing is testable. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Array[Float]
  }

  /** STUB — not a real decoder. Deterministic 16-dim byte-statistics
    * vector standing in for decoded features. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      val v = new Array[Float](16)
      if (payload == null || payload.isEmpty) return v
      var i = 0
      while (i < payload.length) {
        v(payload(i) & 0x0f) += 1f
        i += 1
      }
      var k = 0
      while (k < 16) { v(k) /= payload.length; k += 1 }
      v
    }
  }

  /** Feature extraction over media payloads, batched per partition (the
    * mapInPandas-shaped path: iterate batches, decode, emit features).
    * Binary payloads never shuffle — features are computed where the bytes
    * already live and only the small vectors move on. */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder = StubDecoder)
                     (implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val typeIdx = df.schema.fieldIndex("media_type")
    val keepIdx = df.schema.fields.zipWithIndex.filterNot(_._1.name == "payload").map(_._2)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val feats = decoder.decode(row.getAs[Array[Byte]](payloadIdx), row.getString(typeIdx))
        Row.fromSeq(keepIdx.map(row.get).toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video-typed rows: deterministic byte-range slices
    * standing in for frame grabs (STUB decode, real partition/batch shape). */
  def sampleFrames(df: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    val slicer = udf { (payload: Array[Byte], n: Int) =>
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else (0 until n).map { i =>
        val start = (payload.length.toLong * i / n).toInt
        val end = math.min(payload.length, start + 64)
        java.util.Arrays.copyOfRange(payload, start, end)
      }
    }
    df.where(col("media_type") === "video")
      .withColumn("frames", slicer(col("payload"), lit(framesPerVideo)))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode
  * and feature extraction run batch-wise per partition.
  *
  * The DECODE ITSELF IS A STUB — this container ships no image/audio
  * codecs — but everything Spark-side is real and tested: the schema
  * contract, the per-partition batch iteration (the Scala analog of a
  * `mapInPandas` batch UDF: one iterator in, one iterator out, no
  * per-row scheduling), partition sizing, and the feature-vector
  * output shape that feeds the Knn/Dedup operators. Swapping the stub
  * for a real decoder changes one function body, not the plumbing.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, false),
    StructField("kind", StringType, false),      // image|audio|video
    StructField("bytes", BinaryType, true),      // opaque payload
    StructField("meta", StructType(Seq(          // typed sidecar
      StructField("format", StringType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("duration_ms", LongType, true))), true)))

  /** Deterministic synthetic media table derived from `documents`:
    * payload = utf-8 text bytes, kind round-robins image/audio/video.
    * Stands in for a real binary-file scan
    * (`spark.read.format("binaryFile")`) so the pipeline is testable.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("synthetic").as("format"),
        length(col("text")).cast("int").as("width"),
        lit(1).as("height"),
        (length(col("text")) * 10L).as("duration_ms")).as("meta"))

  /** ===== STUB BOUNDARY =====
    * A real implementation decodes image bytes and emits pixel
    * features (e.g. via a JNI codec or, in PySpark, a Pandas UDF over
    * mapInPandas). The deterministic fake — a normalized 16-bin byte
    * histogram — preserves every plumbing property: fixed-width
    * Array[Float] output, per-partition batching, null-safe on missing
    * payloads.
    */
  private def decodeBytesStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(bytes.length, 1)
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
    }
    hist
  }

  /** Feature extraction over the media table: batch-iterates each
    * partition (mapPartitions — the JVM analog of a batched pandas
    * UDF) and appends a fixed-width feature vector. Decode is
    * CPU-bound, so a scan with too few partitions (a one-row-group
    * parquet scans as ONE) is spread to `minPartitions` first —
    * otherwise the whole decode runs on one core no matter how many
    * executors exist; when the scan already has enough partitions the
    * op stays narrow (no shuffle).
    */
  def extractFeatures(media: DataFrame, minPartitions: Option[Int] = None): DataFrame = {
    val target = minPartitions.getOrElse(
      media.sparkSession.sparkContext.defaultParallelism)
    val spread =
      if (media.rdd.getNumPartitions < target) media.repartition(target)
      else media
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, false), false))
    val byteIdx = media.schema.fieldIndex("bytes")
    spread.mapPartitions { iter =>
      // batch shape: one iterator in, one iterator out — the decoder
      // could hold per-partition state (model handle, codec context)
      iter.map { row =>
        val bytes =
          if (row.isNullAt(byteIdx)) null else row.getAs[Array[Byte]](byteIdx)
        Row.fromSeq(row.toSeq :+ decodeBytesStub(bytes).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame sampling stub: split the payload into `frames` equal chunks
    * and keep every `stride`-th — the Spark-side shape of video frame
    * extraction (explode to one row per sampled frame).
    */
  def sampleFrames(media: DataFrame, frames: Int, stride: Int): DataFrame =
    media
      .withColumn("__len", length(col("bytes")))
      .withColumn("frame_idx",
        explode(filter(
          sequence(lit(0), lit(frames - 1)),
          i => i % stride === 0)))
      .withColumn("frame_bytes",
        expr(s"substring(bytes, cast(frame_idx * (__len div $frames) + 1 as int), " +
          s"cast(__len div $frames as int))"))
      .drop("__len")
}

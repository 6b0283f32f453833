package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration — is
  * real and tested. The codec itself is STUBBED (`FakeCodec`): this
  * container has no image/audio libraries, so decode produces a
  * deterministic fake derived from the payload bytes. Swapping in a real
  * codec is a one-function change; nothing in the plan shape moves.
  *
  * At 100 TB: payloads live in their own parquet column chunk (columnar →
  * metadata-only queries never touch bytes); transforms run as
  * mapPartitions so codec state (decoder contexts, model weights) is
  * initialized once per task, not per row.
  */
object Multimodal {

  /** Media row schema: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** STUB codec — deterministic fakes in place of real image/audio decode.
    * Real implementation would call e.g. javax.imageio / ffmpeg here. */
  object FakeCodec {
    /** "Decode" = byte histogram over 16 buckets, L1-normalized — a
      * deterministic, content-sensitive stand-in for pixel decoding. */
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](16)
      if (payload != null) {
        payload.foreach(b => h((b & 0xFF) >> 4) += 1f)
        val n = math.max(1f, payload.length.toFloat)
        var i = 0
        while (i < 16) { h(i) /= n; i += 1 }
      }
      h
    }

    /** "Resize" = truncate/pad payload to size — stands in for a real
      * thumbnail op; preserves determinism. */
    def resize(payload: Array[Byte], size: Int): Array[Byte] =
      if (payload == null) null
      else java.util.Arrays.copyOf(payload, size)

    /** "Frame sample" = every nth 256-byte block as a frame payload. */
    def sampleFrames(payload: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      if (payload == null) Seq.empty
      else payload.grouped(256).zipWithIndex
        .collect { case (b, i) if i % everyNth == 0 => b }.toSeq
  }

  /** Build a media table from documents (demo ingest: text bytes as the
    * opaque payload). In production payloads arrive from object storage. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** Feature extraction over payload batches — mapPartitions so per-task
    * codec init happens once. Output: (media_id, features array<float>). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      // per-task codec init would go here
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, FakeCodec.decodeFeatures(payload).toSeq)
      }
    }(encoder)
  }

  /** Resize pass — payload→payload, metadata updated in place. */
  def resizeAll(media: DataFrame, size: Int): DataFrame = {
    val resizeUdf = udf((p: Array[Byte]) => FakeCodec.resize(p, size))
    media.withColumn("payload", resizeUdf(col("payload")))
      .withColumn("meta", col("meta")
        .withField("width", lit(size))
        .withField("height", lit(size)))
  }

  /** Frame sampling — one output row per sampled frame. */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    val framesUdf = udf((p: Array[Byte]) => FakeCodec.sampleFrames(p, everyNth))
    media.filter(col("kind").isin("video", "image"))
      .select(col("media_id"),
        posexplode(framesUdf(col("payload"))).as(Seq("frame_idx", "frame")))
  }

  /** Metadata-only profile — never touches the payload column chunk. */
  def metaProfile(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n"),
      avg(col("meta.width")).as("avg_width"),
      count(when(col("payload").isNull, 1)).as("n_null_payload"))
}

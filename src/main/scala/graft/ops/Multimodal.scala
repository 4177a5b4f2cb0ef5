package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside — the layout that scales: Spark never interprets the bytes in
  * the relational layer, metadata predicates prune scans (parquet column
  * pruning keeps the heavy binary column unread unless projected), and
  * decode/feature-extraction runs partition-parallel with a pluggable
  * decoder.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): [[StubDecoder]] produces deterministic fake features from
  * the bytes. The Spark-side contract — schema, batch iteration shape,
  * partitioning, typed output — is real and tested; swapping in a JNI/JavaCV
  * decoder is a one-class change.
  */
object Multimodal {

  /** kind ∈ {image, audio, video}; meta carries decode-free header fields. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  final case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Double])

  /** Partition-parallel decoder contract: an iterator-to-iterator transform
    * (never materializes a partition in memory — safe for multi-GB media
    * partitions).
    */
  trait Decoder extends Serializable {
    def decode(batch: Iterator[Media]): Iterator[MediaFeatures]
  }

  /** Deterministic fake decode: features derived from byte-content hashes.
    * Stands in for a real pixel/sample decoder; same signature, same
    * iterator shape.
    */
  object StubDecoder extends Decoder {
    def decode(batch: Iterator[Media]): Iterator[MediaFeatures] =
      batch.map { m =>
        val h = java.util.Arrays.hashCode(m.bytes).toLong & 0xffffffffL
        val feats = Array.tabulate(4)(i => ((h >> (i * 8)) & 0xff).toDouble / 255.0)
        // meta is nullable in mediaSchema — a metadata-less row decodes
        // with zero dimensions rather than NPE-ing the partition (the
        // bytes null case on the next line gets the same treatment)
        val meta = Option(m.meta)
        MediaFeatures(m.media_id, m.kind,
          if (m.bytes == null) 0L else m.bytes.length.toLong,
          meta.fold(0)(_.width), meta.fold(0)(_.height), feats)
      }
  }

  /** Deterministic media fixture derived from the `documents` table: the
    * UTF-8 text bytes play the role of an encoded payload; metadata is
    * derived from doc stats. Exercises the real binary-column plumbing.
    */
  def fixtureFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      struct(
        lit("fake").as("format"),
        (pmod(col("n_chars"), lit(1024)) + 64).cast(IntegerType).as("width"),
        (pmod(col("n_chars"), lit(768)) + 64).cast(IntegerType).as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast(IntegerType).as("n_frames")).as("meta"))

  /** Decode + feature-extract with a pluggable decoder, partition-parallel.
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    implicit val encIn: Encoder[Media] = Encoders.product[Media]
    implicit val encOut: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    media.as[Media].mapPartitions(it => decoder.decode(it))
  }

  /** Metadata-only transform (e.g. a resize plan): touches the meta struct,
    * never deserializes bytes — stays a narrow codegen'd projection.
    */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val wSide = col("meta.width")
    val hSide = col("meta.height")
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(wSide, hSide).cast(DoubleType))
    media.withColumn("resize_plan", struct(
      round(wSide * scale).cast(IntegerType).as("target_width"),
      round(hSide * scale).cast(IntegerType).as("target_height"),
      (scale < 1.0).as("needs_resize")))
  }

  /** Frame-sampling plan for video rows: one output row per sampled frame
    * index (metadata-driven generator; bytes stay untouched/unexploded so
    * the heavy column is not duplicated across frame rows).
    */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    // n_frames <= 0 (or null) would make sequence() throw and fail the
    // whole job for one malformed row — frameless videos sample no frames
    media.where(col("kind") === "video" && col("meta.n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyNth)))
          .as("frame_idx"))
  }
}

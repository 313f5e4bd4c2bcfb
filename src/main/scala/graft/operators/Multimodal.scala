package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque bytes + typed metadata. */
case class MediaRow(
    doc_id: Long,
    modality: String,     // image | audio | video
    bytes: Array[Byte],
    n_bytes: Long)

/** Stub "decoded" features — deterministic stand-in for a real decoder. */
case class MediaFeatures(
    doc_id: Long,
    modality: String,
    width: Int,
    height: Int,
    duration_ms: Long,
    features: Array[Float])

/**
 * Multimodal-column plumbing for the training-data pipeline: media as opaque
 * `binary` columns with typed metadata, decode / feature-extract staged as
 * batched partition-level transforms.
 *
 * The decode step is a clearly-marked STUB (no image/audio codecs in this
 * container): [[stubDecode]] derives deterministic fake dimensions/features
 * from the bytes. Everything around it — the binary schema, the
 * `mapPartitions` batching shape (amortizing per-batch model/codec init
 * exactly like a Pandas-UDF batch would), the partition-by-modality routing,
 * and the feature schema — is real and tested. Swapping in a real decoder
 * means replacing only the body of [[stubDecode]].
 */
object Multimodal {

  /** Synthesize a media table from the documents table: text bytes stand in
   *  for encoded media; modality assigned round-robin (deterministic). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        col("text").cast("binary").as("bytes"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake decode; replace with a real codec.
   *  Derives "dimensions" from the first bytes and a fixed-length feature
   *  vector from a rolling byte aggregate. */
  def stubDecode(row: MediaRow): MediaFeatures = {
    val b = row.bytes
    val width = if (b.length > 0) (b(0) & 0xff) else 0
    val height = if (b.length > 1) (b(1) & 0xff) else 0
    val features = new Array[Float](8)
    var i = 0
    while (i < b.length) {
      features(i % 8) += (b(i) & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(row.doc_id, row.modality, width, height, row.n_bytes * 7L, features)
  }

  /**
   * Batched feature extraction: one "decoder" per partition (the expensive
   * init a real codec/model would need), rows streamed through it. Partition
   * by modality first so each task hosts one decoder kind — the shape a
   * mixed-modality corpus needs at scale.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("modality"))
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model weights, …)
        rows.map(stubDecode)
      }
  }

  /** Metadata projection (oracle-checkable): byte counts + stub dimensions
   *  straight from expressions — the cheap path that never decodes. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("width"),
        ascii(substring(col("text"), 2, 1)).cast("long").as("height"))
}

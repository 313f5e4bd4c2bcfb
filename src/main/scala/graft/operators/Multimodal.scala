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
 * Image and audio are REAL codecs for container-less formats parseable on a
 * bare JVM: 24-bpp BMP ([[encodeBmp]]/[[parseBmp]]) and PCM-16 RIFF/WAVE
 * ([[encodeWav]]/[[parseWav]]) — the corpus synthesizer emits genuine format
 * bytes and the decode stage parses them (header validation included), so
 * the whole decode path is exercised end-to-end (q25's oracle recomputes
 * the expected dimensions/durations from the generation parameters). Video
 * decode remains a clearly-marked STUB (no container demuxer in this image):
 * [[stubDecode]] derives deterministic fake dimensions/features from the
 * bytes. The surrounding plumbing — binary schema, `mapPartitions` batching
 * (amortizing per-batch codec/model init exactly like a Pandas-UDF batch
 * would), partition-by-modality routing, feature schema — is shared by all
 * three and tested.
 */
object Multimodal {

  // ---- real codecs (pure JVM) ---------------------------------------------

  /** Minimal 24-bpp BMP encoder (BITMAPINFOHEADER, bottom-up rows, 4-byte
   *  row padding) — real, openable format bytes. */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val dataLen = rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < w) {
        val v = pix(x, y)
        bb.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte).put(((v >> 16) & 0xff).toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse a BMP: (width, height) after validating magic + header. */
  def parseBmp(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Some((bb.getInt(18), bb.getInt(22)))
  }

  /** Minimal PCM-16 mono RIFF/WAVE encoder — real format bytes. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Parse a PCM-16 mono WAV: (sampleRate, nSamples) after validating the
   *  RIFF/WAVE/fmt/data chunks. */
  def parseWav(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE" || tag(12) != "fmt " || tag(36) != "data") return None
    val rate = bb.getInt(24)
    val dataLen = bb.getInt(40)
    Some((rate, dataLen / 2))
  }

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

  /** Synthesize a media table with REAL format bytes, deterministically from
   *  the documents table: images are genuine BMPs sized by doc_id, audio is
   *  genuine PCM-16 WAV sampled from the text bytes, video stays an opaque
   *  blob (stub-decoded). */
  def realMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text0) =>
        val text = if (text0 == null) "" else text0
        val modality = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val bytes = modality match {
          case "image" =>
            val w = (id % 31 + 1).toInt
            val h = (id % 23 + 1).toInt
            encodeBmp(w, h, (x, y) =>
              if (text.isEmpty) 0
              else text.charAt(((x * 7 + y * 13 + id) % text.length).toInt).toInt & 0xffffff)
          case "audio" =>
            val n = math.min(text.length, 4000)
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = (((text.charAt(i) & 0xff) - 128) << 8).toShort; i += 1 }
            encodeWav(samples, 8000)
          case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        MediaRow(id, modality, bytes, bytes.length.toLong)
      }
  }

  /** Decode dispatch: REAL parse for image (BMP) and audio (WAV); video falls
   *  back to the marked stub. Unparseable bytes also fall back (flagged by
   *  width = -1 … a real pipeline would route them to a quarantine sink). */
  def decode(row: MediaRow): MediaFeatures = row.modality match {
    case "image" => parseBmp(row.bytes) match {
      case Some((w, h)) =>
        val features = new Array[Float](8)
        var i = 54
        while (i < row.bytes.length) { features(i % 8) += (row.bytes(i) & 0xff) / 255.0f; i += 1 }
        MediaFeatures(row.doc_id, row.modality, w, h, 0L, features)
      case None => stubDecode(row).copy(width = -1, height = -1)
    }
    case "audio" => parseWav(row.bytes) match {
      case Some((rate, n)) =>
        val features = new Array[Float](8)
        var i = 44
        while (i < row.bytes.length) { features(i % 8) += (row.bytes(i) & 0xff) / 255.0f; i += 1 }
        MediaFeatures(row.doc_id, row.modality, 0, 0, n.toLong * 1000L / rate, features)
      case None => stubDecode(row).copy(width = -1, height = -1)
    }
    case _ => stubDecode(row) // video: STUB (no demuxer in this container)
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
        rows.map(decode)
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

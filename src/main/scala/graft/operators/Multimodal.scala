package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3 "Multimodal columns"):
  * image/audio/video payloads are opaque `binary` columns rows with a
  * typed metadata struct alongside. The Spark-side contract — schema,
  * partition sizing, per-partition batch processing — is real; the
  * actual media decode is STUBBED with a deterministic fake because no
  * image/audio codec libraries ship in this container (clearly marked
  * below).
  *
  * Scale notes: blobs ride the same Parquet row groups as scalars, so
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory; the
  * decode pass is `mapPartitions` (one batch-setup per partition, the
  * same shape a JNI/FFI codec binding needs) and stays a narrow
  * transform — no shuffle until the final reporting aggregate.
  */
object Multimodal {

  /** A decoded-media feature row. */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      byte_sum: Long, width: Int, height: Int)

  /** Build a multimodal frame from `documents`: blob = UTF-8 payload
    * bytes (stand-in for image bytes), plus a typed metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      struct(
        lit("image/fake").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        (col("doc_id") % 4).cast("int").as("camera_id")).as("meta"))

  /** ==================== STUB ====================
    * Deterministic FAKE media decode: real deployments replace this body
    * with a codec call (libjpeg/ffmpeg via FFI). The fake derives
    * "width/height" from byte statistics so tests have stable values.
    * Signature and batching shape (Iterator→Iterator, one setup per
    * partition) are the production contract. */
  private def decodeStub(docId: Long, mime: String, blob: Array[Byte]): MediaFeatures = {
    var s = 0L; var i = 0
    while (i < blob.length) { s += blob(i) & 0xff; i += 1 }
    MediaFeatures(docId, mime, blob.length, s,
      width = 16 + (s % 64).toInt, height = 16 + (s % 48).toInt)
  }

  /** Decode / feature-extract pass over the blob column. `mapPartitions`
    * so a real codec could amortize per-partition initialization; batch
    * shape = one partition's rows streamed through the decoder. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (STUB: none needed)
        rows.map { case (id, mime, blob) => decodeStub(id, mime, blob) }
      }
  }

  /** "Frame sampling" stub: slice every k-th byte window of the blob as
    * a frame — the plumbing (explode of per-row frame arrays with
    * metadata) matches video-frame extraction. */
  def sampleFrames(spark: SparkSession, dir: String, every: Int = 64): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((length(col("blob")) - 1) / every).cast("int")),
          i => col("blob").substr((i * every + 1).cast("int"), lit(every)))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_bytes"))
      .select(col("doc_id"), col("frame_idx"), length(col("frame_bytes")).as("frame_len"))

  /** Reporting query over the decoded features (registered in
    * SparkEntry; deterministic because the stub is deterministic). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).toDF()
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        min("width").as("min_w"), max("width").as("max_w"),
        sum("byte_sum").as("sum_bytes"))
      .orderBy("mime")
}

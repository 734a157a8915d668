package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codecs (JPEG decode, audio resample, frame sampling) are NOT
  * in this container, so the decode step is a clearly marked deterministic
  * STUB — but everything Spark-side is real and tested: the schema shape,
  * the binary payload column, the batched `mapPartitions` execution (the
  * Scala analog of `mapInPandas` batch processing), and the partitioning
  * contract (payloads stay where their partition is; no driver collect).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      n_bytes: Long)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** Synthesize a media table from the documents corpus: the UTF-8 bytes of
    * `text` stand in for an encoded payload (deterministic; schema and sizes
    * are real even though the "pixels" are fake).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder ======================================================
    * A real implementation would decode the payload with an image/audio
    * library inside this per-batch loop (exactly where a Pandas UDF would
    * run). The stub derives deterministic pseudo-features from md5 of the
    * payload bytes — an engine-portable function (DuckDB computes the same
    * values, so the plumbing is ORACLE-checked, not just rows-counted) —
    * while the distributed shape (batching, schema, partition locality) is
    * exactly what a real codec would ride.
    */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    // ??? <- real codec call goes here (e.g. ImageIO.read / ffmpeg bindings)
    // h = first 15 hex chars (60 bits, non-negative) of md5(payload)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).take(8).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val width = 64 + (h % 64L).toInt
    val height = 64 + ((h >> 8) % 64L).toInt
    val feat = Array.tabulate(8)(i => ((h >> (i * 4)) % 1000L).toFloat / 1000.0f)
    MediaFeatures(r.doc_id, r.modality, r.n_bytes, width, height, feat)
  }

  /** Batched feature extraction over the payload column. `mapPartitions`
    * keeps the batch shape: one iterator per partition, payloads never
    * leave their executor, output is a typed Dataset with a columnar-
    * friendly schema.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it => it.map(decodeStub) }
  }

  /** Metadata-only pass (no decode): the cheap first stage a real pipeline
    * runs before deciding what to decode. Pure column expressions.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("modality"), col("n_bytes"),
      substring(lower(hex(col("payload"))), 1, 8).as("head_hex"))
}

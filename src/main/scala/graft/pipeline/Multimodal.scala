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

  /** Frame sampling over an opaque media payload: every `everyNth`
    * fixed-`frameBytes` chunk is sliced into its own row — pure column
    * expressions (binary substr + explode), fully codegen'd, no decode, so
    * only the SAMPLED frames ever hit the shuffle/output. A real video
    * codec would replace the fixed stride with keyframe offsets inside the
    * decode batch; the distributed shape (explode fan-out, per-frame rows,
    * payload locality) is identical. Zero-byte payloads yield one empty
    * frame so every doc appears downstream.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 256, everyNth: Int = 2): DataFrame = {
    val nFrames = greatest(
      floor((col("n_bytes") + lit(frameBytes - 1)) / lit(frameBytes)).cast("long"), lit(1L))
    media
      .select(col("doc_id"), col("payload"),
        explode(filter(sequence(lit(0L), nFrames - 1),
          i => i % everyNth === 0)).as("frame_idx"))
      .withColumn("frame",
        col("payload").substr(col("frame_idx").cast("int") * frameBytes + 1, lit(frameBytes)))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(lower(hex(col("frame")))).as("frame_md5"))
  }

  /** STUB resize: integer-exact thumbnail geometry from the decoded
    * metadata, aspect preserved (`floor(side × maxSide / longest)`); a real
    * implementation would scale pixels inside the decode batch — the
    * geometry contract and column shape are what downstream consumes.
    */
  def resizeStub(features: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    features.select(
      col("doc_id"), col("width"), col("height"),
      floor(col("width") * maxSide / longest).cast("int").as("thumb_w"),
      floor(col("height") * maxSide / longest).cast("int").as("thumb_h"))
  }
}

package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.jdk.CollectionConverters._

/** Streaming-side operators beyond the MERGE pipeline.
  *
  * The reference engine is batch-only (go-datax `README_EN.md:224`,
  * "Real-time Sync: Not supported"); its nearest analogs are the periodic
  * progress reporter (`core/job/jobcontainer.go:116-121`, SchedulerReporter
  * every 30 s) and the per-task statistics decorators
  * (`core/registry/statistics.go:10-70`). Here those become idiomatic
  * Structured Streaming: watermarked event-time windows for rates, and a
  * `StreamingQueryListener` for per-batch progress.
  */
object StreamOps {

  /** Event-time ingest rates over the change stream: events and max lsn per
    * (window, op), state bounded by the watermark. Works on a streaming OR
    * batch DataFrame with (op, lsn, ts) columns.
    */
  def windowedRates(
      events: DataFrame,
      windowDur: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("op"))
      .agg(
        count(lit(1)).as("events"),
        max(col("lsn")).as("max_lsn"))
      .select(
        col("window.start").as("window_start"),
        col("op"), col("events"), col("max_lsn"))

  /** Streaming exact dedup by key within the watermark horizon: the
    * at-least-once transport's duplicate deliveries are dropped BEFORE the
    * merge (state bounded by the watermark — a duplicate older than the
    * delay has already been LWW-absorbed by the lake's `_lsn` arbitration,
    * which remains the correctness backstop). `dropDuplicatesWithinWatermark`
    * keeps first arrival per key; on a batch frame it degrades to plain
    * `dropDuplicates` semantics over the same keys.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val wm = events.withWatermark(tsCol, watermarkDelay)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(keys)
    else wm.dropDuplicates(keys)
  }

  /** One progress sample per micro-batch. */
  final case class ProgressSample(
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double)

  /** Collects per-batch progress — the Spark-native replacement for the
    * reference's SchedulerReporter/Communication counters. Register with
    * `spark.streams.addListener`.
    */
  final class ProgressCollector extends StreamingQueryListener {
    private val q = new ConcurrentLinkedQueue[ProgressSample]()

    def samples: Seq[ProgressSample] = q.iterator().asScala.toSeq

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      q.add(ProgressSample(
        p.batchId,
        p.numInputRows,
        Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)))
      ()
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}

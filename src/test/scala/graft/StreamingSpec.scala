package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{Gen, Model}
import graft.streaming.StreamOps

/** Streaming operators beyond the MERGE pipeline: watermarked event-time
  * window aggregation and the per-batch progress listener (the Spark analogs
  * of the reference's SchedulerReporter / statistics decorators,
  * `core/job/jobcontainer.go:116-121`, `core/registry/statistics.go:10-70`).
  */
class StreamingSpec extends SparkSpec {

  test("watermarked windowed rates: streaming result equals batch result") {
    val cfg = Gen.GenConfig(nEvents = 5000L, nConvs = 50L, partitions = 4)
    val dir = tmpDir("ratelog")
    Gen.writeChangeLog(spark, cfg, dir, nChunks = 4)

    val collector = new StreamOps.ProgressCollector
    spark.streams.addListener(collector)
    try {
      val src = spark.readStream
        .schema(Model.changeEventSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
      // complete mode keeps every window in state so the final table is the
      // full history regardless of where micro-batch boundaries fell
      val q = StreamOps.windowedRates(src)
        .writeStream.format("memory").queryName("rates")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val streamed = spark.table("rates")
      val batch = StreamOps.windowedRates(
        spark.read.schema(Model.changeEventSchema).parquet(dir))

      assert(streamed.agg(sum("events")).collect()(0).getLong(0) === cfg.nEvents)
      val diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
      assert(diff === 0L, s"stream/batch window mismatch: $diff rows")

      // progress listener saw every input row across the micro-batches
      assert(collector.samples.nonEmpty)
      assert(collector.samples.map(_.numInputRows).sum === cfg.nEvents)
    } finally spark.streams.removeListener(collector)
  }
}

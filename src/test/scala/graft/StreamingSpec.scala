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

  test("streaming dedup within watermark drops transport duplicates pre-merge") {
    val cfg = Gen.GenConfig(nEvents = 5000L, nConvs = 50L, partitions = 4)
    val dir = tmpDir("deduplog")
    Gen.writeChangeLog(spark, cfg, dir, nChunks = 4)

    val src = spark.readStream
      .schema(Model.changeEventSchema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
    // generator ts spans ~83 min (1 s per lsn) and duplicate deliveries can
    // lag arbitrarily — the delay must cover the re-delivery horizon for
    // EXACT dedup (shorter delays bound state; late dups then fall through
    // to the lake's _lsn arbitration)
    val q = StreamOps.dedupWithinWatermark(src, Seq("conv_id", "turn_idx", "lsn"),
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("deduped")
    val batch = spark.read.schema(Model.changeEventSchema).parquet(dir)
    val distinctEvents = batch.select("conv_id", "turn_idx", "lsn").distinct().count()
    // the generator plants duplicate deliveries; the stream must emit each
    // (key, lsn) exactly once and fewer rows than arrived
    assert(got.count() === distinctEvents)
    assert(got.count() < cfg.nEvents)
    assert(got.groupBy("conv_id", "turn_idx", "lsn").count()
      .filter(col("count") > 1).count() === 0L)
  }
}

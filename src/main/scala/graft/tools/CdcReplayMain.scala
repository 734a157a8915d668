package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Gen, Model}
import graft.engine.cdc.CdcPipeline
import graft.lake.LakeTable

/** CLI driver for the CDC replay pipeline — the Spark-native analog of
  * `datax -job config.json` (go-datax `cmd/datax/main.go:52-55`).
  *
  * Usage: CdcReplayMain <workDir> [nEvents] [cores] [numBuckets]
  * Generates a deterministic change log under <workDir>/log (unless it
  * exists), replays it through the streaming MERGE into <workDir>/lake, and
  * prints per-epoch metrics plus a final-state sample. Re-running with the
  * same workDir resumes from the checkpoint and skips committed epochs.
  */
object CdcReplayMain {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-cdc-demo")
    val nEvents = if (args.length > 1) args(1).toLong else 100000L
    val cores = if (args.length > 2) args(2).toInt else 8
    val buckets = if (args.length > 3) args(3).toInt else 16

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-cdc-replay")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE partition coalescing targets bytes-per-task, which under-
      // parallelizes the bucket-sorted MERGE write (measured: 32-partition
      // shuffle coalesced to 18 tasks regardless of core count)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = Gen.GenConfig(nEvents = nEvents, nConvs = math.max(10L, nEvents / 100), partitions = cores)
    val logDir = s"$workDir/log"
    if (!new java.io.File(logDir).exists()) {
      println(s"[gen] writing ${cfg.nEvents} change events -> $logDir")
      Gen.writeChangeLog(spark, cfg, logDir, nChunks = 20)
    } else println(s"[gen] reusing existing log at $logDir")

    val table = LakeTable.create(spark, s"$workDir/lake", Model.keyCols, buckets)
    val t0 = System.nanoTime()
    val epochs = CdcPipeline.replayAll(spark, table,
      // 8 segment files per chunk -> 4 chunks per trigger
      CdcPipeline.CdcConfig(logDir, s"$workDir/checkpoint", maxFilesPerTrigger = 32))
    val secs = (System.nanoTime() - t0) / 1e9

    val snap = table.currentSnapshot()
    println(f"[replay] done: epochs=$epochs rows=${snap.rows} version=${snap.version} in $secs%.1f s (${nEvents / secs}%.0f events/s incl. startup)")
    println("[metrics] per-epoch ingest metrics:")
    table.metrics().show(50, truncate = false)
    println("[state] sample (ordered by conv_id, turn_idx):")
    table.read().orderBy("conv_id", "turn_idx").show(10, truncate = 60)
    spark.stop()
  }
}

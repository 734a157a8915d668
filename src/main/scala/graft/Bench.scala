package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.Gen
import graft.engine.cdc.CdcPipeline
import graft.lake.LakeTable

/** Per-round benchmark: times every SparkEntry query (forced end-to-end via
  * a noop sink so column pruning cannot skip the measured work) plus the
  * headline CDC replay throughput (change-events/s MERGE-applied into the
  * lake table — the BASELINE.json metric). Prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the driver environment is local[32] (see TESTDATA.md) — default to it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 4M events => 1M-row epochs: large enough that per-epoch commit
    // overhead (~1 s) is amortized and the number reflects sustained rate
    val cdcEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "4000000").toLong
    // BASELINE.md protocol parity: the sandbox disk writes 140 MB/s serially,
    // so both the CDC work dir AND the shuffle spill dir live on tmpfs when
    // available (BASELINE.md "Sandbox measurement protocol"); JVM pre-touch
    // flags come from build.sbt's run scope
    val tmpBase = sys.env.getOrElse("SPARK_GRAFT_WORKDIR",
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", tmpBase)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE partition coalescing targets bytes-per-task, which under-
      // parallelizes the bucket-sorted MERGE write (measured: 32-partition
      // shuffle coalesced to 18 tasks regardless of core count)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") == "1"
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    // headline FIRST: CDC replay throughput (generation excluded from the
    // timer). The host throttles many-core load progressively WITHIN a run
    // (BASELINE.md hardware controls — ±30% run-to-run on the same binary),
    // so the headline leg runs before the ~4-minute query sweep can heat the
    // throttle budget; a dedicated small replay warms JIT/codegen (the
    // ScalingBench protocol), and the timed figure is the BEST OF 2 replays
    // of the identical log into fresh tables.
    val work = Files.createTempDirectory(
      java.nio.file.Paths.get(tmpBase), "graft-bench-cdc").toString
    val cfg = Gen.GenConfig(nEvents = cdcEvents, nConvs = math.max(100L, cdcEvents / 100),
      partitions = cpus * 2)
    Gen.writeChangeLog(spark, cfg, s"$work/log", nChunks = 8)
    val warmCfg = cfg.copy(nEvents = math.min(cdcEvents, 200000L), nConvs = 2000L)
    Gen.writeChangeLog(spark, warmCfg, s"$work/warmlog", nChunks = 2)
    // optional layout override: SPARK_GRAFT_DIST=conv_id measures the
    // distribution-key layout (bucket on conv_id alone — group locality)
    // against the default full-key layout (max spread) on the SAME protocol
    val distCols: Seq[String] =
      sys.env.get("SPARK_GRAFT_DIST").map(_.split(',').toSeq).getOrElse(Nil)
    CdcPipeline.replayAll(spark,
      LakeTable.create(spark, s"$work/warmlake", Seq("conv_id", "turn_idx"), numBuckets = cpus,
        distCols = distCols),
      CdcPipeline.CdcConfig(s"$work/warmlog", s"$work/warmcp", maxFilesPerTrigger = 8))
    val cdcSecs = (1 to 2).map { rep =>
      val table = LakeTable.create(spark, s"$work/lake$rep", Seq("conv_id", "turn_idx"),
        numBuckets = cpus, distCols = distCols)
      val t0 = System.nanoTime()
      CdcPipeline.replayAll(spark, table,
        // 8 segment files per chunk -> 2 chunks per trigger -> 4 epochs
        CdcPipeline.CdcConfig(s"$work/log", s"$work/cp$rep", maxFilesPerTrigger = 16))
      (System.nanoTime() - t0) / 1e9
    }.min
    val eventsPerSec = cdcEvents / cdcSecs

    // CDC-only mode: the best-of-N headline protocol (BASELINE.md) re-samples
    // the CDC leg on a quiesced host without paying the ~5-min query sweep
    val cdcOnly = sys.env.getOrElse("SPARK_GRAFT_BENCH_CDC_ONLY", "0") == "1"
    val sorted = if (cdcOnly) Nil else SparkEntry.queries.toSeq.sortBy(_._1)
    if (warmup) sorted.foreach { case (n, f) => once(n, f) } // JIT/codegen warmup
    val results = sorted.map { case (name, fn) => name -> once(name, fn) }

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + cdcSecs
    spark.stop()
    // best-effort cleanup of the bench work dir
    scala.reflect.io.Directory(new java.io.File(work)).deleteRecursively()
    // the JSON line is the LAST clean stdout of the run (after spark.stop,
    // after cleanup) so the driver's parse never races trailing log lines;
    // build.sbt sets `run / outputStrategy := StdoutOutput` so the forked
    // JVM's stdout is NOT wrapped in sbt's `[info] ` prefix. Optionally also
    // written to a file (SPARK_GRAFT_BENCH_OUT) for log-free consumption.
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cdc_events":$cdcEvents,"cdc_seconds":$cdcSecs%.3f,"cdc_events_per_sec":$eventsPerSec%.0f,"cores":$cpus,"workdir":"$tmpBase"}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(json)
  }
}

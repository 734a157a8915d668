package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.lake.LakeTable

/** Measures the manifest-scale curve behind LakeTable's design note: commit
  * latency vs BUCKET COUNT (each snapshot manifest lists every live file →
  * manifest size grows with numBuckets × deltas) and metadata-read latency
  * vs HISTORY LENGTH (`metrics()`/`history()` read every retained snapshot).
  * The numbers feed BASELINE.md's "manifest scale" table and calibrate the
  * tiering-upgrade threshold named in the LakeTable scaladoc.
  *
  * Usage: ManifestProfile [eventsPerEpoch] [epochs] [cores] [workDir]
  */
object ManifestProfile {
  def main(args: Array[String]): Unit = {
    val perEpoch = if (args.nonEmpty) args(0).toLong else 100000L
    val epochs = if (args.length > 1) args(1).toInt else 16
    val cores = if (args.length > 2) args(2).toInt else 8
    val work = if (args.length > 3) args(3)
      else (if (new java.io.File("/dev/shm").canWrite) "/dev/shm" else "/tmp") +
        "/graft-manifestprofile"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // one shared change log, re-lsn'd per epoch so every epoch upserts the
    // same key space (steady-state file counts, compaction exercised)
    val cfg = Gen.GenConfig(nEvents = perEpoch, nConvs = math.max(100L, perEpoch / 100),
      partitions = cores)
    val logDir = s"$work/batch"
    spark.range(0L, cfg.nEvents, 1L, cfg.partitions).map(i => Gen.eventAt(cfg, i))
      .write.mode("overwrite").parquet(logDir)
    val batch = spark.read.parquet(logDir)

    println(f"[manifest] perEpoch=$perEpoch epochs=$epochs cores=$cores work=$work")
    println("buckets | first5 s/epoch | last5 s/epoch | files | manifestKB | metrics() s | history() s")
    for (buckets <- Seq(32, 256, 1024, 4096)) {
      val dir = s"$work/lake-$buckets"
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      val table = LakeTable.create(spark, dir, Seq("conv_id", "turn_idx"), buckets)
      val times = (0 until epochs).map { e =>
        val ep = batch.withColumn("lsn", col("lsn") + lit(e * perEpoch))
        val t0 = System.nanoTime()
        table.merge(ep, e.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      val snapFiles = new java.io.File(s"$dir/_snapshots").listFiles()
      val manifestKB = snapFiles.filter(_.getName.startsWith("snap-"))
        .map(_.length()).maxOption.getOrElse(0L) / 1024
      val first = times.take(5)
      val last = times.takeRight(5)
      val t1 = System.nanoTime()
      val m = table.metrics().count()
      val metricsS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val h = table.history().count()
      val historyS = (System.nanoTime() - t2) / 1e9
      val live = spark.read.parquet(s"$dir/data").inputFiles.length
      println(f"$buckets%7d | ${first.sum / math.max(1, first.length)}%14.2f | ${last.sum / math.max(1, last.length)}%13.2f " +
        f"| $live%5d | $manifestKB%10d | $metricsS%11.2f | $historyS%9.2f  (epochs=$m, commits=$h)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Gen, Model}
import graft.lake.LakeTable

/** A/B-times the two initial-load paths on identical input: the ONBOARDING
  * bulk load ([[graft.lake.LakeTable.bulkLoad]] — one base publish) vs the
  * pre-bulkLoad shape (merge into an empty table — a delta publish plus the
  * immediate full compaction the ratio rule triggers on every empty-base
  * bucket). Prints wall time, data-directory bytes WRITTEN over the run
  * (the 2× write-amplification claim, measured), and final file counts;
  * asserts the two end states are identical.
  *
  * Usage: BulkLoadProfile [nEvents] [cores] [buckets] [workDir]
  */
object BulkLoadProfile {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.nonEmpty) args(0).toLong else 4000000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val buckets = if (args.length > 2) args(2).toInt else 32
    val work = if (args.length > 3) args(3) else "/tmp/graft-bulkloadprofile"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    // the onboarding input: a consistent snapshot stamped at one lsn
    // (unique keys — the LWW dedupe stage is a pass-through for both paths)
    val cfg = Gen.GenConfig(nEvents = nEvents, nConvs = math.max(10L, nEvents / 100),
      partitions = cores)
    val snapshot = Gen.expectedState(spark, cfg).toDF()
      .withColumn("op", lit("I")).withColumn("lsn", lit(nEvents))
      .persist()
    val rows = snapshot.count() // materialize outside both timers
    println(s"[gen] $rows snapshot rows from $nEvents events")

    // cumulative bytes ever written under a dir: live files + nothing else
    // remains after publish's staging cleanup, so sample the data dir right
    // AFTER the load, before any vacuum could run (neither path vacuums)
    def dataBytes(root: String): Long = {
      val d = new org.apache.hadoop.fs.Path(s"$root/data")
      if (!fs.exists(d)) 0L
      else fs.listStatus(d).map(_.getLen).sum
    }

    def run(name: String)(load: LakeTable => LakeTable.MergeStats): (String, Long) = {
      val root = s"$work/$name"
      val table = LakeTable.create(spark, root, Model.keyCols, numBuckets = buckets)
      val t0 = System.nanoTime()
      val st = load(table)
      val secs = (System.nanoTime() - t0) / 1e9
      val snap = table.currentSnapshot()
      val kinds = snap.files.groupBy(_.kind).map { case (k, f) => s"$k=${f.size}" }.mkString(" ")
      println(f"[$name] $secs%.2f s  rowsApplied=${st.rowsApplied}  files: $kinds  " +
        f"live bytes=${dataBytes(root)}")
      (root, st.rowsApplied)
    }

    // merge path: delta publish + inline empty-base compaction = the data
    // is written twice (deltas land in data/ before compaction supersedes
    // them; they stay on disk until vacuum, so TOTAL bytes under data/
    // shows the write amplification directly)
    val (mergeRoot, mergeRows) = run("merge")(_.merge(snapshot, 0L))
    val mergeTotalBytes = dataBytes(mergeRoot)
    val (bulkRoot, bulkRows) = run("bulkload")(_.bulkLoad(snapshot, 0L))
    val bulkTotalBytes = dataBytes(bulkRoot)
    println(f"[bytes] merge path wrote $mergeTotalBytes%,d bytes under data/ " +
      f"(deltas + compacted base, pre-vacuum); bulk load wrote $bulkTotalBytes%,d " +
      f"(${mergeTotalBytes.toDouble / math.max(1L, bulkTotalBytes)}%.2fx)")

    require(mergeRows == bulkRows, s"row mismatch: merge=$mergeRows bulk=$bulkRows")
    val a = LakeTable.open(spark, mergeRoot).read()
    val b = LakeTable.open(spark, bulkRoot).read()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0L, s"end states differ: $diff rows")
    println(s"[check] end states identical ($mergeRows rows)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Gen, Model}
import graft.engine.cdc.CdcPipeline
import graft.lake.LakeTable
import graft.sources.CdcEnvelope

/** A/B-times the multi-table demultiplex ([[CdcPipeline.startRouted]]) on
  * identical input: the same change-event volume replayed (a) as ONE
  * single-table Debezium tail (the pre-routing shape — control), (b) routed
  * into N tables sequentially, and (c) routed with overlapped merges
  * (`routeParallelism` = N). Events are round-robin assigned to N tables by
  * conversation, so every leg moves the same rows through the same LWW
  * merge machinery; only the demultiplex topology differs. Asserts the
  * routed legs' summed live rows equal the single-table leg's, then prints
  * one JSON line with events/s per leg.
  *
  * Usage: RouteProfile [nEvents] [nTables] [cores] [buckets] [workDir]
  */
object RouteProfile {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.nonEmpty) args(0).toLong else 2000000L
    val nTables = if (args.length > 1) args(1).toInt else 4
    val cores = if (args.length > 2) args(2).toInt else 8
    val buckets = if (args.length > 3) args(3).toInt else 8
    val work = if (args.length > 4) args(4) else "/tmp/graft-routeprofile"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    val cfg = Gen.GenConfig(nEvents = nEvents,
      nConvs = math.max(10L, nEvents / 100), partitions = cores)
    val payloadCols = Seq("ts", "conv_id", "turn_idx", "role", "text", "tool")
    val ev = Gen.changeEvents(spark, cfg).toDF()

    // one interleaved multi-table stream: conversation k → table t{k mod N}
    // (a conversation's changes stay in one table, like rows of a real
    // database do); the single-table control gets the SAME lines unstamped
    val tbl = concat(lit("t"), pmod(xxhash64(col("conv_id")), lit(nTables)))
    val multi = (0 until nTables).map { k =>
      CdcEnvelope.encodeDebezium(ev.where(tbl === s"t$k"), payloadCols,
        Model.keyCols, tableRef = Some(s"db.t$k"))
    }.reduce(_ unionAll _)
    multi.repartition(20).write.text(s"$work/log")
    println(s"[gen] ${cfg.nEvents} events across $nTables tables -> $work/log")

    def routedLeg(name: String, parallelism: Int): (Double, Long) = {
      val dests = (0 until nTables).map { k =>
        CdcPipeline.Route(s"db.t$k",
          LakeTable.create(spark, s"$work/$name/t$k", Model.keyCols, buckets),
          org.apache.spark.sql.types.StructType(Model.changeEventSchema
            .fields.filterNot(f => f.name == "op" || f.name == "lsn")))
      }
      val t0 = System.nanoTime()
      CdcPipeline.replayAllRouted(spark,
        CdcPipeline.CdcConfig(s"$work/log", s"$work/$name/cp",
          maxFilesPerTrigger = 32, format = "debezium",
          routeParallelism = parallelism),
        dests)
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, dests.map(_.dest.currentSnapshot().rows).sum)
    }

    // control: the same lines consumed as one single-table tail (the
    // stamps are ignored — no filter, one schema, one destination)
    val single = LakeTable.create(spark, s"$work/single/lake", Model.keyCols, buckets)
    val t0 = System.nanoTime()
    CdcPipeline.replayAll(spark, single,
      CdcPipeline.CdcConfig(s"$work/log", s"$work/single/cp",
        maxFilesPerTrigger = 32, format = "debezium"))
    val singleSecs = (System.nanoTime() - t0) / 1e9
    val singleRows = single.currentSnapshot().rows

    val (seqSecs, seqRows) = routedLeg("seq", parallelism = 1)
    val (parSecs, parRows) = routedLeg("par", parallelism = nTables)

    require(seqRows == singleRows && parRows == singleRows,
      s"row mismatch: single=$singleRows seq=$seqRows par=$parRows")
    println(
      s"""{"metric":"routed events/s","events":$nEvents,"tables":$nTables,""" +
      s""""cores":$cores,"rows":$singleRows,""" +
      f""""single_sec":$singleSecs%.2f,"single_eps":${nEvents / singleSecs}%.0f,""" +
      f""""routed_seq_sec":$seqSecs%.2f,"routed_seq_eps":${nEvents / seqSecs}%.0f,""" +
      f""""routed_par_sec":$parSecs%.2f,"routed_par_eps":${nEvents / parSecs}%.0f}""")
    spark.stop()
  }
}

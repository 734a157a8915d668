package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.lake.LakeTable

/** Times the MERGE pipeline's components in isolation at a given core count
  * — the tool behind the N-vs-4N scaling investigation.
  * Usage: MergeProfile [nEvents] [cores] [buckets] [workDir]
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.nonEmpty) args(0).toLong else 3000000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val buckets = if (args.length > 2) args(2).toInt else 32
    val work = if (args.length > 3) args(3) else "/tmp/graft-mergeprofile"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE partition coalescing targets bytes-per-task, which under-
      // parallelizes the bucket-sorted MERGE write (measured: 32-partition
      // shuffle coalesced to 18 tasks regardless of core count)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val logDir = s"$work/batch"
    if (!new java.io.File(logDir).exists()) {
      val cfg = Gen.GenConfig(nEvents = nEvents, nConvs = math.max(100L, nEvents / 100),
        partitions = 64)
      import spark.implicits._
      spark.range(0L, cfg.nEvents, 1L, cfg.partitions).map(i => Gen.eventAt(cfg, i))
        .write.mode("overwrite").parquet(logDir)
      println(s"[gen] $nEvents events -> $logDir")
    }

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[mp] cores=$cores $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    def batch: DataFrame = spark.read.parquet(logDir)
    val keyCols = Seq("conv_id", "turn_idx")
    val bucketExpr = pmod(hash(keyCols.map(col): _*), lit(buckets))

    time("scan->noop") {
      batch.write.format("noop").mode("overwrite").save()
    }
    time("scan->exchange(bucket)->noop") {
      batch.withColumn("_bucket", bucketExpr)
        .repartition(cores, col("_bucket"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan->bucketed-lww->noop") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_bucket"))
        .orderBy(col("conv_id"), col("turn_idx"), col("lsn").desc, col("ts").desc)
      batch.withColumn("_bucket", bucketExpr)
        .withColumn("_pk", lag(struct(col("conv_id"), col("turn_idx")), 1).over(w))
        .filter(col("_pk").isNull || col("_pk") =!= struct(col("conv_id"), col("turn_idx")))
        .drop("_pk")
        .write.format("noop").mode("overwrite").save()
    }
    time("scan->bucketed-lww->parquet(partitionBy)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_bucket"))
        .orderBy(col("conv_id"), col("turn_idx"), col("lsn").desc, col("ts").desc)
      batch.withColumn("_bucket", bucketExpr)
        .withColumn("_pk", lag(struct(col("conv_id"), col("turn_idx")), 1).over(w))
        .filter(col("_pk").isNull || col("_pk") =!= struct(col("conv_id"), col("turn_idx")))
        .drop("_pk")
        .write.mode("overwrite").partitionBy("_bucket").parquet(s"$work/out-$cores")
    }
    time("lake-merge-epoch") {
      val dir = s"$work/lake-$cores-${System.nanoTime()}"
      val table = LakeTable.create(spark, dir, keyCols, buckets)
      table.merge(batch.toDF(), 0L)
      ()
    }
    spark.stop()
  }
}

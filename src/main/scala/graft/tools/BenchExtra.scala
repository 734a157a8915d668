package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Focused per-query benchmark (guide §1.4): times a SUBSET of SparkEntry
  * queries through the noop sink with N repeats each, printing min/median —
  * the optimization-loop companion to graft.Bench (which is FROZEN for
  * measurement and always runs the full sweep). Same session configuration
  * as Bench so numbers are comparable.
  *
  * Usage: runMain graft.tools.BenchExtra <repeats> [query ...]
  * (no query names = all queries).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tmpBase = sys.env.getOrElse("SPARK_GRAFT_WORKDIR",
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", tmpBase)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
             else names.map(n => n -> SparkEntry.queries(n))
    val results = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      // one warmup (stages fixtures + JIT), then timed repeats
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.length / 2)
      println(f"$name%-24s min=${ts.head}%.3f med=$med%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
      name -> ts.head
    }
    println(f"TOTAL(min) ${results.map(_._2).sum}%.3f")
    spark.stop()
  }
}

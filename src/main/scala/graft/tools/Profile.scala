package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one named SparkEntry query N times and prints the formatted plan —
  * the .explain feedback loop for optimizing individual operators.
  * Usage: Profile <queryName> [sfDir] [repeat] [cores]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

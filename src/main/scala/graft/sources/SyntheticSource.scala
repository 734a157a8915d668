package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's streamreader as a Spark source: N slices ×
  * `sliceRecordCount` rows generated from column specs `{type, value?}` —
  * a fixed value or a per-type random (`stream_reader.go:150-249`; random
  * string `:240-249`, slices `:67-81`).
  *
  * Difference on purpose: randomness here is SEEDED AND SPLITTABLE —
  * derived from the row id by hashing, not from a mutable RNG — so the same
  * spec yields bit-identical data at any parallelism (the property every
  * replay/scaling test in this repo depends on; the reference's
  * `math/rand` output changes with task interleaving). `spark.range` is
  * already N-way parallel; no driver-side generation.
  */
object SyntheticSource {

  /** One output column: constant `value` if set, else a seeded random of
    * `colType` ∈ string | long | double | bool | date.
    */
  final case class ColumnGen(name: String, colType: String = "string",
      value: Option[String] = None)

  def generate(spark: SparkSession, cols: Seq[ColumnGen],
      sliceRecordCount: Long, slices: Int = 1, seed: Long = 42L): DataFrame = {
    require(cols.nonEmpty, "at least one column spec")
    val base = spark.range(0L, sliceRecordCount * slices, 1L, slices)
    val out: Seq[Column] = cols.map { c =>
      val gen: Column = c.value match {
        case Some(v) => c.colType match {
          case "long" => lit(v.toLong)
          case "double" => lit(v.toDouble)
          case "bool" | "boolean" => lit(v.toBoolean)
          case "date" => to_timestamp(lit(v))
          case "bytes" => lit(v).cast("binary") // stream_reader.go bytes column
          case _ => lit(v)
        }
        case None =>
          // id-derived hash: deterministic, splittable, engine-portable
          val h = abs(xxhash64(col("id"), lit(seed), lit(c.name)))
          c.colType match {
            case "long" => h % 1000000L
            case "double" => (h % 1000000L) / 1000.0
            case "bool" | "boolean" => h % 2 === 0
            case "date" =>
              timestamp_seconds(lit(1704067200L) + h % 31536000L) // within a year
            case "bytes" =>
              substring(md5(concat_ws(":", col("id"), lit(c.name), lit(seed))), 1, 10).cast("binary")
            case _ => substring(md5(concat_ws(":", col("id"), lit(c.name), lit(seed))), 1, 10)
          }
      }
      gen.as(c.name)
    }
    base.select(out: _*)
  }
}

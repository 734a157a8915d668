package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logical record byte accounting, mirroring the reference's per-column
  * sizes (go-datax `common/element/column.go:117-133,190,253,316,379`):
  * strings/bytes count their length, fixed-width numerics/temporals count 8,
  * booleans 1, nulls 0. The sum rides `observe` on the write job — the
  * Spark analog of `record.GetByteSize()` feeding the job's bytes/s metric
  * (`core/job/jobcontainer.go:320-336`) — so byte throughput costs ZERO
  * extra jobs or passes.
  */
object ByteSize {

  /** Column expression: logical byte size of one row of `df`. */
  def logicalBytes(df: DataFrame): Column = {
    val parts: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      f.dataType match {
        case StringType | BinaryType => coalesce(octet_length(c).cast("long"), lit(0L))
        case BooleanType => when(c.isNull, 0L).otherwise(1L)
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
            _: DecimalType | TimestampType | TimestampNTZType | DateType =>
          when(c.isNull, 0L).otherwise(8L)
        case ArrayType(et, _) =>
          // numeric arrays: element count × fixed width (embeddings etc.);
          // other element types are not produced by our sources
          et match {
            case FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType =>
              coalesce(size(c).cast("long") * 8L, lit(0L))
            case _ => lit(0L)
          }
        case _ => lit(0L) // nested structs/maps: not produced by our sources
      }
    }
    parts.reduceOption(_ + _).getOrElse(lit(0L))
  }
}

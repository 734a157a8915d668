package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DataX-exact column cast/format semantics as Catalyst expressions.
  *
  * The reference's 6-type `Column` system carries lossy-tolerant casts and
  * formatting quirks (go-datax `common/element/column.go`) that affect
  * byte-for-byte output compatibility:
  *  - empty string ≡ NULL for strings (`column.go:126-133` — readers map SQL
  *    NULL to the empty string and `NewStringColumn("")` sets isNull);
  *  - canonical date format `yyyy-MM-dd HH:mm:ss` (`column.go:269`,
  *    `stream_writer.go:244`);
  *  - date → long is unix SECONDS (`column.go:272-277`);
  *  - bool → long is 1/0 (`column.go:401-409`);
  *  - doubles print with 6 decimals (`stream_writer.go:244` "%.6f");
  *  - bytes print as lowercase hex;
  *  - unsupported casts yield NULL rather than failing the job (the Go
  *    methods return an error per value; the record error-limiter decides) —
  *    we express that as `try_cast`.
  *
  * All are built-in functions — codegen'd, pushdown-friendly, no UDFs.
  */
object ColumnCasts {

  /** Empty string collapses to NULL (reference cannot represent '' ≠ NULL). */
  def emptyAsNull(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** Canonical DataX timestamp rendering: `yyyy-MM-dd HH:mm:ss`. */
  def dateToString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Date → unix seconds (long), as the reference's DateColumn.GetAsLong. */
  def dateToLong(c: Column): Column = unix_timestamp(c)

  /** Bool → 1/0 long. */
  def boolToLong(c: Column): Column = when(c, 1L).otherwise(0L)

  /** Long 1/0 (and only 1/0) → bool; anything else NULL. */
  def longToBool(c: Column): Column =
    when(c === 1L, lit(true)).when(c === 0L, lit(false)).otherwise(lit(null))

  /** Lossy-tolerant string → long: non-numeric yields NULL. Implemented as
    * a guarded cast (CaseWhen is lazily evaluated per branch) so it is safe
    * under ANSI mode and identical in any SQL engine (`try_cast` analog).
    */
  def stringToLong(c: Column): Column =
    when(c.rlike("^-?[0-9]+$"), c.cast("long")).otherwise(lit(null))

  /** Lossy-tolerant string → double. */
  def stringToDouble(c: Column): Column =
    when(c.rlike("^-?[0-9]+(\\.[0-9]+)?$"), c.cast("double")).otherwise(lit(null))

  /** String → timestamp with the canonical format, NULL on mismatch. */
  def stringToDate(c: Column): Column = to_timestamp(c, "yyyy-MM-dd HH:mm:ss")

  /** Double rendering with the reference's fixed 6 decimals ("%.6f").
    * (format_string, not format_number — the latter inserts thousands
    * separators the reference does not emit.)
    */
  def doubleToString(c: Column): Column = format_string("%.6f", c)

  /** Bytes → lowercase hex string (reference stream writer rendering). */
  def bytesToString(c: Column): Column = lower(hex(c))

}

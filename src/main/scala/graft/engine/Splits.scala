package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference engine's split/partitioning strategies ("exchange"
  * operators) re-expressed over DataFrames. go-datax generates per-task SQL
  * predicates (`mysql_reader.go:680-745`); Spark's native partitioning makes
  * most of them free, but the *assignment semantics* are part of the
  * reference's observable API surface (which rows land in which split), so
  * each strategy is exposed as a deterministic `split` column.
  *
  * At scale these map onto real partitioning primitives: numeric range →
  * `repartitionByRange`/JDBC partitionColumn, hash → `repartition(hash)`,
  * table-partition → partition pruning. The `split` column is also the salt
  * for skew handling (`saltedKey`).
  */
object Splits {

  /** Numeric range split: [min,max] divided into n equal-width ranges; the
    * LAST range absorbs the remainder (go-datax `mysql_reader.go:214-255`).
    * Returns the 0-based range index of each row given min/max.
    */
  def rangeSplit(c: Column, minV: Long, maxV: Long, n: Int): Column = {
    val width = ((maxV - minV) / n) + 1L // ceil-ish equal width; last absorbs
    least(floor((c - lit(minV)) / lit(width)).cast("int"), lit(n - 1))
  }

  /** Range split with min/max discovered from the data (one tiny agg job,
    * the analog of the reference's `SELECT MIN(pk), MAX(pk)`).
    */
  def rangeSplitAuto(df: DataFrame, column: String, n: Int): DataFrame = {
    val r = df.agg(min(col(column)).cast("long"), max(col(column)).cast("long")).collect()(0)
    df.withColumn("split", rangeSplit(col(column), r.getLong(0), r.getLong(1), n))
  }

  /** Hash (modulo) split — the reference's fallback strategy
    * (`CRC32(pk) % N`, `mysql_reader.go:432-444`; PG variant
    * `MOD(ABS(HASHTEXT(pk)), N)`). We use crc32 to stay faithful for string
    * keys; for numeric keys `pmod(key, n)` matches the dictionary-free
    * semantics and is oracle-reproducible.
    */
  def hashSplit(c: Column, n: Int): Column = pmod(crc32(c.cast("string")), lit(n)).cast("int")

  /** Modulo split on a numeric key (oracle-friendly deterministic variant). */
  def modSplit(c: Column, n: Int): Column = pmod(c, lit(n)).cast("int")

  /** Text-key hash split, cross-engine reproducible: first 32 bits of
    * md5(key) mod n. Same role as the reference's `CRC32(pk) % N` /
    * `MOD(ABS(HASHTEXT(pk)), N)` fallbacks but portable to any engine that
    * has md5 (the DuckDB oracle reproduces it bit-identically).
    */
  def hashSplitText(c: Column, n: Int): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long"), lit(n)).cast("int")

  /** Offset/limit split: rows ordered by `orderBy` are cut into n contiguous
    * slices; the remainder is spread over the FIRST slices one row each
    * (go-datax `mysql_reader.go:386-429`). Emits a `split` column.
    */
  def offsetSplit(df: DataFrame, orderBy: String, n: Int, total: Long): DataFrame = {
    val base = total / n
    val rem = total % n
    // slice i gets base+1 rows for i < rem else base rows; rn is 1-based
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderBy))
    val boundary = lit(rem * (base + 1)) // first rem slices are (base+1)-sized
    val rn = row_number().over(w).cast("long") - 1L // 0-based position
    df.withColumn("split",
      when(rn < boundary, floor(rn / lit(base + 1)))
        .otherwise(lit(rem) + floor((rn - boundary) / lit(math.max(base, 1L))))
        .cast("int"))
  }

  /** Text-dictionary split: boundaries picked from the sorted distinct key
    * domain, ranges `k >= lo AND k < hi` with open ends
    * (go-datax `mysql_reader.go:279-383`, which samples
    * `DISTINCT pk ORDER BY pk LIMIT n*10`). Deterministic version: ntile
    * over the full sorted distinct domain, then rows join their value's tile.
    */
  def dictionarySplit(df: DataFrame, column: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(column))
    val dict = df.select(col(column)).distinct()
      .withColumn("split", (ntile(n).over(w) - 1).cast("int"))
    df.join(dict, Seq(column)) // broadcast by AQE: dict is tiny
  }

  /** Salted key for skew: spreads one hot key over `saltCount` sub-keys.
    * Aggregations run per (key, salt) first, then re-aggregate per key —
    * two-phase agg; the salt is derived from a stable secondary column so
    * results stay deterministic.
    */
  def saltedKey(key: Column, secondary: Column, saltCount: Int): Column =
    concat(key.cast("string"), lit("#"), pmod(crc32(secondary.cast("string")), lit(saltCount)).cast("string"))
}

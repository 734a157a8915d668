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
    *
    * The global 0-based rank is computed WITHOUT a single-partition sort
    * (which `Window.orderBy` with no partitionBy would plan — every row
    * through one task): the key domain is cut into ordered range buckets
    * whose boundaries are LITERALS from a deterministic hash sample (so a
    * bucket id is a pure function of the key — identical in every job that
    * evaluates it), rows are counted per bucket (one small aggregate,
    * O(buckets) to the driver), and rank = bucket prefix offset + local
    * row_number within the bucket. Buckets are ordered, so the composed
    * rank equals the global row_number for unique keys — the classic
    * distributed zipWithIndex, DataFrame-native.
    *
    * NOT `repartitionByRange`: Spark's RangePartitioner seeds its sampler
    * with the RDD id, which differs between the counts action and the final
    * query — the two jobs could see different boundaries and mis-assign
    * prefix offsets. Literal boundaries make both jobs bit-identical by
    * construction. Boundary quality only affects bucket BALANCE, never rank
    * correctness; the md5 sample (~10⁵ keys regardless of table size, the
    * reference's `total` count sets the sampling rate) keeps buckets near
    * even for non-degenerate key distributions, and a DUPLICATE-HEAVY key
    * domain (few distinct values, so the hash sample comes back near-empty)
    * falls back to boundaries from the bounded distinct domain itself
    * (TakeOrdered, cost capped by the target size) rather than silently
    * degrading to one bucket.
    *
    * CONTRACT: the input is scanned three times (boundary sample and bucket
    * counts prune to the `orderBy` column; the final pass reads all
    * columns), and the source must be RE-READ-STABLE across those jobs —
    * true for files/snapshots, and the same stability the reference's
    * paginated `LIMIT/OFFSET` split queries already require of a live RDBMS
    * (`mysql_reader.go:386-429` pages an ORDER BY under concurrent writes
    * with exactly the same caveat).
    */
  def offsetSplit(df: DataFrame, orderBy: String, n: Int, total: Long): DataFrame = {
    val base = total / n
    val rem = total % n
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    // deterministic ~1e5-key sample: keep keys whose md5 bucket is 0 mod p;
    // the sample's own sort is bounded by the target size, not the table
    val target = math.max(100000L, nPart.toLong * 10L)
    val p = math.max(total / target, 1L)
    val hashSample = df
      .filter(pmod(conv(substring(md5(col(orderBy).cast("string")), 1, 8), 16, 10).cast("long"), lit(p)) === 0)
      .select(col(orderBy)).distinct().orderBy(col(orderBy))
      .collect().map(_.get(0))
    // A NON-EMPTY hash sample is always preferred, even when smaller than
    // nPart: its values are uniformly spread over the key domain, so fewer
    // (but balanced) buckets merely cap parallelism at sample size + 1.
    // The TakeOrdered fallback collects the LOWEST `target` distinct keys —
    // unbiased only when it does not truncate (small domains, which is
    // exactly the empty-hash-sample case it exists for); preferring it over
    // a small hash sample would low-bias the boundaries and funnel the
    // domain's tail through one bucket.
    val sample =
      if (hashSample.nonEmpty || p == 1L) hashSample
      else df.select(col(orderBy)).distinct().orderBy(col(orderBy))
        .limit(target.toInt).collect().map(_.get(0))
    val step = math.max(sample.length / nPart, 1)
    val bounds = (1 until nPart).map(_ * step).filter(_ < sample.length).map(sample(_))
    val pidCol = bounds.foldLeft(lit(0): Column) { (acc, b) =>
      acc + when(col(orderBy) >= lit(b), 1).otherwise(0)
    }
    val parts = df.withColumn("_pid", pidCol)
    val counts = parts.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 to bounds.length).scanLeft(0L)((acc, b) => acc + counts.getOrElse(b, 0L))
    val offCol = (0 to bounds.length).foldLeft(lit(0L): Column) { (acc, b) =>
      when(col("_pid") === b, lit(offsets(b))).otherwise(acc)
    }
    // slice i gets base+1 rows for i < rem else base rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col(orderBy))
    val boundary = lit(rem * (base + 1)) // first rem slices are (base+1)-sized
    val rn = row_number().over(w).cast("long") - 1L + offCol // 0-based global
    parts.withColumn("split",
      when(rn < boundary, floor(rn / lit(base + 1)))
        .otherwise(lit(rem) + floor((rn - boundary) / lit(math.max(base, 1L))))
        .cast("int"))
      .drop("_pid")
  }

  /** Text-dictionary split: boundaries picked from a bounded sample of the
    * sorted distinct key domain, ranges `k >= lo AND k < hi` with open ends —
    * exactly the reference's strategy (go-datax `mysql_reader.go:279-383`
    * samples `DISTINCT pk ORDER BY pk LIMIT n*10` and cuts it into n
    * ranges), and deterministic: boundary i is sample[i·step] with
    * step = max(⌊m/n⌋, 1) over the m ≤ 10n sampled values.
    *
    * Scale shape: the sample is a distributed distinct followed by
    * `orderBy.limit(10n)` — Spark plans that as TakeOrderedAndProject
    * (per-partition top-K heaps, driver receives ≤ 10n values), NOT a
    * single-partition sort of the whole distinct domain; a full-domain
    * ntile would serialize a high-cardinality text splitPk through one
    * task. Assignment is then a pure codegen'd boundary-comparison
    * projection — no join, no shuffle on the data side at all.
    */
  def dictionarySplit(df: DataFrame, column: String, n: Int): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val sample = df.select(col(column)).distinct()
      .orderBy(col(column)).limit(n * 10)
      .collect().map(_.get(0))
    val step = math.max(sample.length / n, 1)
    val boundaries = (1 until n).map(_ * step).filter(_ < sample.length).map(sample(_))
    val split = boundaries.foldLeft(lit(0): Column) { (acc, b) =>
      acc + when(col(column) >= lit(b), 1).otherwise(0)
    }
    df.withColumn("split", split.cast("int"))
  }

  /** Salted key for skew: spreads one hot key over `saltCount` sub-keys.
    * Aggregations run per (key, salt) first, then re-aggregate per key —
    * two-phase agg; the salt is derived from a stable secondary column so
    * results stay deterministic.
    */
  def saltedKey(key: Column, secondary: Column, saltCount: Int): Column =
    concat(key.cast("string"), lit("#"), pmod(crc32(secondary.cast("string")), lit(saltCount)).cast("string"))
}

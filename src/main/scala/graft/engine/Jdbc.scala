package graft.engine

/** JDBC source/sink shapes: the reference's RDBMS reader/writer surface
  * mapped onto Spark's JDBC data source options (zero-egress sandbox — the
  * option/predicate GENERATION is fully implemented and unit-tested; the
  * network read itself is `spark.read.format("jdbc").options(...)`, which is
  * Spark-native).
  *
  * go-datax reader modes covered (`plugins/reader/mysqlreader/mysql_reader.go`):
  *  - table + column list + where  → dbtable/column pruning + filter pushdown
  *  - raw querySql                 → option("query", ...)
  *  - splitPk numeric range        → partitionColumn/lowerBound/upperBound/
  *                                   numPartitions (`mysql_reader.go:214-255`)
  *  - splitPk hash fallback        → predicates array `CRC32(pk)%N=i` /
  *                                   `MOD(ABS(HASHTEXT(pk)),N)=i`
  *                                   (`mysql_reader.go:432-444`,
  *                                   `postgresql_reader.go:858-864`)
  *  - text dictionary ranges       → predicates array `pk >= 'a' AND pk < 'b'`
  *                                   (`mysql_reader.go:279-383`)
  *  - table-partition split        → predicates array `PARTITION(p)` scans
  *                                   (`oceanbase_reader.go:287-312`)
  * Writer modes (`mysql_writer.go:382-390`): insert → append; replace/update
  * → the lake MERGE (last-writer-wins per PK).
  */
object Jdbc {

  /** Options for a numeric-range-partitioned JDBC scan. */
  def rangeScanOptions(
      url: String,
      table: String,
      splitPk: String,
      lower: Long,
      upper: Long,
      numPartitions: Int): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "partitionColumn" -> splitPk,
    "lowerBound" -> lower.toString,
    "upperBound" -> upper.toString,
    "numPartitions" -> numPartitions.toString)

  /** Options for a raw querySql passthrough scan. */
  def querySqlOptions(url: String, querySql: String): Map[String, String] =
    Map("url" -> url, "query" -> querySql)

  /** Inclusive equal-width range predicates from a probed MIN/MAX — the
    * reference's numeric splitPk plan (`mysql_reader.go:214-255`): step =
    * ceil((max-min)/n), range i = `[min+i·step, min+(i+1)·step-1]`, and the
    * LAST range absorbs the remainder (its end forced to max). Every
    * predicate is sargable — a B-tree source serves each task as one index
    * range scan, where the hash fallback's `CRC32(pk) % N = i` forces N full
    * scans. Unlike the reference, the first predicate also catches NULL-pk
    * rows (`OR pk IS NULL` — the reference's ranges silently drop them;
    * Spark's native partitionColumn reader makes the same first-partition
    * choice), so the N-way read is row-complete vs a single-task read.
    * Fractional/decimal bounds floor/ceil to integers first: the widened
    * inclusive ranges still cover every fractional value in between.
    */
  def rangePredicates(quotedPk: String, min: BigDecimal, max: BigDecimal,
      n: Int): Array[String] = {
    require(n > 0)
    val lo = min.setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
    val hi = max.setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt
    val step = ((hi - lo + n - 1) / n).max(BigInt(1))
    val preds = Array.tabulate(n) { i =>
      val a = lo + step * i
      val b = if (i == n - 1) hi else lo + step * (i + 1) - 1
      s"$quotedPk >= $a AND $quotedPk <= $b"
    }
    preds(0) = s"(${preds(0)}) OR $quotedPk IS NULL"
    preds
  }

  /** Per-task hash-split predicates — MySQL dialect (`CRC32(pk) % N = i`). */
  def hashPredicatesMysql(splitPk: String, n: Int): Array[String] =
    Array.tabulate(n)(i => s"CRC32(`$splitPk`) % $n = $i")

  /** Per-task hash-split predicates — PostgreSQL dialect
    * (`MOD(ABS(HASHTEXT(pk)), N) = i`).
    */
  def hashPredicatesPostgres(splitPk: String, n: Int): Array[String] =
    Array.tabulate(n)(i => s"MOD(ABS(HASHTEXT(\"$splitPk\")), $n) = $i")

  /** Dictionary-range predicates from sorted boundary values: half-open
    * ranges with open first/last ends, as the reference's text splitter.
    */
  def dictionaryPredicates(splitPk: String, boundaries: Seq[String]): Array[String] = {
    require(boundaries.nonEmpty)
    val b = boundaries.map(v => v.replace("'", "''"))
    val first = s"$splitPk < '${b.head}'"
    val mids = b.sliding(2).collect {
      case Seq(lo, hi) => s"$splitPk >= '$lo' AND $splitPk < '$hi'"
    }.toSeq
    val last = s"$splitPk >= '${b.last}'"
    (first +: mids :+ last).toArray
  }

  /** Physical-partition scan predicates (OceanBase/MySQL `PARTITION(p)`). */
  def partitionPredicates(partitions: Seq[String]): Array[String] =
    partitions.map(p => s"PARTITION($p)").toArray

  /** Token-range split over the signed 64-bit Murmur3 token space — the
    * Cassandra reader's partitioner split (`cassandra_reader.go:155-197`,
    * `splitMurmur3Partitioner`): n contiguous ranges covering
    * [Long.Min, Long.Max], first range open-ended below, last above.
    */
  def tokenRangePredicates(tokenFn: String, n: Int): Array[String] = {
    require(n > 0)
    // n-1 interior boundaries at equal spacing of the 2^64 token span
    val span = (BigInt(Long.MaxValue) - BigInt(Long.MinValue) + 1) / n
    val bounds = (1 until n).map(i => (BigInt(Long.MinValue) + span * i).toLong)
    if (n == 1) Array(s"$tokenFn >= ${Long.MinValue}")
    else {
      val first = s"$tokenFn < ${bounds.head}"
      val mids = bounds.sliding(2).collect {
        case Seq(lo, hi) => s"$tokenFn >= $lo AND $tokenFn < $hi"
      }.toSeq
      val last = s"$tokenFn >= ${bounds.last}"
      (first +: mids :+ last).toArray
    }
  }

  /** Offset/limit slice clauses (`ORDER BY pk LIMIT l OFFSET o`), remainder
    * spread over the first slices (`mysql_reader.go:386-429`).
    */
  def offsetLimitClauses(splitPk: String, total: Long, n: Int): Array[String] = {
    val base = total / n
    val rem = total % n
    var offset = 0L
    Array.tabulate(n) { i =>
      val limit = base + (if (i < rem) 1L else 0L)
      val c = s"ORDER BY $splitPk LIMIT $limit OFFSET $offset"
      offset += limit
      c
    }
  }
}

package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering expression — multi-dimensional sort-order
  * clustering for the lake's sliced base files, the Delta `OPTIMIZE ZORDER
  * BY` / Iceberg `rewrite_data_files(sort_order => zorder(...))` analog
  * (public command surfaces; the bit-interleaving construction is the
  * textbook Morton code).
  *
  * Why: linear [[LakeTable.sortCols]] clustering gives TIGHT footer bounds
  * on the leading column and nothing on the rest — a `ts`-sorted bucket
  * prunes ts-windows perfectly and `value`-ranges not at all. Sorting by
  * the interleaved z-value instead makes every sliced file cover roughly a
  * hyper-rectangle: each file spans ~2^-(16-b) of EVERY dimension's range,
  * so single-column predicates on ANY of the z columns skip most files
  * (√-ish pruning per dimension instead of all-or-nothing). Bounds
  * harvesting and skipping are unchanged — [[FileStats]] reads real
  * contents, so z-order is a pure tightness transform, never a soundness
  * question (same contract as sortCols).
  *
  * Mechanics: each dimension is normalized to a fixed-width integer cell
  * index against [lo, hi] bounds (out-of-range values clamp to the edge
  * cells, nulls sort first as cell 0), then the cell bits are interleaved
  * MSB-first across dimensions. Everything is plain Catalyst arithmetic
  * (multiply-shift-mask bit spreading for 2 dims, a bit loop otherwise) —
  * whole-stage-codegen'd, no UDF.
  *
  * Supported dimension types: integral, float/double, decimal, date,
  * timestamp (anything castable to double with order preserved). Strings
  * are rejected — a truncated-prefix embedding silently breaks locality;
  * dictionary-encode upstream instead.
  */
object ZOrder {

  /** Bits per dimension for `d` dimensions (z fits a 63-bit long). */
  def bitsFor(d: Int): Int = math.min(16, 62 / d)

  /** The z-value column for `cols` with per-column normalization bounds
    * (parallel to `cols`). 2–4 dimensions.
    */
  def zvalue(cols: Seq[String], bounds: Seq[(Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order takes 2..4 dimensions (got ${cols.size}: ${cols.mkString(",")})")
    require(bounds.size == cols.size, "one (lo, hi) bound per column")
    val bits = bitsFor(cols.size)
    val cells = cols.zip(bounds).map { case (c, (lo, hi)) => cell(col(c), lo, hi, bits) }
    if (cols.size == 2) interleave2(cells(0), cells(1), bits)
    else interleaveN(cells, bits)
  }

  /** Normalized cell index in [0, 2^bits): linear against [lo, hi], clamped,
    * nulls to cell 0. Constant-range columns (hi == lo) collapse to cell 0 —
    * they contribute no discrimination, exactly right.
    */
  private def cell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cellsMax = (1L << bits) - 1
    val span = hi - lo
    val scaled =
      if (span <= 0) lit(0L)
      else least(lit(cellsMax), greatest(lit(0L),
        floor((c.cast(DoubleType) - lit(lo)) / lit(span) * lit(cellsMax.toDouble + 1))
          .cast(LongType)))
    coalesce(scaled, lit(0L))
  }

  /** 2-dim Morton interleave via multiply-free bit spreading (the classic
    * magic-mask ladder, 4 ops per dimension): z = spread(a) << 1 | spread(b),
    * a occupying the odd bits (a is the LEADING dimension on ties).
    */
  private def interleave2(a: Column, b: Column, bits: Int): Column = {
    def spread(x: Column): Column = {
      // 16 -> 32 bit spread; masks are the standard Morton constants
      val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
      (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
    }
    shiftleft(spread(a), 1).bitwiseOR(spread(b))
  }

  /** General MSB-first interleave for 3–4 dims: bit i of dim j lands at
    * position `(bits-1-i)*d + (d-1-j)` — a fold of shift/and/or terms,
    * still pure Catalyst arithmetic.
    */
  private def interleaveN(cells: Seq[Column], bits: Int): Column = {
    val d = cells.size
    val terms = for {
      i <- (bits - 1) to 0 by -1 // bit position within a cell, MSB first
      j <- cells.indices
    } yield shiftleft(
      shiftright(cells(j), i).bitwiseAND(lit(1L)),
      i * d + (d - 1 - j))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Global (lo, hi) per column from one aggregate over `df` — the bounds
    * pass of an explicit z-order rewrite. Columns must be numeric-castable;
    * an all-null or missing column fails sharp.
    */
  def boundsOf(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    cols.foreach { c =>
      val dt = df.schema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(s"z-order column '$c' not in schema"))
      require(dt.isInstanceOf[NumericType] || dt == DateType || dt == TimestampType,
        s"z-order column '$c' has unsupported type $dt (numeric/date/timestamp only " +
          "— dictionary-encode strings upstream)")
    }
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"_lo_$c"), max(col(c).cast(DoubleType)).as(s"_hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val lo = r.get(2 * i); val hi = r.get(2 * i + 1)
      require(lo != null && hi != null, s"z-order column '$c' is all-null")
      (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
  }
}

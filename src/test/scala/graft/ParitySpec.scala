package graft

import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, Parity}

/** Table parity check ([[graft.lake.Parity]]): per-key diff/summary of two
  * keyed datasets — equal tables report nothing, and each violation class
  * (missing either side, payload mismatch) is detected and attributed to
  * the right key, in both the hash (scale) and exact compare modes.
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "a", 10L, 1.5, "x"),
    (2L, "a", 11L, 2.5, "y"),
    (3L, "b", 12L, 3.5, null.asInstanceOf[String]),
    (4L, "b", 13L, 4.5, "z"))
    .toDF("id", "grp", "lsn", "v", "s")

  private def right = Seq(
    (1L, "a", 10L, 1.5, "x"),     // equal
    (2L, "a", 11L, 9.9, "y"),     // differs (v)
    (3L, "b", 12L, 3.5, "now"),   // differs (null -> value)
    (5L, "c", 14L, 5.5, "w"))     // only_right; id=4 only_left
    .toDF("id", "grp", "lsn", "v", "s")

  private def statuses(exact: Boolean): Map[(Long, String), String] =
    Parity.diff(left, right, Seq("id", "grp"), exact = exact)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap

  for (exact <- Seq(false, true)) {
    val mode = if (exact) "exact" else "hash"

    test(s"$mode: per-key statuses — every violation class attributed to its key") {
      val st = statuses(exact)
      assert(st === Map(
        (2L, "a") -> Parity.Differs,
        (3L, "b") -> Parity.Differs, // null vs non-null must differ
        (4L, "b") -> Parity.OnlyLeft,
        (5L, "c") -> Parity.OnlyRight))
    }

    test(s"$mode: identical tables — zero violations, summary all equal") {
      assert(Parity.diff(left, left, Seq("id", "grp"), exact = exact).count() === 0)
      val sum = Parity.summary(left, left, Seq("id", "grp"), exact = exact)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sum === Map(Parity.Equal -> 4L))
    }
  }

  test("summary reconciles: equal + differs + only_left covers the left row count") {
    val sum = Parity.summary(left, right, Seq("id", "grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum(Parity.Equal) + sum(Parity.Differs) + sum(Parity.OnlyLeft) === left.count())
    assert(sum(Parity.OnlyRight) === 1L)
  }

  test("column normalization: physical order and int-vs-long types don't flag") {
    // right side: columns reordered AND lsn narrowed to int — the widened
    // compare must still see all rows equal
    val r = right.select(col("s"), col("v"), col("lsn").cast("int").as("lsn"),
      col("grp"), col("id"))
    val st = Parity.diff(right, r, Seq("id", "grp"))
    assert(st.count() === 0)
  }

  test("one-sided columns are excluded; ignoreCols excludes shared ones") {
    val extra = left.withColumn("only_here", lit("nope"))
    assert(Parity.diff(left, extra, Seq("id", "grp")).count() === 0)
    // corrupt v on one row, then ignore v: no violation survives
    val corrupted = left.withColumn("v",
      when(col("id") === 1L, lit(99.9)).otherwise(col("v")))
    assert(Parity.diff(left, corrupted, Seq("id", "grp")).count() === 1)
    assert(Parity.diff(left, corrupted, Seq("id", "grp"), ignoreCols = Seq("v")).count() === 0)
  }

  test("incompatible shared column types fail sharp, not silently") {
    val bad = right.withColumn("v", col("v").cast("string"))
    val e = intercept[IllegalArgumentException] {
      Parity.diff(left, bad, Seq("id", "grp")).count()
    }
    assert(e.getMessage.contains("non-additive"))
  }

  test("lake replica round trip: replayed lake state is parity-equal to its source frame") {
    // the migration-validation shape: events merged into a lake table, then
    // the lake's resolved state diffed against an independent recompute
    val root = tmpDir("parity-lake") + "/t"
    val tbl = LakeTable.create(spark, root, Seq("id", "grp"), numBuckets = 4)
    val in = left.withColumn("op", lit("I")).withColumnRenamed("lsn", "lsn")
      .select(col("op"), col("lsn"), col("id"), col("grp"), col("v"), col("s"))
    tbl.merge(in, epoch = 1L)
    // readInternal keeps _lsn; the source frame carries `lsn` — rename so
    // the intersection includes the arbitration column too
    val lakeSide = tbl.readInternal().withColumnRenamed(LakeTable.LsnCol, "lsn")
    assert(Parity.diff(lakeSide, left, Seq("id", "grp")).count() === 0)
    // and a real divergence IS seen end-to-end through the lake read
    val drifted = left.withColumn("v",
      when(col("id") === 2L, lit(-1.0)).otherwise(col("v")))
    val d = Parity.diff(lakeSide, drifted, Seq("id", "grp")).collect()
    assert(d.length === 1 && d.head.getString(2) === Parity.Differs)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, ZOrder}

/** Z-order clustering ([[graft.lake.ZOrder]], [[LakeTable.reclusterZOrder]]):
  * the interleave must be a correct Morton code, and the rewrite must make
  * single-column windows on EVERY z dimension physically file-skip — where
  * linear clustering serves only its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** identity-cell bounds: with [0, 65535] the cell index IS the value */
  private val idBounds = Seq((0.0, 65535.0), (0.0, 65535.0))

  private def z2(a: Long, b: Long): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.zvalue(Seq("a", "b"), idBounds).as("z"))
      .head().getLong(0)

  test("2-dim interleave is the Morton code (a on the high bits)") {
    // hand-interleaved goldens: bits of a land at odd positions
    assert(z2(0, 0) === 0L)
    assert(z2(0, 1) === 1L)
    assert(z2(1, 0) === 2L)
    assert(z2(1, 1) === 3L)
    assert(z2(2, 3) === 13L) // a=10, b=11 -> 1101
    assert(z2(0xFFFF, 0xFFFF) === 0xFFFFFFFFL)
    // z is monotone in each dimension with the other fixed
    assert(z2(5, 9) < z2(6, 9) && z2(5, 9) < z2(5, 10))
  }

  test("3-dim interleave: MSB-first, dimension 0 leads") {
    val bounds3 = Seq.fill(3)((0.0, 65535.0)) // identity cells at 16 bits/dim
    def z3(a: Long, b: Long, c: Long): Long =
      Seq((a, b, c)).toDF("a", "b", "c")
        .select(ZOrder.zvalue(Seq("a", "b", "c"), bounds3).as("z"))
        .head().getLong(0)
    assert(z3(0, 0, 0) === 0L)
    assert(z3(0, 0, 1) === 1L)
    assert(z3(0, 1, 0) === 2L)
    assert(z3(1, 0, 0) === 4L)
    assert(z3(1, 1, 1) === 7L)
    // 16 bits per dim at d=3: the full cell fits a 48-bit z
    assert(z3(0xFFFF, 0xFFFF, 0xFFFF) === (1L << 48) - 1)
  }

  test("cells clamp out-of-range values and sort nulls first") {
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (-5.0, 0.0), (70000.0, 0.0), (null, 0.0))
      .toDF("a", "b")
      .select(ZOrder.zvalue(Seq("a", "b"), idBounds).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) === 0L)            // below lo -> cell 0
    assert(rows(1) === z2(0xFFFF, 0)) // above hi -> top cell
    assert(rows(2) === 0L)            // null -> cell 0
  }

  test("boundsOf: min/max per column; strings and all-null fail sharp") {
    val df = Seq((1.0, 10L, "x"), (4.0, -2L, "y")).toDF("d", "l", "s")
    assert(ZOrder.boundsOf(df, Seq("d", "l")) === Seq((1.0, 4.0), (-2.0, 10.0)))
    val e = intercept[IllegalArgumentException](ZOrder.boundsOf(df, Seq("s")))
    assert(e.getMessage.contains("unsupported type"))
    val allNull = Seq[(java.lang.Double, Long)]((null, 1L)).toDF("d", "l")
    intercept[IllegalArgumentException](ZOrder.boundsOf(allNull, Seq("d")))
  }

  /** 64×64 uniform grid over two independent payload dims, one bucket,
    * sliced to 16 files — pruning is then purely a clustering question.
    */
  private def gridTable(tag: String, zorder: Boolean): LakeTable = {
    val t = LakeTable.create(spark, tmpDir(s"zg-$tag") + "/t", Seq("id"),
      numBuckets = 1, targetFileRows = Some(256L),
      sortCols = if (zorder) Nil else Seq("d1"))
    val rows = spark.range(0, 4096).select(
      lit("I").as("op"), col("id").as("lsn"), col("id"),
      (col("id") / 64).cast("long").as("d1"), pmod(col("id"), lit(64)).as("d2"))
    t.merge(rows, epoch = 0L)
    if (zorder) t.reclusterZOrder(Seq("d1", "d2")) else t.recluster()
    t
  }

  test("z-order rewrite: windows on BOTH dimensions physically prune; linear only serves its leading column") {
    val zt = gridTable("z", zorder = true)
    val lt = gridTable("lin", zorder = false)
    assert(zt.currentSnapshot().files.size === 16)

    def kept(t: LakeTable, c: String): Int = {
      val r = t.scanWhere(col(c) >= lit(10L) && col(c) <= lit(15L))
      assert(r.filesTotal === 16)
      // pruning must never change results
      assert(r.df.count() === 6 * 64)
      r.filesKept
    }
    // linear d1-clustering: perfect on d1, useless on d2
    assert(kept(lt, "d1") <= 3, s"linear leading-column pruning broke")
    assert(kept(lt, "d2") === 16, "a d2 window should not prune a d1-sorted layout")
    // z-order: BOTH dimensions prune to a strict subset (each file covers
    // ~a quadrant strip: 16 files = 4 z-bits = 2 bits/dim -> a 6/64 window
    // intersects at most 2 of 4 stripes x 4 cross-files = 8)
    assert(kept(zt, "d1") <= 8, "z-order failed to prune on d1")
    assert(kept(zt, "d2") <= 8, "z-order failed to prune on d2")
    // the combined window prunes to the intersection
    val both = zt.scanWhere(col("d1").between(lit(10L), lit(15L)) &&
      col("d2").between(lit(10L), lit(15L)))
    assert(both.filesKept <= 4)
    assert(both.df.count() === 36)
  }

  test("z-order rewrite preserves state, LWW arbitration, and tombstones") {
    val t = LakeTable.create(spark, tmpDir("zs") + "/t", Seq("id"),
      numBuckets = 2, targetFileRows = Some(64L))
    val rows = spark.range(0, 500).select(
      lit("I").as("op"), col("id").as("lsn"), col("id"),
      (col("id") * 7 % 100).cast("long").as("d1"), (col("id") % 13).cast("long").as("d2"))
    t.merge(rows, epoch = 0L)
    t.merge(Seq(("D", 1000L, 42L, 0L, 0L)).toDF("op", "lsn", "id", "d1", "d2"), epoch = 1L)
    val before = t.read().collect().toSet
    t.reclusterZOrder(Seq("d1", "d2"))
    assert(t.read().collect().toSet === before)
    // the tombstone survived the rewrite: a stale re-insert still loses
    t.merge(Seq(("I", 500L, 42L, 1L, 1L)).toDF("op", "lsn", "id", "d1", "d2"), epoch = 2L)
    assert(t.read().filter(col("id") === 42L).count() === 0L)
  }

  test("z-order demands a sliced layout and 2..4 dims") {
    val t = LakeTable.create(spark, tmpDir("zreq") + "/t", Seq("id"), numBuckets = 1)
    t.merge(Seq(("I", 1L, 1L, 1L, 1L)).toDF("op", "lsn", "id", "d1", "d2"), epoch = 0L)
    val e = intercept[IllegalArgumentException](t.reclusterZOrder(Seq("d1", "d2")))
    assert(e.getMessage.contains("targetFileRows"))
    intercept[IllegalArgumentException](
      ZOrder.zvalue(Seq("d1"), Seq((0.0, 1.0))))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Model
import graft.lake.{LakeTable, Rollup}

/** Distribution-key layout ([[LakeTable.distCols]]): bucket routing on a
  * SUBSET of the primary key (the Iceberg `bucket(conv_id)` partition-spec
  * analog). The invariants under test: routing stays a pure function of the
  * key (LWW/compaction/delete replay semantics unchanged), a group's rows
  * are physically confined to one bucket (group reads and Rollup recomputes
  * prune to that bucket's files — asserted by making every other bucket's
  * files UNREADABLE), and the layout is a manifest-recorded table constant
  * (open() restores it, a mismatched handle is rejected).
  */
class DistLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def ev(op: String, lsn: Long, conv: String, turn: Int,
      text: String = "x", tool: Option[String] = None): Model.ChangeEvent =
    Model.ChangeEvent(op, lsn, new Timestamp(1704067200000L + lsn * 1000L),
      conv, turn, Some("user"), Some(text), tool)

  /** hide a data file from the reader: reads that claim to prune this
    * bucket must succeed, reads that actually touch it must fail
    */
  private def hide(root: String, paths: Seq[String]): Unit =
    paths.foreach { p =>
      java.nio.file.Files.move(java.nio.file.Paths.get(s"$root/data/$p"),
        java.nio.file.Paths.get(s"$root/data/$p.hidden"))
    }
  private def unhide(root: String, paths: Seq[String]): Unit =
    paths.foreach { p =>
      java.nio.file.Files.move(java.nio.file.Paths.get(s"$root/data/$p.hidden"),
        java.nio.file.Paths.get(s"$root/data/$p"))
    }

  test("dist routing co-locates a conversation; CDC replay semantics are unchanged") {
    val root = tmpDir("dist") + "/t"
    val t = LakeTable.create(spark, root, Model.keyCols, numBuckets = 8,
      distCols = Seq("conv_id"))

    val convs = (0 until 40).map(i => f"c$i%02d")
    t.merge(convs.flatMap(c =>
      (0 until 5).map(k => ev("I", (c.hashCode.toLong & 0xffff) * 10 + k, c, k))).toDF(),
      epoch = 0L)
    // update + delete traffic, out of order, duplicates — LWW must hold
    t.merge(Seq(
      ev("U", 900000, "c03", 2, text = "v2"),
      ev("U", 900001, "c03", 2, text = "v3"),
      ev("D", 900002, "c07", 4),
      ev("U", 899999, "c03", 2, text = "stale-loses")).toDF(), epoch = 1L)

    // every conversation occupies exactly ONE bucket on disk
    val snap = t.currentSnapshot()
    val byBucket = snap.files.groupBy(_.bucket)
    val bucketOfConv = t.read().select(col("conv_id"),
        pmod(hash(col("conv_id")), lit(8)).as("b"))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(bucketOfConv.size === convs.size)

    // group read returns the conversation's full resolved state
    val g = t.readGroup(Seq("c03")).orderBy("turn_idx")
    assert(g.count() === 5L)
    assert(g.where(col("turn_idx") === 2).select("text").head().getString(0) === "v3")
    assert(t.readGroup(Seq("c07")).count() === 4L) // delete applied
    assert(t.readKey(Seq("c07", 4)).count() === 0L)

    // the PRUNING is physical: hide every file outside c03's bucket — the
    // group read still works; reading a hidden conversation fails
    val b03 = bucketOfConv("c03")
    val hidden = snap.files.filterNot(_.bucket == b03).map(_.path)
    hide(root, hidden)
    try {
      assert(t.readGroup(Seq("c03")).count() === 5L)
      val other = convs.find(c => bucketOfConv(c) != b03).get
      intercept[Exception] { t.readGroup(Seq(other)).count() }
    } finally unhide(root, hidden)

    // full read resolves identically to a full-key-layout replay of the
    // same events (layout must never change WHAT the table contains)
    val ref = LakeTable.create(spark, tmpDir("distref") + "/t", Model.keyCols, 8)
    ref.merge(convs.flatMap(c =>
      (0 until 5).map(k => ev("I", (c.hashCode.toLong & 0xffff) * 10 + k, c, k))).toDF(),
      epoch = 0L)
    ref.merge(Seq(
      ev("U", 900000, "c03", 2, text = "v2"),
      ev("U", 900001, "c03", 2, text = "v3"),
      ev("D", 900002, "c07", 4),
      ev("U", 899999, "c03", 2, text = "stale-loses")).toDF(), epoch = 1L)
    val diff = t.read().exceptAll(ref.read()).count() +
      ref.read().exceptAll(t.read()).count()
    assert(diff === 0L, s"dist layout changed table contents: $diff rows differ")
  }

  test("layout is a manifest constant: open() restores dist, mismatched handles are rejected") {
    val root = tmpDir("distm") + "/t"
    val t = LakeTable.create(spark, root, Model.keyCols, 4, distCols = Seq("conv_id"))
    t.merge(Seq(ev("I", 1, "a", 0), ev("I", 2, "b", 1)).toDF(), epoch = 0L)

    val reopened = LakeTable.open(spark, root)
    assert(reopened.distributionCols === Seq("conv_id"))
    assert(reopened.readGroup(Seq("a")).count() === 1L)

    // full-key handle on a dist table: refused before it can misroute
    val wrong = LakeTable.create(spark, root, Model.keyCols, 4)
    intercept[IllegalArgumentException] { wrong.currentSnapshot() }
    // dist handle on a full-key table: refused too
    val fkRoot = tmpDir("distm2") + "/t"
    LakeTable.create(spark, fkRoot, Model.keyCols, 4)
      .merge(Seq(ev("I", 1, "a", 0)).toDF(), epoch = 0L)
    val wrong2 = LakeTable.create(spark, fkRoot, Model.keyCols, 4, distCols = Seq("conv_id"))
    intercept[IllegalArgumentException] { wrong2.currentSnapshot() }
    // dist columns outside the key: refused at construction
    intercept[IllegalArgumentException] {
      LakeTable.create(spark, tmpDir("distm3") + "/t", Model.keyCols, 4,
        distCols = Seq("role"))
    }
  }

  test("rebucketTo preserves the distribution key") {
    val root = tmpDir("distrb") + "/t"
    val t = LakeTable.create(spark, root, Model.keyCols, 4, distCols = Seq("conv_id"))
    t.merge((0 until 30).map(i => ev("I", i + 1, s"c${i % 6}", i / 6)).toDF(), epoch = 0L)
    val dst = t.rebucketTo(tmpDir("distrb2") + "/t", 16)
    assert(dst.distributionCols === Seq("conv_id"))
    assert(LakeTable.open(spark, dst.root).distributionCols === Seq("conv_id"))
    assert(dst.readGroup(Seq("c3")).count() === 5L)
    val diff = t.read().exceptAll(dst.read()).count() +
      dst.read().exceptAll(t.read()).count()
    assert(diff === 0L)
  }

  test("readChangesForKeys ships CURRENT winners, tombstones kept, touching only the keys' buckets") {
    val root = tmpDir("rcfk") + "/t"
    val t = LakeTable.create(spark, root, Model.keyCols, numBuckets = 8)
    val convs = (0 until 32).map(i => f"k$i%02d")
    t.merge(convs.map(c => ev("I", (c.hashCode.toLong & 0xffff) * 10, c, 0,
      text = "v1")).toDF(), epoch = 0L)
    t.merge(Seq(ev("U", 990000, "k03", 0, text = "current")).toDF(), epoch = 1L)
    // epoch 2: an at-least-once re-delivery of an OLDER change for k03 plus
    // a tombstone on k05 — the window's OWN winner for k03 would be the
    // stale row; the sound emission is the table's CURRENT winner
    t.merge(Seq(ev("U", 1, "k03", 0, text = "stale-dup"),
      ev("D", 990001, "k05", 0)).toDF(), epoch = 2L)

    val keys = Seq(("k03", 0), ("k05", 0)).toDF("conv_id", "turn_idx")
    // k03: the table's CURRENT winner (lsn 990000), NOT the window's stale
    // re-delivery; k05: the tombstone winner is KEPT (its payload is
    // whatever the delete event carried — merge stores events verbatim)
    val got = t.readChangesForKeys(keys)
      .select(col("conv_id"), col(LakeTable.OpCol).as("op"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(("k03", "U", "current"), ("k05", "D", "x")))

    // physical: hide every file outside the two keys' buckets — the call
    // still resolves; a key in a hidden bucket fails (nothing silent)
    def bucketOf(c: String, k: Int) = spark.range(1)
      .select(pmod(hash(lit(c), lit(k)), lit(8)).as("b")).head().getInt(0)
    val keep = Set(bucketOf("k03", 0), bucketOf("k05", 0))
    val snap = t.currentSnapshot()
    val hidden = snap.files.filterNot(f => keep(f.bucket)).map(_.path)
    hide(root, hidden)
    try {
      assert(t.readChangesForKeys(keys).count() === 2L)
      val other = convs.find(c => !keep(bucketOf(c, 0))).get
      intercept[Exception] {
        t.readChangesForKeys(Seq((other, 0)).toDF("conv_id", "turn_idx")).count()
      }
    } finally unhide(root, hidden)

    // exact-type guard: an int-typed conv key would hash to the wrong
    // bucket — rejected sharp instead of silently returning nothing
    intercept[IllegalArgumentException] {
      t.readChangesForKeys(Seq((3, 0)).toDF("conv_id", "turn_idx"))
    }
  }

  test("rollup recompute prunes the live scan to dirty-group buckets") {
    val root = tmpDir("distru") + "/t"
    val src = LakeTable.create(spark, root, Model.keyCols, numBuckets = 8,
      distCols = Seq("conv_id"))
    val dst = LakeTable.create(spark, tmpDir("distrud") + "/t", Seq("conv_id"), 2)

    val convs = (0 until 24).map(i => f"c$i%02d")
    src.merge(convs.flatMap(c =>
      (0 until 4).map(k => ev("I", (c.hashCode.toLong & 0xffff) * 10 + k, c, k,
        tool = if (k % 2 == 0) Some("calc") else None))).toDF(), epoch = 0L)
    Rollup.sync(src, dst, Rollup.transcriptAggs)

    // window touches only c05: the incremental refresh must read ONLY
    // c05's bucket — every other bucket's files are hidden to prove it
    src.merge(Seq(ev("U", 990000, "c05", 1, text = "rewritten",
      tool = Some("python"))).toDF(), epoch = 1L)
    val b05 = spark.range(1)
      .select(pmod(hash(lit("c05")), lit(8)).as("b")).head().getInt(0)
    val snap = src.currentSnapshot()
    val hidden = snap.files.filterNot(_.bucket == b05).map(_.path)
    hide(root, hidden)
    val st = try Rollup.sync(src, dst, Rollup.transcriptAggs)
      finally unhide(root, hidden)
    assert(!st.skipped)
    assert(st.rowsApplied === 1L, s"expected 1 dirty group, got ${st.rowsApplied}")

    // and the refreshed state equals the full recompute
    val want = src.read().groupBy("conv_id").agg(Rollup.transcriptAggs.head,
      Rollup.transcriptAggs.tail: _*)
    val got = dst.read().select(want.columns.map(col).toSeq: _*)
    assert(got.exceptAll(want).count() + want.exceptAll(got).count() === 0L)
  }
}

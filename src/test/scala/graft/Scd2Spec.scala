package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Model
import graft.lake.{LakeTable, Parity, Scd2}

/** SCD Type-2 history maintenance ([[graft.lake.Scd2]]): the destination
  * must hold exactly one row per (key, source commit that touched it) with
  * correct `[vf_lsn, vt_lsn)` validity bounds — independent of sync cadence
  * and chunk size — and its open rows must always equal the source's
  * current live state.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ev(op: String, lsn: Long, conv: String, turn: Int,
      text: String = "x", tool: Option[String] = None): Model.ChangeEvent =
    Model.ChangeEvent(op, lsn, new Timestamp(1704067200000L + lsn * 1000L),
      conv, turn, Some("user"), Some(text), tool)

  private def newSrc(tag: String): LakeTable =
    LakeTable.create(spark, tmpDir(s"s2src-$tag") + "/t", Model.keyCols, 4)
  private def newDst(src: LakeTable, tag: String): LakeTable =
    Scd2.createDst(src, tmpDir(s"s2dst-$tag") + "/t")

  /** (conv, turn, scd_seq) -> (text, vf, vt, is_current) */
  private def intervals(dst: LakeTable): Map[(String, Int, Long), (String, Long, Option[Long], Boolean)] =
    dst.read().collect().map { r =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[Long]("scd_seq")) ->
        ((r.getAs[String]("text"), r.getAs[Long]("vf_lsn"),
          Option(r.getAs[java.lang.Long]("vt_lsn")).map(_.longValue()),
          r.getAs[Boolean]("is_current")))
    }.toMap

  /** four commits: insert a+b, update a, delete b, re-insert b */
  private def stageLifecycle(src: LakeTable): Unit = {
    src.merge(Seq(ev("I", 1, "a", 0, text = "hello"),
      ev("I", 2, "b", 0, text = "first")).toDF(), epoch = 0L)
    src.merge(Seq(ev("U", 3, "a", 0, text = "hi")).toDF(), epoch = 1L)
    src.merge(Seq(ev("D", 4, "b", 0)).toDF(), epoch = 2L)
    src.merge(Seq(ev("I", 5, "b", 0, text = "back")).toDF(), epoch = 3L)
  }

  test("lifecycle: update closes, delete closes without reopening, re-insert opens a new interval") {
    val src = newSrc("life")
    val dst = newDst(src, "life")
    stageLifecycle(src)
    val st = Scd2.sync(src, dst)
    assert(!st.skipped)

    val got = intervals(dst)
    assert(got === Map(
      ("a", 0, 1L) -> (("hello", 1L, Some(3L), false)), // superseded by the update
      ("a", 0, -1L) -> (("hi", 3L, None, true)),
      ("b", 0, 2L) -> (("first", 2L, Some(4L), false)), // closed by the delete
      ("b", 0, -1L) -> (("back", 5L, None, true))))

    // replay: already at head
    assert(Scd2.sync(src, dst).skipped)
  }

  test("open rows always equal the source's current live state") {
    val src = newSrc("open")
    val dst = newDst(src, "open")
    stageLifecycle(src)
    Scd2.sync(src, dst)
    val open = dst.read().filter(col("is_current"))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val live = src.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert(open.exceptAll(live).count() + live.exceptAll(open).count() === 0L)
  }

  test("as-of cut: intervals covering lsn L reconstruct the state after the commit carrying L") {
    val src = newSrc("asof")
    val dst = newDst(src, "asof")
    stageLifecycle(src)
    Scd2.sync(src, dst)
    // cut at lsn 4 = after the delete of b: only a@"hi" is alive
    val cut = Scd2.stateAt(dst, 4L)
      .select("conv_id", "turn_idx", "text").as[(String, Int, String)]
      .collect().toSet
    assert(cut === Set(("a", 0, "hi")))
    // cut before everything: empty; cut at the head: the live state
    assert(Scd2.stateAt(dst, 0L).count() === 0L)
    val atHead = Scd2.stateAt(dst, Long.MaxValue)
      .select("conv_id", "turn_idx", "text").as[(String, Int, String)].collect().toSet
    assert(atHead === Set(("a", 0, "hi"), ("b", 0, "back")))
  }

  test("sync cadence and chunk size don't change the history (per-commit determinism)") {
    val src = newSrc("cad")
    val perCommit = newDst(src, "cad-each")
    val once = newDst(src, "cad-once")
    val chunked = newDst(src, "cad-chunk")

    src.merge(Seq(ev("I", 1, "a", 0, text = "v1"), ev("I", 2, "c", 0)).toDF(), epoch = 0L)
    Scd2.sync(src, perCommit)
    src.merge(Seq(ev("U", 3, "a", 0, text = "v2")).toDF(), epoch = 1L)
    Scd2.sync(src, perCommit)
    src.merge(Seq(ev("U", 4, "a", 0, text = "v3"), ev("D", 5, "c", 0)).toDF(), epoch = 2L)
    src.merge(Seq(ev("U", 6, "a", 0, text = "v4")).toDF(), epoch = 3L)
    Scd2.sync(src, perCommit) // catch-up over two commits at once
    Scd2.sync(src, once)      // one catch-up over the full history
    Scd2.sync(src, chunked, maxVersionsPerMerge = 1)

    val keys = Seq("conv_id", "turn_idx", "scd_seq")
    for (other <- Seq(once, chunked)) {
      val sum = Parity.summary(perCommit.read(), other.read(), keys)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sum.keySet === Set(Parity.Equal), s"cadence divergence: $sum")
    }
    // a@v3 history: 1->3, 3->4, 4->6, open@6 — every commit is a version
    assert(intervals(perCommit)(("a", 0, 4L))._1 === "v3")
  }

  test("within-commit changes are LWW-collapsed: only the commit's winner enters history") {
    val src = newSrc("collapse")
    val dst = newDst(src, "collapse")
    src.merge(Seq(ev("I", 10, "a", 0, text = "loser"),
      ev("U", 11, "a", 0, text = "winner")).toDF(), epoch = 0L)
    Scd2.sync(src, dst)
    val got = intervals(dst)
    assert(got === Map(("a", 0, -1L) -> (("winner", 11L, None, true))))
  }

  test("expired-history attach seeds open intervals from current state with a truncated past") {
    val src = newSrc("exp")
    stageLifecycle(src)
    src.expireSnapshots(1) // only the head snapshot survives
    val dst = newDst(src, "exp")
    val st = Scd2.sync(src, dst)
    assert(!st.skipped)
    val got = intervals(dst)
    assert(got === Map(
      ("a", 0, -1L) -> (("hi", 3L, None, true)),
      ("b", 0, -1L) -> (("back", 5L, None, true))))
    // later commits still extend history incrementally from the seed
    src.merge(Seq(ev("U", 6, "a", 0, text = "later")).toDF(), epoch = 4L)
    Scd2.sync(src, dst)
    assert(intervals(dst) === Map(
      ("a", 0, 3L) -> (("hi", 3L, Some(6L), false)),
      ("a", 0, -1L) -> (("later", 6L, None, true)),
      ("b", 0, -1L) -> (("back", 5L, None, true))))
  }

  test("out-of-order and duplicated deliveries never regress the history (lsn prefix-max)") {
    val src = newSrc("ooo")
    val dst = newDst(src, "ooo")
    src.merge(Seq(ev("I", 5, "a", 0, text = "v5"), ev("I", 7, "b", 0)).toDF(), epoch = 0L)
    Scd2.sync(src, dst)
    // stale update (lsn 3 < 5) and duplicated delivery (lsn 5 again): the
    // lake's resolved winner doesn't move, so neither may history
    src.merge(Seq(ev("U", 3, "a", 0, text = "stale"),
      ev("U", 5, "a", 0, text = "v5")).toDF(), epoch = 1L)
    Scd2.sync(src, dst)
    assert(intervals(dst) === Map(
      ("a", 0, -1L) -> (("v5", 5L, None, true)),
      ("b", 0, -1L) -> (("x", 7L, None, true))))
    // stale delete (lsn 4): ignored; real delete (lsn 9): closes
    src.merge(Seq(ev("D", 4, "a", 0)).toDF(), epoch = 2L)
    src.merge(Seq(ev("D", 9, "a", 0)).toDF(), epoch = 3L)
    Scd2.sync(src, dst)
    assert(intervals(dst) === Map(
      ("a", 0, 5L) -> (("v5", 5L, Some(9L), false)),
      ("b", 0, -1L) -> (("x", 7L, None, true))))
    // stale re-insert AFTER the delete (lsn 6 < 9): the tombstone sentinel
    // keeps the floor, so the key stays dead; a genuine re-insert revives it
    src.merge(Seq(ev("I", 6, "a", 0, text = "zombie")).toDF(), epoch = 4L)
    Scd2.sync(src, dst)
    assert(!intervals(dst).contains(("a", 0, -1L)), "zombie resurrection")
    src.merge(Seq(ev("I", 11, "a", 0, text = "reborn")).toDF(), epoch = 5L)
    Scd2.sync(src, dst)
    assert(intervals(dst)(("a", 0, -1L)) === (("reborn", 11L, None, true)))
    // the full history chain is exactly the winner-moving subsequence
    assert(intervals(dst) === Map(
      ("a", 0, 5L) -> (("v5", 5L, Some(9L), false)),
      ("a", 0, -1L) -> (("reborn", 11L, None, true)),
      ("b", 0, -1L) -> (("x", 7L, None, true))))
  }

  test("reordered chunks converge: same commits, stale-in-later-commit, any chunk size") {
    // same scenario processed in one catch-up vs per-commit: a later COMMIT
    // carrying an older lsn (the micro-batch reorder case) must yield the
    // same history either way
    def stage(src: LakeTable): Unit = {
      src.merge(Seq(ev("I", 10, "a", 0, text = "w10")).toDF(), epoch = 0L)
      src.merge(Seq(ev("U", 8, "a", 0, text = "stale8")).toDF(), epoch = 1L)
      src.merge(Seq(ev("U", 12, "a", 0, text = "w12")).toDF(), epoch = 2L)
    }
    val s1 = newSrc("ro1"); stage(s1)
    val d1 = newDst(s1, "ro1")
    Scd2.sync(s1, d1) // one catch-up over all three commits
    val s2 = newSrc("ro2")
    val d2 = newDst(s2, "ro2")
    s2.merge(Seq(ev("I", 10, "a", 0, text = "w10")).toDF(), epoch = 0L)
    Scd2.sync(s2, d2)
    s2.merge(Seq(ev("U", 8, "a", 0, text = "stale8")).toDF(), epoch = 1L)
    Scd2.sync(s2, d2) // the stale commit crosses a sync boundary here
    s2.merge(Seq(ev("U", 12, "a", 0, text = "w12")).toDF(), epoch = 2L)
    Scd2.sync(s2, d2)
    val want = Map(
      ("a", 0, 10L) -> (("w10", 10L, Some(12L), false)),
      ("a", 0, -1L) -> (("w12", 12L, None, true)))
    assert(intervals(d1) === want)
    assert(intervals(d2) === want)
  }

  test("layout contract is enforced sharp") {
    val src = newSrc("sharp")
    src.merge(Seq(ev("I", 1, "a", 0)).toDF(), epoch = 0L)
    val wrong = LakeTable.create(spark, tmpDir("s2dst-sharp") + "/t", Model.keyCols, 4)
    val e = intercept[IllegalArgumentException](Scd2.sync(src, wrong))
    assert(e.getMessage.contains("scd_seq"))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Model
import graft.lake.{LakeTable, Rollup}

/** Incrementally maintained materialized aggregate ([[graft.lake.Rollup]]):
  * every refresh must land the rollup table on exactly the state a full
  * GROUP BY of the source's live rows would produce, while rewriting only
  * the groups the change window touched.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(op: String, lsn: Long, conv: String, turn: Int,
      text: String = "x", tool: Option[String] = None): Model.ChangeEvent =
    Model.ChangeEvent(op, lsn, new Timestamp(1704067200000L + lsn * 1000L),
      conv, turn, Some("user"), Some(text), tool)

  /** the independent oracle: full recompute over the source's live state */
  private def fullRollup(src: LakeTable): DataFrame =
    src.read().groupBy("conv_id").agg(Rollup.transcriptAggs.head,
      Rollup.transcriptAggs.tail: _*)

  private def assertRollupMatches(src: LakeTable, dst: LakeTable): Unit = {
    val got = dst.read().select("conv_id", "n_turns", "n_chars", "n_tool_calls", "last_ts")
    val want = fullRollup(src)
      .select("conv_id", "n_turns", "n_chars", "n_tool_calls", "last_ts")
    val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert(diff === 0L, s"rollup state mismatch: $diff differing rows")
  }

  test("bootstrap, incremental refresh, and group deletion all converge to the full recompute") {
    val src = LakeTable.create(spark, tmpDir("rsrc") + "/t", Model.keyCols, 4)
    val dst = LakeTable.create(spark, tmpDir("rdst") + "/t", Seq("conv_id"), 2)

    // epoch 0: three conversations
    src.merge(Seq(
      ev("I", 1, "a", 0), ev("I", 2, "a", 1, text = "longer text", tool = Some("calc")),
      ev("I", 3, "b", 0), ev("I", 4, "b", 1), ev("I", 5, "b", 2),
      ev("I", 6, "c", 0)).toDF(), epoch = 0L)
    val boot = Rollup.sync(src, dst, Rollup.transcriptAggs)
    assert(!boot.skipped)
    assertRollupMatches(src, dst)
    assert(dst.read().count() === 3L)

    // already at head: refresh is a no-op
    assert(Rollup.sync(src, dst, Rollup.transcriptAggs).skipped)

    // epoch 1: update one turn of 'a', delete ALL of 'c' — 'b' untouched
    src.merge(Seq(
      ev("U", 7, "a", 0, text = "rewritten", tool = Some("python")),
      ev("D", 8, "c", 0)).toDF(), epoch = 1L)
    val incr = Rollup.sync(src, dst, Rollup.transcriptAggs)
    assert(!incr.skipped)
    // only the two dirty groups were rewritten (a refreshed + c deleted),
    // not all three — the incremental contract
    assert(incr.rowsApplied === 2L, s"expected 2 dirty groups, got ${incr.rowsApplied}")
    assertRollupMatches(src, dst)
    assert(dst.read().where(col("conv_id") === "c").count() === 0L,
      "fully-deleted conversation must leave the rollup")
    assert(dst.read().where(col("conv_id") === "a").select("n_tool_calls")
      .head().getLong(0) === 2L)

    // epoch 2: resurrect 'c' — the rollup's LWW must bring it back
    src.merge(Seq(ev("I", 9, "c", 0), ev("I", 10, "c", 1)).toDF(), epoch = 2L)
    Rollup.sync(src, dst, Rollup.transcriptAggs)
    assertRollupMatches(src, dst)
    assert(dst.read().where(col("conv_id") === "c").select("n_turns")
      .head().getLong(0) === 2L)
  }

  test("a replayed sync epoch is skipped; a stale rollup catches up across several source commits") {
    val src = LakeTable.create(spark, tmpDir("rsrc2") + "/t", Model.keyCols, 4)
    val dst = LakeTable.create(spark, tmpDir("rdst2") + "/t", Seq("conv_id"), 2)

    src.merge(Seq(ev("I", 1, "a", 0), ev("I", 2, "b", 0)).toDF(), epoch = 0L)
    Rollup.sync(src, dst, Rollup.transcriptAggs)

    // three further source commits BEFORE the next refresh: one window
    // covers all of them (the catch-up path), including a's full deletion
    src.merge(Seq(ev("U", 3, "a", 0, text = "v2")).toDF(), epoch = 1L)
    src.merge(Seq(ev("I", 4, "b", 1)).toDF(), epoch = 2L)
    src.merge(Seq(ev("D", 5, "a", 0)).toDF(), epoch = 3L)
    val st = Rollup.sync(src, dst, Rollup.transcriptAggs)
    assert(!st.skipped)
    assertRollupMatches(src, dst)
    assert(dst.read().count() === 1L) // only b survives

    // replaying the same refresh (same source head) is exactly-once skipped
    assert(Rollup.sync(src, dst, Rollup.transcriptAggs).skipped)
  }

  test("a MUTATING group column recomputes the moved-out group and deletes delete-driven vanishes") {
    // group by `role` — a payload column an update CAN change and a
    // tombstone does NOT carry; the refresh must catch rows LEAVING a
    // group via the watermark pre-image read (Rollup scaladoc)
    val src = LakeTable.create(spark, tmpDir("rmut-src") + "/t", Model.keyCols, 4)
    val dst = LakeTable.create(spark, tmpDir("rmut-dst") + "/t", Seq("role"), 2)
    val aggs = Seq(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("n_chars"))
    def oracle(): DataFrame = src.read().groupBy("role").agg(aggs.head, aggs.tail: _*)
    def check(): Unit = {
      val got = dst.read().select("role", "n_turns", "n_chars")
      val diff = got.exceptAll(oracle()).count() + oracle().exceptAll(got).count()
      assert(diff === 0L, s"role rollup mismatch: $diff differing rows")
    }
    def evR(op: String, lsn: Long, conv: String, turn: Int, role: String,
        text: String = "x"): Model.ChangeEvent =
      Model.ChangeEvent(op, lsn, new Timestamp(1704067200000L + lsn * 1000L),
        conv, turn, Some(role), Some(text), None)

    src.merge(Seq(evR("I", 1, "a", 0, "user"), evR("I", 2, "a", 1, "assistant"),
      evR("I", 3, "b", 0, "user", text = "hello")).toDF(), epoch = 0L)
    Rollup.sync(src, dst, aggs)
    check()
    assert(dst.read().where(col("role") === "user").select("n_turns").head().getLong(0) === 2L)

    // the row (a,0) MOVES from user to assistant: the new images alone
    // would refresh assistant and leave user's count stale at 2
    src.merge(Seq(evR("U", 4, "a", 0, "assistant", text = "revised")).toDF(), epoch = 1L)
    val mv = Rollup.sync(src, dst, aggs)
    assert(!mv.skipped)
    check()
    assert(dst.read().where(col("role") === "user").select("n_turns").head().getLong(0) === 1L,
      "moved-out group must be recomputed")

    // delete the LAST user row: the tombstone carries no role, so only the
    // pre-image read can tell the refresh which group just vanished
    src.merge(Seq(evR("D", 5, "b", 0, "user")).toDF(), epoch = 2L)
    Rollup.sync(src, dst, aggs)
    check()
    assert(dst.read().where(col("role") === "user").count() === 0L,
      "delete-driven vanish of a non-key group must remove the rollup row")
    assert(dst.read().count() === 1L)
  }

  test("syncAdditive folds deltas with no live scan: moves, vanishes, and resurrection converge") {
    // capture Rollup's WARN stream: the additive path must NEVER hit the
    // O(table) full-scan fallback, even on this non-aligned layout
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "rollup-add-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(org.apache.logging.log4j.Level.WARN))
          captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val core = org.apache.logging.log4j.LogManager.getLogger(Rollup.getClass)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    core.addAppender(appender)
    try {
      val src = LakeTable.create(spark, tmpDir("radd-src") + "/t", Model.keyCols, 4)
      val dst = LakeTable.create(spark, tmpDir("radd-dst") + "/t", Seq("role"), 2)
      val sums = Seq("n_chars" -> length(col("text")).cast("long"),
        "n_tools" -> when(col("tool").isNotNull, 1L).otherwise(0L))
      def evR(op: String, lsn: Long, conv: String, turn: Int, role: String,
          text: String = "x", tool: Option[String] = None): Model.ChangeEvent =
        Model.ChangeEvent(op, lsn, new Timestamp(1704067200000L + lsn * 1000L),
          conv, turn, Some(role), Some(text), tool)
      def check(): Unit = {
        val got = dst.read().select("role", "n_chars", "n_tools", "n_live")
        val want = src.read().groupBy("role").agg(
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(when(col("tool").isNotNull, 1L).otherwise(0L)).as("n_tools"),
          count(lit(1)).as("n_live"))
        val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        assert(diff === 0L, s"additive rollup mismatch: $diff differing rows")
      }

      src.merge(Seq(evR("I", 1, "a", 0, "user", text = "hello"),
        evR("I", 2, "a", 1, "assistant", tool = Some("calc")),
        evR("I", 3, "b", 0, "user", text = "hey")).toDF(), epoch = 0L)
      assert(!Rollup.syncAdditive(src, dst, sums).skipped)
      check()
      // replay is epoch-skipped
      assert(Rollup.syncAdditive(src, dst, sums).skipped)

      // move (a,0) user→assistant, grow b's text, delete (a,1)
      src.merge(Seq(evR("U", 4, "a", 0, "assistant", text = "moved"),
        evR("U", 5, "b", 0, "user", text = "longer now"),
        evR("D", 6, "a", 1, "assistant")).toDF(), epoch = 1L)
      assert(!Rollup.syncAdditive(src, dst, sums).skipped)
      check()

      // vanish: delete the last user row → user leaves the rollup
      src.merge(Seq(evR("D", 7, "b", 0, "user")).toDF(), epoch = 2L)
      Rollup.syncAdditive(src, dst, sums)
      check()
      assert(dst.read().where(col("role") === "user").count() === 0L)

      // resurrect: user reappears, restarted from zero
      src.merge(Seq(evR("I", 8, "c", 0, "user", text = "back")).toDF(), epoch = 3L)
      Rollup.syncAdditive(src, dst, sums)
      check()
      assert(dst.read().where(col("role") === "user").select("n_live")
        .head().getLong(0) === 1L)

      // late redelivery: a LOWER-lsn change merged in a later epoch loses
      // to the current state under LWW — the additive delta must see the
      // state diff (zero), not the window's own winner
      src.merge(Seq(evR("U", 2, "a", 0, "user", text = "stale replay")).toDF(), epoch = 4L)
      Rollup.syncAdditive(src, dst, sums)
      check()
      assert(dst.read().where(col("role") === "user").select("n_live")
        .head().getLong(0) === 1L, "a losing redelivered change must contribute nothing")

      assert(captured.isEmpty,
        s"additive refresh must never warn about a full live scan, got $captured")
    } finally {
      core.removeAppender(appender)
      appender.stop()
    }
  }

  test("the epoch compare-and-set aborts an overlapping non-idempotent window instead of double-counting") {
    val dst = LakeTable.create(spark, tmpDir("rcas-dst") + "/t", Seq("role"), 2)
    def row(lsn: Long, role: String, n: Long) = (role, n, "U", lsn)
    // writer 'r' lineage: epoch 5 applied
    dst.merge(Seq(row(1, "user", 2L)).toDF("role", "n_live", "op", "lsn"),
      epoch = 5L, writerId = "r")
    // a delta computed FROM epoch 5 lands fine with the CAS
    dst.merge(Seq(row(2, "user", 3L)).toDF("role", "n_live", "op", "lsn"),
      epoch = 7L, writerId = "r", expectPrevEpoch = Some(5L))
    // a racing refresher's delta computed from the STALE epoch 5 must abort
    val e = intercept[LakeTable.ConcurrentRefreshException] {
      dst.merge(Seq(row(3, "user", 9L)).toDF("role", "n_live", "op", "lsn"),
        epoch = 9L, writerId = "r", expectPrevEpoch = Some(5L))
    }
    assert(e.getMessage.contains("overlapping window"))
    // the aborted delta left no trace; the CAS-clean value stands
    assert(dst.read().where(col("role") === "user").select("n_live")
      .head().getLong(0) === 3L)
  }

  test("a non-key rollup whose watermark snapshot was expired fails sharply, naming the remedy") {
    val src = LakeTable.create(spark, tmpDir("rexp-src") + "/t", Model.keyCols, 4)
    val dst = LakeTable.create(spark, tmpDir("rexp-dst") + "/t", Seq("role"), 2)
    val aggs = Seq(count(lit(1)).as("n_turns"))
    src.merge(Seq(ev("I", 1, "a", 0)).toDF(), epoch = 0L)
    Rollup.sync(src, dst, aggs)
    src.merge(Seq(ev("U", 2, "a", 0, text = "v2")).toDF(), epoch = 1L)
    src.merge(Seq(ev("I", 3, "b", 0)).toDF(), epoch = 2L)
    src.merge(Seq(ev("I", 4, "c", 0)).toDF(), epoch = 3L)
    // keep the change window's manifests but expire the watermark version
    src.expireSnapshots(retainVersions = 3)
    val e = intercept[IllegalStateException](Rollup.sync(src, dst, aggs))
    assert(e.getMessage.contains("watermark snapshot"))
    assert(e.getMessage.contains("expireSnapshots keep count"))
  }

  test("the O(table) full-scan fallback is warned at sync time only on a non-aligned layout") {
    // capture graft.lake.Rollup's WARN stream through a log4j2 core appender
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "rollup-warn-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val core = org.apache.logging.log4j.LogManager.getLogger(Rollup.getClass)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    core.addAppender(appender)
    try {
      // non-aligned: src distributed on the full key (conv_id, turn_idx),
      // rollup grouped on conv_id alone ⇒ incremental refresh must warn
      val src = LakeTable.create(spark, tmpDir("rwarn-src") + "/t", Model.keyCols, 4)
      val dst = LakeTable.create(spark, tmpDir("rwarn-dst") + "/t", Seq("conv_id"), 2)
      src.merge(Seq(ev("I", 1, "a", 0), ev("I", 2, "b", 0)).toDF(), epoch = 0L)
      Rollup.sync(src, dst, Rollup.transcriptAggs) // bootstrap: no fallback path
      assert(captured.isEmpty, "bootstrap must not warn")
      src.merge(Seq(ev("U", 3, "a", 0, text = "v2")).toDF(), epoch = 1L)
      Rollup.sync(src, dst, Rollup.transcriptAggs)
      assert(captured.size === 1, s"expected exactly one fallback warn, got $captured")
      assert(captured.get(0).contains("scans the FULL live table"))
      assert(captured.get(0).contains("distributionColumns = groupCols"))

      // aligned: distCols = (conv_id) ⊆ groupCols ⇒ bucket-pruned, silent
      captured.clear()
      val src2 = LakeTable.create(spark, tmpDir("rwarn-src2") + "/t", Model.keyCols, 4,
        distCols = Seq("conv_id"))
      val dst2 = LakeTable.create(spark, tmpDir("rwarn-dst2") + "/t", Seq("conv_id"), 2)
      src2.merge(Seq(ev("I", 1, "a", 0), ev("I", 2, "b", 0)).toDF(), epoch = 0L)
      Rollup.sync(src2, dst2, Rollup.transcriptAggs)
      src2.merge(Seq(ev("U", 3, "a", 0, text = "v2")).toDF(), epoch = 1L)
      Rollup.sync(src2, dst2, Rollup.transcriptAggs)
      assert(captured.isEmpty, s"aligned layout must not warn, got $captured")
      assertRollupMatches(src2, dst2)
    } finally {
      core.removeAppender(appender)
      appender.stop()
    }
  }
}

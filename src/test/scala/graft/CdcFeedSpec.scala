package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.engine.cdc.CdcFeed
import graft.engine.{JobConfig}
import graft.lake.LakeTable
import graft.tools.RunJob

/** Incrementally maintained envelope feeds (engine/cdc/CdcFeed.scala): the
  * broker-less outbox. Each sync ships exactly the source commits since the
  * feed directory's own watermark; a tailing consumer converges to the
  * source's LWW state; crashed attempts re-ship without corrupting windows.
  */
class CdcFeedSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def feedNames(dir: String): Seq[String] =
    fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSeq.sorted

  private def replay(feedDir: String, fmt: String, work: String, tag: String): LakeTable = {
    RunJob.run(spark, JobConfig.parse(s"""{"job": {"content": [{
      "reader": {"name": "cdcreader", "parameter": {
        "path": "$feedDir", "format": "$fmt", "checkpoint": "$work/cp-$tag"}},
      "writer": {"name": "lakewriter", "parameter": {
        "path": "$work/dst-$tag", "primaryKey": ["conv_id", "turn_idx"],
        "buckets": 2}}}]}}"""))
    LakeTable.open(spark, s"$work/dst-$tag")
  }

  private def state(t: LakeTable) =
    t.read().select("conv_id", "turn_idx", "role", "text", "ts")
      .orderBy("conv_id", "turn_idx").collect().toSeq

  test("incremental windows: each sync ships only new commits; consumer converges") {
    val work = tmpDir("cdcfeed")
    val cfg = Gen.GenConfig(nEvents = 6000, nConvs = 40, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    assert(events.filter($"op" === "D").count() > 0, "workload must include deletes")
    val src = LakeTable.create(spark, s"$work/src", Seq("conv_id", "turn_idx"), 4)
    val feed = s"$work/feed"

    // 3 ingest epochs; feed after the 1st and after the 3rd → one window
    // spans multiple source commits, exactly like Replicate's contract
    for (e <- 0 until 3) {
      src.merge(events.filter(pmod($"lsn", lit(3)) === e), epoch = e.toLong)
      if (e == 0 || e == 2) {
        val st = CdcFeed.sync(src, feed, "debezium", src.keyCols)
        assert(!st.skipped)
        assert(st.rows > 0L)
      }
    }
    val markers = feedNames(feed).filter(_.endsWith(".ok"))
    assert(markers === Seq("_w0-0.ok", "_w1-2.ok"), s"got $markers")
    // caught up → skip, nothing new written
    val before = feedNames(feed)
    assert(CdcFeed.sync(src, feed, "debezium", src.keyCols).skipped)
    assert(feedNames(feed) === before)

    // a consumer tailing the feed dir reaches the source's LWW state
    // (deletes included — debezium delete events carry the key image)
    assert(state(replay(feed, "debezium", work, "a")) === state(src))
  }

  test("crash retry: a lost marker (and partial window) re-ships soundly") {
    val work = tmpDir("cdcfeedcr")
    val cfg = Gen.GenConfig(nEvents = 3000, nConvs = 30, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$work/src", Seq("conv_id", "turn_idx"), 4)
    val feed = s"$work/feed"
    src.merge(events.filter($"lsn" % 2 === 0), epoch = 0L)
    CdcFeed.sync(src, feed, "maxwell")
    src.merge(events.filter($"lsn" % 2 === 1), epoch = 1L)
    CdcFeed.sync(src, feed, "maxwell")

    // simulate a crash between the part moves and the marker: the second
    // window's marker vanishes and one of its part files is gone
    val f = fs(feed)
    assert(f.delete(new Path(feed, "_w1-1.ok"), false))
    val w1parts = feedNames(feed).filter(n => n.startsWith("w1-") && n.endsWith(".jsonl"))
    assert(w1parts.nonEmpty)
    assert(f.delete(new Path(feed, w1parts.head), false))

    // watermark fell back to the first window → the retry re-ships the
    // whole second window (stale same-`from` leftovers swept first)
    val st = CdcFeed.sync(src, feed, "maxwell")
    assert(!st.skipped && st.fromVersion === 1L && st.toVersion === 1L)
    val markers = feedNames(feed).filter(_.endsWith(".ok"))
    assert(markers === Seq("_w0-0.ok", "_w1-1.ok"), s"got $markers")

    // consumer converges despite the crash/re-ship (LWW dedupes re-reads)
    assert(state(replay(feed, "maxwell", work, "b")) === state(src))
  }

  test("expire drops consumed windows but never the head (the watermark)") {
    val work = tmpDir("cdcfeedex")
    val cfg = Gen.GenConfig(nEvents = 2000, nConvs = 20, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$work/src", Seq("conv_id", "turn_idx"), 4)
    val feed = s"$work/feed"
    for (e <- 0 until 3) {
      src.merge(events.filter(pmod($"lsn", lit(3)) === e), epoch = e.toLong)
      CdcFeed.sync(src, feed, "canal")
    }
    assert(feedNames(feed).count(_.endsWith(".ok")) === 3)
    // horizon at v1: windows w0-0 and w1-1 go, the head w2-2 stays
    assert(CdcFeed.expire(src, feed, 1L) === 2)
    assert(feedNames(feed).filter(_.endsWith(".ok")) === Seq("_w2-2.ok"))
    assert(!feedNames(feed).exists(n => n.startsWith("w0-") || n.startsWith("w1-")))
    // a horizon at (or past) the head still keeps the head window
    assert(CdcFeed.expire(src, feed, 99L) === 0)
    assert(feedNames(feed).filter(_.endsWith(".ok")) === Seq("_w2-2.ok"))
    // the watermark is intact: nothing new committed → sync skips
    assert(CdcFeed.sync(src, feed, "canal").skipped)
  }

  test("debezium feeds require key columns; bad format rejected") {
    val work = tmpDir("cdcfeedreq")
    val src = LakeTable.create(spark, s"$work/src", Seq("conv_id", "turn_idx"), 2)
    assertThrows[IllegalArgumentException](CdcFeed.sync(src, s"$work/f", "debezium"))
    assertThrows[IllegalArgumentException](CdcFeed.sync(src, s"$work/f", "avro", Seq("conv_id")))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.Gen
import graft.lake.{LakeTable, Replicate}

/** Lake→lake incremental replication (lake/Replicate.scala): the
  * destination converges to the source through change windows only, with
  * deletes propagated and replays skipped via per-writer epoch lineage.
  */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(t: LakeTable) =
    t.read().orderBy("conv_id", "turn_idx").collect().toSeq

  test("incremental sync converges to source state across epochs, incl. deletes") {
    val dir = tmpDir("repl")
    val cfg = Gen.GenConfig(nEvents = 6000, nConvs = 40, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    assert(events.filter($"op" === "D").count() > 0, "workload must include deletes")

    val src = LakeTable.create(spark, s"$dir/src", Seq("conv_id", "turn_idx"), 8)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 8)

    // ingest in 3 epochs; replicate after the 1st and after the 3rd, so one
    // sync window spans multiple source commits
    for (e <- 0 until 3) {
      val slice = events.filter(pmod($"lsn", lit(3)) === e)
      src.merge(slice, epoch = e.toLong)
      if (e == 0 || e == 2) {
        val st = Replicate.sync(src, dst)
        assert(!st.skipped)
      }
    }
    assert(sortedRows(dst) === sortedRows(src))
    // deletes propagated: destination has no key the source lacks
    assert(dst.read().join(src.read(), Seq("conv_id", "turn_idx"), "left_anti").count() === 0L)

    // re-running the sync with nothing new is a no-op
    val again = Replicate.sync(src, dst)
    assert(again.skipped)

    // a second destination bootstraps the FULL history in one sync
    val dst2 = LakeTable.create(spark, s"$dir/dst2", Seq("conv_id", "turn_idx"), 8)
    val boot = Replicate.sync(src, dst2)
    assert(!boot.skipped)
    assert(sortedRows(dst2) === sortedRows(src))
  }

  test("vacuum retention keeps a lagging consumer's change window readable") {
    val dir = tmpDir("repl-vac")
    val cfg = Gen.GenConfig(nEvents = 4000, nConvs = 20, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    // aggressive compaction so merged deltas fold out of `files` immediately
    val src = new LakeTable(spark, s"$dir/src", Seq("conv_id", "turn_idx"),
      numBuckets = 4, deltaRatio = 0.0, maxDeltaFiles = 1)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 4)

    for (e <- 0 until 3) src.merge(events.filter(pmod($"lsn", lit(3)) === e), e.toLong)
    val cur = src.currentSnapshot()
    assert(cur.files.forall(_.kind == "b"), "compaction must have folded all deltas")

    // retention keeps the folded delta files: a consumer 3 commits behind
    // can still read its window after vacuum
    val removedWithRetention = src.vacuum(retainVersions = 3)
    val st = Replicate.sync(src, dst) // reads changes since -1 (bootstrap)
    assert(!st.skipped)
    assert(sortedRows(dst) === sortedRows(src))

    // without retention the same vacuum would have deleted those windows
    val removedBare = src.vacuum()
    assert(removedBare > 0, "retention must have been the only thing keeping deltas")
  }

  test("streaming CDC-out: tailing delta files replicates the table live") {
    val dir = tmpDir("repl-stream")
    val cfg = Gen.GenConfig(nEvents = 6000, nConvs = 40, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$dir/src", Seq("conv_id", "turn_idx"), 8)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 8)
    for (e <- 0 until 3)
      src.merge(events.filter(pmod($"lsn", lit(3)) === e), epoch = e.toLong)

    // tail the source's change log as a stream; every micro-batch is a
    // set of LWW-safe change rows that merges exactly-once downstream
    val q = src.readStreamChanges(maxFilesPerTrigger = 8)
      .writeStream
      .option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
        dst.merge(b, epoch, writerId = "cdc-tail"); ()
      }
      .start()
    q.awaitTermination()
    assert(sortedRows(dst) === sortedRows(src))
    // tombstones propagated as rows, then resolved away downstream
    assert(dst.read().join(src.read(), Seq("conv_id", "turn_idx"), "left_anti").count() === 0L)
    events.unpersist()
    ()
  }

  test("bootstrap sync survives a fully vacuumed source (current state, not history)") {
    val dir = tmpDir("repl-boot")
    val cfg = Gen.GenConfig(nEvents = 3000, nConvs = 20, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$dir/src", Seq("conv_id", "turn_idx"), 4)
    for (e <- 0 until 3) src.merge(events.filter(pmod($"lsn", lit(3)) === e), e.toLong)
    // fold everything and reclaim ALL historical delta files — a consumer
    // replaying windows from version -1 would hit missing files here
    src.compactAll()
    src.vacuum(retainVersions = 0)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 4)
    val st = Replicate.sync(src, dst)
    assert(!st.skipped)
    assert(sortedRows(dst) === sortedRows(src))
    // tombstone winners crossed the bootstrap: a late OLDER duplicate of a
    // deleted key still loses LWW in the destination
    assert(dst.read().join(src.read(), Seq("conv_id", "turn_idx"), "left_anti").count() === 0L)
    events.unpersist()
    ()
  }

  test("follow tails committed changes and skips rollback phantoms") {
    val dir = tmpDir("repl-follow")
    val cfg = Gen.GenConfig(nEvents = 4000, nConvs = 30, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$dir/src", Seq("conv_id", "turn_idx"), 4)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 4)

    src.merge(events.filter(pmod($"lsn", lit(2)) === 0), epoch = 0L)
    src.merge(events.filter(pmod($"lsn", lit(2)) === 1), epoch = 1L)
    val applied = Replicate.follow(src, dst, pollMillis = 50L, idleRounds = 2)
    assert(applied > 0L)
    assert(sortedRows(dst) === sortedRows(src))

    // a bad commit is rolled back BEFORE the consumer polls again: the
    // committed-window tail must never apply it (the file-tail
    // readStreamChanges would — that is the documented contract gap)
    val headBeforeJunk = src.currentSnapshot().version
    val junk = Seq(("U", 999999L, "junk-conv", 0, "user", "junk", null: String,
      new java.sql.Timestamp(0L)))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    src.merge(junk, epoch = 2L)
    src.rollbackTo(headBeforeJunk)
    Replicate.follow(src, dst, pollMillis = 50L, idleRounds = 2)
    assert(dst.read().filter($"conv_id" === "junk-conv").count() === 0L,
      "rolled-back commit must not reach the follower")
    assert(sortedRows(dst) === sortedRows(src))
    events.unpersist()
    ()
  }

  test("replication coexists with the destination's own writers") {
    val dir = tmpDir("repl-mix")
    val cfg = Gen.GenConfig(nEvents = 2000, nConvs = 20, partitions = 4)
    val events = Gen.changeEvents(spark, cfg).toDF().cache()
    val src = LakeTable.create(spark, s"$dir/src", Seq("conv_id", "turn_idx"), 4)
    val dst = LakeTable.create(spark, s"$dir/dst", Seq("conv_id", "turn_idx"), 4)
    src.merge(events, epoch = 0L)

    // the destination ingests its own local stream under the default writer
    val local = Seq(("U", 10L, "local-conv", 0, "user", "local row", null: String,
      new java.sql.Timestamp(0L)))
      .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    dst.merge(local, epoch = 0L)

    // replication's epoch lineage (writerId) is independent of the local
    // stream's — both apply, neither skips the other
    val st = Replicate.sync(src, dst)
    assert(!st.skipped)
    assert(dst.read().filter($"conv_id" === "local-conv").count() === 1L)
    assert(dst.read().count() === src.read().count() + 1)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.core.Model
import graft.core.Model.ChangeEvent
import graft.streaming.Sessionize

/** Stateful streaming: flatMapGroupsWithState sessionizer with event-time
  * timeouts — deterministic session summaries from a replayed log.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(conv: String, turn: Int, lsn: Long, tsSec: Long) =
    ChangeEvent("U", lsn, new Timestamp(tsSec * 1000L), conv, turn,
      Some("user"), Some(s"$conv/$turn"), None)

  test("conversations close after an event-time gap; open ones stay pending") {
    val dir = tmpDir("sess")
    // batch 1: two interleaved conversations
    Seq(
      ev("conv-A", 0, 1L, 100L), ev("conv-A", 1, 2L, 105L), ev("conv-A", 2, 3L, 110L),
      ev("conv-B", 0, 4L, 106L), ev("conv-B", 1, 5L, 108L)
    ).toDS().repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(50) // distinct mtime => second file is a later micro-batch
    // batch 2: a far-future sentinel pushes the watermark past A's and B's
    // idle gaps; conv-Z itself stays open (no session emitted for it)
    Seq(ev("conv-Z", 0, 9L, 600L)).toDS().repartition(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(Model.changeEventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[ChangeEvent]

    val q = Sessionize.sessions(spark, src, gapSeconds = 30L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("sessions")
      .as[Sessionize.SessionSummary].collect().sortBy(_.conv_id)
    assert(got.map(_.conv_id).toSeq === Seq("conv-A", "conv-B"))
    val a = got(0)
    assert(a.events === 3L && a.max_turn_idx === 2 && a.max_lsn === 3L)
    assert(a.started.getTime === 100000L && a.ended.getTime === 110000L)
    assert(got(1).events === 2L)
  }
}

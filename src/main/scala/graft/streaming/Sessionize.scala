package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Model.ChangeEvent

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * conversation-sessionizer: tracks each conversation's running turn count /
  * lsn frontier and EMITS a session summary when the conversation goes idle
  * for `gapSeconds` of EVENT TIME (processing-time-independent, so the
  * output is deterministic for a given log).
  *
  * This is the "stateful operator" tier the reference engine cannot express
  * at all (go-datax is batch-only, `README_EN.md:224`); Spark-natively it is
  * a `KeyValueGroupedDataset.flatMapGroupsWithState` with event-time state
  * expiry driven by the watermark.
  */
object Sessionize {

  /** Mutable-ish per-conversation state carried between micro-batches. */
  final case class ConvState(
      turnsSeen: Long,
      distinctTurnMax: Int,
      maxLsn: Long,
      firstTs: Long,
      lastTs: Long)

  /** Emitted when a conversation is idle past the gap (event time). */
  final case class SessionSummary(
      conv_id: String,
      events: Long,
      max_turn_idx: Int,
      max_lsn: Long,
      started: Timestamp,
      ended: Timestamp)

  /** Apply over a STREAMING Dataset[ChangeEvent] with a watermark on `ts`.
    * Emits one summary per conversation-session once the watermark passes
    * `lastTs + gapSeconds`.
    */
  def sessions(
      spark: SparkSession,
      events: Dataset[ChangeEvent],
      gapSeconds: Long): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, it: Iterator[ChangeEvent], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            // idle past the gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(convId, s.turnsSeen, s.distinctTurnMax,
              s.maxLsn, new Timestamp(s.firstTs), new Timestamp(s.lastTs)))
          } else {
            var s = state.getOption.getOrElse(ConvState(0L, -1, -1L, Long.MaxValue, Long.MinValue))
            it.foreach { e =>
              s = ConvState(
                s.turnsSeen + 1,
                math.max(s.distinctTurnMax, e.turn_idx),
                math.max(s.maxLsn, e.lsn),
                math.min(s.firstTs, e.ts.getTime),
                math.max(s.lastTs, e.ts.getTime))
            }
            state.update(s)
            // close when event time (watermark) passes lastTs + gap
            state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000L)
            Iterator.empty
          }
      }
  }
}

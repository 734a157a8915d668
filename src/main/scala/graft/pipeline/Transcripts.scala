package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation-level operators over the turn table — the engine's payload
  * is multi-turn transcripts keyed (conv_id, turn_idx), and these are the
  * whole-conversation views a training-data pipeline derives from it:
  * stable-order reconstruction, structural integrity audit,
  * conversation-level dedup signatures, and tool-usage stats.
  *
  * Scale shape (all four): ONE hash aggregate keyed on the conversation id —
  * the same exchange the lake's `distCols = conv_id` layout co-locates, so
  * over a lake read the shuffle is map-side-combined per bucket. Per-group
  * state is O(turns in one conversation) (collect_list of that conversation
  * only), which is bounded by construction of the domain — a transcript is
  * a dialogue, not a fact stream (the generator's own bound is
  * `GenConfig.maxTurns` distinct indices per conversation), far under
  * executor memory. No windows, no joins, no second exchange.
  *
  * Ordering contract: every operator sorts each conversation's collected
  * turns by `turn_idx` INSIDE the aggregate (`array_sort` on a
  * (turn_idx, …) struct — lexicographic on the leading field), so results
  * are deterministic whatever partition/arrival order the scan produced.
  * This is the "stable turn ordering" half of the engine's correctness
  * criterion; the per-turn-text-equality half is [[graft.lake.Parity]].
  */
object Transcripts {

  /** Collected turns of one conversation, idx-sorted: array<struct<i, v>>. */
  private def sortedTurns(idx: Column, v: Column): Column =
    array_sort(collect_list(struct(idx.as("i"), v.as("v"))))

  /** Reconstruct each conversation's full text under stable turn ordering.
    * Output: conv, n_turns, first/last ts, total chars, and the joined
    * transcript text (`sep`-joined in turn_idx order).
    */
  def stitch(turns: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", textCol: String = "text",
      tsCol: Option[String] = Some("ts"), sep: String = "\n"): DataFrame = {
    val ts = tsCol.map(c => Seq(min(col(c)).as("first_ts"), max(col(c)).as("last_ts")))
      .getOrElse(Nil)
    val aggs = Seq(
      count(lit(1)).as("n_turns"),
      sum(length(col(textCol))).as("n_chars"),
      array_join(transform(sortedTurns(col(idxCol), col(textCol)),
        t => t.getField("v")), sep).as("full_text")) ++ ts
    turns.groupBy(col(convCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Structural audit of each conversation: missing turn indices (gaps in
    * the 0-based `turn_idx` sequence), duplicate indices, and
    * role-alternation breaks (adjacent turns with the same role in idx
    * order). A healthy ingest has all three at zero; a lossy or reordered
    * source shows up here before it shows up in a downstream eval.
    */
  def integrity(turns: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", roleCol: String = "role"): DataFrame = {
    val roles = transform(sortedTurns(col(idxCol), col(roleCol)), _.getField("v"))
    // adjacent pairs: zip roles[0..n-2] with roles[1..n-1]; slice is 1-based
    // and tolerates length 0 (single-turn conversations → no pairs)
    val breaks = size(filter(
      zip_with(slice(roles, lit(1), size(roles) - 1),
        slice(roles, lit(2), size(roles) - 1), (a, b) => a === b),
      x => x))
    turns.groupBy(col(convCol)).agg(
      count(lit(1)).as("n_turns"),
      countDistinct(col(idxCol)).as("n_idx"),
      max(col(idxCol)).as("max_idx"),
      (max(col(idxCol)) + 1 - countDistinct(col(idxCol))).as("n_gaps"),
      (count(lit(1)) - countDistinct(col(idxCol))).as("n_dup_idx"),
      breaks.as("n_role_breaks"))
  }

  /** Conversation-level dedup signature: md5 over the `sigCol` values joined
    * in turn order. Two conversations with identical turn sequences (same
    * texts, or same tool-call shapes — choose the column) collide on the
    * signature; grouping by it is exact whole-conversation dedup, the same
    * shape as [[Dedup.exact]] one level up the hierarchy.
    *
    * Turns are joined with a NUL separator so a value shift across a turn
    * boundary — ("ab","c") vs ("a","bc") — changes the signature; only
    * texts that themselves contain NUL at a boundary could still collide
    * (not a reachable shape for transcript text).
    */
  def signatures(turns: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", sigCol: String = "text",
      sep: String = "\u0000"): DataFrame =
    turns.groupBy(col(convCol)).agg(
      md5(to_binary(array_join(transform(sortedTurns(col(idxCol), col(sigCol)),
        t => t.getField("v")), sep), lit("utf-8"))).as("sig"),
      count(lit(1)).as("n_turns"))

  /** Duplicate-conversation groups: signature → how many conversations share
    * it and the representative (minimum) conversation id — the keep-list /
    * drop-list split for conversation-level dedup.
    */
  def duplicateGroups(turns: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", sigCol: String = "text"): DataFrame =
    signatures(turns, convCol, idxCol, sigCol)
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_convs"), min(col(convCol)).as("keep_conv"))
      .filter(col("n_convs") > 1)

  /** Tool-usage stats over tool turns: per tool, call volume, reach
    * (distinct conversations), and mean position in the conversation.
    */
  def toolStats(turns: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", toolCol: String = "tool"): DataFrame =
    turns.filter(col(toolCol).isNotNull)
      .groupBy(col(toolCol))
      .agg(count(lit(1)).as("n_calls"),
        countDistinct(col(convCol)).as("n_convs"),
        round(avg(col(idxCol)), 4).as("avg_pos"))
}

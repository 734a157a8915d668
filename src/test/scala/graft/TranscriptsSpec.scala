package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Transcripts

/** Conversation-level transcript operators ([[graft.pipeline.Transcripts]]):
  * stable-order stitching, structural integrity audit, conversation-level
  * dedup signatures, tool stats — all must be invariant to the arrival
  * order of turns (the whole point of the stable-ordering contract).
  */
class TranscriptsSpec extends SparkSpec {
  import spark.implicits._

  // two conversations; c1 has a gap (idx 2 missing), a duplicated idx (1),
  // and a role break (two user turns adjacent at idx 3,4); rows DELIBERATELY
  // out of order — every operator must sort by idx inside the aggregate
  private def turns = Seq(
    ("c1", 4, "user", "e", Some("search"), 400L),
    ("c1", 0, "user", "a", None, 100L),
    ("c1", 3, "user", "d", None, 300L),
    ("c1", 1, "assistant", "b", None, 200L),
    ("c1", 1, "assistant", "b2", Some("calc"), 250L),
    ("c2", 0, "user", "hi", None, 500L),
    ("c2", 1, "assistant", "yo", None, 600L))
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ms")
    .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  test("stitch: turn_idx order regardless of arrival order; counts and ts bounds") {
    val got = Transcripts.stitch(turns).collect()
      .map(r => r.getString(0) -> r).toMap
    val c1 = got("c1")
    assert(c1.getAs[Long]("n_turns") === 5L)
    // duplicate idx 1: both texts appear, in deterministic (idx, text) order
    assert(c1.getAs[String]("full_text") === "a\nb\nb2\nd\ne")
    assert(c1.getAs[Long]("n_chars") === 6L)
    assert(got("c2").getAs[String]("full_text") === "hi\nyo")
    assert(got("c2").getAs[java.sql.Timestamp]("first_ts").getTime === 500L)
    assert(got("c2").getAs[java.sql.Timestamp]("last_ts").getTime === 600L)
  }

  test("integrity: gaps, duplicate idx, role breaks — zero on the healthy conversation") {
    val got = Transcripts.integrity(turns).collect()
      .map(r => r.getString(0) -> r).toMap
    val c1 = got("c1")
    assert(c1.getAs[Long]("n_turns") === 5L)
    assert(c1.getAs[Long]("n_idx") === 4L)    // 0,1,3,4
    assert(c1.getAs[Int]("max_idx") === 4)
    assert(c1.getAs[Long]("n_gaps") === 1L)   // idx 2 missing
    assert(c1.getAs[Long]("n_dup_idx") === 1L)
    // sorted roles: user, assistant, assistant, user, user -> 2 breaks
    assert(c1.getAs[Int]("n_role_breaks") === 2)
    val c2 = got("c2")
    assert(c2.getAs[Long]("n_gaps") === 0L)
    assert(c2.getAs[Long]("n_dup_idx") === 0L)
    assert(c2.getAs[Int]("n_role_breaks") === 0)
  }

  test("integrity: single-turn conversation has no adjacent pairs (slice edge)") {
    val one = Seq(("solo", 0, "user", "x")).toDF("conv_id", "turn_idx", "role", "text")
    val r = Transcripts.integrity(one).collect().head
    assert(r.getAs[Int]("n_role_breaks") === 0)
    assert(r.getAs[Long]("n_gaps") === 0L)
  }

  test("signatures: identical ordered sequences collide; order matters") {
    val seqs = Seq(
      ("a", 0, "hi"), ("a", 1, "yo"),
      ("b", 1, "yo"), ("b", 0, "hi"),  // same sequence, rows arrive reversed
      ("c", 0, "yo"), ("c", 1, "hi"))  // same multiset, DIFFERENT order
      .toDF("conv_id", "turn_idx", "text")
    val sigs = Transcripts.signatures(seqs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sigs("a") === sigs("b"))
    assert(sigs("a") !== sigs("c"))
    val groups = Transcripts.duplicateGroups(seqs).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_convs") === 2L)
    assert(groups.head.getAs[String]("keep_conv") === "a")
  }

  test("toolStats: null tools excluded; reach and mean position per tool") {
    val got = Transcripts.toolStats(turns).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("search", "calc"))
    assert(got("search").getAs[Long]("n_calls") === 1L)
    assert(got("search").getAs[Double]("avg_pos") === 4.0)
    assert(got("calc").getAs[Long]("n_convs") === 1L)
  }

  test("plan shape: stitch/integrity are single-aggregate — no window, no join") {
    for (df <- Seq(Transcripts.stitch(turns), Transcripts.integrity(turns))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Window"), s"unexpected window:\n$plan")
      assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    }
  }
}

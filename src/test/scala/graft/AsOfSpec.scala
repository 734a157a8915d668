package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.engine.AsOf

/** As-of join semantics and plan shape (engine/AsOf.scala). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val left = Seq(
    (1L, "k1", ts(5)), // before any right row -> nulls
    (2L, "k1", ts(10)), // exactly at a right ts -> inclusive match
    (3L, "k1", ts(99)), // far after -> latest right row
    (4L, "k2", ts(50)), // other key -> its own timeline
    (5L, "k3", ts(50))) // key with no right rows at all
    .toDF("id", "k", "t")

  private lazy val right = Seq(
    ("k1", ts(10), "a"),
    ("k1", ts(20), "b"),
    ("k2", ts(49), "c"),
    ("k2", ts(51), "d"))
    .toDF("k", "t", "v")

  test("as-of join: latest right row at-or-before each left row, else null") {
    val got = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> None, // nothing at or before ts 5
      2L -> Some("a"), // inclusive <= at ts 10
      3L -> Some("b"), // latest of the two k1 rows
      4L -> Some("c"), // 51 is in the future, 49 wins
      5L -> None)) // key never appears on the right
  }

  test("as-of join: right-side ties on (key, ts) resolve deterministically") {
    val dupRight = right.unionByName(Seq(("k1", ts(10), "z")).toDF("k", "t", "v"))
    // max-struct policy: 'z' > 'a' lexicographically, so 'z' wins at ts 10
    val got = AsOf.join(left, dupRight, Seq("k"), "t", "t", Seq("v"))
      .filter($"id" === 2L).select("v").as[String].head()
    assert(got === "z")
    // and the result is identical at a different parallelism
    val again = AsOf.join(left.repartition(7), dupRight.repartition(5),
      Seq("k"), "t", "t", Seq("v"))
      .filter($"id" === 2L).select("v").as[String].head()
    assert(again === "z")
  }

  test("as-of join tolerance: matches older than the lookback bound null out") {
    // id=3 matched "b" at ts 20 from ts 99 — a 79 s lookback; with a 60 s
    // tolerance that match nulls out while the fresh ones (id=2: 0 s,
    // id=4: 1 s) survive
    val got = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some(expr("INTERVAL 60 SECONDS")))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> None, 2L -> Some("a"), 3L -> None, 4L -> Some("c"), 5L -> None))
  }

  test("as-of join plans as union+window: no nested-loop or cartesian join") {
    val plan = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("as-of join rejects value columns that collide with left columns") {
    val bad = right.withColumnRenamed("v", "id")
    assertThrows[IllegalArgumentException] {
      AsOf.join(left, bad, Seq("k"), "t", "t", Seq("id"))
    }
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.ColumnCasts._
import graft.engine.Splits

/** DataX cast/format semantics (SURVEY §1.2) and split-strategy math. */
class CastsSpec extends SparkSpec {
  import spark.implicits._

  test("empty string is null; lossy casts yield null not errors") {
    val df = Seq("", "42", "x7", "-3").toDF("s")
    assert(df.select(emptyAsNull($"s")).collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(None, Some("42"), Some("x7"), Some("-3")))
    assert(df.select(stringToLong($"s")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ===
      Seq(None, Some(42L), None, Some(-3L)))
  }

  test("canonical date format and unix-seconds cast") {
    val ts = Timestamp.valueOf("2024-03-05 06:07:08.999")
    val df = Seq(ts).toDF("ts")
    assert(df.select(dateToString($"ts")).collect()(0).getString(0) === "2024-03-05 06:07:08")
    // truncation (not rounding) to seconds, like the reference's unix cast
    assert(df.select(dateToLong($"ts")).collect()(0).getLong(0) === ts.getTime / 1000)
    assert(df.select(stringToDate(lit("2024-03-05 06:07:08"))).collect()(0)
      .getTimestamp(0).toString.startsWith("2024-03-05 06:07:08"))
  }

  test("bool/long casts and double/bytes rendering") {
    assert(Seq((true, 1.5d)).toDF("b", "d")
      .select(boolToLong($"b"), doubleToString($"d")).collect()(0).toSeq === Seq(1L, "1.500000"))
    assert(Seq((2L, 0L, 1L)).toDF("a", "b", "c")
      .select(longToBool($"a"), longToBool($"b"), longToBool($"c")).collect()(0).toSeq ===
      Seq(null, false, true))
    assert(Seq("hi").toDF("s").select(bytesToString(encode($"s", "UTF-8")))
      .collect()(0).getString(0) === "6869")
  }

  test("range split: equal width, last range absorbs remainder") {
    val df = (0L to 100L).toDF("k")
    val out = df.select(Splits.rangeSplit($"k", 0L, 100L, 8).as("s"))
      .groupBy("s").count().orderBy("s").collect()
    assert(out.map(_.getInt(0)).toSeq === (0 to 7))
    // width = 13; splits 0..6 get 13, split 7 absorbs 101-7*13 = 10
    assert(out.map(_.getLong(1)).toSeq === Seq(13L, 13L, 13L, 13L, 13L, 13L, 13L, 10L))
  }

  test("offset split: remainder spread over first slices") {
    val df = (1L to 100L).toDF("k")
    val out = Splits.offsetSplit(df, "k", 7, 100L)
      .groupBy("split").count().orderBy("split").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(15L, 15L, 14L, 14L, 14L, 14L, 14L))
  }

  test("offset split: exact slices and per-row determinism once hash sampling engages") {
    // total > 10^5 ⇒ the boundary sample is a REAL subset (p > 1): slice
    // SIZES must still be exact (boundaries affect balance, never rank),
    // and the per-row assignment identical at any input partitioning —
    // the cross-job-consistency property the literal boundaries exist for
    val n = 250000L
    val df = spark.range(n).toDF("k")
    val out = Splits.offsetSplit(df, "k", 7, n)
      .groupBy("split").count().orderBy("split").collect()
    val sizes = out.map(_.getLong(1)).toSeq
    val base = n / 7
    val rem = (n % 7).toInt
    assert(sizes === (0 until 7).map(i => if (i < rem) base + 1 else base))
    val a = Splits.offsetSplit(df, "k", 7, n).select("k", "split")
    val b = Splits.offsetSplit(df.repartition(13), "k", 7, n).select("k", "split")
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("offset split: duplicate-heavy key domain still yields exact slices") {
    // only 5 distinct values over 200k rows: the hash boundary sample comes
    // back near-empty, the fallback samples the (bounded) distinct domain —
    // slice sizes stay exact, ranks remain a permutation
    val n = 200000L
    val df = spark.range(n).selectExpr("id % 5 as k")
    val sizes = Splits.offsetSplit(df, "k", 7, n)
      .groupBy("split").count().orderBy("split").collect().map(_.getLong(1)).toSeq
    val base = n / 7
    val rem = (n % 7).toInt
    assert(sizes === (0 until 7).map(i => if (i < rem) base + 1 else base))
  }

  test("salted key spreads a hot key deterministically") {
    val df = Seq.tabulate(100)(i => ("hot", i)).toDF("k", "sec")
    val salts = df.select(Splits.saltedKey($"k", $"sec", 8).as("sk"))
      .distinct().count()
    assert(salts === 8L)
  }
}

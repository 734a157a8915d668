package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the value columns
  * of the LATEST right row with `right.ts <= left.ts` for the same keys —
  * the temporal lookup every CDC/feature pipeline needs (join events to the
  * state that was current when they happened).
  *
  * The reference engine has no joins at all (SURVEY.md §2.6); this is one of
  * the "operators Spark lacks" the pipeline family adds. Spark has no ASOF
  * join either, and the naive encodings are scale-killers: a range-condition
  * join plans as BroadcastNestedLoopJoin (all pairs), and `join + filter +
  * row_number` shuffles every (left × matching-right) pair. This
  * implementation is the union-and-window formulation instead:
  *
  *   1. tag right rows side=0 and left rows side=1, union them;
  *   2. ONE hash shuffle on the keys, per-key sort by (ts, side) — right
  *      sorts before left at equal ts, giving inclusive `<=` semantics;
  *   3. running `last(value, ignoreNulls)` fills each left row with the
  *      most recent right payload; keep only left rows.
  *
  * Cost: one exchange over |L| + |R distinct (keys, ts)| rows — the same
  * shape as the MERGE stage, linear, codegen-friendly, no pair blow-up.
  * Rows on the left with no prior right row keep NULL values (ASOF LEFT
  * JOIN, same semantics as DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`).
  *
  * Right rows are first reduced to one per (keys, ts) — the latest-ties
  * winner is the lexicographically greatest value struct, so the result is
  * deterministic regardless of arrival order (same policy as the batch
  * upsert tie-break in [[SyncJob.write]]).
  *
  * @param valueCols right columns to carry; must not collide with left
  *                  column names (alias them on the way in).
  * @param tolerance optional maximum lookback (pandas `merge_asof`
  *                  tolerance): a match further in the past than
  *                  `leftTs - rightTs <= tolerance` is nulled out. Pass an
  *                  interval literal for timestamp axes
  *                  (`expr("INTERVAL 5 MINUTES")`) or a numeric for numeric
  *                  axes. Applied AFTER the running fill — same single-
  *                  exchange plan, one extra scalar predicate.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    require(valueCols.intersect(lCols).isEmpty,
      s"valueCols ${valueCols.intersect(lCols).mkString(",")} collide with left columns")
    val reserved = Seq("_asof_rts", "_asof_ts", "_asof_rv", "_asof_lv", "_asof_side")
    require(valueCols.intersect(reserved).isEmpty,
      s"valueCols ${valueCols.intersect(reserved).mkString(",")} use reserved internal names")

    // the right ts rides inside the value struct (first field, constant per
    // group, so the max tie-break winner is unchanged) — the tolerance
    // check needs the MATCHED row's ts after the running fill
    val rDedup = right
      .groupBy((keys.map(col) :+ col(rightTs).as("_asof_ts")): _*)
      .agg(max(struct(col(rightTs).as("_asof_rts") +: valueCols.map(col): _*)).as("_asof_rv"))
    val rvType = rDedup.schema("_asof_rv").dataType

    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"),
        lit(1).as("_asof_side"),
        struct(lCols.map(col): _*).as("_asof_lv"),
        lit(null).cast(rvType).as("_asof_rv")): _*)
    val lvType = lSide.schema("_asof_lv").dataType
    val rSide = rDedup.select(
      keys.map(col) ++ Seq(
        col("_asof_ts"),
        lit(0).as("_asof_side"),
        lit(null).cast(lvType).as("_asof_lv"),
        col("_asof_rv")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lSide.unionByName(rSide)
      .withColumn("_asof_rv", last(col("_asof_rv"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => filled.withColumn("_asof_rv",
        when(col("_asof_rv").isNotNull &&
          (col("_asof_ts") - col("_asof_rv._asof_rts")) <= tol, col("_asof_rv")))
      case None => filled
    }
    bounded.select(lCols.map(c => col(s"_asof_lv.`$c`").as(c)) ++
      valueCols.map(c => col(s"_asof_rv.`$c`").as(c)): _*)
  }
}

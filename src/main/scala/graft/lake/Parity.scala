package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Table parity check — the migration-validation operator: compare two
  * keyed datasets (lake↔lake, lake↔RDBMS dump, lake↔parquet export) and
  * report, per key, whether the row exists on both sides with equal
  * payload. This operationalizes the engine's own correctness criterion —
  * "per-turn text equality under stable (conv_id, turn_idx) ordering" —
  * as a runnable check: diff the replayed lake state against the source
  * system's dump and require zero non-`equal` rows.
  *
  * The reference validates migrations by re-reading both ends and comparing
  * counts (`go-datax` jobs are typically followed by a `SELECT count(*)`
  * parity step); this is the content-complete version of that check.
  *
  * Scale shape (the 100 TB design): each side is projected to
  * `keys + xxhash64(normalized payload)` BEFORE the join, so the shuffle
  * carries ~16 bytes of payload per row regardless of row width; the
  * comparison is then one full-outer hash join on the keys — two shuffles
  * total, no window, no collect. A hash compare can in principle miss a
  * difference (64-bit collision ON THE SAME KEY — ~2⁻⁶⁴ per differing row);
  * `exact = true` ships the full normalized payload through the join and
  * compares column-wise with null-safe equality instead, for when the
  * check is the deliverable rather than a monitor.
  *
  * Column normalization: the compared payload is the name-intersection of
  * the two sides (minus `ignoreCols` and the keys), each column cast to the
  * WIDER of the two sides' types ([[LakeTable.unionSchemas]] — int↔long,
  * float↔double, decimal precision unification), compared in sorted-name
  * order so physical column order never matters. Columns present on only
  * one side are NOT compared (additive schema evolution mid-migration would
  * otherwise flag every row); pass them in `ignoreCols`-complement form by
  * selecting before the call if a one-sided column must fail the check.
  */
object Parity {

  val StatusCol = "parity_status"
  val OnlyLeft = "only_left"
  val OnlyRight = "only_right"
  val Differs = "differs"
  val Equal = "equal"

  /** Per-key diff of `left` vs `right`. Output: key columns + `parity_status`
    * (`only_left` | `only_right` | `differs` | `equal`); `equal` rows are
    * dropped unless `includeEqual` (at 100 TB the interesting output is the
    * violations, which should be ~empty — keep the result bounded).
    */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
      ignoreCols: Seq[String] = Nil, includeEqual: Boolean = false,
      exact: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "parity diff needs at least one key column")
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      keys.foreach(k => require(df.columns.contains(k),
        s"$side side is missing key column '$k' (has: ${df.columns.mkString(", ")})"))
    }
    val payload = commonPayload(left.schema, right.schema, keys, ignoreCols)

    if (exact) {
      val l = normalized(left, keys, payload).as("l")
      val r = normalized(right, keys, payload).as("r")
      val joined = l.join(r, keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _), "full_outer")
      // a key column is null-safe-joined, so a side's presence marker must be
      // a column that is never null on that side: a literal tag
      val lTag = col("l._parity_present")
      val rTag = col("r._parity_present")
      val eq =
        if (payload.isEmpty) lit(true)
        else payload.map { case (c, _) => col(s"l.$c") <=> col(s"r.$c") }.reduce(_ && _)
      val status = when(rTag.isNull, lit(OnlyLeft))
        .when(lTag.isNull, lit(OnlyRight))
        .when(eq, lit(Equal))
        .otherwise(lit(Differs))
      finish(joined, keys, status, includeEqual)
    } else {
      val l = hashed(left, keys, payload).as("l")
      val r = hashed(right, keys, payload).as("r")
      val joined = l.join(r, keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _), "full_outer")
      val status = when(col("r._parity_hash").isNull, lit(OnlyLeft))
        .when(col("l._parity_hash").isNull, lit(OnlyRight))
        .when(col("l._parity_hash") === col("r._parity_hash"), lit(Equal))
        .otherwise(lit(Differs))
      finish(joined, keys, status, includeEqual)
    }
  }

  /** Aggregate form: one row per status with its key count — the monitoring
    * shape (`equal` included, so totals reconcile against both inputs).
    */
  def summary(left: DataFrame, right: DataFrame, keys: Seq[String],
      ignoreCols: Seq[String] = Nil, exact: Boolean = false): DataFrame =
    diff(left, right, keys, ignoreCols, includeEqual = true, exact = exact)
      .groupBy(StatusCol).agg(count(lit(1)).as("n_keys"))

  /** Shared payload: name-intersection minus keys/ignores, widened types,
    * sorted by name (deterministic hash input order).
    */
  private def commonPayload(l: StructType, r: StructType, keys: Seq[String],
      ignoreCols: Seq[String]): Seq[(String, org.apache.spark.sql.types.DataType)] = {
    val excluded = (keys ++ ignoreCols).toSet
    val rNames = r.fieldNames.toSet
    val shared = l.fields.filter(f => rNames.contains(f.name) && !excluded.contains(f.name))
    // widen via the lake's own additive-evolution resolver: a one-field
    // schema per side, unified — same int→long / float→double /
    // decimal-precision rules the merge path uses
    shared.map { f =>
      val wide = LakeTable.unionSchemas(StructType(Seq(f)),
        StructType(Seq(r(f.name)))).head.dataType
      f.name -> wide
    }.sortBy(_._1).toSeq
  }

  private def normalized(df: DataFrame, keys: Seq[String],
      payload: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame = {
    val cols = keys.map(col) ++
      payload.map { case (c, t) => col(c).cast(t).as(c) } :+
      lit(true).as("_parity_present")
    df.select(cols: _*)
  }

  /** Key + one 64-bit payload hash per row. Null vs non-null must hash
    * differently and so must value-shifts across column boundaries, so the
    * hash input is a STRUCT of the normalized columns (xxhash64 folds each
    * field, including a null marker, positionally).
    */
  private def hashed(df: DataFrame, keys: Seq[String],
      payload: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame = {
    val h =
      if (payload.isEmpty) lit(0L)
      else xxhash64(struct(payload.map { case (c, t) => col(c).cast(t).as(c) }: _*))
    df.select(keys.map(col) :+ h.as("_parity_hash"): _*)
  }

  private def finish(joined: DataFrame, keys: Seq[String], status: Column,
      includeEqual: Boolean): DataFrame = {
    // surviving key value: whichever side has the row (coalesce is total —
    // at least one side matched by construction of the full outer join)
    val keyCols = keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k))
    val out = joined.select(keyCols :+ status.as(StatusCol): _*)
    if (includeEqual) out else out.filter(col(StatusCol) =!= Equal)
  }
}

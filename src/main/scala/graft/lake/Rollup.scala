package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally maintained materialized aggregate (rollup) over a lake
  * table — the downstream half of a CDC pipeline that the reference's users
  * hand-build by re-running a full GROUP BY after every sync
  * (go-datax `README_EN.md` positions postSql for exactly this; see
  * `test-data/mysql2doris.json`'s TRUNCATE+reload shape). Here the rollup is
  * refreshed from the COMMITTED change log instead: each sync recomputes
  * only the groups that actually changed since the last sync and MERGEs the
  * recomputed rows (plus deletes for groups that vanished) into a second
  * lake table.
  *
  * Watermarking reuses the replication trick ([[Replicate]]): the
  * destination's per-writer epoch lineage IS the watermark — each sync
  * merges under `epoch = source snapshot version`, so replays are skipped
  * exactly-once-style and a crashed sync resumes where it left off with no
  * side-channel state.
  *
  * Scale shape (100 TB honesty): the dirty-group set is O(changes in the
  * window) — read from the window's delta files only, never the whole log.
  * The recompute joins live state against the dirty set (left-semi; AQE
  * broadcasts it when small), so only dirty groups' rows shuffle into the
  * aggregate. The live SCAN is pruned when the source's distribution key
  * ([[LakeTable.distCols]]) is a subset of the group columns: each dirty
  * group then lives entirely in one known bucket, so the recompute reads
  * only the dirty groups' buckets — O(dirty buckets), not O(table). With
  * full-key distribution (the default layout) a group's rows spread across
  * every bucket and the scan must read the full live table once per sync;
  * at very large scale either lay the source out with
  * `distCols = groupCols`, or keep additive aggregates (count/sum) that
  * fold directly from the change window — the general non-additive case
  * (max/min/distinct under deletes and updates) REQUIRES re-reading the
  * group's live rows, which is what this does, scoped as tightly as the
  * layout allows.
  */
object Rollup {

  /** One incremental refresh of `dst` from `src`'s committed change log.
    *
    * `dst.keyCols` are the GROUP columns (they must exist in `src`'s
    * payload); `aggs` are named aggregate expressions evaluated over the
    * live rows of each dirty group (e.g. `count(lit(1)).as("n_turns")`).
    * First sync (fresh `dst`) bootstraps with one full aggregate; later
    * syncs recompute only groups with changes in `(lastSynced, head]`.
    * Groups whose live rows all vanished are deleted from the rollup.
    *
    * Returns the destination merge stats; `skipped = true` when `dst` is
    * already at the source head (or lost an epoch race to a replay).
    * Incremental windows read change deltas under the same vacuum-retention
    * contract as [[Replicate.sync]].
    *
    * `toVersion` pins the refresh to a consistent source cut (a time-travel
    * refresh): the rollup lands on the aggregate of snapshot `toVersion`
    * exactly, and the next unpinned sync continues from there. Default is
    * the current source head.
    *
    * GROUP-COLUMN MUTATION: dirty groups are read from the change window's
    * NEW row images, which alone would re-aggregate a group when a row
    * lands IN it but not when a row silently LEAVES it (an update that
    * changes a payload group column, or a delete whose tombstone carries
    * key columns only). Key-derived groups — the transcript `conv_id`
    * rollup, any key prefix — cannot leave a group without a tombstone
    * landing in it, so the new images suffice. For groups with NON-KEY
    * columns the refresh additionally reads the changed keys' PRE-IMAGES
    * at the watermark snapshot (`readVersionBuckets(since, …)`, pruned to
    * the buckets the changed keys hash to — O(changed buckets), never
    * O(table)) and unions their old group values into the dirty set, so
    * moved-out groups recompute and delete-driven vanishes land as
    * deletes. This pre-image read requires snapshot `since` to still be
    * readable: retain snapshots past the sync cadence
    * ([[LakeTable.expireSnapshots]] keep count, or [[LakeTable.tag]] the
    * watermark); an expired watermark fails sharply with the remedy named.
    * Group values may be null (null-safe group joins throughout).
    */
  def sync(src: LakeTable, dst: LakeTable, aggs: Seq[Column],
      writerId: String = "rollup",
      toVersion: Option[Long] = None): LakeTable.MergeStats = {
    require(aggs.nonEmpty, "rollup needs at least one aggregate column")
    val groupCols = dst.keyCols
    // key-derived groups can't lose a row without a tombstone landing in
    // them; non-key groups need the pre-image read (object scaladoc)
    val stableGroups = groupCols.forall(src.keyCols.contains)
    val head = toVersion.getOrElse(src.currentSnapshot().version)
    val since = dst.currentSnapshot().lastEpochFor(writerId)
    if (head <= since)
      return LakeTable.MergeStats(head, skipped = true, 0, 0, 0, 0, 0,
        dst.currentSnapshot().rows, 1.0)
    val events =
      if (since < 0L) {
        // bootstrap: one full aggregate — O(table), exactly once
        val live = toVersion.map(src.readVersion).getOrElse(src.read())
        live.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
          .withColumn("op", lit("U"))
      } else {
        val window = src.readChangesBetween(since, head)
        val dirty =
          if (stableGroups) window.select(groupCols.map(col): _*).distinct()
          else {
            // tombstone tuples are phantoms here (their payload group
            // columns are null by construction, not by value) — the
            // pre-image read below carries each deleted row's REAL old
            // group, so drop them rather than merge null-group deletes
            val dirtyNew = window.where(col(LakeTable.OpCol) =!= "D")
              .select(groupCols.map(col): _*).distinct()
            // mutating-group soundness: the changed keys' OLD group values
            // come from their pre-images at the watermark snapshot — a
            // time-travel read pruned to the buckets the keys hash to
            // (keys carry the distribution columns on every layout), so
            // the cost is O(changed buckets), never O(table)
            val changedKeys = window.select(src.keyCols.map(col): _*).distinct()
            val oldRows =
              try src.readVersionBuckets(since, src.bucketsFor(changedKeys))
              catch {
                case e: IllegalArgumentException => throw new IllegalStateException(
                  s"rollup refresh of ${dst.root}: watermark snapshot $since " +
                    s"of ${src.root} is no longer readable — groups on non-key " +
                    "columns need the previous cut's pre-images to catch rows " +
                    "that LEFT a group. Retain source snapshots past the sync " +
                    "cadence (expireSnapshots keep count, or tag the watermark " +
                    "version), or re-bootstrap the rollup into a fresh table", e)
              }
            val oldGroups = oldRows.join(changedKeys, src.keyCols, "left_semi")
              .select(groupCols.map(col): _*).distinct()
            dirtyNew.unionByName(oldGroups).distinct()
          }
        // bucket pruning: when the source's distribution key is a subset of
        // the group columns, every dirty group's live rows are confined to
        // the buckets the dirty keys hash to — scan only those (the dirty
        // set itself came from the window's delta files, so computing the
        // bucket set costs O(changes), collected bounded by numBuckets)
        val live =
          if (src.distributionCols.forall(groupCols.contains)) {
            val bs = src.bucketsFor(dirty)
            toVersion.map(v => src.readVersionBuckets(v, bs))
              .getOrElse(src.readBuckets(bs))
          } else {
            // the cost trade documented in the object scaladoc, surfaced at
            // run time: a non-aligned layout forces an O(table) live scan
            // per refresh
            val snap = src.currentSnapshot()
            org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
              s"rollup refresh of ${dst.root}: source distribution key " +
                s"(${src.distributionCols.mkString(",")}) is not a subset of " +
                s"the group columns (${groupCols.mkString(",")}), so the " +
                s"recompute scans the FULL live table (${snap.rows} rows, " +
                s"${snap.files.length} files) every sync; lay the source out " +
                s"with distributionColumns = groupCols for O(dirty-bucket) " +
                s"refreshes, or keep additive aggregates folded from the " +
                s"change window")
            toVersion.map(src.readVersion).getOrElse(src.read())
          }
        // null-safe (<=>) group joins: a payload group column may hold null
        // as a legitimate group value, which must scope the recompute (and
        // the vanish anti-join) like any other value; right sides are
        // renamed so the conditions resolve unambiguously against
        // shared-lineage plans
        def nullSafe(left: DataFrame, right: DataFrame, pfx: String,
            how: String): DataFrame = {
          val r = right.select(groupCols.map(c => col(c).as(pfx + c)): _*)
          left.join(r, groupCols.map(c => col(c) <=> col(pfx + c))
            .reduce(_ && _), how)
        }
        val agg = nullSafe(live, dirty, "__d_", "left_semi")
          .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        val gone = nullSafe(dirty, agg, "__a_", "left_anti")
        agg.withColumn("op", lit("U"))
          .unionByName(gone.withColumn("op", lit("D")), allowMissingColumns = true)
      }
    // lsn = source head version: monotone across syncs and unique per group
    // within one sync, so LWW keeps rollup rows converging even if windows
    // are replayed or applied out of order across writers
    val out = events.withColumn("lsn", lit(head))
    // the bootstrap aggregate into a still-empty destination bulk-loads
    // base files directly — one write instead of merge's delta publish +
    // immediate empty-base compaction (same trade as Replicate.sync)
    if (since < 0L && dst.currentSnapshot().files.isEmpty)
      dst.bulkLoad(out, epoch = head, writerId = writerId)
    else dst.merge(out, epoch = head, writerId = writerId)
  }

  /** The standard per-conversation rollup for the transcript model
    * ([[graft.core.Model.Turn]]): turn count, character volume, tool-call
    * count, and the latest turn timestamp. Used by the LakeMaint `rollup`
    * command; any other aggregate set goes through [[sync]] directly.
    */
  def transcriptAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_turns"),
    sum(length(col("text"))).as("n_chars"),
    count(col("tool")).as("n_tool_calls"),
    max(col("ts")).as("last_ts"))
}

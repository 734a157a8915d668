package graft.lake

import org.apache.spark.sql.Column
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
    * GROUP-COLUMN STABILITY CONTRACT: dirty groups are read from the change
    * window's NEW row images (and tombstones, which carry key columns
    * only), so a group is re-aggregated when a row lands IN it — not when a
    * row silently leaves it. Group columns must therefore be stable per key
    * (key columns or columns an update never changes): grouping by a
    * MUTATING payload column leaves the row's OLD group stale until that
    * group next changes for some other reason, and grouping by a non-key
    * payload column also misses delete-driven vanishes (a tombstone's
    * payload is null). Key-derived groups — the transcript `conv_id`
    * rollup, any key prefix — satisfy the contract by construction; a
    * non-key grouping warns at sync time.
    */
  def sync(src: LakeTable, dst: LakeTable, aggs: Seq[Column],
      writerId: String = "rollup",
      toVersion: Option[Long] = None): LakeTable.MergeStats = {
    require(aggs.nonEmpty, "rollup needs at least one aggregate column")
    val groupCols = dst.keyCols
    if (!groupCols.forall(src.keyCols.contains))
      org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
        s"rollup ${dst.root}: group columns (${groupCols.mkString(",")}) are " +
          s"not all source key columns (${src.keyCols.mkString(",")}) — the " +
          "incremental refresh is only sound if updates never CHANGE a " +
          "row's group columns and deletes are group-irrelevant; a mutating " +
          "group column leaves the old group stale (see Rollup.sync scaladoc)")
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
        val dirty = src.readChangesBetween(since, head)
          .select(groupCols.map(col): _*).distinct()
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
        val agg = live.join(dirty, groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        val gone = dirty.join(agg.select(groupCols.map(col): _*), groupCols, "left_anti")
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

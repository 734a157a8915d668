package graft.engine.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Model
import graft.lake.LakeTable

/** The north-rule flagship: tail a binlog/WAL-shaped change-event log and
  * MERGE-apply it into the snapshot-committed transcript lake table.
  *
  * Replaces go-datax's reader→bounded-channel→writer task-group model
  * (`core/task/taskgroupcontainer.go:39-239`) with Structured Streaming
  * micro-batches: the file source's `maxFilesPerTrigger` plays the role of
  * the bounded channel (backpressure), `foreachBatch`'s epoch id plays the
  * role of the idempotent load label (`starrocks_writer.go:878-892`), and
  * the checkpoint directory carries per-partition offset lineage so the job
  * resumes exactly where it stopped — a replayed epoch after restart is
  * detected by the lake's commit log and skipped (exactly-once end state).
  *
  * Scale notes: the only shuffles per micro-batch are (1) the LWW dedupe
  * window keyed by the FULL key `(conv_id, turn_idx)` — fine-grained, so a
  * hot conversation spreads over its turns rather than hot-spotting one
  * task (this is the salted-repartition: turn_idx acts as the salt within a
  * conversation, while bucket pruning on the table side stays intact because
  * dedupe never changes the key), and (2) the full-outer merge join keyed the
  * same way. Both are batch-sized, never table-sized; the table side is
  * bucket-pruned (see [[graft.lake.LakeTable]]).
  */
object CdcPipeline {

  /** passthrough column carrying the verbatim envelope line to the DLQ */
  private val RawCol = "_raw_envelope"

  /** A downstream lake table co-maintained WITH the stream: after every
    * committed ingest epoch the follower syncs from the source's change
    * log, inside the same `foreachBatch` — so follower lag is bounded by
    * one micro-batch and a periodic source vacuum can never reclaim a
    * delta window the follower still needs (syncs run before the vacuum
    * step each epoch). Exactly-once falls out of the follower machinery
    * itself: [[graft.lake.Replicate.sync]]/[[graft.lake.Rollup.sync]]
    * watermark on the DESTINATION's per-writer epoch lineage, so an epoch
    * replayed after a crash re-syncs as a no-op.
    *
    * Scale shape: each sync is O(changes in the window) for a replica and
    * O(dirty buckets) for a layout-aligned rollup — batch-sized, never
    * table-sized — but it serializes with ingest inside the micro-batch.
    * When follower freshness may lag ingest instead, run
    * [[graft.lake.Replicate.follow]] (or `lakereader` jobs on a schedule)
    * out-of-band against the same tables; the watermark semantics are
    * identical.
    */
  sealed trait Follower
  /** full-fidelity replica: `dst` converges to the source's LWW state
    * (deletes included) after every epoch
    */
  final case class ReplicaFollower(dst: LakeTable,
      writerId: String = "replication") extends Follower
  /** incrementally-maintained rollup: `dst.keyCols` are the group columns,
    * `aggs` the named aggregate expressions (see [[graft.lake.Rollup.sync]])
    */
  final case class RollupFollower(dst: LakeTable,
      aggs: Seq[org.apache.spark.sql.Column],
      writerId: String = "rollup") extends Follower
  /** additive rollup: `sums` are (name, per-row expr) pairs whose SUM is
    * maintained per group with NO live-table scan on any layout — plus an
    * implicit `n_live` row count ([[graft.lake.Rollup.syncAdditive]])
    */
  final case class AdditiveRollupFollower(dst: LakeTable,
      sums: Seq[(String, org.apache.spark.sql.Column)],
      writerId: String = "rollup") extends Follower
  /** live-database mirror co-maintained per epoch via [[JdbcApply.sync]] —
    * sound under arbitrary log reorder/duplication because the lake
    * arbitrates by `_lsn` first and the mirror ships CURRENT winners
    */
  final case class JdbcFollower(dest: JdbcDest) extends Follower
  /** outbound envelope feed maintained per epoch via [[CdcFeed.sync]]: every
    * committed ingest window is re-published as Debezium/Canal/Maxwell JSONL
    * under `dir` for downstream consumers to tail — the broker-less outbox.
    * `keyCols` are required for debezium (delete `before` images).
    */
  final case class FeedFollower(dir: String, format: String,
      keyCols: Seq[String] = Nil) extends Follower
  /** SCD Type-2 history table co-maintained per epoch via
    * [[graft.lake.Scd2.sync]]: one row per (key, epoch that touched it)
    * with `[vf_lsn, vt_lsn)` validity bounds — the audit/warehouse shape.
    * `dst` must carry the [[graft.lake.Scd2.createDst]] layout.
    */
  final case class Scd2Follower(dst: LakeTable,
      writerId: String = "scd2") extends Follower

  final case class CdcConfig(
      logDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 4,
      availableNow: Boolean = true,
      toolColumn: Boolean = true,
      /** remove snapshot-unreferenced data files every N epochs (0 = never).
        * Old-version files exist for snapshot isolation of concurrent
        * readers; a retention of a few epochs is the streaming-ingest
        * default (Iceberg's expire-snapshots analog).
        */
      vacuumEvery: Int = 0,
      /** snapshot versions whose delta files periodic vacuum keeps for
        * lagging incremental consumers (readChangesSince / Replicate)
        */
      vacuumRetainVersions: Int = 8,
      /** GC tombstones every N epochs (0 = never): rewrites only the
        * buckets holding expirable tombstones
        * ([[graft.lake.LakeTable.expireTombstones]]). Without it a
        * delete-heavy 10^10-event stream accumulates tombstone rows
        * forever — they survive compaction BY DESIGN (late re-delivered
        * older duplicates must stay shadowed), so bounding them is a
        * policy decision, not a compaction side effect.
        */
      expireTombstonesEvery: Int = 0,
      /** the re-delivery horizon: tombstones within `retainLsns` of the
        * table's max applied lsn are kept. Must exceed the source's
        * worst-case duplicate lag (how far back the log can re-send an
        * already-applied change) — an expired tombstone cannot shadow a
        * duplicate OLDER than itself arriving later.
        */
      tombstoneRetainLsns: Long = 0L,
      /** epoch-lineage scope in the lake's commit log. Distinct ids let
        * INDEPENDENT streams (own log + own checkpoint) merge into ONE
        * table without deduping each other's epochs; replays within a
        * stream stay exactly-once. Matches the writer's checkpoint — one
        * checkpoint dir, one writerId.
        */
      writerId: String = LakeTable.DefaultWriter,
      /** wire format of the tailed log: `parquet` (canonical change events),
        * or a JSONL envelope format — `debezium`, `canal`, `maxwell`
        * (decoded per-microbatch by [[graft.sources.CdcEnvelope]]; the
        * decode is a narrow map inside the scan stage, so backpressure and
        * offset lineage behave exactly as in the parquet path).
        */
      format: String = "parquet",
      /** dead-letter dir for envelope formats: malformed lines (null lsn
        * after decode) are appended here as `epoch=<n>/` text files — the
        * reference's dirty-record collection (go-datax error limiter keeps
        * dirty records + messages) — instead of being silently dropped.
        * None ⇒ drop-only policy.
        */
      dlqDir: Option[String] = None,
      /** TIME-based flush threshold for a continuous (availableNow=false)
        * tail: micro-batches fire on this interval (e.g. "300 seconds" —
        * the starrocks/doris writers' third flush dimension,
        * `starrocks_writer.go:27-31` flushInterval default 300 s, alongside
        * rows/bytes). None ⇒ Spark's as-fast-as-possible default trigger.
        */
      triggerInterval: Option[String] = None,
      /** downstream tables co-maintained per epoch (replicas / rollups);
        * see [[Follower]] for the freshness/cost trade
        */
      followers: Seq[Follower] = Nil,
      /** payload columns of the tailed change events (everything but
        * `op`/`lsn`). None ⇒ the transcript shape ([[Model.changeEventSchema]],
        * honoring [[toolColumn]]); set it to tail a log of any other table
        * shape — the `cdcreader` JSON surface exposes it as named, typed
        * `column` specs like the reference's readers.
        */
      payloadSchema: Option[org.apache.spark.sql.types.StructType] = None,
      /** single-table consumption of a MULTI-TABLE envelope stream: a real
        * binlog/WAL tail interleaves every table's changes, and decoding a
        * foreign table's envelope against this table's payload schema
        * would quietly null-fill its columns (or worse, alias same-named
        * ones) — so with a filter set (`"db.table"` or `"table"`,
        * [[graft.sources.CdcEnvelope.tableMatches]]), only matching lines
        * reach the decoder. Lines WITHOUT table metadata are kept (a
        * single-table feed synthesized without stamping stays consumable);
        * malformed lines still decode to null lsn and divert to the DLQ.
        * Envelope formats only. For N destinations out of one stream, see
        * [[startRouted]].
        */
      tableFilter: Option[String] = None,
      /** [[startRouted]] only: max routes whose merges overlap within one
        * epoch (each is an independent table/lineage; Spark runs actions
        * submitted from multiple threads concurrently). 1 = sequential.
        * Epoch latency tends to max(route) instead of sum(route) — size it
        * so the overlapped merges' shuffles fit the cluster, not at the
        * route count.
        */
      routeParallelism: Int = 1,
      /** auto-pin a snapshot TAG every N epochs (0 = never): right after
        * the epoch's merge + follower syncs, the head is tagged
        * `<tagPrefix><writerId>-<epoch>` ([[graft.lake.LakeTable.tag]];
        * writer-scoped so concurrent streams' rings and hand-made tags
        * never collide) — durable restore/reproducibility points on the
        * stream DEEPER than the vacuum window (the tag lands before the
        * same epoch's vacuum/tombstone-GC steps, so the pinned cut is
        * never the one being swept). Bounded by [[tagKeep]] — a ring of
        * pins, not a leak.
        */
      tagEvery: Int = 0,
      tagPrefix: String = "epoch-",
      /** newest auto-tags retained (same prefix, numeric suffix); older
        * ones are dropped as each new pin lands
        */
      tagKeep: Int = 8)

  /** The tailed log's full change-event schema: `op`/`lsn` + payload. */
  private def eventSchema(cfg: CdcConfig): org.apache.spark.sql.types.StructType =
    cfg.payloadSchema match {
      case Some(ps) => org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType, nullable = false) +:
        org.apache.spark.sql.types.StructField("lsn",
          org.apache.spark.sql.types.LongType, nullable = false) +: ps.fields)
      case None =>
        if (cfg.toolColumn) Model.changeEventSchema else Model.changeEventSchemaV1
    }

  /** One epoch's follower syncs — shared by the single-table tail and each
    * routed destination. Runs BEFORE the vacuum step so a reclaimed delta
    * window can never be one a follower still needs (lag stays ≤ 1 epoch).
    */
  private def syncFollowers(table: LakeTable, followers: Seq[Follower]): Unit =
    followers.foreach {
      case ReplicaFollower(dst, wid) => graft.lake.Replicate.sync(table, dst, wid)
      case RollupFollower(dst, aggs, wid) => graft.lake.Rollup.sync(table, dst, aggs, wid)
      case AdditiveRollupFollower(dst, sums, wid) =>
        graft.lake.Rollup.syncAdditive(table, dst, sums, wid)
      case JdbcFollower(dest) => JdbcApply.sync(table, dest)
      case FeedFollower(dir, format, keys) => CdcFeed.sync(table, dir, format, keys)
      case Scd2Follower(dst, wid) => graft.lake.Scd2.sync(table, dst, wid)
    }

  /** The [[CdcConfig.tagEvery]] cadence: pin `<tagPrefix><writerId>-<epoch>`
    * on the head, then drop ring tags beyond the newest [[CdcConfig.tagKeep]].
    * The ring is namespaced by WRITER (`<prefix><writerId>-<number>` exactly),
    * so the prune can never drop another stream's pins or a hand-made tag
    * that shares the prefix — tag names are a shared global namespace on
    * the table, and a stateless prune that pattern-matched the bare prefix
    * would reclaim files other owners still rely on.
    *
    * Tagging is gated on the epoch's merge having APPLIED: a lineage-skipped
    * replay (lost checkpoint re-reading the log from batch 0) must NOT
    * re-point historic pins at the caught-up head — that would silently
    * move every restore point to the same state and expose the formerly
    * pinned files to the very vacuum cadence the ring rides with. The one
    * skipped shape that does re-tag is `lastEpochFor(writerId) == epoch`
    * (a crash between the merge commit and the checkpoint): the head IS
    * this epoch's state, so the re-point is the idempotent completion of
    * the interrupted cadence step.
    */
  private def autoTag(table: LakeTable, cfg: CdcConfig, writerId: String,
      epoch: Long, merged: LakeTable.MergeStats): Unit =
    if (cfg.tagEvery > 0 && epoch > 0 && epoch % cfg.tagEvery == 0 &&
        (!merged.skipped ||
          table.currentSnapshot().lastEpochFor(writerId) == epoch)) {
      val ring = s"${cfg.tagPrefix}$writerId-"
      table.tag(s"$ring$epoch", replace = true)
      table.tags().keys
        .filter(_.startsWith(ring))
        .flatMap(n => scala.util.Try(n.stripPrefix(ring).toLong)
          .toOption.map(e => (n, e)))
        .toSeq.sortBy(-_._2).drop(math.max(1, cfg.tagKeep))
        .foreach { case (n, _) => table.dropTag(n) }
    }

  /** [[CdcConfig.tagEvery]] plan-time guard: every ring-tag name component
    * must satisfy [[graft.lake.LakeTable.tag]]'s name rule NOW — inside
    * foreachBatch the same require would fail the cadence epoch and the
    * deterministic failure would replay forever.
    */
  private def validateRing(cfg: CdcConfig, writerIds: Seq[String]): Unit =
    if (cfg.tagEvery > 0) (cfg.tagPrefix +: writerIds).foreach { s =>
      require(s.forall(c =>
          c.toInt < 128 && (c.isLetterOrDigit || c == '.' || c == '_' || c == '-')),
        s"auto-tag ring: '$s' must be [A-Za-z0-9._-]* — tagPrefix and " +
          "writerId become part of tag ref file names")
    }

  /** Start the streaming MERGE; caller awaits termination. */
  def start(spark: SparkSession, table: LakeTable, cfg: CdcConfig): StreamingQuery = {
    validateRing(cfg, Seq(cfg.writerId))
    startWith(spark, cfg, table.keyCols) { (batch, epoch) =>
      val merged = table.merge(batch, epoch, cfg.writerId)
      syncFollowers(table, cfg.followers)
      autoTag(table, cfg, cfg.writerId, epoch, merged)
      // tombstone GC runs BEFORE vacuum so the rewrite's orphaned inputs
      // are reclaimed in the same epoch's sweep. A commit conflict (another
      // writerId's stream won the version) must not kill THIS stream —
      // expireTombstones has no rebase (by design: a maintenance rewrite
      // of a stale file list), so skip and let the next cadence retry.
      if (cfg.expireTombstonesEvery > 0 && epoch > 0 &&
          epoch % cfg.expireTombstonesEvery == 0) {
        val maxLsn = table.currentSnapshot().maxLsn
        if (maxLsn >= 0)
          try table.expireTombstones(maxLsn - cfg.tombstoneRetainLsns)
          catch {
            case e: LakeTable.CommitConflictException =>
              org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
                s"tombstone GC at epoch $epoch lost a commit race " +
                  s"(${e.getMessage}); retrying at the next cadence")
          }
      }
      if (cfg.vacuumEvery > 0 && epoch > 0 && epoch % cfg.vacuumEvery == 0)
        table.vacuum(cfg.vacuumRetainVersions)
    }
  }

  /** One envelope format's decode: raw JSON-line column `value` →
    * canonical (op, lsn, payload...) + passthrough. Canal/maxwell get the
    * destination's key columns so key-changing updates fan out into
    * tombstone+upsert (debezium emits the pair natively).
    */
  private def decodeEnvelope(format: String, df: org.apache.spark.sql.DataFrame,
      payloadSchema: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String], passthrough: Seq[String]): org.apache.spark.sql.DataFrame =
    format match {
      case "debezium" =>
        graft.sources.CdcEnvelope.debezium(df, "value", payloadSchema, passthrough)
      case "canal" =>
        graft.sources.CdcEnvelope.canal(df, "value", payloadSchema,
          passthrough = passthrough, keyCols = keyCols)
      case "maxwell" =>
        graft.sources.CdcEnvelope.maxwell(df, "value", payloadSchema, passthrough,
          keyCols = keyCols)
      case other => throw new IllegalArgumentException(
        s"not an envelope format: '$other' (debezium|canal|maxwell)")
    }

  /** Shared streaming harness: build the tail source (per [[CdcConfig.format]]),
    * divert malformed envelope lines to the DLQ, and hand each cleaned
    * micro-batch to `apply` — the lake MERGE for [[start]], the live-database
    * apply for [[startJdbc]]. `keyCols` feed the canal/maxwell decoders'
    * key-changing-update fan-out.
    */
  private def startWith(spark: SparkSession, cfg: CdcConfig, keyCols: Seq[String])(
      apply: (org.apache.spark.sql.DataFrame, Long) => Unit): StreamingQuery = {
    // fixed unified schema: chunks written before `tool` existed are
    // null-filled by the parquet reader (additive evolution on the source
    // side; the lake handles it on the sink side too for batch callers)
    val schema = eventSchema(cfg)
    val payloadSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(f => f.name == "op" || f.name == "lsn"))
    require(cfg.tableFilter.isEmpty || cfg.format != "parquet",
      "tableFilter reads envelope table metadata — parquet change logs " +
        "carry none (tail one log per table instead)")
    val src = cfg.format match {
      case "parquet" =>
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
          .parquet(cfg.logDir)
      case env @ ("debezium" | "canal" | "maxwell") =>
        // envelope tail: each line is one JSON envelope; keep it an opaque
        // string at the source and decode with an explicit schema so a
        // malformed line nulls out instead of poisoning schema inference
        val raw = spark.readStream
          .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
          .text(cfg.logDir)
        // multi-table stream, single-table consumer: drop OTHER tables'
        // well-formed envelopes before the decode (they are valid changes,
        // not dirty records — never DLQ'd); metadata-less and malformed
        // lines pass through so compat and the DLQ policy are unchanged
        val scoped = cfg.tableFilter match {
          case Some(ref) =>
            val (_, tbl) = graft.sources.CdcEnvelope.tableRefs(env, col("value"))
            raw.filter(
              graft.sources.CdcEnvelope.tableMatches(env, col("value"), ref) ||
                tbl.isNull)
          case None => raw
        }
        // with a DLQ configured, the raw line rides along so the dirty
        // record lands in the dead-letter dir VERBATIM (reference semantics:
        // dirty records are collected, not reconstructed). The passthrough
        // column is renamed up front — a payload schema may legitimately
        // contain a column named `value` (the text source's default name)
        val keep = if (cfg.dlqDir.isDefined) Seq(RawCol) else Nil
        val src0 = if (cfg.dlqDir.isDefined) scoped.withColumn(RawCol, col("value")) else scoped
        decodeEnvelope(env, src0, payloadSchema, keyCols, keep)
      case other => throw new IllegalArgumentException(
        s"unsupported CDC log format '$other' (parquet|debezium|canal|maxwell)")
    }
    val isEnvelope = cfg.format != "parquet"

    val dbg = sys.env.contains("GRAFT_MERGE_DEBUG")
    val writer = src.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch0: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val t0 = System.nanoTime()
        if (dbg) System.err.println(f"[cdc] epoch $epoch enter wall=${System.currentTimeMillis()}")
        // corrupt-line policy for envelope formats: a malformed JSON line
        // decodes to null lsn (from_json PERMISSIVE); it is diverted to the
        // dead-letter dir (if configured) and NEVER reaches the LWW merge —
        // the reference's error-limiter dirty-record semantics for a tail,
        // where a bad record is collected away rather than failing the job
        cfg.dlqDir match {
          case Some(dlq) if isEnvelope =>
            val b = batch0.persist()
            // unpersist even when the apply throws (a failed epoch replays;
            // the leaked cache would otherwise accumulate per retry)
            try {
              val dirty = b.filter(col("lsn").isNull).select(RawCol)
              // overwrite => idempotent on epoch replay (no duplicate dirty
              // rows); skipped entirely on a clean batch (no empty dirs, no
              // extra write job in the epoch's critical path)
              if (!dirty.isEmpty)
                dirty.write.mode("overwrite").text(s"$dlq/epoch=$epoch")
              apply(b.filter(col("lsn").isNotNull).drop(RawCol), epoch)
            } finally { b.unpersist(); () }
          case _ if isEnvelope => apply(batch0.filter(col("lsn").isNotNull), epoch)
          case _ => apply(batch0, epoch)
        }
        if (dbg) System.err.println(
          f"[cdc] epoch $epoch exit wall=${System.currentTimeMillis()} took=${(System.nanoTime() - t0) / 1e9}%.2f s")
        ()
      }
    ((cfg.availableNow, cfg.triggerInterval) match {
      case (true, _) => writer.trigger(Trigger.AvailableNow())
      case (false, Some(interval)) => writer.trigger(Trigger.ProcessingTime(interval))
      case (false, None) => writer
    }).start()
  }

  /** Run the full replay to completion (AvailableNow) and return the number
    * of committed epochs.
    */
  def replayAll(spark: SparkSession, table: LakeTable, cfg: CdcConfig): Long = {
    val q = start(spark, table, cfg.copy(availableNow = true))
    q.awaitTermination()
    table.currentSnapshot().lastEpochFor(cfg.writerId) + 1
  }

  /** One destination of a routed (multi-table) tail: envelopes whose table
    * metadata matches `table` ("db.table" or bare "table",
    * [[graft.sources.CdcEnvelope.tableMatches]]) decode against
    * `payloadSchema` and MERGE into `dest`.
    */
  final case class Route(table: String, dest: LakeTable,
      payloadSchema: org.apache.spark.sql.types.StructType,
      writerId: String = LakeTable.DefaultWriter,
      /** downstream tables co-maintained per epoch for THIS destination —
        * replicas / rollups / mirrors / feeds / SCD2, the same machinery
        * as a single-table tail's [[CdcConfig.followers]]
        */
      followers: Seq[Follower] = Nil)

  /** DEMULTIPLEX one multi-table envelope tail into N lake tables — the
    * shape a real binlog/WAL subscription has (Canal and Maxwell publish
    * one stream per INSTANCE; Debezium Server's single-topic mode likewise),
    * where every table's changes arrive interleaved in one total order.
    *
    * Per micro-batch: the raw lines are staged once (persist), the table
    * name is extracted per line with a native JSON-path expression (no full
    * decode), and each route filters its own lines and decodes them against
    * its OWN payload schema before the ordinary [[LakeTable.merge]]. Lines
    * with no parseable table metadata land in the DLQ (a routed stream
    * REQUIRES table stamps — nothing else says which schema applies); lines
    * of tables no route claims are skipped (valid changes for tables this
    * consumer doesn't maintain — the Debezium `table.include.list` analog).
    *
    * EXACTLY-ONCE per destination falls out of the same epoch-lineage
    * contract as everything else: each route's merge commits under its
    * destination's `(writerId, epoch)` lineage, so a crash BETWEEN routes
    * replays the epoch and the already-committed destinations skip it —
    * no cross-table transaction is needed because each table's end state
    * is independently idempotent. Destinations therefore must be DISTINCT
    * tables (or distinct writerIds on a shared table).
    *
    * Scale shape: R routes cost R narrow filter+decode passes over the
    * PERSISTED micro-batch (one storage read total) plus R batch-sized
    * merges; nothing is table-sized. The routes' merges run sequentially
    * inside the epoch — at very large R, split the subscription into
    * several routed streams (own checkpoint each) rather than one giant
    * route list.
    */
  def startRouted(spark: SparkSession, cfg: CdcConfig,
      routes: Seq[Route]): StreamingQuery = {
    require(routes.nonEmpty, "routed tail needs at least one route")
    validateRing(cfg, routes.map(_.writerId))
    require(cfg.format != "parquet",
      "routing reads envelope table metadata — parquet change logs carry " +
        "none (tail one log per table instead)")
    // ambiguity guard: two routes may not claim the same envelopes. Exact
    // duplicates aside, a BARE route ("orders") matches its table under ANY
    // database, so it overlaps every qualified route of that table
    // ("shop.orders") — reject the mix rather than double-apply changes.
    val byPart = routes.groupBy(r => graft.sources.CdcEnvelope.refTablePart(r.table))
    val overlap = byPart.collect {
      case (t, rs) if rs.size > 1 &&
        (rs.map(_.table).distinct.size < rs.size || rs.exists(!_.table.contains('.'))) => t
    }
    require(overlap.isEmpty,
      s"overlapping route table(s) on ${overlap.mkString(", ")} — a bare " +
        "table name matches any database, so it cannot coexist with " +
        "another route of the same table (qualify both as db.table), and " +
        "one destination per table (a second consumer is its own stream)")
    val destDup = routes.groupBy(r => (r.dest.root, r.writerId))
      .collect { case (k, rs) if rs.size > 1 => k }
    require(destDup.isEmpty,
      s"routes share a (destination, writerId) lineage: ${destDup.mkString(", ")} — " +
        "two routes merging into one table need distinct writerIds")

    val raw = spark.readStream
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .text(cfg.logDir)
    // one pool for the stream's lifetime (NOT per micro-batch — a
    // continuous tail would churn threads every epoch); daemon threads so
    // an abandoned query never blocks JVM exit
    lazy val routePool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(cfg.routeParallelism, routes.size),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-route-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    val writer = raw.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch0: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val (db, tbl) = graft.sources.CdcEnvelope.tableRefs(cfg.format, col("value"))
        val batch = batch0.select(col("value"), db.as("_db"), tbl.as("_tbl")).persist()
        try {
          // no table metadata ⇒ unroutable ⇒ dirty record (overwrite keeps
          // epoch replays idempotent, as in the single-table DLQ path)
          cfg.dlqDir.foreach { dlq =>
            batch.filter(col("_tbl").isNull).select("value")
              .write.mode("overwrite").text(s"$dlq/epoch=$epoch")
          }
          def applyOne(r: Route): Unit = {
            val mine = graft.sources.CdcEnvelope.refMatches(
              r.table, col("_db"), col("_tbl"))
            val lines = batch.filter(mine).select("value")
            // a tabled line whose BODY fails to decode (missing lsn,
            // truncate/DDL envelope) is a dirty record for ITS route —
            // same policy as the single-table tail's null-lsn diversion.
            // The decoded frame is staged once (persist) so the DLQ scan
            // and the merge share one from_json pass; the dirty COUNT
            // rides the merge's own write job via `observe` (zero probe
            // jobs — the earlier per-route `isEmpty` ran one extra job per
            // route per epoch), and the DLQ write job runs only when the
            // count says there IS a dirty line. A crash between the merge
            // commit and the dirty write can drop that epoch's dirty
            // records on replay (the merge skips by lineage, so the count
            // is not re-observed) — acceptable for the diagnostic channel;
            // the data path stays exactly-once either way.
            val merged = cfg.dlqDir match {
              case Some(dlq) =>
                val d = decodeEnvelope(cfg.format,
                    lines.withColumn(RawCol, col("value")),
                    r.payloadSchema, r.dest.keyCols, passthrough = Seq(RawCol))
                  .persist()
                try {
                  val obs = org.apache.spark.sql.Observation()
                  val st = r.dest.merge(
                    d.observe(obs, org.apache.spark.sql.functions.sum(
                        org.apache.spark.sql.functions.when(col("lsn").isNull, 1L)
                          .otherwise(0L)).as("dirtyIn"))
                      .filter(col("lsn").isNotNull).drop(RawCol),
                    epoch, r.writerId)
                  // an EMPTY metrics map means the write ran ZERO tasks (an
                  // epoch with no valid row for this route — either quiet,
                  // or fully poisoned): the count proves nothing then, so
                  // only that rare case pays the old probe-then-write pair.
                  // Replays (skipped) wrote their DLQ in the original
                  // application of the epoch.
                  val nDirty: Option[Long] =
                    if (st.skipped) Some(0L)
                    else {
                      val m = obs.get
                      if (m.isEmpty) None
                      else Some(m.get("dirtyIn") match {
                        case Some(n: java.lang.Number) => n.longValue
                        case _ => 0L
                      })
                    }
                  lazy val dirtyRows = d.filter(col("lsn").isNull).select(RawCol)
                  if (nDirty.exists(_ > 0) || (nDirty.isEmpty && !dirtyRows.isEmpty))
                    dirtyRows.write.mode("overwrite").text(s"$dlq/epoch=$epoch-${r.table}")
                  st
                } finally { d.unpersist(); () }
              case None =>
                r.dest.merge(
                  decodeEnvelope(cfg.format, lines, r.payloadSchema,
                    r.dest.keyCols, passthrough = Nil)
                    .filter(col("lsn").isNotNull),
                  epoch, r.writerId)
            }
            syncFollowers(r.dest, r.followers)
            autoTag(r.dest, cfg, r.writerId, epoch, merged)
            // per-destination maintenance rides the stream exactly as on a
            // single-table tail — same cadence/horizon policy for every
            // route (tables under one subscription share a source, so one
            // re-delivery horizon is the honest shape)
            if (cfg.expireTombstonesEvery > 0 && epoch > 0 &&
                epoch % cfg.expireTombstonesEvery == 0) {
              val maxLsn = r.dest.currentSnapshot().maxLsn
              if (maxLsn >= 0)
                try r.dest.expireTombstones(maxLsn - cfg.tombstoneRetainLsns)
                catch {
                  case e: LakeTable.CommitConflictException =>
                    org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
                      s"route ${r.table}: tombstone GC at epoch $epoch lost a " +
                        s"commit race (${e.getMessage}); retrying at the next cadence")
                }
            }
            if (cfg.vacuumEvery > 0 && epoch > 0 && epoch % cfg.vacuumEvery == 0)
              r.dest.vacuum(cfg.vacuumRetainVersions)
          }
          // the routes' merges are INDEPENDENT (distinct tables / lineages),
          // so they may overlap: with routeParallelism > 1 they run on a
          // bounded pool and epoch latency approaches max(route) instead of
          // sum(route) — Spark schedules concurrent actions from multiple
          // threads. Any route's failure fails the epoch (it replays; the
          // committed routes skip by lineage), preserving exactly-once.
          if (cfg.routeParallelism <= 1 || routes.size == 1) routes.foreach(applyOne)
          else {
            val ec = scala.concurrent.ExecutionContext.fromExecutor(routePool)
            val fs = routes.map(r => scala.concurrent.Future(applyOne(r))(ec))
            // await EVERY route before leaving the epoch — fail-fast
            // (Future.sequence) would let in-flight stragglers outlive a
            // failed epoch and race the restarted stream's replay of the
            // same (table, writerId, epoch); only after all settle is the
            // FIRST failure surfaced (it fails the epoch, which replays;
            // committed routes skip by lineage)
            fs.foreach(f => scala.concurrent.Await.ready(f,
              scala.concurrent.duration.Duration.Inf))
            fs.foreach(f => f.value.get.get)
          }
        } finally { batch.unpersist(); () }
      }
    ((cfg.availableNow, cfg.triggerInterval) match {
      case (true, _) => writer.trigger(Trigger.AvailableNow())
      case (false, Some(interval)) => writer.trigger(Trigger.ProcessingTime(interval))
      case (false, None) => writer
    }).start()
  }

  /** Run a routed replay to completion (AvailableNow). */
  def replayAllRouted(spark: SparkSession, cfg: CdcConfig,
      routes: Seq[Route]): Unit = {
    startRouted(spark, cfg.copy(availableNow = true), routes).awaitTermination()
  }

  /** Initial-snapshot ONBOARDING (the Debezium snapshot-mode analog; the
    * reference's closest shape is a full-table batch job followed by
    * re-running it with a `where` watermark): seed the lake table with a
    * consistent full snapshot of the source, stamped `snapshotLsn`, as ONE
    * idempotent merge epoch under its own writer lineage — then start the
    * tail ([[start]]) as usual. This is how an EXISTING 100 TB table moves
    * onto the CDC pipeline: a massively parallel bulk read (the JSON
    * surface routes it through the same split machinery as any batch job,
    * splitPk range probe included) instead of replaying years of log.
    *
    * CONVERGENCE CONTRACT (why bootstrap + tail equals a full replay):
    *  - `snapshot` must be transactionally consistent at `snapshotLsn` L₀:
    *    it reflects exactly the changes with lsn ≤ L₀ (live rows only — a
    *    snapshot has no tombstones).
    *  - the tailed log must be a CONTIGUOUS tail of the change stream
    *    reaching back at least to L₀ (its first retained lsn s ≤ L₀ + 1)
    *    — i.e. no change after L₀ is missing. OVERLAP IS SAFE, any s:
    *    (a) a key the snapshot holds carries lsn L₀, outranking every
    *        overlapped change of that key (all ≤ L₀) by LWW; a tie AT L₀
    *        is payload-identical by the consistency premise (the snapshot
    *        row IS that change's after-image), so either winner reads the
    *        same;
    *    (b) a key the snapshot omits was deleted at some d ≤ L₀; an
    *        overlapped insert of that key has lsn i < d, and a contiguous
    *        window that retains lsn i retains every later lsn, so the
    *        delete d is in the window too and its tombstone outranks the
    *        insert — a truncated-START tail can never resurrect a deleted
    *        key (truncation only ever removes a PREFIX; the dangerous
    *        shape, insert retained but its later delete dropped, would
    *        need a hole in the middle).
    *  - the bootstrap epoch commits under `writerId`'s OWN lineage
    *    (epoch 0), so a crashed onboarding re-run skips the load
    *    (exactly-once) and never dedupes against the tail's epochs.
    *
    * `snapshot` carries payload columns only (no `op`/`lsn` — they are
    * stamped here). Returns the merge stats; `skipped = true` means the
    * bootstrap had already committed.
    *
    * WRITE PATH: on an empty table the load goes through
    * [[graft.lake.LakeTable.bulkLoad]] — ONE clustered base-file publish,
    * instead of merge's delta publish + the immediate full compaction the
    * ratio rule triggers on empty-base buckets (2× the write I/O of a
    * 100 TB onboarding, saved). A table that already holds rows falls back
    * to an ordinary [[graft.lake.LakeTable.merge]], whose MOR read
    * arbitrates the snapshot against stored state.
    */
  def bootstrap(table: LakeTable, snapshot: org.apache.spark.sql.DataFrame,
      snapshotLsn: Long, writerId: String = "bootstrap"): LakeTable.MergeStats = {
    require(!snapshot.columns.contains("op") && !snapshot.columns.contains("lsn"),
      "bootstrap snapshot must carry payload columns only — op/lsn are " +
        "stamped by the onboarding (op=I, lsn=snapshotLsn)")
    val evs = snapshot
      .withColumn("op", org.apache.spark.sql.functions.lit("I"))
      .withColumn("lsn", org.apache.spark.sql.functions.lit(snapshotLsn))
    if (table.currentSnapshot().files.isEmpty) table.bulkLoad(evs, epoch = 0L, writerId)
    else table.merge(evs, epoch = 0L, writerId)
  }

  /** A LIVE DATABASE as the streaming destination — the reference's flagship
    * `mysql2mysql` incremental-sync shape (it approximates it by re-running a
    * batch job with a `where` watermark; graft tails the change log and
    * MERGE-applies). `keyCols` are the target's conflict columns: each
    * micro-batch is LWW-deduped on them (`lsn` desc) and applied as
    * key-ranged DELETEs (tombstones) plus upserts — the dialect's native
    * conflict form where one exists ([[graft.engine.Dialect.nativeUpsert]]),
    * a delete-then-insert pair inside the same transaction everywhere else.
    *
    * Exactly-once contract: epochs are recorded in `ledgerTable`
    * (`(writer_id, epoch)` PK) on the TARGET database after each applied
    * batch — a replayed epoch (restart with a rebuilt checkpoint) is skipped
    * whole. A crash BETWEEN the data apply and the ledger insert re-applies
    * that one epoch, which converges to the same end state because the
    * deduped apply is idempotent per key (same deletes, same upserted
    * values) — the exactly-once END-STATE guarantee, same as the lake's
    * epoch lineage. Cross-epoch lsn regressions (a LATER epoch delivering an
    * OLDER lsn for a key) apply in arrival order, exactly like the
    * reference's upsert writers; logs that can reorder across epochs should
    * land in a lake table (lsn-arbitrated) and fan out via followers.
    */
  final case class JdbcDest(
      dialect: graft.engine.Dialect,
      url: String,
      table: String,
      /** target column list (positional against the payload columns);
        * empty ⇒ the payload column names in payload order
        */
      columns: Seq[String] = Nil,
      /** conflict/key columns (target names). Resolved by the caller —
        * config `onConflictColumn` or [[graft.engine.JdbcExec.primaryKeys]].
        */
      keyCols: Seq[String] = Nil,
      batchSize: Int = 0,
      session: Seq[String] = Nil,
      props: Map[String, String] = Map.empty,
      writerId: String = "cdc",
      ledgerTable: String = "graft_cdc_epochs")

  /** Live handles on a [[startJdbc]] stream: the query plus driver-side
    * apply counters (upserted rows, delete statements, ledger-skipped
    * epochs).
    */
  final case class JdbcStream(query: StreamingQuery,
      upserts: java.util.concurrent.atomic.AtomicLong,
      deletes: java.util.concurrent.atomic.AtomicLong,
      skippedEpochs: java.util.concurrent.atomic.AtomicLong)

  /** Start the streaming apply into a live JDBC target; see [[JdbcDest]]. */
  def startJdbc(spark: SparkSession, cfg: CdcConfig, dest: JdbcDest): JdbcStream = {
    require(dest.keyCols.nonEmpty,
      "JdbcDest.keyCols must be resolved (onConflictColumn or target PK metadata) " +
        "— the CDC apply dedupes and deletes by key")
    val upserts = new java.util.concurrent.atomic.AtomicLong()
    val deletes = new java.util.concurrent.atomic.AtomicLong()
    val skipped = new java.util.concurrent.atomic.AtomicLong()
    // dest.keyCols name TARGET columns; the stream's rows carry PAYLOAD
    // names — map through the positional column list (applyChanges binds the
    // same way) so dedupe and the decoders' key fan-out see payload names
    val payloadNames = eventSchema(cfg).fieldNames
      .filterNot(n => n == "op" || n == "lsn").toSeq
    val targetCols =
      if (dest.columns.isEmpty || dest.columns == Seq("*")) payloadNames
      else dest.columns
    val payloadKeys = dest.keyCols.map { k =>
      val i = targetCols.indexOf(k)
      require(i >= 0 && i < payloadNames.length,
        s"key column '$k' is not among the target columns (${targetCols.mkString(", ")})")
      payloadNames(i)
    }
    graft.engine.JdbcExec.ensureLedger(dest.url, dest.props, dest.ledgerTable)
    val q = startWith(spark, cfg, payloadKeys) { (batch, epoch) =>
      if (graft.engine.JdbcExec.epochApplied(dest.url, dest.props,
          dest.ledgerTable, dest.writerId, epoch)) {
        skipped.incrementAndGet()
      } else {
        // per-epoch LWW dedupe on the key — one final image per key reaches
        // the target, mirroring the lake merge's epoch dedupe (ties require
        // unique lsns per key within an epoch, the log contract everywhere)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(payloadKeys.map(col): _*).orderBy(col("lsn").desc)
        val winners = batch
          .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        val (up, del) = graft.engine.JdbcExec.applyChanges(winners, dest.dialect,
          dest.url, dest.table, dest.columns, dest.keyCols,
          batchSize = dest.batchSize, session = dest.session, props = dest.props)
        upserts.addAndGet(up)
        deletes.addAndGet(del)
        // recorded AFTER the apply: a crash in between replays the epoch,
        // which is idempotent (see the exactly-once contract above)
        graft.engine.JdbcExec.recordEpoch(dest.url, dest.props,
          dest.ledgerTable, dest.writerId, epoch)
      }
    }
    JdbcStream(q, upserts, deletes, skipped)
  }
}

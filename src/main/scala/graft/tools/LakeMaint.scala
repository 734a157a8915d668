package graft.tools

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable

/** Lake-table maintenance CLI — the ops surface of the snapshot table
  * (Iceberg's maintenance procedures analog: rewrite_data_files,
  * expire_snapshots, table history/metrics inspection).
  *
  * Usage: LakeMaint <tableRoot> <cmd> [args]
  *   history                    — print the snapshot history
  *   metrics                    — print the per-epoch ingest metrics table
  *   state [count]              — print current version/files summary.
  *                                 `physicalRows` is the manifest stat
  *                                 (includes tombstones and superseded MOR
  *                                 delta rows — a metadata read, no scan);
  *                                 `state count` adds the live row count
  *                                 (one merged-read scan)
  *   compact                    — fold ALL delta files into base files
  *   cluster <c1,c2|none>       — retrofit sort-order clustering: rewrite
  *                                 every bucket re-sorted by the given
  *                                 payload columns (`none` reverts to key
  *                                 order) and record the layout in the
  *                                 manifest — ts-window scans then file-skip
  *                                 (Iceberg rewrite_data_files with a new
  *                                 sort-order analog; needs a targetFileRows
  *                                 layout)
  *   cluster zorder:<c1,c2>     — multi-dimensional variant
  *                                 ([[LakeTable.reclusterZOrder]], the Delta
  *                                 OPTIMIZE ZORDER analog): rewrite sorted
  *                                 by the Morton interleave of 2–4 columns
  *                                 so windows on ANY of them file-skip;
  *                                 NON-STICKY (manifest sortCols untouched —
  *                                 re-run after heavy ingest)
  *   expire <horizonLsn>        — GC tombstones older than the lsn horizon
  *   vacuum [retainVersions]    — delete unreferenced data files
  *   tag <name> [version] [replace]
  *                              — pin a committed version under a stable
  *                                 name (Iceberg tag analog): the pinned
  *                                 manifest survives expiresnapshots and
  *                                 its data files survive vacuum, so the
  *                                 exact tagged state (a training-corpus
  *                                 cut, an audit baseline) stays readable
  *                                 forever; default version = current head
  *   tags                       — list tags (name -> version)
  *   droptag <name>             — unpin: the version rejoins the normal
  *                                 retention window on the next vacuum
  *   readtag <name> [limit]     — print the tagged state (readVersion
  *                                 pinned by name)
  *   asof <ts> [limit]          — print the state as of a wall-clock commit
  *                                 time ('yyyy-MM-ddTHH:mm:ss', T-separated
  *                                 so it survives arg splitting — the
  *                                 TIMESTAMP AS OF analog, readAsOf)
  *   where <pred> [limit]       — pruned predicate scan (readWhere): prints
  *                                 how many files the manifest's key-column
  *                                 bounds skipped, then the matching rows
  *                                 (default 20)
  *   delete <sqlPredicate>      — tombstone all rows matching the SQL
  *                                 predicate (GDPR erasure / retention)
  *   set <pred> <col> <expr>    — rewrite one column for matching rows
  *                                 (in-place redaction / backfill)
  *   rollback <version>         — move the head back to a snapshot (new
  *                                 commit; history stays readable)
  *   rebucket <dstRoot> <n>     — rewrite into a NEW table with n buckets
  *                                 (epoch lineage + maxLsn carried, so the
  *                                 same stream resumes against the copy)
  *   export <fmt> <dst> [since] — write the committed change window since
  *                                 snapshot `since` (default: full history)
  *                                 as debezium|canal|maxwell JSONL — feeds
  *                                 any external binlog-envelope consumer
  *   feed <fmt> <dir> [upto]    — incrementally MAINTAIN an envelope feed:
  *                                 ships exactly the commits since the feed
  *                                 directory's own watermark on every run
  *                                 ([[graft.engine.cdc.CdcFeed]] — the
  *                                 cron-able broker-less outbox; `export`
  *                                 is the one-shot form); with `upto`,
  *                                 expires consumed windows afterwards
  *   rollup <dstRoot> [group]   — incrementally refresh a per-group
  *                                 aggregate table (turns/chars/tool calls/
  *                                 last ts; default group conv_id) from the
  *                                 committed change log — only groups
  *                                 changed since the last refresh recompute
  *   rollupadd <dstRoot> [group] — additive variant (turns/chars/tool
  *                                 calls as SUMs + n_live): state-diff
  *                                 deltas, NO live scan on any layout
  *                                 ([[graft.lake.Rollup.syncAdditive]])
  *   scd2 <dstRoot>             — incrementally extend an SCD Type-2
  *                                 history table ([[graft.lake.Scd2]]): one
  *                                 row per (key, commit that touched it)
  *                                 with [vf_lsn, vt_lsn) validity bounds;
  *                                 re-running appends only commits since the
  *                                 last run
  *   stateat <lsn> [limit]      — (on an scd2 HISTORY table) print the
  *                                 source state as of a source lsn,
  *                                 reconstructed from validity intervals
  *                                 alone ([[graft.lake.Scd2.stateAt]] — no
  *                                 retained snapshots needed)
  *   mirror <jdbcUrl> <table> <dialect> [k1,k2]
  *                              — incremental catch-up of a LIVE database
  *                                 mirror ([[graft.engine.cdc.JdbcApply]]):
  *                                 ships the table's CURRENT winners for
  *                                 keys changed since the target-side epoch
  *                                 ledger watermark (sound under log
  *                                 reorder); keys from the arg or the
  *                                 target's PK metadata
  *   parity <other> [exact]     — content-complete migration validation
  *                                 ([[graft.lake.Parity]]): diff this
  *                                 table's resolved state against `other`
  *                                 (another lake root, or any
  *                                 Spark-readable parquet path) on the key
  *                                 columns. Prints the per-status summary
  *                                 and up to 20 violating keys; exit 2 when
  *                                 any key is not `equal`. Default compares
  *                                 via per-row payload hashes (the 100 TB
  *                                 shape); `exact` ships full payloads
  *   tail <dstRoot>             — apply the committed change log to another
  *                                 lake table (manifest-driven catch-up;
  *                                 the watermark is the destination's
  *                                 per-writer epoch lineage, so reruns
  *                                 resume where they left off and rollback/
  *                                 orphan phantoms are never applied)
  *
  * The table's key columns and bucket count are read from the MANIFEST
  * (every commit records the layout), so the CLI works on any graft lake
  * table regardless of how it was created; a handle with a mismatched
  * layout is rejected by the table itself.
  */
object LakeMaint {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LakeMaint <tableRoot> <cmd> [args]")
    val root = args(0)
    val cmd = args(1)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-lake-maint")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = LakeTable.open(spark, root)
    cmd match {
      case "history" => table.history().show(100, truncate = false)
      case "metrics" => table.metrics().show(100, truncate = false)
      case "state" =>
        val s = table.currentSnapshot()
        val live = if (args.length >= 3 && args(2) == "count")
          s" liveRows=${table.read().count()}" else ""
        println(s"version=${s.version} physicalRows=${s.rows} " +
          s"baseFiles=${s.files.count(_.kind == "b")} " +
          s"deltaFiles=${s.files.count(_.kind == "d")} " +
          s"writers=${s.epochs.map { case (w, e) => s"$w:$e" }.mkString(",")}" + live)
      case "compact" =>
        table.compactAll()
        println(s"compacted -> version ${table.currentSnapshot().version}")
      case "cluster" =>
        require(args.length >= 3, "cluster <c1,c2|zorder:c1,c2|none>")
        if (args(2).startsWith("zorder:")) {
          // multi-dimensional rewrite (LakeTable.reclusterZOrder): NON-STICKY
          // — the manifest's linear sortCols stays; re-run after heavy ingest
          val zcols = args(2).stripPrefix("zorder:").split(",").toSeq.filter(_.nonEmpty)
          table.reclusterZOrder(zcols)
          val s = table.currentSnapshot()
          println(s"z-order clustered by [${zcols.mkString(",")}] -> version " +
            s"${s.version} files=${s.files.size} rows=${s.rows}")
        } else {
          val cols = if (args(2) == "none") Nil
            else args(2).split(",").toSeq.filter(_.nonEmpty)
          // a FRESH handle with the override — `table`'s layout stays whatever
          // the manifest recorded until recluster commits the new one
          val t = LakeTable.open(spark, root, sortColsOverride = Some(cols))
          t.recluster()
          val s = t.currentSnapshot()
          println(s"clustered by [${cols.mkString(",")}] -> version ${s.version} " +
            s"files=${s.files.size} rows=${s.rows}")
        }
      case "expire" =>
        require(args.length >= 3, "expire <horizonLsn>")
        table.expireTombstones(args(2).toLong)
        println(s"expired tombstones < ${args(2)} -> version ${table.currentSnapshot().version}")
      case "vacuum" =>
        val retain = if (args.length >= 3) args(2).toInt else 0
        val n = table.vacuum(retain)
        println(s"vacuumed $n unreferenced files (retained $retain versions of deltas)")
      case "tag" =>
        require(args.length >= 3, "tag <name> [version] [replace]")
        val rest = args.drop(3)
        val replace = rest.contains("replace")
        val version = rest.filterNot(_ == "replace").headOption.map(_.toLong).getOrElse(-1L)
        val v = table.tag(args(2), version, replace)
        println(s"tag '${args(2)}' -> version $v (pinned against vacuum/expiresnapshots)")
      case "tags" =>
        val ts = table.tags()
        if (ts.isEmpty) println("(no tags)")
        else ts.toSeq.sortBy(_._1).foreach { case (n, v) => println(s"$n -> v$v") }
      case "droptag" =>
        require(args.length >= 3, "droptag <name>")
        println(if (table.dropTag(args(2))) s"dropped tag '${args(2)}'"
          else s"no tag '${args(2)}'")
      case "readtag" =>
        require(args.length >= 3, "readtag <name> [limit]")
        val limit = if (args.length >= 4) args(3).toInt else 20
        val v = table.tagVersion(args(2))
        println(s"tag '${args(2)}' = version $v")
        table.readTag(args(2)).show(limit, truncate = false)
      case "asof" =>
        require(args.length >= 3, "asof <yyyy-MM-ddTHH:mm:ss> [limit]")
        val ts = LakeTable.parseTimestamp(args(2))
        val limit = if (args.length >= 4) args(3).toInt else 20
        val v = table.versionAsOf(ts)
        println(s"as of $ts = version $v")
        table.readVersion(v).show(limit, truncate = false)
      case "expiresnapshots" =>
        require(args.length >= 3, "expiresnapshots <retainVersions>")
        val n = table.expireSnapshots(args(2).toInt)
        println(s"expired $n manifests (retained newest ${args(2)})")
      case "check" =>
        val retain = if (args.length >= 3) args(2).toInt else 8
        val r = table.fsck(retain)
        println(s"v${r.version}: ${r.filesOk} files ok, " +
          s"${r.missing.size} missing, ${r.rowMismatches.size} row mismatches, " +
          s"${r.orphans} orphan data files (vacuum candidates), " +
          s"${r.stagingDirs} staging dirs")
        (r.missing ++ r.rowMismatches).foreach(m => println(s"  CORRUPT: $m"))
        if (!r.clean) sys.exit(2)
      case "where" =>
        require(args.length >= 3, "where <sqlPredicate> [limit]")
        val r = table.scanWhere(org.apache.spark.sql.functions.expr(args(2)))
        println(s"scan: ${r.filesKept} of ${r.filesTotal} files after " +
          s"manifest-bounds skipping (snapshot v${r.version})")
        r.df.show(if (args.length >= 4) args(3).toInt else 20, truncate = false)
      case "delete" =>
        require(args.length >= 3, "delete <sqlPredicate>")
        val st = table.deleteWhere(org.apache.spark.sql.functions.expr(args(2)),
          epoch = table.currentSnapshot().lastEpochFor("maint") + 1, writerId = "maint")
        println(s"deleted ${st.deletes} rows -> version ${table.currentSnapshot().version}")
      case "set" =>
        require(args.length >= 5, "set <sqlPredicate> <col> <sqlExpr>")
        import org.apache.spark.sql.functions.expr
        val st = table.updateWhere(expr(args(2)), Map(args(3) -> expr(args(4))),
          epoch = table.currentSnapshot().lastEpochFor("maint") + 1, writerId = "maint")
        println(s"rewrote ${st.rowsApplied} rows -> version ${table.currentSnapshot().version}")
      case "rollback" =>
        require(args.length >= 3, "rollback <version>")
        table.rollbackTo(args(2).toLong)
        println(s"rolled back to snapshot ${args(2)} -> version ${table.currentSnapshot().version}")
      case "export" =>
        require(args.length >= 4, "export <debezium|canal|maxwell> <dstDir> [sinceVersion]")
        val since = if (args.length >= 5) args(4).toLong else -1L
        val changes = table.readChangesSince(since)
          .withColumnRenamed(LakeTable.OpCol, "op")
          .withColumnRenamed(LakeTable.LsnCol, "lsn")
        graft.engine.SyncJob.write(spark, changes,
          graft.engine.SyncJob.Sink(args(2), args(3), keyCols = table.keyCols))
        println(s"exported changes since version $since as ${args(2)} -> ${args(3)}")
      case "feed" =>
        require(args.length >= 4, "feed <debezium|canal|maxwell> <feedDir> [expireUpto]")
        // incrementally maintained envelope feed (CdcFeed scaladoc): the
        // watermark lives in the feed directory, so re-running this command
        // ships exactly the commits since the last run (cron-able outbox).
        // The optional horizon expires consumed windows (to ≤ upto; the
        // head window always survives — it carries the watermark)
        val st = graft.engine.cdc.CdcFeed.sync(table, args(3), args(2),
          keyCols = table.keyCols)
        println(if (st.skipped) s"feed ${args(3)} already at source version ${st.toVersion}"
          else s"fed -> ${args(3)} window=v${st.fromVersion}..v${st.toVersion} " +
            s"rows=${st.rows} files=${st.files}")
        if (args.length >= 5) {
          val n = graft.engine.cdc.CdcFeed.expire(table, args(3), args(4).toLong)
          println(s"expired $n consumed window(s) up to v${args(4)}")
        }
      case "rebucket" =>
        require(args.length >= 4, "rebucket <dstRoot> <newBuckets>")
        val dst = table.rebucketTo(args(2), args(3).toInt)
        val s = dst.currentSnapshot()
        println(s"rebucketed -> ${args(2)} buckets=${args(3)} rows=${s.rows} " +
          s"writers=${s.epochs.map { case (w, e) => s"$w:$e" }.mkString(",")}")
      case "rollup" =>
        require(args.length >= 3, "rollup <dstRoot> [groupCol]")
        // incrementally maintained per-group aggregate (Rollup scaladoc):
        // the destination's epoch lineage is the watermark, so re-running
        // this command refreshes only groups changed since the last run
        val groupCol = if (args.length >= 4) args(3) else "conv_id"
        val dst = LakeTable.create(spark, args(2), Seq(groupCol),
          math.max(8, table.numBuckets / 4), targetFileRows = table.targetFileRows)
        val st = graft.lake.Rollup.sync(table, dst, graft.lake.Rollup.transcriptAggs)
        println(if (st.skipped) s"rollup ${args(2)} already at source head"
          else s"rollup -> ${args(2)} group=$groupCol refreshed=${st.rowsApplied} " +
            s"groups physicalRows=${dst.currentSnapshot().rows}")
      case "rollupadd" =>
        require(args.length >= 3, "rollupadd <dstRoot> [groupCol]")
        // additive variant (Rollup.syncAdditive): per-group SUMs folded
        // from state diffs of the changed keys — NO live-table scan on any
        // layout, so it stays O(changes) even when the group column is not
        // the source's distribution key (e.g. role)
        val groupCol = if (args.length >= 4) args(3) else "conv_id"
        val dst = LakeTable.create(spark, args(2), Seq(groupCol),
          math.max(8, table.numBuckets / 4), targetFileRows = table.targetFileRows)
        val st = graft.lake.Rollup.syncAdditive(table, dst,
          graft.lake.Rollup.transcriptSums)
        println(if (st.skipped) s"rollupadd ${args(2)} already at source head"
          else s"rollupadd -> ${args(2)} group=$groupCol refreshed=${st.rowsApplied} " +
            s"groups physicalRows=${dst.currentSnapshot().rows}")
      case "stateat" =>
        require(args.length >= 3, "stateat <lsnCut> [limit] — run against an scd2 history table")
        require(table.keyCols.lastOption.contains(graft.lake.Scd2.SeqCol),
          s"stateat reads an SCD2 history table (key ending in " +
            s"${graft.lake.Scd2.SeqCol}); this table is keyed " +
            s"${table.keyCols.mkString(",")} — point at the history root")
        val cutState = graft.lake.Scd2.stateAt(table, args(2).toLong)
        println(s"state as of lsn ${args(2)}: ${cutState.count()} rows")
        cutState.show(if (args.length >= 4) args(3).toInt else 20, truncate = false)
      case "scd2" =>
        require(args.length >= 3, "scd2 <dstRoot>")
        // incrementally maintained SCD Type-2 history (Scd2 scaladoc): the
        // destination's epoch lineage is the watermark, so re-running this
        // command extends the history only with commits since the last run
        val dstRoot = args(2)
        val dfs = new org.apache.hadoop.fs.Path(dstRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dst =
          if (dfs.exists(new org.apache.hadoop.fs.Path(s"$dstRoot/_snapshots/snap-0.txt")))
            LakeTable.open(spark, dstRoot)
          else graft.lake.Scd2.createDst(table, dstRoot)
        val st = graft.lake.Scd2.sync(table, dst)
        println(if (st.skipped) s"scd2 $dstRoot already at source head"
          else s"scd2 -> $dstRoot @epoch ${st.epoch} rowsApplied=${st.rowsApplied} " +
            s"historyRows=${dst.currentSnapshot().rows}")
      case "mirror" =>
        require(args.length >= 5, "mirror <jdbcUrl> <table> <dialect> [k1,k2]")
        val (url, tbl, dialect) = (args(2), args(3), graft.engine.Dialect.byName(args(4)))
        val keys: Seq[String] =
          if (args.length >= 6) args(5).split(",").toSeq.filter(_.nonEmpty)
          else {
            val conn = java.sql.DriverManager.getConnection(url)
            try graft.engine.JdbcExec.primaryKeys(conn, tbl) finally conn.close()
          }
        require(keys.nonEmpty,
          s"mirror $tbl: no conflict columns — pass k1,k2 or declare a PK on the target")
        val st = graft.engine.cdc.JdbcApply.sync(table,
          graft.engine.cdc.CdcPipeline.JdbcDest(dialect, url, tbl,
            keyCols = keys, writerId = "lake-mirror"))
        println(if (st.skipped) s"mirror $tbl already at source version ${st.sourceVersion}"
          else s"mirrored -> $tbl @v${st.sourceVersion} upserts=${st.upserts} deletes=${st.deletes}")
      case "parity" =>
        require(args.length >= 3, "parity <otherLakeRootOrParquetPath> [exact]")
        val exact = args.length >= 4 && args(3) == "exact"
        // `other` is a lake root when it carries a manifest dir; anything
        // else is read as plain parquet (an export, an RDBMS dump staged to
        // parquet, a foreign table's files)
        val other =
          try LakeTable.open(spark, args(2)).readInternal()
          catch { case _: Exception => spark.read.parquet(args(2)) }
        val keys = table.keyCols
        val summary = graft.lake.Parity
          .summary(table.readInternal(), other, keys, exact = exact)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val bad = summary.filterNot(_._1 == graft.lake.Parity.Equal)
        println(s"parity vs ${args(2)} (keys=${keys.mkString(",")}, " +
          s"${if (exact) "exact" else "hash"}): " +
          s"equal=${summary.getOrElse(graft.lake.Parity.Equal, 0L)} " +
          bad.map { case (k, v) => s"$k=$v" }.mkString(" "))
        if (bad.values.sum > 0) {
          graft.lake.Parity.diff(table.readInternal(), other, keys, exact = exact)
            .show(20, truncate = false)
          sys.exit(2)
        }
      case "tail" =>
        require(args.length >= 3, "tail <dstRoot>")
        // committed-manifest-driven (NOT readStreamChanges): change windows
        // respect rollbacks and never see uncommitted-publish orphans, and
        // the destination's epoch lineage is the watermark. The writerId is
        // "lake-tail", DELIBERATELY distinct from the round-2 file tail's
        // "cdc-tail": that released binary's lineage recorded STREAMING
        // MICRO-BATCH ids, not source versions — reusing the name would
        // silently skip source versions at or below the old batch counter.
        // A destination previously fed by the file tail resyncs once via
        // the bootstrap path (current snapshot state, vacuum-proof) and
        // converges by LWW — never duplicates.
        // mirror the source's full layout (distribution key + slicing knob),
        // not just keys/buckets, so the replica prunes like the original
        val dst = LakeTable.create(spark, args(2), table.keyCols, table.numBuckets,
          distCols = table.distCols, targetFileRows = table.targetFileRows,
          sortCols = table.sortCols)
        val applied = graft.lake.Replicate.follow(table, dst, writerId = "lake-tail",
          pollMillis = 500L, idleRounds = 2)
        println(s"tailed -> ${args(2)} physicalRows=${dst.currentSnapshot().rows} applied=$applied")
      case other => throw new IllegalArgumentException(s"unknown command '$other'")
    }
    spark.stop()
  }
}

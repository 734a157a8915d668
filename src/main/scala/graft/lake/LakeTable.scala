package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** An Iceberg-shaped, snapshot-committed table over immutable Parquet files.
  *
  * No Iceberg/Delta jar exists in this sandbox (offline resolution), so the
  * north-rule's "Iceberg table" is realized in-repo with the same public
  * design: immutable data files + a versioned snapshot manifest + an atomic
  * pointer swap, epoch-keyed idempotent commits, and additive schema
  * evolution recorded in snapshot metadata. The commit protocol mirrors the
  * reference engine's two-phase tmp-dir→rename publish
  * (go-datax `plugins/writer/hdfswriter/hdfs_writer.go:458-507`) and its
  * idempotent load labels ("Label Already Exists" ⇒ committed,
  * `plugins/writer/starrockswriter/starrocks_writer.go:878-892`) — here the
  * label is the checkpointed streaming batch epoch.
  *
  * Layout:
  * {{{
  *   <root>/data/s<version>-b<bucket>-<n>.parquet   // immutable data files
  *   <root>/_snapshots/snap-<version>.txt           // manifest (see format below)
  *   <root>/_current                                // pointer: latest version (atomic swap)
  * }}}
  * Per-epoch ingest metrics ride inside the manifests (atomic with the
  * commit) and are exposed as a DataFrame by [[LakeTable#metrics]].
  *
  * Scale design: rows are hash-bucketed on the key (`pmod(hash(key), numBuckets)`);
  * the manifest records each file's bucket, so a MERGE only reads and rewrites
  * the buckets that actually receive changes (bucket-pruned copy-on-write).
  * At 100 TB with numBuckets sized so bucket ≈ a few GB, a batch touching k
  * buckets costs O(k·bucketSize), never O(table).
  *
  * Upsert semantics follow the reference's writer-side PK upsert
  * (last-writer-wins per key, `common/database/rdbms/writer/common.go:556-616`):
  * within a batch, LWW = `row_number() over (partition by key order by lsn
  * desc, ts desc) = 1`; across batches the stored `_lsn` column arbitrates, so
  * late-arriving lower-lsn changes never clobber newer state and the final
  * table state is independent of batch boundaries.
  */
final class LakeTable(
    val spark: SparkSession,
    val root: String,
    val keyCols: Seq[String],
    val numBuckets: Int) {

  import LakeTable._

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

  private val dataDir = s"$root/data"
  private val snapDir = s"$root/_snapshots"
  private val pointer = s"$root/_current"

  /** bucket of a row = pmod(hash(key...), numBuckets) */
  private def bucketExpr = pmod(hash(keyCols.map(col): _*), lit(numBuckets))

  // ---------------------------------------------------------------- snapshots

  def currentSnapshot(): Snapshot = {
    val p = new Path(pointer)
    if (!fs.exists(p)) Snapshot(version = -1L, lastEpoch = -1L, schema = None, rows = 0L, files = Nil)
    else {
      val v = readString(fs, p).trim.toLong
      readSnapshot(fs, new Path(s"$snapDir/snap-$v.txt"), v)
    }
  }

  private def commitSnapshot(s: Snapshot): Unit = {
    fs.mkdirs(new Path(snapDir))
    val snapPath = new Path(s"$snapDir/snap-${s.version}.txt")
    // an existing snap file can only be a dead attempt of this same version
    // (pointer never advanced to it) — overwrite is the recovery path
    writeString(fs, snapPath, renderSnapshot(s))
    // two-phase pointer swap: write tmp fully, then atomic rename over _current
    val tmp = new Path(s"$pointer.tmp")
    writeString(fs, tmp, s.version.toString)
    atomicReplace(fs, tmp, new Path(pointer))
  }

  // ---------------------------------------------------------------- read

  /** Current table contents (public columns — internal `_lsn` dropped). */
  def read(): DataFrame = readInternal().drop(LsnCol)

  /** Contents including the internal `_lsn` arbitration column. */
  def readInternal(): DataFrame = {
    val s = currentSnapshot()
    dfFor(s, s.files)
  }

  private def dfFor(s: Snapshot, files: Seq[FileEntry]): DataFrame = {
    val schema = s.schema.getOrElse(StructType(Nil))
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      // explicit unified schema: files written before a column existed are
      // null-filled by the parquet reader (additive schema evolution)
      spark.read.schema(schema).parquet(files.map(f => s"$dataDir/${f.path}"): _*)
  }

  // ---------------------------------------------------------------- merge

  /** MERGE a batch of change events into the table, idempotently keyed by
    * `epoch`. Batch columns: `op` (I/U/D), `lsn`, key columns, payload
    * columns (any extra column is added to the table schema — additive
    * evolution; any stored payload column missing from the batch is
    * null-filled). Returns per-epoch ingest metrics; a replayed epoch is
    * skipped and reported with `skipped = true`.
    */
  def merge(batch: DataFrame, epoch: Long): MergeStats = {
    val snap = currentSnapshot()
    if (epoch <= snap.lastEpoch)
      return MergeStats(epoch, skipped = true, 0, 0, 0, 0, 0, snap.rows, 1.0)

    // -- schema resolution (additive evolution) --------------------------
    val batchPayload = StructType(batch.schema.fields.filterNot(f => f.name == OpCol || f.name == "lsn"))
    val storedOld: StructType = snap.schema.getOrElse(
      StructType(batchPayload.fields :+ StructField(LsnCol, LongType, nullable = false)))
    val storedNew: StructType = unionSchemas(storedOld, batchPayload)
    val payloadCols: Seq[String] =
      storedNew.fieldNames.toSeq.filterNot(_ == LsnCol)
    val hasTs = payloadCols.contains("ts")

    // -- align batch to unified schema, LWW-dedupe within the batch ------
    var evs = batch
    payloadCols.foreach { c =>
      if (!evs.columns.contains(c))
        evs = evs.withColumn(c, lit(null).cast(storedNew(c).dataType))
    }
    val obsIn = Observation(s"lake-in-$epoch")
    evs = evs.observe(obsIn, count(lit(1)).as("rowsIn"))
    val ordering =
      if (hasTs) Seq(col("lsn").desc, col("ts").desc) else Seq(col("lsn").desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val latest = evs
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn(BucketCol, bucketExpr)
      .persist()

    try {
      // ONE aggregation job computes everything the merge plan needs
      // (materializes the cache, flushes the rowsIn observation, and yields
      // distinct-rows / deletes / skew / affected-buckets) — per-epoch
      // driver-side overhead matters at 10^10 events
      val sumRow = latest
        .groupBy(col(keyCols.head))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col(OpCol) === "D", 1L).otherwise(0L)).as("d"),
          collect_set(col(BucketCol)).as("bs"))
        .agg(
          sum("n").as("rows"), sum("d").as("dels"),
          max("n").as("mx"), avg("n").as("mean"),
          array_distinct(flatten(collect_set("bs"))).as("buckets"))
        .collect()(0)
      val rowsDistinct = if (sumRow.isNullAt(0)) 0L else sumRow.getLong(0)
      val rowsIn = obsIn.get("rowsIn").asInstanceOf[Long]

      if (rowsDistinct == 0L) {
        // still advance the epoch so replays of an empty batch stay idempotent
        val st = MergeStats(epoch, skipped = false, rowsIn, 0, 0, 0, 0, snap.rows, 1.0)
        commitSnapshot(snap.copy(version = snap.version + 1, lastEpoch = epoch, stats = Some(st)))
        return st
      }

      val deletes = sumRow.getLong(1)
      // skew: max events per first-key (conversation) / mean — hot
      // conversations stay visible in the metrics table
      val skew =
        if (sumRow.isNullAt(3) || sumRow.getDouble(3) == 0.0) 1.0
        else sumRow.getLong(2).toDouble / sumRow.getDouble(3)
      val affected: Set[Int] =
        sumRow.getSeq[Int](4).toSet

      // -- base side: ONLY the affected buckets (bucket-pruned CoW) -------
      val (affFiles, keptFiles) = snap.files.partition(f => affected.contains(f.bucket))
      val base = dfFor(snap.copy(schema = Some(storedNew)), affFiles)

      // -- full-outer arbitration on the key -------------------------------
      val bS = base.select(keyCols.map(col) :+ struct(base.columns.map(col): _*).as("b"): _*)
      val cCols = (Seq(OpCol, "lsn") ++ payloadCols).distinct
      val cS = latest.select(keyCols.map(col) :+ struct(cCols.map(col): _*).as("c"): _*)
      val joined = bS.join(cS, keyCols, "full_outer")
      // c wins iff base row absent or c.lsn >= stored _lsn (>= makes replays
      // of the same change idempotent); coalesce(false) keeps base-only rows
      val useC = col("b").isNull ||
        coalesce(col("c.lsn") >= col(s"b.$LsnCol"), lit(false))
      val keep = not(useC && col(s"c.$OpCol") === "D")
      val outCols: Seq[org.apache.spark.sql.Column] =
        payloadCols.map { p =>
          when(useC, col(s"c.$p")).otherwise(col(s"b.$p")).as(p)
        } :+ when(useC, col("c.lsn")).otherwise(col(s"b.$LsnCol")).as(LsnCol)
      val obsOut = Observation(s"lake-out-$epoch")
      val result = joined
        .filter(coalesce(keep, lit(true)))
        .select(outCols: _*)
        .observe(obsOut, count(lit(1)).as("rowsOut"))
        .withColumn(BucketCol, bucketExpr)

      // -- two-phase publish: staging write, move into data/, pointer swap --
      val staging = s"$root/_staging-$epoch"
      fs.delete(new Path(staging), true)
      result
        .repartition(math.max(affected.size, 1), col(BucketCol))
        .write
        .partitionBy(BucketCol)
        .parquet(staging)
      val rowsOut = obsOut.get("rowsOut").asInstanceOf[Long]

      fs.mkdirs(new Path(dataDir))
      val newVersion = snap.version + 1
      val moved = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
      val st = fs.listStatus(new Path(staging))
      st.filter(_.isDirectory).foreach { d =>
        val bucket = d.getPath.getName.stripPrefix(s"$BucketCol=").toInt
        var n = 0
        fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
          val dest = s"s$newVersion-b$bucket-$n.parquet"
          val fileRows = parquetRowCount(f.getPath)
          val destPath = new Path(s"$dataDir/$dest")
          // a dest can only pre-exist from a dead attempt of this same
          // (uncommitted) version — committed versions are never re-published
          // — so overwriting is safe under the single-writer assumption
          if (fs.exists(destPath)) fs.delete(destPath, false)
          if (!fs.rename(f.getPath, destPath))
            throw new IllegalStateException(s"rename failed publishing $dest")
          moved += FileEntry(bucket, dest, fileRows)
          n += 1
        }
      }
      fs.delete(new Path(staging), true)

      // per-file row counts live in the manifest (read once from parquet
      // footers at publish) so total-row maintenance never re-scans data
      val newRows = snap.rows - affFiles.map(_.rows).sum + rowsOut
      val stats = MergeStats(epoch, skipped = false, rowsIn, rowsDistinct,
        rowsIn - rowsDistinct, deletes, affected.size, newRows, skew)
      // stats ride in the manifest so metrics commit atomically with data —
      // an epoch interrupted after commit cannot lose or double its row
      commitSnapshot(Snapshot(
        version = newVersion,
        lastEpoch = epoch,
        schema = Some(storedNew),
        rows = newRows,
        files = keptFiles ++ moved.toSeq,
        stats = Some(stats)))
      stats
    } finally {
      latest.unpersist()
    }
  }

  /** Row count from the parquet footer — metadata only, no data read. */
  private def parquetRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Per-epoch ingest metrics table, reconstructed from snapshot manifests
    * (one row per committed, non-skipped epoch; atomic with the commit).
    */
  def metrics(): DataFrame = {
    import spark.implicits._
    val dir = new Path(snapDir)
    val rows =
      if (!fs.exists(dir)) Seq.empty[MergeStats]
      else fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith("snap-"))
        .sortBy(_.getPath.getName.stripPrefix("snap-").stripSuffix(".txt").toLong)
        .flatMap { st =>
          val v = st.getPath.getName.stripPrefix("snap-").stripSuffix(".txt").toLong
          readSnapshot(fs, st.getPath, v).stats
        }
    rows.toDF()
  }

  /** Remove data files not referenced by the current snapshot (old-version
    * files kept until now for snapshot isolation of concurrent readers).
    */
  def vacuum(): Int = {
    val live = currentSnapshot().files.map(_.path).toSet
    var n = 0
    val dir = new Path(dataDir)
    if (fs.exists(dir)) fs.listStatus(dir).foreach { f =>
      if (!live.contains(f.getPath.getName)) { fs.delete(f.getPath, false); n += 1 }
    }
    n
  }
}

object LakeTable {
  val LsnCol = "_lsn"
  val BucketCol = "_bucket"
  val OpCol = "op"

  final case class FileEntry(bucket: Int, path: String, rows: Long)

  final case class Snapshot(
      version: Long,
      lastEpoch: Long,
      schema: Option[StructType],
      rows: Long,
      files: Seq[FileEntry],
      stats: Option[MergeStats] = None)

  /** Per-epoch ingest metrics row (north-rule: rows applied, dedupe rate,
    * skew factor, written to a metrics table).
    */
  final case class MergeStats(
      epoch: Long,
      skipped: Boolean,
      rowsIn: Long,
      rowsApplied: Long,
      duplicatesDropped: Long,
      deletes: Long,
      affectedBuckets: Int,
      tableRows: Long,
      skewFactor: Double)

  def create(spark: SparkSession, root: String, keyCols: Seq[String], numBuckets: Int = 32): LakeTable =
    new LakeTable(spark, root, keyCols, numBuckets)

  // --------------------------------------------------------------- manifest IO

  /** Additive union: stored fields keep their order/type; brand-new batch
    * fields are appended as nullable. Type conflicts are rejected (only
    * additive evolution is supported, matching the north rule).
    */
  def unionSchemas(stored: StructType, incoming: StructType): StructType = {
    val byName = stored.fieldNames.toSet
    val added = incoming.fields.filterNot(f => byName.contains(f.name))
      .map(f => f.copy(nullable = true))
    incoming.fields.filter(f => byName.contains(f.name)).foreach { f =>
      val old = stored(f.name)
      require(old.dataType == f.dataType,
        s"non-additive schema change on '${f.name}': ${old.dataType} -> ${f.dataType}")
    }
    // keep _lsn last for readability
    val (lsn, rest) = (stored.fields ++ added).partition(_.name == LsnCol)
    StructType(rest ++ lsn)
  }

  private[lake] def renderSnapshot(s: Snapshot): String = {
    val sb = new StringBuilder
    sb.append("version=").append(s.version).append('\n')
    sb.append("lastEpoch=").append(s.lastEpoch).append('\n')
    sb.append("rows=").append(s.rows).append('\n')
    s.schema.foreach(sc => sb.append("schema=").append(sc.json).append('\n'))
    s.stats.foreach { m =>
      sb.append("stats=").append(Seq(m.epoch, m.skipped, m.rowsIn, m.rowsApplied,
        m.duplicatesDropped, m.deletes, m.affectedBuckets, m.tableRows,
        m.skewFactor).mkString(",")).append('\n')
    }
    s.files.foreach(f => sb.append("file=").append(f.bucket).append('\t')
      .append(f.path).append('\t').append(f.rows).append('\n'))
    sb.toString
  }

  private[lake] def readSnapshot(fs: FileSystem, p: Path, version: Long): Snapshot = {
    val lines = readString(fs, p).split('\n').filter(_.nonEmpty)
    var lastEpoch = -1L
    var rows = 0L
    var schema: Option[StructType] = None
    var stats: Option[MergeStats] = None
    val files = Seq.newBuilder[FileEntry]
    lines.foreach { ln =>
      val i = ln.indexOf('=')
      val (k, v) = (ln.substring(0, i), ln.substring(i + 1))
      k match {
        case "lastEpoch" => lastEpoch = v.toLong
        case "rows" => rows = v.toLong
        case "schema" => schema = Some(DataType.fromJson(v).asInstanceOf[StructType])
        case "file" =>
          val Array(b, path, rows) = v.split('\t')
          files += FileEntry(b.toInt, path, rows.toLong)
        case "stats" =>
          val a = v.split(',')
          stats = Some(MergeStats(a(0).toLong, a(1).toBoolean, a(2).toLong,
            a(3).toLong, a(4).toLong, a(5).toLong, a(6).toInt, a(7).toLong,
            a(8).toDouble))
        case _ => ()
      }
    }
    Snapshot(version, lastEpoch, schema, rows, files.result(), stats)
  }

  private[lake] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private[lake] def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try { out.write(s.getBytes(StandardCharsets.UTF_8)); out.hsync() }
    catch { case _: UnsupportedOperationException => () }
    finally out.close()
  }

  /** Atomic pointer swap. Local fs: java.nio ATOMIC_MOVE; other fs:
    * delete+rename (rename is atomic on HDFS; the delete window is why the
    * snapshot file itself is written first — a reader that races the swap
    * retries on the previous pointer value).
    */
  private[lake] def atomicReplace(fs: FileSystem, src: Path, dst: Path): Unit = {
    val uri = fs.getUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      val s = java.nio.file.Paths.get(src.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      java.nio.file.Files.move(s, d,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(src, dst))
        throw new IllegalStateException(s"pointer swap failed: $src -> $dst")
    }
  }
}

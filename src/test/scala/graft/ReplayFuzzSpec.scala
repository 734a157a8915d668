package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Gen, Model}
import graft.lake.LakeTable

/** Property-style replay fuzz: for several seeds and ARBITRARY epoch
  * boundaries (round-robin, contiguous with a duplicated epoch, and a
  * hash-scrambled assignment), the batch MERGE must always reach the same
  * final state as the independently computed global last-writer-wins
  * oracle. The tombstone-resurrection bug was exactly a batch-boundary-
  * sensitivity bug; this sweeps that whole class.
  */
class ReplayFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Arrival index recovered from lsn (lsn = (i & ~63) | ((i & 63) ^ 42);
    * the block-local xor is involutive).
    */
  private def arrivalIdx: Column =
    col("lsn").bitwiseAND(lit(~63L))
      .bitwiseOR(col("lsn").bitwiseAND(lit(63L)).bitwiseXOR(lit(42L)))

  private def check(seed: Long, nEvents: Long, epochOf: Column => Column, nEpochs: Int,
      replayEpoch: Option[Int] = None,
      via: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity,
      withScd2: Boolean = false): Unit = {
    val cfg = Gen.GenConfig(seed = seed, nEvents = nEvents, nConvs = 40L,
      maxTurns = 16, partitions = 4)
    val dir = tmpDir(s"fuzz$seed")
    val table = LakeTable.create(spark, dir, Model.keyCols, numBuckets = 4)
    val histEach = if (withScd2)
      Some(graft.lake.Scd2.createDst(table, tmpDir(s"fuzzh$seed") + "/h")) else None

    (0 until nEpochs).foreach { e =>
      val batch = via(Gen.changeEvents(spark, cfg).toDF()
        .filter(epochOf(arrivalIdx) === e))
      table.merge(batch, e.toLong)
      replayEpoch.filter(_ == e).foreach { _ =>
        table.merge(batch, e.toLong) // duplicate epoch delivery — must skip
      }
      histEach.foreach(h => graft.lake.Scd2.sync(table, h))
    }

    val got = table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val want = Gen.expectedState(spark, cfg).toDF()
    val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert(diff === 0L, s"seed=$seed: $diff rows differ from the global-LWW oracle")

    // SCD2 rider: under the same arbitrary/duplicated/scrambled epoch
    // boundaries, (a) the history's open rows must equal the oracle state,
    // (b) validity chains must stay sound, (c) a consumer syncing once at
    // the end must land on the SAME history as the per-epoch consumer
    // (per-commit determinism)
    histEach.foreach { h =>
      val open = h.read().filter(col("is_current"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      val openDiff = open.exceptAll(want).count() + want.exceptAll(open).count()
      assert(openDiff === 0L, s"seed=$seed: scd2 open rows diverge by $openDiff")

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("conv_id", "turn_idx").orderBy("vf_lsn")
      val bad = h.read()
        .withColumn("nvf", lead("vf_lsn", 1).over(w))
        .filter((col("vt_lsn").isNotNull && col("vt_lsn") <= col("vf_lsn")) ||
          (col("nvf").isNotNull && (col("vt_lsn").isNull || col("vt_lsn") > col("nvf"))) ||
          (col("is_current") && col("nvf").isNotNull))
      assert(bad.count() === 0L, s"seed=$seed: scd2 validity chain broken")

      val once = graft.lake.Scd2.createDst(table, tmpDir(s"fuzzo$seed") + "/o")
      graft.lake.Scd2.sync(table, once)
      val a = h.read(); val b = once.read()
      val cadDiff = a.exceptAll(b).count() + b.exceptAll(a).count()
      assert(cadDiff === 0L, s"seed=$seed: scd2 cadence divergence $cadDiff")
    }
  }

  test("round-robin epoch split reaches the oracle state") {
    check(seed = 7L, nEvents = 3000L, epochOf = i => pmod(i, lit(3)).cast("int"), nEpochs = 3)
  }

  test("contiguous split with a duplicated middle epoch reaches the oracle state") {
    check(seed = 11L, nEvents = 3000L, epochOf = i => floor(i / 1000L).cast("int"),
      nEpochs = 3, replayEpoch = Some(1))
  }

  test("hash-scrambled split (out-of-order across epochs) reaches the oracle state") {
    check(seed = 13L, nEvents = 3000L,
      epochOf = i => pmod(xxhash64(i + 99L), lit(4)).cast("int"), nEpochs = 4,
      withScd2 = true)
  }

  test("scd2 rider under contiguous split with a duplicated epoch") {
    check(seed = 17L, nEvents = 3000L, epochOf = i => floor(i / 1000L).cast("int"),
      nEpochs = 3, replayEpoch = Some(1), withScd2 = true)
  }

  test("debezium encode→decode inside the replay still reaches the oracle state") {
    import graft.sources.CdcEnvelope
    val payloadSchema = org.apache.spark.sql.types.StructType(
      Model.changeEventSchema.fields.filterNot(f => f.name == "op" || f.name == "lsn"))
    val payloadCols = payloadSchema.fieldNames.toSeq
    check(seed = 17L, nEvents = 3000L,
      epochOf = i => pmod(i, lit(3)).cast("int"), nEpochs = 3,
      via = df => CdcEnvelope.debezium(
        CdcEnvelope.encodeDebezium(df, payloadCols, Model.keyCols),
        "value", payloadSchema))
  }

  test("onboarding fuzz: arbitrary snapshot cut and tail start reach the oracle state") {
    // sweeps the CdcPipeline.bootstrap convergence contract: snapshot cut
    // L0 anywhere in the log, tail retained from anywhere ≤ L0 (overlap),
    // tail events scattered across epochs in ARRIVAL order (lsn disorder
    // across epoch boundaries) — every combination must match the
    // full-replay global-LWW oracle
    for ((seed, frac, startFrac) <- Seq((19L, 0.5, 0.0), (23L, 0.3, 1.0), (29L, 0.8, 0.4))) {
      val nEvents = 3000L
      val cfg = Gen.GenConfig(seed = seed, nEvents = nEvents, nConvs = 40L,
        maxTurns = 16, partitions = 4)
      val L0 = (nEvents * frac).toLong
      val start = (L0 * startFrac).toLong // tail retains lsn > start, start ≤ L0
      val ev = Gen.changeEvents(spark, cfg).toDF()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc, col("ts").desc)
      val snapshot = ev.filter(col("lsn") <= L0)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1 && col("op") =!= "D")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      val table = LakeTable.create(spark, tmpDir(s"onbfuzz$seed") + "/t",
        Model.keyCols, numBuckets = 4)
      graft.engine.cdc.CdcPipeline.bootstrap(table, snapshot, L0)
      val tail = ev.filter(col("lsn") > start)
      (0 until 3).foreach { e =>
        table.merge(tail.filter(pmod(arrivalIdx, lit(3)) === e), e.toLong)
      }
      val got = table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      val want = Gen.expectedState(spark, cfg).toDF()
      val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
      assert(diff === 0L,
        s"seed=$seed L0=$L0 start=$start: $diff rows differ from the oracle")
    }
  }

  test("time travel: every committed version remains readable until vacuum") {
    val cfg = Gen.GenConfig(seed = 5L, nEvents = 2000L, nConvs = 30L, partitions = 4)
    val dir = tmpDir("tt")
    val table = LakeTable.create(spark, dir, Model.keyCols, numBuckets = 4)
    val all = Gen.changeEvents(spark, cfg)
    table.merge(all.filter($"lsn" < 700L).toDF(), 0L)
    val v0 = table.currentSnapshot().version
    val c0 = table.read().count()
    table.merge(all.filter($"lsn" >= 700L && $"lsn" < 1400L).toDF(), 1L)
    table.merge(all.filter($"lsn" >= 1400L).toDF(), 2L)
    assert(table.readVersion(v0).count() === c0)
    assert(table.read().count() >= c0)
  }
}

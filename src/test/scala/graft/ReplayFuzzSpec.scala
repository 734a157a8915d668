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
      via: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
    val cfg = Gen.GenConfig(seed = seed, nEvents = nEvents, nConvs = 40L,
      maxTurns = 16, partitions = 4)
    val dir = tmpDir(s"fuzz$seed")
    val table = LakeTable.create(spark, dir, Model.keyCols, numBuckets = 4)

    (0 until nEpochs).foreach { e =>
      val batch = via(Gen.changeEvents(spark, cfg).toDF()
        .filter(epochOf(arrivalIdx) === e))
      table.merge(batch, e.toLong)
      replayEpoch.filter(_ == e).foreach { _ =>
        table.merge(batch, e.toLong) // duplicate epoch delivery — must skip
      }
    }

    val got = table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val want = Gen.expectedState(spark, cfg).toDF()
    val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert(diff === 0L, s"seed=$seed: $diff rows differ from the global-LWW oracle")
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
      epochOf = i => pmod(xxhash64(i + 99L), lit(4)).cast("int"), nEpochs = 4)
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

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Corpus curation operators: deterministic sampling (uniform and
  * per-stratum) and sequence packing — the selection/layout stages of a
  * training-data pipeline, downstream of dedup and quality scoring.
  *
  * Both samplers are pure FILTERS on an engine-portable hash of the row id:
  * no shuffle, no RNG state, fully pushed into the scan stage, and the same
  * row set comes back on every run, on any engine, at any parallelism — the
  * property that makes a 100 TB curation run resumable and auditable
  * (re-running a failed shard selects identical rows).
  */
object Curation {

  /** Hash bucket in [0, 10000): first 8 md5 hex chars of (seed || id). */
  private def hashBucket(id: Column, seed: String): Column =
    md5Head32(concat(lit(seed), id.cast("string"))) % 10000

  /** Deterministic uniform sample: keep a row iff its hash bucket falls
    * below fraction·10⁴ (resolution 0.01%). `seed` re-keys the hash for
    * independent draws (e.g. train/validation splits that must not overlap:
    * complementary bucket ranges on ONE seed give disjoint exact splits).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, seed: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    df.filter(hashBucket(col(idCol), seed) < lit(math.round(fraction * 10000)))
  }

  /** Per-stratum sampling rates (strata not in `fractions` keep `default`) —
    * e.g. downsample English to 10% while keeping low-resource languages
    * whole. Thresholds are resolved driver-side to exact integers so the
    * kept set is identical across engines (no float-boundary rows).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 1.0): DataFrame = {
    // Thresholds resolve via a BROADCAST rates join, not a when-chain on
    // the stratum column: when the stratum is a DERIVED column (the usual
    // shape — langId output), a filter referencing it gets pushed below
    // the projection with the full defining expression substituted into
    // every when-branch — the language-id tree evaluated 3× per row in
    // the r06 plan audit. Joined as an attribute it evaluates once; the
    // rates table is O(strata) tiny at any scale. Same kept row set.
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq
      .map { case (s, f) => (s, math.round(f * 10000)) }
      .toDF("_stratum", "_thr")
    df.join(broadcast(rates), df(stratumCol) === col("_stratum"), "left")
      .filter(hashBucket(col(idCol), "") <
        coalesce(col("_thr"), lit(math.round(default * 10000))))
      .drop("_stratum", "_thr")
  }

  /** Concat-and-chunk sequence packing: documents are sharded into
    * `nShards` independent streams (`doc_id % nShards` — NO global order,
    * every shard packs in parallel), ordered by doc_id within the shard,
    * and laid out back to back; sequence `s` of a shard owns the token
    * interval [s·budget, (s+1)·budget). Emits each document's sequence id
    * and starting offset inside it. A document straddling a boundary
    * belongs to the sequence where it starts (token-level splitting is the
    * tokenizer stage's job — this operator decides the layout).
    *
    * Scale shape: the only shuffle is the per-shard window; at 100 TB pick
    * nShards ≫ executor count so each partition's running sum stays small,
    * while determinism (shard, doc_id) is preserved at any parallelism. A
    * single global ORDER BY would serialize the corpus through one task —
    * that is exactly what the sharding avoids.
    *
    * `seq_id` is bit-composed as `shard << 40 | seq` (like the Maxwell lsn
    * composition, sources/CdcEnvelope.scala): 2⁴⁰ sequences per shard
    * (≈5·10¹⁴ tokens at budget 512) before ids could collide across shards,
    * vs the earlier decimal `shard·10⁶ + seq` whose shard spaces aliased
    * past 10⁶ sequences — silently wrong packing at exactly the scale this
    * operator advertises (CurationSpec "no cross-shard aliasing" guards it).
    */
  def packSequences(docs: DataFrame, budgetTokens: Int, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0 && nShards > 0,
      s"budgetTokens=$budgetTokens nShards=$nShards must be positive")
    require(nShards.toLong <= (1L << 23),
      s"nShards=$nShards exceeds the 23-bit shard space of seq_id")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("long"))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("shard"),
        (shiftleft(col("shard"), 40) + floor(col("off") / budgetTokens).cast("long")).as("seq_id"),
        (col("off") % budgetTokens).as("seq_offset"))
  }
}

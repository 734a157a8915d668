package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the operators must produce the plans a 100 TB run
  * needs — filters pushed into the parquet scan, columns pruned to the
  * projection, small dimensions broadcast. `.explain`-driven, asserted.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("dx_filter predicate reaches the parquet scan (PushedFilters)") {
    val df = SparkEntry.queries("t_dx_filter")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), "no pushdown section in scan")
    assert(plan.contains("GreaterThan(l_quantity"), s"filter not pushed:\n$plan")
  }

  test("projection prunes the scan schema to selected columns") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    val readSchema = plan.split("ReadSchema:").last
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"scan reads unprojected columns:\n$readSchema")
  }

  test("dimension joins broadcast (no shuffle of the small side)") {
    val plan = planOf(SparkEntry.queries("q3_top_orders")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("transformer chain stays in one WholeStageCodegen span over the scan") {
    val plan = planOf(SparkEntry.queries("t_chain")(spark, sfDir))
    // codegen'd operators render with the "*(n)" star in the tree string
    assert(plan.contains("*("), s"no WholeStageCodegen span:\n$plan")
    assert(!plan.contains("Exchange"), s"transformer chain must be narrow:\n$plan")
  }

  test("routed table-ref filter and decode are narrow — no exchange before the merge") {
    // the per-route pipeline (match table refs → from_json decode → null-lsn
    // filter) must stay inside the scan stage: its only shuffle is the
    // LWW merge's own exchange, added later. A wide routing stage would
    // multiply per-epoch latency by the route count at scale.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val ps = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val lines = spark.range(2000).select(
      concat(lit("""{"before":null,"after":{"id":"""), col("id"),
        lit(""","v":"x"},"op":"c","ts_ms":1,"source":{"lsn":"""), col("id"),
        lit(""","db":"d","table":"t"}}""")).as("value"))
    val (db, tbl) = graft.sources.CdcEnvelope.tableRefs("debezium", col("value"))
    val routed = graft.sources.CdcEnvelope.debezium(
        lines.withColumn("_db", db).withColumn("_tbl", tbl)
          .filter(graft.sources.CdcEnvelope.refMatches("d.t", col("_db"), col("_tbl")))
          .select("value"),
        "value", ps)
      .filter(col("lsn").isNotNull)
    val plan = planOf(routed)
    assert(!plan.contains("Exchange"), s"routing must be narrow:\n$plan")
    assert(plan.contains("*("), s"no WholeStageCodegen span:\n$plan")
  }

  test("MOR read shuffles only dirty buckets (clean buckets bypass the window)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions.col
    import spark.implicits._

    val root = tmpDir("graft-mor-prune")
    val t = graft.lake.LakeTable.create(spark, s"$root/t", Seq("k"), numBuckets = 32)
    val base = (1 to 3200).map(i => ("U", i.toLong, i.toLong, s"v$i"))
      .toDF("op", "lsn", "k", "payload")
    t.merge(base, 0)
    t.compactAll() // all 32 buckets now clean base files
    // one tiny delta -> exactly one dirty bucket
    t.merge(Seq(("U", 10000L, 5L, "updated")).toDF("op", "lsn", "k", "payload"), 1)

    val df = t.read().select("k", "payload")
    val rows = df.collect()
    assert(rows.length === 3200)
    assert(rows.find(_.getLong(0) == 5L).get.getString(1) === "updated")

    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => q +: unwrap(q.plan)
      case other => other +: other.children.flatMap(unwrap)
    }
    val nodes = unwrap(df.queryExecution.executedPlan)
    // two scans: the dirty-bucket files (through the window) + clean bases
    assert(nodes.count(_.isInstanceOf[FileSourceScanExec]) === 2, nodes.mkString("\n"))
    val shuffled = nodes.collect { case s: ShuffleExchangeLike =>
      s.metrics("shuffleRecordsWritten").value }
    assert(shuffled.nonEmpty, "expected the dirty-bucket window shuffle")
    // ~3200/32 = 100 base rows + 1 delta row in the dirty bucket; all 31
    // clean buckets (3100 rows) must NOT enter the exchange
    assert(shuffled.sum > 0 && shuffled.sum < 400,
      s"window shuffled ${shuffled.sum} rows — clean buckets not pruned")

    // point lookup prunes to the key's single bucket: right row, and the
    // scans read ≤ the bucket's files, not the table's
    val lookup = t.readKey(Seq(5L))
    val hit = lookup.collect()
    assert(hit.length === 1 && hit(0).getString(1) === "updated")
    val scanned = unwrap(lookup.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    val totalFiles = 33 // 32 compacted bases + 1 delta
    assert(scanned > 0 && scanned < 4,
      s"point lookup scanned $scanned of ~$totalFiles files")
    assert(t.readKey(Seq(99999L)).collect().isEmpty)
  }

  test("simhash pair mining is banded — no cartesian/nested-loop join") {
    val plan = planOf(SparkEntry.queries("d_simhash_pairs")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"simhash pairs must band-join, not cross-join:\n$plan")
  }

  test("multi-probe IVF kNN join stays an equi-join on _cell — no cartesian") {
    import graft.pipeline.Ivf
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Ivf.train(emb, k = 8, iters = 1)
    val plan = planOf(Ivf.knnJoin(emb, model, topK = 3, nProbe = 2))
    // the anchor explode must not degrade the cell join to a cross product
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"multi-probe knnJoin must hash/merge-join on _cell:\n$plan")
    assert(plan.contains("Generate"), s"anchors should explode probed cells:\n$plan")
  }

  test("null-safe group joins plan as hash joins — the rollup delta path never cross-joins") {
    // Rollup.sync/syncAdditive scope recomputes and fold deltas through
    // <=> (EqualNullSafe) join conditions so null group values behave like
    // any other; this pins the Spark property that a <=>-only condition
    // still plans as a hash join, not BroadcastNestedLoopJoin
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq(("g1", 1L), (null.asInstanceOf[String], 2L)).toDF("band", "v")
    val b = Seq(("g1", 10L), (null.asInstanceOf[String], 20L)).toDF("band", "d")
      .select(col("band").as("__m_band"), col("d"))
    val joined = a.join(b, col("band") <=> col("__m_band"), "full_outer")
    val plan = planOf(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"<=> group joins must hash-join:\n$plan")
    // and the null group genuinely matches the null group
    assert(joined.where(col("band").isNull && col("d") === 20L).count() === 1L)
  }

  test("vec_dot is codegen-compatible (no CodegenFallback in similarity scan)") {
    val df = SparkEntry.queries("sim_topk")(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CodegenFallback"),
      s"vec kernel fell back to interpreted eval:\n$plan")
    // the kernel must sit INSIDE a WholeStageCodegen ("*(n)") operator line
    // — audit the AQE FINAL plan only (the "Initial Plan" echo that
    // AdaptiveSparkPlan appends prints the same operators un-starred)
    val finalPlan = plan.split("== Initial Plan ==").head
    val kernelLines = finalPlan.linesIterator.filter(l =>
      l.contains("vec_dot") || l.contains("vec_norm")).toSeq
    assert(kernelLines.nonEmpty, s"vec kernels absent from plan:\n$plan")
    assert(kernelLines.forall(_.contains("*(")),
      s"vec kernel outside codegen span:\n${kernelLines.mkString("\n")}")
  }

  test("hash sampling is a pure narrow filter: no exchange, pruned scan") {
    val plan = planOf(SparkEntry.queries("d_sample_hash")(spark, sfDir))
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    val readSchema = plan.split("ReadSchema:").last
    assert(!readSchema.contains("text"), s"sample scan reads unneeded columns:\n$readSchema")
  }

  test("sequence packing windows per shard — no single-partition global sort") {
    val plan = planOf(SparkEntry.queries("ta_pack")(spark, sfDir))
    assert(!plan.contains("SinglePartition"),
      s"packing must not serialize through one partition:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("offset split ranks per ordered range bucket — no single-partition global window") {
    val plan = planOf(SparkEntry.queries("s_offset_split")(spark, sfDir))
    assert(!plan.contains("SinglePartition"),
      s"offset split must not serialize through one partition:\n$plan")
    assert(plan.contains("Window"), plan) // the per-partition local rank
  }

  test("dictionary split assigns via boundary projection — no window, no join") {
    // boundaries come from a bounded TakeOrdered sample (driver-side
    // literals); the data side must stay a narrow codegen'd projection —
    // the earlier ntile-over-full-domain formulation planned a
    // SinglePartition window over every distinct key
    val plan = planOf(SparkEntry.queries("s_dict_split")(spark, sfDir))
    assert(!plan.contains("Window"), s"dict split must not window:\n$plan")
    assert(!plan.contains("Join"), s"dict split must not join:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"dict split must not serialize through one partition:\n$plan")
  }

  test("decontamination broadcasts the eval n-gram set; corpus streams once") {
    val plan = planOf(SparkEntry.queries("d_decontaminate")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tfidf broadcasts the document-frequency side; no pairwise join") {
    val plan = planOf(SparkEntry.queries("ta_tfidf")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
    // the ONE permissible nested-loop join is the broadcast single-row
    // corpus-count scalar (`_n_docs` riding the main job instead of a
    // separate driver action) — never a pairwise corpus join
    // audit the AQE FINAL plan only (the "Initial Plan" echo repeats nodes)
    val finalPlan = plan.split("== Initial Plan ==").head
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(finalPlan).length
    assert(bnlj <= 1 && (bnlj == 0 || finalPlan.contains("_n_docs")),
      s"unexpected nested-loop join beyond the count scalar:\n$plan")
  }

  test("repetition is computed in-row — no keyed shuffle, no window, no join") {
    val plan = planOf(SparkEntry.queries("ta_repetition")(spark, sfDir))
    // per-document statistics are pure row functions (sorted-array run
    // length): the only permissible exchange is the scan-parallelism
    // spread (round-robin) — never a (doc, gram) keyed shuffle, a window,
    // or any pairwise join of the corpus with itself
    assert(!plan.contains("hashpartitioning"),
      s"repetition must not shuffle by key:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("Window"), plan)
  }

  test("as-of join is union+window — single shuffle family, no join operator") {
    for (q <- Seq("q_asof_join", "q_asof_tolerance")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct")
        && !plan.contains("SortMergeJoin"),
        s"$q must not plan a pairwise join:\n$plan")
      assert(plan.contains("Window"), plan)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity}

/** Training-data pipeline properties that the SQL oracle cannot express:
  * MinHash recall against exact Jaccard, LSH-ANN recall against brute
  * force, and the multimodal batch plumbing.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with planted near-duplicates: doc i and doc i+1000 share all but
    * one word for i < 20.
    */
  private lazy val planted = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(100)
    val dups = base.filter($"doc_id" < 20)
      .select(($"doc_id" + 1000).as("doc_id"),
        concat($"text", lit(" extraword")).as("text"))
    base.unionByName(dups).cache()
  }

  test("minhash LSH candidates find every high-Jaccard planted pair") {
    val truth = Dedup.jaccardPairs(planted, n = 3, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "planted dups must have jaccard >= 0.8")
    val cand = Dedup.minhashCandidates(planted, n = 3, bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    // banding theory: P(candidate) = 1-(1-s^r)^b ~ 0.999 at s=0.9, r=2, b=4
    val found = truth.intersect(cand)
    assert(found.size.toDouble / truth.size >= 0.9,
      s"recall ${found.size}/${truth.size} below 0.9")
  }

  test("incremental candidates equal the full run's cross-boundary pairs") {
    // corpus = originals, new batch = the planted near-dups; the incremental
    // band join against the stored signatures must surface exactly the
    // full-corpus candidate pairs that cross the boundary
    val corpus = planted.filter($"doc_id" < 1000)
    val fresh = planted.filter($"doc_id" >= 1000)
    val inc = Dedup.incrementalCandidates(fresh, Dedup.bandSignatures(corpus))
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minhashCandidates(planted).as[(Long, Long)].collect().toSet
    val crossFromFull = full.collect {
      case (a, b) if a < 1000 && b >= 1000 => (b, a)
      case (a, b) if a >= 1000 && b < 1000 => (a, b)
    }
    assert(inc == crossFromFull)
    assert(inc.nonEmpty, "planted dups must collide with their originals")
  }

  test("decontamination flags the benchmark doc and its near-duplicate, keeps the rest") {
    val eval = planted.filter($"doc_id" === 5)
    val con = Dedup.contamination(planted, eval, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(con.contains(5L), "the benchmark doc is trivially contaminated")
    assert(con.contains(1005L), "the planted near-dup shares almost all 5-grams")
    val kept = Dedup.decontaminated(planted, eval, n = 5)
    assert(kept.filter($"doc_id".isin(con.toSeq: _*)).count() === 0L)
    assert(kept.count() === planted.count() - con.size)
  }

  test("simhash of near-duplicates has small hamming distance") {
    val pairs = Dedup.simhashPairs(planted, maxDist = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val plantedPairs = (0L until 20L).map(i => (i, i + 1000L)).toSet
    val found = plantedPairs.intersect(pairs)
    assert(found.size >= 15, s"simhash found only ${found.size}/20 planted pairs")
  }

  test("dedupedCorpus drops planted near-duplicates and exact duplicates") {
    val withExact = planted.unionByName(
      planted.filter($"doc_id" === 0).select(($"doc_id" + 2000).as("doc_id"), $"text"))
    val deduped = Dedup.dedupedCorpus(withExact, n = 3, bands = 4, rowsPerBand = 2)
    val ids = deduped.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(2000L), "exact dup should be dropped")
    val survivors = ids.count(_ >= 1000L)
    assert(survivors <= 2, s"$survivors planted near-dups survived")
    // a few originals may legitimately pair with each other via LSH; the
    // bulk must survive
    assert(ids.count(_ < 100L) >= 95, "originals (smaller ids) must be kept")
  }

  test("LSH ANN recall@5 vs brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val truth = Similarity.knnJoinBrute(emb, k = 5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, k = 5, planes = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(ann).size.toDouble / truth.size
    // random hyperplanes at 4 planes: buckets of ~n/16; recall is modest but
    // must be far above chance (k/n ~ 1%) — and deterministic
    assert(recall >= 0.15, f"ANN recall $recall%.3f below floor")
    val ann2 = Similarity.annTopK(emb, k = 5, planes = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(ann === ann2, "ANN must be deterministic")
  }

  test("LSH ANN bounds bucket skew: refinement keeps recall with a mega-bucket") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val truth = Similarity.knnJoinBrute(emb, k = 5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // planes=1 => TWO buckets, each holding ~half the corpus — both exceed
    // maxBucket = n/4, so the skew path triggers: 3 extra hyperplanes refine
    // the mega-buckets by actual geometry before the candidate join
    val ann = Similarity.annTopK(emb, k = 5, planes = 1,
      maxBucket = (n / 4).toInt, extraPlanes = 3)
    val pairs = ann.select("a", "b").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(pairs).size.toDouble / truth.size
    // refined buckets ≈ 4-plane buckets: recall must stay far above chance
    // (the unrefined 4-plane gate in the test above uses the same floor)
    assert(recall >= 0.15, f"skew-bounded ANN recall $recall%.3f below floor")
    // candidate generation actually bounded: no anchor compares against
    // more than the refined bucket population; and the run is deterministic
    val again = Similarity.annTopK(emb, k = 5, planes = 1,
      maxBucket = (n / 4).toInt, extraPlanes = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === again, "skew-bounded ANN must be deterministic")
    // hard cap backstop: with refinement disabled the cap still bounds the
    // per-anchor candidate set to maxBucket - 1 others
    val capped = Similarity.annTopK(emb, k = 1000, planes = 1,
      maxBucket = 20, extraPlanes = 0)
    val maxCand = capped.groupBy("a").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxCand <= 20L, s"cap leaked: anchor saw $maxCand candidates")
  }

  test("IVF sampled training: recall gate holds, sample is deterministic") {
    import graft.pipeline.Ivf
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // bound engaged (sample < n): the md5-prefix subset must train a model
    // whose full-probe search is still exhaustive-correct and whose reduced
    // probe clears the same recall floor as the full-corpus model
    val m1 = Ivf.train(emb, k = 8, iters = 2, trainSample = Some(n / 2))
    val m2 = Ivf.train(emb, k = 8, iters = 2, trainSample = Some(n / 2))
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq,
      "sampled training must be deterministic")
    val idx = tmpDir("ivfSampled") + "/index"
    Ivf.buildIndex(emb, m1, idx)
    val q = Ivf.vectorOf(emb, 1L)
    val truth = Similarity.topK(emb, queryId = 1L, k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    val ann = Ivf.searchIndex(spark, idx, m1, q, topK = 10, nProbe = 4,
      excludeId = Some(1L)).select("neighbor_id").as[Long].collect().toSet
    // floor below the full-model 0.5: halving a few-hundred-vector corpus is
    // a far harsher cut than the real default bound (256k+ rows) ever takes
    assert(truth.intersect(ann).size.toDouble / truth.size >= 0.3,
      "sampled-model recall below floor")
    // full probe over the sampled model's index is still exhaustive-exact
    val fullProbe = Ivf.searchIndex(spark, idx, m1, q, topK = 10, nProbe = 8,
      excludeId = Some(1L)).select("neighbor_id").as[Long].collect().toSet
    assert(fullProbe === truth)
    // default bound covers small corpora entirely — identical to a full pass
    assert(Ivf.defaultTrainSample(8) >= n)
    val mDefault = Ivf.train(emb, k = 8, iters = 2)
    val mFull = Ivf.train(emb, k = 8, iters = 2, trainSample = Some(Long.MaxValue))
    assert(mDefault.centroids.map(_.toSeq).toSeq === mFull.centroids.map(_.toSeq).toSeq)
  }

  test("IVF ANN: recall vs brute force, determinism, and probe pruning") {
    import graft.pipeline.Ivf
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Ivf.train(emb, k = 8, iters = 2)
    assert(model.k === 8)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    Ivf.buildIndex(emb, model, idx)
    val q = Ivf.vectorOf(emb, 1L)

    // single-query search at nProbe=4 must recover most of the brute top-10
    val truth = Similarity.topK(emb, queryId = 1L, k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    val probe = Ivf.searchIndex(spark, idx, model, q, topK = 10, nProbe = 4,
      excludeId = Some(1L))
    val ann = probe.select("neighbor_id").as[Long].collect().toSet
    val recall = truth.intersect(ann).size.toDouble / truth.size
    assert(recall >= 0.5, f"IVF recall $recall%.2f below floor at nProbe=4/8")
    // full probe (nProbe = k) is exhaustive => exact
    val full = Ivf.searchIndex(spark, idx, model, q, topK = 10, nProbe = 8,
      excludeId = Some(1L)).select("neighbor_id").as[Long].collect().toSet
    assert(full === truth)

    // the probe scan PRUNES to the probed cell partitions: partition
    // filters in the plan, fewer files read than the index holds
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cell"),
      s"no partition pruning in probe scan:\n$plan")
    val prunedFiles = spark.read.parquet(idx)
      .filter($"_cell".isin(Ivf.nearestCells(model, q, 4).map(Int.box): _*))
      .select(input_file_name()).distinct().count()
    val totalFiles = spark.read.parquet(idx)
      .select(input_file_name()).distinct().count()
    assert(prunedFiles < totalFiles,
      s"probe read $prunedFiles of $totalFiles files — no pruning")

    // deterministic across retrains
    val model2 = Ivf.train(emb, k = 8, iters = 2)
    assert(model.centroids.map(_.toSeq).toSeq === model2.centroids.map(_.toSeq).toSeq)

    // init takes the k md5-smallest WITHOUT a global sort: top-k runs on an
    // md5-prefix-filtered candidate set (Filter under TakeOrderedAndProject)
    // and still selects exactly the k rows a full orderBy.limit would
    val n = emb.count()
    val initDf = Ivf.smallestByMd5(emb, "vec_id", 8, n)
    val initPlan = initDf.queryExecution.executedPlan.toString
    assert(initPlan.contains("TakeOrderedAndProject"), s"init plan:\n$initPlan")
    assert(initPlan.contains("Filter"), s"init must pre-filter candidates:\n$initPlan")
    val viaSort = emb.orderBy(md5($"vec_id".cast("string"))).limit(8)
      .select("vec_id").as[Long].collect().toSeq
    assert(initDf.select("vec_id").as[Long].collect().toSeq === viaSort)

    // knn-join form returns k rows per anchor within cells
    val kj = Ivf.knnJoin(emb, model, topK = 3)
    assert(kj.groupBy("a").count().agg(max("count")).collect()(0).getLong(0) <= 3L)

    // multi-probe kNN join: p=2 anchors also scan their 2nd-nearest cell,
    // recovering the near-boundary neighbors a single cell misses; the
    // candidate side stays one home cell per vector so pairs never duplicate
    val truthAll = Similarity.knnJoinBrute(emb, k = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    def recallOf(p: Int): Double = {
      val pairs = Ivf.knnJoin(emb, model, topK = 3, nProbe = p)
        .select("a", "b").as[(Long, Long)].collect()
      assert(pairs.length === pairs.toSet.size, s"duplicate pairs at nProbe=$p")
      truthAll.intersect(pairs.toSet).size.toDouble / truthAll.size
    }
    val r1 = recallOf(1)
    val r2 = recallOf(2)
    assert(r2 > r1, f"multi-probe did not improve recall: p=1 $r1%.3f vs p=2 $r2%.3f")
    assert(r2 >= 0.5, f"p=2 recall $r2%.3f below floor")
    // full probe degenerates to brute force within the join's k
    val rk = recallOf(model.k)
    assert(rk >= 0.999, f"nProbe=k recall $rk%.3f — full probe must be exact")
  }

  test("multimodal: batched stub decode preserves schema, locality and determinism") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.mediaFromDocs(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.columns.toSeq ===
      Seq("doc_id", "modality", "n_bytes", "width", "height", "feature"))
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(f => f.feature.length === 8 && f.width >= 64 && f.height >= 64))
    // determinism across runs and partitionings
    val again = Multimodal.extractFeatures(spark, media.repartition(7)).collect()
    assert(rows.map(f => (f.doc_id, f.width, f.height, f.feature.toSeq)).sortBy(_._1).toSeq ===
      again.map(f => (f.doc_id, f.width, f.height, f.feature.toSeq)).sortBy(_._1).toSeq)

    // resize stub: aspect-preserving integer geometry, longest side == max
    val thumbs = Multimodal.resizeStub(feats.toDF(), maxSide = 32).collect()
    assert(thumbs.length === rows.length)
    thumbs.foreach { r =>
      val (w, h, tw, th) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(math.max(tw, th) === 32, s"longest thumb side must hit maxSide: $r")
      assert(tw === math.floor(w * 32.0 / math.max(w, h)).toInt)
      assert(th === math.floor(h * 32.0 / math.max(w, h)).toInt)
    }

    // frame sampling: every 2nd 256-byte chunk, byte-exact reassembly check
    val fs = Multimodal.frameSample(media, frameBytes = 256, everyNth = 2)
    val perDoc = fs.groupBy("doc_id").count()
    assert(perDoc.count() === docs.count(), "every doc must emit >= 1 frame")
    val one = media.filter($"doc_id" === 1L).select("payload", "n_bytes").head()
    val expFrames = ((one.getLong(1) + 255) / 256 + 1) / 2 // ceil(n/256) sampled every 2nd
    assert(fs.filter($"doc_id" === 1L).count() === math.max(expFrames, 1L))
  }

  test("connectedComponents: transitive closure, min labels, converges on chains") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, plus a triangle 20-21-22:
    // pointer jumping must close the chain even though (1,4) is no edge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // long path: convergence is O(log diameter), 16 rounds cover 2^16 —
    // run through the RELIABLE checkpoint path (executor-loss-safe variant)
    val ckpt = tmpDir("ccCkpt")
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(path, checkpointDir = Some(ckpt))
      .as[(Long, Long)].collect()
    assert(labels.length === 41 && labels.forall(_._2 === 0L))
    // the reliable path actually materialized checkpoints on disk
    assert(new java.io.File(ckpt).listFiles().nonEmpty, "no reliable checkpoint written")
  }

  test("dedupClusters groups planted near-dup chains transitively") {
    // doc i ~ doc i+1000 by construction; every doc appears exactly once
    val cl = Dedup.dedupClusters(planted)
    assert(cl.count() === planted.count())
    // exact cross-check vs a driver-side union-find over the same edges
    val pairs = Dedup.minhashCandidates(planted).as[(Long, Long)].collect()
    assert(pairs.length >= 20, "planted dups must produce candidate pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = planted.select("doc_id").as[Long].collect()
      .map(id => id -> find(id)).toMap
    val got = cl.as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("hash sampling: deterministic, monotone in fraction, seed-independent draws") {
    import graft.pipeline.Curation
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val s20 = Curation.hashSample(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    val s50 = Curation.hashSample(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50), "same seed: smaller fraction must nest inside larger")
    val n = docs.count().toDouble
    assert(math.abs(s20.size / n - 0.2) < 0.1 && math.abs(s50.size / n - 0.5) < 0.1)
    // determinism across partitionings
    val again = Curation.hashSample(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(again === s20)
    // a different seed is an (approximately) independent draw, not a subset
    val other = Curation.hashSample(docs, "doc_id", 0.2, seed = "v2")
      .select("doc_id").as[Long].collect().toSet
    assert(other !== s20)
  }

  test("packSequences: offsets are exact running token sums, bounded in-sequence") {
    import graft.pipeline.Curation
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val packed = Curation.packSequences(docs, budgetTokens = 512, nShards = 4)
      .orderBy("shard", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect() // doc_id, n_tokens, shard, seq_id, seq_offset
    assert(packed.length === docs.count())
    packed.groupBy(_._3).foreach { case (shard, rows) =>
      var off = 0L
      rows.sortBy(_._1).foreach { case (_, nTok, _, seqId, seqOff) =>
        assert(seqId === (shard << 40) + off / 512, s"shard $shard")
        assert(seqOff === off % 512)
        assert(seqOff >= 0 && seqOff < 512)
        off += nTok
      }
    }
    // determinism at a different parallelism
    val again = Curation.packSequences(docs.repartition(11), 512, 4)
      .orderBy("shard", "doc_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(again.toSeq === packed.toSeq)
  }

  test("packSequences: no cross-shard seq_id aliasing past 10^6 sequences per shard") {
    import graft.pipeline.Curation
    // 2.4M single-token docs over 2 shards => 1.2M sequences per shard at
    // budget 1 — the earlier decimal encoding (shard·10⁶ + seq) aliased
    // shard 0's sequence 10⁶+k onto shard 1's space exactly here
    val docs = spark.range(2400000L)
      .select($"id".as("doc_id"), lit("tok").as("text"))
    val packed = Curation.packSequences(docs, budgetTokens = 1, nShards = 2)
    val perShard = packed.groupBy("shard")
      .agg(countDistinct($"seq_id").as("seqs"),
        min($"seq_id").as("lo"), max($"seq_id").as("hi"))
      .orderBy("shard")
      .as[(Long, Long, Long, Long)].collect()
    assert(perShard.length === 2)
    val (_, seqs0, lo0, hi0) = perShard(0)
    val (_, seqs1, lo1, hi1) = perShard(1)
    assert(seqs0 === 1200000L && seqs1 === 1200000L)
    // shard spaces are disjoint: shard 0 stays below 2^40, shard 1 at/above
    assert(lo0 === 0L && hi0 === 1199999L && hi0 < (1L << 40))
    assert(lo1 === (1L << 40) && hi1 === (1L << 40) + 1199999L)
  }

  test("redactPii: spans, counts, no double counting of digits inside IPs") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "mail a.b+c@x-corp.io and 192.168.0.1 then acct 123456789012"),
      (2L, "no pii here, just words and 123"),
      (3L, "two mails: x@y.org z@w.net ip 8.8.8.8")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 1, 1, 1, "mail <EMAIL> and <IP> then acct <IDNUM>")))
    assert(got(1) === ((2L, 0, 0, 0, "no pii here, just words and 123")))
    assert(got(2) === ((3L, 2, 1, 0, "two mails: <EMAIL> <EMAIL> ip <IP>")))
  }

  test("repetition: top word/bigram fractions, case folding, single-word docs") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "a A a b"), // top word a×3/4; bigrams (a a)×2 of 3
      (2L, "x"), // one word, no bigrams
      (3L, "p q r s"), // all distinct: 1/4 and 1/3
      (4L, "spam spam spam spam")) // fully degenerate: 1.0 and 1.0
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 4L, 0.75, 0.666667)))
    assert(got(1) === ((2L, 1L, 1.0, 0.0)))
    assert(got(2) === ((3L, 4L, 0.25, 0.333333)))
    assert(got(3) === ((4L, 4L, 1.0, 1.0)))
  }
}

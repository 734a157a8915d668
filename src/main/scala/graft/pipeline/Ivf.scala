package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vec

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to the random-hyperplane LSH in [[Similarity]].
  *
  * Coarse quantizer: k spherical-k-means centroids trained with a few Lloyd
  * iterations, deterministically initialized with the k corpus vectors of
  * smallest md5(id) — selected WITHOUT a global sort (an md5-prefix range
  * filter shrinks the corpus to ~O(k) candidates first; the k smallest
  * candidates are provably the k smallest overall once ≥ k rows pass the
  * filter, because the 8-hex-char prefix orders consistently with the full
  * hash). Training iterations are narrow projections + one small aggregate;
  * the only collects are k×d centroid matrices.
  *
  * The index is MATERIALIZED: [[buildIndex]] assigns every vector to its
  * nearest centroid cell (argmax of one codegen'd [[graft.functions.VecDot]]
  * per centroid) and writes the corpus partitioned BY `_cell`, so
  * [[searchIndex]] prunes the file scan to the `nProbe` probed cells —
  * search cost is O(n·d·nProbe/k) in bytes READ, not just rows compared.
  * At 100 TB the cell directories are the inverted lists; a probe touches
  * nProbe directories and re-ranks by exact cosine.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  private def md5Head(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")

  /** The k corpus rows of smallest md5(id), WITHOUT a total ordering of the
    * corpus: filter md5's 32-bit prefix below an oversampled bound (a narrow
    * codegen'd scan), then top-k ONLY the surviving candidates
    * (TakeOrderedAndProject over ~16k rows). Every row passing the prefix
    * filter hash-orders below every row that fails it, so once ≥ k rows
    * survive, their k smallest ARE the global k smallest — identical output
    * to `orderBy(md5(id)).limit(k)` at a fraction of the cost. The bound
    * quadruples (rerun) in the binomially-unlikely case of < k survivors.
    */
  private[graft] def smallestByMd5(df: DataFrame, idCol: String, k: Int, n: Long): DataFrame = {
    var frac = math.min(1.0, 16.0 * k / math.max(n, 1L))
    while (true) {
      val bound = (frac * 4294967296.0).toLong // 2^32 × fraction
      val cand = df.filter(md5Head(idCol) < bound)
        .orderBy(md5(col(idCol).cast("string")))
        .limit(k)
      if (frac >= 1.0) return cand
      val got = cand.count()
      if (got >= k) return cand
      frac = math.min(1.0, frac * 4)
    }
    throw new IllegalStateException("unreachable")
  }

  /** The default training bound: a coarse quantizer's centroids converge on
    * a sample; `max(256k, 100·k)` rows train the same model a full pass
    * would (the recall gates in PipelineSpec hold on the sampled default).
    */
  def defaultTrainSample(k: Int): Long = math.max(256000L, 100L * k)

  /** Deterministic spherical k-means on (a fraction of) the corpus.
    * `trainSample` bounds the expected training-set size: rows are kept by
    * an md5-prefix range predicate (no sort, no shuffle — a filter), giving
    * a reproducible ~`trainSample`-row subset on any engine.
    *
    * COST NOTE — the bound is ON by default ([[defaultTrainSample]]):
    * each Lloyd iteration shuffles n×d exploded rows for the centroid
    * means, so an unbounded pass over 10⁹ × 64-dim vectors × 3 iterations
    * is ~2×10¹¹ shuffled rows — for centroids a 10⁶-row sample trains
    * identically. Pass `trainSample = Some(Long.MaxValue)` to explicitly
    * opt into a full-corpus pass.
    */
  def train(emb: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Option[Long] = None): Model = {
    val n = emb.count()
    val sample = trainSample.getOrElse(defaultTrainSample(k))
    val base =
      if (sample < n) {
        val bound = (math.min(1.0, sample.toDouble / n) * 4294967296.0).toLong
        emb.filter(md5Head(idCol) < bound)
      } else emb
    val nBase = math.min(sample, n)
    var centroids: Array[Array[Float]] = smallestByMd5(base, idCol, k, nBase)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)

    var it = 0
    while (it < iters) {
      val assigned = assignCell(base, Model(centroids), vecCol)
      // new centroid = mean of assigned vectors (element-wise), computed
      // distributedly; k×d result collects to the driver (tiny)
      val means = assigned
        .select(col("_cell"), posexplode(col(vecCol)).as(Seq("_pos", "_val")))
        .groupBy("_cell", "_pos")
        .agg(avg("_val").as("_mean"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val d = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            Array.tabulate(d.size)(p => d(p).toFloat)
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
      it += 1
    }
    Model(centroids)
  }

  /** Add `_cell` = argmax over centroids of dot(v, c) (ties → lowest cell). */
  def assignCell(emb: DataFrame, model: Model, vecCol: String = "embedding"): DataFrame = {
    val dots: Column = array(model.centroids.map(c =>
      vec.dot(col(vecCol), typedLit(c))): _*)
    emb.withColumn("_dots", dots)
      .withColumn("_cell", (array_position(col("_dots"), array_max(col("_dots"))) - 1).cast("int"))
      .drop("_dots")
  }

  /** Materialize the inverted file: the corpus written partitioned by
    * `_cell`, so each cell is its own directory and a probe's scan prunes to
    * the probed cells' files (PartitionFilters in the scan — asserted in
    * PlanAuditSpec). Assignment runs ONCE here, never at query time.
    */
  def buildIndex(emb: DataFrame, model: Model, path: String,
      vecCol: String = "embedding"): Unit =
    assignCell(emb, model, vecCol)
      .write.mode("overwrite").partitionBy("_cell").parquet(path)

  /** exact double dot (driver-side, k×d work): float operands promote to
    * double so products are exact — mirrors [[graft.functions.VecDot]].
    */
  private def ddot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** The `nProbe` cells nearest the query vector (dot desc, cell asc). */
  def nearestCells(model: Model, query: Array[Float], nProbe: Int): Seq[Int] =
    model.centroids.zipWithIndex
      .sortBy { case (c, _) => -ddot(c, query) } // stable: ties keep cell order
      .take(nProbe).map(_._2).toSeq

  /** Fetch one vector by id (pushed-down point lookup). */
  def vectorOf(emb: DataFrame, id: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Float] =
    emb.filter(col(idCol) === id).select(col(vecCol))
      .collect()(0).getSeq[Float](0).toArray

  /** Top-k neighbors of `query`, probing `nProbe` cells of a materialized
    * index: the parquet scan reads ONLY the probed cell partitions
    * (partition pruning on `_cell`), then exact cosine re-ranks.
    */
  def searchIndex(spark: SparkSession, indexPath: String, model: Model,
      query: Array[Float], topK: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeId: Option[Long] = None): DataFrame = {
    val cells = nearestCells(model, query, nProbe)
    val qLit = typedLit(query)
    val qNorm = math.sqrt(ddot(query, query))
    val scan = spark.read.parquet(indexPath)
      .filter(col("_cell").isin(cells: _*))
    val base = excludeId.fold(scan)(q => scan.filter(col(idCol) =!= q))
    base
      .withColumn("cos", vec.dot(col(vecCol), qLit) / (vec.norm(col(vecCol)) * lit(qNorm)))
      .select(col(idCol).as("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
      .limit(topK)
  }

  /** Anchor-side multi-probe assignment: each row exploded to its `nProbe`
    * nearest cells (dot desc, cell asc — the same order [[nearestCells]]
    * uses). Bounded blow-up: the anchor side grows ×nProbe while candidates
    * stay in their single home cell, so join work scales linearly in p and
    * no pair can appear twice (a candidate lives in exactly one cell).
    */
  private def probeCells(emb: DataFrame, model: Model, vecCol: String,
      nProbe: Int): DataFrame = {
    // struct(-dot, cell) sorts ascending = dot desc with cell-asc ties
    val entries = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct((-vec.dot(col(vecCol), typedLit(c))).as("nd"), lit(i).as("c"))
    }: _*)
    emb.withColumn("_cell",
      explode(transform(slice(array_sort(entries), 1, nProbe),
        x => x.getField("c"))))
  }

  /** All-queries ANN top-k (kNN join over the IVF cells): candidates share a
    * cell with the anchor. `nProbe = 1` is the classic bulk shape; a small
    * `nProbe > 1` explodes each ANCHOR to its nProbe nearest cells (multi-
    * probe), recovering the near-boundary neighbors a single cell misses at
    * a bounded ×nProbe cost on the anchor side only — the candidate side
    * stays one home cell per vector, so results never duplicate and recall
    * is monotone in p (PipelineSpec pins the p=1 vs p=2 curve). Reads the
    * materialized index when given a path, so the join's both sides are
    * already cell-partitioned files.
    */
  def knnJoin(emb: DataFrame, model: Model, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= model.k,
      s"nProbe=$nProbe must be in [1, k=${model.k}]")
    val a = assignCell(emb, model, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("_cell"),
        vec.norm(col(vecCol)).as("nrm"))
    val anchors =
      if (nProbe == 1) a
      else probeCells(emb, model, vecCol, nProbe)
        .select(col(idCol).as("id"), col(vecCol).as("v"), col("_cell"),
          vec.norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    anchors.as("x").join(a.as("y"), Seq("_cell"))
      .filter(col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        // rounded BEFORE ranking — cross-engine-stable tie-break
        round(vec.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("a"), col("b"), col("cos"), col("rk"))
  }
}

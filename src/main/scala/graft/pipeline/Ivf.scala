package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vec

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to the random-hyperplane LSH in [[Similarity]].
  *
  * Coarse quantizer: k spherical-k-means centroids trained with a few Lloyd
  * iterations, deterministically initialized (the k vectors with the
  * smallest md5(id) — a reproducible pseudo-random sample). Every vector is
  * assigned to its nearest centroid cell (argmax cosine — one codegen'd
  * [[graft.functions.VecDot]] per centroid, k is small); a query probes only
  * the `nProbe` cells nearest to it and re-ranks candidates by exact cosine.
  * Search cost drops from O(n·d) to O(n·d·nProbe/k) per query at recall
  * governed by nProbe/k.
  *
  * At 100 TB the train step runs on a sample (`trainSample`), assignment is
  * one narrow projection over the corpus, and the cell column becomes a
  * partition key so a probe prunes file scans to nProbe cells.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  private def normCols(vecCol: String) = vec.norm(col(vecCol))

  /** Deterministic spherical k-means on (a sample of) the corpus. */
  def train(emb: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Option[Long] = None): Model = {
    val base = trainSample match {
      case Some(n) => emb.orderBy(md5(col(idCol).cast("string"))).limit(n.toInt)
      case None => emb
    }
    // init: k reproducibly-sampled vectors
    var centroids: Array[Array[Float]] = base
      .orderBy(md5(col(idCol).cast("string")))
      .limit(k)
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

  /** Add `_cell` = argmax over centroids of dot(v, c). */
  def assignCell(emb: DataFrame, model: Model, vecCol: String = "embedding"): DataFrame = {
    val dots: Column = array(model.centroids.map(c =>
      vec.dot(col(vecCol), typedLit(c))): _*)
    emb.withColumn("_dots", dots)
      .withColumn("_cell", (array_position(col("_dots"), array_max(col("_dots"))) - 1).cast("int"))
      .drop("_dots")
  }

  /** Top-k neighbors of the query vector, probing `nProbe` cells. */
  def search(emb: DataFrame, model: Model, queryId: Long, topK: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qRow = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).collect()(0).getSeq[Float](0).toArray
    // driver-side: the nProbe cells nearest to the query
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += (a(i) * b(i)).toDouble; i += 1 }
      s
    }
    val cells = model.centroids.zipWithIndex
      .sortBy { case (c, _) => -dot(c, qRow) }
      .take(nProbe).map(_._2).toSeq

    val qLit = typedLit(qRow)
    val qNorm = math.sqrt(dot(qRow, qRow))
    assignCell(emb, model, vecCol)
      .filter(col("_cell").isin(cells: _*) && col(idCol) =!= queryId)
      .withColumn("cos", vec.dot(col(vecCol), qLit) / (normCols(vecCol) * lit(qNorm)))
      .select(col(idCol).as("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
      .limit(topK)
  }

  /** All-queries ANN top-k (kNN join over the IVF index): candidates share a
    * cell with the anchor (nProbe=1 join form — the scalable bulk shape;
    * higher recall comes from more/larger cells or LSH in [[Similarity]]).
    */
  def knnJoin(emb: DataFrame, model: Model, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = assignCell(emb, model, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("_cell"), normCols(vecCol).as("nrm"))
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    a.as("x").join(a.as("y"), Seq("_cell"))
      .filter(col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (vec.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"), col("rk"))
  }
}

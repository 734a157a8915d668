package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.md5Head32

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Brute-force cosine top-k is the correctness baseline
  * (O(n·q) dot products, still fully distributed); the scale path is
  * random-hyperplane LSH: P deterministic md5-derived ±1 hyperplanes hash
  * each vector to a P-bit bucket signature, the join only compares vectors
  * sharing a bucket, and cosine re-ranks the candidates. Recall is tested
  * against the brute-force baseline in ScalaTest.
  */
object Similarity {

  // codegen'd native kernels (graft.functions.VecDot/VecNorm) — a tight
  // primitive loop in WholeStageCodegen instead of interpreted HOF lambdas;
  // numerically identical to aggregate(zip_with(...)) (float multiply,
  // double accumulate)
  private def norm(v: org.apache.spark.sql.Column) = graft.functions.vec.norm(v)

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.vec.dot(a, b)

  /** Brute-force cosine top-k neighbors of ONE query vector (given by id).
    * Deterministic tie-break on neighbor id.
    */
  def topK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    // rank on the ROUNDED cosine: near-ties below 1e-4 would otherwise be
    // ordered by sub-ulp float-vs-double noise and flip between engines
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(dot(col(vecCol), col("qv")) / (norm(col(vecCol)) * col("qn")), 4))
      .select(col(idCol).as("neighbor_id"), col("cos"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
      .limit(k)
  }

  /** Batched top-k: MANY query vectors answered in ONE pass over the
    * corpus — the query set is broadcast (small side), each corpus
    * partition scores its rows against every query locally, and a window
    * per query keeps the top k. This is the serving shape at scale: the
    * corpus streams once, nothing self-joins, the only shuffle is the
    * per-query ranking of candidate rows.
    */
  def topKBatch(emb: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "vec_id", queryVecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(queryVecCol).as("qv"),
      norm(col(queryVecCol)).as("qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        // rounded BEFORE ranking — cross-engine-stable tie-break (see topK)
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** All-pairs top-k (kNN join) by brute force — window over cosine per
    * anchor. Quadratic; baseline only.
    */
  def knnJoinBrute(emb: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    // join each UNORDERED pair once (id < id) and mirror via explode:
    // cos(a,b) and cos(b,a) are bit-identical (the dot kernel walks the
    // arrays in the same element order and float multiply commutes), so
    // this halves the quadratic kernel work for the identical row set
    // (guide §1.2 — don't compute things twice). The mirror is an explode
    // in the SAME pass, not a union of two join branches (which would
    // re-run the join).
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(
        // rounded BEFORE ranking — cross-engine-stable tie-break (see topK)
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 4).as("cos"),
        explode(array(
          struct(col("x.id").as("a"), col("y.id").as("b")),
          struct(col("y.id").as("a"), col("x.id").as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("a"), col("b"), col("cos"), col("rk"))
  }

  /** Random-hyperplane LSH bucket signature: bit p (p < planes) is the sign
    * of Σ_d w(p,d)·v[d], with w(p,d) = ±1 derived from md5(p ":" d) — fully
    * deterministic, reproducible on any engine.
    *
    * The hyperplane weights do not depend on the row, so they are computed
    * ONCE on the driver (planes × dims md5 parities, same formula the
    * previous per-row expression evaluated) and embedded as array literals;
    * each projection is then one codegen'd [[graft.functions.VecDot]] —
    * the whole signature is a narrow projection, no explode, no shuffle.
    */
  def lshSignature(emb: DataFrame, planes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      firstPlane: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val elemType = emb.schema(vecCol).dataType.asInstanceOf[ArrayType].elementType
    val dims = emb.select(size(col(vecCol))).head().getInt(0)

    // parity of the first 8 hex chars of md5("p:d") — identical to
    // md5Head32(concat(p, ':', d)) & 1 evaluated in the engine
    def weightSign(p: Int, d: Int): Double = {
      val mdig = java.security.MessageDigest.getInstance("MD5")
      val hex = mdig.digest(s"$p:$d".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }
    val planeCols = (firstPlane until firstPlane + planes).map { p =>
      val w = (0 until dims).map(d => weightSign(p, d))
      val wLit = elemType match {
        case FloatType => typedLit(w.map(_.toFloat).toArray)
        case DoubleType => typedLit(w.toArray)
        case t => throw new IllegalArgumentException(s"embedding element type $t")
      }
      when(graft.functions.vec.dot(col(vecCol), wLit) >= 0, lit(1L << (p - firstPlane)))
        .otherwise(0L)
    }
    emb.select(col(idCol).as("id"),
      planeCols.reduce(_ + _).as("bucket"))
  }

  /** ANN top-k via LSH buckets: candidates share a bucket signature, cosine
    * re-ranks. `planes` trades recall vs candidate count (the ScalaTest
    * recall gate uses brute force as truth).
    *
    * BUCKET SKEW IS BOUNDED: the within-bucket candidate join is quadratic
    * in bucket size, so a hot bucket (near-duplicate corpora, low-entropy
    * embeddings) would dominate the job at scale. Buckets exceeding
    * `maxBucket` rows are REFINED with `extraPlanes` additional hyperplanes
    * (recall-preserving: genuinely distinct vectors split, true neighbors
    * keep colliding), and a deterministic per-bucket candidate cap backstops
    * whatever refinement cannot split (vectors identical on every plane are
    * near-ties — any `maxBucket` of them carry the same information). The
    * skew scan is one small count aggregate; when no bucket exceeds the cap
    * (the common case, and the oracle-checked default) the plan is exactly
    * the unrefined join.
    */
  def annTopK(emb: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 1 << 20, extraPlanes: Int = 4): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val sig = lshSignature(emb, planes, idCol, vecCol)
    // the oversized-bucket set is bounded by n/maxBucket buckets, so it is
    // computed ONCE and collected (a second evaluation inside the plan
    // would re-run the whole signature aggregation), then rejoined as a
    // broadcast LOCAL relation — O(1) plan size, unlike an isin(literals)
    // expression tree that grows with the hot-bucket count
    val oversized: Array[Long] = sig.groupBy("bucket").count()
      .filter(col("count") > maxBucket)
      .select("bucket").collect().map(_.getLong(0))
    val spark = emb.sparkSession
    import spark.implicits._
    val oversizedDf = oversized.toSeq.toDF("bucket").withColumn("_hot", lit(true))
    val withSig = e.join(sig, "id")
    val (xSide, ySide) =
      if (oversized.isEmpty) (withSig, withSig)
      else {
        val refined =
          if (extraPlanes <= 0) withSig // cap-only mode
          else {
            val ext = lshSignature(emb, extraPlanes, idCol, vecCol, firstPlane = planes)
              .withColumnRenamed("bucket", "_ext")
            withSig.join(ext, "id")
              .join(broadcast(oversizedDf), Seq("bucket"), "left")
              .withColumn("bucket",
                when(col("_hot").isNotNull,
                  col("bucket") * (1L << extraPlanes) + col("_ext"))
                  .otherwise(col("bucket") * (1L << extraPlanes)))
              .drop("_ext", "_hot")
          }
        // deterministic candidate cap per refined bucket (md5 order)
        val wcap = Window.partitionBy("bucket")
          .orderBy(md5(col("id").cast("string")), col("id"))
        val capped = refined.withColumn("_r", row_number().over(wcap))
        (capped.drop("_r"), capped.filter(col("_r") <= maxBucket).drop("_r"))
      }
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    xSide.as("x").join(ySide.as("y"), Seq("bucket"))
      .filter(col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        // rounded BEFORE ranking — cross-engine-stable tie-break (see topK)
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("a"), col("b"), col("cos"), col("rk"))
  }
}

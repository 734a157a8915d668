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

  private def norm(v: org.apache.spark.sql.Column) =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Brute-force cosine top-k neighbors of ONE query vector (given by id).
    * Deterministic tie-break on neighbor id.
    */
  def topK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", dot(col(vecCol), col("qv")) / (norm(col(vecCol)) * col("qn")))
      .select(col(idCol).as("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
      .limit(k)
  }

  /** All-pairs top-k (kNN join) by brute force — window over cosine per
    * anchor. Quadratic; baseline only.
    */
  def knnJoinBrute(emb: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    e.as("x").join(e.as("y"), col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Random-hyperplane LSH bucket signature: bit p (p < planes) is the sign
    * of Σ_d w(p,d)·v[d], with w(p,d) = ±1 derived from md5(p ":" d) — fully
    * deterministic, reproducible on any engine.
    */
  def lshSignature(emb: DataFrame, planes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dims = size(col(vecCol))
    emb
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        explode(sequence(lit(0), lit(planes - 1))).as("p"))
      .withColumn("proj",
        aggregate(
          zip_with(col("v"),
            transform(sequence(lit(0), size(col("v")) - 1),
              d => when(md5Head32(concat(col("p").cast("string"), lit(":"), d.cast("string")))
                .bitwiseAND(1) === 1, 1.0d).otherwise(-1.0d)),
            (x, wgt) => x * wgt),
          lit(0.0d), (acc, x) => acc + x))
      .groupBy("id")
      .agg(sum(when(col("proj") >= 0, pow(lit(2), col("p")).cast("long")).otherwise(0L))
        .as("bucket"))
  }

  /** ANN top-k via LSH buckets: candidates share a bucket signature, cosine
    * re-ranks. `planes` trades recall vs candidate count (the ScalaTest
    * recall gate uses brute force as truth).
    */
  def annTopK(emb: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val sig = lshSignature(emb, planes, idCol, vecCol)
    val withSig = e.join(sig, "id")
    val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)
    withSig.as("x").join(withSig.as("y"), Seq("bucket"))
      .filter(col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"), col("rk"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.{vec, GraftFunctions}

/** Native vector expressions: numeric parity with the HOF formulation,
  * null handling, SQL registration, and both eval paths.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(-1.0f, 0.5f, 2.0f)),
    (3L, null.asInstanceOf[Array[Float]]))
    .toDF("id", "v")

  test("vec_dot/vec_norm match the aggregate(zip_with(...)) formulation") {
    val hofDot = aggregate(zip_with($"x.v", $"y.v", (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val pairs = vecs.filter($"v".isNotNull).as("x")
      .crossJoin(vecs.filter($"v".isNotNull).as("y"))
    val rows = pairs.select(
      vec.dot($"x.v", $"y.v").as("native"),
      hofDot.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))

    val norms = vecs.filter($"v".isNotNull).select(
      vec.norm($"v").as("native"),
      sqrt(aggregate($"v", lit(0.0d), (acc, x) => acc + x * x)).as("hof")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("null array yields null; cosine of identical vectors is 1") {
    val r = vecs.select(vec.dot($"v", $"v").as("d")).collect()
    assert(r.count(_.isNullAt(0)) === 1)
    val cos = vecs.filter($"v".isNotNull)
      .select(round(vec.cosine($"v", $"v"), 9).as("c")).collect()
    cos.foreach(x => assert(x.getDouble(0) === 1.0))
  }

  test("interpreted eval path matches codegen") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = Literal.create(Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val b = Literal.create(Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val got = graft.functions.VecDot(a, b).eval(null)
    assert(got === (1.0f * 3.0f + 2.0f * 4.0f).toDouble)
  }

  test("SQL registration: vec_dot usable from spark.sql") {
    GraftFunctions.register(spark)
    vecs.filter($"v".isNotNull).createOrReplaceTempView("vecs_v")
    val got = spark.sql(
      "SELECT id, vec_dot(v, v) AS d, vec_norm(v) AS n FROM vecs_v ORDER BY id").collect()
    assert(got(0).getDouble(1) === 14.0) // 1+4+9
    assert(math.abs(got(0).getDouble(2) - math.sqrt(14.0)) < 1e-12)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the similarity/dedup operators.
  *
  * The embedding column is `array<float>` (or `array<double>`); the built-in
  * route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — allocates an
  * intermediate array and walks interpreted higher-order-function lambdas
  * per pair, which dominates the brute-force kNN/near-dup joins (O(n²·d)
  * lambda invocations). These expressions generate a tight primitive loop
  * inside WholeStageCodegen instead: no allocation, no virtual calls — the
  * preference order the Spark guide gives (native Expression > UDF > HOF for
  * hot paths).
  *
  * Numeric semantics: elements are PROMOTED TO DOUBLE before the multiply
  * and accumulated in double. For `array<float>` inputs every product is
  * exact (a float×float product is representable in double), so the result
  * agrees with any engine that computes the dot in double over the same
  * float values (e.g. DuckDB's `list_dot_product(a::DOUBLE[], …)`) up to
  * summation-order rounding — which the 4-decimal oracle rounding absorbs.
  * This deliberately diverges from `aggregate(zip_with(a,b,_*_),0d,_+_)`,
  * which multiplies IN float and loses ~1e-7 relative per product.
  *
  * Null handling: null array ⇒ null result; arrays of DIFFERENT lengths ⇒
  * null (matching the HOF formulation, where `zip_with` pads the short side
  * with null and the sum over a null product is null — a ragged pair is a
  * data bug that should surface as null, not as a silently truncated dot).
  * Null ELEMENTS are not expected (parquet embeddings are dense), read as 0.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null is also produced for length-mismatched (ragged) array pairs
  override def nullable: Boolean = true

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == FloatType || a == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two arrays of float or double with matching element type, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    if (elemType == FloatType) {
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double)$a.$get($i)) * ((double)$b.$get($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** L2 norm of a float/double array — same loop shape as [[VecDot]]. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array of float or double, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    if (elemType == FloatType) {
      while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    } else {
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = (double)$a.$get($i);
         |  $s += v * v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_norm"
}

/** Column-API entry points for the vector kernels. */
object vec {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))

  /** Cosine similarity; when both sides are pre-normalized use [[dot]]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

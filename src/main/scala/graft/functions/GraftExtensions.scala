package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-name registration for the native vector kernels.
  *
  * Two routes, both public Spark API shapes:
  *  - `spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the [[GraftExtensions]] class below, via `SparkSessionExtensions`);
  *  - [[GraftFunctions.register]] for an already-built session (tests, REPL).
  * After either, `spark.sql("SELECT vec_dot(a, b)")` resolves to the
  * codegen'd expressions.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { ch =>
      require(ch.length == 2, "vec_dot(arr, arr)")
      VecDot(ch(0), ch(1))
    },
    "vec_norm" -> { ch =>
      require(ch.length == 1, "vec_norm(arr)")
      VecNorm(ch.head)
    })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) => ColumnBridge.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecDot].getName, name),
        b))
    }
}

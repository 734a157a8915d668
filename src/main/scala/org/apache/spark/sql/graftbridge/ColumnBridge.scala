package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between user-defined Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 wraps columns in `ColumnNode`s and scopes the
  * converters `private[sql]`, so third-party native expressions need a shim
  * inside the `org.apache.spark.sql` package tree — the standard pattern for
  * open-source Spark extension libraries that add codegen'd expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Resolve a raw predicate against `schema` and constant-fold it — the
    * normalization pass behind manifest file skipping. A user-written
    * predicate reaches the pruner pre-analysis, so a timestamp window
    * typed as strings (`ts >= '2024-01-01'`) is a comparison against a
    * StringType literal the bounds engine rightly refuses; after the
    * analyzer's type coercion + `ConstantFolding` the same predicate is a
    * comparison against a folded TimestampType literal, which prunes.
    * `ReplaceExpressions` first rewrites RuntimeReplaceable nodes (the
    * analyzer resolves BETWEEN to one) into their executable form, and
    * `RewriteWithExpression` inlines the `With`/CommonExpressionRef
    * wrapper that replacement introduces (cheap refs — a bare attribute —
    * inline in place; the rule only materializes costly ones). Folding
    * happens in THIS session (same `spark.sql.session.timeZone` the scan's
    * residual filter will use), so string→timestamp casts fold to the same
    * instant the executor would compute. Any failure (unresolvable names,
    * unknown functions) returns the expression unchanged — callers treat
    * the result as best-effort, never load-bearing for semantics.
    */
  def resolveAndFold(
      spark: SparkSession,
      e: Expression,
      schema: org.apache.spark.sql.types.StructType): Expression = try {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    import org.apache.spark.sql.catalyst.optimizer.{ConstantFolding, ReplaceExpressions, RewriteWithExpression}
    val rel = LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema))
    val analyzed = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.analyzer.execute(Filter(e, rel))
    ConstantFolding(RewriteWithExpression(ReplaceExpressions(analyzed)))
      .collectFirst { case Filter(c, _) => c }.getOrElse(e)
  } catch { case scala.util.control.NonFatal(_) => e }

  /** Register a native expression as a session SQL function (the in-library
    * analog of `SparkSessionExtensions.injectFunction` for sessions that
    * were built without the extension config).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

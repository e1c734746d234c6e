package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API.
  *
  * Spark 4 moved classic Columns onto ColumnNode (for Connect parity); the
  * `Column <-> Expression` converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` and are `private[sql]`.
  * This shim re-exports just the two conversions — the standard technique
  * for libraries that ship native expressions (same approach as
  * frameless/spark-alchemy). Nothing else from the private API is touched.
  */
package object graftshim {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def exprColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions only). */
  def columnExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Rewrap `df` as a scan over its own compiled RDD, CUTTING the logical
    * plan lineage — the `Dataset.checkpoint` plan-truncation step without
    * the data copy (the RDD itself is reused; callers persist it).
    *
    * Exists for iterative operators (connected components): a round that
    * SELF-JOINS its previous result doubles the logical plan tree per
    * iteration — O(2^rounds) analyzer/explain cost even though the data
    * and the RDD DAG stay linear (trees duplicate what DAGs share). One
    * `cutLineage` per round keeps every round's plan constant-size.
    * Same private-API surface policy as the converters above: this is
    * exactly what Spark's own checkpoint() builds internally
    * (LogicalRDD.fromDataset).
    */
  def cutLineage(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = false))
  }

  /** [[cutLineage]] with `isStreaming = true` — how a v1 streaming
    * [[execution.streaming.Source.getBatch]] returns an arbitrary
    * batch computation (the change feed's diffs are joins+aggregates):
    * MicroBatchExecution asserts the returned frame's plan IS streaming
    * before splicing it into the micro-batch, and the LogicalRDD leaf
    * satisfies that while the underlying RDD still computes lazily
    * inside the batch. The same move Spark's own FileStreamSource makes
    * with internalCreateDataFrame(isStreaming = true). */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = true))
  }

  /** EAGER Column → Expression conversion. [[columnExpr]] defers: it
    * wraps the column's node in a lazily-converted placeholder that only
    * resolves when the Column crosses a Dataset boundary — fine for the
    * Column API, but an expression returned from a SQL FunctionBuilder
    * never crosses one, and the placeholder survives to execution as
    * Unevaluable. This walks the ColumnNode tree to a real Expression
    * immediately (unresolved functions inside it resolve in the
    * analyzer's fixed point like any SQL).
    */
  def columnExprEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap an (analyzed or analyzable) logical plan as a DataFrame —
    * the plan-level twin of [[exprColumn]], needed by analyzer rules
    * that graft a DataFrame-built subtree into the plan under
    * resolution (the layered-table fold). Same `private[sql]` surface
    * policy as the converters above. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's injected extended resolution rules — how a data
    * source can VERIFY the extension rule it depends on is actually
    * installed before returning a relation whose correctness needs it
    * (a layered graft table served raw would silently drop updates). */
  def extendedResolutionRules(spark: SparkSession)
      : Seq[catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]] =
    spark.asInstanceOf[classic.SparkSession].sessionState.analyzer
      .extendedResolutionRules

  /** Catalyst predicate → v1 data-source [[sources.Filter]] — Spark's
    * own pushdown translation (`DataSourceStrategy.translateFilter`,
    * `private[sql]`), reused so a DELETE condition translates EXACTLY
    * the way scan pushdown would. */
  def translateV1Filter(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = true)

  /** v1 [[sources.Filter]] → connector v2 Predicate (the
    * `private[sql]` bridge `Filter.toV2`). */
  def filterToV2(f: sources.Filter)
      : connector.expressions.filter.Predicate =
    f.toV2

  /** A v1 [[execution.streaming.runtime.StreamingRelation]] leaf over a
    * named source provider — how an analyzer rule swaps a DSv2
    * streaming relation for a v1 micro-batch Source (the
    * `readStream.table` front door). The provider's `sourceSchema`
    * supplies the relation's name and output. Same `private[sql]`
    * surface policy as the converters above. */
  def v1StreamingRelation(spark: SparkSession, className: String,
      options: Map[String, String])
      : catalyst.plans.logical.LogicalPlan =
    execution.streaming.runtime.StreamingRelation(
      execution.datasources.DataSource(
        spark.asInstanceOf[classic.SparkSession], className,
        options = options))

  /** Register a SQL function on a LIVE session's function registry — the
    * runtime twin of `SparkSessionExtensions.injectFunction` (which only
    * applies at session construction via `spark.sql.extensions`). Same
    * builder triple, same registry, same `private[sql]` surface policy
    * as the converters above.
    */
  def registerSqlFunction(spark: SparkSession, name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
}

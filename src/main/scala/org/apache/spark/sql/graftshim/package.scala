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
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters in Spark 4's
  * split sql-api (Column wraps a ColumnNode; catalyst Expressions need the
  * classic converter). Standard extension-library technique — same-package
  * access, no reflection.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

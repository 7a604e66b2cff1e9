package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's public `Column` wraps a connect-compatible ColumnNode; the
  * converters to/from Catalyst `Expression` live in the `sql.classic`
  * package-private API, so libraries that define native expressions expose
  * them through a package-internal accessor like this one (the same
  * technique frameless/delta use for their expression surfaces).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

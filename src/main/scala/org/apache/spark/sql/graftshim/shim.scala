package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and catalyst `Expression`s.
  *
  * Spark 4 made the Column<->Expression converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim re-exports
  * them for graft's custom codegen expressions. Lives in a subpackage of
  * `org.apache.spark.sql` solely for access; contains no Spark-internal
  * logic.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters of Spark 4
  * (Column is ColumnNode-backed in 4.x; `classic.ExpressionUtils` holds the
  * conversions). Lives in the org.apache.spark.sql package solely to satisfy
  * the access modifier — the standard extension pattern (cf. SNIPPETS.md [3],
  * a public DatasetFactory doing the same for Dataset). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

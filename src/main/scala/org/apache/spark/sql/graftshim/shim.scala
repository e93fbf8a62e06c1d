package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark-private Column↔Expression converters (Spark 4 routes
  * Column through ColumnNode; the converters live behind `private[sql]`).
  * Lives in the org.apache.spark.sql package purely for access — the
  * pattern used by Spark extension libraries for custom expressions.
  */
package object graftshim {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

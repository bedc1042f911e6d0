package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Column ↔ catalyst Expression bridging for graft's native expressions.
  * Lives under `org.apache.spark.sql` because the Column companion's
  * node-based constructor is `private[sql]` in the classic runtime. */
object Bridge {
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
  def toExpression(c: Column): Expression = ColumnConversions.expression(c)
}

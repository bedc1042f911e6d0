package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridging for the engine's native
  * expressions (classic Spark runtime). */
object Exprs {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(e)
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.toExpression(c)
}

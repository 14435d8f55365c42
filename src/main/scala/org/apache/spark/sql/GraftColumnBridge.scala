package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, so graft
  * can wrap its native Catalyst expressions (graft.functions.VectorDot,
  * LshSignature) into Columns without requiring every session to be built
  * with SparkSessionExtensions. This is the conventional extension-library
  * pattern (a one-object file in the org.apache.spark.sql package); no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 wraps `Column` around a `ColumnNode` and gates the Expression
  * constructors behind `private[sql]`; third-party native expressions
  * (graft.functions.CosineSim) still need the conversion, so this one-file
  * shim lives in the `org.apache.spark.sql` package — the same pattern
  * Spark-native libraries use. No other graft code sits in Spark's
  * namespace.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on a LIVE session's registry (the
    * `spark.sql.extensions` route only applies at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}

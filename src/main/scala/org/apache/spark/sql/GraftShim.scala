package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals, the conventional
  * extension-library pattern: Column <-> catalyst Expression conversion and
  * session-local SQL function registration for custom expressions.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Registers `name` as a temp SQL function backed by `builder`, so the
    * expression is usable from spark.sql / selectExpr strings too.
    */
  def register(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "builtin")
}

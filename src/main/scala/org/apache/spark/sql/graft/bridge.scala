package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst-Expression bridge. Spark 4 marks ExpressionUtils
  * private[sql], so this one-file shim lives under org.apache.spark.sql to
  * expose the two conversions graft's custom expressions need. No Spark
  * internals are modified.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

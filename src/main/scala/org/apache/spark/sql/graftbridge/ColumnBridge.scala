package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the classic backend (the Spark 4 Column is
  * backend-agnostic; converting a raw Catalyst Expression into a Column is
  * `private[sql]`, so library code exposing native expressions needs this
  * one-hop bridge — the standard pattern for Spark extension libraries). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

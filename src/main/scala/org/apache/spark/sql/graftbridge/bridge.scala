package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to Spark's `private[sql]` Column <-> catalyst Expression
 * converters (org.apache.spark.sql.classic.ExpressionUtils — Spark 4 moved
 * Column to a backend-agnostic node model, leaving no public constructor
 * from an Expression). Lives under the org.apache.spark.sql package solely
 * to satisfy the access scope; nothing else of Spark's internals is touched.
 */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

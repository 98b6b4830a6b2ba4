package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column <-> Expression
  * converters (Spark 4 moved classic Column internals behind the Connect
  * API split; extensions that define native Catalyst expressions need this
  * shim — the standard pattern for out-of-tree Spark libraries).
  */
object glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst expression -> v1 source Filter, Spark's own translation
    * (`protected[sql]` on DataSourceStrategy) — the mapping the V2
    * pushdown rule applies, reused by the store's SQL-string predicate
    * so SQL DML prunes exactly like the planner.
    */
  def translateFilter(e: Expression, supportNestedPredicatePushdown:
      Boolean): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown)
}

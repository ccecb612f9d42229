package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Catalyst Expression bridge. Spark 4 hides the expression
 * constructor of `Column` behind `private[sql]`; placing this one-file shim
 * inside the `org.apache.spark.sql` namespace is the standard pattern for
 * libraries that ship custom codegen expressions without forking Spark
 * (no Spark internals are modified — we only call two utility methods).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a session-scoped SQL function
    * (usable from `spark.sql` / `expr`). */
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

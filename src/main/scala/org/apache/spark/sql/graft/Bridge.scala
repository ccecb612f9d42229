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

  /** Rebuild a checkpointed DataFrame's `LogicalRDD` leaf with exact, bounded
    * statistics from an observed row count.
    *
    * Why this exists: `Dataset.localCheckpoint` copies the origin plan's
    * ESTIMATED `Statistics` into the `LogicalRDD` it produces. In an iterative
    * join loop (CCF / pointer-jumping fixpoints) the estimate compounds — a
    * join's default `sizeInBytes` estimate is the PRODUCT of its children's,
    * so each round's checkpoint carries roughly the SQUARE of the previous
    * round's estimate. The `BigInt` doubles in digit count per round and from
    * ~round 18 planning time is 100% `BigInteger.multiply` (measured: ×2.9
    * per round, 100+ s/round by round 24 on a 2 000-node toy graph).
    * Supplying the true row count each round resets the estimate to the truth,
    * keeps planning O(1) per round, and gives the planner an honest input for
    * broadcast decisions. No-op for non-`LogicalRDD` plans. */
  def withStats(df: org.apache.spark.sql.DataFrame, rowCount: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val size = BigInt(math.max(1L, rowCount)) * math.max(8, df.schema.defaultSize)
        val stats = Statistics(sizeInBytes = size, rowCount = Some(BigInt(math.max(0L, rowCount))))
        org.apache.spark.sql.classic.Dataset.ofRows(spark, LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(spark, Some(stats), None))
      case _ => df
    }
  }
}

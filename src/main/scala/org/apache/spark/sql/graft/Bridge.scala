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
  /** Non-blocking-ish read of an `Observation`'s metrics (`getOrEmpty` is
    * `private[sql]`; it waits ≤100 ms internally, then returns empty if the
    * metrics haven't been delivered). Lets callers poll with a deadline
    * instead of the unbounded `get`. */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty

  /**
   * A session-free handle to an eagerly checkpointed DataFrame: the pieces of
   * its `LogicalRDD` leaf that do NOT reference a `SparkSession` (the RDD pins
   * only the shared `SparkContext`). Caching one of these instead of the
   * DataFrame itself lets a cache detect abandoned sessions via a
   * `WeakReference` — a cached DataFrame would strongly pin its session
   * forever (ADVICE r03) — and rebind the data to any live session on the
   * same context.
   */
  final case class CheckpointHandle(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      partitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning,
      ordering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
      stats: org.apache.spark.sql.catalyst.plans.logical.Statistics) {

    /** Rebind to a live session. Reuses the captured output attributes, so two
      * handles-to-DataFrames of the same entry share expr-ids — same situation
      * as handing out one cached DataFrame twice; `DeduplicateRelations`
      * disambiguates self-joins as usual. */
    def toDF(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      org.apache.spark.sql.classic.Dataset.ofRows(cs, org.apache.spark.sql.execution.LogicalRDD(
        output, rdd, partitioning, ordering, false, None)(cs, Some(stats), None))
    }

    /** Drop the checkpoint's block-manager storage (safe once unreferenced). */
    def free(): Unit = try rdd.unpersist(false) catch { case _: Throwable => () }
  }

  object CheckpointHandle {
    /** Capture from a checkpoint-rooted DataFrame; forces an eager
      * `localCheckpoint` first if the plan isn't already a bare `LogicalRDD`. */
    def of(df: org.apache.spark.sql.DataFrame): CheckpointHandle = {
      val lr = df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l
        case _ => df.localCheckpoint(true).queryExecution.analyzed
          .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      }
      CheckpointHandle(lr.rdd, lr.output, lr.outputPartitioning, lr.outputOrdering, lr.stats)
    }
  }

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

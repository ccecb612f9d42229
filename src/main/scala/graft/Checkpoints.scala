package graft

import org.apache.spark.sql.DataFrame

/**
 * Central eager-materialization point for every fixpoint round and memoized
 * shared build (CCF/PointerJump rounds, SessionCache entries, staged TF-IDF
 * tables, incremental-dedup batches).
 *
 * Default is `localCheckpoint(eager = true)`: blocks live on executors —
 * fastest, but a lost executor loses its blocks and the job must rerun
 * (acceptable for iterative refinement on a healthy cluster, and the only
 * option on `local[*]`).
 *
 * For real clusters with preemption/autoscaling, set the session conf
 * [[Checkpoints.DirKey]] (`spark.graft.checkpointDir`) to a DFS path:
 * every site here then routes through reliable `checkpoint()` instead, whose
 * files survive executor loss. The flag also wires
 * `spark.sparkContext.setCheckpointDir` on first use if unset.
 *
 * Freeing: [[graft.ccf.CCF.freeCheckpoint]] unpersists executor blocks —
 * for reliable checkpoints that is a no-op on the DFS files, which are
 * reclaimed by `spark.cleaner.referenceTracking.cleanCheckpoints=true` or a
 * dir-level TTL sweep; peak DFS usage for a fixpoint is ~2 rounds of pairs.
 */
object Checkpoints {

  /** Session conf key: when set (non-empty), eager materializations use
    * reliable `checkpoint()` into this directory instead of
    * `localCheckpoint()`. */
  val DirKey = "spark.graft.checkpointDir"

  /** Eagerly materialize `df` and truncate its lineage — local by default,
    * reliable when [[DirKey]] is set on the session. */
  def eager(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // respect an explicitly-set context dir; otherwise wire the flag's
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** Postfix syntax so call sites read like the `localCheckpoint` they
    * replace: `df.eagerCheckpoint()`. */
  implicit final class EagerOps(private val df: DataFrame) extends AnyVal {
    def eagerCheckpoint(): DataFrame = Checkpoints.eager(df)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/**
 * Session-scoped DataFrame memoization for derived-once-read-many inputs
 * (CCF assignments, co-purchase edges, jaccard pair sets — each shared by
 * several queries; re-deriving would multiply the dominant bench cost).
 *
 * Keyed by a minted per-session UUID — NOT `System.identityHashCode`, whose
 * value can be reused for a new session after the old one is GC'd, silently
 * handing back a DataFrame bound to a dead plan (ADVICE r02). The UUID map is
 * a `WeakHashMap` with reference-equality keys (sessions don't override
 * equals) whose values don't reference the key, so an unreachable session's
 * id entry is collectable. Cache entries whose `SparkContext` has stopped are
 * purged on every access (their checkpoint blocks died with the executors),
 * and long-lived services can evict a live session's entries explicitly with
 * [[clear]], which also frees the checkpoint storage behind each cached plan.
 */
private[queries] final class SessionCache[K] {
  private val m = TrieMap.empty[(String, K), DataFrame]

  def getOrElseUpdate(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    purgeStopped()
    m.getOrElseUpdate((SessionCache.idOf(s), k), build)
  }

  /** Evict one session's entries, unpersisting each cached checkpoint. */
  def clear(s: SparkSession): Unit =
    m.keys.filter(_._1 == SessionCache.idOf(s)).foreach { k =>
      m.remove(k).foreach(graft.ccf.CCF.freeCheckpoint)
    }

  private def purgeStopped(): Unit =
    m.filterInPlace((_, df) => !df.sparkSession.sparkContext.isStopped)

  private[queries] def size: Int = m.size
}

private[queries] object SessionCache {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def idOf(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)
}

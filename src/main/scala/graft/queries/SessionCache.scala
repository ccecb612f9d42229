package graft.queries

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.Bridge
import scala.collection.concurrent.TrieMap

/**
 * Session-scoped DataFrame memoization for derived-once-read-many inputs
 * (CCF assignments, co-purchase edges, jaccard pair sets — each shared by
 * several queries; re-deriving would multiply the dominant bench cost).
 *
 * Keyed by a minted per-session UUID — NOT `System.identityHashCode`, whose
 * value can be reused for a new session after the old one is GC'd, silently
 * handing back a DataFrame bound to a dead plan (ADVICE r02).
 *
 * Lifecycle (ADVICE r03): entries hold a session-free
 * [[Bridge.CheckpointHandle]] (checkpoint RDD + attributes — pins only the
 * shared `SparkContext`) plus a `WeakReference` to the owning session. A
 * cached DataFrame would strongly pin its session, so an abandoned
 * `newSession()` could never be detected; with the weak ref, once the caller
 * drops the session, `purgeDead()` (run on every access) unpersists the
 * orphaned checkpoint blocks. Stopped-context entries are purged the same
 * way, and long-lived services can evict a live session's entries explicitly
 * with [[clear]].
 */
private[queries] final class SessionCache[K] {
  private val m = TrieMap.empty[(String, K), SessionCache.Entry]

  def getOrElseUpdate(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    purgeDead()
    val key = (SessionCache.idOf(s), k)
    m.get(key) match {
      case Some(e) => e.handle.toDF(s)
      case None =>
        val df = build // eagerly checkpointed by the caller's build
        val e = SessionCache.Entry(new WeakReference(s), Bridge.CheckpointHandle.of(df))
        m.putIfAbsent(key, e) match {
          case None => df
          case Some(winner) =>
            // Lost a concurrent first-access race (ADVICE r03): free the
            // orphan checkpoint we just built instead of leaking it until GC.
            e.handle.free()
            winner.handle.toDF(s)
        }
    }
  }

  /** Evict one session's entries, unpersisting each cached checkpoint. */
  def clear(s: SparkSession): Unit =
    m.keys.filter(_._1 == SessionCache.idOf(s)).foreach { k =>
      m.remove(k).foreach(_.handle.free())
    }

  /** Drop entries whose owning session was GC'd (abandoned `newSession()`)
    * or whose context stopped, unpersisting their checkpoint storage. */
  private def purgeDead(): Unit =
    m.filterInPlace { (_, e) =>
      val alive = e.alive
      if (!alive) e.handle.free()
      alive
    }

  private[queries] def size: Int = m.size
}

private[queries] object SessionCache {

  private final case class Entry(owner: WeakReference[SparkSession],
                                 handle: Bridge.CheckpointHandle) {
    def alive: Boolean = {
      val s = owner.get()
      s != null && !s.sparkContext.isStopped
    }
  }

  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Minted per-session UUID (see class scaladoc for why not
    * identityHashCode) — shared with the non-DataFrame memo maps (e.g. the
    * persisted-IVF index directory in [[SimilarityQueries]]). */
  private[queries] def idOf(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)
}

package graft.queries

import graft.SparkSpec

/** Session lifecycle of the memoization caches (ADVICE r02): entries are
  * keyed per session (no identityHashCode reuse hazard), hit on reuse, and
  * evictable per session without touching other sessions' entries. */
class SessionCacheSpec extends SparkSpec {

  test("graph caches: per-session entries, reuse hits, explicit eviction") {
    val s2 = spark.newSession()
    val before = GraphQueries.cachedEntryCount
    GraphQueries.defs("dedup_pairs")(s2, sf()).count()
    assert(GraphQueries.cachedEntryCount === before + 1)
    GraphQueries.defs("dedup_pairs")(s2, sf()).count() // same session: cache hit
    assert(GraphQueries.cachedEntryCount === before + 1)
    GraphQueries.clearCaches(s2)
    assert(GraphQueries.cachedEntryCount === before)
  }

  test("cache hit rebinds the checkpoint handle to a live DataFrame (same rows)") {
    val s2 = spark.newSession()
    try {
      val first = GraphQueries.defs("dedup_pairs")(s2, sf())
      val again = GraphQueries.defs("dedup_pairs")(s2, sf()) // hit: handle.toDF
      assert(again.count() === first.count())
      // the rebound frame must be fully usable in further plans
      assert(again.join(first, again.columns.toSeq).count() === first.count())
    } finally GraphQueries.clearCaches(s2)
  }

  test("dedup cache: eviction scoped to the session") {
    val s2 = spark.newSession()
    val s3 = spark.newSession()
    val before = DedupQueries.cachedEntryCount
    DedupQueries.defs("d2_ngram_jaccard")(s2, sf()).count()
    DedupQueries.defs("d2_ngram_jaccard")(s3, sf()).count()
    assert(DedupQueries.cachedEntryCount === before + 2)
    DedupQueries.clearCaches(s2)
    assert(DedupQueries.cachedEntryCount === before + 1)
    DedupQueries.clearCaches(s3)
    assert(DedupQueries.cachedEntryCount === before)
  }
}

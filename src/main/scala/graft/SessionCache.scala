package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped shared persisted intermediates (the "materialize the
  * signature table once" step of a production dedup pipeline — TextOps
  * shingles/minhashes, VectorOps band keys, ...).
  *
  * Keyed by a WeakHashMap on the session OBJECT, not an identity hash
  * string (round-3 ADVICE): a stopped session's entry set — and the session
  * itself — become collectable instead of leaking for the JVM lifetime,
  * and an identity-hash collision after address reuse can never hand a new
  * session a DataFrame bound to a dead one. Cached blocks die with the
  * session's BlockManager on session.stop().
  *
  * The inner build is NOT computeIfAbsent: a shared entry may be built FROM
  * another shared entry (src_grams → shingles), and a nested
  * computeIfAbsent on one map throws "Recursive update" when the keys land
  * in the same bin. Build outside the map, publish with putIfAbsent. */
object SessionCache {

  private val caches =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def mapFor(s: SparkSession) = caches.synchronized {
    var m = caches.get(s)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      caches.put(s, m)
    }
    m
  }

  def getOrBuild(s: SparkSession, key: String)(df: => DataFrame): DataFrame = {
    val m = mapFor(s)
    val existing = m.get(key)
    if (existing != null) existing
    else {
      val d = df
      val prev = m.putIfAbsent(key, d)
      if (prev != null) prev
      else {
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d
      }
    }
  }

  /** Evict ONE entry: unpersist its blocks and forget the key, so the
    * next getOrBuild re-derives and re-persists it. A 100 TB session
    * that walks several corpora cannot keep every corpus-sized shared
    * projection pinned for its lifetime — the policy is: PIN the
    * projections of the corpus currently being processed (they feed
    * dozens of queries each), DROP a corpus's entries when the pipeline
    * moves past it. Dropping is always safe: entries are pure
    * derivations of the source tables, and a dependent built FROM a
    * dropped entry recomputes through its (still valid) plan.
    * Returns true iff the key was present. */
  def drop(s: SparkSession, key: String): Boolean = {
    val d = mapFor(s).remove(key)
    if (d != null) { d.unpersist(blocking = false); true } else false
  }

  /** Evict every entry of this session (e.g. before re-pointing one
    * long-lived session at a new corpus). Returns the entry count. */
  def clear(s: SparkSession): Int = {
    val m = mapFor(s)
    val keys = m.keySet().toArray(Array.empty[String])
    keys.count(drop(s, _))
  }
}

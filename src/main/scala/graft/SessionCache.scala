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
}

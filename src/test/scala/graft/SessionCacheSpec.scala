package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Eviction contract for the session-scoped shared-projection cache
  * (round-10 verdict #5): a 100 TB session that builds several
  * corpus-sized prefix/shingle/band tables needs an unpersist hook —
  * and a dropped entry must REBUILD correctly on next use, because
  * entries are pure derivations of the source tables.
  */
class SessionCacheSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("drop evicts blocks and forgets the key; next getOrBuild rebuilds") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1L, 2L, 3L).toDF("v") }
    val key = "spec|drop|a"
    val d1 = SessionCache.getOrBuild(spark, key)(build())
    assert(d1.count() == 3 && builds == 1)
    // cached: a second get returns the SAME frame, no rebuild
    val d2 = SessionCache.getOrBuild(spark, key)(build())
    assert((d2 eq d1) && builds == 1)
    assert(d1.storageLevel.useMemory, "entry must be persisted")
    // drop: blocks released, key forgotten
    assert(SessionCache.drop(spark, key))
    assert(d1.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "dropped entry must be unpersisted")
    assert(!SessionCache.drop(spark, key), "second drop is a no-op")
    // rebuild: a fresh derivation, same data, persisted again
    val d3 = SessionCache.getOrBuild(spark, key)(build())
    assert(builds == 2 && !(d3 eq d1))
    assert(d3.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(SessionCache.drop(spark, key))
  }

  test("clear evicts every entry of the session and reports the count") {
    import spark.implicits._
    SessionCache.clear(spark) // isolate from other suites' entries
    val frames = (1 to 3).map { i =>
      SessionCache.getOrBuild(spark, s"spec|clear|$i")(Seq(i).toDF("v"))
    }
    frames.foreach(f => assert(f.count() == 1))
    assert(SessionCache.clear(spark) == 3)
    frames.foreach { f =>
      assert(f.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    }
    assert(SessionCache.clear(spark) == 0)
  }

  test("a dependent built FROM a dropped entry still recomputes correctly") {
    import spark.implicits._
    val baseKey = "spec|dep|base"
    val base = SessionCache.getOrBuild(spark, baseKey)(
      Seq((1L, "x"), (2L, "y")).toDF("k", "s"))
    // derived entry built FROM the shared base (the src_grams → shingles
    // pattern); materialize it, then drop only the base
    val derived = SessionCache.getOrBuild(spark, "spec|dep|child")(
      base.groupBy("s").count())
    assert(derived.count() == 2)
    assert(SessionCache.drop(spark, baseKey))
    // the derived frame's plan remains valid — recompute flows through
    // the (no longer cached) base derivation
    assert(derived.collect().map(_.getLong(1)).sum == 2)
    assert(SessionCache.drop(spark, "spec|dep|child"))
  }
}

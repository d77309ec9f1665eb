package graft

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative plans: eager localCheckpoint +
  * STATS reset.
  *
  * `localCheckpoint` truncates lineage but carries the ORIGIN plan's
  * estimated statistics onto the checkpointed node, and size-only stats
  * estimation multiplies children's `sizeInBytes` at every join. Any
  * loop that joins the previous round's checkpoint back onto itself (or
  * onto a fixed relation) therefore grows the estimate's BigInteger
  * digit count per round — linearly for one self-reference (Bellman-Ford
  * relaxation), exponentially for two (pointer doubling, k-core peel,
  * suffix-rank doubling). Past a few dozen rounds the DRIVER hangs
  * multiplying million-digit integers inside stats estimation before a
  * single task launches (found via q255's multi-probe kNN core, which
  * inflated the base estimate enough to hang planning outright at
  * sf0.01).
  *
  * Re-wrapping the checkpointed RDD in a fresh LogicalRDD
  * (`createDataFrame(ck.rdd, schema)`) resets the estimate, so planning
  * cost stays flat in the round number. Every 100 TB iterative operator
  * needs BOTH disciplines: lineage truncation (the q70 rule) AND stats
  * reset (this one). The row conversion runs once per round over the
  * loop's (small, usually shrinking) working set.
  */
object Barrier {
  def rebase(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}

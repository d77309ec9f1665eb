package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (not part of the driver contract): pins the
  * round-12 q254 jaccard-reuse win with ROW COUNTS at sf0.1 (r12 VERDICT
  * #8) — the after-plan has more exchange nodes and wins on data volume,
  * so the evidence is how many pairs actually pay the shingle-level
  * equi-join before vs after the reuse.
  *
  * Usage: runMain graft.ProbeQ254 [sfDir]
  */
object ProbeQ254 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val (pairs, _, need, sh) = graft.operators.TextOps.q254JoinVolumes(s, sfDir)
    val nPairs = pairs.count()
    val nNeed = need.count()
    val nSh = sh.count()
    // rows INTO the shingle equi-join: (pairs-side rows) and the shingle
    // table it joins twice. Before r12: all `pairs` paid it; after: only
    // the `need` remainder (md5-sampled near-diagonal pairs not already
    // materialized in the shared jaccard table).
    println(f"[q254] total_pairs=$nPairs%d  pairs_paying_shingle_join_after=$nNeed%d " +
      f"(before: $nPairs%d)  shingle_rows=$nSh%d  " +
      f"reduction=${100.0 - 100.0 * nNeed / math.max(1, nPairs)}%.1f%%")
    s.stop()
  }
}

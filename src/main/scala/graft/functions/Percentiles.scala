package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** K2/A4 percentile policy (SURVEY.md §2.8).
  *
  * `exact` is the oracle-parity form: Spark's `percentile` is a sort-based
  * aggregate that materializes a value→count map per group — fine when
  * groups are bounded (the reference computes percentiles PER VOLUME,
  * v2/patch_utils.py:28-30), but on an unbounded group at 100 TB the merge
  * is the scale killer.
  *
  * `approx` is the scale path: Spark's `approx_percentile`
  * (Greenwald-Khanna sketch) with accuracy `a` guarantees a RANK error of
  * at most n/a — with the default a = 10⁴ the returned value sits within
  * ±0.01% of the requested rank, at O(a·log n) memory per group
  * independent of group size, and the sketch merges associatively across
  * partitions (map-side combine works; no per-group sort).
  *
  * Rule: exact for per-volume statistics and oracle-checked queries;
  * approx for corpus-wide statistics over unbounded groups.
  */
object Percentiles {

  val DefaultAccuracy = 10000

  def exact(col: Column, p: Double): Column =
    percentile(col, lit(p))

  def approx(col: Column, p: Double, accuracy: Int = DefaultAccuracy): Column =
    approx_percentile(col, lit(p), lit(accuracy))

  def approxMulti(col: Column, ps: Seq[Double], accuracy: Int = DefaultAccuracy): Column =
    approx_percentile(col, array(ps.map(lit): _*), lit(accuracy))
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the user-facing `Aggregator[IN, BUF, OUT]`
  * form): Welford/Chan running statistics with an associative merge — the
  * partial+final shape the reference hand-rolls for its worker counters
  * (v2/nii_to_lmdb_paralel.py:204-215, 357-369), here done properly so any
  * partition split gives the same result.
  */
object StatsAggregator extends Aggregator[Double, StatsBuffer, StatsResult] {

  override def zero: StatsBuffer = StatsBuffer(0L, 0.0, 0.0)

  override def reduce(b: StatsBuffer, x: Double): StatsBuffer = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    StatsBuffer(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: StatsBuffer, b: StatsBuffer): StatsBuffer = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      StatsBuffer(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  override def finish(r: StatsBuffer): StatsResult =
    StatsResult(r.n, r.mean,
      if (r.n > 1) math.sqrt(r.m2 / (r.n - 1)) else Double.NaN)

  override def bufferEncoder: Encoder[StatsBuffer] = Encoders.product[StatsBuffer]
  override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
}

final case class StatsBuffer(n: Long, mean: Double, m2: Double)
final case class StatsResult(n: Long, mean: Double, stddev: Double)

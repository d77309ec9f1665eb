package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed `Aggregator`: at most K
  * counters, O(K) memory per partition REGARDLESS of stream cardinality —
  * the bounded-memory candidate generator for "frequent items" at 100 TB,
  * where an exact groupBy over the full item domain would shuffle the
  * corpus (here the domain is evicted down to K survivors and only those
  * are exactly recounted — the sketch-then-verify pattern).
  *
  * Guarantee (the one the q121 oracle leans on): any item with true
  * frequency > N/(K+1) is present in the merged summary. Eviction
  * (`reduce` miss on a full buffer) decrements ALL counters — the
  * classical algorithm; `merge` sums counterwise and, if over K entries,
  * subtracts the (K+1)-th largest count from every entry and drops the
  * non-positive remainder (Agarwal et al.'s mergeable-summaries rule,
  * which preserves the guarantee under Spark's partial-aggregate tree).
  * Estimated counts UNDER-approximate true counts by at most N/(K+1);
  * they are candidates, never answers — the exact verify pass recounts.
  */
final case class MGBuffer(m: Map[String, Long])

class MisraGries(k: Int) extends Aggregator[String, MGBuffer, MGBuffer] {

  override def zero: MGBuffer = MGBuffer(Map.empty)

  override def reduce(b: MGBuffer, x: String): MGBuffer =
    b.m.get(x) match {
      case Some(c) => MGBuffer(b.m.updated(x, c + 1))
      case None if b.m.size < k => MGBuffer(b.m.updated(x, 1L))
      case None =>
        // decrement-all: drop zeros, the classical eviction step
        MGBuffer(b.m.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        })
    }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    val combined = b.m.foldLeft(a.m) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) MGBuffer(combined)
    else {
      // subtract the (k+1)-th largest count from everyone, keep positive
      val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      MGBuffer(combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      })
    }
  }

  override def finish(r: MGBuffer): MGBuffer = r

  override def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
  override def outputEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
}

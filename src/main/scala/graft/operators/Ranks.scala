package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed contiguous 1-based sequence ids — the scale-honest
  * `row_number() OVER (ORDER BY ...)` that never funnels rows through a
  * single-partition window: global range-partitioned sort, then
  * zipWithIndex (per-partition offsets from one lightweight count pass).
  * Shared by the suffix-array tier (rank densification) and the shard
  * bin-packing planner (global size order). */
object Ranks {

  /** REQUIRES `keys` to be a TOTAL order over `df`'s rows (include a
    * unique tiebreak column, e.g. the row's id, as the last key). Ties
    * are broken by physical partition order, which is shuffle- and
    * scheduling-dependent — with ties the assigned ids are
    * NONDETERMINISTIC across runs, which silently breaks every consumer
    * that is hash-parity-gated on them (suffix ranks, q228's size order,
    * q242's neighborhood buckets all pass unique key sets). */
  def seqIdBy(df: DataFrame, idCol: String, keys: Column*): DataFrame = {
    val s = df.sparkSession
    val sorted = df.orderBy(keys: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    s.createDataFrame(rdd, schema)
  }
}

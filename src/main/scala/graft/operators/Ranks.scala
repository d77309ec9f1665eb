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

  def seqIdBy(df: DataFrame, idCol: String, keys: Column*): DataFrame = {
    val s = df.sparkSession
    val sorted = df.orderBy(keys: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    s.createDataFrame(rdd, schema)
  }
}

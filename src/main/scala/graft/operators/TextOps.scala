package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data text pipeline: deduplication (exact, MinHash+LSH, n-gram
  * Jaccard, SimHash), language ID, quality scoring, token counting, and
  * document fingerprinting over the `documents` table.
  *
  * Scale design notes (100 TB):
  *  - per-document features (hashes, scores, signatures) are computed with
  *    higher-order functions inside the row — zero shuffle;
  *  - candidate generation shuffles on LSH band / SimHash block keys only
  *    (never all-pairs); exact Jaccard runs on candidates only;
  *  - all hashing is deterministic (md5 of salted content) so task retries
  *    are stable (SURVEY.md K13 rule).
  */
object TextOps extends TextSharedCore
    with TextDedupQueries with TextCurationQueries with TextEvalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    dedupQueries ++ curationQueries ++ evalQueries

  val oracles: Map[String, String] =
    dedupOracles ++ curationOracles ++ evalOracles
}

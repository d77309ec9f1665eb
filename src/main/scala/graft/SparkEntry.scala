package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator family from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-dialect equivalent for the
  * driver's hash-compare (omitted only for non-SQL-expressible kernels,
  * which are covered by ScalaTest + rows-only checks instead).
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end pipeline (NIfTI → slices → seeded
    * split → degrade → tile → dark filter → per-split counters), Spark-first.
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.PipelineOps.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TextOps.queries ++
      operators.VectorOps.queries ++
      operators.MriOps.queries ++
      operators.Multimodal.queries ++
      operators.PipelineOps.queries ++
      operators.GapOps.queries ++
      operators.ScaleOps.queries ++
      operators.CorpusOps.queries ++
      operators.AnalyticsOps.queries ++
      operators.CurationOps.queries ++
      operators.RngParityOps.queries ++
      operators.SuffixOps.queries ++
      streaming.EventStreams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TextOps.oracles ++
      operators.VectorOps.oracles ++
      operators.MriOps.oracles ++
      operators.Multimodal.oracles ++
      operators.PipelineOps.oracles ++
      operators.GapOps.oracles ++
      operators.ScaleOps.oracles ++
      operators.CorpusOps.oracles ++
      operators.AnalyticsOps.oracles ++
      operators.CurationOps.oracles ++
      operators.RngParityOps.oracles ++
      operators.SuffixOps.oracles ++
      streaming.EventStreams.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout (TESTDATA.md):
  * one parquet file per table under the scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS,
      // no-UTC) across testdata generations; sniff the decoded type and
      // surface a uniform session-local TimestampType column either way.
      // This is the repo's ONE remaining conf write outside clone creation,
      // and it is race-free by construction: a CONSTANT value, set-only
      // (never restored), so concurrent writers always agree — unlike the
      // set/restore scoping the drain/loop session clones replaced.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Uniform µs TimestampType `ts` from any of the generations' physical
    * types: NANOS decode as long under nanosAsLong (floor-divide to µs —
    * matches DuckDB's ns→µs cast), MICROS without isAdjustedToUTC decodes
    * as TIMESTAMP_NTZ (cast is an instant-preserving no-op under the UTC
    * session both Verify and the specs pin). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
}

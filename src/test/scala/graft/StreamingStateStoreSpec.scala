package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** State-store realism for the streaming surface (SURVEY.md §2.11): every
  * stateful query (windowed aggs, session windows, dedup, fMGWS, the
  * stream-stream interval join) must produce identical results under the
  * default HDFS-backed state store AND RocksDB — the provider a production
  * cluster would run for large keyed state. Proves the queries don't lean
  * on HDFS-state-store-only behavior. */
class StreamingStateStoreSpec extends AnyFunSuite {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val stateful = Seq("q60_stream_tumbling", "q61_stream_sliding",
    "q62_stream_session", "q63_stream_dedup", "q64_stream_stateful",
    "q85_stream_stream_join", "q101_stream_corpus_ingest",
    "q107_stream_late_data", "q188_stream_chained_agg",
    "q196_stream_dedup_bounded")

  test("q60–q64 + q85 are provider-agnostic: identical results under HDFS and RocksDB state stores") {
    assert(Class.forName(RocksDb) != null) // the provider ships in Spark core

    def runAll(): Map[String, Seq[String]] =
      stateful.map { name =>
        val rows = streaming.EventStreams.queries(name)(spark, dir)
          .collect().map(_.toString).toSeq.sorted
        assert(rows.nonEmpty, s"$name returned no rows")
        name -> rows
      }.toMap

    val conf = "spark.sql.streaming.stateStore.providerClass"
    val hdfs = runAll() // default provider
    spark.conf.set(conf, RocksDb)
    try {
      val rocks = runAll()
      stateful.foreach { name =>
        assert(rocks(name) == hdfs(name),
          s"$name differs across state-store providers")
      }
    } finally spark.conf.unset(conf)
  }

  test("q107 actually drops late data: fewer groups than the batch aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = streaming.EventStreams.queries("q107_stream_late_data")(spark, dir)
    val batchGroups = Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count()
    val n = streamed.count()
    assert(n > 0, "q107 returned no rows")
    assert(n < batchGroups,
      s"no late-only groups were dropped (streamed=$n batch=$batchGroups) — " +
        "the watermark demo is vacuous")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery realism for the streaming surface (SURVEY.md §2.11):
  * a production ingest stream is stopped and restarted all the time; the
  * contract is end-to-end exactly-once — source offsets, dedup state and
  * the file-sink manifest must all survive the restart. This spec runs the
  * corpus-ingest shape (file source → stateful dropDuplicates → parquet
  * file sink) across a stop/restart with overlapping input, and asserts
  * each surviving row lands exactly once:
  *   - offsets recovered → the first file is not reprocessed,
  *   - dedup state recovered → re-sent doc_ids stay suppressed,
  *   - sink manifest recovered → no duplicate or orphan output files.
  */
class StreamingRecoverySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stop/restart with overlapping input is exactly-once end to end") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val in = java.nio.file.Files.createTempDirectory("graft_rec_in_")
    val out = java.nio.file.Files.createTempDirectory("graft_rec_out_").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_rec_chk_").toString
    def writeFile(lo: Long, hi: Long, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_rec_tmp_")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath, in.resolve(name))
      ()
    }
    val schema = docs.schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .dropDuplicates("doc_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    writeFile(0, 50, "d0.parquet")
    runOnce() // first run: ids 0..49
    writeFile(25, 75, "d1.parquet") // 25 re-sent duplicates + 25 new
    runOnce() // restarted from checkpoint

    val got = spark.read.parquet(out).groupBy("doc_id").count().collect()
    val dupes = got.filter(_.getAs[Long]("count") != 1L)
    assert(dupes.isEmpty,
      s"rows delivered more than once after restart: ${dupes.take(5).mkString(", ")}")
    assert(got.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 75L),
      "restart lost or fabricated rows — expected exactly doc_ids 0..74")
  }

  test("q200 foreachBatch MERGE sink: retry-idempotent, final state matches batch last-writer-wins") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val row = streaming.EventStreams.queries("q200_stream_merge_sink")(spark, dir).head()
    assert(row.getAs[Boolean]("idempotent_ok"),
      "re-applying a micro-batch changed the target — the sink is not retry-safe")
    // independent recomputation: global last-writer-wins over the events
    val want = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1).flatMap { case (u, xs) =>
        val last = xs.maxBy(x => (x._2, x._3))
        if (last._4 == "error") None else Some((u, last._5))
      }.toSeq
    assert(row.getAs[Long]("n_users") == want.length.toLong)
    assert(row.getAs[Long]("sum_cents") == want.map(_._2).sum)
  }
}

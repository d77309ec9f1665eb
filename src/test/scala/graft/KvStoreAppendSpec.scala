package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.KvStore

/** Exactly-once `appendBatch` for the KvStore DSv2 sink — the LmdbStore
  * ledger carried over (round-7 verdict #6): a replayed batch id is a
  * no-op (proven by byte-identical read-back, not just a return flag),
  * crashed-attempt residue is swept before adoption, and shard ids keep
  * ascending across appends through the coordinator-gated sink.
  */
class KvStoreAppendSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("key", "v")
      .selectExpr("key", "CAST(v AS BINARY) AS value",
        "array(1) AS shape", "'uint8' AS dtype")
      .repartition(2)
  }

  private def dump(path: String): Map[String, String] =
    KvStore.read(spark, path).collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("kvappend").toFile
    d.delete()
    d.getPath
  }

  test("replayed batch id is a no-op: no double-count, ledger remembers") {
    val path = tmpDir()
    KvStore.createCommitted(path)
    assert(KvStore.appendBatch(df("a" -> "1", "b" -> "2"), path, batchId = 0L))
    val after0 = dump(path)
    assert(after0 == Map("a" -> "1", "b" -> "2"))
    // at-least-once caller replays batch 0 with DIFFERENT (poisoned) data:
    // the ledger must refuse before anything is planned or written
    assert(!KvStore.appendBatch(df("a" -> "POISON"), path, batchId = 0L))
    assert(dump(path) == after0, "replay must leave the store byte-identical")
    assert(KvStore.appendBatch(df("c" -> "3"), path, batchId = 1L))
    assert(dump(path) == Map("a" -> "1", "b" -> "2", "c" -> "3"))
    assert(KvStore.committedBatchIds(path) == Set(0L, 1L))
    // replay of EITHER committed batch after more appends: still a no-op
    assert(!KvStore.appendBatch(df("x" -> "9"), path, batchId = 1L))
    assert(dump(path).size == 3)
  }

  test("shard ids ascend across appends; manifest is ledger + numeric order") {
    val path = tmpDir()
    KvStore.createCommitted(path)
    KvStore.appendBatch(df("a" -> "1", "b" -> "2"), path, batchId = 0L)
    KvStore.appendBatch(df("c" -> "3", "d" -> "4"), path, batchId = 1L)
    val lines = KvStore.manifestLines(path)
    val (ledger, shards) = lines.partition(_.startsWith("#"))
    assert(ledger.toSet == Set("#batch:0", "#batch:1"), s"ledger: $ledger")
    val ids = shards.map(_.stripPrefix("shard-").stripSuffix(".kv").toLong)
    assert(ids == ids.sorted && ids.distinct == ids,
      s"shard ids must be unique ascending: $ids")
    // batch 1's shards all sit after batch 0's max
    assert(ids.size >= 2)
  }

  test("crashed-attempt residue is swept, never adopted") {
    val path = tmpDir()
    KvStore.createCommitted(path)
    KvStore.appendBatch(df("a" -> "1"), path, batchId = 0L)
    // fake a crashed job: committed-named shard NOT in the manifest,
    // with sidecars, plus a task-attempt tmp file
    val root = new File(path)
    val w = new KvStore.ShardWriter(path, 99L)
    w.put("zz", "GHOST".getBytes, Seq(1), "uint8")
    w.close() // renames into shard-00099.kv + sidecars, but no manifest entry
    Files.write(new File(root, "shard-00050.kv.tmp-dead0").toPath, "junk".getBytes)
    val ghosts = root.listFiles().map(_.getName).filter(n =>
      n.startsWith("shard-00099") || n.contains(".tmp-"))
    assert(ghosts.nonEmpty)
    // residue is invisible to readers (manifest-driven)...
    assert(dump(path) == Map("a" -> "1"))
    // ...and the next appendBatch sweeps it from disk before writing
    KvStore.appendBatch(df("b" -> "2"), path, batchId = 1L)
    val left = root.listFiles().map(_.getName).filter(n =>
      n.startsWith("shard-00099") || n.contains(".tmp-"))
    assert(left.isEmpty, s"residue must be swept: ${left.mkString(",")}")
    assert(dump(path) == Map("a" -> "1", "b" -> "2"))
    // the ghost key is gone for good, not adopted by a later commit
    assert(KvStore.get(path, "zz").isEmpty)
  }

  test("commit() on a ledger-managed store: ledger carried, replay still no-op") {
    val path = tmpDir()
    KvStore.createCommitted(path)
    KvStore.appendBatch(df("a" -> "1"), path, batchId = 0L)
    // a library-path commit lands on the same store (mixed-flow caller):
    // the #batch ledger must survive the manifest rebuild...
    KvStore.commit(path)
    assert(KvStore.manifestLines(path).contains("#batch:0"),
      "commit() must carry ledger lines over")
    // ...so a later replay of batch 0 is STILL a no-op
    assert(!KvStore.appendBatch(df("a" -> "POISON"), path, batchId = 0L))
    assert(dump(path) == Map("a" -> "1"))
  }

  test("commit() sweeps a first-appendBatch crash (manifest with empty ledger)") {
    val path = tmpDir()
    KvStore.createCommitted(path) // manifest exists, zero #batch lines
    // fake the residue of a FIRST appendBatch that crashed mid-write:
    // a committed-named shard on disk, absent from the manifest
    val w = new KvStore.ShardWriter(path, 0L)
    w.put("ghost", "GHOST".getBytes, Seq(1), "uint8")
    w.close()
    // commit() must sweep the orphan, not adopt it — adoption would
    // double-count the batch when its replay later no-ops
    KvStore.commit(path)
    assert(dump(path).isEmpty, "orphan shard must be swept, not adopted")
    assert(KvStore.appendBatch(df("a" -> "1"), path, batchId = 0L),
      "batch 0 was never committed, so its replay must WRITE")
    assert(dump(path) == Map("a" -> "1"))
  }

  test("sweep is observable: every deleted residue path is returned (and logged)") {
    val path = tmpDir()
    KvStore.createCommitted(path)
    KvStore.appendBatch(df("a" -> "1"), path, batchId = 0L)
    // crash residue: a committed-named shard (plus sidecars) outside the
    // manifest, and a task-attempt tmp file
    val w = new KvStore.ShardWriter(path, 99L)
    w.put("ghost", "GHOST".getBytes, Seq(1), "uint8")
    w.close()
    Files.write(java.nio.file.Paths.get(path, "shard-00099.kv.tmp-dead1234"),
      Array[Byte](1, 2, 3))
    val swept = KvStore.sweepUncommitted(path)
    // silent deletion is the round-10 ADVICE failure mode: a caller who
    // (wrongly) dropped bare shards next to a ledger-managed store must
    // at least be able to SEE what was removed
    assert(swept.size == 5, s"expected .kv/.idx/.meta.txt/.bloom/.tmp swept, got $swept")
    assert(swept.exists(_.endsWith("shard-00099.kv")))
    assert(swept.exists(_.contains(".tmp-dead1234")))
    assert(dump(path) == Map("a" -> "1"), "committed data must survive the sweep")
    assert(KvStore.sweepUncommitted(path).isEmpty, "clean store sweeps nothing")
  }

  test("plain append continues after library-path write + commit") {
    val path = tmpDir()
    KvStore.write(df("a" -> "1", "b" -> "2"), path)
    KvStore.append(df("c" -> "3"), path)
    assert(dump(path) == Map("a" -> "1", "b" -> "2", "c" -> "3"))
    assert(KvStore.committedBatchIds(path).isEmpty) // un-ledgered flow
  }
}

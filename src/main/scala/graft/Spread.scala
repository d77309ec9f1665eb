package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Conditional round-robin spread before a provably heavy per-row kernel
  * (round-13; r12 VERDICT #1/#3).
  *
  * Round 12 put an unconditional `repartition(defaultParallelism)` ahead
  * of every expensive kernel because every testdata table is ONE parquet
  * file with ONE row group — the same failure mode as one unsplittable
  * gzip at 100 TB (guide §2.5 input skew): the kernel runs on a single
  * task regardless of cluster size. But unconditional is wrong at scale
  * in the other direction: a production input that already scans wide
  * (many files / many row groups) gains nothing from a round-robin
  * shuffle of the full payload column — pure added cost (§2.4 surplus
  * exchange; keyless repartition additionally pays the
  * sortBeforeRepartition local sort of its input).
  *
  * `ifNarrow` spreads ONLY when the plan's file sources cannot reach the
  * session's parallelism on their own. The decision mirrors Spark's own
  * split arithmetic (FilePartition.maxSplitBytes) and then caps it by the
  * parquet ROW-GROUP count: Spark will happily cut a one-row-group file
  * into 32 byte-range "splits", but only the split containing the row
  * group's midpoint produces rows — the rest are empty tasks, so actual
  * scan parallelism is the row-group count, not the split count.
  *
  * The check costs one analyzed-plan traversal (`inputFiles` — no job)
  * plus, for narrow file sets, one parquet footer read per file, cached
  * by (path, length) for the session-independent lifetime of the path
  * (testdata and Scratch staging files are immutable-once-written).
  */
object Spread {

  /** (path|length) → row-group count, shared across sessions; bounded in
    * practice by the number of distinct staged files a process touches. */
  private val rowGroupCache =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** `df` unchanged when its file sources already scan at or above
    * `defaultParallelism` effective tasks; otherwise the round-robin
    * spread that keeps a heavy downstream kernel off a single task. */
  def ifNarrow[T](s: SparkSession, df: Dataset[T]): Dataset[T] = {
    val par = s.sparkContext.defaultParallelism
    if (effectiveScanParallelism(s, df) >= par) df
    else df.repartition(par)
  }

  /** Best-effort effective scan parallelism of `df`'s file sources:
    * min(Spark's split count, parquet row-group count), but at least the
    * file count (every non-empty file yields ≥ 1 non-empty task when
    * splits ≥ files). 0 when the plan has no file source (an in-memory
    * or cached leaf) — "cannot prove wide", so callers spread, which is
    * the pre-round-13 behavior. */
  private[graft] def effectiveScanParallelism(s: SparkSession, df: Dataset[_]): Int = {
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) return 0
    val par = s.sparkContext.defaultParallelism
    // every file is ≥ 1 task — enough files IS enough parallelism, and
    // skipping the footer reads keeps the check O(1) for wide layouts
    if (files.length >= par) return files.length
    val conf = s.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val hconf = s.sparkContext.hadoopConfiguration
    val sized = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val len = try p.getFileSystem(hconf).getFileStatus(p).getLen
        catch { case _: Throwable => 0L }
      (f, p, len)
    }
    // Spark's own split arithmetic (FilePartition.maxSplitBytes)
    val totalPadded = sized.map(_._3 + openCost).sum
    val minPartitionNum = conf.filesMinPartitionNum.getOrElse(par)
    val maxSplit = math.max(1L, math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalPadded / math.max(1, minPartitionNum))))
    val splits = math.ceil(totalPadded.toDouble / maxSplit).toInt
    // parquet scan granularity is the row group; a non-parquet source
    // (splittable text/json) keeps the raw split count for its share
    val rowGroupCap = sized.foldLeft(0L) { case (acc, (f, p, len)) =>
      acc + (if (f.endsWith(".parquet")) rowGroupCount(p, len, hconf).toLong
             else splits.toLong)
    }
    math.max(files.length,
      math.min(splits.toLong, rowGroupCap).min(Int.MaxValue).toInt)
  }

  private def rowGroupCount(p: org.apache.hadoop.fs.Path, len: Long,
      hconf: org.apache.hadoop.conf.Configuration): Int = {
    val key = s"$p|$len"
    val cached = rowGroupCache.get(key) // null unboxes to 0 = absent
    if (cached != 0) return cached
    val n = try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRowGroups.size() finally r.close()
    } catch { case _: Throwable => 1 }
    rowGroupCache.put(key, math.max(1, n))
    math.max(1, n)
  }
}

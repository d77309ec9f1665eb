package graft

/** One per-JVM scratch root for every temp store the operators write
  * (signature stores, KV shards, stream source/sink dirs, bucketed-table
  * roots, session warehouses). All of it is deleted recursively by a
  * shutdown hook — `File.deleteOnExit` is a no-op on non-empty dirs, so
  * before this existed repeated Verify/Bench JVMs accumulated full parquet
  * copies under /tmp (round-3 ADVICE). Dirs stay unique per call (append
  * sinks and idempotency probes must not see a previous rep's files), so
  * within one JVM the footprint is bounded by that run's own writes. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r.toFile)))
    r
  }

  /** A fresh unique dir under the cleaned-at-exit root. */
  def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  /** Same, as a Path (for call sites that resolve children). */
  def freshPath(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)

  /** Eagerly drop a scratch dir a long-running caller is done with (the
    * exit hook only covers JVM shutdown — a 24/7 streaming job would
    * otherwise accumulate one dir per micro-batch). */
  def delete(p: java.nio.file.Path): Unit = deleteRecursively(p.toFile)

  /** Drop every scratch dir EXCEPT the listed live ones (absolute paths).
    * For a long sweep's quiescent points (nothing mid-flight): each query
    * run creates fresh dirs, so everything else under the root is a dead
    * store/checkpoint/staging dir — on tmpfs that residue is RAM, and
    * 250 queries of it measurably disturbs late timings (round-9 verdict:
    * rerun-pass numbers above in-sweep for stateful queries). */
  def sweepExcept(live: Set[String]): Unit = {
    // canonicalize BOTH sides: the stored Scratch.fresh result and the
    // listing may differ in symlink resolution (tmpdir on a symlinked
    // mount) or separators — an exact-string compare would then silently
    // delete the live dir the caller meant to protect (round-10 ADVICE)
    def canon(p: String): String =
      try new java.io.File(p).getCanonicalPath
      catch { case _: java.io.IOException => p }
    val liveC = live.map(canon)
    val kids = root.toFile.listFiles()
    if (kids != null)
      kids.filterNot(k => liveC.contains(canon(k.getAbsolutePath)))
        .foreach(deleteRecursively)
    ()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}

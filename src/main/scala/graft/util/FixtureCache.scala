package graft.util

/** Memoized fixture builds for queries whose INPUT is a materialized
  * scratch layout (stream snapshot files, signature tables). The operator
  * under test/bench re-runs on every invocation, but rebuilding an
  * identical input fixture per-invocation (per warmup + per bench repeat)
  * only re-times the fixture writer — VERDICT r2 item 2 calls this out as
  * the honest lever on the streaming trio. Keyed by (tag, sfDir) so
  * different scale factors never share a fixture; builds land in Scratch
  * dirs and are deleted at JVM exit like every other intermediate.
  */
object FixtureCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The fixture directory for (tag, sfDir), building it with `build` on
    * first request in this JVM and reusing it afterwards. REENTRANT:
    * builds may request other fixtures (a cluster fixture materializing
    * the shingle table it is built from), which
    * `ConcurrentHashMap.computeIfAbsent` would reject as a recursive
    * update — hence the double-checked synchronized block (same-thread
    * reentry is fine; concurrent first-builds serialize, which they did
    * per-key before too).
    */
  /** Cached analyzed relation over a memoized fixture dir: builds the
    * fixture once per JVM AND lists/schema-infers it once per session
    * (graft.sources.Tables.cachedParquet) — a per-call
    * `spark.read.parquet` re-pays 100-300 ms of driver I/O for a dir
    * this cache guarantees immutable after build.
    */
  def parquet(spark: org.apache.spark.sql.SparkSession, tag: String, sfDir: String)(
      build: String => Unit): org.apache.spark.sql.DataFrame =
    graft.sources.Tables.cachedParquet(spark, dir(tag, sfDir)(build))

  def dir(tag: String, sfDir: String)(build: String => Unit): String = {
    val key = s"$tag|$sfDir"
    val hit = cache.get(key)
    if (hit != null) return hit
    synchronized {
      val again = cache.get(key)
      if (again != null) return again
      val d = Scratch.dir(tag)
      build(d)
      cache.put(key, d)
      d
    }
  }

  /** Cross-JVM durable fixture reuse (round-9 VERDICT ask #3): committed
    * TIMELINE fixtures (multi-commit DML tables, trained ANN indexes) are
    * pure deterministic functions of (corpus, builder version), so a bench
    * rerun in a fresh JVM rebuilding a byte-identical 4-commit table or
    * re-training an identical quantizer only re-times the builder — the
    * same honesty argument as the in-JVM memo above, extended across
    * process restarts.
    *
    * Safety rules, in order of importance:
    *  - OPT-IN per process: only takes effect when
    *    `GRAFT_FIXTURE_DURABLE=1` (graft.Bench sets it for its own JVM);
    *    Verify and the test suites never set it, so the CORRECTNESS gate
    *    always exercises live builds — a stale cache can slow a bench,
    *    never fake a correctness pass.
    *  - keyed by an explicit caller FINGERPRINT (the "schema-hash"):
    *    builder changes bump it, and a mismatch is a different directory,
    *    never a reused one.
    *  - crash-safe: builds land in a `.tmp-<pid>` dir and publish by
    *    atomic rename; a loser of the rename race deletes its attempt and
    *    adopts the winner. A completeness marker guards against torn
    *    copies from a killed JVM.
    *
    * Falls back to the in-JVM [[dir]] when the env knob is off.
    */
  def durableDir(tag: String, sfDir: String, fingerprint: String)(
      build: String => Unit): String = {
    if (!sys.env.get("GRAFT_FIXTURE_DURABLE").contains("1") &&
        System.getProperty("graft.fixture.durable") != "1")
      return dir(tag, sfDir)(build)
    val key = s"$tag|$sfDir|durable"
    val hit = cache.get(key)
    if (hit != null) return hit
    synchronized {
      val again = cache.get(key)
      if (again != null) return again
      val root = sys.env.getOrElse("GRAFT_FIXTURE_CACHE", "/tmp/graft_fixture_cache")
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag|$sfDir|$fingerprint".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      val target = new java.io.File(root, s"$tag-$hash")
      val marker = new java.io.File(target, "_GRAFT_FIXTURE_OK")
      if (!marker.isFile) {
        val tmp = new java.io.File(root, s"$tag-$hash.tmp-${ProcessHandle.current.pid}")
        tmp.mkdirs()
        build(tmp.getAbsolutePath)
        java.nio.file.Files.write(tmp.toPath.resolve("_GRAFT_FIXTURE_OK"),
          fingerprint.getBytes("UTF-8"))
        if (!tmp.renameTo(target)) { // lost the publish race (or torn leftover)
          if (marker.isFile) deleteRecursively(tmp) // adopt the winner
          else { deleteRecursively(target); // torn dir from a killed JVM
            if (!tmp.renameTo(target)) { deleteRecursively(tmp)
              require(marker.isFile, s"durable fixture publish failed: $target") }
          }
        }
      }
      val d = target.getAbsolutePath
      cache.put(key, d)
      d
    }
  }

  /** Test hook: drop the in-JVM memo so a spec can exercise the
    * cross-JVM adoption path (a fresh JVM is exactly "empty memo, durable
    * dir present"). Later fixture requests rebuild into fresh scratch
    * dirs — slower, never wrong.
    */
  private[graft] def clearForTest(): Unit = cache.clear()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}

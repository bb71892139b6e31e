package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Per-session schema memoization shared by every footer-inference-skipping
  * read path (`Tables.cachedParquet/cachedScan`, the manifest layer's
  * per-version schema cache, the datasource's file index).
  *
  * Sessions are WEAK keys: a GC'd SparkSession drops its whole entry map,
  * so (a) a long-lived JVM cycling sessions can't grow without bound and
  * (b) an `identityHashCode` reused by a NEW session can never be served a
  * dead session's schema (round-7 ADVICE — the old flat map keyed by
  * `identityHashCode(spark)` had both defects). Within one live session
  * the entry count is bounded too: immutable fixture paths and committed
  * versions accumulate slowly, but a pathological version churn is capped
  * by a clear-on-overflow (a cache miss costs one footer job, never a
  * wrong answer).
  */
object SchemaCache {
  private val MaxEntriesPerSession = 8192

  private val bySession: java.util.Map[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, StructType]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, StructType]]())

  private def forSession(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, StructType] = {
    // synchronizedMap guards single calls only; the get-or-put compound
    // locks the same wrapper mutex the map uses internally
    val m = bySession.synchronized {
      var cur = bySession.get(spark)
      if (cur == null) {
        cur = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
        bySession.put(spark, cur)
      }
      cur
    }
    if (m.size > MaxEntriesPerSession) m.clear()
    m
  }

  /** Memoize `infer` under `key` for this session's lifetime. Callers must
    * pass keys whose content can never change (immutable paths, committed
    * version ids).
    */
  def cached(spark: SparkSession, key: String)(infer: => StructType): StructType =
    forSession(spark).computeIfAbsent(key, _ => infer)
}

package graft.model

import org.apache.spark.sql.SparkSession

/** Per-session memo used by Tables / DerivedGraph / GraphAnalytics.
  *
  * Keyed by the session OBJECT through a WeakHashMap: identity comparison
  * can never alias two sessions (unlike identityHashCode, which the JVM
  * may recycle after GC), and a stopped, unreferenced session's entries —
  * including any cached DataFrames/graphs bound to its dead context —
  * are collected instead of pinned for the JVM lifetime.
  */
final class SessionCache[K, V] {
  private val outer =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, V]]

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    val inner = outer.synchronized {
      var t = outer.get(spark)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[K, V]
        outer.put(spark, t)
      }
      t
    }
    inner.getOrElseUpdate(key, build)
  }
}

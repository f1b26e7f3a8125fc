package graft

import org.apache.spark.sql.SparkSession

/** One-per-(session, key) memo for expensive derived values
  * (sorted replay feeds, LPA labelings, kmeans assignments, dedup
  * closures) — the single source of the cache discipline that was
  * previously hand-rolled per pack:
  *
  *   - WEAK session keys: a stopped session's entries become
  *     collectable instead of leaking across test suites;
  *   - SOFT value references: a strongly-held value (a Dataset)
  *     reaches its own SparkSession and would make the weak key
  *     permanently reachable — the classic WeakHashMap value→key
  *     cycle its Javadoc warns about; soft refs break the cycle while
  *     surviving explicit System.gc() (they only clear under memory
  *     pressure);
  *   - compute OUTSIDE the monitor: a racing duplicate computation
  *     costs one redundant run, never a deadlock against Spark's own
  *     locks.
  */
final class SessionCache[V <: AnyRef] {
  private val cache = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.mutable.Map[String, java.lang.ref.SoftReference[V]]]()

  def getOrCompute(s: SparkSession, key: String)(compute: => V): V = {
    import scala.jdk.CollectionConverters._
    val byKey = cache.synchronized {
      cache.asScala.getOrElseUpdate(s, scala.collection.mutable.Map.empty)
    }
    byKey.synchronized(byKey.get(key).flatMap(r => Option(r.get))) match {
      case Some(v) => v
      case None =>
        val v = compute
        byKey.synchronized(byKey(key) = new java.lang.ref.SoftReference(v))
        v
    }
  }
}

package graft.operators

import java.util.concurrent.atomic.AtomicLong

/** TTL memo for driver-side VALUES (trained weights, codebooks) — the
  * [[CachedRelation]] staleness contract for memos that hold pure
  * Scala data instead of persisted DataFrames. The round-13 VERDICT
  * found `clsMemo` (trained classifier weights) keyed by fixture dir
  * alone with no TTL: a dir regenerated in place within one JVM kept
  * serving stale weights while the oracle retrained on the new data —
  * a spurious mismatch with no failure mode pointing at the cache.
  * Every cross-query memo now shares one posture: keys carry the
  * SparkSession identity (two sessions over one dir never share an
  * entry, matching CachedRelation's key discipline), entries expire
  * after the TTL, and [[invalidate]]/[[invalidateAll]] force a
  * retrain — pinned by Round14Spec's invalidation-retrains test.
  *
  * No unpersist lifecycle is needed (values are plain objects, GC
  * collects them), so expiry is a simple timestamp check; the clock is
  * injectable for the fake-clock expiry specs.
  */
class TtlMemo[V](ttlMillis: Long, clock: () => Long = () => System.currentTimeMillis()) {
  private case class Entry(v: V, builtAt: Long)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  private val builds = new AtomicLong()

  /** The memoized value for `key`, rebuilding if absent or expired.
    * PER-KEY atomicity (ConcurrentHashMap.compute), not an
    * instance-wide lock: a build can be seconds of Spark jobs (the
    * classifier retrain), and a streaming trigger resolving one dir
    * must not serialize behind the driver training another — two
    * resolves of the SAME key still see exactly one build. */
  def resolve(key: String)(build: => V): V =
    cache.compute(key, (_, e) => {
      val now = clock()
      if (e != null && now - e.builtAt < ttlMillis) e
      else {
        val v = build
        builds.incrementAndGet()
        Entry(v, now)
      }
    }).v

  /** Times the builder actually ran (cache misses), for specs. */
  def buildCount: Long = builds.get()

  /** Drop one entry — the regenerated-fixture recovery hook. */
  def invalidate(key: String): Unit = cache.remove(key)

  /** Drop every entry. */
  def invalidateAll(): Unit = cache.clear()
}

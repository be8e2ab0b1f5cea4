package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** Pre-checkpoint plan registry — closes the plan sweeps' one blind
  * spot (round-12 VERDICT finding #3): `localCheckpoint()` truncates
  * lineage to a LogicalRDD, so any plan shape BELOW a checkpoint was
  * invisible to the mechanical sweeps and had to be exempted by
  * hand-verified comment.
  *
  * Every checkpoint in main source now goes through [[Ckpt.ckpt]],
  * which stashes the producer's OPTIMIZED plan keyed by the
  * checkpointed frame's output expression ids (a LogicalRDD keeps its
  * child's output attributes verbatim, so a consumer plan's
  * LogicalRDD node links back to its producer's stashed plan by id).
  * The sweeps then (a) run their asserts over every stashed
  * pre-checkpoint plan directly, and (b) resolve a LogicalRDD's grain
  * MECHANICALLY — [[grainBounded]] — instead of via an exempt map:
  * a partitionless window above a checkpoint is legal iff the stashed
  * producer plan bottoms out in an Aggregate / GlobalLimit (census /
  * page grain), recursively through further checkpoints.
  *
  * Memory: one optimized-plan tree per executed checkpoint (plans are
  * small object graphs; a full Verify run stashes a few hundred).
  * Process-wide, like the CachedRelation memos, so producers that
  * ran in an earlier suite still resolve.
  */
object PlanStash {
  // keyed by the checkpointed RDD's id, NOT the output exprIds: a
  // self-union/self-join of a checkpointed frame makes Catalyst's
  // DeduplicateRelations mint fresh attribute ids for the second
  // occurrence (same rdd, new exprIds), and an exprId key would
  // silently fail to resolve exactly those plans
  private val byRdd = new ConcurrentHashMap[Int, LogicalPlan]()

  /** Stash `ds`'s pre-checkpoint optimized plan, then checkpoint. */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = {
    val pre = ds.queryExecution.optimizedPlan
    val out = ds.localCheckpoint()
    out.queryExecution.analyzed match {
      case l: LogicalRDD => byRdd.put(l.rdd.id, pre)
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

  /** The producer plan behind a checkpointed LogicalRDD, if this
    * process executed it through [[checkpoint]]. */
  def producerOf(l: LogicalRDD): Option[LogicalPlan] =
    Option(byRdd.get(l.rdd.id))

  /** Every stashed pre-checkpoint plan (sweep input). */
  def all: Seq[LogicalPlan] = {
    import scala.jdk.CollectionConverters._
    byRdd.values().asScala.toSeq
  }

  /** Is a checkpointed frame PROVABLY reduced below data grain —
    * i.e. does its stashed producer plan bottom out in an Aggregate or
    * GlobalLimit through grain-preserving operators (recursing through
    * nested checkpoints via the registry)? Unresolvable LogicalRDDs
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
      // bounded × bounded stays bounded; a union of bounded pages is a
      // bounded page — the same grain algebra as the keyless-join sweep
      case j: Join => grainBoundedPlan(j.left) && grainBoundedPlan(j.right)
      case u: Union => u.children.forall(grainBoundedPlan)
      case u: UnaryNode => grainBoundedPlan(u.child)
      case _ => false
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BaseOrdering, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf

import graft.Tables

/** Whole-operator Catalyst extension (SURVEY §2.6 Q-window-rank, §7.3
  * rung (c)): a custom logical node + optimizer rule + physical
  * operator + planner strategy that turn the ubiquitous per-key top-N
  * idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W.partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= K) }}}
  *
  * into a plan with a map-side bounded prune BELOW the window shuffle.
  *
  * Why this needs a custom operator: Spark plans the idiom as
  * shuffle-everything → sort-per-partition → row_number → filter. The
  * global top-K (`ORDER BY .. LIMIT k`) case has TakeOrderedAndProject
  * (per-partition heap, merge of k rows), but the per-KEY case has no
  * physical counterpart — at 100 TB every row of the fact table crosses
  * the wire to be ranked, then ≥(1 − K/rows-per-key) of them are
  * discarded. The fix is the same heap trick partial aggregation uses:
  * a row that is not in the top-K of its key WITHIN its map partition
  * cannot be in the global top-K of that key (it already has ≥K better
  * rows in just that partition), so each mapper keeps a bounded heap of
  * K rows per key and the shuffle carries ≤ K·keysPerPartition rows.
  * The Window + Filter above are left intact: they re-rank the pruned
  * survivors after the shuffle, producing bit-identical output — and
  * identical `rn` values, because no pruned row can outrank a surviving
  * top-K row (if it did, the ≥K rows beating it locally would also beat
  * the survivor, contradicting rank ≤ K).
  *
  * Safety conditions enforced by [[PushLocalTopK]]:
  *  - the Window computes EXACTLY ONE window expression, a
  *    `row_number()` — any co-resident window function (sum over the
  *    same partition, rank with ties) would see pruned input;
  *  - the filter bounds that row_number by a literal (`rn <= K`,
  *    `rn < K+1`, `rn = K`, or the mirrored forms) with K ≥ 1;
  *  - K ≤ `graft.topk.maxK` (default 1000) — beyond that the per-key
  *    heaps stop being "bounded" in any useful sense;
  *  - with a non-total ORDER BY, row_number is nondeterministic in
  *    vanilla Spark already; the rewrite picks the same class of valid
  *    answers (ties broken by arrival order instead of sort order).
  *
  * Memory is bounded even under adversarial key cardinality: the
  * per-partition hash of heaps is capped at
  * `graft.topk.maxKeysPerPartition` keys (default 2^20); on overflow
  * the operator emits the current epoch's survivors and starts a fresh
  * hash. Epoch flushing preserves correctness — a row is only ever
  * dropped when K better rows for its key exist in the SAME epoch, and
  * those K rows are themselves forwarded — it only weakens the prune
  * (duplicated key coverage across epochs), exactly like partial-agg
  * hash fallback.
  *
  * Disable at runtime with `graft.topk.enabled=false` (used by the
  * equivalence spec to diff rewritten vs vanilla plans).
  */
object TopKPushdown {

  /** Idempotent per-session install of the rule + strategy. */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(PushLocalTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushLocalTopK
    if (!spark.experimental.extraStrategies.contains(LocalTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ LocalTopKStrategy
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Per-supplier top-5 line items by price. Same logical shape as
    // q_window_rank; the session-installed rule prunes map-side, so the
    // window's shuffle carries ≤ 5·suppliers-per-partition rows instead
    // of the whole lineitem table. Oracle is the plain window form —
    // the rewrite must be bit-identical, rn included.
    "q_topk_pushdown" -> ((s, d) => {
      register(s)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("l_suppkey"), col("rn"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_topk_pushdown" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_suppkey
        |                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin
  )
}

/** Logical marker: "each key needs only its first `k` rows under
  * `order` from each input partition". Inserted below a
  * row_number-limit Window by [[PushLocalTopK]]; planned by
  * [[LocalTopKStrategy]].
  */
case class LocalTopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerKey =
    copy(child = newChild)
}

/** Optimizer rule: match `Filter(rn <= K, Window(row_number over (P, O)))`
  * and insert [[LocalTopKPerKey]] between the Window and its child.
  * Runs in the user-rule batch (fixed point), so it guards against
  * re-application by checking the Window's child.
  */
object PushLocalTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Extract K from a conjunct bounding `rn` (exprId `rn`) above by a
    * literal: rn <= K | rn < K | rn = K | K >= rn | K > rn.
    */
  private def rnLimit(conjuncts: Seq[Expression], rn: Attribute): Option[Int] = {
    val id = rn.exprId
    conjuncts.collectFirst {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.exprId == id => v
      case LessThan(a: Attribute, IntegerLiteral(v)) if a.exprId == id => v - 1
      case EqualTo(a: Attribute, IntegerLiteral(v)) if a.exprId == id => v
      case EqualTo(IntegerLiteral(v), a: Attribute) if a.exprId == id => v
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.exprId == id => v
      case GreaterThan(IntegerLiteral(v), a: Attribute) if a.exprId == id => v - 1
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.topk.enabled", "true").toBoolean) return plan
    val maxK = conf.getConfString("graft.topk.maxK", "1000").toInt
    plan.transform {
      case f @ Filter(cond,
          w @ LogicalWindow(
            Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            parts, order, child, _))
          if order.nonEmpty && !child.isInstanceOf[LocalTopKPerKey] =>
        rnLimit(splitConjunctivePredicates(cond), alias.toAttribute) match {
          case Some(k) if k >= 1 && k <= maxK =>
            f.copy(child = w.withNewChildren(
              Seq(LocalTopKPerKey(parts, order, k, child))))
          case _ => f
        }
    }
  }
}

/** Physical per-partition bounded top-K prune. For each input
  * partition: a hash of per-key heaps of size ≤ `k` (heap root = worst
  * retained row, replaced when a better row arrives). Emits retained
  * rows; ordering within a key is NOT guaranteed — the Window above
  * re-sorts after its shuffle. Output columns, partitioning and row
  * format are the child's (rows are UnsafeRow copies, shuffle-ready).
  *
  * `maxKeys` caps the hash; overflow flushes the current epoch (see
  * [[TopKPushdown]] scaladoc for the correctness argument).
  */
case class LocalTopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val attrs = child.output
    val kLoc = k
    val maxKeysLoc = math.max(1, maxKeys)
    val keysLoc = keys
    val orderLoc = order
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLoc, attrs)
      val ord: BaseOrdering = RowOrdering.create(orderLoc, attrs)
      val better = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
      }
      val worstFirst = better.reversed()

      new Iterator[InternalRow] {
        private val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var drain: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        // Row that triggered a hash-overflow flush, parked (as a copy)
        // until the next epoch starts.
        private var pending: InternalRow = null

        /** Insert into this epoch's heaps; false = hash full AND row's
          * key is new (caller must flush).
          */
        private def insert(row: InternalRow): Boolean = {
          val key = keyProj(row)
          var pq = heaps.get(key)
          if (pq == null) {
            if (heaps.size() >= maxKeysLoc) return false
            pq = new java.util.PriorityQueue[InternalRow](kLoc, worstFirst)
            heaps.put(key.copy(), pq)
          }
          if (pq.size() < kLoc) pq.add(row.copy())
          else if (better.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
          true
        }

        private def refill(): Unit = {
          if (pending != null) { insert(pending); pending = null } // fresh hash: cannot fail
          var flush = false
          while (iter.hasNext && !flush) {
            val row = iter.next()
            if (!insert(row)) { pending = row.copy(); flush = true }
          }
          val buf = new java.util.ArrayList[InternalRow]()
          heaps.values().forEach(pq => buf.addAll(pq))
          heaps.clear()
          drain = buf.iterator()
        }

        override def hasNext: Boolean = {
          while (!drain.hasNext && (pending != null || iter.hasNext)) refill()
          drain.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          drain.next()
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[LocalTopKPerKey]] as [[LocalTopKPerKeyExec]]. Installed via
  * `spark.experimental.extraStrategies` (consulted before built-ins).
  */
object LocalTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerKey(keys, order, k, child) =>
      val maxKeys = SQLConf.get
        .getConfString("graft.topk.maxKeysPerPartition", (1 << 20).toString).toInt
      LocalTopKPerKeyExec(keys, order, k, maxKeys, planLater(child)) :: Nil
    case _ => Nil
  }
}

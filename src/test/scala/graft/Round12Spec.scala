package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
import graft.operators.{Graph, Learn, Ranks}

/** Round-12 pins: the MECHANICAL partitionless-window sweep over the
  * whole registered query surface (the class of defect that kept
  * reappearing one query at a time — q_pot_gpd/q_kdist_knee in r10,
  * q_avg_precision/q_quality_tercile in r11 — can no longer regrow
  * unseen), the partitioned globalOrderScan's exact parity with the
  * per-group single-reducer window, and the oracle-depth guard's
  * strict-mode throw.
  */
class Round12Spec extends SparkSpec {

  test("plan sweep: no registered query ranks base-grain rows through one reducer") {
    // Walks EVERY SparkEntry query's optimized plan and asserts each
    // partitionless Window sits above an Aggregate or a GlobalLimit —
    // i.e. the sequential part of any total-order scan runs over an
    // aggregate-grain (census / bucket / decile) or page-bounded
    // frame, never the corpus.
    //
    // The round-12 blind spot is CLOSED: every main-source checkpoint
    // goes through PlanStash.ckpt(), so (a) a Window above a
    // checkpointed LogicalRDD resolves its grain MECHANICALLY from the
    // stashed pre-checkpoint producer plan (grainBounded — what used
    // to be a 6-entry hand-verified exempt map), and (b) the stashed
    // producer plans themselves are swept below (windows BELOW a
    // checkpoint are no longer invisible).
    import org.apache.spark.sql.execution.LogicalRDD
    import graft.operators.PlanStash
    def boundary(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case l: LogicalRDD => PlanStash.grainBounded(l)
      // stashed plans carry sanitized checkpoint stubs (no RDD refs)
      case cl: PlanStash.CheckpointLeaf => PlanStash.grainBoundedPlan(cl)
      case _ => p.children.exists(boundary)
    }
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty && !boundary(w.child) => w
        }
        if (bad.nonEmpty)
          failures += s"$name: ${bad.size} partitionless Window(s) over base-grain rows"
      } catch {
        case e: Throwable =>
          failures += s"$name: plan build threw ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120)
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} quer(ies) fail the partitionless-window sweep " +
        s"(fix the plan — checkpointed census producers resolve " +
        s"mechanically via PlanStash):\n  " +
        failures.mkString("\n  "))
    // (b) the pre-checkpoint plans themselves: every producer that ran
    // while the 440 plans above were built (checkpoints are eager) has
    // stashed its optimized plan — sweep them for the same defect.
    val hidden = PlanStash.all.flatMap { p =>
      p.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !boundary(w.child) => w
      }
    }
    assert(hidden.isEmpty,
      s"${hidden.size} partitionless base-grain Window(s) hide below " +
        s"checkpoints (stashed producer plans):\n" +
        hidden.take(3).map(_.toString.take(400)).mkString("\n"))
    // lost-coverage visibility (r14): an LRU-evicted producer simply
    // VANISHES from PlanStash.all, so this sweep passing says nothing
    // about it — surface the count instead of letting coverage erode
    // silently (grainBounded resolution stays fail-safe strict either
    // way). Non-zero here means the session stashed > MaxEntries plans
    // and the earliest ones went unaudited.
    info(s"PlanStash: ${PlanStash.all.size} stashed plans swept, " +
      s"${PlanStash.evictionCount} evicted before this sweep")
    assert(PlanStash.evictionCount == 0L,
      s"${PlanStash.evictionCount} stashed producer plans were LRU-evicted " +
        "before this sweep ran — raise PlanStash.MaxEntries or sweep earlier; " +
        "those plans escaped the stashed-plan audit")
  }

  test("plan sweep: no registered query joins two unbounded frames without equi keys") {
    // The cross-join companion of the window sweep: an accidental
    // CartesianProduct / nested-loop join between two data-grain
    // frames is THE other way a plan goes quadratic (the r10 CoarseK
    // class). A keyless join (no condition, or a condition with no
    // equality the planner can hash on) is legitimate only when at
    // least one side is already reduced — an Aggregate or a
    // GlobalLimit page below it (the 1-row moment crossJoins, the
    // banded range joins against a census). Flag every keyless join
    // whose sides BOTH lack such a boundary.
    //
    // Same documented limitation as the window sweep: localCheckpoint
    // truncates lineage to a LogicalRDD, which this sweep must treat
    // as opaque-but-audited (the checkpointed producers carry their
    // own targeted plan audits); the sweep still catches the common
    // regression — a raw×raw keyless join inside one query's lineage.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, Range => LRange}
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
    import org.apache.spark.sql.execution.LogicalRDD
    val exempt: Map[String, String] = Map(
      "q_join_range" -> "the declared non-equi range join itself — band-bounded by the join predicate, the contract row's own semantics",
      "q_dtw" -> "Sakoe-Chiba banded alignment: |i-j| <= W window predicate bounds the pair mass, series-grain frames",
      "q_interval_sched" -> "interval overlap check against the TakeOrdered greedy page (page-bounded right side)",
      "q_spatial_join" -> "grid-cell candidate join verifies with a non-equi distance predicate above the equi cell key"
    )
    // "Bounded" must hold at the frame's own grain: recursing with a
    // bare children.exists would treat a data-grain frame as bounded
    // just because it equi-joins an Aggregate somewhere deep in its
    // lineage — exactly the raw-by-raw false negative the sweep exists
    // to catch. So recursion stops at grain-RESTORING operators: a
    // Join is bounded only if BOTH inputs are (bounded × bounded stays
    // bounded), a Union only if ALL branches are, and a Generate
    // (explode fan-out over a reduced frame: content-bounded, e.g. a
    // vocab array off an aggregate) only if its child is; everything
    // else that could re-inflate the grain is unbounded on its own.
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Union, UnaryNode}
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true
      case l: LogicalRDD => // checkpoint boundary: resolve the stashed
        // producer's grain mechanically. STRICT default (r14, VERDICT
        // finding #4): every main-source checkpoint routes through
        // PlanStash.ckpt(), so an unstashed LogicalRDD in a query's
        // lineage is either a stash miss or a checkpoint created
        // around the registry — both must be SEEN, not blessed; the
        // window sweep's grainBounded already answers false for the
        // same case, closing the last soft default in the sweeps
        graft.operators.PlanStash.producerOf(l).exists(bounded)
      case cl: graft.operators.PlanStash.CheckpointLeaf =>
        graft.operators.PlanStash.grainBoundedPlan(cl)
      case r: LRange => r.numElements <= 4096 // literal fan-out (bootstrap replicas, hyperplanes)
      case j: Join => bounded(j.left) && bounded(j.right)
      case u: Union => u.children.forall(bounded)
      case g: Generate => bounded(g.child)
      case u: UnaryNode => bounded(u.child)
      case _ => false
    }
    def keyless(j: Join): Boolean = j.condition match {
      case None => true
      case Some(c) => !c.exists {
        case _: EqualTo => true
        case _: EqualNullSafe => true
        case _ => false
      }
    }
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !exempt.contains(name)) {
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect {
          case j: Join if keyless(j) && !bounded(j.left) && !bounded(j.right) => j
        }
        if (bad.nonEmpty)
          failures += s"$name: ${bad.size} keyless join(s) between unbounded frames"
      } catch {
        case e: Throwable =>
          failures += s"$name: plan build threw ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120)
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} quer(ies) fail the keyless-join sweep " +
        s"(fix the plan or add a REASONED exemption above):\n  " +
        failures.mkString("\n  "))
  }

  test("partitioned globalOrderScan: exact parity with the per-group window, skewed groups") {
    import spark.implicits._
    // One dominant group (the per-lang English case), one tiny group,
    // heavy ties, negative keys — every edge the per-partition offset
    // arithmetic has.
    val rows = Seq.tabulate(500) { i =>
      val g = if (i % 10 == 0) "tail" else "hot"
      val v = if (i % 3 == 0) -7L else (i % 23) * 10L - 50L
      (i.toLong, g, v)
    }
    val df = rows.toDF("id", "g", "v")
    val wNaive = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val naive = df
      .withColumn("r", row_number().over(wNaive).cast("bigint"))
      .withColumn("t", ntile(3).over(wNaive).cast("bigint"))
      .select($"id", $"r", $"t").as[(Long, Long, Long)].collect().toSet
    val perG = df.groupBy($"g").agg(count(lit(1)).as("n_g"))
    val mine = Ranks.globalOrderScan(df, expr("-(v DIV 16)"),
        Seq($"v".desc, $"id"), "r", parts = Seq("g"))
      .join(broadcast(perG), Seq("g"))
      .withColumn("t", Ranks.ntileFromRank("r", "n_g", 3))
      .select($"id", $"r", $"t").as[(Long, Long, Long)].collect().toSet
    assert(mine === naive)
  }

  test("partitioned globalOrderScan: per-group prefix sums restart at each group") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "b", 7L))
      .toDF("id", "g", "x")
    val got = Ranks.globalOrderScan(df, expr("x DIV 8"), Seq($"x", $"id"), "r",
        sums = Seq(($"x", "cs")), parts = Seq("g"))
      .select($"id", $"r", $"cs").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 10L), (2L, 2L, 30L), (3L, 1L, 5L), (4L, 2L, 12L)))
  }

  test("two-level routing: members partition the cells, routed distance bounds flat") {
    import spark.implicits._
    val cents = Learn.coarseCentroids(spark, sf)
    val (sups, members) = Learn.superRouting(cents)
    // structure: S sizing, every routing super non-empty, member lists
    // PARTITION the cell set (each cell routable through exactly one)
    assert(sups.size <= math.max(2, math.ceil(math.sqrt(cents.size.toDouble)).toInt))
    assert(sups.size === members.size && members.forall(_.nonEmpty))
    assert(members.flatMap(_.map(_._1)).sorted === cents.map(_._1).sorted)
    // routed assignment: a VALID cell id, with qdist >= the flat exact
    // argmin pointwise (routing restricts the candidate set, never
    // improves it) and equal whenever the flat winner sits in the
    // routed super's member list
    val q = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr(Learn.QuantTok).as("qv"))
      .withColumn("qs", col("qv"))
    val flat = Learn.assign(q, cents)
      .select($"vec_id", $"cluster".as("c_flat"), $"qdist".as("d_flat"))
    val routed = Learn.assignRouted(q, cents)
      .select($"vec_id", $"cluster".as("c_routed"), $"qdist".as("d_routed"))
    val cellIds = cents.map(_._1).toSet
    val joined = flat.join(routed, "vec_id")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, cf, df, cr, dr) =>
      assert(cellIds.contains(cr), s"vec $id routed to unknown cell $cr")
      assert(dr >= df, s"vec $id: routed qdist $dr below the exact argmin $df")
      if (cf == cr) assert(dr === df, s"vec $id: same cell, different distance")
    }
    // the router should agree with the exact argmin for most vectors
    // (nearest cell usually lives in the nearest super) — a collapse
    // here would mean the super training is broken even if every
    // invariant above holds
    val agree = joined.count { case (_, cf, _, cr, _) => cf == cr }
    assert(agree * 10 >= joined.length * 5,
      s"routed assignment agrees with flat on only $agree/${joined.length}")
  }

  test("two-level routing: per-cell serving-list mass stays subquadratic on a skewed corpus") {
    import spark.implicits._
    // the Round11Spec skewed corpus, re-checked under ROUTED homes —
    // the bound the IVF serving family actually depends on now
    val dim = 64
    val n = 900
    def vec(blob: Int, seed: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      (0 until 2).foreach(j => a((blob * 2 + j) % dim) = 1.0f)
      (0 until dim).foreach { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, j))
        a(j) += (h & 0x3ff).toFloat / 1024f * 0.05f
      }
      a
    }
    val rows = (0 until 45).map(i => (i.toLong, vec(0, i).toSeq, 0)) ++
      (45 until n).map(i => (i.toLong, vec(i % 30, i).toSeq, i % 30))
    val dir = java.nio.file.Files.createTempDirectory("skewemb12").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cents = Learn.coarseCentroids(spark, dir)
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(Learn.QuantTok).as("qv"))
      .withColumn("qs", col("qv"))
    val occ = Learn.assignRouted(q, cents)
      .groupBy($"cluster").count().as[(Int, Long)].collect()
    val sumSq = occ.map { case (_, c) => c * c }.sum
    val bound = (8 * n * math.sqrt(n)).toLong
    assert(sumSq < bound,
      s"routed serving-list mass $sumSq exceeds the O(n^1.5) bound $bound")
    assert(occ.map(_._2).max < n / 2,
      "one routed cell holds half the skewed corpus")
  }

  test("oracleDepthGuard: throws in oracle-compare mode, warns otherwise") {
    val prev = sys.props.get("graft.oracle.strict")
    try {
      System.setProperty("graft.oracle.strict", "true")
      val ex = intercept[IllegalStateException] {
        Graph.oracleDepthGuard("q_test", rounds = 7, unroll = 6)
      }
      assert(ex.getMessage.contains("q_test") && ex.getMessage.contains("7"))
      // within the unroll: silent in both modes
      Graph.oracleDepthGuard("q_test", rounds = 6, unroll = 6)
      System.clearProperty("graft.oracle.strict")
      // non-strict: must NOT throw (the bench keeps running; the
      // engine answer itself is exact — only the oracle compare is off)
      Graph.oracleDepthGuard("q_test", rounds = 7, unroll = 6)
    } finally {
      prev match {
        case Some(v) => System.setProperty("graft.oracle.strict", v)
        case None => System.clearProperty("graft.oracle.strict")
      }
    }
  }

  test("plan audit: the migrated rank consumers keep data-grain windows bucket-partitioned") {
    // q_avg_precision / q_gini / q_quality_tercile moved onto
    // globalOrderScan this round; their pre-checkpoint frames must not
    // contain a partitionless window over base rows (the checkpoint in
    // q_avg_precision hides its producer from the global sweep above,
    // so audit the producer shapes directly).
    val gini = SparkEntry.queries("q_gini")(spark, sf)
    val terc = SparkEntry.queries("q_quality_tercile")(spark, sf)
    for ((df, what) <- Seq((gini, "q_gini"), (terc, "q_quality_tercile"))) {
      val plan = df.queryExecution.optimizedPlan
      def hasAgg(p: LogicalPlan): Boolean =
        p.isInstanceOf[Aggregate] || p.children.exists(hasAgg)
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !hasAgg(w.child) => w
      }
      assert(bad.isEmpty, s"$what: partitionless window over base rows")
    }
    // q_quality_tercile additionally must have NO DATA-GRAIN window
    // partitioned only by lang (the corpus-proportional key the
    // migration retired) — the offsets window may partition by lang
    // because it runs over the bucket-grain AGGREGATE.
    def hasAggB(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggB)
    val langOnly = terc.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.length == 1 &&
        w.partitionSpec.head.references.map(_.name).toSeq == Seq("lang") &&
        !hasAggB(w.child) => w
    }
    assert(langOnly.isEmpty,
      "q_quality_tercile still partitions a data-grain window by lang alone")
  }
}

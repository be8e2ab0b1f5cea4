package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import graft.operators.{Graph, Learn, Ranks}

/** Round-11 pins: the shared bucket-offset global-rank helper (exact
  * parity with the single-reducer window, plan audits asserting the
  * data-grain windows partition by bucket), the scale-aware IVF
  * coarse-codebook sizing and its per-cell candidate bound on a
  * skewed synthetic corpus, the kNN-index cache's lost-block
  * self-heal, the k-core fixpoint's oracle-depth margin, and the
  * rich-club null model's exact degree preservation.
  */
class Round11Spec extends SparkSpec {

  /** Every partitionless Window in the optimized plan must sit above
    * an Aggregate — i.e. rank only aggregate-grain (census / bucket /
    * decile) frames, never base rows through one reducer. */
  private def partitionlessWindowsRideAggregates(df: org.apache.spark.sql.DataFrame,
                                                 what: String): Unit = {
    val plan = df.queryExecution.optimizedPlan
    def hasAgg(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAgg)
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !hasAgg(w.child) => w
    }
    assert(bad.isEmpty,
      s"$what: ${bad.size} partitionless Window(s) run directly over " +
        s"base-grain rows:\n${bad.map(_.simpleString(2)).mkString("\n")}")
  }

  test("globalOrderScan: rank and prefix sums match the single-reducer window exactly") {
    import spark.implicits._
    // Skewed frame: duplicate keys (rank ties broken by id), empty
    // buckets (values jump), negative keys, and a bucket holding half
    // the rows — every edge the bucket-offset arithmetic has.
    val rows = Seq.tabulate(400) { i =>
      val v = if (i % 2 == 0) 7L else (i % 37) * 100L - 800L
      (i.toLong, v, (i % 5 + 1).toLong)
    }
    val df = rows.toDF("id", "v", "wgt")
    val naive = df
      .withColumn("r", row_number().over(Window.orderBy($"v", $"id")).cast("bigint"))
      .withColumn("cs", sum($"wgt").over(Window.orderBy($"v", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"r", $"cs").as[(Long, Long, Long)].collect().toSet
    val bucketed = Ranks.globalOrderScan(df, expr("v DIV 256"),
        Seq($"v", $"id"), "r", Seq(($"wgt", "cs")))
      .select($"id", $"r", $"cs").as[(Long, Long, Long)].collect().toSet
    assert(bucketed === naive)
    // DESC ordering with the negated-key bucket
    val naiveD = df
      .withColumn("r", row_number().over(Window.orderBy($"v".desc, $"id")).cast("bigint"))
      .select($"id", $"r").as[(Long, Long)].collect().toSet
    val bucketedD = Ranks.globalOrderScan(df, expr("-(v DIV 256)"),
        Seq($"v".desc, $"id"), "r")
      .select($"id", $"r").as[(Long, Long)].collect().toSet
    assert(bucketedD === naiveD)
  }

  test("ntileFromRank: exact parity with the native ntile window, including n < k and n % k != 0") {
    import spark.implicits._
    for (n <- Seq(3, 10, 17, 100, 503); k <- Seq(5, 10)) {
      val df = (1 to n).map(_.toLong).toDF("x")
      val native = df
        .withColumn("t", ntile(k).over(Window.orderBy($"x")).cast("bigint"))
        .select($"x", $"t").as[(Long, Long)].collect().toSet
      val mine = df
        .withColumn("rk", row_number().over(Window.orderBy($"x")).cast("bigint"))
        .withColumn("n", lit(n.toLong))
        .withColumn("t", Ranks.ntileFromRank("rk", "n", k))
        .select($"x", $"t").as[(Long, Long)].collect().toSet
      assert(mine === native, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("plan audit: rank consumers keep partitionless windows at aggregate grain") {
    for (name <- Seq("q_lorenz_points", "q_curriculum", "q_rfm", "q_pot_gpd"))
      partitionlessWindowsRideAggregates(
        SparkEntry.queries(name)(spark, sf), name)
    partitionlessWindowsRideAggregates(
      SparkEntry.queries("q_lift")(spark, sf), "q_lift")
  }

  test("coarseK: sqrt sizing with the floor, and the oracle CTE agrees") {
    assert(Learn.coarseK(1) === 16)
    assert(Learn.coarseK(256) === 16)
    assert(Learn.coarseK(500) === 23)
    assert(Learn.coarseK(2000) === 45)
    assert(Learn.coarseK(1000000) === 1000)
    assert(Learn.coarseK(100000000000L) === 316228)
    // fixture dirs resolve through the same function
    assert(Learn.coarseKOf(spark, sf) ===
      Learn.coarseK(Tables.embeddings(spark, sf).count()))
  }

  test("coarse codebook: per-cell candidate mass stays subquadratic on a skewed corpus") {
    import spark.implicits._
    val dim = 64
    val n = 900
    // 30 separated blobs with order skew: the first 45 vec_ids (= the
    // whole ⌈√900⌉ = 30-vector init and then some) all sit in blob 0.
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
    val dir = java.nio.file.Files.createTempDirectory("skewemb11").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = Learn.coarseKOf(spark, dir)
    assert(k === 30, s"coarseK(900) should be 30, got $k")
    val cents = Learn.coarseCentroids(spark, dir)
    assert(cents.nonEmpty && cents.size <= k)
    // occupancy census under the trained codebook: pass 1's home-cell
    // self-join costs Sigma |cell|^2 — pin it well under the quadratic
    // n^2 (and under n^1.5 * 8, the O(n^1.5) design bound's slack).
    val occ = Learn.assignHomeCells(spark, dir)
      .groupBy($"home").count().as[(Int, Long)].collect()
    val sumSq = occ.map { case (_, c) => c * c }.sum
    val bound = (8 * n * math.sqrt(n)).toLong
    assert(sumSq < bound,
      s"home-cell candidate mass $sumSq exceeds the O(n^1.5) bound $bound")
    assert(occ.map(_._2).max < n / 2,
      "one cell holds half the skewed corpus - training failed to spread")
  }

  test("exactKnnL2 cache heals after its checkpoint blocks are lost") {
    val first = Learn.exactKnnL2(spark, sf, k = 3)
    val nRows = first.count()
    val builds0 = Learn.knnCache.buildCount
    // cache hit: same frame, no rebuild
    Learn.exactKnnL2(spark, sf, k = 3).count()
    assert(Learn.knnCache.buildCount === builds0)
    // kill the localCheckpoint blocks: the truncated lineage makes the
    // cached frame unrecomputable, which is exactly the executor-death
    // exposure the probe-and-rebuild exists for. Both layers must go —
    // the resolve-level InMemoryRelation AND the checkpointed RDD's own
    // storage (unpersisting only the DataFrame leaves the blocks).
    first.unpersist(blocking = true)
    first.queryExecution.optimizedPlan.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
      case _ =>
    }
    val healed = Learn.exactKnnL2(spark, sf, k = 3)
    assert(healed.count() === nRows)
    assert(Learn.knnCache.buildCount === builds0 + 1,
      "lost blocks should have triggered exactly one rebuild")
  }

  test("q_kcore fixpoint: converges inside the oracle's unrolled depth with margin") {
    val base = Graph.tradeBase(spark, sf)
    val edges = base
      .select(explode(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val (core, rounds) = Graph.kcorePeelFixpoint(edges, 8)
    assert(rounds <= Graph.KCoreOracleUnroll,
      s"fixture needs $rounds rounds but the oracle unrolls only " +
        s"${Graph.KCoreOracleUnroll}")
    // fixpoint means one more peel removes nothing
    assert(Graph.kcorePeel(core, 8, 1).count() === core.count())
  }

  test("query names never collide across modules (a later module would silently shadow)") {
    val perModule = SparkEntry.modules.map(_._1.keySet)
    val union = perModule.reduce(_ ++ _)
    assert(union.size === perModule.map(_.size).sum,
      "duplicate query name(s) across modules: " +
        perModule.flatten.groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    val perOracle = SparkEntry.modules.map(_._2.keySet)
    assert(perOracle.reduce(_ ++ _).size === perOracle.map(_.size).sum,
      "duplicate oracle name(s) across modules")
    // every oracle names a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no query name is registered twice within one module source file") {
    // A duplicate key inside ONE Map literal collapses silently at
    // construction (Scala keeps the later entry), which the runtime
    // cross-module guard can never see — so this scans the SOURCE: a
    // `"q_…" ->` registration may appear at most twice per file (once
    // in `queries`, once in `oracles`).
    val reg = """"(q_\w+)"\s*->""".r
    val dirs = Seq("src/main/scala/graft/operators",
      "src/main/scala/graft/functions", "src/main/scala/graft/sources",
      "src/main/scala/graft/plans")
    val bad = for {
      dir <- dirs
      f <- Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      if f.getName.endsWith(".scala")
      src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      (name, n) <- reg.findAllMatchIn(src).map(_.group(1)).toSeq
        .groupBy(identity).view.mapValues(_.size)
      if n > 2
    } yield s"${f.getName}: $name ×$n"
    assert(bad.isEmpty, s"duplicate in-file registrations: ${bad.mkString(", ")}")
  }

  test("core numbers: h-index fixpoint agrees with the k-core peel exactly") {
    import spark.implicits._
    val (core, rounds) = Graph.coreNumbers(spark, sf)
    assert(rounds <= Graph.CoreNumberOracleUnroll,
      s"fixture needs $rounds h-index rounds but the oracle unrolls only " +
        s"${Graph.CoreNumberOracleUnroll}")
    val byNode = core.as[(Long, Long)].collect().toMap
    // cross-validation against the INDEPENDENT peel implementation:
    // core(v) >= 8 iff v survives the 8-core fixpoint
    val base = Graph.tradeBase(spark, sf)
    val edges = base
      .select(explode(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val survivors = Graph.kcorePeelFixpoint(edges, 8)._1
      .select($"u").distinct().as[Long].collect().toSet
    val high = byNode.filter(_._2 >= 8L).keySet
    assert(high === survivors,
      s"h-index coreness and peel disagree: ${(high diff survivors).take(5)} / " +
        s"${(survivors diff high).take(5)}")
  }

  test("q_budget_cap: allocation fits the budget and the cap is maximal") {
    val rows = SparkEntry.queries("q_budget_cap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val cap = rows.head.getAs[Long]("cap_tokens")
    val tokens = rows.map(_.getAs[Long]("tokens"))
    val alloc = rows.map(_.getAs[Long]("allocated")).sum
    assert(alloc <= budget, s"allocation $alloc exceeds budget $budget")
    assert(rows.forall(r =>
      r.getAs[Long]("allocated") == math.min(r.getAs[Long]("tokens"), cap)))
    // maximality: one more token of cap would blow the budget
    assert(tokens.map(t => math.min(t, cap + 1)).sum > budget,
      "cap is not the largest feasible value")
  }

  test("q_mood_median: per-type counts partition, median splits the corpus") {
    val rows = SparkEntry.queries("q_mood_median")(spark, sf).collect()
    val perType = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_le") ===
        perType(r.getString(0)), s"counts don't partition for ${r.getString(0)}")
    }
    val ta = rows.map(_.getAs[Long]("n_above")).sum
    val tl = rows.map(_.getAs[Long]("n_le")).sum
    assert(ta <= tl, "more observations above the median than at-or-below it")
    assert(ta * 2 >= tl - rows.length * 2 || ta > 0, "degenerate split")
  }

  test("q_truncation_loss: kept tokens monotone in the length cap, loss consistent") {
    val rows = SparkEntry.queries("q_truncation_loss")(spark, sf).collect()
      .sortBy(_.getAs[Long]("max_len"))
    assert(rows.map(_.getAs[Long]("max_len")).toSeq === Seq(64L, 128L, 256L))
    val kept = rows.map(_.getAs[Long]("tokens_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b },
      "kept tokens must be monotone in the cap")
    rows.foreach { r =>
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_total"))
      assert(r.getAs[Long]("n_truncated") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_knn_regression: per-label rows cover the corpus, MAE bounded") {
    val rows = SparkEntry.queries("q_knn_regression")(spark, sf).collect()
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    assert(nTotal === Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("mae_micro") >= 0 && r.getAs[Long]("mae_micro") <= 9000000L)
      assert(r.getAs[Long]("n_round_correct") <= r.getAs[Long]("n"))
    }
  }

  test("rich-club null model: degrees preserved exactly, edge count invariant") {
    import spark.implicits._
    val edges = Graph.tradeBase(spark, sf).select($"src", $"dst")
    val swapped = Graph.edgeSwapNull(edges, 2)
    assert(swapped.count() === edges.count())
    def degs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array($"src", $"dst")).as("v"))
      .groupBy($"v").count().as[(Long, Long)].collect().toMap
    assert(degs(swapped) === degs(edges),
      "double-edge swap must preserve every node's degree exactly")
    // the null actually rewires (not the identity permutation)
    val moved = swapped.exceptAll(edges).count()
    assert(moved > 0, "null graph identical to the original - no swap happened")
  }
}

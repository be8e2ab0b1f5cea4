package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Skew}

/** Physical-plan audits: the shapes that matter at 100 TB, asserted on
  * the actual executed plans so a regression in pushdown, partial
  * aggregation, codegen participation, or partition pruning fails CI
  * — not just a slow bench.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg: shipdate predicate reaches the parquet scan") {
    val p = plan(Relational.queries("q1_agg")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q1_agg: aggregate is partial + final (map-side combine)") {
    val df = Relational.queries("q1_agg")(spark, sf)
    df.collect() // AQE finalizes (and codegen stages appear) only after execution
    val p = plan(df)
    assert(p.contains("partial_sum"), "no partial aggregation in:\n" + p.take(1200))
    assert(p.contains("*("), "aggregate fell out of codegen (no *(n) stages)")
  }

  test("native cosine_sim runs inside whole-stage codegen") {
    graft.functions.VectorFunctions.register(spark)
    val df = Tables.embeddings(spark, sf)
      .withColumn("c", expr("cosine_sim(embedding, embedding)"))
      .filter($"c" > 0.99)
    assert(df.count() > 0)
    val p = plan(df)
    assert(p.contains("cosine_sim"), p.take(800))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("cosine_sim")),
      "expression not inside a codegen stage:\n" + p.take(800))
  }

  test("salted aggregation matches plain aggregation exactly") {
    val salted = Skew.queries("q_agg_salted")(spark, sf).collect().toSeq
    val plain = Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"user_id").collect().toSeq
    assert(salted === plain)
  }

  test("salted aggregation shuffles on (key, salt) first") {
    val p = plan(Skew.queries("q_agg_salted")(spark, sf))
    assert(p.contains("__salt"), "salt column missing from plan:\n" + p.take(1200))
    // two exchanges: (key, salt) then (key)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 2, s"expected 2 shuffles, plan:\n$p")
  }

  test("no query plans a CartesianProduct (every cross join must be broadcast-sized)") {
    // Blanket scale-safety net over the whole surface: the deliberate
    // crossJoins in the bank are 1-row broadcast totals and must plan
    // as BroadcastNestedLoopJoin; a CartesianProduct anywhere means a
    // data×data cross slipped in (at 100 TB that is a non-starter).
    // Physical planning only — nothing executes, so the sweep stays
    // cheap at 180 queries.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.sparkPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      } catch { case e: Throwable => Some(s"$name (plan failed: ${e.getMessage.take(80)})") }
    }
    assert(offenders.isEmpty, s"cartesian or unplannable queries: $offenders")
  }

  test("q_concomp: no joins inside the rounds, bounded exchange count, no cartesian") {
    val df = graft.operators.Graph.queries("q_concomp")(spark, sf)
    df.collect()
    // AQE's toString prints the Final Plan AND the Initial Plan — count
    // operators in the final section only, or every number doubles.
    val p = plan(df).split("== Initial Plan ==")(0)
    // The optimization this pins: each of the 6 half-rounds is ONE
    // hashpartitioning exchange (the u-window) plus one distinct
    // exchange — no join-back per half-round. Budget: 12 round
    // exchanges + base/nodes distincts + the single final label join
    // (+ AQE variance) ≤ 18. The first formulation (groupBy + join
    // back + persist per half-round) blew well past this.
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 18, s"round structure regressed: $exchanges hash exchanges:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "cartesian product in CC plan")
    // exactly TWO equi-joins in the whole plan: the base orders⋈lineitem
    // edge build and the final node→root label attach — NONE inside the
    // 6 half-rounds (the window-min formulation needs no join-back)
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") || l.contains("ShuffledHashJoin"))
    assert(joins === 2, s"expected base-edge join + final label join only, got $joins:\n${p.take(1500)}")
  }

  test("q_butterfly: wedges come from the map-side generator, no supplier self-join") {
    val df = graft.operators.Graph.queries("q_butterfly")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.contains("sorted_pairs"), "native pair generator missing:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
    // exactly one equi-join (orders⋈lineitem); the wedge stage is a
    // groupBy + explode, never bc⋈bc
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") || l.contains("ShuffledHashJoin"))
    assert(joins === 1, s"expected only the base edge join, got $joins:\n${p.take(1500)}")
  }

  test("q_kcore: peel rounds are join-free (only the base edge build joins)") {
    val df = graft.operators.Graph.queries("q_kcore")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    // the ONLY join is orders⋈lineitem (since the round-11 fixpoint
    // rework it usually sits BEHIND the per-round localCheckpoint
    // boundary, appearing as a Scan ExistingRDD → 0 visible joins);
    // every peel round is windows+filter, never a join
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") || l.contains("ShuffledHashJoin"))
    assert(joins <= 1, s"peel rounds must not join, got $joins joins:\n${p.take(1500)}")
  }

  test("q_rowid: the data-scale window is bucket-partitioned (no global sort reducer)") {
    // The whole point of the two-phase row-id: only the BUCKET-COUNT-
    // sized offset table may pass through the single-partition window;
    // the per-row numbering must run under hashpartitioning(bucket).
    val p = plan(graft.operators.Pipeline.queries("q_rowid")(spark, sf))
    assert(p.contains("Exchange hashpartitioning(bucket"),
      "per-row numbering is not bucket-partitioned:\n" + p.take(1500))
  }

  test("join strategy hints override Catalyst's default pick") {
    // The 100 TB tuning surface: when statistics mislead the planner
    // (fresh tables, skewed filters), hints pin the physical join.
    // Same query, three hints, three different physical operators.
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    def planWith(hint: String): String = {
      val df = li.join(o.hint(hint), $"l_orderkey" === $"o_orderkey")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planWith("broadcast").contains("BroadcastHashJoin"))
    assert(planWith("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planWith("merge").contains("SortMergeJoin"))
  }

  test("q_pit_join: the as-of union+window needs exactly one entity-key shuffle") {
    // The point of the technique: no inequality join, no range-join
    // blowup — dim and fact rows meet in ONE hashpartitioning(k)
    // exchange feeding the running last-non-null window. (The fact
    // build's lineitem⋈orders join may broadcast; the presentation
    // sort is a range exchange, not a hash one.)
    val p = plan(graft.operators.RelationalExt.queries("q_pit_join")(spark, sf))
    assert(p.contains("Exchange hashpartitioning(k#"),
      "union+window not keyed on the entity key:\n" + p.take(1500))
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 2,
      s"expected at most 2 hash shuffles (entity key + fact build), got $hashExchanges:\n${p.take(2000)}")
  }

  test("q_pagerank: the adjacency is persisted and reused across iterations") {
    val df = graft.operators.Graph.queries("q_pagerank")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "adjacency not persisted — each iteration would recompute the edge build:\n" + p.take(1500))
  }

  test("runtime bloom filter: selective dim predicate reaches the fact scan") {
    // The 100 TB anti-join/dedup story (SURVEY §1.3, §7.4): a selective
    // predicate on one join side should cut the other side's shuffle
    // volume via Spark's runtime bloom filter. Thresholds are sized for
    // production data, so shrink the application-side floor to let the
    // optimizer fire on fixture-scale input. (It applies to inner/semi
    // joins — NOT to an anti-join's probe side, where absent-from-bloom
    // rows are exactly the rows to keep.)
    val conf = spark.conf
    val old = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val oldBc = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // injection is skipped for probably-broadcast joins; fixture tables
    // all fit under the default 10MB threshold, so force the shuffle
    // shape the rule targets (which is also the true shape at 100 TB)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      val o = Tables.orders(spark, sf)
        .filter($"o_totalprice" > 500000.0) // selective creation side
        .select($"o_orderkey")
      val joined = li.join(o, $"l_orderkey" === $"o_orderkey", "left_semi")
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        "runtime bloom filter not injected:\n" + p.take(1500))
      // and it must not change results vs the un-filtered plan
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(o, $"l_orderkey" === $"o_orderkey", "left_semi").count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() === expected)
    } finally {
      old match {
        case Some(v) => conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", v)
        case None => conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      }
      oldBc match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("partitioned sink: partition pruning skips non-matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter($"event_type" === "click")
    val p = plan(back)
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    val expected = Tables.events(spark, sf).filter($"event_type" === "click").count()
    assert(back.count() === expected)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The 100 TB star-join shape: fact partitioned on the join key's
    // domain, dim filtered AFTER planning — static pruning can't see
    // the surviving keys, DPP injects them as a runtime subquery
    // filter on the scan. Both tables land on disk so the planner
    // treats them as real sources (literal frames constant-fold).
    val base = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$base/fact")
    Tables.events(spark, sf).select($"event_type").distinct()
      .withColumn("dim_flag", ($"event_type" === "click").cast("int"))
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").filter($"dim_flag" === 1)
    val joined = fact.join(dim, "event_type").agg(count(lit(1)).as("n"))
    val n = joined.collect().head.getLong(0)
    assert(n == Tables.events(spark, sf).filter($"event_type" === "click").count())
    val p = plan(joined)
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no dynamic pruning expression on the fact scan:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("runtime bloom-filter join: a selective dim filter injects might_contain on the fact scan") {
    // DPP's cousin for NON-partitioned fact columns: when the join is
    // shuffle-shaped and one side is filtered selectively, the
    // optimizer builds a bloom filter from the small side and pushes
    // might_contain onto the big side's scan — rows that cannot join
    // never enter the shuffle. Thresholds are tuned down because the
    // fixture is KBs (production defaults: 10 MB creation side); the
    // structural assertion is what matters at 100 TB.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join shape
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_rbf_").toString
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
        .write.mode("overwrite").parquet(s"$base/fact")
      Tables.orders(spark, sf).select($"o_orderkey", $"o_orderstatus")
        .write.mode("overwrite").parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter($"o_orderstatus" === "F")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val p = plan(joined)
      assert(p.contains("might_contain") || p.contains("bloomfilter"),
        "no runtime bloom filter on the fact side:\n" + p.take(1800))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("AQE skew join: a hot-key partition is split at runtime (skew=true in the final plan)") {
    // The AUTOMATIC tier of the skew story (q_agg_salted/q_join_salted
    // are the manual tier a library ships for pre-AQE engines or
    // aggregate skew): AQE detects an oversized shuffle partition at
    // runtime and splits it across reducers. Fixture: one key owns
    // ~90% of the fact side; thresholds tuned to fixture bytes — the
    // assertion is the structural skew=true marker on the join.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_skew_").toString
      // hot key 7: ~54k rows; 600 cold keys with 10 rows each
      spark.range(0, 60000).selectExpr(
          "CASE WHEN id % 10 < 9 THEN 7L ELSE id % 600 END AS k",
          "CAST(id AS DOUBLE) AS v",
          "repeat('x', 64) AS pad")
        .write.mode("overwrite").parquet(s"$base/fact")
      spark.range(0, 600).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS tag")
        .write.mode("overwrite").parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
      val joined = fact.join(dim, "k").groupBy($"tag").agg(sum($"v").as("sv"))
      joined.collect()
      val p = plan(joined)
      assert(p.contains("skew=true"),
        "AQE did not split the hot partition:\n" +
          p.linesIterator.filter(l => l.contains("Join")).mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q_decontaminate: eval n-gram set is broadcast, corpus side never shuffled on text") {
    val df = graft.operators.Pipeline.queries("q_decontaminate")(spark, sf)
    df.collect() // let AQE finalize join strategies
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "eval-set semi join is not broadcast:\n" + p.take(1500))
  }

  test("q_sample_hash: untouched columns (text) are pruned at the scan") {
    val p = plan(graft.operators.Pipeline.queries("q_sample_hash")(spark, sf))
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!read.contains("text"), s"scan reads the unprojected text column:\n$read")
  }

  test("q_join_salted: both sides shuffle on (key, salt), matching the plain join") {
    val conf = spark.conf
    val oldBc = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // the 100 TB shape: dim too big to broadcast
    try {
      val df = Skew.queries("q_join_salted")(spark, sf)
      val p = plan(df)
      assert(p.linesIterator.exists(l => l.contains("Exchange hashpartitioning") && l.contains("__salt")),
        "join does not shuffle on the salt:\n" + p.take(1500))
      val plain = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"o_orderstatus")
      assert(df.collect().toSeq === plain.collect().toSeq)
    } finally {
      oldBc match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("q_lateral / q_subquery decorrelate: no nested-loop or cartesian join") {
    // A Catalyst regression that stops decorrelating the per-row
    // subquery would silently re-quadratic these plans as
    // BroadcastNestedLoopJoin — fail loudly instead.
    Seq("q_lateral", "q_subquery").foreach { q =>
      val p = plan(graft.operators.RelationalExt.queries(q)(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q did not decorrelate to a hash/merge join:\n${p.take(1500)}")
    }
  }

  test("q_join_salted: dim replication (explode) applies only to the hot-key branch") {
    val df = Skew.queries("q_join_salted")(spark, sf)
    val p = plan(df)
    // exactly one explode — the hot dim slice; the cold branch joins plain
    val generates = p.linesIterator.count(l => l.contains("Generate explode"))
    assert(generates === 1, s"expected 1 explode (hot dim only), found $generates:\n${p.take(2000)}")
    // hot slice selected by semi join, cold remainder by anti join
    assert(p.contains("LeftSemi"), "hot-key semi join missing:\n" + p.take(2000))
    assert(p.contains("LeftAnti"), "cold-key anti join missing:\n" + p.take(2000))
  }

  test("bucketed embedding candidates: every label-keyed join is also cell-keyed") {
    // The scale guarantee of q_dedup_embed / q_knn_label: candidate
    // generation must join on the IVF cell, never on the label block
    // alone (a label-only join is quadratic within the block).
    graft.functions.VectorFunctions.register(spark)
    Seq(
      graft.operators.NearDup.queries("q_dedup_embed")(spark, sf),
      graft.operators.SimSearch.queries("q_knn_label")(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      val badJoin = p.linesIterator.find(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
         l.contains("BroadcastHashJoin")) &&
        l.contains("label") && !l.contains("cell"))
      assert(badJoin.isEmpty, s"block-wide label join remains: ${badJoin.getOrElse("")}")
    }
  }

  test("q_domain_cap: built-in WindowGroupLimit prunes the cap below the shuffle") {
    // The cap's whole scale story is that each mapper forwards <= K
    // rows per domain; a regression to a full-partition window would
    // ship every page of every hot domain across the wire.
    val df = graft.operators.Pipeline.queries("q_domain_cap")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    assert(p.contains("WindowGroupLimit"),
      "per-domain cap lost the map-side prune:\n" + p.take(1500))
  }

  test("q_pack_sequences: cumsum window is shard-partitioned, never global") {
    val p = plan(graft.operators.Pipeline.queries("q_pack_sequences")(spark, sf))
    assert(p.contains("windowspecdefinition(shard"),
      "packing window is not partitioned by shard (global cumsum = one reducer at scale):\n" +
        p.linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n"))
  }

  test("q_bm25: term predicate filters the array before the generator") {
    val p = plan(graft.operators.TextAnalysis.queries("q_bm25")(spark, sf))
    assert(p.contains("Generate explode(filter("),
      "explode runs on the unfiltered token array (O(corpus tokens) shuffle at scale):\n" +
        p.linesIterator.filter(_.contains("Generate")).mkString("\n"))
  }

  test("q_ivfpq_search: join-free single-scan search, only probed cells scored") {
    // IVFPQ's scale contract: coarse assignment, residual encode, and
    // ADC scoring are ONE map-only lineage (codebooks/LUTs are plan
    // literals), and the cell filter restricts scoring to the nprobe=2
    // probed cells — at 100 TB the other 14/16 of the corpus is never
    // touched.
    val df = graft.operators.Learn.queries("q_ivfpq_search")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val cells = rows.map(_.getInt(1)).toSet
    assert(cells.size <= 2, s"results must come from the 2 probed cells only, got $cells")
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    assert(!p.contains("Join"), "search lineage must be join-free:\n" + p.take(1500))
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("embeddings.parquet"))
    assert(scans === 1, s"search must read the corpus exactly once, got $scans scans")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must plan as per-partition heaps, not a global sort:\n" + p.take(1500))
  }

  test("q_lm_score / q_pmi: hint-free vocab joins still broadcast at fixture scale") {
    // The vocab/unigram tables are unbounded at web scale, so their
    // joins carry NO broadcast() hint — Spark must be free to shuffle
    // them past the threshold. This pins the other half of the
    // contract: at fixture scale the threshold-respecting planner
    // still picks a broadcast join, so demoting the hint cost nothing.
    for (q <- Seq("q_lm_score", "q_pmi")) {
      val df = graft.operators.TextAnalysis.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(p.contains("BroadcastHashJoin"),
        s"$q: vocab join should broadcast at fixture scale:\n" + p.take(1500))
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n" + p.take(1500))
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // The complement of manual salting (q_join_salted): when skew is
    // only known at runtime, AQE detects an oversized shuffle
    // partition and splits it. Thresholds are production-sized, so
    // shrink them to let the fixture-scale hot key trigger the path.
    val conf = spark.conf
    val olds = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // Hot key: half of lineitem re-keyed to one orderkey. The probe
      // side is spread over 8 map tasks first — a skewed reduce
      // partition can only be split at map-output granularity, so a
      // single-mapper (one parquet file) input could never split.
      val sf01 = "/root/testdata/sf0.01"
      val hot = Tables.lineitem(spark, sf01)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
        .repartition(8)
        .withColumn("k", when($"l_orderkey" % 2 === 0, lit(2L)).otherwise($"l_orderkey"))
      val dim = Tables.orders(spark, sf01).select($"o_orderkey".as("k"), $"o_orderstatus")
      val joined = hot.join(dim, "k")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("rev"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not mark the join skewed:\n" + p.take(2000))
    } finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q_upsert: merge costs exactly one hash shuffle (on the merge key)") {
    val p = plan(graft.operators.Reshape.queries("q_upsert")(spark, sf))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected a single key shuffle, got $exchanges:\n${p.take(1500)}")
  }

  /** Executed plan, FINAL section only — AdaptiveSparkPlanExec's
    * toString prints "== Final Plan ==" followed by "== Initial Plan
    * ==", and counting nodes across both double-counts everything the
    * AQE re-plan changed (e.g. a reused exchange still shows its
    * pre-reuse scan in the initial section).
    */
  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("q_chunk: chunking is map-only (no hash shuffle, only the presentation sort)") {
    val p = executed("q_chunk")
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking must not shuffle:\n" + p.take(1500))
  }

  test("q_cdc_apply: log compaction partial-aggregates; compacted delta broadcasts") {
    val p = executed("q_cdc_apply")
    assert(p.contains("partial_max_by"),
      "arg-max compaction lost map-side combine:\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "small compacted delta should broadcast against the snapshot:\n" + p.take(1500))
  }

  test("q_doc_reconstruct: built-in WindowGroupLimit prunes the rn=1 dedup map-side") {
    val p = executed("q_doc_reconstruct")
    val partialIdx = p.linesIterator.indexWhere(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    val shuffleIdx = p.linesIterator.indexWhere(l =>
      l.contains("Exchange hashpartitioning") && l.contains("fp#"))
    assert(partialIdx >= 0, "no partial WindowGroupLimit in:\n" + p.take(2000))
    assert(shuffleIdx >= 0 && partialIdx > shuffleIdx,
      s"Partial prune (line $partialIdx) must sit BELOW the fingerprint shuffle (line $shuffleIdx) " +
        "— plans print top-down, so map-side nodes have larger line indexes")
  }

  test("q_dsir_weight: exactly one corpus scan (bucket model reuses the tf exchange)") {
    val p = executed("q_dsir_weight")
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet"))
    assert(scans === 1,
      s"model fit + scoring must share one corpus scan, got $scans:\n" + p.take(2000))
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      "bucket branch should reuse the tf exchange:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "bucket table must broadcast")
  }

  test("q_semantic_dedup: cell-equi join only — no nested-loop/cartesian pairing") {
    val p = executed("q_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must stay an equi-join on the cell key:\n" + p.take(2000))
  }

  test("q_span_mask: corruption is map-only (no hash shuffle, only the presentation sort)") {
    val p = executed("q_span_mask")
    assert(!p.contains("Exchange hashpartitioning"),
      "span corruption must not shuffle:\n" + p.take(1500))
  }

  test("q_bpe_pairs: corpus text never shuffles — only (pair, count) partials do") {
    val p = executed("q_bpe_pairs")
    assert(p.contains("partial_count") || p.contains("partial"),
      "pair counting must partial-aggregate map-side:\n" + p.take(1500))
    // the only hash exchange carries the 2-char pair key, never text
    val exch = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exch.nonEmpty && exch.forall(l => l.contains("pair") && !l.contains("text")),
      "unexpected exchange contents:\n" + exch.mkString("\n"))
  }

  test("q_dau_wau: events collapse to (day,user) grain BEFORE the trailing-window explode") {
    val df = SparkEntry.queries("q_dau_wau")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the generator must sit above an aggregate, not above the scan —
    // otherwise every raw event (not every distinct (day,user) row)
    // would be replicated 7×
    val gen = p.indexOf("Generate explode")
    assert(gen >= 0, "expected the sequence+explode generator:\n" + p.take(1200))
    val aggBelow = p.indexOf("HashAggregate", gen)
    assert(aggBelow >= 0,
      "no aggregate below the generator — raw events are being replicated:\n" + p.take(2000))
  }

  test("q_gini: the rank window consumes the customer-grain aggregate, not raw orders") {
    val df = SparkEntry.queries("q_gini")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val win = p.indexOf("Window")
    assert(win >= 0, p.take(800))
    // below the window there must be a partial+final aggregate (the
    // per-customer revenue rollup) so the single-partition sort sees
    // customer-grain rows only
    assert(p.indexOf("HashAggregate", win) >= 0 || p.indexOf("SortAggregate", win) >= 0,
      "rank window must sit above the customer aggregate:\n" + p.take(2000))
  }

  test("q_ks_test: the event stream collapses to distinct values before the ordered window") {
    val df = SparkEntry.queries("q_ks_test")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the vm-grain aggregate (with map-side partials) must sit below
    // the single-partition window, so the sequential part of the ECDF
    // sweep sees the bounded distinct-value table, not the raw events
    val agg = p.indexOf("partial_sum")
    assert(agg >= 0, "no map-side partials under the KS window:\n" + p.take(1500))
    assert(p.contains("Window"), p.take(800))
  }

  test("q_quality_ensemble: map-only gate — no aggregate/join shuffle anywhere") {
    val df = SparkEntry.queries("q_quality_ensemble")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    // the only exchange allowed is the presentation orderBy's range
    // partitioning; a hashpartitioning exchange would mean a join or
    // aggregate crept into what must run at scan bandwidth
    assert(!p.contains("Exchange hashpartitioning"),
      "quality gate shuffles:\n" + p.take(1500))
    assert(!p.contains("HashAggregate"), "quality gate aggregates:\n" + p.take(1500))
  }

  test("q_item_rec: the similarity model broadcasts; the rec cap is map-side pruned") {
    val df = SparkEntry.queries("q_item_rec")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // the catalog-sized top-10 model must reach the owned-items
    // expansion as a broadcast build side
    assert(p.contains("BroadcastHashJoin"),
      "expansion join is not broadcast:\n" + p.take(1500))
    // both row_number caps (top-10 co-items, top-3 recs) run through
    // Spark's WindowGroupLimit map-side prune
    assert(p.contains("WindowGroupLimit"),
      "rank caps not map-side pruned:\n" + p.take(1500))
  }

  test("q_dedup_incremental: the incoming batch's bands broadcast into the candidate join") {
    val df = SparkEntry.queries("q_dedup_incremental")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    // the new side is the small side by construction; the candidate
    // join against the corpus bands must be a broadcast hash join so
    // the existing-corpus side never shuffles for it
    assert(p.contains("BroadcastHashJoin"),
      "candidate join is not broadcast:\n" + p.take(1500))
  }

  test("q_sparse_knn: per-doc top-5 is map-side pruned; posting join is equi") {
    val df = SparkEntry.queries("q_sparse_knn")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "top-5 cap not map-side pruned:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "posting self-join lost its equi key:\n" + p.take(1500))
  }

  test("q_graph_sample: both fanout caps prune map-side via WindowGroupLimit") {
    val df = SparkEntry.queries("q_graph_sample")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    // two sampled hops → two window top-k caps, each must carry the
    // map-side WindowGroupLimit so a celebrity node ships F rows, not
    // its degree
    val limits = p.linesIterator.count(_.contains("WindowGroupLimit"))
    assert(limits >= 2, s"expected 2+ WindowGroupLimits, found $limits in:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "cartesian in sampling plan")
  }

  test("q_hard_negatives: query block broadcasts; corpus vectors never hash-shuffle") {
    val df = SparkEntry.queries("q_hard_negatives")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query block not broadcast:\n" + p.take(1500))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-2 not map-side pruned:\n" + p.take(1500))
    // the only hash exchange may carry (qid, scored row) triples for
    // the window — the embeddings scan itself must feed the scoring
    // projection directly, without a prior exchange
    val beforeScore = p.split("WindowGroupLimit")(0)
    assert(!beforeScore.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("embedding")),
      "corpus vectors shuffle before scoring:\n" + p.take(2000))
  }

  test("q_dedup_winnow: scan data-filters stay free of the md5 gram hashing") {
    // the pushdown-recompute trap this query measured: without the
    // persist boundary, word_window_hashes lands in the parquet scan's
    // per-row DataFilters (interpreted, once per consumer) — 9× slower
    val df = SparkEntry.queries("q_dedup_winnow")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    val scanLines = p.linesIterator.filter(l => l.contains("FileScan") || l.contains("DataFilters"))
    assert(!scanLines.exists(_.contains("word_window_hashes")),
      "gram hashing pushed into scan filters:\n" + p.take(2000))
  }

  test("q_hits: per-round max attaches as a 1-row broadcast, never a shuffle") {
    val df = SparkEntry.queries("q_hits")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // the L∞ rescale's crossJoin(broadcast(max)) must plan as
    // BroadcastNestedLoopJoin on a 1-row side — a CartesianProduct or
    // a sort-merge join here would mean the score vector shuffles for
    // a scalar
    assert(p.contains("BroadcastNestedLoopJoin"),
      "max attach is not a broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "cartesian in HITS plan")
  }

  test("q_dbscan: role assembly is all equi-joins over the checkpointed pair frame") {
    // the candidate join + dot-product verify live BEHIND the pairs
    // localCheckpoint (executed at construction; its speed is pinned by
    // the bench and its exactness by the oracle/spec) — what the
    // returned plan can attest is the assembly: vec_id equi-joins only,
    // no cartesian, and no interpreted per-row lambda left anywhere
    val df = SparkEntry.queries("q_dbscan")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in DBSCAN plan")
    assert(!p.contains("zip_with"),
      "interpreted zip_with lambda in the assembly plan:\n" + p.take(2000))
    val joins = p.linesIterator.filter(_.contains("MergeJoin")).toSeq
    // vec_id joins assemble roles; the one nb-keyed join attaches each
    // border's neighboring core cluster
    assert(joins.forall(l => l.contains("vec_id") || l.contains("nb#")),
      "a role-assembly join is off the id keys:\n" + joins.mkString("\n"))
  }

  test("q_cms: the sketch build is a partial+final aggregate; cells broadcast to candidates") {
    val df = SparkEntry.queries("q_cms")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // map-side partial IS the per-partition sketch — without it every
    // token occurrence crosses the network instead of d·w cells
    assert(p.contains("partial_count"), "sketch build lost map-side combine:\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "64-cell sketch not broadcast into the estimate join:\n" + p.take(1500))
  }

  test("q_trustrank: seed attach is broadcast; iteration shuffles carry (node, rank) only") {
    val df = SparkEntry.queries("q_trustrank")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      "seed table not broadcast at the restart attach:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "cartesian in TrustRank plan")
  }

  test("q_skew_audit: per-key counts partial-aggregate; the ordered window never sees base rows") {
    val df = SparkEntry.queries("q_skew_audit")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // the per-key count must map-side combine (base rows stay local)
    assert(p.contains("partial_count"), "per-key count lost map-side combine:\n" + p.take(1500))
    // every Window sits above a HashAggregate (the per-key count
    // table), never directly above a scan — the q_auc posture that
    // keeps the global sort at key grain, not row grain
    val lines = p.linesIterator.toVector
    val windowIdxs = lines.zipWithIndex.collect { case (l, i) if l.contains("Window") => i }
    assert(windowIdxs.nonEmpty, "expected ranking windows in the audit plan")
    windowIdxs.foreach { wi =>
      val below = lines.drop(wi + 1).takeWhile(l => !l.contains("Scan parquet"))
      assert(below.exists(_.contains("HashAggregate")),
        s"window at line $wi runs over base rows:\n${lines.slice(wi, wi + 8).mkString("\n")}")
    }
    // the 1-row p99/total attaches broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "summary attach not broadcast:\n" + p.take(1500))
  }

  test("q_ivf_recall: probe/query tables broadcast; candidate join is cell-keyed") {
    val df = SparkEntry.queries("q_ivf_recall")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // the 10-query panel and its probe cells must broadcast into the
    // corpus-side joins — a shuffle there would move the corpus twice
    assert(p.contains("BroadcastHashJoin"),
      "broadcast missing from candidate/brute joins:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "cartesian in recall plan")
  }

  test("q_bucketed_join: co-located join + same-key aggregate run with zero hash exchanges") {
    val df = Relational.queries("q_bucketed_join")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // both scans must be bucketed reads...
    assert(p.contains("SelectedBucketsCount"),
      "join inputs are not bucketed scans:\n" + p.take(1500))
    // ...and bucketing must satisfy BOTH the join and the groupBy
    // distribution: the only allowed exchange is the final orderBy's
    // range partitioning.
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed layout failed to eliminate the hash shuffle:\n" + p.take(2000))
  }

  test("q_partitioned_scan: the lang predicate is a partition filter, not a data filter") {
    val df = Relational.queries("q_partitioned_scan")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    def bracket(tag: String): String = {
      val i = p.indexOf(tag + ": [")
      if (i < 0) "" else p.substring(i + tag.length + 3, p.indexOf("]", i))
    }
    assert(bracket("PartitionFilters").contains("lang"),
      "lang predicate did not become a partition filter:\n" + p.take(1500))
    // pruning happened at the directory listing — no residual lang
    // comparison may survive into the row scan
    assert(!bracket("PushedFilters").contains("lang") && !bracket("DataFilters").contains("lang"),
      "lang leaked into the row-group scan as a data filter:\n" + p.take(1500))
  }

  test("q_dataset_card: distinct-count expand still partial-aggregates before the shuffle") {
    val df = SparkEntry.queries("q_dataset_card")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // Spark plans multi-COUNT(DISTINCT) via Expand; the first
    // aggregate must still be partial so only (gid, key) rows shuffle
    assert(p.contains("Expand"), "expected Expand for multi-distinct:\n" + p.take(1200))
    assert(p.contains("partial_"), "datasheet aggregate lost map-side combine:\n" + p.take(1500))
  }

  test("q_rand_proj: the projection is map-only — no hash shuffle, no join") {
    val df = SparkEntry.queries("q_rand_proj")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(!p.contains("hashpartitioning"),
      "JL projection must not shuffle (8 longs should ship, not 64 floats):\n" + p.take(1500))
    assert(!p.contains("Join"), "JL projection must not join:\n" + p.take(1500))
  }

  test("q_script_mix: census is map-only — the only exchange is the output ordering") {
    val df = SparkEntry.queries("q_script_mix")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(!p.contains("hashpartitioning") && !p.contains("Join") && !p.contains("Aggregate"),
      "character census must run at scan speed:\n" + p.take(1500))
  }

  test("q_incr_join: the three delta terms broadcast their delta sides") {
    val df = SparkEntry.queries("q_incr_join")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    val nBroadcast = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(nBroadcast >= 3,
      s"expected the bd/db/dd delta terms as broadcast joins, saw $nBroadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), "IVM terms must never go cartesian")
  }

  test("q_lag_features: one user_id sort serves the whole window chain") {
    val df = SparkEntry.queries("q_lag_features")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    val userShuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userShuffles == 1,
      s"lag/rolling features must share ONE user_id shuffle, saw $userShuffles:\n" + p.take(1500))
    val sorts = p.linesIterator.count(l => l.contains("Sort [user_id"))
    assert(sorts == 1,
      s"the window chain must share one sort, saw $sorts:\n" + p.take(1500))
  }

  test("q_seq_pairs: the span table materializes once (no repeated events aggregation)") {
    val df = SparkEntry.queries("q_seq_pairs")(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    // the localCheckpoint shows up as Scan ExistingRDD; raw events must
    // not be re-aggregated per consumer
    val rawScans = p.linesIterator.count(l => l.contains("FileScan parquet") && l.contains("events"))
    assert(rawScans == 0,
      s"spans must come from the materialized checkpoint, saw $rawScans raw event scans:\n" + p.take(1500))
  }

  private def executedPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
  }

  test("audit-bank rank cuts are WindowGroupLimit-pruned map-side") {
    // q_pref_pairs (rank-1 best/worst), q_spec_accept (argmax
    // continuation), q_log_odds (top-3 terms), q_mrl_recall (rank-10
    // cut): each claims its rank window never ships full groups — a
    // regression to a full-partition window ships every token/vector
    // of every hot group at 100 TB.
    Seq(
      graft.operators.Audit.queries("q_pref_pairs"),
      graft.operators.Audit.queries("q_spec_accept"),
      graft.operators.Audit.queries("q_log_odds"),
      graft.operators.SimSearch.queries("q_mrl_recall")
    ).zip(Seq("q_pref_pairs", "q_spec_accept", "q_log_odds", "q_mrl_recall"))
      .foreach { case (q, name) =>
        val p = executedPlanOf(q(spark, sf))
        assert(p.contains("WindowGroupLimit"),
          s"$name lost the map-side rank prune:\n" + p.take(1500))
      }
  }

  test("q_dtw: the DP is one aggregate over the calendar-grain row — no corpus-side join") {
    val p = executedPlanOf(graft.operators.Stats.queries("q_dtw")(spark, sf))
    // the wavefront fold must appear as a plain expression, and the
    // only joins allowed are the calendar-spine left join
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("aggregate("), "wavefront fold expression missing:\n" + p.take(1500))
    val sorts = p.linesIterator.count(_.contains("Sort ["))
    assert(sorts <= 4, s"unexpected sort population ($sorts) — DP must not sort the corpus:\n" + p.take(1500))
  }

  test("q_js_drift / q_mmd_drift: token- and dim-grain aggregates are partial+final") {
    Seq("q_js_drift" -> graft.operators.Audit.queries("q_js_drift"),
      "q_mmd_drift" -> graft.operators.Audit.queries("q_mmd_drift")).foreach {
      case (name, q) =>
        val p = executedPlanOf(q(spark, sf))
        assert(p.contains("partial_"),
          s"$name lost map-side combine (full rows to the reducer at scale):\n" + p.take(1500))
    }
  }

  test("q_attribution: purchase×click join stays user-keyed (no cartesian, no corpus sort)") {
    val p = executedPlanOf(
      graft.operators.RelationalExt.queries("q_attribution")(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("user_id"), p.take(800))
  }

  test("q_cart_tree: histogram shuffle partial-aggregates; the split row broadcasts") {
    val p = executedPlanOf(graft.operators.Learn.queries("q_cart_tree")(spark, sf))
    // bucket histograms must combine map-side — the shuffle carries
    // (branch, fid, bucket) cells, not documents
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      "histogram lost map-side combine:\n" + p.take(1500))
    // the root split routes docs via a broadcast 1-row, never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "root split row is not broadcast:\n" + p.take(1500))
  }

  test("q_als_rank1: MAE attaches by broadcast; factor joins are key joins, not cartesian") {
    val p = executedPlanOf(graft.operators.Learn.queries("q_als_rank1")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row MAE aggregate is not broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_bandit_replay: one ctx exchange + in-partition sort (secondary sort, no extra shuffle)") {
    val df = graft.operators.Stats.queries("q_bandit_replay")(spark, sf)
    val p = executedPlanOf(df)
    // the per-group ordered fold must ride ONE hash exchange on ctx with
    // the (ts, event_id) sort applied within partitions — a global Sort
    // or a second exchange would mean the secondary sort degraded
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n" + p.take(1500))
    assert(p.contains("Sort ["), "no in-partition sort for the group iterator:\n" + p.take(1500))
    assert(!p.contains("Exchange rangepartitioning [ts"), "global sort on ts appeared")
  }

  test("q_spatial_join: grid blocking equi-joins (no cartesian); fanout is the 3×3 explode pair") {
    val p = executedPlanOf(
      graft.operators.RelationalExt.queries("q_spatial_join")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "spatial radius join must block to grid cells, not go all-pairs:\n" + p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "distance predicate must ride the cell equi-join, not a theta join:\n" + p.take(1500))
    // the 9× neighbor expansion is exactly the two sequence-explodes on
    // the probe side — any further Generate would mean the build side
    // (the 100 TB side at scale) fans out too
    val gens = p.linesIterator.count(_.contains("Generate explode"))
    assert(gens == 2, s"expected exactly 2 explodes (probe-side 3×3), saw $gens:\n" + p.take(1500))
  }

  test("q_concurrency: sweep line is join-free (the quadratic overlap self-join never appears)") {
    val p = executedPlanOf(
      graft.operators.RelationalExt.queries("q_concurrency")(spark, sf))
    assert(!p.contains("Join"),
      "interval concurrency must be ±1 marks + one window, never an overlap join:\n" + p.take(1500))
  }

  test("q_uplift_curve: user ranks come from score-grain windows, never a global user sort") {
    val p = executedPlanOf(graft.operators.Stats.queries("q_uplift_curve")(spark, sf))
    // the rank construction promises: cumulative counts at SCORE grain
    // + a score-partitioned row_number — the user table itself must
    // never range-partition (the one-reducer corpus sort)
    assert(!p.contains("Exchange rangepartitioning(user_id"),
      "user table globally sorted:\n" + p.take(1500))
    assert(!p.contains("Exchange rangepartitioning(score"),
      "user table range-shuffled by score:\n" + p.take(1500))
    assert(p.contains("hashpartitioning(score"),
      "per-score row_number window missing its score partition:\n" + p.take(1500))
  }

  test("q_diameter: the inter-sweep handoff is a broadcast 1-row frame, never a collect/cartesian") {
    val p = executedPlanOf(graft.operators.Graph.queries("q_diameter")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "argmax handoff is not broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }
}

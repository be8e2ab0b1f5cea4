package graft

import org.apache.spark.sql.functions._
import graft.operators.{NearDup, Pipeline}

/** Semantic invariants of the training-data pipeline bank (the oracle
  * gate pins exact values; these pin the properties that make the
  * operators *correct as pipeline stages* at any scale).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("hash sample is deterministic and a subset at roughly the nominal rate") {
    val a = Pipeline.queries("q_sample_hash")(spark, sf).select($"doc_id").collect().map(_.getLong(0))
    val b = Pipeline.queries("q_sample_hash")(spark, sf).select($"doc_id").collect().map(_.getLong(0))
    assert(a.sameElements(b), "re-run must make identical keep decisions")
    val n = docs.count()
    val all = docs.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(all), "sample must be a subset of the corpus")
    // 10% Bernoulli: allow generous slack at tiny SF (binomial spread)
    assert(a.length > n * 0.03 && a.length < n * 0.25, s"rate ${a.length}/$n far from 10%")
  }

  test("q_mixture_approx: sizes near quota, subset of stratum, repeatable") {
    // sf0.01 (500 docs) so the quota is a PARTIAL slice of each
    // stratum — at sf0.001 every stratum fits under quota and the
    // threshold path degenerates to keep-all.
    val d01 = "/root/testdata/sf0.01"
    val got = Pipeline.queries("q_mixture_approx")(spark, d01).collect()
    val nLang = Tables.documents(spark, d01).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = got.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    byLang.foreach { case (lang, n) =>
      val quota = if (lang == "en") 40L else 15L
      val target = math.min(quota, nLang(lang))
      val tol = math.max(3L, (target * 0.3).toLong)
      assert(math.abs(n - target) <= tol, s"$lang: got $n, target $target (±$tol)")
    }
    // every picked doc belongs to its stratum
    val all = Tables.documents(spark, d01).select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall(r => all(r.getLong(0)) == r.getString(1)))
    // same session, same thresholds → identical pick set
    val again = Pipeline.queries("q_mixture_approx")(spark, d01).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("stratified sample keeps minority strata at the higher rate") {
    val byLang = Pipeline.queries("q_sample_stratified")(spark, sf)
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val restKept = (byLang - "en").values.sum.toDouble
    val restTotal = (totals - "en").values.sum.toDouble
    assert(restKept / restTotal > enRate, "minority strata must be kept at a higher rate")
  }

  test("mixture hits each stratum quota exactly (capped by stratum size)") {
    val got = Pipeline.queries("q_mixture")(spark, sf)
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val quota = if (lang == "en") 40L else 15L
      assert(got.getOrElse(lang, 0L) === math.min(quota, n), s"stratum $lang")
    }
  }

  test("train shards partition the corpus; positions are contiguous from 1") {
    val sh = Pipeline.queries("q_train_shard")(spark, sf).cache()
    try {
      assert(sh.count() === docs.count(), "every doc lands in exactly one shard")
      assert(sh.filter($"shard" < 0 || $"shard" > 7).count() === 0)
      val bad = sh.groupBy($"shard")
        .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
        .filter($"mx" =!= $"n" || $"mn" =!= 1).count()
      assert(bad === 0, "pos must be a dense 1..n ranking per shard")
    } finally sh.unpersist()
  }

  test("shard count is a run parameter: graft.pipeline.shards rescales both shard queries") {
    // 100 TB posture: shard count must be tunable far above reducer
    // parallelism; the fixture default (8) is only the oracle scale.
    val prev = spark.conf.getOption("graft.pipeline.shards")
    spark.conf.set("graft.pipeline.shards", "32")
    try {
      val sh = Pipeline.queries("q_train_shard")(spark, sf).cache()
      try {
        assert(sh.count() === docs.count(), "repartitioned corpus lost docs")
        assert(sh.agg(max($"shard")).head.getLong(0) > 7, "shard space did not widen")
        val bad = sh.groupBy($"shard")
          .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
          .filter($"mx" =!= $"n" || $"mn" =!= 1).count()
        assert(bad === 0, "pos must stay a dense 1..n ranking per shard at any count")
      } finally sh.unpersist()
      val packed = Pipeline.queries("q_pack_sequences")(spark, sf)
      assert(packed.count() === docs.count())
      assert(packed.agg(max($"shard")).head.getLong(0) > 7)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.pipeline.shards", v)
      case None    => spark.conf.unset("graft.pipeline.shards")
    }
  }

  test("q_pack_ffd: matches an independent FFD; bins respect capacity and actually pack") {
    val cap = 128L
    val got = Pipeline.queries("q_pack_ffd")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc packed exactly once, token counts true
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.length.toLong === nDocs)
    val trueTokens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "cast(size(split(text, ' ')) as bigint) AS n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, _, _, n) => assert(n === trueTokens(id)) }
    // no regular bin over capacity; oversized docs (n > cap) — none on
    // this fixture — may only ever appear in the marked overflow bin −1
    val fills = got.filter(_._3 >= 0)
      .groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._4).sum).toMap
    assert(fills.values.forall(_ <= cap), s"overfull bin: ${fills.filter(_._2 > cap)}")
    got.foreach { case (id, _, bin, n) =>
      assert((bin === -1L) === (n > cap), s"doc $id: n=$n bin=$bin")
    }
    // independent FFD replay per shard (trusting only the shard split
    // and token counts from the output, both pinned above)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val order = rows.map(r => (r._1, r._4)).sortBy { case (id, n) => (-n, id) }
      val fills2 = scala.collection.mutable.ArrayBuffer.empty[Long]
      val expected = order.map { case (id, n) =>
        if (n > cap) id -> -1L
        else {
          var b = fills2.indexWhere(_ + n <= cap)
          if (b < 0) { fills2 += 0L; b = fills2.length - 1 }
          fills2(b) += n
          id -> b.toLong
        }
      }.toMap
      rows.foreach { case (id, _, bin, _) =>
        assert(bin === expected(id), s"doc $id bin mismatch")
      }
    }
    // packing packs: strictly fewer bins than docs
    assert(fills.size < got.length)
  }

  test("ffdPlace routes oversized docs to the overflow bin, never an over-capacity bin") {
    // doc 10 (200 tokens) exceeds cap=128: overflow bin −1; the rest
    // pack normally — 100+28 share bin 0, 90 opens bin 1
    val placed = Pipeline.ffdPlace(Seq((10L, 200L), (11L, 100L), (12L, 90L), (13L, 28L)), 128L)
      .map { case (id, bin, _) => id -> bin }.toMap
    assert(placed === Map(10L -> -1L, 11L -> 0L, 12L -> 1L, 13L -> 0L))
  }

  test("domain cap keeps min(10, n) docs per source, chosen by hash not arrival") {
    val capped = Pipeline.queries("q_domain_cap")(spark, sf).cache()
    try {
      val perSource = capped.groupBy($"source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val totals = docs.groupBy($"source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      totals.foreach { case (src, n) =>
        assert(perSource.getOrElse(src, 0L) === math.min(10L, n), s"source $src")
      }
      // unbiased selection: NOT simply the lowest doc_ids of each source
      val lowestIds = docs.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"source").orderBy($"doc_id")))
        .filter($"rn" <= 10).select($"doc_id").as[Long].collect().toSet
      val kept = capped.select($"doc_id").as[Long].collect().toSet
      assert(kept !== lowestIds, "cap degenerated to first-K-by-id (arrival-order bias)")
    } finally capped.unpersist()
  }

  test("ttr is in (0,1], types never exceed tokens, keep matches the threshold") {
    Pipeline.queries("q_ttr")(spark, sf).collect().foreach { r =>
      val (tok, typ, ttr, keep) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))
      assert(typ >= 1 && typ <= tok)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(keep === (if (ttr >= 0.3) 1 else 0))
    }
  }

  test("quality terciles are balanced within each lang; head outscores tail") {
    val tiers = Pipeline.queries("q_quality_tercile")(spark, sf)
      .join(Pipeline.queries("q_ttr")(spark, sf).select($"doc_id", $"ttr"), "doc_id")
      .cache()
    try {
      tiers.groupBy($"lang").pivot("tier", Seq("head", "middle", "tail")).count()
        .collect().foreach { r =>
          val ns = Seq(1, 2, 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i))
          assert(ns.max - ns.min <= 1, s"lang ${r.getString(0)}: unbalanced terciles $ns")
        }
      // every head doc scores >= every tail doc within its language
      val worstHead = tiers.filter($"tier" === "head")
        .groupBy($"lang").agg(min($"ttr").as("mn"))
      val bestTail = tiers.filter($"tier" === "tail")
        .groupBy($"lang").agg(max($"ttr").as("mx"))
      worstHead.join(bestTail, "lang").collect().foreach { r =>
        assert(r.getDouble(1) >= r.getDouble(2) - 1e-4,
          s"lang ${r.getString(0)}: head ${r.getDouble(1)} < tail ${r.getDouble(2)}")
      }
    } finally tiers.unpersist()
  }

  test("decontamination: no survivor shares a 3-gram with the eval set") {
    graft.functions.VectorFunctions.register(spark)
    val survivors = Pipeline.queries("q_decontaminate")(spark, sf).select($"doc_id")
    val ng = docs.select($"doc_id", explode(expr("word_shingles(text, 3)")).as("ng"))
    val evalNg = ng.filter($"doc_id" % 23 === 0).select($"ng").distinct()
    val leaked = ng.join(survivors, "doc_id").join(evalNg, "ng").count()
    assert(leaked === 0)
    assert(survivors.filter($"doc_id" % 23 === 0).count() === 0, "eval docs must not survive")
  }

  test("contamination report covers exactly the shingle-bearing eval docs, overlap in [0,1]") {
    graft.functions.VectorFunctions.register(spark)
    val report = Pipeline.queries("q_contamination_report")(spark, sf).cache()
    try {
      val evalWithNg = docs.filter($"doc_id" % 23 === 0)
        .filter(size(expr("word_shingles(text, 3)")) > 0).count()
      assert(report.count() === evalWithNg)
      assert(report.filter($"doc_id" % 23 =!= 0).count() === 0, "non-eval doc in report")
      val bad = report.filter($"n_hit" > $"n_ngrams" ||
        $"overlap" < 0.0 || $"overlap" > 1.0).count()
      assert(bad === 0)
    } finally report.unpersist()
  }

  test("token budget: slices partition the corpus; shares reach 1.0 per lang") {
    val budget = Pipeline.queries("q_token_budget")(spark, sf).cache()
    try {
      assert(budget.agg(sum($"n_docs")).head.getLong(0) === docs.count())
      // last (largest-cum) row of each lang must carry the full share
      budget.groupBy($"lang").agg(max($"lang_share").as("mx"))
        .collect().foreach(r => assert(r.getDouble(1) === 1.0, s"lang ${r.getString(0)}"))
      // cum_tokens is the running sum of the slice's own tokens
      val inconsistent = budget
        .withColumn("chk", sum($"tokens").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang")
            .orderBy($"tokens".desc, $"source")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .filter($"chk" =!= $"cum_tokens").count()
      assert(inconsistent === 0)
    } finally budget.unpersist()
  }

  test("tfidf internal consistency: idf = ln(n_lang/df), mass = tf*idf, df >= 10") {
    val nLang = docs.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Pipeline.queries("q_tfidf")(spark, sf).collect().foreach { r =>
      val (lang, df, tf) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (idf, mass) = (r.getDouble(4), r.getDouble(5))
      assert(df >= 10)
      assert(math.abs(idf - math.log(nLang(lang).toDouble / df)) < 1e-4)
      assert(math.abs(mass - tf * math.log(nLang(lang).toDouble / df)) < 1e-3)
    }
  }

  test("histogram buckets cover the corpus exactly once") {
    val h = Pipeline.queries("q_histogram")(spark, sf).collect()
    assert(h.map(_.getLong(1)).sum === docs.count())
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    h.filter(_.getLong(0) < 9).foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(2) >= b * 64 && r.getLong(3) < (b + 1) * 64, s"bucket $b bounds")
    }
  }

  test("observe(): quality metrics ride the main action, no second scan") {
    // At 100 TB you cannot afford a separate counting pass per metric;
    // observe() attaches named aggregates to the existing action.
    val obs = org.apache.spark.sql.Observation("corpus_quality")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when($"n_chars" < 64, 1L).otherwise(0L)).as("short_docs"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("en_docs"))
      .filter($"n_chars" >= 64)
      .count()
    val m = obs.get
    assert(m("rows_in") === docs.count())
    assert(m("rows_in").asInstanceOf[Long] - m("short_docs").asInstanceOf[Long] === kept)
    assert(m("en_docs") === docs.filter($"lang" === "en").count())
  }

  test("q_sample_weighted: weight-proportional draw skews toward long docs, reproducibly") {
    val sample = Pipeline.queries("q_sample_weighted")(spark, sf).collect()
    assert(sample.length == 100)
    // keys are strictly ordered (ties broken by doc_id inside the sort)
    val keys = sample.map(r => (r.getLong(3), r.getLong(0)))
    assert(keys.sameElements(keys.sorted), "output not in (key_nano, doc_id) order")
    // A-Res draws ∝ weight: the sample's mean n_chars must exceed the
    // corpus mean (n_chars IS the weight)
    val sampleMean = sample.map(_.getLong(2)).sum.toDouble / sample.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg($"n_chars")).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    // bit-identical across runs (RNG-free)
    val again = Pipeline.queries("q_sample_weighted")(spark, sf).collect()
    assert(sample.map(_.getLong(0)).sameElements(again.map(_.getLong(0))))
  }

  test("dedup clustering: edges never cross clusters; one canonical = min id per cluster") {
    val labels = NearDup.queries("q_dedup_cluster")(spark, sf).cache()
    try {
      val lab = labels.select($"doc_id", $"cluster_id")
      val crossing = NearDup.jaccardPairs(spark, sf)
        .join(lab.withColumnRenamed("doc_id", "a_id").withColumnRenamed("cluster_id", "ca"), "a_id")
        .join(lab.withColumnRenamed("doc_id", "b_id").withColumnRenamed("cluster_id", "cb"), "b_id")
        .filter($"ca" =!= $"cb").count()
      assert(crossing === 0, "near-dup edge endpoints must share a cluster")
      val badClusters = labels.groupBy($"cluster_id")
        .agg(min($"doc_id").as("mn"),
          sum(when($"canonical", 1L).otherwise(0L)).as("nCanon"))
        .filter($"mn" =!= $"cluster_id" || $"nCanon" =!= 1).count()
      assert(badClusters === 0, "cluster_id must be the component minimum, with exactly one canonical")
    } finally labels.unpersist()
  }

  test("q_sample_weighted: every key_nano sits far from a floor boundary (libm guard)") {
    // -ln(u) consults each engine's libm on 2^31 possible hash inputs —
    // no literal table can cover it (the q_dsir_weight guard recipe):
    // recompute each doc's key at all three fixture SFs and assert a
    // >= 1e-5 gap to the nearest floor boundary, ~50x the worst
    // cross-libm divergence, so engine ln() disagreement can never
    // flip a key (neither the reported key_nano nor top-100
    // membership) on these fixtures.
    val (a2, b2, p) = (1803301271L, 592394837L, 2147483647L)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, dir)
        .select($"doc_id", $"n_chars").collect()
      assert(docs.nonEmpty)
      val minDist = docs.map { r =>
        val (id, nc) = (r.getLong(0), r.getLong(1))
        val u = ((a2 * (id % p) + b2) % p + 1).toDouble / (p + 1)
        val x = -math.log(u) / nc * 1e9
        math.min(x - math.floor(x), math.ceil(x) - x)
      }.min
      assert(minDist > 1e-5,
        s"$dir: a weighted-sample key sits $minDist from a floor boundary — " +
          "cross-engine libm divergence could flip it")
    }
  }

  test("q_freq_triples: matches a driver-side recount; sub-pair containment holds") {
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted.toIndexedSeq)
    val triples = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { items =>
      for (i <- items.indices; j <- (i + 1) until items.length) {
        pairs((items(i), items(j))) = pairs.getOrElse((items(i), items(j)), 0L) + 1
        for (k <- (j + 1) until items.length) {
          val key = (items(i), items(j), items(k))
          triples(key) = triples.getOrElse(key, 0L) + 1
        }
      }
    }
    val expected = triples.filter(_._2 >= 2).toMap
    val got = Pipeline.queries("q_freq_triples")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == expected, s"${got.size} triples vs ${expected.size} expected")
    // A-priori containment: a triple's support never exceeds any sub-pair's
    got.foreach { case ((a, b, c), s) =>
      assert(s <= pairs((a, b)) && s <= pairs((b, c)) && s <= pairs((a, c)),
        s"($a,$b,$c) support $s exceeds a sub-pair")
    }
  }

  test("q_item_rec: never recommends an owned item; per-customer ranks are dense and ordered") {
    val recs = Pipeline.queries("q_item_rec")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(recs.nonEmpty)
    val owned = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recs.forall { case (c, item, _, _) => !owned((c, item)) },
      "a recommendation is already owned")
    recs.groupBy(_._1).foreach { case (c, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rs.length), s"cust $c ranks not dense")
      // ranks follow (score DESC, rec_item ASC)
      val keys = byRank.map(t => (-t._3, t._2)).toSeq
      assert(keys == keys.sorted, s"cust $c rank order violates the tiebreak")
    }
  }

  test("q_twap: duration weighting recomputes exactly; held values dominate blips") {
    val out = graft.operators.Reshape.queries("q_twap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.nonEmpty)
    // replay orders by FULL-precision ts (the window's key), then
    // truncates to seconds — sorting by the truncated sec would
    // reorder same-second events
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      val s = xs.sortBy(x => (x._3, x._2)).map(x => (x._3 / 1000000L, x._4))
      val span = s.map(_._1).max - s.map(_._1).min
      val wsum = s.zip(s.drop(1)).map { case (a, b) => a._2 * (b._1 - a._1) }.sum
      (u, s.length.toLong, span, if (span == 0) -1L else wsum / span)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected, "TWAP diverges from the driver recompute")
    // TWAP must sit inside the value range it averages
    val range = ev.groupBy(_._1).map { case (u, xs) => u -> (xs.map(_._4).min, xs.map(_._4).max) }
    out.filter(_._4 >= 0).foreach { case (u, _, _, t) =>
      val (lo, hi) = range(u)
      assert(t >= lo - 1 && t <= hi, s"user $u TWAP $t outside [$lo,$hi]")
    }
  }

  test("q_k_anon: classes partition the corpus; flags and suppression are consistent") {
    val out = graft.operators.Reshape.queries("q_k_anon")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(out.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_._3).sum == total, "classes do not partition the corpus")
    out.foreach { case (lang, band, n, anon, sup) =>
      assert(n >= 1)
      assert(anon == (n >= 5), s"($lang,$band) flag inconsistent")
      assert(sup == (if (n < 5) n else 0L), s"($lang,$band) suppression cost wrong")
    }
    // the band choice must leave BOTH outcomes represented, or the
    // audit is vacuous on this corpus
    assert(out.exists(_._4) && out.exists(!_._4), "k-anonymity audit vacuous")
    // driver recompute of the class table
    val expected = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("long").as("nc"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 256L))
      .groupBy(identity).map { case ((l, b), xs) =>
        val n = xs.length.toLong
        (l, b, n, n >= 5, if (n < 5) n else 0L)
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expected, "class table diverges from the driver recompute")
  }

  test("q_t_closeness: TVD matches the driver recompute and is bounded in [0, 1e6]") {
    val out = graft.operators.Reshape.queries("q_t_closeness")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.nonEmpty)
    val rows = Tables.documents(spark, sf)
      .select(col("lang"), expr("n_chars DIV 256").as("band"), col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val gn = rows.length.toLong
    val globalBySrc = rows.groupBy(_._3).map { case (s, xs) => s -> xs.length.toLong }
    val sources = globalBySrc.keys.toSeq
    rows.groupBy(r => (r._1, r._2)).foreach { case (cls, xs) =>
      val n = xs.length.toLong
      val bySrc = xs.groupBy(_._3).map { case (s, ys) => s -> ys.length.toLong }
      val tvd = sources.map { src =>
        val p = bySrc.getOrElse(src, 0L) * 1000000L / n
        val q = globalBySrc(src) * 1000000L / gn
        math.abs(p - q)
      }.sum / 2
      val (gotN, gotTvd, gotClose) = out(cls)
      assert(gotN == n && gotTvd == tvd, s"$cls: tvd $gotTvd vs driver $tvd")
      assert(gotClose == (tvd <= 200000L))
      assert(tvd >= 0 && tvd <= 1000000L)
    }
    // the audit must separate tight classes from leaky ones on this corpus
    assert(out.values.exists(_._3) && out.values.exists(!_._3), "t-closeness audit vacuous")
  }

  test("q_rfm: quintiles are balanced and segment populations partition the customers") {
    val segs = graft.operators.RelationalExt.queries("q_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCust = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(segs.map(_._2).sum == nCust, "segments do not partition the customers")
    // every digit of every code is a valid quintile 1..5
    segs.foreach { case (code, _, spend) =>
      val (r, f, m) = (code / 100, (code / 10) % 10, code % 10)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5, s"bad code $code")
      assert(spend >= 0)
    }
    // each metric's quintile populations differ by at most 1 (ntile contract)
    Seq[Long => Long](_ / 100, c => (c / 10) % 10, _ % 10).foreach { digit =>
      val byQ = segs.groupBy(t => digit(t._1)).map { case (q, xs) => q -> xs.map(_._2).sum }
      assert(byQ.keys.toSet == Set(1L, 2L, 3L, 4L, 5L))
      assert(byQ.values.max - byQ.values.min <= 1, s"unbalanced quintiles: $byQ")
    }
  }

  test("q_epoch_plan: plan recomputes exactly; cap and shortfall are consistent") {
    val out = Pipeline.queries("q_epoch_plan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = toks.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    val nl = byLang.size.toLong
    val budget = 100000L
    val expected = byLang.toSeq.sortBy(_._1).map { case (l, t) =>
      val target = budget / nl
      (l, t, target, math.min(target * 1000000L / t, 4000000L),
        math.min(target, 4 * t), target - math.min(target, 4 * t), target > 4 * t)
    }
    assert(out.toSeq == expected, "epoch plan diverges from the driver recompute")
    out.foreach { case (l, t, target, em, eff, short, constrained) =>
      assert(em <= 4000000L, s"$l epochs above the 4-epoch cap")
      assert(eff + short == target, s"$l effective+shortfall != target")
      assert(constrained == (short > 0), s"$l constrained flag inconsistent")
      assert(eff <= 4 * t, s"$l effective exceeds 4 epochs of data")
    }
  }

  test("q_length_bucket: buckets recompute exactly from per-doc token counts") {
    val out = Pipeline.queries("q_length_bucket")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n")).collect().map(_.getLong(0))
    val maxLen = lens.max
    val expected = lens.groupBy(n => ((n + 15) / 16) * 16).toSeq.map { case (bl, xs) =>
      val nd = xs.length.toLong; val st = xs.sum
      (bl, nd, st, nd * bl - st, nd * maxLen - st, (nd * bl - st) * 1000000L / (nd * bl))
    }.sortBy(_._1)
    assert(out.toSeq == expected, "bucket table diverges from the driver recompute")
    // padding the bucketing pays is bounded: < 16 tokens per doc by
    // construction (pad-to-multiple-of-16), while the naive global-max
    // batcher pays up to max_len − n per doc
    out.foreach { case (bl, nd, _, pad, _, _) =>
      assert(bl % 16 == 0 && pad >= 0 && pad < nd * 16, s"bucket $bl pad out of bounds")
    }
    // in aggregate the bucketed plan must beat padding-to-global-max on
    // this corpus (the operator's reason to exist); alignment slack can
    // invert only the top bucket, never the total
    val totPad = out.map(_._4).sum; val totNaive = out.map(_._5).sum
    assert(totPad <= totNaive, s"bucketing paid $totPad vs naive $totNaive")
  }

  test("q_dp_response: debiasing identity, determinism, and bounded fixture error") {
    import spark.implicits._
    val out = Pipeline.queries("q_dp_response")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val n = out.map(_._2).sum
    // Σ_k n̂_k = n exactly: the k-RR estimator is self-normalizing
    // (2·Σn_rep − 5·(n/5) = n), so the published totals reconcile
    assert(out.map(_._4).sum == 1000L * n, "estimates do not sum to n")
    // reports re-derive bit-identically (hash noise, not RNG)
    val again = Pipeline.queries("q_dp_response")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq, "DP reports are not replayable")
    // err_milli column is est − 1000·truth by construction
    out.foreach { case (_, nt, _, est, err) => assert(err == est - 1000L * nt) }
    // sampling error at fixture scale: |n̂ − n| per class is bounded by
    // a generous 6σ of the binomial flip noise (σ² ≤ n·(1−p)p·4 in
    // debiased units → σ ≤ 2·sqrt(n)); catches a broken estimator
    // (which is off by Θ(n)) without flaking on the fixed hash draw
    out.foreach { case (lang, nt, _, est, _) =>
      val bound = 12000L * math.ceil(math.sqrt(n.toDouble)).toLong
      assert(math.abs(est - 1000L * nt) <= bound, s"$lang est off by more than 6σ")
    }
  }

  test("q_dp_histogram: geometric noise recomputes from the hash bit trick; replayable") {
    import spark.implicits._
    val out = Pipeline.queries("q_dp_histogram")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.nonEmpty)
    val P = 2147483647L; val A2 = 1803301271L; val B2 = 592394837L
    val langIdx = Map("de" -> 0L, "en" -> 1L, "es" -> 2L, "fr" -> 3L).withDefaultValue(4L)
    out.foreach { case (lang, bl, nTrue, noise, nNoisy) =>
      val cell = bl * 7 + langIdx(lang)
      val h = (A2 * (cell % P) + B2) % P
      val sign = if ((h & 1L) == 1L) 1L else -1L
      val x = h / 2
      val mag = java.lang.Long.bitCount(((~x) & (x + 1)) - 1).toLong
      assert(noise == sign * mag, s"cell ($lang,$bl) noise $noise != recompute ${sign * mag}")
      assert(nNoisy == nTrue + noise)
    }
    // geometric(1/2) magnitudes: P(mag = 0) = 1/2 — about half the
    // cells carry zero-magnitude noise, and large magnitudes are rare
    val zeros = out.count(_._4 == 0)
    assert(zeros >= out.length / 5, s"too few zero-noise cells: $zeros/${out.length}")
    assert(out.forall(r => math.abs(r._4) <= 31), "magnitude beyond any plausible draw")
    // replayable: a second run is bit-identical
    val again = Pipeline.queries("q_dp_histogram")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == again.toSeq)
  }

  test("q_curriculum: schedule is a monotone partition reaching full coverage") {
    import spark.implicits._
    val out = Pipeline.queries("q_curriculum")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    val nDocs = Tables.documents(spark, sf).count()
    val nToks = Tables.documents(spark, sf)
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) n").agg(sum("n"))
      .collect().head.getLong(0)
    // eligibility grows monotonically, phase t admits ⌊t·n/4⌋ docs
    // exactly (the 4·rank ≤ t·n predicate), and phase 4 is the corpus
    out.foreach { case (t, c, ne, te, frontier, nNew, tNew) =>
      assert(c == t * 250000L)
      assert(ne == t.toLong * nDocs / 4, s"phase $t eligible count wrong")
      assert(te > 0 && frontier > 0 && nNew >= 0 && tNew >= 0)
    }
    assert(out.last._3 == nDocs && out.last._4 == nToks, "phase 4 must cover the corpus")
    // the new-slice columns telescope back to the eligible columns
    assert(out.map(_._6).sum == nDocs && out.map(_._7).sum == nToks)
    // difficulty frontier is non-decreasing (easy→hard admission)
    assert(out.map(_._5).toSeq == out.map(_._5).sorted.toSeq)
  }

  test("q_bootstrap: weights replay the inverse-CDF table; CI brackets the point estimate") {
    val r = Pipeline.queries("q_bootstrap")(spark, sf).collect().head
    val (b, point, lo, hi, varNum) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(b == 32L && varNum >= 0L)
    assert(lo <= point && point <= hi, s"CI [$lo, $hi] must bracket the point $point")
    // driver replay of resample b = 0's weighted mean
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val P = 2147483647L
    val thresholds = {
      var cdf = 0.0; var fact = 1.0
      (0 to 9).map { k =>
        if (k > 0) fact *= k
        cdf += math.exp(-1.0) / fact
        math.floor(cdf * 1e6).toLong
      }
    }
    def weight(id: Long, bb: Long): Long = {
      val u = ((797003437L * ((id * 37 + bb) % P) + 321017101L) % P) % 1000000L
      thresholds.count(_ <= u).toLong
    }
    val allW = for (bb <- 0L until 32L; (id, _) <- docs) yield weight(id, bb)
    // Poisson(1): ~36.8% zeros, mean ~1 — the draw must look Poisson
    val zeroFrac = allW.count(_ == 0L).toDouble / allW.size
    assert(zeroFrac > 0.30 && zeroFrac < 0.44, s"zero fraction $zeroFrac off e^-1")
    val meanW = allW.sum.toDouble / allW.size
    assert(meanW > 0.9 && meanW < 1.1, s"mean weight $meanW off 1.0")
    // exact replay of every resample mean -> order statistics
    val ms = (0L until 32L).map { bb =>
      val (sw, cw) = docs.foldLeft((0L, 0L)) { case ((a, c), (id, nc)) =>
        val w = weight(id, bb); (a + w * nc, c + w)
      }
      sw * 1000 / cw
    }.sorted
    assert(ms(1) == lo && ms(30) == hi, s"order statistics diverge: ${ms(1)}/${ms(30)} vs $lo/$hi")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Audit, Graph, Learn, Relational, Stats}

/** Property and replay checks for the round-9 additions: multiple
  * testing, paired/spread tests, rolling-window monitors, the learn
  * bank's deterministic training steps, the new graph rounds, and the
  * warehouse audits. Each test either replays the statistic naively
  * from collected fixture rows (sf0.001 — small enough for O(n²)
  * loops) or pins an invariant the oracle cannot see (step-up
  * prefixes, matching validity, greedy selection order).
  */
class Round9Spec extends SparkSpec {

  // ------------------------------ stats ------------------------------

  test("q_bh_fdr: ranks are a permutation and rejections form a prefix") {
    val rows = Stats.queries("q_bh_fdr")(spark, sf)
      .orderBy(col("k")).collect()
    val ks = rows.map(_.getAs[Long]("k")).toSeq
    assert(ks === (1L to rows.length).toSeq, s"ranks not a permutation: $ks")
    // z² must be non-increasing in rank, and the reject set a prefix
    val z2 = rows.map(_.getAs[Double]("z2"))
    assert(z2.zip(z2.tail).forall { case (a, b) => a >= b }, z2.toSeq.toString)
    val rej = rows.map(_.getAs[Boolean]("bh_reject"))
    val firstAccept = rej.indexOf(false)
    if (firstAccept >= 0)
      assert(rej.drop(firstAccept).forall(!_), s"step-up prefix broken: ${rej.toSeq}")
  }

  test("q_wilcoxon_signed: doubled rank sums satisfy W⁺ + W⁻ = n(n+1)") {
    val r = Stats.queries("q_wilcoxon_signed")(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("w2_pos") + r.getAs[Long]("w2_neg") === n * (n + 1))
  }

  test("q_levene matches a naive Brown-Forsythe replay") {
    val got = Stats.queries("q_levene")(spark, sf).collect().head
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // lower median = element at ceil(n/2), 1-based
    val devs = groups.map { case (g, xs) =>
      val med = xs((xs.size + 1) / 2 - 1)
      g -> xs.map(x => math.abs(x - med).toDouble)
    }
    val all = devs.values.flatten.toSeq
    val n = all.size.toDouble; val k = devs.size.toDouble
    val gm = all.sum / n
    val between = devs.values.map(z => z.size * math.pow(z.sum / z.size - gm, 2)).sum
    val within = devs.values.flatMap(z => { val m = z.sum / z.size; z.map(x => (x - m) * (x - m)) }).sum
    val f = (between / (k - 1)) / (within / (n - k))
    assert(math.abs(got.getAs[Double]("f_bf") - f) < 1e-3,
      s"${got.getAs[Double]("f_bf")} vs naive $f")
  }

  test("q_qq_points: decile curves are monotone and attained") {
    val rows = Stats.queries("q_qq_points")(spark, sf).orderBy(col("p")).collect()
    assert(rows.length === 9)
    val qc = rows.map(_.getAs[Long]("q_click_milli"))
    val qv = rows.map(_.getAs[Long]("q_view_milli"))
    assert(qc.zip(qc.tail).forall { case (a, b) => a <= b })
    assert(qv.zip(qv.tail).forall { case (a, b) => a <= b })
    val clicks = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    // exact type-1 quantile: smallest value with cum count >= ceil(p·n/10)
    rows.foreach { r =>
      val p = r.getAs[Long]("p").toInt
      val target = (p * clicks.length + 9) / 10
      assert(r.getAs[Long]("q_click_milli") === clicks(target - 1),
        s"p=$p: ${r.getAs[Long]("q_click_milli")} vs ${clicks(target - 1)}")
    }
  }

  test("q_rsi stays on [0, 100000] and q_bollinger bands bracket the mean") {
    val rsi = Stats.queries("q_rsi")(spark, sf).collect()
    assert(rsi.nonEmpty)
    rsi.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("rsi_milli"))) {
        val v = r.getAs[Long]("rsi_milli")
        assert(v >= 0 && v <= 100000, s"rsi out of range: $v")
      }
    }
    val bb = Stats.queries("q_bollinger")(spark, sf).collect()
    assert(bb.nonEmpty)
    bb.foreach { r =>
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("mu") &&
        r.getAs[Double]("mu") <= r.getAs[Double]("hi"))
    }
  }

  test("q_pacf: lag-1 PACF equals rho1 and all ACF values lie in [-1, 1]") {
    val r = Stats.queries("q_pacf")(spark, sf).collect().head
    assert(r.getAs[Double]("pacf1") === r.getAs[Double]("rho1"))
    Seq("rho1", "rho2", "rho3").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c out of range: $v")
    }
  }

  test("q_granger: restricted RSS dominates unrestricted RSS") {
    val r = Stats.queries("q_granger")(spark, sf).collect().head
    val rssR = r.getAs[Double]("rss_r"); val rssU = r.getAs[Double]("rss_u")
    assert(rssU >= 0.0 && rssR >= rssU, s"rss_r=$rssR rss_u=$rssU")
  }

  // ------------------------------ learn ------------------------------

  test("q_kcenter replays the greedy farthest-point loop exactly") {
    val got = Learn.queries("q_kcenter")(spark, sf).orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("vec_id"), r.getAs[Long]("d2_sel")))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Seq(vecs.head)
    var picks = Seq((1L, vecs.head._1, 0L))
    var dmin = vecs.map { case (id, v) => (id, v, d2(v, vecs.head._2)) }
    for (r <- 2 to 4) {
      val best = dmin.minBy { case (id, _, dm) => (-dm, id) }
      picks = picks :+ ((r.toLong, best._1, best._3))
      centers = centers :+ ((best._1, best._2))
      dmin = dmin.map { case (id, v, dm) => (id, v, math.min(dm, d2(v, best._2))) }
    }
    val radius = dmin.minBy { case (id, _, dm) => (-dm, id) }
    picks = picks :+ ((5L, radius._1, radius._3))
    assert(got.toSeq === picks, s"${got.toSeq} vs $picks")
  }

  test("q_gmm_step: mixing weights sum to one on the micro grid") {
    val r = Learn.queries("q_gmm_step")(spark, sf).collect().head
    val s = r.getAs[Long]("pi1_micro") + r.getAs[Long]("pi2_micro")
    assert(s >= 999998 && s <= 1000000, s"pi sum: $s")
  }

  test("q_svm_step: step-2 margins replayed naively") {
    val r = Learn.queries("q_svm_step")(spark, sf).collect().head
    val users = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x2"),
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) > 0, 1L)
          .otherwise(-1L).as("y"))
      .collect().map(q => (q.getLong(1), q.getLong(2), q.getLong(3)))
    val n = users.length.toLong
    val a1 = users.map { case (x1, _, y) => y * x1 }.sum
    val a2 = users.map { case (_, x2, y) => y * x2 }.sum
    val nviol = users.count { case (x1, x2, y) => y * (a1 * x1 + a2 * x2) < n }
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("a1") === a1 && r.getAs[Long]("a2") === a2)
    assert(r.getAs[Long]("n_viol") === nviol.toLong)
  }

  test("q_adaboost_step: the winning stump beats coin flipping") {
    val r = Learn.queries("q_adaboost_step")(spark, sf).collect().head
    val err = r.getAs[Long]("err"); val n = r.getAs[Long]("n")
    assert(2 * err <= n, s"best stump worse than random: $err / $n")
    if (err > 0 && err < n) assert(r.getAs[Double]("alpha") >= 0.0)
    assert(r.getAs[Double]("z_factor") <= 1.0)
  }

  // ------------------------------ graph ------------------------------

  test("q_matching: rounds shrink the graph and matched counts are consistent") {
    val rows = Graph.queries("q_matching")(spark, sf).orderBy(col("round")).collect()
    assert(rows.length === 3)
    val left = rows.map(_.getAs[Long]("n_left"))
    assert(left.zip(left.tail).forall { case (a, b) => b <= a })
    // each round matches at least one edge while edges remain
    rows.zipWithIndex.foreach { case (r, i) =>
      val prevLeft = if (i == 0) Long.MaxValue else left(i - 1)
      if (prevLeft > 0) assert(r.getAs[Long]("n_matched") > 0)
    }
  }

  test("q_local_cc: coefficients live on [0, 1e6]") {
    val rows = Graph.queries("q_local_cc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cc = r.getAs[Long]("cc_micro")
      assert(cc >= 0 && cc <= 1000000, s"cc out of range: $cc")
      assert(r.getAs[Long]("deg") >= 2)
    }
  }

  test("q_betweenness: BFS levels are disjoint with positive path counts") {
    val rows = Graph.queries("q_betweenness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("node_id"))
    assert(ids.distinct.length === ids.length, "node repeated across levels")
    rows.foreach { r =>
      assert(r.getAs[Long]("sigma") >= 1)
      assert(r.getAs[Long]("delta_micro") >= 0)
    }
  }

  // ------------------------------ audit ------------------------------

  test("q_ri_check: the synthetic star schema is referentially clean") {
    val rows = Audit.queries("q_ri_check")(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") === 0L,
        s"${r.getAs[String]("fk")} has orphans")
    }
  }

  test("q_freshness: some stream touches the watermark") {
    val rows = Audit.queries("q_freshness")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag_sec")).min === 0L)
    rows.foreach(r => assert(r.getAs[Long]("lag_sec") >= 0))
  }

  test("q_mode_agg matches a naive census argmax") {
    val got = Audit.queries("q_mode_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("mode_vm"), r.getAs[Long]("mode_n"))).toMap
    val census = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    census.groupBy(_._1._1).foreach { case (et, cells) =>
      val best = cells.map { case ((_, vm), c) => (vm, c) }
        .minBy { case (vm, c) => (-c, vm) }
      assert(got(et) === best, s"$et: ${got(et)} vs $best")
    }
  }

  test("q_histogram2d: hour shares sum to one up to truncation") {
    val rows = Audit.queries("q_histogram2d")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("hour")).foreach { case (h, cells) =>
      val s = cells.map(_.getAs[Long]("share_micro")).sum
      assert(s <= 1000000 && s > 1000000 - cells.length,
        s"hour $h share sum $s over ${cells.length} cells")
    }
  }

  test("q_resid_diag: R² ≤ 1 and DW lives on [0, 4]") {
    val r = Stats.queries("q_resid_diag")(spark, sf).collect().head
    assert(r.getAs[Double]("r2") <= 1.0)
    val dw = r.getAs[Long]("dw_micro")
    assert(dw >= 0 && dw <= 4000000, s"DW out of range: $dw")
  }

  test("q_jarque_bera matches a naive moment replay") {
    val r = Stats.queries("q_jarque_bera")(spark, sf).collect().head
    val xs = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) DIV 86400000000"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
      .collect().map(_.getLong(1).toDouble)
    val n = xs.length.toDouble; val m = xs.sum / n
    val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    val g1 = m3 / math.pow(m2, 1.5); val g2 = m4 / (m2 * m2)
    assert(math.abs(r.getAs[Double]("skew") - g1) < 1e-3)
    assert(math.abs(r.getAs[Double]("kurtosis") - g2) < 1e-3)
  }

  test("q_runs_test: runs bounded by move count") {
    val r = Stats.queries("q_runs_test")(spark, sf).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1 && runs <= n1 + n2)
    assert(runs <= 2 * math.min(n1, n2) + 1)
  }

  test("q_dedup_savings: retention monotone in the threshold") {
    val rows = graft.operators.NearDup.queries("q_dedup_savings")(spark, sf)
      .orderBy(col("t")).collect()
    assert(rows.length === 4)
    val nd = rows.map(_.getAs[Long]("n_dropped"))
    assert(nd.zip(nd.tail).forall { case (a, b) => b <= a }, nd.toSeq.toString)
    assert(nd.head > 0, "threshold 0.60 should catch the planted re-crawls")
  }

  test("q_quality_sweep: cumulative columns reconcile with the census") {
    val rows = graft.operators.TextAnalysis.queries("q_quality_sweep")(spark, sf)
      .orderBy(col("qc").desc).collect()
    var docs = 0L; var toks = 0L
    rows.foreach { r =>
      docs += r.getAs[Long]("n_docs"); toks += r.getAs[Long]("n_toks")
      assert(r.getAs[Long]("cum_docs") === docs)
      assert(r.getAs[Long]("cum_toks") === toks)
    }
    assert(rows.last.getAs[Long]("tok_retention_micro") === 1000000L)
  }

  test("q_weighted_quantile: token-mass median dominates the doc median") {
    val wq = graft.operators.RelationalExt.queries("q_weighted_quantile")(spark, sf)
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("q_len_weighted")).toMap
    val lens = Tables.documents(spark, sf)
      .select(expr("size(split(text, ' '))")).collect().map(_.getInt(0).toLong).sorted
    val docMedian = lens((lens.length + 1) / 2 - 1)
    assert(wq(50L) >= docMedian, s"weighted ${wq(50L)} < unweighted $docMedian")
    assert(wq(50L) <= wq(90L) && wq(90L) <= wq(99L))
  }

  test("q_keyphrase: no stopword survives into a top phrase") {
    val stops = Set("the", "a", "of", "and", "to", "in", "is")
    val rows = graft.operators.TextAnalysis.queries("q_keyphrase")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length <= 4 && words.forall(w => !stops.contains(w)),
        s"bad phrase: ${r.getAs[String]("phrase")}")
    }
  }

  test("q_mutual_info: MI non-negative (up to quantization) and V in [0, 1]") {
    val r = Audit.queries("q_mutual_info")(spark, sf).collect().head
    assert(r.getAs[Long]("mi_nat_micro") >= -5,
      s"MI too negative: ${r.getAs[Long]("mi_nat_micro")}")
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"V out of range: $v")
  }

  test("q_interarrival: quantiles monotone in p") {
    val rows = Stats.queries("q_interarrival")(spark, sf).orderBy(col("p")).collect()
    assert(rows.length === 3)
    val qs = rows.map(_.getAs[Long]("q_gap_sec"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
  }

  test("q_bloom_fpr: exact driver-side filter replay") {
    val r = Audit.queries("q_bloom_fpr")(spark, sf).collect().head
    def md5pos(i: Int, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$i:$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 8192
    }
    val keys = Tables.orders(spark, sf).select(col("o_orderkey")).distinct()
      .collect().map(_.getLong(0))
    val bits = keys.flatMap(k => Seq(md5pos(0, k), md5pos(1, k), md5pos(2, k))).toSet
    val probes = Tables.lineitem(spark, sf).select(col("l_orderkey") + 3000000L).distinct()
      .collect().map(_.getLong(0))
    val nFp = probes.count(k => (0 to 2).forall(i => bits.contains(md5pos(i, k))))
    assert(r.getAs[Long]("n_keys") === keys.length.toLong)
    assert(r.getAs[Long]("n_bits_set") === bits.size.toLong)
    assert(r.getAs[Long]("n_fp") === nFp.toLong)
  }

  test("q_markov_hitting replays the 6-round value iteration exactly") {
    val rows = graft.operators.RelationalExt.queries("q_markov_hitting")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_out"), r.getAs[Long]("e_steps_micro"))).toMap
    Tables.events(spark, sf).createOrReplaceTempView("ev_mh")
    val m = spark.sql(
      """SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
        |  FROM ev_mh) WHERE dst IS NOT NULL GROUP BY src, dst""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outN = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var e = outN.keys.map(_ -> 0L).toMap
    for (_ <- 1 to 6) {
      val se = m.groupBy(_._1).view.mapValues(_.map { case (_, d2, n) => n * e(d2) }.sum).toMap
      e = outN.keys.map { s0 =>
        s0 -> (if (s0 == "purchase") 0L else 1000000L + se.getOrElse(s0, 0L) / outN(s0))
      }.toMap
    }
    outN.keys.foreach { s0 =>
      assert(rows(s0) === ((outN(s0), e(s0))), s"$s0: ${rows(s0)} vs ${(outN(s0), e(s0))}")
    }
  }

  test("q_interval_sched replays the per-user greedy exactly") {
    val got = graft.operators.RelationalExt.queries("q_interval_sched")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"),
        expr("unix_micros(ts) + CAST(floor(value) + 1 AS BIGINT) * 1000000"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (uid, rows0) =>
      val sorted = rows0.sortBy(t => (t._3, t._4))
      var cnt = 0L; var lastEnd = Long.MinValue
      sorted.foreach { case (_, st, en, _) => if (st >= lastEnd) { cnt += 1; lastEnd = en } }
      assert(got(uid) === ((rows0.length.toLong, cnt)), s"user $uid")
    }
  }

  test("q_stable_match replays 3 synchronous deferred-acceptance rounds exactly") {
    val got = Graph.queries("q_stable_match")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val spend = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey")).agg(sum(col("cents")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prefs = spend.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, sp, sc) => (-sc, sp) }.take(3).toIndexedSeq).toMap
    var ptr = prefs.keys.map(_ -> 0).toMap // 0-based next-proposal index
    var eng = Map.empty[Long, (Long, Long)] // c -> (sp, spend)
    for (_ <- 1 to 3) {
      val props = prefs.keys.toSeq
        .filter(c => !eng.contains(c) && ptr(c) < prefs(c).length && ptr(c) < 3)
        .map { c => val (_, sp, sc) = prefs(c)(ptr(c)); (c, sp, sc) }
      val cands = props ++ eng.toSeq.map { case (c, (sp, sc)) => (c, sp, sc) }
      val winners = cands.groupBy(_._2).map { case (sp, cs) =>
        sp -> cs.minBy { case (c, _, sc) => (-sc, c) }
      }
      val proposed = props.map(_._1).toSet
      ptr = ptr.map { case (c, p) => c -> (if (proposed(c)) p + 1 else p) }
      eng = winners.map { case (sp, (c, _, sc)) => c -> (sp, sc) }
    }
    assert(got === eng.map { case (c, v) => c -> v }, s"got ${got.size} vs replay ${eng.size}")
  }

  test("q_mcnemar: confusion cells reconcile and replay the two models") {
    val r = graft.operators.Learn.queries("q_mcnemar")(spark, sf).collect().head
    val n = r.getAs[Long]("n"); val b = r.getAs[Long]("b"); val c = r.getAs[Long]("c")
    assert(b + c + r.getAs[Long]("both_right") <= n)
    // replay both classifiers
    val users = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x2"),
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) > 0, 1L)
          .otherwise(0L).as("pos"))
      .collect().map(q => (q.getLong(1), q.getLong(2), q.getLong(3)))
    // stump sweep
    val cand = users.map(_._1).distinct.flatMap { th =>
      Seq(("gt", th, users.count { case (x1, _, p) => (if (x1 > th) 1L else 0L) != p }),
        ("le", th, users.count { case (x1, _, p) => (if (x1 <= th) 1L else 0L) != p }))
    }
    val (pol, theta, _) = cand.minBy { case (pl, th, e) => (e, th, pl) }
    // svm two steps
    val nn = users.length.toLong
    val a1 = users.map { case (x1, _, p) => (2 * p - 1) * x1 }.sum
    val a2 = users.map { case (_, x2, p) => (2 * p - 1) * x2 }.sum
    val b1 = a1 + users.collect { case (x1, x2, p) if (2 * p - 1) * (a1 * x1 + a2 * x2) < nn => (2 * p - 1) * x1 }.sum
    val b2 = a2 + users.collect { case (x1, x2, p) if (2 * p - 1) * (a1 * x1 + a2 * x2) < nn => (2 * p - 1) * x2 }.sum
    var rb = 0L; var rc = 0L
    users.foreach { case (x1, x2, p) =>
      val ps = if ((pol == "gt" && x1 > theta) || (pol == "le" && x1 <= theta)) 1L else 0L
      val pv = if (b1 * x1 + b2 * x2 > 0) 1L else 0L
      if (ps == p && pv != p) rb += 1
      if (ps != p && pv == p) rc += 1
    }
    assert((b, c) === ((rb, rc)), s"($b,$c) vs replay ($rb,$rc)")
  }

  test("q_tost: z bounds ordered and flag consistent with a moment recompute") {
    val r = Stats.queries("q_tost")(spark, sf).collect().head
    assert(r.getAs[Double]("z_hi") < r.getAs[Double]("z_lo"))
    val vm = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
      .collect().map(q => (q.getString(0), q.getLong(1)))
    def mom(arm: String) = {
      val xs = vm.filter(_._1 == arm).map(_._2.toDouble)
      val n = xs.length.toDouble; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = mom("click"); val (n2, m2, v2) = mom("view")
    val se = math.sqrt(v1 / n1 + v2 / n2); val dm = m1 - m2
    assert(math.abs(r.getAs[Double]("z_lo") - (dm + 2000.0) / se) < 1e-2)
    assert(math.abs(r.getAs[Double]("z_hi") - (dm - 2000.0) / se) < 1e-2)
    assert(r.getAs[Boolean]("equivalent_05") ===
      ((dm + 2000.0) / se > 1.6449 && (dm - 2000.0) / se < -1.6449))
  }

  test("q_capture_recapture: overlap bounds and estimator ordering hold") {
    val r = Stats.queries("q_capture_recapture")(spark, sf).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2"); val m = r.getAs[Long]("m")
    assert(m <= math.min(n1, n2))
    if (m > 0) {
      val lp = r.getAs[Long]("lp_est")
      assert(lp >= math.max(n1, n2))
      assert(r.getAs[Long]("chapman_est") <= lp, "Chapman must correct LP downward")
    }
  }

  test("q_sprt: cumulative trace reconciles and decisions match the band") {
    val rows = Stats.queries("q_sprt")(spark, sf).orderBy(col("day")).collect()
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("llr_micro")
      assert(r.getAs[Long]("cum_llr_micro") === cum)
      val want = if (cum >= 2944439L) "accept_h1"
        else if (cum <= -2944439L) "accept_h0" else "continue"
      assert(r.getAs[String]("decision") === want)
    }
  }

  test("q_shapley_2feat: additivity holds to truncation and cells partition the users") {
    val rows = graft.operators.Learn.queries("q_shapley_2feat")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    rows.foreach { r =>
      val gap = r.getAs[Long]("additivity_gap_micro")
      assert(math.abs(gap) <= 2, s"additivity gap $gap")
    }
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === nUsers)
  }

  test("Observation API: inline metrics agree with a recount") {
    import org.apache.spark.sql.Observation
    val obs = Observation("li_audit")
    val df = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("n"), sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .filter(col("l_quantity") > 0)
    df.collect()
    val row = obs.get
    val n = Tables.lineitem(spark, sf).count()
    val q = Tables.lineitem(spark, sf)
      .agg(sum(expr("CAST(l_quantity AS BIGINT)"))).collect().head.getLong(0)
    assert(row("n") === n && row("q") === q)
  }

  // --------------------------- plan audits ---------------------------

  test("q_local_revenue: dim chain broadcasts, one data-scale shuffle join") {
    val df = Relational.queries("q_local_revenue")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj:\n${p.take(1500)}")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).take(8).mkString("\n"))
  }

  test("q_ri_check: dimension parents broadcast in the anti joins") {
    val df = Audit.queries("q_ri_check")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("LeftAnti"), p.take(800))
    assert(p.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")) >= 5,
      "expected 5 broadcast anti joins:\n" + p.take(2000))
  }
}

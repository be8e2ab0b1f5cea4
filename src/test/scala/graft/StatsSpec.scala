package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Brute-force replays of the statistical-inference bank: each test
  * recomputes the statistic from raw collected rows with naive Scala
  * (dense ranks, O(n²) loops, direct double formulas) and checks the
  * engine's exact-integer/rounded output against it.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Average (fractional) ranks of xs, 1-based, ties share the mean rank. */
  private def avgRanks(xs: Seq[Long]): Seq[Double] = {
    val sorted = xs.sorted
    val rank = xs.map { v =>
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      (lo + hi) / 2.0
    }
    rank
  }

  private def pearson(x: Seq[Double], y: Seq[Double]): Double = {
    val n = x.size.toDouble
    val mx = x.sum / n; val my = y.sum / n
    val num = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum * y.map(b => (b - my) * (b - my)).sum)
    num / den
  }

  test("q_spearman matches a naive rank-then-Pearson replay per flag") {
    val got = Stats.queries("q_spearman")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val rho = pearson(avgRanks(grp.map(_._2).toSeq), avgRanks(grp.map(_._3).toSeq))
      val (n, gotRho) = got(flag)
      assert(n === grp.size)
      assert(math.abs(gotRho - rho) < 1e-3, s"$flag: $gotRho vs naive $rho")
    }
  }

  test("q_kendall_tau matches the O(n²) concordance loop") {
    val r = Stats.queries("q_kendall_tau")(spark, sf).collect().head
    val days = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2))).sortBy(_._1)
    var s = 0L; var tx = 0L; var ty = 0L
    for (i <- days.indices; j <- (i + 1) until days.size) {
      val (_, xi, yi) = days(i); val (_, xj, yj) = days(j)
      s += java.lang.Long.signum(xj - xi).toLong * java.lang.Long.signum(yj - yi)
      if (xj == xi) tx += 1
      if (yj == yi) ty += 1
    }
    val n = days.size.toLong
    val p = n * (n - 1) / 2
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("s") === s)
    assert(r.getAs[Long]("tx") === tx)
    assert(r.getAs[Long]("ty") === ty)
    assert(r.getAs[Long]("tau2_micro") === s * s * 1000000L / ((p - tx) * (p - ty)))
    assert(r.getAs[Long]("tau_sign") === java.lang.Long.signum(s).toLong)
  }

  test("q_kruskal_wallis matches the direct rank-sum H with tie correction") {
    val r = Stats.queries("q_kruskal_wallis")(spark, sf).collect().head
    val vals = Tables.events(spark, sf)
      .select($"event_type", expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .collect().map(q => (q.getString(0), q.getLong(1)))
    val ranks = avgRanks(vals.map(_._2).toSeq)
    val n = vals.length.toDouble
    val byGrp = vals.zip(ranks).groupBy(_._1._1)
    val a = byGrp.values.map { g =>
      val rs = g.map(_._2).sum
      rs * rs / g.size
    }.sum
    val h = 12.0 * a / (n * (n + 1)) - 3.0 * (n + 1)
    val ties = vals.map(_._2).groupBy(identity).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val hCorr = h / (1.0 - ties / (n * n * n - n))
    assert(r.getAs[Long]("n") === vals.length.toLong)
    assert(r.getAs[Long]("ties_t") === ties)
    assert(math.abs(r.getAs[Double]("h_corr") - hCorr) < 1e-3,
      s"engine ${r.getAs[Double]("h_corr")} vs naive $hCorr")
  }

  test("q_anova matches the direct between/within decomposition") {
    val r = Stats.queries("q_anova")(spark, sf).collect().head
    val vals = Tables.events(spark, sf)
      .select($"event_type", expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .collect().map(q => (q.getString(0), q.getLong(1).toDouble))
    val n = vals.length.toDouble
    val grand = vals.map(_._2).sum / n
    val byGrp = vals.groupBy(_._1)
    val k = byGrp.size.toDouble
    val ssb = byGrp.values.map { g =>
      val m = g.map(_._2).sum / g.size
      g.size * (m - grand) * (m - grand)
    }.sum
    val ssw = byGrp.values.map { g =>
      val m = g.map(_._2).sum / g.size
      g.map(v => (v._2 - m) * (v._2 - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getAs[Long]("k") === byGrp.size.toLong)
    assert(math.abs(r.getAs[Double]("f") - f) / f < 1e-4,
      s"engine ${r.getAs[Double]("f")} vs naive $f")
    assert(math.abs(r.getAs[Double]("eta2") - ssb / (ssb + ssw)) < 1e-4)
  }

  test("q_pettitt: K equals the max over the direct double-sum U_t") {
    val got = Stats.queries("q_pettitt")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val days = Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    days.groupBy(_._1).foreach { case (et, grp) =>
      val xs = grp.sortBy(_._2).map(t => (t._2, t._3))
      val us = xs.indices.dropRight(1).map { t =>
        var u = 0L
        for (i <- 0 to t; j <- (t + 1) until xs.size)
          u += java.lang.Long.signum(xs(j)._2 - xs(i)._2)
        (xs(t)._1, u)
      }
      // U_n = 0 by definition; the engine's cumulative includes it
      val all = us :+ (xs.last._1, 0L)
      val k = all.map(t => math.abs(t._2)).max
      val cpDay = all.filter(t => math.abs(t._2) == k).map(_._1).min
      val (gotK, gotDay) = got(et)
      assert(gotK === k, s"$et: K $gotK vs naive $k")
      assert(gotDay === cpDay, s"$et: cp day $gotDay vs naive $cpDay")
    }
  }

  test("q_diff_in_diff: the estimator is exactly the four-cell contrast") {
    val r = Stats.queries("q_diff_in_diff")(spark, sf).collect().head
    val did = (r.getAs[Long]("m11_micro") - r.getAs[Long]("m10_micro")) -
      (r.getAs[Long]("m01_micro") - r.getAs[Long]("m00_micro"))
    assert(r.getAs[Long]("did_micro") === did)
    val total = Tables.events(spark, sf).count()
    assert(r.getAs[Long]("n00") + r.getAs[Long]("n01") +
      r.getAs[Long]("n10") + r.getAs[Long]("n11") === total)
  }

  test("q_mde: variance and MDE² replay from per-user totals") {
    val got = Stats.queries("q_mde")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    val perUser = Tables.events(spark, sf)
      .groupBy($"event_type", $"user_id")
      .agg(sum(expr("CAST(floor(value * 10 + 0.5) AS BIGINT)")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    perUser.groupBy(_._1).foreach { case (et, grp) =>
      val n = grp.size.toLong
      val s = grp.map(_._3).sum
      val ss = grp.map(t => t._3 * t._3).sum
      val varQ = (n * ss - s * s) / (n * (n - 1))
      val nArm = math.min(grp.count(_._2 % 2 == 0), grp.count(_._2 % 2 == 1)).toLong
      val (gotVar, gotMde) = got(et)
      assert(gotVar === varQ, s"$et: var $gotVar vs $varQ")
      assert(gotMde === 15680000L * varQ / nArm)
    }
  }

  test("q_crosscorr: per-lag Pearson replays from the day-grain series") {
    val got = Stats.queries("q_crosscorr")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val days = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")).as("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L to 7L).foreach { lag =>
      val pairs = days.toSeq.flatMap { case (d0, (x, _)) =>
        days.get(d0 + lag).map { case (_, y) => (x.toDouble, y.toDouble) }
      }
      val (n, ccf) = got(lag)
      assert(n === pairs.size.toLong, s"lag $lag n")
      assert(math.abs(ccf - pearson(pairs.map(_._1), pairs.map(_._2))) < 1e-3, s"lag $lag ccf")
    }
    // lag 0 pairs every day with itself: full series length
    assert(got(0L)._1 === days.size.toLong)
  }

  test("q_hill_tail: Hill alpha replays from the top-201 order statistics") {
    val r = Stats.queries("q_hill_tail")(spark, sf).collect().head
    val vals = Tables.events(spark, sf)
      .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .collect().map(_.getLong(0)).filter(_ >= 1).sorted(Ordering[Long].reverse).take(201)
    val thr = vals.min
    val sum = vals.map(v => math.floor(math.log(v.toDouble / thr) * 1e6 + 0.5).toLong).sum
    assert(r.getAs[Long]("k") === vals.length.toLong - 1)
    assert(r.getAs[Long]("thr") === thr)
    assert(r.getAs[Long]("sum_lr_micro") === sum)
    assert(r.getAs[Long]("alpha_micro") === (vals.length - 1) * 1000000000000L / sum)
    // sanity: a tail index in a plausible positive range
    assert(r.getAs[Long]("alpha_micro") > 0)
  }

  test("q_gumbel_tail: method-of-moments fit replays from day maxima") {
    val got = Stats.queries("q_gumbel_tail")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val dmax = Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(max(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    dmax.groupBy(_._1).foreach { case (et, grp) =>
      val xs = grp.map(_._2.toDouble)
      val n = xs.size.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      val beta = math.sqrt(6.0 * v) / math.Pi
      val mu = m - 0.5772156649 * beta
      val ret30 = mu + beta * (-math.log(-math.log(1.0 - 1.0 / 30.0)))
      val (gotN, gotBeta, gotMu, gotRet) = got(et)
      assert(gotN === grp.size.toLong)
      assert(math.abs(gotBeta - beta) < 1e-2, s"$et beta")
      assert(math.abs(gotMu - mu) < 1e-2, s"$et mu")
      assert(math.abs(gotRet - ret30) < 1e-2, s"$et ret30")
      // the 30-day return level sits above the fitted location
      assert(gotRet > gotMu)
    }
  }

  test("q_season_strength: bounded above by 1, weekday partition valid") {
    val rows = Stats.queries("q_season_strength")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("strength") <= 1.0 + 1e-9)
      val nw = r.getAs[Long]("n_weekdays")
      assert(nw >= 1L && nw <= 7L)
      assert(r.getAs[Long]("n_days") >= nw)
    }
  }

  test("q_esd_outliers: three distinct days per type, nonnegative z") {
    val rows = Stats.queries("q_esd_outliers")(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rs) =>
      assert(rs.map(_.getAs[Long]("round")).sorted.toSeq === Seq(1L, 2L, 3L), et)
      val days = rs.map(_.getAs[Long]("day"))
      assert(days.distinct.length === 3, s"$et must flag distinct days")
      rs.foreach(r => assert(r.getAs[Double]("z") >= 0.0))
    }
  }

  test("q_policy_replay: the argmax policy never scores below the logged baseline") {
    val rows = Stats.queries("q_policy_replay")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("replay_micro") >= r.getAs[Long]("baseline_micro"),
        s"ctx ${r.getAs[Long]("ctx")}: best-arm rate must dominate the average")
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_all"))
      val arm = r.getAs[Long]("best_arm")
      assert(arm >= 0L && arm < 10L)
    }
  }

  test("q_dtw matches a naive full-matrix DP replay") {
    val r = Stats.queries("q_dtw")(spark, sf).collect().head
    val (n, m, dtw) = (r.getAs[Long]("n"), r.getAs[Long]("m"), r.getAs[Long]("dtw_cents"))
    // rebuild the two day-grain series exactly as the operator does
    val daily = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) DIV 86400000000 AS day",
        "CASE WHEN event_type = 'click' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0L END AS xc",
        "CASE WHEN event_type = 'view' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0L END AS yc")
      .groupBy("day").agg(sum("xc").as("xv"), sum("yc").as("yv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = daily.map(_._1).min
    val hi = daily.map(_._1).max
    val byDay = daily.map(t => t._1 -> (t._2, t._3)).toMap
    val days = (lo to hi).map(d => byDay.getOrElse(d, (0L, 0L)))
    val x = days.map(_._1).toArray
    val y = days.map(_._2).toArray
    assert(n === x.length.toLong && m === y.length.toLong)
    // textbook row-by-row DP — a structurally DIFFERENT recurrence
    // order than the engine's anti-diagonal wavefront
    val D = Array.fill(x.length + 1, y.length + 1)(Long.MaxValue / 4)
    D(0)(0) = 0L
    for (i <- 1 to x.length; j <- 1 to y.length)
      D(i)(j) = math.abs(x(i - 1) - y(j - 1)) +
        math.min(D(i - 1)(j), math.min(D(i)(j - 1), D(i - 1)(j - 1)))
    assert(dtw === D(x.length)(y.length), "wavefront DP must equal textbook DP")
    assert(r.getAs[Double]("dtw_norm") ===
      math.round(dtw.toDouble / (n + m) / 100.0 * 10000) / 10000.0)
  }

  test("q_stratified_ate: weights form a partition and arms are balanced-ish") {
    val rows = Stats.queries("q_stratified_ate")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val wSum = rows.map(_.getAs[Long]("w_micro")).sum
    // truncating DIV loses at most (#strata - 1) micro per stratum
    assert(wSum <= 1000000L && wSum >= 1000000L - 4L)
    rows.foreach { r =>
      val (n1, n0) = (r.getAs[Long]("n1"), r.getAs[Long]("n0"))
      assert(n1 + n0 > 0)
      if (n1 > 0 && n0 > 0) {
        assert(r.getAs[Long]("diff_milli") ===
          r.getAs[Long]("m1_milli") - r.getAs[Long]("m0_milli"))
      }
    }
  }

  test("q_bandit_replay: trajectory matches an independent driver-side sequential fold") {
    val got = Stats.queries("q_bandit_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val arms = Seq("click", "error", "purchase", "signup", "view")
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id % 16 AS ctx", "event_type",
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm",
        "unix_micros(ts) AS us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = ev.groupBy(_._1).flatMap { case (ctx, rows) =>
      val pulls = Array.fill(arms.length)(0L)
      val rew = Array.fill(arms.length)(0L)
      var matched = 0L
      var n = 0L
      rows.sortBy(e => (e._4, e._5)).foreach { case (_, et, vm, _, _) =>
        n += 1
        val chosen =
          if (matched % 7 == 0) ((matched / 7) % arms.length).toInt
          else arms.indices.minBy(i =>
            (-(if (pulls(i) == 0) 1000000000L else rew(i) / pulls(i)), i))
        if (et == arms(chosen)) { matched += 1; pulls(chosen) += 1; rew(chosen) += vm }
      }
      arms.indices.map(i => (ctx, arms(i)) -> (pulls(i), rew(i), n, matched))
    }.toMap
    assert(got == want)
    // pulls across arms account for exactly the matched impressions
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val matched = rows.values.head._4
      assert(rows.values.map(_._1).sum == matched)
    }
  }
}

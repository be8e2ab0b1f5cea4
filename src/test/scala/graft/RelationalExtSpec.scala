package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalExt

class RelationalExtSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; percentiles bracket the exact median") {
    val approx = RelationalExt.queries("q_approx_stats")(spark, sf)
      .select($"event_type", $"approx_users", $"p50", $"p90")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, sf).groupBy($"event_type")
      .agg(countDistinct($"user_id").as("nu"),
        expr("percentile(value, 0.5)").as("e50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (et, (nu, e50)) =>
      val (au, p50, p90) = approx(et)
      assert(math.abs(au - nu).toDouble / nu <= 0.05, s"$et: approx $au vs exact $nu")
      assert(math.abs(p50 - e50) / e50 <= 0.05, s"$et: p50 $p50 vs $e50")
      assert(p90 >= p50, s"$et: p90 $p90 < p50 $p50")
    }
  }

  test("q_lateral: correlated aggregate equals the groupBy+join form") {
    val got = RelationalExt.queries("q_lateral")(spark, sf).collect().toSeq
    val agg = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(max($"o_totalprice").as("max_price"), count(lit(1)).as("n_orders"))
    val exp = Tables.customer(spark, sf)
      .join(agg, $"c_custkey" === $"o_custkey")
      .select($"c_custkey", $"max_price", $"n_orders")
      .orderBy($"c_custkey").collect().toSeq
    assert(got === exp)
  }

  test("q_window_range: RANGE frame counts exactly the peers within 50.0 below") {
    val got = RelationalExt.queries("q_window_range")(spark, sf)
      .select($"event_id", $"n_near").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf).select($"event_id", $"event_type", $"value")
    val brute = ev.as("a").join(ev.as("b"),
        expr("a.event_type = b.event_type AND b.value BETWEEN a.value - 50.0 AND a.value"))
      .groupBy(expr("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_near"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute)
  }

  test("hll sketch union: monthly estimate within 2% of exact distinct users") {
    val got = RelationalExt.queries("q_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf).groupBy($"event_type")
      .agg(countDistinct($"user_id").as("nu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (et, nu) =>
      assert(math.abs(got(et) - nu).toDouble / nu <= 0.02, s"$et: sketch ${got(et)} vs exact $nu")
    }
  }

  test("as-of join: every matched click precedes its purchase, and is the latest such") {
    val asof = RelationalExt.queries("q_join_asof")(spark, sf)
    val bad = asof.filter($"click_us".isNotNull && $"click_us" > $"purchase_us").count()
    assert(bad === 0)
    // cross-check one user against a brute-force inequality join
    val ev = Tables.events(spark, sf)
    val uid = asof.filter($"click_id".isNotNull).select($"user_id").head().getLong(0)
    val brute = ev.filter($"event_type" === "purchase" && $"user_id" === uid).as("p")
      .join(ev.filter($"event_type" === "click" && $"user_id" === uid).as("c"),
        expr("c.ts <= p.ts"), "left")
      .groupBy(expr("p.event_id").as("purchase_id"))
      .agg(max(expr("unix_micros(c.ts)")).as("click_us"))
    val window = asof.filter($"user_id" === uid).select($"purchase_id", $"click_us")
    assert(window.collect().toSet === brute.collect().toSet)
  }

  test("range join covers every event exactly once") {
    val total = RelationalExt.queries("q_join_range")(spark, sf)
      .agg(sum($"n")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("q_winsorize: clamped mean sits inside the cut interval, cuts inside data range") {
    val w = RelationalExt.queries("q_winsorize")(spark, sf).collect()
    assert(w.length > 0)
    w.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= mean + 0.01 && mean <= hi + 0.01,
        s"${r.getString(0)}: winsorized mean $mean escapes [$lo, $hi]")
    }
    // winsorizing shrinks or keeps the spread, never widens it
    val raw = Tables.events(spark, sf).groupBy($"event_type")
      .agg(min($"value").as("rmin"), max($"value").as("rmax"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    w.foreach { r =>
      val (rmin, rmax) = raw(r.getString(0))
      assert(r.getDouble(3) >= rmin - 0.01 && r.getDouble(4) <= rmax + 0.01)
    }
  }

  test("q_heavy_hitters: approximate freqItems is a superset of the exact result") {
    val exact = RelationalExt.queries("q_heavy_hitters")(spark, sf)
      .select($"token").as[String].collect().toSet
    assert(exact.nonEmpty)
    // Spark's stat.freqItems (Karp et al. one-pass): may over-report,
    // must never miss an item above the support threshold
    val approx = Tables.documents(spark, sf)
      .select(explode(expr("split(text, ' ')")).as("token"))
      .stat.freqItems(Array("token"), 0.02)
      .collect().head.getSeq[String](0).toSet
    assert(exact.subsetOf(approx),
      s"freqItems missed heavy hitters: ${exact -- approx}")
  }

  test("q_scd2: one current row per key, contiguous non-overlapping intervals") {
    val dim = RelationalExt.queries("q_scd2")(spark, sf).collect()
    assert(dim.length == Tables.orders(spark, sf).count())
    val byKey = dim.groupBy(_.getLong(0))
    byKey.foreach { case (ck, rows) =>
      assert(rows.count(_.getBoolean(5)) == 1, s"custkey $ck: exactly one current version")
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.last.getBoolean(5), s"custkey $ck: the LAST version is the current one")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(4) == b.get(3),
            s"custkey $ck: version ${a.getLong(1)} must close exactly where the next opens")
        case _ => ()
      }
    }
  }

  test("q_ks_test: D numerator matches an independent driver-side ECDF sweep") {
    val row = RelationalExt.queries("q_ks_test")(spark, sf).collect().head
    val (n1, n2, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val vals = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "view").map(_._2).sorted
    assert(n1 == a.length && n2 == b.length)
    // sweep every distinct value; ECDF counts are ≤-counts
    val expected = (a ++ b).distinct.map { v =>
      val c1 = a.count(_ <= v).toLong; val c2 = b.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    assert(dNum == expected, s"KS numerator: engine $dNum vs recompute $expected")
    assert(row.getLong(3) == dNum * 1000000L / (n1 * n2))
  }

  test("q_benford: digit shares partition the orders; expected table matches log10 recompute") {
    val rows = graft.operators.Reshape.queries("q_benford")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == n, "digit cells must partition the orders")
    val exp = (1 to 9).map(dd => math.floor(1e6 * math.log10(1 + 1.0 / dd)).toLong)
    rows.foreach { case (d, cnt, obs, e, dev) =>
      assert(d >= 1 && d <= 9)
      assert(e == exp(d - 1), s"digit $d expected share")
      assert(obs == cnt * 1000000L / n && dev == obs - e)
    }
  }

  test("q_profile: row counts uniform, key column fully distinct, no nulls in fixture") {
    val rows = graft.operators.Reshape.queries("q_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val n = Tables.orders(spark, sf).count()
    assert(rows.size == 6)
    rows.foreach { case (c, (nRows, nNull, _)) =>
      assert(nRows == n, s"$c: n_rows")
      assert(nNull == 0L, s"$c: fixture has no nulls")
    }
    assert(rows("o_orderkey")._3 == n, "primary key must be fully distinct")
    assert(rows("o_orderstatus")._3 <= 3L)
  }

  test("q_funnel_time: converted count matches the funnel's stage 3; gaps non-negative") {
    val row = RelationalExt.queries("q_funnel_time")(spark, sf).collect().head
    val funnel = RelationalExt.queries("q_funnel")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(row.getLong(0) == funnel(3))
    // event_id is ts-monotone in the fixture, so stage gaps are ≥ 0
    assert(row.getLong(1) >= 0L && row.getLong(2) >= 0L)
    assert(row.getLong(3) >= row.getLong(1) / 2 && row.getLong(4) >= row.getLong(2) / 2)
  }

  test("q_session_stats: session count matches q_islands; bounce rate recomputes") {
    val row = RelationalExt.queries("q_session_stats")(spark, sf).collect().head
    val islands = graft.operators.Reshape.queries("q_islands")(spark, sf).collect()
    assert(row.getLong(0) == islands.length.toLong)
    val singles = islands.count(_.getLong(2) == 1L).toLong
    assert(row.getLong(4) == singles * 1000000L / islands.length)
    assert(row.getLong(3) >= row.getLong(2) / 2, "max duration can't undercut the median")
  }

  test("q_dau_wau: WAU bounds DAU; trailing-7 recount agrees on every day") {
    val rows = RelationalExt.queries("q_dau_wau")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val du = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) DIV 86400000000 AS day", "user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = du.groupBy(_._1)
    rows.foreach { case (day, dau, wau) =>
      assert(wau >= dau, s"day $day: WAU $wau < DAU $dau")
      assert(dau == byDay(day).length.toLong)
      val recount = du.filter { case (d2, _) => d2 >= day - 6 && d2 <= day }
        .map(_._2).distinct.length.toLong
      assert(wau == recount, s"day $day: WAU $wau vs recount $recount")
    }
  }

  test("q_group_norm: per-group z-scores have ~zero mean and ~unit variance") {
    val rows = RelationalExt.queries("q_group_norm")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (g, zs) =>
      val z = zs.map(_._2.toDouble / 1e6)
      val n = z.length
      val mean = z.sum / n
      val variance = z.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      assert(math.abs(mean) < 0.01, s"$g: z mean $mean")
      assert(math.abs(variance - 1.0) < 0.01, s"$g: z variance $variance")
    }
  }

  test("q_autocorr: bounded by 1; lag-1 matches a driver-side Pearson recompute") {
    val rows = RelationalExt.queries("q_autocorr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to 7))
    rows.foreach { case (k, _, acf) => assert(math.abs(acf) <= 1.0, s"lag $k acf $acf") }
    val daily = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("c")).orderBy($"day").collect().map(_.getLong(1))
    val (xs, ys) = (daily.dropRight(1), daily.drop(1))
    val n = xs.length.toDouble
    val num = n * (xs, ys).zipped.map(_ * _).sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum.toDouble * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum.toDouble * ys.sum))
    assert(math.abs(rows.head._3 - num / den) < 1e-5)
  }

  test("q_changepoint: CUSUM winner matches a driver-side sweep; curve closes at zero") {
    val row = RelationalExt.queries("q_changepoint")(spark, sf).collect().head
    val daily = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("c")).orderBy($"day").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = daily.length.toLong
    val sc = daily.map(_._2).sum
    var s = 0L
    val curve = daily.map { case (day, c) => s += n * c - sc; (day, s) }
    assert(curve.last._2 == 0L, "Σ(n·c − Σc) must telescope to zero")
    val best = curve.minBy { case (day, st) => (-math.abs(st), day) }
    assert(row.getLong(0) == best._1 && row.getLong(2) == best._2)
  }

  test("q_gini: rank-sum form equals the mean-absolute-difference definition") {
    val row = RelationalExt.queries("q_gini")(spark, sf).collect().head
    val (n, sx, num, g) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val xs = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(_.getLong(1))
    assert(n == xs.length.toLong && sx == xs.sum)
    // Σᵢⱼ|xᵢ−xⱼ| = 2·(2Σr·x₍ᵣ₎ − (n+1)Σx) — the independent pairwise identity
    var pairSum = 0L
    xs.foreach(a => xs.foreach(b => pairSum += math.abs(a - b)))
    assert(pairSum == 2L * num, s"pairwise $pairSum vs 2×rank-sum ${2L * num}")
    assert(g >= 0.0 && g < 1.0)
  }

  test("q_chi2: numerator matches the rational identity on independent counts") {
    val row = RelationalExt.queries("q_chi2")(spark, sf).collect().head
    val (n, k, num) = (row.getLong(0), row.getLong(1), row.getLong(3))
    val obs = Tables.events(spark, sf).groupBy($"event_type").count()
      .collect().map(_.getLong(1))
    assert(k == obs.length && n == obs.sum)
    val expected = obs.map(o => { val t = k * o - n; t * t }).sum
    assert(num == expected)
    // Σ(k·obs−n)²/(k·n) equals the textbook Σ(obs−n/k)²/(n/k) form
    val textbook = obs.map(o => { val e = n.toDouble / k; (o - e) * (o - e) / e }).sum
    assert(math.abs(num.toDouble / (k * n) - textbook) < 1e-9)
  }

  test("q_skyline: exactly the non-dominated distinct points (brute-force check)") {
    val sky = RelationalExt.queries("q_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val pts = Tables.part(spark, sf)
      .select(expr("CAST(floor(p_retailprice * 100) AS BIGINT)").as("x"), $"p_size")
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    def dominated(p: (Long, Int)): Boolean = pts.exists(q =>
      q._1 <= p._1 && q._2 <= p._2 && (q._1 < p._1 || q._2 < p._2))
    val expected = pts.filterNot(dominated)
    assert(sky == expected,
      s"skyline mismatch: extra=${sky -- expected} missing=${expected -- sky}")
  }

  test("q_bayes_rate: smoothing shrinks every user toward the global prior") {
    val rows = RelationalExt.queries("q_bayes_rate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // recover the prior exactly as the query computes it
    val totalN = rows.map(_._2).sum
    val totalC = rows.map(_._3).sum
    val pMicro = totalC * 1000000L / totalN
    rows.foreach { case (u, n, conv, raw, smoothed) =>
      assert(raw == conv * 1000000L / n, s"user $u raw rate")
      assert(smoothed == (conv * 1000000L + 20L * pMicro) / (n + 20L), s"user $u smoothed")
      // the posterior mean lies between the evidence and the prior
      // (integer-floor slack of 1 micro-unit on each bound)
      val lo = math.min(raw, pMicro) - 1
      val hi = math.max(raw, pMicro) + 1
      assert(smoothed >= lo && smoothed <= hi,
        s"user $u: smoothed $smoothed outside [$lo, $hi] (raw $raw, prior $pMicro)")
    }
  }

  test("q_psi: every log-ratio sits far from a floor boundary (libm guard); terms are non-negative and sum to psi") {
    // The q_dsir_weight guard applied to PSI's one ln(): recompute each
    // bucket's smoothed cross products at all three fixture SFs and
    // assert a >= 1e-5 gap to the nearest floor boundary of
    // ln(ratio)·10⁴ + 0.5 — ~1e5x worst cross-libm divergence.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = RelationalExt.queries("q_psi")(spark, dir).collect()
      assert(rows.length == 10)
      rows.foreach { r =>
        assert(r.getLong(6) >= 0L, s"$dir bucket ${r.getLong(0)}: negative PSI term")
      }
      assert(rows.map(_.getLong(6)).sum == rows.head.getLong(7),
        s"$dir: per-bucket terms do not sum to psi_micro")
      val ev = Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("greatest(least(CAST(floor(value / 50.0) AS BIGINT), 9L), 0L)").as("bucket"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
      val cnt = ev.groupBy(col("bucket"))
        .agg(sum(col("ia")).as("a"), sum(col("ib")).as("b")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (na, nb) = (cnt.values.map(_._1).sum, cnt.values.map(_._2).sum)
      val minDist = (0L until 10L).map { k =>
        val (a, b) = cnt.getOrElse(k, (0L, 0L))
        val x = math.log(((a + 1) * (nb + 10)).toDouble / ((b + 1) * (na + 10))) * 1e4 + 0.5
        math.min(x - math.floor(x), math.ceil(x) - x)
      }.min
      assert(minDist > 1e-5,
        s"$dir: a PSI log-ratio sits $minDist from a floor boundary — " +
          "cross-engine libm divergence could flip it; re-bucket or re-quantize")
    }
  }

  test("q_mann_whitney: U identity, doubled-rank total, and brute-force ΣR_A agree") {
    val r = RelationalExt.queries("q_mann_whitney")(spark, sf).collect().head
    val (nA, nB, u2a, u2b, tiesT) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // U_A + U_B = n_A·n_B (doubled units), both non-negative.
    assert(u2a + u2b == 2 * nA * nB, "U identity violated")
    assert(u2a >= 0 && u2b >= 0)
    // Brute-force: average ranks over the pooled milli-quantized sample.
    val pooled = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val sorted = pooled.map(_._2).sorted
    val firstIdx = sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
    val tieCnt = sorted.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    // doubled average rank of value v: 2·(firstIdx+1) + (t−1)
    val sr2A = pooled.filter(_._1 == "click")
      .map { case (_, v) => 2L * (firstIdx(v) + 1) + (tieCnt(v) - 1) }.sum
    assert(u2a == sr2A - nA * (nA + 1), s"doubled-rank sum mismatch: $u2a vs ${sr2A - nA * (nA + 1)}")
    assert(tiesT == tieCnt.values.map(t => t * t * t - t).sum)
  }

  test("q_mann_kendall and q_theil_sen: S, ties, and the median slope replay brute-force") {
    val mk = RelationalExt.queries("q_mann_kendall")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ts = RelationalExt.queries("q_theil_sen")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val days = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    days.groupBy(_._1).foreach { case (et, rows) =>
      val seq = rows.sortBy(_._2).map(r => (r._2, r._3))
      val prs = for (i <- seq.indices; j <- i + 1 until seq.length) yield (seq(i), seq(j))
      val s = prs.map { case ((_, c1), (_, c2)) => java.lang.Long.signum(c2 - c1).toLong }.sum
      val tiesT = seq.groupBy(_._2).values.map { g =>
        val t = g.size.toLong; t * (t - 1) * (2 * t + 5)
      }.sum
      val n = seq.length.toLong
      val var18 = n * (n - 1) * (2 * n + 5) - tiesT
      val z2 = if (math.abs(s) >= 1 && var18 > 0)
        18 * (math.abs(s) - 1) * (math.abs(s) - 1) * 1000000L / var18 else 0L
      val (gn, gs, gt, gz) = mk(et)
      assert(gn == n && gs == s && gt == tiesT && gz == z2, s"$et: MK diverges")
      // Theil-Sen: sign-safe quantized slopes, x2-scaled exact median
      def sdiv(x: Long, y: Long): Long = if (x >= 0) x / y else -((-x) / y)
      val slopes = prs.map { case ((d1, c1), (d2, c2)) => sdiv((c2 - c1) * 1000, d2 - d1) }
        .sorted
      val m = slopes.length
      val med2 = if (m % 2 == 1) 2 * slopes(m / 2) else slopes(m / 2 - 1) + slopes(m / 2)
      val (gp, gm) = ts(et)
      assert(gp == m && gm == med2, s"$et: Theil-Sen diverges ($gm vs $med2)")
    }
    // z² is a quotient of non-negative integers by construction (a
    // tiny-n fixture CAN fire the 5% gate by chance — that is what 5%
    // means — so null behavior is not assertable here)
    assert(mk.values.forall(_._4 >= 0L))
  }

  test("q_cuped: serial replay matches; adjustment reduces variance in both arms") {
    val out = RelationalExt.queries("q_cuped")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 3600000000").as("h"),
        expr("CAST(floor(value * 10 + 0.5) AS BIGINT)").as("vd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    val users = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      (u % 2, rows.filter(_._2 < mid).map(_._3).sum, rows.filter(_._2 >= mid).map(_._3).sum)
    }
    val n = users.size.toLong
    val (sp, so) = (users.map(_._2).sum, users.map(_._3).sum)
    val covNum = n * users.map(t => t._2 * t._3).sum - sp * so
    val varNum = n * users.map(t => t._2 * t._2).sum - sp * sp
    def sdiv(x: Long, y: Long): Long = if (x >= 0) x / y else -((-x) / y)
    val theta = sdiv(covNum, varNum / 1000000L)
    val adj = users.map { case (arm, pre, post) =>
      (arm, post, post - sdiv(theta * (pre - sp / n), 1000000L))
    }
    adj.groupBy(_._1).foreach { case (arm, xs) =>
      val m = xs.size.toLong
      val vp = m * xs.map(t => t._2 * t._2).sum - xs.map(_._2).sum * xs.map(_._2).sum
      val va = m * xs.map(t => t._3 * t._3).sum - xs.map(_._3).sum * xs.map(_._3).sum
      val (gn, gTheta, gMeanPost, gMeanAdj, gVp, gVa, gRed) = out(arm)
      assert(gn == m && gTheta == theta, s"arm $arm: n/theta")
      assert(gMeanPost == xs.map(_._2).sum / m && gMeanAdj == sdiv(xs.map(_._3).sum, m))
      assert(gVp == vp && gVa == va, s"arm $arm: variance numerators")
      assert(gRed == sdiv((vp - va) * 1000000L, vp))
    }
    // the variance guarantee holds for the POOLED sample the OLS θ was
    // fit on (a tiny per-arm subsample can go the other way)
    val pn = adj.size.toLong
    val pvp = pn * adj.map(t => t._2 * t._2).sum - adj.map(_._2).sum * adj.map(_._2).sum
    val pva = pn * adj.map(t => t._3 * t._3).sum - adj.map(_._3).sum * adj.map(_._3).sum
    assert(pva <= pvp, "CUPED increased pooled variance")
  }

  test("q_incr_join: the four IVM terms partition the flat join, segment by segment") {
    val got = graft.operators.Reshape.queries("q_incr_join")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val flat = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == flat.keySet)
    got.foreach { case (seg, (bb, bd, db, dd, total)) =>
      assert(total == flat(seg), s"$seg: IVM total diverges from the flat join")
      assert(bb + bd + db + dd == total, s"$seg: terms do not partition")
    }
    // the delta terms must be non-trivial or the identity is vacuous
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._3).sum > 0 &&
      got.values.map(_._4).sum > 0, "a delta term is empty on this fixture")
  }

  test("q_bitmap_distinct: bitmap count is bit-true against countDistinct for every group") {
    val rows = graft.operators.Relational.queries("q_bitmap_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (et, nWords, nBitmap, nExact, bitTrue) =>
      assert(bitTrue, s"$et: bitmap diverged from exact")
      assert(nBitmap == exact(et) && nExact == exact(et), s"$et: count wrong")
      assert(nWords <= nExact, s"$et: more words than distinct ids")
    }
  }

  test("q_seq_pairs: eventually-follows matches a brute-force precedence scan") {
    val got = RelationalExt.queries("q_seq_pairs")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = ev.map(_._2).distinct.sorted
    val byUser = ev.groupBy(_._1)
    val nUsers = byUser.size.toLong
    val withA = types.map(t => t -> byUser.count(_._2.exists(_._2 == t)).toLong).toMap
    for (a <- types; b <- types if a != b) {
      val n = byUser.count { case (_, rows) =>
        val as = rows.filter(_._2 == a).map(_._3)
        val bs = rows.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      }.toLong
      got.get((a, b)) match {
        case Some((nf, sup, conf)) =>
          assert(nf == n, s"($a,$b): $nf vs brute $n")
          assert(sup == n * 1000000L / nUsers && conf == n * 1000000L / withA(a))
        case None => assert(n == 0L, s"($a,$b): missing pair with $n followers")
      }
    }
  }

  test("q_sax: words match a serial PAA+breakpoint replay; length = min(8, n)") {
    val got = RelationalExt.queries("q_sax")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("xm"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      val n = xs.length.toLong
      val word = xs.zipWithIndex.groupBy { case (_, k) => k * 8 / n }
        .toSeq.sortBy(_._1)
        .map { case (_, segVals) =>
          val paa = segVals.map(_._1).sum / segVals.length
          if (paa < 100000L) 'a' else if (paa < 200000L) 'b'
          else if (paa < 300000L) 'c' else if (paa < 400000L) 'd' else 'e'
        }.mkString
      val (gotN, gotWord) = got(u)
      assert(gotN == n && gotWord == word, s"user $u: $gotWord vs serial $word")
      assert(gotWord.length == math.min(8L, n) && gotWord.forall(c => c >= 'a' && c <= 'e'))
    }
  }

  test("q_cusum: reflection identity equals the serial max(0, S+y) recurrence") {
    val got = RelationalExt.queries("q_cusum")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("xm"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      val mean = xs.sum / xs.length // truncating DIV on non-negative sums
      var s = 0L; var peak = 0L; var alarms = 0L
      xs.foreach { x =>
        s = math.max(0L, s + x - mean - 5000L)
        peak = math.max(peak, s)
        if (s > 200000L) alarms += 1
      }
      val (n, gotMean, gotPeak, gotAlarms) = got(et)
      assert(n == xs.length && gotMean == mean, s"$et: n/mean mismatch")
      assert(gotPeak == peak, s"$et: serial peak $peak vs window $gotPeak")
      assert(gotAlarms == alarms, s"$et: serial alarms $alarms vs window $gotAlarms")
    }
  }

  test("q_attribution: last-touch counts purchases once, linear credit conserves per purchase") {
    val rows = RelationalExt.queries("q_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val attributed = Tables.events(spark, sf).createOrReplaceTempView("ev_attr")
    val nAttr = spark.sql(
      """SELECT count(DISTINCT p.event_id) FROM ev_attr p JOIN ev_attr c
        |ON p.user_id = c.user_id AND p.event_type = 'purchase'
        |AND c.event_type = 'click' AND unix_micros(c.ts) < unix_micros(p.ts)
        |AND unix_micros(c.ts) >= unix_micros(p.ts) - 86400000000""".stripMargin)
      .collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_last")).sum === nAttr,
      "every attributed purchase has exactly one last-touch channel")
    // linear credit: 1e6 per purchase minus truncation dust (< nclk micro each)
    val lin = rows.map(_.getAs[Long]("linear_micro")).sum
    assert(lin <= nAttr * 1000000L && lin > nAttr * 999000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("linear_micro") <= r.getAs[Long]("n_clicks") * 1000000L)
    }
  }

  test("q_forecast_eval: errors nonnegative, sMAPE within its [0, 2e6] range") {
    val rows = RelationalExt.queries("q_forecast_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0L)
      assert(r.getAs[Long]("mae_naive_c") >= 0L && r.getAs[Long]("mae_snaive_c") >= 0L)
      Seq("smape_naive_micro", "smape_snaive_micro").foreach { cname =>
        if (!r.isNullAt(r.fieldIndex(cname))) {
          val v = r.getAs[Long](cname)
          assert(v >= 0L && v <= 2000000L, s"$cname out of range: $v")
        }
      }
    }
  }

  test("q_ctr_smoothing: shrunk rate lies between the raw rate and the prior mean") {
    val rows = RelationalExt.queries("q_ctr_smoothing")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).filter(col("event_type").isin("click", "view"))
    val tc = ev.filter(col("event_type") === "click").count()
    val tv = ev.filter(col("event_type") === "view").count()
    val gm = tc * 1000000L / tv
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val raw = r.getAs[Long]("raw_micro"); val sh = r.getAs[Long]("shrunk_micro")
      val lo = math.min(raw, gm) - 1L; val hi = math.max(raw, gm) + 1L
      assert(sh >= lo && sh <= hi, s"item ${r.getAs[Long]("item")}: $sh outside [$lo, $hi]")
    }
  }
}

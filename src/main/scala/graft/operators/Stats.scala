package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical inference bank — the hypothesis-test / experiment-
  * analysis layer that sits on top of the drift gates in
  * [[RelationalExt]] (t / KS / χ² / Mann-Whitney / PSI) and the model
  * evals in [[Learn]] (AUC / calibration / lift). The reference's
  * BigQuery consumers run exactly this class of readout SQL over the
  * ETL'd tables (reference: etl_service/main.py keeps the warehouse
  * queryable for downstream analysis); here each test is an on-engine
  * operator with the repo's exactness discipline:
  *
  *   - rank statistics run at DISTINCT-VALUE grain (the q_auc /
  *     q_mann_whitney posture): the corpus collapses to per-value
  *     counts first, tie groups carry the textbook average rank in
  *     DOUBLED units (r2 = 2·below + cnt + 1) so no half ever appears,
  *     and the only ordered windows run over bounded distinct-value
  *     tables — a two-phase prefix sum at 100 TB, never a corpus sort;
  *   - O(n²) pair statistics run at DAY grain (the q_mann_kendall
  *     posture) — bounded by the calendar, never by corpus size;
  *   - group-grain finals on exact BIGINT moments may go through
  *     DOUBLE + round() (the q_stats_corr precedent): the inputs are
  *     exact integers, the float expression is written in identical
  *     text in both engines, and the only nondeterminism left is the
  *     summation order of ≤ k group terms — orders of magnitude below
  *     the rounding grain;
  *   - every possibly-negative division routes through the sign-safe
  *     CASE ([[graft.functions.SqlBridge.sdiv]]) because Spark DIV truncates while DuckDB
  *     // floors.
  */
object Stats {
  type Q = (SparkSession, String) => DataFrame

  import graft.functions.SqlBridge.{sdiv, sdivSql}

  /** −ln(−ln(1 − 1/30)), the standard-Gumbel 30-period return-level
    * quantile, pre-evaluated so both engines consume the identical
    * binary double (see q_gumbel_tail's scaladoc). */
  private[operators] val Gumbel30: Double = -math.log(-math.log(1.0 - 1.0 / 30.0))

  /** q_sprt's per-event log-likelihood ratios on the micro grid,
    * pre-evaluated (ln(p₁/p₀) and ln((1−p₁)/(1−p₀)) for p₀ = 0.2,
    * p₁ = 0.25) so neither engine's libm is consulted in the loop. */
  private[operators] val SprtL1: Long = math.floor(math.log(0.25 / 0.2) * 1e6 + 0.5).toLong
  private[operators] val SprtL0: Long = {
    val x = math.log(0.75 / 0.8) * 1e6
    if (x >= 0) math.floor(x + 0.5).toLong else -math.floor(-x + 0.5).toLong
  }

  val queries: Map[String, Q] = Map(

    // SPEARMAN rank correlation (Spearman 1904) between quantity and
    // price per return flag — the robust complement to q_stats_corr's
    // Pearson: invariant to any monotone transform, insensitive to the
    // price outliers that wreck a product-moment estimate. ρ = Pearson
    // over average-tie ranks; ranks are computed at DISTINCT-VALUE
    // grain (per (flag, value) counts + a prefix sum over the bounded
    // distinct-value table) and joined back to rows — the rank tables
    // are aggregate-grain, so the per-row step is two hash joins, and
    // no window ever sees a corpus-sized partition. Doubled ranks
    // (2·below + cnt + 1) keep the rank columns integral; scaling both
    // by 2 leaves the correlation unchanged.
    "q_spearman" -> ((s, d) => {
      val rows = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("pc"))
        .ckpt() // rank builds + row joins share one scan
      def rankTab(c: String): DataFrame = {
        val per = rows.groupBy(col("flag"), col(c)).agg(count(lit(1)).as("cnt"))
        val below = Window.partitionBy(col("flag")).orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, -1)
        per.withColumn("below", coalesce(sum(col("cnt")).over(below), lit(0L)))
          .select(col("flag"), col(c), expr("2 * below + cnt + 1").as(s"r2_$c"))
      }
      rows
        .join(rankTab("q"), Seq("flag", "q"))
        .join(rankTab("pc"), Seq("flag", "pc"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("r2_q"), col("r2_pc")), 4).as("rho"))
        .orderBy(col("flag"))
    }),

    // KENDALL tau-b (Kendall 1938) between the daily click and view
    // volumes — "do the two series move together", by concordance
    // counting rather than moments: S = Σ_{i<j} sgn(Δx)·sgn(Δy) over
    // day pairs, tie-adjusted denominator (P−Tx)(P−Ty). Exact
    // integers throughout; the report carries sign and squared
    // magnitude separately (tau_sign, tau2_micro) so no square root is
    // ever taken — the q_mann_kendall z² idiom. The O(n²) pair join
    // runs at DAY grain: bounded by the calendar, never corpus size.
    "q_kendall_tau" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")).as("x"),
          sum(expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")).as("y"))
        .ckpt() // pair join reads both sides + the n census
      val pairs = days.as("a").join(days.as("b"), expr("a.day < b.day"))
        .agg(
          sum(expr("CAST(sign(b.x - a.x) AS BIGINT) * CAST(sign(b.y - a.y) AS BIGINT)")).as("s"),
          sum(expr("CASE WHEN b.x = a.x THEN 1 ELSE 0 END")).as("tx"),
          sum(expr("CASE WHEN b.y = a.y THEN 1 ELSE 0 END")).as("ty"))
      val n = days.agg(count(lit(1)).as("n"))
      pairs.crossJoin(broadcast(n))
        .withColumn("p", expr("n * (n - 1) DIV 2"))
        .withColumn("tau2_micro",
          expr("CASE WHEN (p - tx) * (p - ty) > 0 THEN (s * s * 1000000) DIV ((p - tx) * (p - ty)) ELSE 0 END"))
        .withColumn("tau_sign", expr("CAST(sign(s) AS BIGINT)"))
        .select(col("n"), col("p"), col("s"), col("tx"), col("ty"),
          col("tau2_micro"), col("tau_sign"))
    }),

    // KRUSKAL-WALLIS H (Kruskal & Wallis 1952) across the event-type
    // arms on value — the k-sample generalization of q_mann_whitney:
    // one rank-based omnibus "do ANY of the k arms differ", no
    // normality assumed. Global average-tie ranks in doubled units at
    // distinct-value grain; per-arm rank sums by one join + aggregate;
    // the H finals run on a k-row frame from exact BIGINT moments
    // (sr2² overflows int64 at corpus scale, so the k-row final is
    // IEEE DOUBLE in identical expression text — the only float, with
    // summation-order noise ~1e-11 against a round(6) grain). Tie
    // correction H/(1−ΣT/(n³−n)) included.
    "q_kruskal_wallis" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .agg(count(lit(1)).as("c"))
        .ckpt() // value census + arm rank-sums share it
      val byv = cells.groupBy(col("vm")).agg(sum(col("c")).as("t"))
      val below = Window.orderBy(col("vm")).rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byv
        .withColumn("below", coalesce(sum(col("t")).over(below), lit(0L)))
        .withColumn("r2", expr("2 * below + t + 1"))
      val grp = cells.join(ranked.select(col("vm"), col("r2")), Seq("vm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("c * r2")).as("sr2"), sum(col("c")).as("n_g"))
      val ties = ranked.agg(sum(expr("t * t * t - t")).as("ties_t"), sum(col("t")).as("n"))
      grp.crossJoin(broadcast(ties))
        .agg(max(col("n")).as("n"), count(lit(1)).as("k"), max(col("ties_t")).as("ties_t"),
          sum(expr("CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE) / (4.0 * n_g)")).as("a"))
        .withColumn("h", expr("12.0 * a / (n * (n + 1.0)) - 3.0 * (n + 1)"))
        .withColumn("h_corr", expr(
          "h / (1.0 - CAST(ties_t AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"))
        // χ²₀.₀₅ at df = k−1 = 4 (the fixture's 5 event types)
        .select(col("n"), col("k"), col("ties_t"),
          round(col("h"), 6).as("h"), round(col("h_corr"), 6).as("h_corr"),
          expr("h_corr > 9.4877").as("reject_05"))
    }),

    // One-way ANOVA F (Fisher 1925) across the event-type arms — the
    // parametric twin of q_kruskal_wallis, decomposing total variance
    // into between/within. All moments (n_g, Σx, Σx²) are exact BIGINT
    // on milli-quantized values in ONE partial+final aggregate; the
    // F finals run on the k-row frame in DOUBLE (identical expression
    // text both engines; the between-sum cancellation leaves ~1e-4
    // absolute noise on a statistic of order 1e9 — far below round
    // grain). Also reports η² (variance explained) at micro precision.
    "q_anova" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"), sum(col("vm")).as("s_g"), sum(expr("vm * vm")).as("ss_g"))
        .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
          sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
          sum(expr("CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g")).as("a"))
        .withColumn("ssb", expr("a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n"))
        .withColumn("ssw", expr("ss - a"))
        .withColumn("f", expr("(ssb / (k - 1)) / (ssw / (n - k))"))
        // F₀.₀₅ critical at df1 = 4, df2 → ∞
        .select(col("n"), col("k"),
          round(col("f"), 4).as("f"),
          round(expr("ssb / (ssb + ssw)"), 6).as("eta2"),
          expr("f > 2.3719").as("reject_05"))
    }),

    // PETTITT changepoint test (Pettitt 1979) per event-type daily
    // series — the nonparametric "WHEN did the distribution shift"
    // that pairs with q_mann_kendall ("is there a trend") and
    // q_changepoint (CUSUM on means): K = max_t |U_t| with
    // U_t = Σ_{i≤t, j>t} sgn(x_j − x_i). The naive form is O(n³); we
    // use U_t = Σ_{s≤t} V_s where V_s = (#days above x_s) − (#days
    // below x_s) — V comes from the distinct-value census (no pair
    // join AT ALL), U is one cumulative window over the day-grain
    // series, so the whole test is two bounded prefix sums. The
    // p-value exponent 6K²/(n³+n²) ships in exact integer micro;
    // p ≤ 0.05 ⟺ exponent ≥ ln(40) = 3.688879.
    "q_pettitt" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .ckpt() // value census + day walk share it
      val byv = days.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("t"))
      val wv = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val nTab = days.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val v = byv
        .withColumn("below", coalesce(sum(col("t")).over(wv), lit(0L)))
        .join(nTab, Seq("event_type"))
        .withColumn("v", expr("(n - below - t) - below"))
      val wu = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val u = days.join(v.select(col("event_type"), col("c"), col("v"), col("n")),
          Seq("event_type", "c"))
        .withColumn("u", sum(col("v")).over(wu))
      val kTab = u.groupBy(col("event_type"), col("n")).agg(max(abs(col("u"))).as("k_stat"))
      val cp = u.join(kTab, Seq("event_type", "n"))
        .filter(expr("abs(u) = k_stat"))
        .groupBy(col("event_type"), col("n"), col("k_stat"))
        .agg(min(col("day")).as("cp_day"))
      cp.withColumn("e_micro", expr("(6 * k_stat * k_stat * 1000000) DIV (n * n * n + n * n)"))
        .withColumn("reject_05", expr("e_micro >= 3688879"))
        .select(col("event_type"), col("n"), col("k_stat"), col("cp_day"),
          col("e_micro"), col("reject_05"))
        .orderBy(col("event_type"))
    }),

    // DIFFERENCE-IN-DIFFERENCES (the quasi-experimental workhorse —
    // Card & Krueger 1994 popularized it; every holdout-vs-launch
    // readout is this estimator): arms from the q_cuped assignment
    // (user_id % 2), periods split at the series midpoint hour, and
    // DiD = (ȳ₁ᵖᵒˢᵗ − ȳ₁ᵖʳᵉ) − (ȳ₀ᵖᵒˢᵗ − ȳ₀ᵖʳᵉ). One partial+final
    // aggregate at (arm, period) grain — 4 cells; cell means in exact
    // integer micro (deci-quantized values, non-negative divisions);
    // the DiD itself is pure subtraction of micro means, exact.
    "q_diff_in_diff" -> ((s, d) => {
      val bounds = Tables.events(s, d)
        .agg(expr("(min(unix_micros(ts) DIV 3600000000) + max(unix_micros(ts) DIV 3600000000) + 1) DIV 2")
          .as("mid"))
      Tables.events(s, d)
        .crossJoin(broadcast(bounds))
        .select((col("user_id") % 2).as("arm"),
          expr("CASE WHEN unix_micros(ts) DIV 3600000000 >= mid THEN 1 ELSE 0 END").as("post"),
          expr("CAST(floor(value * 10 + 0.5) AS BIGINT)").as("vd"))
        .groupBy(col("arm"), col("post"))
        .agg(count(lit(1)).as("nn"), sum(col("vd")).as("sv"))
        .agg(
          sum(expr("CASE WHEN arm = 0 AND post = 0 THEN nn ELSE 0 END")).as("n00"),
          sum(expr("CASE WHEN arm = 0 AND post = 1 THEN nn ELSE 0 END")).as("n01"),
          sum(expr("CASE WHEN arm = 1 AND post = 0 THEN nn ELSE 0 END")).as("n10"),
          sum(expr("CASE WHEN arm = 1 AND post = 1 THEN nn ELSE 0 END")).as("n11"),
          sum(expr("CASE WHEN arm = 0 AND post = 0 THEN (sv * 100000) DIV nn ELSE 0 END")).as("m00_micro"),
          sum(expr("CASE WHEN arm = 0 AND post = 1 THEN (sv * 100000) DIV nn ELSE 0 END")).as("m01_micro"),
          sum(expr("CASE WHEN arm = 1 AND post = 0 THEN (sv * 100000) DIV nn ELSE 0 END")).as("m10_micro"),
          sum(expr("CASE WHEN arm = 1 AND post = 1 THEN (sv * 100000) DIV nn ELSE 0 END")).as("m11_micro"))
        .withColumn("did_micro", expr("(m11_micro - m10_micro) - (m01_micro - m00_micro)"))
    }),

    // MINIMUM DETECTABLE EFFECT — the power-analysis readout that runs
    // BEFORE an experiment (the q_ab_srm hygiene posture: what effect
    // CAN this traffic even see at α=0.05, power=0.8?): per metric
    // (event type), user-level variance and per-arm counts give
    // MDE² = (z_{α/2}+z_β)²·2σ²/n = 7.84·2σ²/n. Squared form so no
    // root is taken — exact integer micro end-to-end: variance via the
    // one-pass (nΣx²−(Σx)²)/(n(n−1)) on deci-quantized user totals
    // (non-negative numerator — n·Σx² ≥ (Σx)² by Cauchy-Schwarz), n =
    // the smaller arm. The whole thing is one (type, user) aggregate
    // plus a k-row final.
    "q_mde" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(expr("CAST(floor(value * 10 + 0.5) AS BIGINT)")).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(expr("CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END")).as("n0"),
          sum(expr("CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END")).as("n1"),
          sum(col("x")).as("s"), sum(expr("x * x")).as("ss"))
        .withColumn("var_q", expr("(n_users * ss - s * s) DIV (n_users * (n_users - 1))"))
        .withColumn("mde2_micro", expr("(15680000 * var_q) DIV least(n0, n1)"))
        .select(col("event_type"), col("n_users"), col("n0"), col("n1"),
          col("var_q"), col("mde2_micro"))
        .orderBy(col("event_type"))
    }),

    // CROSS-CORRELATION function between the daily click and view
    // series at lags 0..7 — the lead-lag discovery readout ("do
    // clicks TODAY predict views in k days?") that generalizes
    // q_autocorr to two series and gives q_kendall_tau its temporal
    // axis. The day-grain frame is built once and self-joined on
    // day+lag per lag (8 bounded equi-joins via one lag explode —
    // calendar-bounded, the q_mann_kendall posture); Pearson at each
    // lag through the engines' corr() under round(4), the
    // q_stats_corr precedent.
    "q_crosscorr" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")).as("x"),
          sum(expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")).as("y"))
        .ckpt() // both sides of every lag join share it
      val lagged = days
        .withColumn("lag", explode(expr("sequence(0L, 7L)")))
        .select(col("lag"), col("day"), col("x"))
      val fut = days.select(col("day").as("fday"), col("y"))
      lagged.join(fut, col("fday") === col("day") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), round(corr(col("x"), col("y")), 4).as("ccf"))
        .orderBy(col("lag"))
    }),

    // GUMBEL tail fit over daily block maxima (Gumbel 1958; the
    // Fisher-Tippett type-I limit for maxima of light-tailed series) —
    // the extreme-value readout behind "what peak should we provision
    // for": per event type, the daily-max series fits location/scale
    // by method of moments (β = σ√6/π, μ = m − γβ), and the 30-day
    // return level μ + β·(−ln(−ln(1−1/30))) is the provisioning
    // number. Moments are exact BIGINT at day grain (n·Σx²−(Σx)²
    // stays under 2⁶³ by the calendar bound); only the k-row final is
    // DOUBLE in identical expression text, under round(4). The Gumbel
    // quantile constant −ln(−ln(1−1/30)) ships as a PRE-EVALUATED
    // double literal: spelled as arithmetic, Spark would parse the
    // `1.0` literals as DECIMAL and fold the expression in decimal
    // precision while DuckDB folds in binary double — 1e-5 apart,
    // which round(4) cannot absorb at this magnitude.
    "q_gumbel_tail" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(max(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")).as("mx"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("mx")).as("s"), sum(expr("mx * mx")).as("ss"))
        .withColumn("vr", expr("CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))"))
        .withColumn("beta", expr("sqrt(6.0 * vr) / pi()"))
        .withColumn("mu", expr("CAST(s AS DOUBLE) / n - 0.5772156649 * beta"))
        .select(col("event_type"), col("n"),
          round(col("beta"), 4).as("beta_milli"),
          round(col("mu"), 4).as("mu_milli"),
          round(expr(s"mu + beta * ${Gumbel30}D"), 4).as("ret30_milli"))
        .orderBy(col("event_type"))
    }),

    // SEASONALITY STRENGTH via weekday variance decomposition
    // (Hyndman's STL-strength measure specialized to the weekly
    // period): 1 − SSW/SST, where SSW pools the within-weekday
    // variation — 0 means weekday explains nothing, →1 means the
    // series is pure weekly rhythm. The gate that decides whether
    // q_forecast_eval's seasonal-naive baseline (and q_seasonal's
    // decomposition) is even worth running. Exactness: daily sums
    // are exact cents; per-weekday scatter (n_w·Σs² − (Σs)²)/n_w is
    // the only rational — it snaps to an integer immediately
    // (floor(x + 0.5) of a double computed from exact ints in
    // identical text), so the Σ over weekdays is exact and the one
    // final division is reproducible. Day grain throughout.
    "q_season_strength" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
        .groupBy(col("event_type"), col("day")).agg(sum(col("vc")).as("s"))
        .withColumn("wd", expr("day % 7"))
      val byWd = daily.groupBy(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("nw"), sum(col("s")).as("ssw"),
          sum(expr("s * s")).as("ssqw"))
        .withColumn("scatter", expr(
          """CAST(floor((CAST(nw AS DOUBLE) * ssqw - CAST(ssw AS DOUBLE) * ssw)
            |  / nw + 0.5) AS BIGINT)""".stripMargin))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"),
          sum(expr("s * s")).as("ssq"))
      byWd.groupBy(col("event_type"))
        .agg(sum(col("scatter")).as("ssw_c2"), count(lit(1)).as("n_weekdays"))
        .join(tot, Seq("event_type"))
        .select(col("event_type"), col("n").as("n_days"), col("n_weekdays"),
          round(expr(
            """1.0 - CAST(ssw_c2 AS DOUBLE)
              |  / ((CAST(n AS DOUBLE) * ssq - CAST(ss AS DOUBLE) * ss) / n)""".stripMargin), 4)
            .as("strength"))
        .orderBy(col("event_type"))
    }),

    // GENERALIZED-ESD-style outlier report (Rosner 1983's repeated
    // Grubbs scan, reported as evidence rather than a formal test):
    // 3 unrolled rounds per event type — flag the day furthest from
    // the CURRENT mean, remove it, re-estimate, repeat — so a second
    // outlier can't mask behind a first (the failure mode of the
    // single-pass q_anomaly_mad z-scan, which this complements).
    // Day-grain throughout; each round is one moment aggregate + one
    // deterministic argmax (z ranked on doubles computed from exact
    // integer moments in identical text, days tie-break); the
    // 3-round unroll is a fixed plan, no driver loop.
    "q_esd_outliers" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
        .groupBy(col("event_type"), col("day")).agg(sum(col("vc")).as("s"))
        .ckpt()
      def round1(df: DataFrame, idx: Int): (DataFrame, DataFrame) = {
        val st = df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"), sum(expr("s * s")).as("ssq"))
        val z = df.join(st, Seq("event_type"))
          .withColumn("zval", expr(
            """abs(CAST(s AS DOUBLE) - CAST(ss AS DOUBLE) / n)
              | / sqrt((CAST(n AS DOUBLE) * ssq - CAST(ss AS DOUBLE) * ss)
              |        / (CAST(n AS DOUBLE) * (n - 1)))""".stripMargin))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("zval").desc, col("day"))))
        val hit = z.filter(col("rn") === 1)
          .select(col("event_type"), lit(idx.toLong).as("round"), col("day"),
            col("s").as("value_c"), round(col("zval"), 4).as("z"))
        val rest = z.filter(col("rn") =!= 1).select(col("event_type"), col("day"), col("s"))
        (hit, rest)
      }
      val (h1, r1) = round1(daily, 1)
      val (h2, r2) = round1(r1, 2)
      val (h3, _) = round1(r2, 3)
      h1.unionAll(h2).unionAll(h3).orderBy(col("event_type"), col("round"))
    }),

    // OFFLINE POLICY REPLAY (Li et al. 2011's replay estimator,
    // uniform-logging special case) — evaluate "per user-context,
    // always show the best arm" WITHOUT an online test: the
    // estimator keeps exactly the logged impressions whose arm
    // matches the policy's choice and averages their rewards.
    // Impressions are views of an item (arm = item % 10), reward is
    // a same-user same-item click within 30 min (a user-keyed join +
    // impression-id distinct, so multi-click users reward once and
    // the plan never widens past the user grain), context is the
    // user hash tier. Per-(context, arm) rates are exact micro; the
    // policy argmax ranks exact integers (ties to the lower arm);
    // output is one row per context — replay estimate vs the
    // logged-baseline rate, both exact.
    "q_policy_replay" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val imp = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("vid"),
          expr("unix_micros(ts)").as("vus"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("item"))
        .withColumn("arm", col("item") % 10)
        .withColumn("ctx", col("user_id") % 3)
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"),
          expr("unix_micros(ts)").as("cus"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("item"))
      // windowed reward: join then distinct on the impression id so a
      // multi-click (user, item) still rewards the impression once
      val rew = imp.join(clk, Seq("user_id", "item"))
        .filter(col("cus") > col("vus") && col("cus") <= col("vus") + lit(1800000000L))
        .select(col("vid")).distinct().withColumn("r", lit(1L))
      val scored = imp.join(rew, Seq("vid"), "left")
        .na.fill(0L, Seq("r"))
      val cells = scored.groupBy(col("ctx"), col("arm"))
        .agg(count(lit(1)).as("n_imp"), sum(col("r")).as("n_rew"))
        .withColumn("rate_micro", expr("(n_rew * 1000000) DIV n_imp"))
      val best = cells.withColumn("rn", row_number().over(
          Window.partitionBy(col("ctx")).orderBy(col("rate_micro").desc, col("arm"))))
        .filter(col("rn") === 1)
        .select(col("ctx"), col("arm").as("best_arm"), col("n_imp").as("n_matched"),
          col("rate_micro").as("replay_micro"))
      val base = scored.groupBy(col("ctx"))
        .agg(count(lit(1)).as("n_all"), sum(col("r")).as("r_all"))
        .withColumn("baseline_micro", expr("(r_all * 1000000) DIV n_all"))
        .select(col("ctx"), col("n_all"), col("baseline_micro"))
      best.join(base, Seq("ctx")).orderBy(col("ctx"))
    }),

    // DYNAMIC TIME WARPING distance (Sakoe & Chiba 1978) between the
    // click and view daily series — the NONLINEAR alignment partner
    // of q_crosscorr (which only tests rigid lags): DTW charges
    // |x_i − y_j| along the cheapest monotone warp path, so a
    // campaign whose response stretches or compresses in time still
    // scores close. Implementation is the anti-diagonal WAVEFRONT
    // form of the DP: cells on diagonal k depend only on diagonals
    // k−1/k−2, so the whole recurrence is ONE declarative
    // aggregate(sequence(3, n+m), …) fold whose state is the last two
    // diagonals — no driver loop, no UDF; Catalyst sees a single
    // codegen'd expression (and DuckDB replays the identical fold via
    // list_reduce). Scale shape: the corpus collapses to the
    // DAY-grain series first (per-row exact cents BEFORE the sum —
    // the q_mann_kendall calendar-bounded posture); the O(n·m) DP
    // then runs on one calendar-scale row, never touching corpus
    // data. All arithmetic is exact BIGINT (costs are cents,
    // out-of-range cells carry a 2^60 sentinel that least() discards)
    // — zero float until the final normalized report.
    "q_dtw" -> ((s, d) => {
      val cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
      val ev = Tables.events(s, d).select(
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr(s"CASE WHEN event_type = 'click' THEN $cents ELSE 0L END").as("xc"),
        expr(s"CASE WHEN event_type = 'view' THEN $cents ELSE 0L END").as("yc"))
      val dly = ev.groupBy(col("day")).agg(sum(col("xc")).as("xv"), sum(col("yc")).as("yv"))
      val b = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val sp = b.select(explode(expr("sequence(lo, hi)")).as("day"))
      val f = sp.join(dly, Seq("day"), "left").na.fill(0L, Seq("xv", "yv"))
      val INF = "1152921504606846976"
      f.agg(
          expr("transform(sort_array(collect_list(struct(day, xv))), p -> p.xv)").as("x"),
          expr("transform(sort_array(collect_list(struct(day, yv))), p -> p.yv)").as("y"))
        .select(col("x"), col("y"), expr("size(x)").as("n"), expr("size(y)").as("m"))
        .withColumn("dtw_cents", expr(
          s"""aggregate(
             |  sequence(3, n + m),
             |  named_struct(
             |    'd1', transform(sequence(1, n), i ->
             |      CASE WHEN i = 1 THEN abs(element_at(x, 1) - element_at(y, 1))
             |           ELSE $INF END),
             |    'd2', transform(sequence(1, n), i -> $INF)),
             |  (st, k) -> named_struct(
             |    'd1', transform(sequence(1, n), i ->
             |      CASE WHEN k - i >= 1 AND k - i <= m THEN
             |        abs(element_at(x, i) - element_at(y, k - i)) + least(
             |          CASE WHEN i > 1 THEN element_at(st.d1, i - 1) ELSE $INF END,
             |          element_at(st.d1, i),
             |          CASE WHEN i > 1 THEN element_at(st.d2, i - 1) ELSE $INF END)
             |      ELSE $INF END),
             |    'd2', st.d1),
             |  st -> element_at(st.d1, n))""".stripMargin))
        .select(expr("CAST(n AS BIGINT)").as("n"), expr("CAST(m AS BIGINT)").as("m"),
          col("dtw_cents"),
          round(expr("CAST(dtw_cents AS DOUBLE) / (n + m) / 100.0"), 4).as("dtw_norm"))
    }),

    // POST-STRATIFIED treatment effect (Neyman 1923 via the modern
    // post-stratification estimator) — the observational-causal
    // partner of q_abtest/q_cuped: when assignment correlates with an
    // activity covariate, the raw arm difference is confounded;
    // stratifying on the covariate and size-weighting the per-stratum
    // differences removes the bias the strata capture. Strata are
    // fixed activity bands of the per-user event count (map-only CASE
    // — at 100 TB the quantile-cutpoint form would use the
    // q_mixture_approx sketch posture, never a global ntile sort).
    // Per-user spend folds to exact cents BEFORE any aggregate; per-
    // (stratum, arm) moments are exact BIGINTs; means are truncating
    // milli divs; the stratum weight is an exact micro ratio. No
    // floats anywhere.
    "q_stratified_ate" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("spend_c"))
        .select(col("spend_c"),
          expr("least(greatest((n_ev - 40) DIV 15, 0L), 3L)").as("stratum"),
          (col("user_id") % 2).as("t"))
      val cell = users.groupBy(col("stratum"))
        .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("t") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("t") === 1, col("spend_c")).otherwise(0L)).as("s1"),
          sum(when(col("t") === 0, col("spend_c")).otherwise(0L)).as("s0"))
      val tot = users.agg(count(lit(1)).as("nu"))
      cell.crossJoin(broadcast(tot))
        .select(col("stratum"), col("n1"), col("n0"),
          expr("CASE WHEN n1 > 0 THEN (s1 * 10) DIV n1 END").as("m1_milli"),
          expr("CASE WHEN n0 > 0 THEN (s0 * 10) DIV n0 END").as("m0_milli"),
          expr("CASE WHEN n1 > 0 AND n0 > 0 THEN (s1 * 10) DIV n1 - (s0 * 10) DIV n0 END")
            .as("diff_milli"),
          expr("((n1 + n0) * 1000000) DIV nu").as("w_micro"))
        .orderBy(col("stratum"))
    }),

    // GROUP-SEQUENTIAL monitoring (Pocock 1977) — the "peeking
    // problem" fix that completes the experimentation bank (q_ab_srm
    // gates assignment, q_mde sizes the test, q_abtest/q_cuped read it
    // out once, q_bootstrap CIs it; THIS is how you look 5 times
    // without inflating α): the series splits into K = 5 equal
    // calendar looks, each look tests the CUMULATIVE arm difference,
    // and every look compares against the constant Pocock boundary
    // z² = 2.413² (α = 0.05 two-sided, K = 5). Per-(look, arm) exact
    // BIGINT moments in one aggregate; cumulative sums via a window
    // over the 10-cell frame; the z² final is DOUBLE over exact
    // integers in identical text (the q_abtest precedent), rounded to
    // 4.
    "q_group_sequential" -> ((s, d) => {
      val bounds = Tables.events(s, d)
        .agg(min(expr("unix_micros(ts) DIV 3600000000")).as("lo"),
          max(expr("unix_micros(ts) DIV 3600000000")).as("hi"))
      val cells = Tables.events(s, d)
        .crossJoin(broadcast(bounds))
        .select(expr("((unix_micros(ts) DIV 3600000000 - lo) * 5) DIV (hi - lo + 1)").as("look"),
          (col("user_id") % 2).as("arm"),
          expr("CAST(floor(value * 10 + 0.5) AS BIGINT)").as("vd"))
        .groupBy(col("look"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"), sum(expr("vd * vd")).as("ss"))
      val w = Window.partitionBy(col("arm")).orderBy(col("look"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cs", sum(col("s")).over(w))
        .withColumn("css", sum(col("ss")).over(w))
      val a0 = cum.filter(col("arm") === 0)
        .select(col("look"), col("cn").as("n0"), col("cs").as("s0"), col("css").as("ss0"))
      val a1 = cum.filter(col("arm") === 1)
        .select(col("look"), col("cn").as("n1"), col("cs").as("s1"), col("css").as("ss1"))
      a0.join(a1, Seq("look"))
        .withColumn("z2", expr(
          """(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
            | * (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
            | / ((CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0) / (CAST(n0 AS DOUBLE) * (n0 - 1)) / n0
            |  + (CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1) / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1)""".stripMargin))
        .select(col("look"), col("n0"), col("n1"),
          round(col("z2"), 4).as("z2"),
          expr("z2 > 5.822569").as("crossed"))
        .orderBy(col("look"))
    }),

    // HILL tail-index estimator (Hill 1975) over the pooled value
    // distribution — the power-law partner of q_gumbel_tail: Gumbel
    // models light-tailed maxima, the Hill α says whether the tail is
    // heavy AT ALL (α ≤ 2 ⇒ infinite variance, α ≤ 1 ⇒ infinite
    // mean — the regime where means/provisioning math silently stop
    // working). α̂⁻¹ = (1/k)·Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top
    // k = 200 order statistics: a TakeOrdered heap (never a full
    // sort), the threshold row contributing ln(1) = 0 so the sum runs
    // over all 201 selected rows with no exclusion logic; ties at the
    // boundary pick a deterministic value-multiset either way. Each
    // log ratio quantizes to exact integer micro (the q_lm_score
    // recipe) before summing.
    "q_hill_tail" -> ((s, d) => {
      val top = Tables.events(s, d)
        .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .filter(col("vm") >= 1)
        .orderBy(col("vm").desc)
        .limit(201)
        .ckpt() // threshold + log-sum share the heap result
      val thr = top.agg(min(col("vm")).as("thr"))
      top.crossJoin(broadcast(thr))
        .select(col("thr"), expr(
          "CAST(floor(ln(CAST(vm AS DOUBLE) / thr) * 1000000 + 0.5) AS BIGINT)").as("lr_micro"))
        .groupBy(col("thr"))
        .agg(count(lit(1)).as("n_sel"), sum(col("lr_micro")).as("sum_lr_micro"))
        .withColumn("k", col("n_sel") - 1)
        .withColumn("alpha_micro", expr(
          "CASE WHEN sum_lr_micro > 0 THEN (k * 1000000000000) DIV sum_lr_micro ELSE 0 END"))
        .select(col("k"), col("thr"), col("sum_lr_micro"), col("alpha_micro"))
    }),

    // ONLINE-BANDIT REPLAY — the SEQUENTIAL complement of
    // q_policy_replay's static argmax: a deterministic epsilon-greedy
    // policy (explore every 7th matched step, round-robin over the
    // arm catalog; otherwise exploit the argmax of the exact
    // truncated mean reward, untried arms first, ties to the lower
    // arm name) replayed over each context's logged impressions in
    // timestamp order, with state updated ONLY on policy/log
    // agreement (Li et al. 2011's replay rule — agreement under
    // uniform logging is an unbiased draw of the chosen arm).
    // The fold is inherently order-dependent, so it runs as a typed
    // per-group SORTED fold: groupByKey(ctx).flatMapSortedGroups(ts,
    // event_id) — Spark sorts each group WITHIN the shuffle (secondary
    // sort, no per-group materialization before the iterator) and the
    // fold streams it with O(|arms|) state. All arithmetic is exact
    // BIGINT (rewards on the milli grid, means by truncating
    // division), so the trajectory is replayable row for row.
    //
    // Scale posture: contexts are the parallelism grain — the shuffle
    // carries (ctx, arm-name, BIGINT×3) rows and each task streams one
    // sorted context partition with constant state; nothing is ever
    // collected. A single pathologically hot context serializes into
    // one task by the nature of a sequential policy (time-sharding
    // the context key is the standard mitigation and changes the
    // estimator, so it stays out of the default).
    "q_bandit_replay" -> ((s, d) => {
      import s.implicits._
      val arms = Seq("click", "error", "purchase", "signup", "view")
      val ev = Tables.events(s, d).select(
          (col("user_id") % 16).as("ctx"),
          col("event_type"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"),
          col("ts"), col("event_id"))
        .as[(Long, String, Long, java.sql.Timestamp, Long)]
      ev.groupByKey(_._1)
        .flatMapSortedGroups(col("ts"), col("event_id")) { (ctx, it) =>
          val pulls = Array.fill(arms.length)(0L)
          val rew = Array.fill(arms.length)(0L)
          var matched = 0L
          var n = 0L
          it.foreach { case (_, et, vm, _, _) =>
            n += 1
            val chosen =
              if (matched % 7 == 0) ((matched / 7) % arms.length).toInt
              else {
                var best = 0
                var bestScore = -1L
                var i = 0
                while (i < arms.length) {
                  val sc = if (pulls(i) == 0) 1000000000L else rew(i) / pulls(i)
                  if (sc > bestScore) { best = i; bestScore = sc }
                  i += 1
                }
                best
              }
            if (et == arms(chosen)) {
              matched += 1; pulls(chosen) += 1; rew(chosen) += vm
            }
          }
          arms.indices.map(i => (ctx, arms(i), pulls(i), rew(i), n, matched))
        }
        .toDF("ctx", "arm", "pulls", "rew_milli", "n_events", "n_matched")
        .orderBy(col("ctx"), col("arm"))
    }),

    // UPLIFT / QINI curve (Radcliffe 2007) — the targeting readout the
    // causal bank was missing: rank users by a responsiveness score
    // (here the per-user click count, a deterministic proxy for a
    // model score), cut into deciles, and per decile report the
    // treated-minus-control response difference plus the cumulative
    // Qini statistic Q(k) = ΣR₁ − ΣR₀·(ΣN₁/ΣN₀) — the area under
    // which is the standard uplift-model quality number. Treatment is
    // the q_cuped/q_abtest arm convention (user_id % 2); outcome is
    // purchase spend in exact cents.
    //
    // Scale posture: the global score rank is built WITHOUT a global
    // sort — the q_spearman trick: a score-grain cumulative-count
    // window (score cardinality is bounded — per-user click counts)
    // plus a per-score row_number partitioned window gives every user
    // an exact dense rank in parallel; deciles are exact rank cuts
    // against the broadcast 1-row total. The decile rollup and its
    // cumulative window run on 10 rows. All integer: truncating DIV
    // only on non-negative numerators.
    "q_uplift_curve" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("score"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("out_c"))
        .withColumn("t", col("user_id") % 2)
      val sc = users.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
      val cum = sc.withColumn("bef", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = users.agg(count(lit(1)).as("nu"))
      val ranked = users.join(cum.select(col("score"), col("bef")), "score")
        .withColumn("rn", col("bef") +
          row_number().over(Window.partitionBy(col("score")).orderBy(col("user_id"))))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("((rn - 1) * 10) DIV nu"))
      val dec = ranked.groupBy(col("decile"))
        .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("t") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("t") === 1, col("out_c")).otherwise(0L)).as("r1"),
          sum(when(col("t") === 0, col("out_c")).otherwise(0L)).as("r0"))
      val wd = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec
        .withColumn("cn1", sum(col("n1")).over(wd))
        .withColumn("cn0", sum(col("n0")).over(wd))
        .withColumn("cr1", sum(col("r1")).over(wd))
        .withColumn("cr0", sum(col("r0")).over(wd))
        .select(col("decile"), col("n1"), col("n0"), col("r1"), col("r0"),
          expr("""CASE WHEN n1 > 0 AND n0 > 0
                 |  THEN (r1 * 1000) DIV n1 - (r0 * 1000) DIV n0 END""".stripMargin)
            .as("uplift_milli"),
          expr("CASE WHEN cn0 > 0 THEN cr1 - (cr0 * cn1) DIV cn0 END").as("qini_c"))
        .orderBy(col("decile"))
    }),

    // BENJAMINI-HOCHBERG step-up FDR control (Benjamini & Hochberg
    // 1995) over the per-arm mean-shift family — the multiple-testing
    // layer every per-segment drift dashboard needs: m one-sample z²
    // tests ("does this arm's mean value differ from the corpus
    // mean"), ranked by evidence, compared against the χ²₁ critical
    // ladder for α·k/m (α = 0.05, m = 5, inverse quantiles
    // pre-evaluated as literals so no CDF is ever inverted on-engine),
    // and the step-up rule rejects every rank ≤ the LARGEST passing
    // rank — strictly more powerful than Bonferroni on the same
    // family. z² comes from exact BIGINT moments (n, Σv, Σv²); the
    // float finals run on the k-row arm frame in identical expression
    // text both engines. The rank window and the max-passing-rank
    // aggregate run at ARM grain (k rows, localCheckpoint'd) — corpus
    // work is one map-side-combined groupBy.
    "q_bh_fdr" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"), sum(col("vm")).as("s1"),
          sum(expr("vm * vm")).as("s2"))
      val tot = cells.agg(sum(col("n_g")).as("n"), sum(col("s1")).as("gs1"),
        sum(col("s2")).as("gs2"))
      val th = cells.crossJoin(broadcast(tot))
        .withColumn("z2", expr(
          """CAST(n_g AS DOUBLE) * (CAST(s1 AS DOUBLE) / n_g - CAST(gs1 AS DOUBLE) / n)
            | * (CAST(s1 AS DOUBLE) / n_g - CAST(gs1 AS DOUBLE) / n)
            | / ((CAST(gs2 AS DOUBLE) - CAST(gs1 AS DOUBLE) * gs1 / n) / (n - 1))""".stripMargin))
        .withColumn("k",
          row_number().over(Window.orderBy(col("z2").desc, col("event_type"))).cast("long"))
        .withColumn("thr", expr(
          "element_at(array(6.634897D, 5.411894D, 4.709292D, 4.217885D, 3.841459D), CAST(k AS INT))"))
        .ckpt() // arm-grain; rank table + step-up census share it
      val km = th.agg(coalesce(max(when(col("z2") >= col("thr"), col("k"))), lit(0L)).as("k_pass"))
      th.crossJoin(broadcast(km))
        .select(col("event_type"), col("n_g"), col("k"), round(col("z2"), 6).as("z2"),
          col("thr"), (col("k") <= col("k_pass")).as("bh_reject"))
        .orderBy(col("k"))
    }),

    // WILCOXON SIGNED-RANK (Wilcoxon 1945) on the per-user
    // click-minus-view paired spend difference — the paired complement
    // of q_mann_whitney: no normality assumed, zeros dropped per the
    // textbook procedure, |d| ranked with average ties in DOUBLED
    // units (r2 = 2·below + t + 1, the q_spearman discipline) so no
    // half ever appears; W⁺/W⁻ are reported in those doubled units
    // (w2_pos + w2_neg ≡ n(n+1) — the identity is the self-check).
    // The normal-approximation z² = 3A²/(2B−T) with A = 2·w2_pos −
    // n(n+1), B = n(n+1)(2n+1), T = Σ(t³−t) is the only float, on the
    // 1-row final in identical expression text. Rank construction is
    // the distinct-|d|-grain prefix sum — two hash aggregates and a
    // bounded window, never a corpus sort.
    "q_wilcoxon_signed" -> ((s, d) => {
      val diffs = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "click",
            expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")).otherwise(0L))
          - sum(when(col("event_type") === "view",
            expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")).otherwise(0L))).as("dd"))
        .filter(col("dd") =!= 0)
        .select(expr("abs(dd)").as("ad"),
          expr("CASE WHEN dd > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("pos"))
      val cells = diffs.groupBy(col("ad"))
        .agg(count(lit(1)).as("t"), sum(col("pos")).as("tp"))
      val below = Window.orderBy(col("ad")).rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("below", coalesce(sum(col("t")).over(below), lit(0L)))
        .withColumn("r2", expr("2 * below + t + 1"))
        .agg(sum(expr("tp * r2")).as("w2_pos"),
          sum(expr("(t - tp) * r2")).as("w2_neg"),
          sum(col("t")).as("n"),
          sum(expr("t * t * t - t")).as("ties_t"))
        .withColumn("a", expr("2 * w2_pos - n * (n + 1)"))
        .select(col("n"), col("w2_pos"), col("w2_neg"), col("ties_t"), col("a"),
          round(expr(
            """CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - ties_t > 0
              | THEN 3.0 * CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
              |      / (2.0 * n * (n + 1) * (2 * n + 1) - ties_t) END""".stripMargin), 6).as("z2"))
    }),

    // BROWN-FORSYTHE / LEVENE variance-homogeneity test (Brown &
    // Forsythe 1974, the median-centered robust form) across the
    // event-type arms — the missing companion gate to q_anova /
    // q_kruskal_wallis: those test location, this tests SPREAD, and a
    // drift alarm on dispersion catches distribution widening that a
    // mean test misses. Per-arm exact lower median at distinct-value
    // grain (cum-count prefix window, ⌈n/2⌉ rank cut — never a sort),
    // then one-way ANOVA F on the exact |x − med| deviations: all
    // moments exact BIGINT at census grain, the F final on the k-row
    // frame in DOUBLE with identical expression text; critical value
    // F(4, ∞) = 2.3719 pre-evaluated as a literal.
    "q_levene" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .agg(count(lit(1)).as("c"))
        .ckpt() // median cut + deviation moments share the census
      val below = Window.partitionBy(col("event_type")).orderBy(col("vm"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = cells.withColumn("below", coalesce(sum(col("c")).over(below), lit(0L)))
      val ng = cells.groupBy(col("event_type")).agg(sum(col("c")).as("n_g"))
      val med = cum.join(broadcast(ng), "event_type")
        .filter(expr("below + c >= (n_g + 1) DIV 2"))
        .groupBy(col("event_type")).agg(min(col("vm")).as("med"))
      cells.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(sum(expr("c * abs(vm - med)")).as("s1"),
          sum(expr("c * abs(vm - med) * abs(vm - med)")).as("s2"),
          sum(col("c")).as("n_g"))
        .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
          sum(col("s1")).as("gs1"), sum(col("s2")).as("gs2"),
          sum(expr("CAST(s1 AS DOUBLE) * s1 / n_g")).as("qa"))
        .select(col("n"), col("k"),
          round(expr(
            """((qa - CAST(gs1 AS DOUBLE) * gs1 / n) / (k - 1))
              | / ((CAST(gs2 AS DOUBLE) - qa) / (n - k))""".stripMargin), 6).as("f_bf"),
          expr(
            """((qa - CAST(gs1 AS DOUBLE) * gs1 / n) / (k - 1))
              | / ((CAST(gs2 AS DOUBLE) - qa) / (n - k)) > 2.3719""".stripMargin).as("reject_05"))
    }),

    // Q-Q DECILE POINTS between the click and view value
    // distributions — the distribution-drift READOUT behind q_ks_test's
    // single number: nine exact type-1 decile pairs (q_click, q_view),
    // whose departure from the diagonal localizes WHERE two
    // distributions diverge. Exact quantiles by rank cut: per-arm
    // distinct-value census + cumulative prefix window, target rank
    // ⌈p·n/10⌉ = (p·n + 9) DIV 10, quantile = min value whose
    // cumulative count reaches it — the q_quantile_exact discipline,
    // never a corpus sort. The 18-row (arm × decile) target grid
    // broadcasts; all arithmetic exact BIGINT on the milli grid.
    "q_qq_points" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("arm"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .groupBy(col("arm"), col("vm"))
        .agg(count(lit(1)).as("c"))
        .ckpt() // census feeds the arm totals and the rank cut
      val below = Window.partitionBy(col("arm")).orderBy(col("vm"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = cells.withColumn("below", coalesce(sum(col("c")).over(below), lit(0L)))
      val ng = cells.groupBy(col("arm")).agg(sum(col("c")).as("n_arm"))
      val grid = s.range(1, 10).select(col("id").as("p"))
      val tgt = ng.crossJoin(grid).withColumn("target", expr("(p * n_arm + 9) DIV 10"))
      cum.join(broadcast(tgt), "arm")
        .filter(expr("below + c >= target"))
        .groupBy(col("p"), col("arm")).agg(min(col("vm")).as("q"))
        .groupBy(col("p"))
        .agg(max(when(col("arm") === "click", col("q"))).as("q_click_milli"),
          max(when(col("arm") === "view", col("q"))).as("q_view_milli"))
        .withColumn("gap_milli", expr("q_click_milli - q_view_milli"))
        .orderBy(col("p"))
    }),

    // PARTIAL CORRELATION r_xy·z (Yule 1907) — does click volume
    // correlate with view volume per user AFTER controlling for spend?
    // The first-order recursion r_xy·z = (r_xy − r_xz·r_yz) /
    // √((1−r_xz²)(1−r_yz²)) over three Pearson correlations on exact
    // per-user BIGINT features. The corpus work is ONE map-side-
    // combined groupBy + one corr aggregate pass (Spark's corr is a
    // single-pass co-moment merge); the recursion runs on the 1-row
    // final. round(4) absorbs the merge-order float noise (the
    // q_spearman precedent — inputs are exact integers, noise is
    // orders below the grain).
    "q_partial_corr" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("z"))
        .agg(count(lit(1)).as("n"),
          corr(col("x"), col("y")).as("rxy"),
          corr(col("x"), col("z")).as("rxz"),
          corr(col("y"), col("z")).as("ryz"))
        .select(col("n"),
          round(col("rxy"), 4).as("r_xy"),
          round(col("rxz"), 4).as("r_xz"),
          round(col("ryz"), 4).as("r_yz"),
          round(expr("(rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz))"), 4)
            .as("r_xy_z"))
    }),

    // BOLLINGER BANDS (Bollinger 1983) over the daily click-volume
    // series — the rolling volatility envelope behind every "is today
    // anomalous vs its own recent regime" monitor: trailing-14-day
    // mean ± 2σ, breakout = the day escaping its own band. The corpus
    // collapses to DAY grain first (one map-side-combined groupBy);
    // the rolling window runs over the bounded day table — never a
    // corpus-sized frame. Counts stay exact BIGINT; the band floats
    // round(4) and the breakout flags compare against the ROUNDED
    // band so both engines test the identical number. Days without a
    // full 14-day history are excluded (the textbook warm-up rule).
    "q_bollinger" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
      val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
      days
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("mu", round(avg(col("x")).over(w), 4))
        .withColumn("sd", round(stddev_samp(col("x")).over(w), 4))
        .filter(col("n_win") === 14)
        .select(col("day"), col("x"), col("mu"), col("sd"),
          round(expr("mu + 2 * sd"), 4).as("hi"),
          round(expr("mu - 2 * sd"), 4).as("lo"),
          expr("CAST(x AS DOUBLE) > round(mu + 2 * sd, 4)").as("breakout_hi"),
          expr("CAST(x AS DOUBLE) < round(mu - 2 * sd, 4)").as("breakout_lo"))
        .orderBy(col("day"))
    }),

    // RSI-14 (Wilder 1978, the SMA form) over the daily purchase-spend
    // series — the bounded momentum oscillator, and unlike the float
    // textbook version this one is EXACT: RSI = 100·ΣG/(ΣG+ΣL) over
    // the trailing 14 day-over-day deltas, all BIGINT cents, reported
    // on the milli grid by truncating division (non-negative, so DIV
    // and // agree). Day grain throughout: one corpus groupBy, then
    // lag + two rolling sums over the bounded day table.
    "q_rsi" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("spend_c"))
      val wl = Window.orderBy(col("day"))
      val w14 = Window.orderBy(col("day")).rowsBetween(-13, 0)
      days
        .withColumn("delta", col("spend_c") - lag(col("spend_c"), 1).over(wl))
        .filter(col("delta").isNotNull)
        .withColumn("gain", expr("CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS BIGINT) END"))
        .withColumn("loss", expr("CASE WHEN delta < 0 THEN -delta ELSE CAST(0 AS BIGINT) END"))
        .withColumn("n_win", count(lit(1)).over(w14))
        .withColumn("sg", sum(col("gain")).over(w14))
        .withColumn("sl", sum(col("loss")).over(w14))
        .filter(col("n_win") === 14)
        .select(col("day"), col("spend_c"), col("sg"), col("sl"),
          expr("CASE WHEN sg + sl > 0 THEN (100000 * sg) DIV (sg + sl) END").as("rsi_milli"))
        .orderBy(col("day"))
    }),

    // PACF to lag 3 via the Durbin-Levinson recursion (Durbin 1960) on
    // the daily click series — the AR-order diagnostic q_ar_fit reads
    // by eye: φ11, φ22, φ33 decide whether one, two, or three AR lags
    // earn their place. The ACF inputs are EXACT integer ratios — the
    // mean never divides: with w_t = n·x_t − Σx, ρ_k = Σ w_t·w_{t−k} /
    // Σ w_t² cancels the 1/n² exactly, so both engines consume
    // identical BIGINT numerators/denominators; the recursion itself
    // runs on the 1-row final in DOUBLE with identical expression
    // text. Day grain: one corpus groupBy, three lag columns over the
    // bounded day table, one aggregate.
    "q_pacf" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
      val n1 = days.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val wl = Window.orderBy(col("day"))
      val moments = days.crossJoin(broadcast(n1))
        .withColumn("w", expr("n * x - sx"))
        .withColumn("w1", lag(col("w"), 1).over(wl))
        .withColumn("w2", lag(col("w"), 2).over(wl))
        .withColumn("w3", lag(col("w"), 3).over(wl))
        .agg(max(col("n")).as("n"),
          sum(expr("w * w")).as("c0"),
          sum(expr("CASE WHEN w1 IS NOT NULL THEN w * w1 ELSE CAST(0 AS BIGINT) END")).as("c1"),
          sum(expr("CASE WHEN w2 IS NOT NULL THEN w * w2 ELSE CAST(0 AS BIGINT) END")).as("c2"),
          sum(expr("CASE WHEN w3 IS NOT NULL THEN w * w3 ELSE CAST(0 AS BIGINT) END")).as("c3"))
      moments.select(col("n"),
          expr("CAST(c1 AS DOUBLE) / c0").as("rho1"),
          expr("CAST(c2 AS DOUBLE) / c0").as("rho2"),
          expr("CAST(c3 AS DOUBLE) / c0").as("rho3"))
        .withColumn("p22", expr("(rho2 - rho1 * rho1) / (1 - rho1 * rho1)"))
        .withColumn("p21", expr("rho1 * (1 - (rho2 - rho1 * rho1) / (1 - rho1 * rho1))"))
        .select(col("n"),
          round(col("rho1"), 6).as("rho1"), round(col("rho2"), 6).as("rho2"),
          round(col("rho3"), 6).as("rho3"),
          round(col("rho1"), 6).as("pacf1"),
          round(col("p22"), 6).as("pacf2"),
          round(expr("(rho3 - p21 * rho2 - p22 * rho1) / (1 - p21 * rho1 - p22 * rho2)"), 6)
            .as("pacf3"))
    }),

    // GRANGER CAUSALITY (Granger 1969), 1 lag, day grain — "do
    // yesterday's clicks help predict today's purchases beyond
    // yesterday's purchases": the nested-OLS F test comparing RSS of
    // y_t ~ y_{t−1} against y_t ~ y_{t−1} + x_{t−1}, both solved in
    // closed form (Cramer 2×2) from exact BIGINT raw moments over the
    // lag-complete day subset. The float algebra runs once, on the
    // 1-row moment final, in identical expression text; critical value
    // F(1, ∞) = 3.8415 pre-evaluated. Day grain: one corpus groupBy,
    // two lag columns, one moment aggregate.
    "q_granger" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xs"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ys"))
      val wl = Window.orderBy(col("day"))
      val rows = days
        .withColumn("y1", lag(col("ys"), 1).over(wl))
        .withColumn("x1", lag(col("xs"), 1).over(wl))
        .filter(col("y1").isNotNull && col("x1").isNotNull)
      val m = rows.agg(count(lit(1)).as("n"),
        sum(col("ys")).as("sy"), sum(col("y1")).as("sy1"), sum(col("x1")).as("sx1"),
        sum(expr("ys * ys")).as("syy"), sum(expr("y1 * y1")).as("sy1y1"),
        sum(expr("x1 * x1")).as("sx1x1"), sum(expr("ys * y1")).as("syy1"),
        sum(expr("ys * x1")).as("syx1"), sum(expr("y1 * x1")).as("sy1x1"))
      m.select(col("n"),
          expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n").as("cyy"),
          expr("CAST(sy1y1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sy1 / n").as("cy1y1"),
          expr("CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n").as("cx1x1"),
          expr("CAST(syy1 AS DOUBLE) - CAST(sy AS DOUBLE) * sy1 / n").as("cyy1"),
          expr("CAST(syx1 AS DOUBLE) - CAST(sy AS DOUBLE) * sx1 / n").as("cyx1"),
          expr("CAST(sy1x1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sx1 / n").as("cy1x1"))
        .withColumn("rss_r", expr("cyy - cyy1 * cyy1 / cy1y1"))
        .withColumn("det", expr("cy1y1 * cx1x1 - cy1x1 * cy1x1"))
        .withColumn("b", expr("(cyy1 * cx1x1 - cyx1 * cy1x1) / det"))
        .withColumn("c", expr("(cyx1 * cy1y1 - cyy1 * cy1x1) / det"))
        .withColumn("rss_u", expr("cyy - b * cyy1 - c * cyx1"))
        .select(col("n"),
          round(col("rss_r"), 4).as("rss_r"), round(col("rss_u"), 4).as("rss_u"),
          round(expr("(rss_r - rss_u) * (n - 3) / rss_u"), 6).as("f_stat"),
          expr("(rss_r - rss_u) * (n - 3) / rss_u > 3.8415").as("reject_05"))
    }),

    // INTER-ARRIVAL gap distribution — the traffic-model readout
    // behind every capacity plan and sessionization threshold (the
    // 900 s cut q_session_stats hardcodes should be read off THIS
    // table): per-user consecutive-event gaps in exact seconds, then
    // p50/p90/p99 as exact type-1 quantiles by rank cut over the
    // distinct-gap census (the q_qq_points discipline — cumulative
    // prefix window over the bounded census, target ⌈p·n/100⌉, never
    // a corpus sort), plus the exact integer mean. The only
    // corpus-grain window is the per-user lag at (user, event) grain
    // — the q_session_stats posture.
    "q_interarrival" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(expr("(us - prev) DIV 1000000").as("gap_s"))
      val census = gaps.groupBy(col("gap_s")).agg(count(lit(1)).as("c"))
        .ckpt() // totals + rank cut share it
      val tot = census.agg(sum(col("c")).as("n"), sum(expr("gap_s * c")).as("sum_s"))
      val below = Window.orderBy(col("gap_s")).rowsBetween(Window.unboundedPreceding, -1)
      val cum = census.withColumn("below", coalesce(sum(col("c")).over(below), lit(0L)))
      val grid = Seq(50L, 90L, 99L).map(p => s"($p)").mkString(", ")
      val ps = s.sql(s"SELECT * FROM VALUES $grid AS t(p)")
      cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ps))
        .filter(expr("below + c >= (p * n + 99) DIV 100"))
        .groupBy(col("p"))
        .agg(min(col("gap_s")).as("q_gap_sec"), max(col("n")).as("n"),
          max(expr("sum_s DIV n")).as("mean_gap_sec"))
        .orderBy(col("p"))
    }),

    // OLS RESIDUAL DIAGNOSTICS — R² and the Durbin-Watson serial-
    // correlation statistic for the daily purchase trend (the checks
    // q_linear_fit's slope ships without: is the fit explaining
    // anything, and are the errors independent — a DW far from 2 says
    // the trend model is missing structure). Closed-form slope from
    // exact BIGINT day-grain moments; residuals are evaluated in
    // identical expression text and IMMEDIATELY quantized to integer
    // milli (the q_lm_score recipe; milli keeps the DW numerator's
    // ×10⁶ rescale inside BIGINT), so RSS/TSS/DW are exact integer
    // sums — order-free — and DW lands on the micro grid by truncating
    // division (both numerator and denominator non-negative).
    "q_resid_diag" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        .ckpt() // moments + residual scan share it
      val m = days.agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
        sum(col("y")).as("sy"), sum(expr("day * day")).as("sxx"),
        sum(expr("day * y")).as("sxy"), sum(expr("y * y")).as("syy"))
      val eq = days.crossJoin(broadcast(m))
        .withColumn("b", expr(
          "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"))
        .withColumn("a", expr("CAST(sy AS DOUBLE) / n - b * (CAST(sx AS DOUBLE) / n)"))
        .withColumn("eq", expr(
          "CAST(floor((y - a - b * day) * 1000 + 0.5) AS BIGINT)"))
        .withColumn("eprev", lag(col("eq"), 1).over(Window.orderBy(col("day"))))
      eq.agg(max(col("n")).as("n"),
          sum(expr("eq * eq")).as("rss_sq"),
          sum(expr("CASE WHEN eprev IS NOT NULL THEN (eq - eprev) * (eq - eprev) ELSE CAST(0 AS BIGINT) END")).as("dnum"),
          max(expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n")).as("tss"))
        .select(col("n"),
          round(expr("1 - (CAST(rss_sq AS DOUBLE) / 1000000.0) / tss"), 6).as("r2"),
          expr("CASE WHEN rss_sq > 0 THEN (dnum * 1000000) DIV rss_sq END").as("dw_micro"))
    }),

    // JARQUE-BERA normality test (Jarque & Bera 1980) on the daily
    // click-volume series — the distributional-shape gate behind every
    // "can I use the z-table here" decision: JB = n/6·(g₁² +
    // (g₂−3)²/4) from skewness and kurtosis. The mean never divides:
    // with w = n·x − Σx the central moments are exact BIGINT sums
    // (Σw², Σw³, Σw⁴ — the w⁴ bound is the documented BIGINT knob at
    // day grain) and g₁/g₂ are evaluated once, on the 1-row final, in
    // identical expression text. χ²₂ critical value 5.9915 as a
    // literal.
    "q_jarque_bera" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
      val n1 = days.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      days.crossJoin(broadcast(n1))
        .select(col("n"), expr("n * x - sx").as("w"))
        .agg(max(col("n")).as("n"), sum(expr("w * w")).as("w2"),
          sum(expr("w * w * w")).as("w3"), sum(expr("w * w * w * w")).as("w4"))
        .withColumn("g1", expr(
          "CAST(w3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) / pow(CAST(w2 AS DOUBLE), 1.5)"))
        .withColumn("g2", expr(
          "CAST(w4 AS DOUBLE) * n / (CAST(w2 AS DOUBLE) * w2)"))
        .select(col("n"), round(col("g1"), 6).as("skew"),
          round(col("g2"), 6).as("kurtosis"),
          round(expr("n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4)"), 6).as("jb"),
          expr("n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4) > 5.9915").as("reject_05"))
    }),

    // RUNS-UP-AND-DOWN test for randomness (Wallis & Moore 1941) on
    // the daily click series — "does the series wander or zigzag more
    // than chance": count maximal runs of same-direction day-over-day
    // moves (ties dropped per the textbook rule, the direction
    // re-lagged AFTER the drop). Consecutive signs of first
    // differences of an i.i.d. series are NOT exchangeable, so the
    // two-type Wald-Wolfowitz moments do not apply; the null moments
    // for m = n₁+n₂ observed moves are E = (2m+1)/3 and
    // Var = (16m−13)/90 (the (2n−1)/3, (16n−29)/90 textbook form with
    // n = m+1 series points after tie removal). All counts exact
    // BIGINT; z² on the 1-row final in identical text. Day grain: one
    // corpus groupBy, two bounded lag windows.
    "q_runs_test" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"))
      val wl = Window.orderBy(col("day"))
      val signs = days
        .withColumn("prev", lag(col("x"), 1).over(wl))
        .filter(col("prev").isNotNull && col("x") =!= col("prev"))
        .withColumn("s", expr("CASE WHEN x > prev THEN 1 ELSE 0 END"))
        .withColumn("sprev", lag(col("s"), 1).over(Window.orderBy(col("day"))))
      signs.agg(
          sum(expr("CASE WHEN s = 1 THEN 1 ELSE 0 END")).as("n1"),
          sum(expr("CASE WHEN s = 0 THEN 1 ELSE 0 END")).as("n2"),
          sum(expr("CASE WHEN sprev IS NULL OR s <> sprev THEN 1 ELSE 0 END")).as("runs"))
        .withColumn("e_runs", expr(
          "(2.0 * CAST(n1 + n2 AS DOUBLE) + 1) / 3"))
        .withColumn("v_runs", expr(
          "(16.0 * CAST(n1 + n2 AS DOUBLE) - 13) / 90"))
        .select(col("n1"), col("n2"), col("runs"),
          round(col("e_runs"), 6).as("e_runs"),
          round(expr("(runs - e_runs) * (runs - e_runs) / v_runs"), 6).as("z2"),
          expr("(runs - e_runs) * (runs - e_runs) / v_runs > 3.8415").as("reject_05"))
    }),

    // TOST EQUIVALENCE test (Schuirmann 1987) between the click and
    // view mean values — the inferential question q_t_test CANNOT
    // answer: failing to reject "different" never demonstrates "the
    // same"; equivalence needs two one-sided tests against an explicit
    // margin (±2.0 here, on the milli grid). The mean difference is an
    // EXACT integer rational (s1·n2 − s2·n1 over n1·n2, sign-safe
    // division); the z statistics run once on the 1-row moment final
    // in identical expression text, Welch SE from exact BIGINT
    // moments, 1.6449 (one-sided 5%) as a literal. One corpus
    // aggregate total.
    "q_tost" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("arm"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .agg(
          sum(when(col("arm") === "click", 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === "click", col("vm")).otherwise(0L)).as("s1"),
          sum(when(col("arm") === "click", expr("vm * vm")).otherwise(0L)).as("q1"),
          sum(when(col("arm") === "view", 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === "view", col("vm")).otherwise(0L)).as("s2"),
          sum(when(col("arm") === "view", expr("vm * vm")).otherwise(0L)).as("q2"))
        .withColumn("se", expr(
          """sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)) / n1
            |  + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)) / n2)""".stripMargin))
        .withColumn("dm", expr("CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2"))
        .select(col("n1"), col("n2"),
          expr(sdiv("s1 * n2 - s2 * n1", "n1 * n2")).as("diff_milli"),
          round(col("se"), 4).as("se_milli"),
          round(expr("(dm + 2000.0) / se"), 4).as("z_lo"),
          round(expr("(dm - 2000.0) / se"), 4).as("z_hi"),
          expr("(dm + 2000.0) / se > 1.6449 AND (dm - 2000.0) / se < -1.6449")
            .as("equivalent_05"))
    }),

    // CAPTURE-RECAPTURE population estimate (Lincoln-Petersen /
    // Chapman 1951) — "how many users exist that we have NOT seen":
    // treat the first two observed weeks as independent capture
    // occasions; N̂ = n₁n₂/m from the overlap, with Chapman's
    // bias-corrected form alongside and the ACTUAL distinct-user total
    // as the audit column (the fixture observes everyone, so the
    // estimator's bias is measurable). Three distinct-user aggregates
    // + one semi-join overlap count, all exact integers. This is the
    // coverage-estimation primitive behind "how much of the web does
    // this crawl see".
    "q_capture_recapture" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) DIV 604800000000").as("wk"))
        .distinct()
        .ckpt() // week pick + both occasions share it
      val w0 = uw.agg(min(col("wk")).as("w0"))
      val occ = uw.crossJoin(broadcast(w0))
      val a = occ.filter(col("wk") === col("w0")).select(col("user_id"))
      val b = occ.filter(col("wk") === col("w0") + 1).select(col("user_id"))
      val n1 = a.agg(count(lit(1)).as("n1"))
      val n2 = b.agg(count(lit(1)).as("n2"))
      val m = a.join(b, Seq("user_id"), "left_semi").agg(count(lit(1)).as("m"))
      val truth = Tables.events(s, d).agg(countDistinct(col("user_id")).as("n_true"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m)).crossJoin(broadcast(truth))
        .select(col("n1"), col("n2"), col("m"), col("n_true"),
          expr("CASE WHEN m > 0 THEN (n1 * n2) DIV m END").as("lp_est"),
          expr("((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1").as("chapman_est"))
    }),

    // SPRT (Wald 1945) — the SEQUENTIAL test completing the monitoring
    // family (q_group_sequential spends an alpha budget at fixed
    // looks; SPRT decides after EVERY day with optimal expected sample
    // size): daily click-share LLR under H₀ p=0.2 vs H₁ p=0.25,
    // accumulated until it escapes the (ln β/(1−α), ln (1−β)/α) =
    // ±ln 19 band. The per-event log-likelihood ratios are
    // PRE-EVALUATED constants (the Gumbel30 pattern — no engine libm
    // in the loop), so the daily LLR is exact integer micro and the
    // cumulative trace replays bit-for-bit. Day grain: one corpus
    // aggregate + one bounded prefix window.
    "q_sprt" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("k"))
      val wcum = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
      days
        .withColumn("llr_micro", expr(s"k * $SprtL1 + (n - k) * ($SprtL0)"))
        .withColumn("cum_llr_micro", sum(col("llr_micro")).over(wcum))
        .select(col("day"), col("n"), col("k"), col("llr_micro"), col("cum_llr_micro"),
          expr(
            """CASE WHEN cum_llr_micro >= 2944439 THEN 'accept_h1'
              |     WHEN cum_llr_micro <= -2944439 THEN 'accept_h0'
              |     ELSE 'continue' END""".stripMargin).as("decision"))
        .orderBy(col("day"))
    }),

    // FRIEDMAN repeated-measures rank test (Friedman 1937) — do the
    // event types keep the same volume ORDER day after day, judged
    // nonparametrically WITHIN each day (each day is its own block,
    // so a global traffic trend cannot confound the comparison — the
    // within-block complement of q_kruskal_wallis's pooled ranks).
    // The (day × type) grid is gap-filled with explicit zeros (a
    // missing treatment is a rank, not a missing row); within-day
    // average-tie ranks in DOUBLED units (the q_spearman discipline)
    // over ≤k-row partitions; the tie-corrected statistic
    // (k−1)·Σ(R2_j − n(k+1))² / (A2 − nk(k+1)²) is exact integer
    // until the final division. Day grain throughout.
    "q_friedman" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .ckpt() // grid fill + rank windows share it
      val days = counts.select(col("day")).distinct()
      val types = counts.select(col("event_type")).distinct()
      val grid = days.crossJoin(broadcast(types))
        .join(counts, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val cells = grid.groupBy(col("day"), col("cnt"))
        .agg(count(lit(1)).as("t"), collect_list(col("event_type")).as("ets"))
      val below = Window.partitionBy(col("day")).orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = cells
        .withColumn("bel", coalesce(sum(col("t")).over(below), lit(0L)))
        .withColumn("r2", expr("2 * bel + t + 1"))
        .select(col("day"), col("r2"), explode(col("ets")).as("event_type"))
      val perType = ranked.groupBy(col("event_type"))
        .agg(sum(col("r2")).as("rj2"))
      val a2 = ranked.agg(sum(expr("r2 * r2")).as("a2"),
        countDistinct(col("event_type")).as("k"), countDistinct(col("day")).as("n"))
      perType.crossJoin(broadcast(a2))
        .select(col("event_type"), col("rj2"), col("n"), col("k"), col("a2"),
          expr("(rj2 - n * (k + 1)) * (rj2 - n * (k + 1))").as("dev2"))
        .agg(max(col("n")).as("n"), max(col("k")).as("k"), max(col("a2")).as("a2"),
          sum(col("dev2")).as("sdev2"))
        .select(col("n"), col("k"),
          round(expr(
            """CASE WHEN a2 - n * k * (k + 1) * (k + 1) > 0
              | THEN (k - 1) * CAST(sdev2 AS DOUBLE) / (a2 - n * k * (k + 1) * (k + 1))
              | END""".stripMargin), 6).as("chi2_f"),
          expr(
            """CASE WHEN a2 - n * k * (k + 1) * (k + 1) > 0
              | THEN (k - 1) * CAST(sdev2 AS DOUBLE) / (a2 - n * k * (k + 1) * (k + 1)) > 9.4877
              | ELSE false END""".stripMargin).as("reject_05"))
    }),

    // LABEL-RANDOMIZATION test of the click-vs-view mean difference —
    // the DISTRIBUTION-FREE inference q_t_test's normal theory can't
    // give on skewed values: re-assign every observation's group label
    // B = 256 times and ask how often the randomized |mean difference|
    // beats the observed one (Fisher 1935's randomization argument;
    // binomial relabeling is the standard distributed Monte-Carlo
    // surrogate for fixed-margin permutation, and the declared
    // contract here). "Random" labels are the house hash-for-RNG
    // substitution, amortized: each observation draws its 256
    // replicate bits from TWO md5 digests (64 hex digits = 256
    // independent uniform bits — 2 hashes per row, not B), replicate
    // b reading bit b−1; a set bit assigns group A (balanced p = ½
    // relabeling, the standard randomization-test surrogate).
    // Per-replicate means compare in DOUBLE computed from exact
    // BIGINT sums in identical text (exact cross-multiplication
    // would overflow 2⁶³ at sf0.1); p = (1 + #beats)·1000 DIV (B+1)
    // on the milli grid.
    //
    // Scale posture: the B-fold explode is map-side and each
    // exploded row's work is one substring + hex lookup (the md5s
    // hash ONCE per observation before the explode — the naive
    // per-(row, b) hash costs B× the digest work and dominated the
    // whole query, 8.3 s → this form); the replicate aggregate is
    // one hash shuffle keyed by b — 256 groups of partial-aggregated
    // sums; the observed stat is a 1-row broadcast.
    "q_permutation_test" -> ((s, d) => {
      val B = 256
      val base = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      val obs = base.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "click", col("vm")).otherwise(0L)).as("s1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2"),
        sum(when(col("event_type") === "view", col("vm")).otherwise(0L)).as("s2"))
      val reps = base
        .withColumn("hh", expr(
          "concat(md5(concat(CAST(event_id AS STRING), ':0')), " +
            "md5(concat(CAST(event_id AS STRING), ':1')))"))
        .select(col("vm"), col("hh"), explode(expr(s"sequence(1, $B)")).as("b"))
        .withColumn("ga", expr(
          """((instr('0123456789abcdef', substring(hh, (b - 1) DIV 4 + 1, 1)) - 1)
            | DIV (CASE (b - 1) % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END))
            | % 2 = 1""".stripMargin))
        .groupBy(col("b"))
        .agg(
          sum(when(col("ga"), 1L).otherwise(0L)).as("na"),
          sum(when(col("ga"), col("vm")).otherwise(0L)).as("sa"),
          sum(when(!col("ga"), 1L).otherwise(0L)).as("nb"),
          sum(when(!col("ga"), col("vm")).otherwise(0L)).as("sb"))
        .filter(col("na") > 0 && col("nb") > 0)
      reps.crossJoin(broadcast(obs.select(col("s1"), col("s2"),
          col("n1").as("m1"), col("n2").as("m2"))))
        .withColumn("beat", expr(
          """abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
            | >= abs(CAST(s1 AS DOUBLE) / m1 - CAST(s2 AS DOUBLE) / m2)""".stripMargin))
        .agg(count(lit(1)).as("n_reps"),
          sum(when(col("beat"), 1L).otherwise(0L)).as("n_beat"),
          max(col("m1")).as("n1"), max(col("m2")).as("n2"),
          max(expr(sdiv("s1 * m2 - s2 * m1", "m1 * m2"))).as("diff_milli"))
        .select(col("n1"), col("n2"), col("diff_milli"), col("n_reps"), col("n_beat"),
          expr("((1 + n_beat) * 1000) DIV (n_reps + 1)").as("p_milli"),
          expr("((1 + n_beat) * 1000) DIV (n_reps + 1) < 50").as("reject_05"))
    }),

    // PEAKS-OVER-THRESHOLD tail fit (Pickands 1975; the
    // Hosking & Wallis 1987 moment estimators) — the third leg of the
    // extreme-value bank: q_gumbel_tail fits block maxima, q_hill_tail
    // the power-law index; POT models ALL exceedances over a high
    // threshold with the Generalized Pareto, the estimator capacity
    // planning uses when block maxima waste too much data. The
    // threshold is the exact empirical P90: the value at ascending
    // rank (9n DIV 10) + 1 under the (value, event_id) total order —
    // an integer at a deterministic rank, no interpolation to diverge
    // on. Excess moments are exact BIGINTs; ξ̂ = ½(1 − m̄²/s²) and
    // σ̂ = ½m̄(m̄²/s² + 1) run on the 1-row final in identical float
    // text.
    //
    // Scale posture: the corpus collapses to the milli-value CENSUS
    // (bounded distinct values — the q_ks_test/q_levene recipe) in one
    // aggregate; the P90 is the rank CUT over that census's cumulative
    // counts (the value whose [cum−c+1, cum] interval contains rank
    // (9n DIV 10)+1 — identical to the event-grain row_number answer,
    // ties collapse to the same vm by construction), so no window ever
    // sees base rows; the excess moments aggregate the census too
    // (count/sum/sum-of-squares weight by c).
    "q_pot_gpd" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val census = Tables.events(s, d)
        .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .groupBy(col("vm")).agg(count(lit(1)).as("c"))
      val n1 = census.agg(sum(col("c")).as("n"))
      val u = census
        .withColumn("cum", sum(col("c")).over(Window.orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(n1))
        .filter(col("cum") >= expr("(9 * n) DIV 10 + 1") &&
          col("cum") - col("c") < expr("(9 * n) DIV 10 + 1"))
        .select(col("vm").as("u"))
      census.crossJoin(broadcast(u))
        .filter(col("vm") > col("u"))
        .select(col("u"), col("c"), (col("vm") - col("u")).as("y"))
        .groupBy(col("u"))
        .agg(sum(col("c")).as("n_exceed"), sum(expr("y * c")).as("sy"),
          sum(expr("y * y * c")).as("syy"))
        .withColumn("m", expr("CAST(sy AS DOUBLE) / n_exceed"))
        .withColumn("s2", expr(
          "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_exceed) / (n_exceed - 1)"))
        .select(col("u").as("u_milli"), col("n_exceed"),
          round(col("m"), 4).as("mean_excess_milli"),
          round(expr("0.5 * (1 - m * m / s2)"), 6).as("xi"),
          round(expr("0.5 * m * (m * m / s2 + 1)"), 4).as("sigma_milli"))
    }),

    // MOOD'S MEDIAN TEST (Mood 1950) across event types — the
    // median-shift partner of q_kruskal_wallis (ranks) and q_anova
    // (means): cut every observation at the GLOBAL median and test the
    // (type × above/≤) contingency table; robust to everything but a
    // median shift, the right gate when tails are wild. The global
    // median is the exact rank-(⌈n/2⌉) cut over the milli-value CENSUS
    // cumulative counts (the q_pot_gpd P90 recipe at P50); per-type
    // above/≤ counts come off the (type, value) census; each type's
    // χ² contribution runs in DOUBLE over exact integers (identical
    // IEEE), reported in milli.
    //
    // Scale posture: two census aggregates (global and per-type — one
    // corpus shuffle each), 1-row median and totals broadcasts, and a
    // bounded type-grain readout; no window ever sees base rows.
    "q_mood_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val vals = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      val census = vals.groupBy(col("vm")).agg(count(lit(1)).as("c"))
      val n1 = census.agg(sum(col("c")).as("n"))
      val med = census
        .withColumn("cum", sum(col("c")).over(Window.orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(n1))
        .filter(col("cum") >= expr("(n + 1) DIV 2") &&
          col("cum") - col("c") < expr("(n + 1) DIV 2"))
        .select(col("vm").as("med"))
      val counts = vals.groupBy(col("event_type"), col("vm"))
        .agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(med))
        .groupBy(col("event_type"))
        .agg(sum(when(col("vm") > col("med"), col("c")).otherwise(0L)).as("n_above"),
          sum(when(col("vm") <= col("med"), col("c")).otherwise(0L)).as("n_le"),
          max(col("med")).as("median_milli"))
      val tot = counts.agg(sum(col("n_above")).as("ta"), sum(col("n_le")).as("tl"))
      // Degenerate-margin guard: if EVERY value is ≤ the median
      // (ta = 0 — plausible when the milli-quantized median equals the
      // max) or every value is above it, an expected count is zero;
      // Spark would cast the NaN from 0/0 to 0L while DuckDB ERRORS
      // casting NaN to BIGINT, so the guard must be explicit and
      // IDENTICAL in both engines (the oracle carries the same CASE):
      // a one-sided table carries no median-shift signal, so every
      // type's term is defined as 0.
      counts.crossJoin(broadcast(tot))
        .withColumn("chi2_term_milli", expr(
          """CAST(CASE WHEN ta = 0 OR tl = 0 THEN 0 ELSE floor((
            |  pow(n_above - CAST(n_above + n_le AS DOUBLE) * ta / (ta + tl), 2)
            |    / (CAST(n_above + n_le AS DOUBLE) * ta / (ta + tl)) +
            |  pow(n_le - CAST(n_above + n_le AS DOUBLE) * tl / (ta + tl), 2)
            |    / (CAST(n_above + n_le AS DOUBLE) * tl / (ta + tl))
            |) * 1000 + 0.5) END AS BIGINT)""".stripMargin))
        .select(col("event_type"), col("median_milli"), col("n_above"),
          col("n_le"), col("chi2_term_milli"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_spearman" ->
      """WITH rows_ AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |rq AS (
        |  SELECT flag, q, 2 * COALESCE(CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    + cnt + 1 AS r2_q
        |  FROM (SELECT flag, q, CAST(count(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1, 2)),
        |rp AS (
        |  SELECT flag, pc, 2 * COALESCE(CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY pc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    + cnt + 1 AS r2_pc
        |  FROM (SELECT flag, pc, CAST(count(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1, 2))
        |SELECT r.flag, CAST(count(*) AS BIGINT) AS n,
        |  round(corr(r2_q, r2_pc), 4) AS rho
        |FROM rows_ r
        |JOIN rq ON r.flag = rq.flag AND r.q = rq.q
        |JOIN rp ON r.flag = rp.flag AND r.pc = rp.pc
        |GROUP BY r.flag ORDER BY r.flag""".stripMargin,

    "q_kendall_tau" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |p_ AS (
        |  SELECT
        |    CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT) * CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |    CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
        |  FROM days a JOIN days b ON a.day < b.day),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days),
        |j AS (SELECT n, n * (n - 1) // 2 AS p, s, tx, ty FROM p_, nn)
        |SELECT n, p, s, tx, ty,
        |  CASE WHEN (p - tx) * (p - ty) > 0
        |    THEN (s * s * 1000000) // ((p - tx) * (p - ty)) ELSE 0 END AS tau2_micro,
        |  CAST(sign(s) AS BIGINT) AS tau_sign
        |FROM j""".stripMargin,

    "q_kruskal_wallis" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |byv AS (SELECT vm, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY vm),
        |ranked AS (
        |  SELECT vm, t,
        |    2 * COALESCE(CAST(SUM(t) OVER (ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS r2
        |  FROM byv),
        |grp AS (
        |  SELECT event_type, CAST(SUM(c * r2) AS BIGINT) AS sr2,
        |    CAST(SUM(c) AS BIGINT) AS n_g
        |  FROM cells JOIN ranked USING (vm) GROUP BY 1),
        |ties AS (
        |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS ties_t,
        |    CAST(SUM(t) AS BIGINT) AS n FROM ranked),
        |fin AS (
        |  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS k, max(ties_t) AS ties_t,
        |    SUM(CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE) / (4.0 * n_g)) AS a
        |  FROM grp, ties),
        |hh AS (
        |  SELECT n, k, ties_t, 12.0 * a / (n * (n + 1.0)) - 3.0 * (n + 1) AS h FROM fin),
        |hc AS (
        |  SELECT n, k, ties_t, h,
        |    h / (1.0 - CAST(ties_t AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)) AS h_corr
        |  FROM hh)
        |SELECT n, k, ties_t, round(h, 6) AS h, round(h_corr, 6) AS h_corr,
        |  h_corr > 9.4877 AS reject_05
        |FROM hc""".stripMargin,

    "q_anova" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(SUM(vm) AS BIGINT) AS s_g, CAST(SUM(vm * vm) AS BIGINT) AS ss_g
        |  FROM (SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
        |        FROM events)
        |  GROUP BY 1),
        |fin AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(s_g) AS BIGINT) AS s, CAST(SUM(ss_g) AS BIGINT) AS ss,
        |    SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g) AS a
        |  FROM g),
        |dec AS (
        |  SELECT n, k,
        |    a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS ssb,
        |    ss - a AS ssw
        |  FROM fin),
        |ff AS (SELECT n, k, ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k)) AS f FROM dec)
        |SELECT n, k, round(f, 4) AS f, round(ssb / (ssb + ssw), 6) AS eta2,
        |  f > 2.3719 AS reject_05
        |FROM ff""".stripMargin,

    "q_pettitt" ->
      """WITH days AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |byv AS (
        |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
        |  FROM days GROUP BY 1, 2),
        |nt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM days GROUP BY 1),
        |v AS (
        |  SELECT byv.event_type, c, n,
        |    (n - COALESCE(CAST(SUM(t) OVER (PARTITION BY byv.event_type ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) - t)
        |    - COALESCE(CAST(SUM(t) OVER (PARTITION BY byv.event_type ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS v
        |  FROM byv JOIN nt ON byv.event_type = nt.event_type),
        |u AS (
        |  SELECT days.event_type, day, n,
        |    CAST(SUM(v) OVER (PARTITION BY days.event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u
        |  FROM days JOIN v ON days.event_type = v.event_type AND days.c = v.c),
        |k_ AS (
        |  SELECT event_type, n, CAST(max(abs(u)) AS BIGINT) AS k_stat
        |  FROM u GROUP BY 1, 2),
        |cp AS (
        |  SELECT u.event_type, u.n, k_stat, CAST(min(day) AS BIGINT) AS cp_day
        |  FROM u JOIN k_ ON u.event_type = k_.event_type AND abs(u.u) = k_.k_stat
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, n, k_stat, cp_day,
        |  (6 * k_stat * k_stat * 1000000) // (n * n * n + n * n) AS e_micro,
        |  (6 * k_stat * k_stat * 1000000) // (n * n * n + n * n) >= 3688879 AS reject_05
        |FROM cp ORDER BY event_type""".stripMargin,

    "q_diff_in_diff" ->
      """WITH b AS (
        |  SELECT (min(epoch_us(ts) // 3600000000)
        |        + max(epoch_us(ts) // 3600000000) + 1) // 2 AS mid
        |  FROM events),
        |cells AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN epoch_us(ts) // 3600000000 >= mid THEN 1 ELSE 0 END AS post,
        |    CAST(count(*) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(floor(value * 10 + 0.5) AS BIGINT)) AS BIGINT) AS sv
        |  FROM events, b GROUP BY 1, 2),
        |w AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 AND post = 0 THEN nn ELSE 0 END) AS BIGINT) AS n00,
        |    CAST(SUM(CASE WHEN arm = 0 AND post = 1 THEN nn ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN arm = 1 AND post = 0 THEN nn ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN arm = 1 AND post = 1 THEN nn ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN arm = 0 AND post = 0 THEN (sv * 100000) // nn ELSE 0 END) AS BIGINT) AS m00_micro,
        |    CAST(SUM(CASE WHEN arm = 0 AND post = 1 THEN (sv * 100000) // nn ELSE 0 END) AS BIGINT) AS m01_micro,
        |    CAST(SUM(CASE WHEN arm = 1 AND post = 0 THEN (sv * 100000) // nn ELSE 0 END) AS BIGINT) AS m10_micro,
        |    CAST(SUM(CASE WHEN arm = 1 AND post = 1 THEN (sv * 100000) // nn ELSE 0 END) AS BIGINT) AS m11_micro
        |  FROM cells)
        |SELECT n00, n01, n10, n11, m00_micro, m01_micro, m10_micro, m11_micro,
        |  (m11_micro - m10_micro) - (m01_micro - m00_micro) AS did_micro
        |FROM w""".stripMargin,

    "q_mde" ->
      """WITH pu AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(floor(value * 10 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS ss
        |  FROM pu GROUP BY 1),
        |vq AS (
        |  SELECT event_type, n_users, n0, n1,
        |    (n_users * ss - s * s) // (n_users * (n_users - 1)) AS var_q
        |  FROM g)
        |SELECT event_type, n_users, n0, n1, var_q,
        |  (15680000 * var_q) // least(n0, n1) AS mde2_micro
        |FROM vq ORDER BY event_type""".stripMargin,

    "q_crosscorr" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |j AS (
        |  SELECT l.lag, a.x, b.y
        |  FROM days a, lags l JOIN days b ON b.day = a.day + l.lag)
        |SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n,
        |  round(corr(x, y), 4) AS ccf
        |FROM j GROUP BY lag ORDER BY lag""".stripMargin,

    "q_season_strength" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |wd AS (
        |  SELECT event_type, day % 7 AS wd,
        |    CAST(count(*) AS BIGINT) AS nw, CAST(SUM(s) AS BIGINT) AS ssw,
        |    CAST(SUM(s * s) AS BIGINT) AS ssqw
        |  FROM daily GROUP BY 1, 2),
        |sc AS (
        |  SELECT event_type,
        |    CAST(floor((CAST(nw AS DOUBLE) * ssqw - CAST(ssw AS DOUBLE) * ssw)
        |      / nw + 0.5) AS BIGINT) AS scatter
        |  FROM wd),
        |agg_ AS (
        |  SELECT event_type, CAST(SUM(scatter) AS BIGINT) AS ssw_c2,
        |    CAST(count(*) AS BIGINT) AS n_weekdays
        |  FROM sc GROUP BY event_type),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(s * s) AS BIGINT) AS ssq
        |  FROM daily GROUP BY event_type)
        |SELECT agg_.event_type AS event_type, n AS n_days, n_weekdays,
        |  round(1.0 - CAST(ssw_c2 AS DOUBLE)
        |    / ((CAST(n AS DOUBLE) * ssq - CAST(ss AS DOUBLE) * ss) / n), 4) AS strength
        |FROM agg_ JOIN tot ON agg_.event_type = tot.event_type
        |ORDER BY event_type""".stripMargin,

    "q_esd_outliers" -> {
      def rnd(src: String, idx: Int, hit: String, rest: String): String =
        s"""st$idx AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(s * s) AS BIGINT) AS ssq
           |  FROM $src GROUP BY event_type),
           |z$idx AS (
           |  SELECT $src.event_type AS event_type, day, s,
           |    abs(CAST(s AS DOUBLE) - CAST(ss AS DOUBLE) / n)
           |      / sqrt((CAST(n AS DOUBLE) * ssq - CAST(ss AS DOUBLE) * ss)
           |             / (CAST(n AS DOUBLE) * (n - 1))) AS zval
           |  FROM $src JOIN st$idx ON $src.event_type = st$idx.event_type),
           |r$idx AS (
           |  SELECT event_type, day, s, zval,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY zval DESC, day) AS rn
           |  FROM z$idx),
           |$hit AS (
           |  SELECT event_type, CAST($idx AS BIGINT) AS round, day,
           |    s AS value_c, round(zval, 4) AS z
           |  FROM r$idx WHERE rn = 1),
           |$rest AS (SELECT event_type, day, s FROM r$idx WHERE rn <> 1)""".stripMargin
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM events GROUP BY 1, 2),
         |${rnd("daily", 1, "h1", "d2")},
         |${rnd("d2", 2, "h2", "d3")},
         |${rnd("d3", 3, "h3", "d4")}
         |SELECT * FROM (
         |  SELECT * FROM h1 UNION ALL SELECT * FROM h2 UNION ALL SELECT * FROM h3)
         |ORDER BY event_type, round""".stripMargin
    },

    "q_policy_replay" ->
      """WITH imp AS (
        |  SELECT user_id, event_id AS vid, epoch_us(ts) AS vus,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS arm,
        |    user_id % 3 AS ctx
        |  FROM events WHERE event_type = 'view'),
        |clk AS (
        |  SELECT user_id, epoch_us(ts) AS cus,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'click'),
        |rew AS (
        |  SELECT DISTINCT vid
        |  FROM imp JOIN clk USING (user_id, item)
        |  WHERE cus > vus AND cus <= vus + 1800000000),
        |scored AS (
        |  SELECT imp.ctx, imp.arm,
        |    CASE WHEN rew.vid IS NOT NULL THEN 1 ELSE 0 END AS r
        |  FROM imp LEFT JOIN rew ON imp.vid = rew.vid),
        |cells AS (
        |  SELECT ctx, arm, CAST(count(*) AS BIGINT) AS n_imp,
        |    CAST(SUM(r) AS BIGINT) AS n_rew
        |  FROM scored GROUP BY 1, 2),
        |best AS (
        |  SELECT ctx, arm AS best_arm, n_imp AS n_matched,
        |    (n_rew * 1000000) // n_imp AS replay_micro
        |  FROM (SELECT *, row_number() OVER (PARTITION BY ctx
        |          ORDER BY (n_rew * 1000000) // n_imp DESC, arm) AS rn
        |        FROM cells)
        |  WHERE rn = 1),
        |base AS (
        |  SELECT ctx, CAST(count(*) AS BIGINT) AS n_all,
        |    (CAST(SUM(r) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |      AS baseline_micro
        |  FROM scored GROUP BY ctx)
        |SELECT ctx, best_arm, n_matched, replay_micro, n_all, baseline_micro
        |FROM best JOIN base USING (ctx) ORDER BY ctx""".stripMargin,

    // Oracle note: DuckDB 1.0's list_reduce reuses the accumulator
    // buffer in place, so a struct state whose 'd2' copies the old
    // 'd1' reads the ALREADY-OVERWRITTEN diagonal — the fold replays
    // instead through a recursive CTE, one fresh row per anti-
    // diagonal, which is aliasing-safe and textually mirrors the
    // Spark aggregate()'s step lambda.
    "q_dtw" ->
      """WITH RECURSIVE ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CASE WHEN event_type = 'click'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS xc,
        |    CASE WHEN event_type = 'view'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END AS yc
        |  FROM events),
        |dly AS (
        |  SELECT day, CAST(SUM(xc) AS BIGINT) AS xv, CAST(SUM(yc) AS BIGINT) AS yv
        |  FROM ev GROUP BY day),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |sp AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        |f AS (
        |  SELECT sp.day AS day, coalesce(xv, 0) AS xv, coalesce(yv, 0) AS yv
        |  FROM sp LEFT JOIN dly USING (day)),
        |arrs AS (
        |  SELECT list(xv ORDER BY day) AS x, list(yv ORDER BY day) AS y FROM f),
        |pre AS (SELECT x, y, len(x) AS n, len(y) AS m FROM arrs),
        |dp AS (
        |  SELECT CAST(2 AS BIGINT) AS k,
        |    list_transform(range(1, n + 1), i ->
        |      CASE WHEN i = 1 THEN abs(x[1] - y[1])
        |           ELSE 1152921504606846976 END) AS d1,
        |    list_transform(range(1, n + 1), i -> 1152921504606846976) AS d2
        |  FROM pre
        |  UNION ALL
        |  SELECT k + 1,
        |    list_transform(range(1, n + 1), i ->
        |      CASE WHEN k + 1 - i >= 1 AND k + 1 - i <= m THEN
        |        abs(x[i] - y[k + 1 - i]) + least(
        |          CASE WHEN i > 1 THEN d1[i - 1] ELSE 1152921504606846976 END,
        |          d1[i],
        |          CASE WHEN i > 1 THEN d2[i - 1] ELSE 1152921504606846976 END)
        |      ELSE 1152921504606846976 END),
        |    d1
        |  FROM dp, pre WHERE k < n + m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |  d1[n] AS dtw_cents,
        |  round(CAST(d1[n] AS DOUBLE) / (n + m) / 100.0, 4) AS dtw_norm
        |FROM dp, pre WHERE k = n + m""".stripMargin,

    "q_stratified_ate" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS n_ev,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend_c
        |  FROM events GROUP BY user_id),
        |su AS (
        |  SELECT spend_c,
        |    least(greatest((n_ev - 40) // 15, 0), 3) AS stratum,
        |    user_id % 2 AS t
        |  FROM u),
        |cell AS (
        |  SELECT stratum,
        |    CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN t = 1 THEN spend_c ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN t = 0 THEN spend_c ELSE 0 END) AS BIGINT) AS s0
        |  FROM su GROUP BY stratum),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM su)
        |SELECT stratum, n1, n0,
        |  CASE WHEN n1 > 0 THEN (s1 * 10) // n1 END AS m1_milli,
        |  CASE WHEN n0 > 0 THEN (s0 * 10) // n0 END AS m0_milli,
        |  CASE WHEN n1 > 0 AND n0 > 0 THEN (s1 * 10) // n1 - (s0 * 10) // n0 END AS diff_milli,
        |  ((n1 + n0) * 1000000) // nu AS w_micro
        |FROM cell, tot ORDER BY stratum""".stripMargin,

    "q_group_sequential" ->
      """WITH b AS (
        |  SELECT min(epoch_us(ts) // 3600000000) AS lo,
        |    max(epoch_us(ts) // 3600000000) AS hi
        |  FROM events),
        |cells AS (
        |  SELECT ((epoch_us(ts) // 3600000000 - lo) * 5) // (hi - lo + 1) AS look,
        |    user_id % 2 AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(floor(value * 10 + 0.5) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(SUM(CAST(floor(value * 10 + 0.5) AS BIGINT)
        |           * CAST(floor(value * 10 + 0.5) AS BIGINT)) AS BIGINT) AS ss
        |  FROM events, b GROUP BY 1, 2),
        |cum AS (
        |  SELECT look, arm,
        |    CAST(SUM(n) OVER (PARTITION BY arm ORDER BY look
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(SUM(s) OVER (PARTITION BY arm ORDER BY look
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
        |    CAST(SUM(ss) OVER (PARTITION BY arm ORDER BY look
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS css
        |  FROM cells),
        |j AS (
        |  SELECT a0.look, a0.cn AS n0, a0.cs AS s0, a0.css AS ss0,
        |    a1.cn AS n1, a1.cs AS s1, a1.css AS ss1
        |  FROM (SELECT * FROM cum WHERE arm = 0) a0
        |  JOIN (SELECT * FROM cum WHERE arm = 1) a1 ON a0.look = a1.look),
        |z AS (
        |  SELECT look, n0, n1,
        |    (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
        |    * (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
        |    / ((CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0) / (CAST(n0 AS DOUBLE) * (n0 - 1)) / n0
        |     + (CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1) / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1) AS z2
        |  FROM j)
        |SELECT look, n0, n1, round(z2, 4) AS z2, z2 > 5.822569 AS crossed
        |FROM z ORDER BY look""".stripMargin,

    "q_hill_tail" ->
      """WITH top_ AS (
        |  SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
        |  FROM events
        |  WHERE CAST(floor(value * 1000 + 0.5) AS BIGINT) >= 1
        |  ORDER BY vm DESC LIMIT 201),
        |t AS (SELECT CAST(min(vm) AS BIGINT) AS thr FROM top_),
        |lr AS (
        |  SELECT thr,
        |    CAST(floor(ln(CAST(vm AS DOUBLE) / thr) * 1000000 + 0.5) AS BIGINT) AS lr_micro
        |  FROM top_, t),
        |g AS (
        |  SELECT thr, CAST(count(*) AS BIGINT) AS n_sel,
        |    CAST(SUM(lr_micro) AS BIGINT) AS sum_lr_micro
        |  FROM lr GROUP BY thr)
        |SELECT n_sel - 1 AS k, thr, sum_lr_micro,
        |  CASE WHEN sum_lr_micro > 0
        |    THEN ((n_sel - 1) * 1000000000000) // sum_lr_micro ELSE 0 END AS alpha_micro
        |FROM g""".stripMargin,

    "q_gumbel_tail" ->
      s"""WITH dmax AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(max(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS mx
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(mx) AS BIGINT) AS s, CAST(SUM(mx * mx) AS BIGINT) AS ss
        |  FROM dmax GROUP BY 1),
        |fit AS (
        |  SELECT event_type, n,
        |    sqrt(6.0 * (CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))) / pi() AS beta,
        |    CAST(s AS DOUBLE) / n AS m
        |  FROM g),
        |fin AS (
        |  SELECT event_type, n, beta, m - 0.5772156649 * beta AS mu FROM fit)
        |SELECT event_type, n, round(beta, 4) AS beta_milli, round(mu, 4) AS mu_milli,
        |  round(mu + beta * $Gumbel30, 4) AS ret30_milli
        |FROM fin ORDER BY event_type""".stripMargin,

    // The sequential fold replayed as a recursive CTE: one recursion
    // step per logged event per context, state = the per-arm
    // pull/reward counters as columns; the chosen arm is the same
    // first-match >=-chain argmax the Spark fold uses.
    "q_bandit_replay" -> {
      val arms = Seq("click", "error", "purchase", "signup", "view")
      val n = arms.length
      val pCols = arms.indices.map(i => s"p$i")
      val rCols = arms.indices.map(i => s"r$i")
      val zeros = (pCols ++ rCols).map(_ => "CAST(0 AS BIGINT)").mkString(", ")
      val sDefs = arms.indices.map(i =>
        s"CASE WHEN st.p$i = 0 THEN 1000000000 ELSE st.r$i // st.p$i END AS s$i").mkString(",\n        ")
      val argmax = arms.indices.map { i =>
        val geAll = (i + 1 until n).map(j => s"s$i >= s$j").mkString(" AND ")
        if (i == n - 1) s"ELSE '${arms(i)}'"
        else s"WHEN $geAll THEN '${arms(i)}'"
      }.mkString(" ")
      val armList = arms.map(a => s"'$a'").mkString("[", ", ", "]")
      val stepCols = (arms.indices.map(i => s"p$i + CASE WHEN arm = '${arms(i)}' THEN hit ELSE 0 END") ++
        arms.indices.map(i => s"r$i + CASE WHEN arm = '${arms(i)}' THEN hit * vm ELSE 0 END")).mkString(",\n    ")
      val unpiv = arms.indices.map(i =>
        s"SELECT ctx, '${arms(i)}' AS arm, p$i AS pulls, r$i AS rew_milli, n AS n_events, matched AS n_matched FROM fin")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE ev AS MATERIALIZED (
         |  SELECT user_id % 16 AS ctx, event_type,
         |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
         |    CAST(row_number() OVER (PARTITION BY user_id % 16 ORDER BY ts, event_id) AS BIGINT) AS seq
         |  FROM events),
         |nev AS (SELECT ctx, CAST(max(seq) AS BIGINT) AS n FROM ev GROUP BY ctx),
         |st(ctx, i, matched, ${(pCols ++ rCols).mkString(", ")}) AS (
         |  SELECT ctx, CAST(0 AS BIGINT), CAST(0 AS BIGINT), $zeros FROM nev
         |  UNION ALL
         |  SELECT ctx, i + 1, matched + hit,
         |    $stepCols
         |  FROM (
         |    SELECT q2.*, CASE WHEN q2.event_type = q2.arm THEN 1 ELSE 0 END AS hit
         |    FROM (
         |      SELECT q1.*,
         |        CASE WHEN q1.matched % 7 = 0
         |             THEN $armList[CAST((q1.matched // 7) % $n AS INT) + 1]
         |             ELSE (CASE $argmax END)
         |        END AS arm
         |      FROM (
         |        SELECT st.ctx, st.i, st.matched,
         |          ${(pCols ++ rCols).map(c => s"st.$c").mkString(", ")},
         |          e.event_type, e.vm,
         |          $sDefs
         |        FROM st JOIN ev e ON e.ctx = st.ctx AND e.seq = st.i + 1) q1) q2) q3),
         |fin AS (
         |  SELECT st.*, nev.n FROM st JOIN nev ON st.ctx = nev.ctx AND st.i = nev.n)
         |SELECT * FROM (
         |  $unpiv)
         |ORDER BY ctx, arm""".stripMargin
    },

    // Same rank-without-global-sort construction: score-grain
    // cumulative counts + per-score row_number, decile by exact rank
    // cut, cumulative Qini over the 10-row frame.
    "q_uplift_curve" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS out_c,
        |    user_id % 2 AS t
        |  FROM events GROUP BY user_id),
        |sc AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt FROM users GROUP BY score),
        |cum AS (
        |  SELECT score, COALESCE(CAST(SUM(cnt) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS bef
        |  FROM sc),
        |nu_ AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM users),
        |ranked AS (
        |  SELECT u.t, u.out_c,
        |    bef + row_number() OVER (PARTITION BY u.score ORDER BY u.user_id) AS rn, nu
        |  FROM users u JOIN cum ON u.score = cum.score, nu_),
        |dec AS (
        |  SELECT ((rn - 1) * 10) // nu AS decile,
        |    CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN t = 1 THEN out_c ELSE 0 END) AS BIGINT) AS r1,
        |    CAST(SUM(CASE WHEN t = 0 THEN out_c ELSE 0 END) AS BIGINT) AS r0
        |  FROM ranked GROUP BY 1),
        |cumd AS (
        |  SELECT *,
        |    CAST(SUM(n1) OVER (ORDER BY decile) AS BIGINT) AS cn1,
        |    CAST(SUM(n0) OVER (ORDER BY decile) AS BIGINT) AS cn0,
        |    CAST(SUM(r1) OVER (ORDER BY decile) AS BIGINT) AS cr1,
        |    CAST(SUM(r0) OVER (ORDER BY decile) AS BIGINT) AS cr0
        |  FROM dec)
        |SELECT decile, n1, n0, r1, r0,
        |  CASE WHEN n1 > 0 AND n0 > 0
        |       THEN (r1 * 1000) // n1 - (r0 * 1000) // n0 END AS uplift_milli,
        |  CASE WHEN cn0 > 0 THEN cr1 - (cr0 * cn1) // cn0 END AS qini_c
        |FROM cumd ORDER BY decile""".stripMargin,

    "q_bh_fdr" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(floor(value * 1000 + 0.5) AS BIGINT)
        |             * CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS s2
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s1) AS BIGINT) AS gs1,
        |    CAST(SUM(s2) AS BIGINT) AS gs2 FROM cells),
        |scored AS (
        |  SELECT event_type, n_g,
        |    CAST(n_g AS DOUBLE) * (CAST(s1 AS DOUBLE) / n_g - CAST(gs1 AS DOUBLE) / n)
        |      * (CAST(s1 AS DOUBLE) / n_g - CAST(gs1 AS DOUBLE) / n)
        |      / ((CAST(gs2 AS DOUBLE) - CAST(gs1 AS DOUBLE) * gs1 / n) / (n - 1)) AS z2
        |  FROM cells, tot),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY z2 DESC, event_type) AS BIGINT) AS k
        |  FROM scored),
        |th AS (
        |  SELECT *, CAST([6.634897, 5.411894, 4.709292, 4.217885, 3.841459][CAST(k AS INT)]
        |    AS DOUBLE) AS thr FROM rk),
        |km AS (
        |  SELECT CAST(COALESCE(MAX(CASE WHEN z2 >= thr THEN k END), 0) AS BIGINT) AS k_pass
        |  FROM th)
        |SELECT event_type, n_g, k, round(z2, 6) AS z2, thr, k <= k_pass AS bh_reject
        |FROM th, km ORDER BY k""".stripMargin,

    "q_wilcoxon_signed" ->
      """WITH diffs AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click'
        |                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    - CAST(SUM(CASE WHEN event_type = 'view'
        |                    THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS dd
        |  FROM events GROUP BY user_id),
        |nz AS (
        |  SELECT abs(dd) AS ad,
        |    CASE WHEN dd > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pos
        |  FROM diffs WHERE dd <> 0),
        |cells AS (
        |  SELECT ad, CAST(count(*) AS BIGINT) AS t, CAST(SUM(pos) AS BIGINT) AS tp
        |  FROM nz GROUP BY ad),
        |ranked AS (
        |  SELECT *, 2 * COALESCE(CAST(SUM(t) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS r2
        |  FROM cells),
        |agg_ AS (
        |  SELECT CAST(SUM(tp * r2) AS BIGINT) AS w2_pos,
        |    CAST(SUM((t - tp) * r2) AS BIGINT) AS w2_neg,
        |    CAST(SUM(t) AS BIGINT) AS n,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties_t
        |  FROM ranked),
        |fin AS (SELECT *, 2 * w2_pos - n * (n + 1) AS a FROM agg_)
        |SELECT n, w2_pos, w2_neg, ties_t, a,
        |  round(CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - ties_t > 0
        |    THEN 3.0 * CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
        |         / (2.0 * n * (n + 1) * (2 * n + 1) - ties_t) END, 6) AS z2
        |FROM fin""".stripMargin,

    "q_levene" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, COALESCE(CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
        |  FROM cells),
        |ng AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_g FROM cells GROUP BY 1),
        |med AS (
        |  SELECT event_type, CAST(MIN(vm) AS BIGINT) AS med
        |  FROM cum JOIN ng USING (event_type)
        |  WHERE below + c >= (n_g + 1) // 2 GROUP BY event_type),
        |dev AS (
        |  SELECT cells.event_type,
        |    CAST(SUM(c * abs(vm - med)) AS BIGINT) AS s1,
        |    CAST(SUM(c * abs(vm - med) * abs(vm - med)) AS BIGINT) AS s2,
        |    CAST(SUM(c) AS BIGINT) AS n_g
        |  FROM cells JOIN med USING (event_type) GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(s1) AS BIGINT) AS gs1, CAST(SUM(s2) AS BIGINT) AS gs2,
        |    SUM(CAST(s1 AS DOUBLE) * s1 / n_g) AS qa
        |  FROM dev)
        |SELECT n, k,
        |  round(((qa - CAST(gs1 AS DOUBLE) * gs1 / n) / (k - 1))
        |    / ((CAST(gs2 AS DOUBLE) - qa) / (n - k)), 6) AS f_bf,
        |  ((qa - CAST(gs1 AS DOUBLE) * gs1 / n) / (k - 1))
        |    / ((CAST(gs2 AS DOUBLE) - qa) / (n - k)) > 2.3719 AS reject_05
        |FROM tot""".stripMargin,

    "q_qq_points" ->
      """WITH cells AS (
        |  SELECT event_type AS arm, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, COALESCE(CAST(SUM(c) OVER (PARTITION BY arm ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
        |  FROM cells),
        |ng AS (SELECT arm, CAST(SUM(c) AS BIGINT) AS n_arm FROM cells GROUP BY arm),
        |grid AS (SELECT CAST(range AS BIGINT) AS p FROM range(1, 10)),
        |tgt AS (SELECT arm, p, (p * n_arm + 9) // 10 AS target FROM ng, grid),
        |qs AS (
        |  SELECT p, arm, CAST(MIN(vm) AS BIGINT) AS q
        |  FROM cum JOIN tgt USING (arm) WHERE below + c >= target GROUP BY p, arm)
        |SELECT p,
        |  CAST(MAX(CASE WHEN arm = 'click' THEN q END) AS BIGINT) AS q_click_milli,
        |  CAST(MAX(CASE WHEN arm = 'view' THEN q END) AS BIGINT) AS q_view_milli,
        |  CAST(MAX(CASE WHEN arm = 'click' THEN q END)
        |    - MAX(CASE WHEN arm = 'view' THEN q END) AS BIGINT) AS gap_milli
        |FROM qs GROUP BY p ORDER BY p""".stripMargin,

    "q_partial_corr" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS z
        |  FROM events GROUP BY user_id),
        |c_ AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    corr(x, y) AS rxy, corr(x, z) AS rxz, corr(y, z) AS ryz
        |  FROM users)
        |SELECT n, round(rxy, 4) AS r_xy, round(rxz, 4) AS r_xz, round(ryz, 4) AS r_yz,
        |  round((rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 4) AS r_xy_z
        |FROM c_""".stripMargin,

    "q_bollinger" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT day, x,
        |    CAST(count(*) OVER w AS BIGINT) AS n_win,
        |    round(avg(x) OVER w, 4) AS mu,
        |    round(stddev_samp(x) OVER w, 4) AS sd
        |  FROM days
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT day, x, mu, sd,
        |  round(mu + 2 * sd, 4) AS hi, round(mu - 2 * sd, 4) AS lo,
        |  CAST(x AS DOUBLE) > round(mu + 2 * sd, 4) AS breakout_hi,
        |  CAST(x AS DOUBLE) < round(mu - 2 * sd, 4) AS breakout_lo
        |FROM win WHERE n_win = 14 ORDER BY day""".stripMargin,

    "q_rsi" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS spend_c
        |  FROM events GROUP BY 1),
        |dl AS (
        |  SELECT day, spend_c, spend_c - lag(spend_c, 1) OVER (ORDER BY day) AS delta
        |  FROM days),
        |gl AS (
        |  SELECT day, spend_c,
        |    CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS BIGINT) END AS gain,
        |    CASE WHEN delta < 0 THEN -delta ELSE CAST(0 AS BIGINT) END AS loss
        |  FROM dl WHERE delta IS NOT NULL),
        |win AS (
        |  SELECT day, spend_c,
        |    CAST(count(*) OVER w AS BIGINT) AS n_win,
        |    CAST(SUM(gain) OVER w AS BIGINT) AS sg,
        |    CAST(SUM(loss) OVER w AS BIGINT) AS sl
        |  FROM gl
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT day, spend_c, sg, sl,
        |  CASE WHEN sg + sl > 0 THEN (100000 * sg) // (sg + sl) END AS rsi_milli
        |FROM win WHERE n_win = 14 ORDER BY day""".stripMargin,

    "q_pacf" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM days),
        |ws AS (
        |  SELECT n, n * x - sx AS w,
        |    lag(n * x - sx, 1) OVER (ORDER BY day) AS w1,
        |    lag(n * x - sx, 2) OVER (ORDER BY day) AS w2,
        |    lag(n * x - sx, 3) OVER (ORDER BY day) AS w3
        |  FROM days, n1),
        |mom AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(SUM(w * w) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN w1 IS NOT NULL THEN w * w1 ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN w2 IS NOT NULL THEN w * w2 ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS c2,
        |    CAST(SUM(CASE WHEN w3 IS NOT NULL THEN w * w3 ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS c3
        |  FROM ws),
        |rho AS (
        |  SELECT n, CAST(c1 AS DOUBLE) / c0 AS rho1, CAST(c2 AS DOUBLE) / c0 AS rho2,
        |    CAST(c3 AS DOUBLE) / c0 AS rho3
        |  FROM mom),
        |dl2 AS (
        |  SELECT *, (rho2 - rho1 * rho1) / (1 - rho1 * rho1) AS p22,
        |    rho1 * (1 - (rho2 - rho1 * rho1) / (1 - rho1 * rho1)) AS p21
        |  FROM rho)
        |SELECT n, round(rho1, 6) AS rho1, round(rho2, 6) AS rho2, round(rho3, 6) AS rho3,
        |  round(rho1, 6) AS pacf1, round(p22, 6) AS pacf2,
        |  round((rho3 - p21 * rho2 - p22 * rho1) / (1 - p21 * rho1 - p22 * rho2), 6) AS pacf3
        |FROM dl2""".stripMargin,

    "q_granger" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xs,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ys
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT ys, lag(ys, 1) OVER (ORDER BY day) AS y1,
        |    lag(xs, 1) OVER (ORDER BY day) AS x1
        |  FROM days),
        |rows_ AS (SELECT * FROM lagged WHERE y1 IS NOT NULL AND x1 IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(ys) AS BIGINT) AS sy, CAST(SUM(y1) AS BIGINT) AS sy1,
        |    CAST(SUM(x1) AS BIGINT) AS sx1,
        |    CAST(SUM(ys * ys) AS BIGINT) AS syy, CAST(SUM(y1 * y1) AS BIGINT) AS sy1y1,
        |    CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1, CAST(SUM(ys * y1) AS BIGINT) AS syy1,
        |    CAST(SUM(ys * x1) AS BIGINT) AS syx1, CAST(SUM(y1 * x1) AS BIGINT) AS sy1x1
        |  FROM rows_),
        |cen AS (
        |  SELECT n,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
        |    CAST(sy1y1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sy1 / n AS cy1y1,
        |    CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n AS cx1x1,
        |    CAST(syy1 AS DOUBLE) - CAST(sy AS DOUBLE) * sy1 / n AS cyy1,
        |    CAST(syx1 AS DOUBLE) - CAST(sy AS DOUBLE) * sx1 / n AS cyx1,
        |    CAST(sy1x1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sx1 / n AS cy1x1
        |  FROM m),
        |ols AS (
        |  SELECT *, cyy - cyy1 * cyy1 / cy1y1 AS rss_r,
        |    cy1y1 * cx1x1 - cy1x1 * cy1x1 AS det
        |  FROM cen),
        |fit AS (
        |  SELECT *, (cyy1 * cx1x1 - cyx1 * cy1x1) / det AS b,
        |    (cyx1 * cy1y1 - cyy1 * cy1x1) / det AS c
        |  FROM ols),
        |fin AS (SELECT *, cyy - b * cyy1 - c * cyx1 AS rss_u FROM fit)
        |SELECT n, round(rss_r, 4) AS rss_r, round(rss_u, 4) AS rss_u,
        |  round((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat,
        |  (rss_r - rss_u) * (n - 3) / rss_u > 3.8415 AS reject_05
        |FROM fin""".stripMargin,

    "q_interarrival" ->
      """WITH gaps AS (
        |  SELECT (us - prev) // 1000000 AS gap_s FROM (
        |    SELECT epoch_us(ts) AS us,
        |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |    FROM events)
        |  WHERE prev IS NOT NULL),
        |census AS (SELECT gap_s, CAST(count(*) AS BIGINT) AS c FROM gaps GROUP BY gap_s),
        |tot AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(gap_s * c) AS BIGINT) AS sum_s
        |  FROM census),
        |cum AS (
        |  SELECT *, COALESCE(CAST(SUM(c) OVER (ORDER BY gap_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
        |  FROM census),
        |ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (50), (90), (99)) t(p))
        |SELECT p, CAST(MIN(gap_s) AS BIGINT) AS q_gap_sec, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(sum_s // n) AS BIGINT) AS mean_gap_sec
        |FROM cum, tot, ps
        |WHERE below + c >= (p * n + 99) // 100
        |GROUP BY p ORDER BY p""".stripMargin,

    "q_resid_diag" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(day) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(day * day) AS BIGINT) AS sxx,
        |    CAST(SUM(day * y) AS BIGINT) AS sxy, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM days),
        |fit AS (
        |  SELECT *, (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
        |    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b
        |  FROM m),
        |ab AS (SELECT *, CAST(sy AS DOUBLE) / n - b * (CAST(sx AS DOUBLE) / n) AS a FROM fit),
        |eq AS (
        |  SELECT n, syy, sy,
        |    CAST(floor((y - a - b * day) * 1000 + 0.5) AS BIGINT) AS eq,
        |    lag(CAST(floor((y - a - b * day) * 1000 + 0.5) AS BIGINT))
        |      OVER (ORDER BY day) AS eprev
        |  FROM days, ab),
        |agg_ AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(SUM(eq * eq) AS BIGINT) AS rss_sq,
        |    CAST(SUM(CASE WHEN eprev IS NOT NULL
        |                  THEN (eq - eprev) * (eq - eprev) ELSE 0 END) AS BIGINT) AS dnum,
        |    MAX(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) AS tss
        |  FROM eq)
        |SELECT n,
        |  round(1 - (CAST(rss_sq AS DOUBLE) / 1000000.0) / tss, 6) AS r2,
        |  CASE WHEN rss_sq > 0 THEN (dnum * 1000000) // rss_sq END AS dw_micro
        |FROM agg_""".stripMargin,

    "q_jarque_bera" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM days),
        |ws AS (SELECT n, n * x - sx AS w FROM days, n1),
        |mom AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(SUM(w * w) AS BIGINT) AS w2,
        |    CAST(SUM(w * w * w) AS BIGINT) AS w3,
        |    CAST(SUM(w * w * w * w) AS BIGINT) AS w4
        |  FROM ws),
        |g AS (
        |  SELECT n,
        |    CAST(w3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) / pow(CAST(w2 AS DOUBLE), 1.5) AS g1,
        |    CAST(w4 AS DOUBLE) * n / (CAST(w2 AS DOUBLE) * w2) AS g2
        |  FROM mom)
        |SELECT n, round(g1, 6) AS skew, round(g2, 6) AS kurtosis,
        |  round(n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4), 6) AS jb,
        |  n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4) > 5.9915 AS reject_05
        |FROM g""".stripMargin,

    "q_runs_test" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |mv AS (
        |  SELECT day, x, lag(x, 1) OVER (ORDER BY day) AS prev FROM days),
        |sg AS (
        |  SELECT day, CASE WHEN x > prev THEN 1 ELSE 0 END AS s
        |  FROM mv WHERE prev IS NOT NULL AND x <> prev),
        |sq AS (SELECT s, lag(s, 1) OVER (ORDER BY day) AS sprev FROM sg),
        |cnt AS (
        |  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN sprev IS NULL OR s <> sprev THEN 1 ELSE 0 END) AS BIGINT) AS runs
        |  FROM sq),
        |ev AS (
        |  SELECT *, (2.0 * CAST(n1 + n2 AS DOUBLE) + 1) / 3 AS e_runs,
        |    (16.0 * CAST(n1 + n2 AS DOUBLE) - 13) / 90 AS v_runs
        |  FROM cnt)
        |SELECT n1, n2, runs, round(e_runs, 6) AS e_runs,
        |  round((runs - e_runs) * (runs - e_runs) / v_runs, 6) AS z2,
        |  (runs - e_runs) * (runs - e_runs) / v_runs > 3.8415 AS reject_05
        |FROM ev""".stripMargin,

    "q_tost" -> {
      val dSql = sdivSql("s1 * n2 - s2 * n1", "n1 * n2")
      s"""WITH m AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
         |                       * CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN event_type = 'view'
         |                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(SUM(CASE WHEN event_type = 'view'
         |                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
         |                       * CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
         |  FROM events WHERE event_type IN ('click', 'view')),
         |fin AS (
         |  SELECT *,
         |    sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)) / n1
         |      + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)) / n2) AS se,
         |    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS dm
         |  FROM m)
         |SELECT n1, n2, $dSql AS diff_milli,
         |  round(se, 4) AS se_milli,
         |  round((dm + 2000.0) / se, 4) AS z_lo,
         |  round((dm - 2000.0) / se, 4) AS z_hi,
         |  (dm + 2000.0) / se > 1.6449 AND (dm - 2000.0) / se < -1.6449 AS equivalent_05
         |FROM fin""".stripMargin
    },

    "q_capture_recapture" ->
      """WITH uw AS MATERIALIZED (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |w0 AS (SELECT CAST(MIN(wk) AS BIGINT) AS w0 FROM uw),
        |a AS (SELECT user_id FROM uw, w0 WHERE wk = w0),
        |b AS (SELECT user_id FROM uw, w0 WHERE wk = w0 + 1),
        |n1_ AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM a),
        |n2_ AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM b),
        |m_ AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m FROM a
        |  WHERE user_id IN (SELECT user_id FROM b)),
        |tr AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_true FROM events)
        |SELECT n1, n2, m, n_true,
        |  CASE WHEN m > 0 THEN (n1 * n2) // m END AS lp_est,
        |  ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_est
        |FROM n1_, n2_, m_, tr""".stripMargin,

    "q_sprt" ->
      s"""WITH days AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM events GROUP BY 1),
         |llr AS (
         |  SELECT day, n, k, k * $SprtL1 + (n - k) * ($SprtL0) AS llr_micro FROM days),
         |cum AS (
         |  SELECT *, CAST(SUM(llr_micro) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_llr_micro
         |  FROM llr)
         |SELECT day, n, k, llr_micro, cum_llr_micro,
         |  CASE WHEN cum_llr_micro >= 2944439 THEN 'accept_h1'
         |       WHEN cum_llr_micro <= -2944439 THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM cum ORDER BY day""".stripMargin,

    "q_friedman" ->
      """WITH counts AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT dt.day, dt.event_type, COALESCE(c.cnt, 0) AS cnt
        |  FROM (SELECT d.day, t.event_type
        |        FROM (SELECT DISTINCT day FROM counts) d,
        |             (SELECT DISTINCT event_type FROM counts) t) dt
        |  LEFT JOIN counts c ON c.day = dt.day AND c.event_type = dt.event_type),
        |cells AS (
        |  SELECT day, cnt, CAST(count(*) AS BIGINT) AS t
        |  FROM grid GROUP BY day, cnt),
        |rk AS (
        |  SELECT day, cnt,
        |    2 * COALESCE(CAST(SUM(t) OVER (PARTITION BY day ORDER BY cnt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) + t + 1 AS r2
        |  FROM cells),
        |ranked AS (
        |  SELECT g.day, g.event_type, rk.r2
        |  FROM grid g JOIN rk ON g.day = rk.day AND g.cnt = rk.cnt),
        |pert AS (
        |  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rj2 FROM ranked GROUP BY event_type),
        |a2_ AS (
        |  SELECT CAST(SUM(r2 * r2) AS BIGINT) AS a2,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS k,
        |    CAST(count(DISTINCT day) AS BIGINT) AS n
        |  FROM ranked),
        |dev AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
        |    CAST(MAX(a2) AS BIGINT) AS a2,
        |    CAST(SUM((rj2 - n * (k + 1)) * (rj2 - n * (k + 1))) AS BIGINT) AS sdev2
        |  FROM pert, a2_)
        |SELECT n, k,
        |  round(CASE WHEN a2 - n * k * (k + 1) * (k + 1) > 0
        |    THEN (k - 1) * CAST(sdev2 AS DOUBLE) / (a2 - n * k * (k + 1) * (k + 1)) END, 6) AS chi2_f,
        |  CASE WHEN a2 - n * k * (k + 1) * (k + 1) > 0
        |    THEN (k - 1) * CAST(sdev2 AS DOUBLE) / (a2 - n * k * (k + 1) * (k + 1)) > 9.4877
        |    ELSE false END AS reject_05
        |FROM dev""".stripMargin,

    "q_permutation_test" -> {
      val dSql = sdivSql("s1 * m2 - s2 * m1", "m1 * m2")
      """WITH base AS MATERIALIZED (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('click', 'view')),
        |obs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN vm ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN vm ELSE 0 END) AS BIGINT) AS s2
        |  FROM base),
        |hashed AS (
        |  SELECT vm,
        |    concat(md5(concat(CAST(event_id AS VARCHAR), ':0')),
        |           md5(concat(CAST(event_id AS VARCHAR), ':1'))) AS hh
        |  FROM base),
        |reps AS (
        |  SELECT b,
        |    CAST(SUM(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN ga THEN vm ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(SUM(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN ga THEN 0 ELSE vm END) AS BIGINT) AS sb
        |  FROM (
        |    SELECT e.vm, r.b,
        |      ((strpos('0123456789abcdef', substr(e.hh, (r.b - 1) // 4 + 1, 1)) - 1)
        |       // (CASE (r.b - 1) % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END))
        |       % 2 = 1 AS ga
        |    FROM hashed e, (SELECT unnest(range(1, 257)) AS b) r)
        |  GROUP BY b
        |  HAVING SUM(CASE WHEN ga THEN 1 ELSE 0 END) > 0
        |     AND SUM(CASE WHEN ga THEN 0 ELSE 1 END) > 0),
        |fin AS (
        |  SELECT o.n1 AS m1, o.n2 AS m2, o.s1, o.s2,
        |    CAST(count(*) AS BIGINT) AS n_reps,
        |    CAST(SUM(CASE WHEN
        |      abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |      >= abs(CAST(o.s1 AS DOUBLE) / o.n1 - CAST(o.s2 AS DOUBLE) / o.n2)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_beat
        |  FROM reps, obs o
        |  GROUP BY o.n1, o.n2, o.s1, o.s2)
        |SELECT m1 AS n1, m2 AS n2,
        |""".stripMargin +
        s"  $dSql AS diff_milli,\n" +
        """  n_reps, n_beat,
          |  ((1 + n_beat) * 1000) // (n_reps + 1) AS p_milli,
          |  ((1 + n_beat) * 1000) // (n_reps + 1) < 50 AS reject_05
          |FROM fin""".stripMargin
    },

    "q_pot_gpd" ->
      """WITH vals AS (
        |  SELECT event_id, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
        |  FROM events),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
        |ranked AS (
        |  SELECT vm, CAST(row_number() OVER (ORDER BY vm, event_id) AS BIGINT) AS r
        |  FROM vals),
        |u AS (SELECT vm AS u FROM ranked, n1 WHERE r = (9 * n) // 10 + 1),
        |exc AS (
        |  SELECT u.u, vm - u.u AS y FROM vals, u WHERE vm > u.u),
        |mom AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS n_exceed,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM exc GROUP BY u),
        |fin AS (
        |  SELECT *, CAST(sy AS DOUBLE) / n_exceed AS m,
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_exceed) / (n_exceed - 1) AS s2
        |  FROM mom)
        |SELECT u AS u_milli, n_exceed,
        |  round(m, 4) AS mean_excess_milli,
        |  round(0.5 * (1 - m * m / s2), 6) AS xi,
        |  round(0.5 * m * (m * m / s2 + 1), 4) AS sigma_milli
        |FROM fin""".stripMargin,

    "q_mood_median" ->
      """WITH vals AS MATERIALIZED (
        |  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
        |  FROM events),
        |census AS (
        |  SELECT vm, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY vm),
        |n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM census),
        |cum AS (
        |  SELECT vm, c, CAST(SUM(c) OVER (ORDER BY vm
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM census),
        |med AS (
        |  SELECT vm AS med FROM cum, n1
        |  WHERE cum >= (n + 1) // 2 AND cum - c < (n + 1) // 2),
        |counts AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN vm > med THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |    CAST(SUM(CASE WHEN vm <= med THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
        |    CAST(MAX(med) AS BIGINT) AS median_milli
        |  FROM vals, med GROUP BY event_type),
        |tot AS (
        |  SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
        |    CAST(SUM(n_le) AS BIGINT) AS tl
        |  FROM counts)
        |SELECT event_type, median_milli, n_above, n_le,
        |  CAST(CASE WHEN ta = 0 OR tl = 0 THEN 0 ELSE floor((
        |    pow(n_above - CAST(n_above + n_le AS DOUBLE) * ta / (ta + tl), 2)
        |      / (CAST(n_above + n_le AS DOUBLE) * ta / (ta + tl)) +
        |    pow(n_le - CAST(n_above + n_le AS DOUBLE) * tl / (ta + tl), 2)
        |      / (CAST(n_above + n_le AS DOUBLE) * tl / (ta + tl))
        |  ) * 1000 + 0.5) END AS BIGINT) AS chi2_term_milli
        |FROM counts, tot ORDER BY event_type""".stripMargin
  )
}

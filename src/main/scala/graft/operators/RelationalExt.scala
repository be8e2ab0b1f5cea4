package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Extended relational surface: grouping variants (cube / grouping
  * sets / pivot), full outer join, approximate aggregates, and the two
  * "operators Spark lacks" — as-of join and range join — composed from
  * built-ins in their scalable form.
  *
  * Scale posture:
  *  - as-of join: the naive formulation is an inequality join
  *    (quadratic per key); this plan is the union+window technique —
  *    tag both sides, one shuffle on the key, one ordered pass with
  *    last_value(ignoreNulls). O(n log n) per key, no pair blowup,
  *    same technique Flink/kdb use for temporal joins.
  *  - range join: the band table is tiny → broadcast nested loop IS
  *    the right physical plan (each row tests 5 bands); were bands
  *    numerous, the bucket trick (equi-join on floor(value/width))
  *    bounds the fan-out.
  *  - approx aggregates: HyperLogLog++ / KLL-style sketches are the
  *    100 TB answer to countDistinct/percentile — mergeable partial
  *    state, no giant shuffle. Sketch internals differ per engine, so
  *    these register without SQL oracles (rows-only gate) and the
  *    error bound is pinned by RelationalExtSpec instead.
  */
object RelationalExt {
  type Q = (SparkSession, String) => DataFrame

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q_ewma lag weights: floor(1e6 · α(1−α)^j), α = 0.5, 8 lags —
    * micro-unit integers shared by the Spark plan and the oracle. */
  private val ewmaWeights: Seq[Long] =
    (0 until 8).map(j => Math.floor(1e6 * 0.5 * math.pow(0.5, j)).toLong)

  import graft.functions.SqlBridge.{sdiv, sdivSql}

  val queries: Map[String, Q] = Map(
    // BAND REVENUE (the TPC-H Q6 shape — the classic scan-only
    // predicate-pushdown probe): 1997 revenue from the 5–7% discount
    // band at small quantities, no join at all. The band predicate
    // tests the QUANTIZED centi-discount (exact on both engines —
    // never the raw double); revenue = price × discount in exact
    // cents×centi integers.
    "q_band_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1997 && col("l_quantity") < 24)
        .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("cd"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cp"))
        .filter(col("cd").between(5, 7))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("cp") * col("cd")).as("revenue_cc"))
    }),

    // MARKET SHARE (the TPC-H Q8 shape): of all revenue flowing to
    // ASIA-region customers, what permille is supplied from NATION_2,
    // by order year — two nation attaches on opposite ends of the
    // fact-fact join, share as one truncating DIV per year row.
    "q_market_share" -> ((s, d) => {
      val asiaCust = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, d)
        .join(Tables.nation(s, d).select(col("n_nationkey").as("s_nationkey"),
          col("n_name").as("supp_nation")), "s_nationkey")
        .select(col("s_suppkey"), col("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).cast("bigint").as("o_year"),
          col("supp_nation"),
          expr("""CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 | * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin)
            .as("rev"))
        .groupBy(col("o_year"))
        .agg(sum(col("rev")).as("total_cp"),
          sum(when(col("supp_nation") === "NATION_2", col("rev")).otherwise(0L))
            .as("nation_cp"))
        .withColumn("share_permille", expr("(nation_cp * 1000) DIV total_cp"))
        .orderBy(col("o_year"))
    }),

    // RETURNED-ITEM losses (the TPC-H Q10 shape): per-customer revenue
    // tied up in 'R'-flagged lines for H1-1997 orders, nation attached,
    // top-20 by lost revenue — the fact-fact orderkey shuffle with a
    // selective fact-side predicate and a TakeOrdered page.
    "q_returned_revenue" -> ((s, d) => {
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-07-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(expr(
          """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            | * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin))
          .as("revenue_cp"))
        .orderBy(col("revenue_cp").desc, col("c_custkey"))
        .limit(20)
    }),

    // PART/SUPPLIER census (the TPC-H Q16 shape; no partsupp table —
    // the supplier-part relation comes from lineitem, and the
    // "complaints" exclusion set is the deterministic s_suppkey % 7 = 0
    // stand-in): distinct suppliers per (brand, size), excluded
    // suppliers anti-joined out BEFORE the distinct count, top-20.
    "q_part_supplier_count" -> ((s, d) => {
      val excluded = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 7 === 0).select(col("s_suppkey"))
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(20)
    }),

    // EXCESS-SHIPMENT suppliers (the TPC-H Q20 shape; no partsupp
    // availability — the threshold is each (supplier, part)'s own
    // all-time shipped quantity): suppliers who pushed more than half
    // of a part's all-time volume in 1997 alone, counted per supplier,
    // top-20. The nested-subquery threshold becomes one aggregate with
    // an exact integer 2·q97 > qtot compare — no doubles, no HAVING
    // subquery.
    "q_excess_suppliers" -> ((s, d) => {
      val sp = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("qtot"),
          sum(when(year(col("l_shipdate")) === 1997,
            col("l_quantity").cast("bigint")).otherwise(0L)).as("q97"))
        .filter(lit(2L) * col("q97") > col("qtot"))
      sp.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_excess_parts"), sum(col("q97")).as("q97_total"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_excess_parts"), col("q97_total"))
        .orderBy(col("n_excess_parts").desc, col("s_suppkey"))
        .limit(20)
    }),

    // SHIPPING PRIORITY (the TPC-H Q3 shape): unshipped revenue of
    // BUILDING-segment orders placed before the cut that still have
    // lines shipping after it, top-10 by revenue. The classic
    // fact-fact orderkey shuffle with two dimension prunes; revenue
    // in exact cents×percent (the q_nation_volume idiom). The page is
    // TakeOrderedAndProject.
    "q_ship_priority" -> ((s, d) => {
      val cut = "1998-06-15 00:00:00"
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit(cut))),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit(cut))),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(expr(
          """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            | * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin))
          .as("revenue_cp"))
        .orderBy(col("revenue_cp").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ORDER-PRIORITY late-ship check (the TPC-H Q4 shape; the fixture
    // lineitem carries no commit/receipt dates, so "late" is shipped
    // > 90 days after the order date — the substitution changes the
    // predicate, not the EXISTS-semi plan): per priority, how many
    // Q1-1997 orders had at least one late line. LeftSemi on the
    // orderkey — the decorrelated EXISTS.
    "q_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // LATE-SHIPMENT priority mix (the TPC-H Q12 shape; no l_shipmode
    // in the fixture, so the classifier groups by l_returnflag): among
    // lines shipped > 60 days after their order date, how many belong
    // to critical (1-URGENT/2-HIGH) vs other orders — one join + one
    // conditional aggregate.
    "q_late_priority_mix" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // PROMO revenue share (the TPC-H Q14 shape): of one month's
    // revenue, what permille came from PROMO-type parts — exact
    // integers end-to-end: both numerator and denominator are
    // cents×percent BIGINT sums, the share is one truncating DIV
    // after the aggregate (identical on both engines).
    "q_promo_share" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-03-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .select(expr(
          """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            | * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin)
          .as("rev"), col("p_type"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L)).as("promo_cp"),
          sum(col("rev")).as("total_cp"))
        .select(col("promo_cp"), col("total_cp"),
          expr("(promo_cp * 1000) DIV total_cp").as("promo_permille"))
    }),

    // LARGE-VOLUME customers (the TPC-H Q18 shape): orders whose total
    // quantity exceeds 180, with their customer, top-20 by
    // (o_totalprice desc, o_orderkey). The HAVING-subquery form
    // becomes one aggregate + self-semi-join on the orderkey; quantity
    // is integral-as-double, so the BIGINT cast is exact.
    "q_big_orders" -> ((s, d) => {
      val bigKeys = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("total_qty"))
        .filter(col("total_qty") > 180L)
      Tables.orders(s, d)
        .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // DISCOUNTED bracket revenue (the TPC-H Q19 shape; the fixture
    // part has no container, so the brackets pair brand with size and
    // quantity ranges): three disjunctive (brand, size, qty) brackets
    // evaluated in ONE scan-side OR predicate — the query exists to
    // prove disjunctions stay a single pass, not three unions.
    "q_bracket_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 35)))
        .agg(count(lit(1)).as("n_lines"),
          sum(expr(
            """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              | * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin))
            .as("revenue_cp"))
    }),

    // CUBE: all 2^2 grouping combinations in one Expand + aggregate.
    "q_agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // GROUPING SETS through the SQL front door (temp view + spark.sql).
    "q_agg_groupingsets" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_type, user_id % 10 AS cohort, count(*) AS n
          |FROM events_v
          |GROUP BY GROUPING SETS ((event_type), (user_id % 10), (event_type, user_id % 10))
          |ORDER BY event_type NULLS FIRST, cohort NULLS FIRST""".stripMargin)
    }),

    // PIVOT: event_type → one count column per type, dense zeros.
    "q_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .na.fill(0, eventTypes)
        .orderBy(col("user_id"))),

    // FULL OUTER join: both unmatched sides preserved.
    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(asc_nulls_first("k"), asc_nulls_first("o_orderkey"))
    }),

    // As-of join (click → purchase attribution): for each purchase,
    // the user's most recent click at-or-before it. One shuffle on
    // user_id; clicks sort before purchases at equal ts ('c' < 'p').
    // Oracle caveat: among equal-ts clicks this plan picks the max
    // click_id while DuckDB ASOF picks an unspecified row — benign
    // here because no two same-user events share a microsecond
    // (verified on the fixtures), but a regenerated dataset with ties
    // would need a dedup-before-join on (user_id, ts).
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit("c").as("tag"),
          col("event_id").as("click_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit("p").as("tag"),
          lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
      val tagged = clicks.withColumn("purchase_id", lit(null).cast("long"))
        .unionByName(purch)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), coalesce(col("click_id"), col("purchase_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("tag") === "c", col("ts")), ignoreNulls = true).over(w))
        .filter(col("tag") === "p")
        .select(
          col("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("last_click").as("click_id"),
          unix_micros(col("last_click_ts")).as("click_us"))
        .orderBy(col("purchase_id"))
    }),

    // Range join: events banded by value against a tiny broadcast dim.
    "q_join_range" -> ((s, d) => {
      val bands = s.range(5).select(
        col("id").as("band_id"),
        (col("id") * 100).cast("double").as("lo"),
        ((col("id") + 1) * 100).cast("double").as("hi"))
      Tables.events(s, d)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("band_id"))
    }),

    // Approximate aggregates (no SQL oracle — sketch values are
    // engine-specific; RelationalExtSpec bounds the error vs exact).
    "q_approx_stats" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"))
        .orderBy(col("event_type"))),

    // Subqueries through the SQL front door: scalar (global avg),
    // EXISTS (correlated → Catalyst rewrites to a left-semi join), and
    // IN (uncorrelated → semi join on a broadcast 5-row set). The
    // scalar threshold is floor()ed to an integer so the cross-engine
    // float-fold-order difference in avg() (~1e-12) cannot flip a
    // boundary row.
    "q_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(
        """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
          |FROM customer c
          |WHERE c_acctbal > (SELECT floor(avg(c_acctbal)) FROM customer)
          |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
          |  AND EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Exact quantiles per group: sort-based percentile with linear
    // interpolation (rank = p·(n−1)), the same definition DuckDB's
    // quantile_cont uses. Interpolated midpoints of 2-decimal inputs
    // have ≤ 4 decimal digits, so round(4) is exact cross-engine. At
    // 100 TB the exact form needs a per-group sort; percentile_approx
    // (q_approx_stats) is the mergeable-sketch alternative.
    "q_quantile_exact" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.75)"), 4).as("p75"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy(col("event_type"))),

    // Winsorized robust statistics per group: exact P5/P95 cut points
    // (same interpolated percentile as q_quantile_exact), values
    // CLAMPED — not dropped — to the cuts, then a mean over the
    // clamped values. The standard outlier-robust aggregate for
    // heavy-tailed metric columns. Plan: one percentile aggregate
    // (per-group sort in the exact form; percentile_approx is the
    // 100 TB swap, as q_quantile_exact documents), broadcast the
    // per-group cuts back, one clamp + mean pass. Double sums are
    // fold-order-sensitive across engines, so the mean is taken over
    // centi-quantized values (floor(w·100) — exact integers, order-
    // free sum; Spark's cast-to-bigint truncates while DuckDB's
    // rounds, so the floor is explicit).
    "q_winsorize" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val cuts = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .withColumn("w", expr("least(greatest(value, lo), hi)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(expr("sum(cast(floor(w * 100) as bigint))") / expr("count(1)") / 100d, 4)
            .as("winsor_mean"),
          round(expr("min(w)"), 2).as("w_min"),
          round(expr("max(w)"), 2).as("w_max"))
        .orderBy(col("event_type"))
    }),

    // Ordered funnel analysis (view → click → purchase): the product-
    // analytics staple. Stage k's entry event is the user's FIRST
    // qualifying event strictly after their stage-(k−1) entry —
    // sequence encoded on event_id (unique, time-ordered), so the
    // whole funnel is exact integer MIN/COUNT arithmetic. Each stage
    // is one groupBy(user) aggregate plus one equi-join back on
    // user_id: the chain stays co-partitioned on the user key (one
    // shuffle establishes the partitioning; stages 2..k reuse it), and
    // per-stage state is one bigint per surviving user — at 100 TB the
    // events table streams through k filters, never a window sort.
    // MULTI-TOUCH attribution (last-touch vs linear credit) — the
    // marketing-analytics readout the funnel family feeds: each
    // purchase distributes credit over the user's clicks in the
    // preceding 24 h, by channel (the synthetic k % 4 of the props
    // payload — the q_json extraction reused as a dimension).
    // Last-touch gives the final click everything; linear splits an
    // exact 1e6-micro credit by truncating division (per-purchase
    // deterministic — no floats). Shape: one user-keyed join
    // (purchases × clicks co-partition on user_id; per-user windows
    // are calendar-bounded), per-purchase rank + count windows at
    // the purchase grain, a channel-grain final. Purchases with no
    // prior click take no row (direct conversions — stated).
    "q_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          expr("unix_micros(ts)").as("pus"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("cid"),
          expr("unix_micros(ts)").as("cus"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 4").as("channel"))
      val j = p.join(c, Seq("user_id"))
        .filter(col("cus") < col("pus") && col("cus") >= col("pus") - lit(86400000000L))
      j.withColumn("nclk", count(lit(1)).over(Window.partitionBy(col("pid"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("pid")).orderBy(col("cus").desc, col("cid").desc)))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_last"),
          sum(expr("1000000 DIV nclk")).as("linear_micro"))
        .orderBy(col("channel"))
    }),

    // FORECAST BACKTEST of the naive and seasonal-naive baselines —
    // the honesty check every fancier forecaster (q_holt, q_ewma,
    // q_seasonal) must beat before it ships: one-step MAE and sMAPE
    // of ŷ_t = y_{t-1} and ŷ_t = y_{t-7} over the OBSERVED daily
    // series (densify with q_gap_fill first if the calendar has
    // holes — stated contract). Per-row exact cents before the daily
    // sum; lags are windows over the calendar-bounded day series;
    // MAE/sMAPE are truncating integer divisions of exact sums —
    // no floats anywhere. Days where both forecasts exist score
    // (the max(lag1, lag7) warm-up is excluded symmetrically so the
    // two baselines are compared on the same days).
    "q_forecast_eval" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
        .groupBy(col("event_type"), col("day")).agg(sum(col("vc")).as("s"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("f1", lag(col("s"), 1).over(w))
        .withColumn("f7", lag(col("s"), 7).over(w))
        .filter(col("f1").isNotNull && col("f7").isNotNull)
        .select(col("event_type"),
          expr("abs(s - f1)").as("e1"), expr("abs(s - f7)").as("e7"),
          expr("CASE WHEN s + f1 > 0 THEN (abs(s - f1) * 2000000) DIV (s + f1) END").as("sm1"),
          expr("CASE WHEN s + f7 > 0 THEN (abs(s - f7) * 2000000) DIV (s + f7) END").as("sm7"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          expr("CAST(SUM(e1) AS BIGINT) DIV count(1)").as("mae_naive_c"),
          expr("CAST(SUM(e7) AS BIGINT) DIV count(1)").as("mae_snaive_c"),
          expr("CASE WHEN count(sm1) > 0 THEN CAST(SUM(sm1) AS BIGINT) DIV count(sm1) END")
            .as("smape_naive_micro"),
          expr("CASE WHEN count(sm7) > 0 THEN CAST(SUM(sm7) AS BIGINT) DIV count(sm7) END")
            .as("smape_snaive_micro"))
        .orderBy(col("event_type"))
    }),

    // EMPIRICAL-BAYES CTR smoothing (additive smoothing toward the
    // empirical prior mean, K = 100 pseudo-views — the
    // beta-binomial's fixed-strength special case): a rare item's
    // raw click-through rate is noise; shrinking it toward the
    // global rate by exactly K pseudo-observations is the standard
    // ranking-feature repair. item = the props k payload. All
    // arithmetic exact micro-unit BIGINT (global mean via truncating
    // div, shrunk = (c·1e6 + K·gm) DIV (v + K)) — the smoothed rate
    // is bit-stable however the item grain shuffles. One
    // (item)-grain aggregate + a broadcast 1-row global.
    "q_ctr_smoothing" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("item"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("ic"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("iv"))
      val items = ev.groupBy(col("item"))
        .agg(sum(col("ic")).as("clicks"), sum(col("iv")).as("views"))
      val g = ev.agg(sum(col("ic")).as("tc"), sum(col("iv")).as("tv"))
        .select(expr("(tc * 1000000) DIV tv").as("gm_micro"))
      items.crossJoin(broadcast(g))
        .select(col("item"), col("views"), col("clicks"),
          expr("CASE WHEN views > 0 THEN (clicks * 1000000) DIV views END").as("raw_micro"),
          expr("(clicks * 1000000 + 100 * gm_micro) DIV (views + 100)").as("shrunk_micro"))
        .orderBy(col("item"))
    }),

    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("event_type"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("event_id")).as("e1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("event_id") > col("e1"))
        .groupBy(col("user_id")).agg(min(col("event_id")).as("e2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("event_id") > col("e2"))
        .groupBy(col("user_id")).agg(min(col("event_id")).as("e3"))
      def stage(no: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("users")).select(
          lit(no).as("stage_no"), lit(name).as("stage"), col("users"))
      stage(1, "view", s1).unionByName(stage(2, "click", s2))
        .unionByName(stage(3, "purchase", s3))
        .orderBy(col("stage_no"))
    }),

    // Funnel stage-transition timing — the duration dimension q_funnel
    // lacks (conversion-latency SLAs, "how long from view to
    // purchase"): per converting user, the microsecond gap between
    // stage-entry events, summarized as exact ×2-scaled integer
    // medians plus max. Entry events are the q_funnel min-event_id
    // chain (event_id is ts-monotone in the fixture — stated
    // precondition); their timestamps attach by event_id equi-join, so
    // everything stays co-partitioned on user_id/event_id keys and the
    // final summary is one partial+final aggregate over
    // converting-user-grain rows.
    "q_funnel_time" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("event_id")).as("e1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("event_id") > col("e1"))
        .groupBy(col("user_id"), col("e1")).agg(min(col("event_id")).as("e2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("event_id") > col("e2"))
        .groupBy(col("user_id"), col("e1"), col("e2")).agg(min(col("event_id")).as("e3"))
      val ts = ev.select(col("event_id"), col("us"))
      val durs = s3
        .join(ts.select(col("event_id").as("e1"), col("us").as("us1")), Seq("e1"))
        .join(ts.select(col("event_id").as("e2"), col("us").as("us2")), Seq("e2"))
        .join(ts.select(col("event_id").as("e3"), col("us").as("us3")), Seq("e3"))
        .select((col("us2") - col("us1")).as("d12"), (col("us3") - col("us2")).as("d23"))
      durs.agg(count(lit(1)).as("n_converted"),
        expr("CAST(2 * percentile(d12, 0.5D) AS BIGINT)").as("med2_view_click_us"),
        expr("CAST(2 * percentile(d23, 0.5D) AS BIGINT)").as("med2_click_purchase_us"),
        max(col("d12")).as("max_view_click_us"),
        max(col("d23")).as("max_click_purchase_us"))
    }),

    // First-order Markov transition matrix over per-user event
    // sequences (next-event prediction, anomalous-flow detection): one
    // lead() window sequenced on event_id, one count aggregate, then
    // transition probabilities in exact fixed-point (micro-units,
    // truncating div) computed over the TRANSITION-MATRIX-sized
    // aggregate — |event_types|² rows, driver-scale, so the per-src
    // totals window costs nothing. At 100 TB: one user_id shuffle for
    // the window, one (src,dst) shuffle for counts.
    "q_markov" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """WITH t AS (
          |  SELECT event_type AS src,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
          |  FROM events),
          |m AS (
          |  SELECT src, dst, count(*) AS n FROM t
          |  WHERE dst IS NOT NULL GROUP BY src, dst)
          |SELECT src, dst, n,
          |  (n * 1000000L) DIV (SUM(n) OVER (PARTITION BY src)) AS p_micro
          |FROM m ORDER BY src, dst""".stripMargin)
    }),

    // MANN-KENDALL trend test (Mann 1945; Kendall 1975) per event-type
    // daily series — the NONPARAMETRIC monotone-trend gate completing
    // the time-series family (q_holt smooths, q_autocorr measures
    // seasonality, q_changepoint locates a level shift, q_cusum alarms
    // online; MK answers "is there a trend AT ALL", with no normality
    // or linearity assumption): S = Σ_{i<j} sgn(x_j − x_i) over the
    // DAY-GRAIN series, tie-corrected variance
    // var = (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, and the continuity-
    // corrected z² = 18·(|S|−1)²·10⁶ DIV (n(n−1)(2n+5) − T) — every
    // term an exact non-negative integer, both engines walk the same
    // BIGINTs. The O(n²) pair join runs at day grain (n = observation
    // days — bounded by the calendar, NEVER by corpus size; a decade
    // is 3 653 rows), which is the standard MK deployment shape.
    "q_mann_kendall" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .ckpt() // pair join + tie census + n share one build
      val pairs = days.as("a").join(days.as("b"),
          expr("a.event_type = b.event_type AND a.day < b.day"))
        .groupBy(expr("a.event_type").as("event_type"))
        .agg(sum(expr("CAST(sign(b.c - a.c) AS BIGINT)")).as("s"))
      val ties = days.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("ties_t"), sum(col("t")).as("n"))
      pairs.join(ties, Seq("event_type"))
        .withColumn("var18", expr("n * (n - 1) * (2 * n + 5) - ties_t"))
        .withColumn("z2_micro", expr(
          """CASE WHEN abs(s) >= 1 AND var18 > 0
            |  THEN (18 * (abs(s) - 1) * (abs(s) - 1) * 1000000) DIV var18
            |  ELSE 0 END""".stripMargin))
        .withColumn("trend", expr(
          "CASE WHEN z2_micro <= 3841500 THEN 'none' WHEN s > 0 THEN 'up' ELSE 'down' END"))
        .select(col("event_type"), col("n"), col("s"), col("ties_t"),
          col("z2_micro"), col("trend"))
        .orderBy(col("event_type"))
    }),

    // THEIL-SEN robust slope (Theil 1950; Sen 1968) per event-type
    // daily series — the estimator that pairs with q_mann_kendall the
    // way q_linear_fit pairs with q_t_test: OLS's slope is wrecked by
    // a single outlier day; the MEDIAN of all pairwise slopes has a
    // 29.3% breakdown point and is the line you draw once MK says
    // "trend". Pairwise slopes quantize via the shared sign-safe
    // division ([[sdiv]] — slopes go negative), and the median
    // reports in the ×2-scaled exact-integer form (q_funnel_time's
    // med2 idiom: percentile(0.5) of integers is either an integer or
    // a half, so 2× is always exact). Same day-grain O(n²) posture as
    // MK — bounded by the calendar.
    "q_theil_sen" -> ((s, d) => {
      val days = Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      days.as("a").join(days.as("b"),
          expr("a.event_type = b.event_type AND a.day < b.day"))
        .select(expr("a.event_type").as("event_type"),
          expr(sdiv("(b.c - a.c) * 1000", "b.day - a.day")).as("slope_milli"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("CAST(2 * percentile(slope_milli, 0.5D) AS BIGINT)").as("med2_slope_milli"))
        .orderBy(col("event_type"))
    }),

    // EVENTUALLY-FOLLOWS sequence mining (the GSP/PrefixSpan length-2
    // primitive and process-mining's follows-relation): for each
    // ordered type pair (a, b), how many users ever do a THEN LATER b
    // — q_markov counts ADJACENT transitions; this counts eventual
    // precedence, which is what funnel discovery and process-map
    // mining actually need. Per user the whole sequence collapses to
    // ≤ |types| (first_ts, last_ts) spans, because "a eventually
    // precedes b" ⟺ min_ts(a) < max_ts(b) — the span reduction that
    // makes the operator scale-free: the pair join runs at (user ×
    // type) grain (≤ 5 rows/user), never over raw events. Support =
    // users(a→b)/users, confidence = users(a→b)/users(a), both exact
    // micro shares.
    //
    // Scale posture: ONE (user, type) aggregate over the stream,
    // localCheckpoint-materialized and consumed FOUR ways (both join
    // sides, the per-type margin, the user total) — the raw events
    // scan once; the per-user self-join fans out ≤ |types|² = 25 rows
    // per user; the report is |types|²-grain. The 1-row user total
    // broadcasts.
    "q_seq_pairs" -> ((s, d) => {
      val spans = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(expr("unix_micros(ts)")).as("lo"), max(expr("unix_micros(ts)")).as("hi"))
        .ckpt()
      val users = spans.select(col("user_id")).distinct().agg(count(lit(1)).as("n_users"))
      val hasA = spans.groupBy(col("event_type")).agg(count(lit(1)).as("n_a"))
      val follows = spans.as("x").join(spans.as("y"),
          expr("x.user_id = y.user_id AND x.event_type <> y.event_type AND x.lo < y.hi"))
        .select(expr("x.event_type").as("a"), expr("y.event_type").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_follow"))
      follows
        .join(hasA.select(col("event_type").as("a"), col("n_a")), Seq("a"))
        .crossJoin(broadcast(users))
        .withColumn("support_micro", expr("(n_follow * 1000000) DIV n_users"))
        .withColumn("conf_micro", expr("(n_follow * 1000000) DIV n_a"))
        .select(col("a"), col("b"), col("n_follow"), col("support_micro"), col("conf_micro"))
        .orderBy(col("a"), col("b"))
    }),

    // Day-of-week seasonality profile (the decomposition baseline for
    // traffic forecasting and anomaly context): per (event_type, dow)
    // volume and mean value. Day-of-week from pure integer epoch-day
    // arithmetic ((days + 3) % 7, Monday = 0 — engine-independent,
    // unlike dayofweek()'s Sunday-origin disagreements); one
    // partial+final aggregate; means as exact fixed-point micro-units
    // via truncating division.
    "q_seasonal" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          expr("(unix_micros(ts) DIV 86400000000 + 3) % 7").as("dow"),
          expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_milli"))
        .withColumn("mean_micro", expr("(sum_milli * 1000) DIV n"))
        .orderBy(col("event_type"), col("dow"))
    }),

    // Cohort retention: users bucketed by first-active day, activity
    // counted per (cohort, day-offset) — the growth-analytics staple.
    // Days are integer epoch-day quotients (exact in both engines);
    // the plan is two aggregates plus one user_id equi-join, all
    // co-partitioned on the user key.
    "q_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.distinct().join(cohort, "user_id")
        .withColumn("offset_days", col("day") - col("cohort_day"))
        .groupBy(col("cohort_day"), col("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("offset_days"))
    }),

    // Robust outlier detection (median/MAD): flag values more than
    // 3 MADs from their group median — the robust z-score that, unlike
    // mean/stddev, is not dragged by the outliers it is hunting. Two
    // exact interpolated percentiles (one over values, one over
    // absolute deviations — each a partial+final aggregate at scale),
    // medians broadcast back, MAP-ONLY flagging.
    //
    // Fixed-point throughout (quantize-once recipe): values quantize
    // to milli-unit BIGINTs BEFORE the percentiles, so the median is
    // either an integer or a half-integer — a+0.5*(b−a) over integer
    // pairs is exact in IEEE double in both engines — and ×2 makes it
    // an exact BIGINT (m2 = 2·median-milli, mad4 = 2·median of
    // |2v−m2|). The 3-MAD outlier predicate is then the pure-integer
    // comparison 2·|2v−m2| > 3·mad4; nothing downstream of the
    // boundary quantization touches a raw double, so a 1-ulp
    // interpolation difference between engines cannot flip a count.
    "q_anomaly_mad" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("CAST(2 * percentile(vm, 0.5D) AS BIGINT)").as("m2"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(expr("CAST(2 * percentile(abs(2 * vm - m2), 0.5D) AS BIGINT)").as("mad4"))
      ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(expr("2 * abs(2 * vm - m2) > 3 * mad4"), 1L).otherwise(0L)).as("n_outliers"),
          // centi-units from the exact integers: m2 is value×2000, so
          // /20 (mad4 is ×4000, /40); floor(double division) is exact
          // here — the quotient is a multiple of 1/20 (1/40), never
          // within an ulp of a wrong integer.
          expr("CAST(floor(CAST(any_value(m2) AS DOUBLE) / 20) AS BIGINT)").as("med_centi"),
          expr("CAST(floor(CAST(any_value(mad4) AS DOUBLE) / 40) AS BIGINT)").as("mad_centi"))
        .orderBy(col("event_type"))
    }),

    // Per-group OLS linear fit (trend estimation) AS A SINGLE-PASS
    // AGGREGATE — the method-of-moments form (n, Σx, Σy, Σxy, Σx²)
    // that MLlib's summarizers use: all five moments are exact BIGINT
    // sums (x = epoch-day offset from a fixed 19700 base so products
    // stay far under 2⁶³ — DuckDB errors on overflow; y = milli-
    // quantized value), partial-aggregation-safe and order-free. The
    // ONLY floating-point ops are the final slope/intercept divisions
    // of identical exact integers — IEEE division is correctly
    // rounded, so both engines produce the same double bit-for-bit.
    // At 100 TB this is one partial+final aggregate; no window, no
    // second pass, no collect.
    "q_linear_fit" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000 - 19700").as("x"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("y"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_milli", round(expr(
          "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"), 4))
        .withColumn("intercept_milli", round(expr(
          "(sy - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n"), 4))
        .select(col("event_type"), col("n"), col("slope_milli"), col("intercept_milli"))
        .orderBy(col("event_type"))
    }),

    // Two-proportion z-test over a deterministic 50/50 experiment split
    // (user_id parity — the hash-based assignment an experimentation
    // platform would persist): per-arm user counts and conversion
    // (≥1 purchase over 150 — raw purchase incidence saturates at 1.0
    // on this fixture, which degenerates the pooled variance to zero)
    // from one user-grain aggregate, then the pooled
    // z-statistic. Integer counts end-to-end; the z expression is the
    // same AST in both engines over identical exact inputs, and IEEE
    // division/sqrt are correctly rounded — bit-equal doubles. One
    // user_id shuffle + a 2-row conditional aggregate; nothing
    // collects.
    "q_abtest" -> ((s, d) => {
      val users = Tables.events(s, d).select(col("user_id"), col("event_type"), col("value"))
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150, 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm", col("user_id") % 2)
      users.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c1"))
        .withColumn("p0_r", round(expr("CAST(c0 AS DOUBLE) / n0"), 4))
        .withColumn("p1_r", round(expr("CAST(c1 AS DOUBLE) / n1"), 4))
        .withColumn("z", round(expr(
          "(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) / " +
            "sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) " +
            "* (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1))"), 4))
        .select(col("n0"), col("c0"), col("n1"), col("c1"),
          col("p0_r"), col("p1_r"), col("z"))
    }),

    // CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) — the
    // experimentation-platform technique that cut A/B test runtimes
    // industry-wide: adjust each user's experiment-period metric by
    // their PRE-period baseline, adj = post − θ·(pre − mean_pre) with
    // θ the pooled OLS slope; the adjusted mean is unbiased for the
    // treatment effect while its variance shrinks by the squared
    // pre/post correlation. EXACT integer trajectory: deci-unit
    // metrics, θ in micro from the moment sums via a SIGN-SAFE
    // truncating division ([[sdiv]] — Spark's DIV truncates toward
    // zero, DuckDB's // floors, so every division whose numerator can
    // go negative routes through the shared CASE form; the overflow
    // envelope is sized in deci units so n·Σadj² ≪ 2⁶³ at sf0.1).
    // Report grain: the arm — post mean, adjusted mean, both variance
    // numerators, and the achieved reduction in micro.
    //
    // Scale posture: one user-grain aggregate (the pre/post split
    // piggybacks on it via conditional sums against the broadcast
    // 1-row midpoint), one 1-row moment aggregate for θ, then a 2-row
    // arm rollup. Nothing collects; raw events shuffle once.
    "q_cuped" -> ((s, d) => {
      val bounds = Tables.events(s, d)
        .agg(expr("(min(unix_micros(ts) DIV 3600000000) + max(unix_micros(ts) DIV 3600000000) + 1) DIV 2")
          .as("mid"))
      val users = Tables.events(s, d)
        .crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(
          sum(when(expr("unix_micros(ts) DIV 3600000000 < mid"),
            expr("CAST(floor(value * 10 + 0.5) AS BIGINT)")).otherwise(0L)).as("pre"),
          sum(when(expr("unix_micros(ts) DIV 3600000000 >= mid"),
            expr("CAST(floor(value * 10 + 0.5) AS BIGINT)")).otherwise(0L)).as("post"))
        .withColumn("arm", col("user_id") % 2)
      val mom = users.agg(count(lit(1)).as("n"), sum(col("pre")).as("sp"),
        sum(col("post")).as("so"), sum(expr("pre * pre")).as("spp"),
        sum(expr("pre * post")).as("spo"))
        .selectExpr("n", "sp",
          "n * spo - sp * so AS cov_num",
          "n * spp - sp * sp AS var_num")
        .selectExpr("n", "sp",
          sdiv("cov_num", "nullif(var_num DIV 1000000, 0)") + " AS theta_micro")
      val adj = users.crossJoin(broadcast(mom))
        .withColumn("adj", expr(
          "post - " + sdiv("theta_micro * (pre - sp DIV n)", "1000000")))
      adj.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          max(col("theta_micro")).as("theta_micro"),
          expr("sum(post) DIV count(*)").as("mean_post_deci"),
          expr(sdiv("sum(adj)", "count(*)") + " AS mean_adj_deci"),
          expr("count(*) * sum(post * post) - sum(post) * sum(post)").as("var_post_num"),
          expr("count(*) * sum(adj * adj) - sum(adj) * sum(adj)").as("var_adj_num"))
        .withColumn("red_micro",
          expr(sdiv("(var_post_num - var_adj_num) * 1000000", "nullif(var_post_num, 0)")))
        .select(col("arm"), col("n_users"), col("theta_micro"), col("mean_post_deci"),
          col("mean_adj_deci"), col("var_post_num"), col("var_adj_num"), col("red_micro"))
        .orderBy(col("arm"))
    }),

    // SAMPLE-RATIO MISMATCH gate (the experimentation-hygiene check
    // that runs BEFORE q_abtest's z-test is allowed to mean anything;
    // Fabijan et al. 2019 report ~6% of experiments fail it): χ²
    // goodness-of-fit of the observed arm split against the declared
    // 50/50, per assignment scheme. Two schemes audited side by side —
    // the healthy user_id % 2 split and a deliberately broken
    // user_id % 10 < 6 split (a bugged bucketing function, the classic
    // SRM root cause) — so the gate provably fires on the bad one and
    // stays quiet on the good one. For equal expected counts the χ²
    // statistic collapses to (n0 − n1)²/(n0 + n1): EXACT integers in
    // micro, compared against the χ²₁ 95% critical value 3.841 as a
    // micro literal. One user-grain aggregate per scheme (distinct
    // users shuffle once; the χ² arithmetic is 1-row).
    "q_ab_srm" -> ((s, d) => {
      val users = Tables.events(s, d).select(col("user_id")).distinct()
      def srm(tag: String, armExpr: String): DataFrame =
        users.selectExpr(s"$armExpr AS arm")
          .agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n1"))
          .selectExpr(s"'$tag' AS scheme", "n0", "n1",
            "((n0 - n1) * (n0 - n1) * 1000000) DIV (n0 + n1) AS chi2_micro")
          .selectExpr("scheme", "n0", "n1", "chi2_micro",
            "chi2_micro > 3841000 AS srm")
      srm("mod2", "user_id % 2")
        .unionByName(srm("biased", "CASE WHEN user_id % 10 < 6 THEN 0 ELSE 1 END"))
        .orderBy(col("scheme"))
    }),

    // Empirical-Bayes smoothed per-user purchase rate — the
    // smoothed-CTR primitive behind ranking features and cold-start
    // reporting: a raw rate over a handful of events is noise, so
    // shrink toward the corpus prior with pseudo-count K = 20
    // (beta-binomial posterior mean: (conv + K·p̂)/(n + K)); heavy
    // users keep their own rate, sparse users inherit the prior. EXACT
    // integers end-to-end: the global rate p̂ and both outputs are
    // micro-units via truncating division on non-negatives (where
    // Spark DIV ≡ DuckDB //). One user-grain partial+final aggregate +
    // a 1-row broadcast global; nothing collects, at 100 TB this is
    // the q_auc totals pattern.
    "q_bayes_rate" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("cv"))
      val per = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cv")).as("conv"))
      val glob = ev.agg(expr("(sum(cv) * 1000000) DIV count(*)").as("p_micro"))
      per.crossJoin(broadcast(glob))
        .withColumn("raw_micro", expr("(conv * 1000000) DIV n"))
        .withColumn("smoothed_micro",
          expr("(conv * 1000000 + 20 * p_micro) DIV (n + 20)"))
        .select(col("user_id"), col("n"), col("conv"),
          col("raw_micro"), col("smoothed_micro"))
        .orderBy(col("user_id"))
    }),

    // Bounded-horizon EWMA (exponentially-weighted moving average) per
    // user — the time-series smoothing primitive (monitoring, feature
    // engineering for event models). The textbook recursive form
    // s_t = α·x_t + (1−α)·s_{t−1} is inherently sequential; the
    // scalable form truncates the tail (weights α(1−α)^j decay
    // geometrically — 8 lags at α=0.5 captures 99.6% of the mass) so
    // it becomes a FIXED window expression: one shuffle on user_id,
    // then map-side lag arithmetic. Fixed-point throughout: values
    // quantize to milli-units, weights are micro-unit integer
    // literals, the EWMA is an exact BIGINT in nano-units — both
    // engines agree bit-for-bit, and the sum order is fixed by the
    // expression tree.
    "q_ewma" -> ((s, d) => {
      val terms = ewmaWeights.zipWithIndex.map { case (w, j) =>
        s"$w * coalesce(lag(value_milli, $j) OVER w, 0L)"
      }.mkString(" + ")
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        s"""SELECT event_id, user_id, value_milli, $terms AS ewma_nano
           |FROM (SELECT event_id, user_id,
           |        CAST(floor(value * 1000) AS BIGINT) AS value_milli
           |      FROM events)
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
           |ORDER BY event_id""".stripMargin)
    }),

    // Heavy hitters (tokens above 2% RELATIVE support — scale-free, so
    // the query is meaningful at every SF): the exact form — ONE
    // partial+final count aggregate over (token), a single-row total
    // derived from the same aggregate (no second corpus scan), then
    // the support filter. At 100 TB this shape works because the
    // aggregate is mergeable and the output is support-bounded
    // (≤ 1/θ rows by definition); the sketch alternative
    // (Misra–Gries / df.stat.freqItems) trades exactness for fixed
    // memory and is pinned by spec as a SUPERSET of this result
    // (sketches over-report support, never under-report).
    "q_heavy_hitters" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(expr("split(text, ' ')")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(total))
        .filter(col("n") * 50 >= col("total"))
        .select(col("token"), col("n"))
        .orderBy(col("n").desc, col("token"))
    }),

    // Mergeable HLL sketches (Apache DataSketches, built into Spark
    // 3.5+): per-(event_type, day) sketches built in one pass, then
    // UNIONED — not recomputed — into per-type monthly distincts. This
    // is THE 100 TB distinct-counting shape: daily sketch builds
    // parallelize and persist (KB each), and any rollup (weekly,
    // monthly, all-time) is a cheap union of sketches instead of a
    // rescan of raw data. No DuckDB oracle (sketch internals are
    // engine-specific); the spec pins the estimates to exact counts.
    "q_hll_union" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("daily_sketch"))
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("daily_sketch"))).cast("long")
          .as("monthly_users"), count(lit(1)).as("n_days"))
        .orderBy(col("event_type"))),

    // Correlated LATERAL subquery join — Catalyst decorrelates the
    // per-row subquery into a join (DecorrelateInnerQuery), so the
    // "loop over customers, query orders each time" shape executes as
    // one set-based plan. The aggregate form (max/count per customer)
    // is the decorrelation-friendly variant.
    "q_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, t.max_price, t.n_orders
          |FROM customer c,
          |LATERAL (SELECT max(o_totalprice) AS max_price,
          |                CAST(count(*) AS BIGINT) AS n_orders
          |         FROM orders o WHERE o.o_custkey = c.c_custkey) t
          |WHERE t.n_orders > 0
          |ORDER BY c_custkey""".stripMargin)
    }),

    // RECURSIVE CTE (Spark 4's UnionLoop operator — SQL-standard
    // WITH RECURSIVE): each customer's ancestor chain in the synthetic
    // halving hierarchy parent(k) = k DIV 2, rolled up to depth and
    // chain mass per customer. This is the SQL-surface recursion a
    // warehouse user expects for bounded-depth hierarchies (org
    // charts, BOM levels, referral trees): the loop materializes one
    // frame per level, so the cost is depth × scan — right for
    // log-depth trees. For UNBOUNDED closure (web-scale dup graphs)
    // the alternating-star CC remains the plan: O(log² n) rounds of
    // shrinking edge frames, not depth-many full-frontier unions —
    // the comparison q_concomp/q_dedup_cluster already encode.
    // Oracle = the SAME SQL text in DuckDB (DIV spelled //, sum cast
    // out of HUGEINT), so the recursion trajectory itself is
    // hash-compared.
    "q_recursive_cte" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"))
        .createOrReplaceTempView("rc_customer")
      s.sql(
        """WITH RECURSIVE chain(k, anc, depth) AS (
          |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM rc_customer
          |  UNION ALL
          |  SELECT k, anc DIV 2, depth + 1 FROM chain WHERE anc > 1)
          |SELECT k AS c_custkey, max(depth) AS depth,
          |  CAST(sum(anc) AS BIGINT) AS chain_sum
          |FROM chain GROUP BY k ORDER BY c_custkey""".stripMargin)
    }),

    // RANGE-mode window frame: the frame is a VALUE interval (all peers
    // within 50.0 below the current row's value), not a row count —
    // tie-safe by construction because RANGE includes all peers.
    "q_window_range" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """SELECT event_id, event_type, round(value, 2) AS value,
          |  count(*) OVER w AS n_near,
          |  round(sum(value) OVER w, 2) AS sum_near
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY value
          |             RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    }),

    // Distribution window functions: percent_rank / cume_dist / ntile
    // over a per-status price ordering made total by the unique
    // orderkey tiebreak (no peer groups → both engines agree exactly).
    "q_window_dist" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_orderkey"))
    }),

    // Ordered string aggregation (LISTAGG): deterministic via
    // sort_array before join — same multiset, same order, same string
    // in both engines.
    "q_string_agg" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_acctbal") > 9900)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          array_join(sort_array(collect_list(col("c_name"))), ",").as("names"))
        .orderBy(col("n_name"))),

    // CDC change-log materialization: apply an (op, seq) change stream
    // to a base snapshot — the batch core of every lakehouse MERGE /
    // Debezium-style apply. The log here is derived deterministically
    // from orders (key = o_custkey, seq = o_orderkey, every 11th a
    // DELETE, value = o_totalprice); real pipelines swap the source.
    // Semantics: latest-by-seq wins per key (arg_max over the unique
    // seq — ONE partial+final aggregate, no window sort), DELETE
    // removes the key, UPDATE replaces the value, untouched base rows
    // pass through. 100 TB posture: the aggregate shuffles the LOG
    // (the small, recent side), and the base join is a plain equi-join
    // AQE will broadcast whenever the compacted delta is small — the
    // snapshot itself never re-sorts.
    "q_cdc_apply" -> ((s, d) => {
      val log = Tables.orders(s, d).select(
        col("o_custkey").as("key"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 11 === 0, "D").otherwise("U").as("op"),
        col("o_totalprice").as("val"))
      val last = log.groupBy(col("key")).agg(
        max_by(col("op"), col("seq")).as("op"),
        max_by(col("val"), col("seq")).as("val"))
      Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
        .join(last, col("c_custkey") === col("key"), "left")
        .filter(coalesce(col("op"), lit("U")) =!= "D")
        .select(col("c_custkey"),
          round(coalesce(col("val"), col("c_acctbal")), 2).as("balance"),
          col("op").isNotNull.as("changed"))
        .orderBy(col("c_custkey"))
    }),

    // SCD Type-2 dimension build: each customer's order stream becomes
    // a versioned history — valid_from = this version's date, valid_to
    // = the next version's date (NULL ⇒ current row). The standard
    // warehouse pattern for change tracking, expressed as one window
    // over the natural key: a single shuffle on o_custkey, and both
    // lead() calls share that one sort. Attributes pass through
    // untouched (no arithmetic ⇒ no float-parity risk).
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("version"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"),
          col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("version"))
    }),

    // Point-in-time join (the feature-store staple): each fact row
    // joined to the SCD2 dimension version that was valid AT the
    // fact's event date — the join that prevents feature leakage in
    // training-data assembly. NOT an inequality join (which explodes
    // into a range-join blowup at scale): the q_join_asof technique —
    // union dim-change rows and fact rows on the entity key, one sort
    // per key by (date, dim-before-fact, version), and a running
    // last-non-null carries each version to exactly the facts it was
    // current for. One shuffle on the entity key; facts predating the
    // first version keep NULL dim attributes (left semantics).
    "q_pit_join" -> ((s, d) => {
      val wv = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val dim = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("version", row_number().over(wv).cast("long"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("dt"),
          lit(0).as("tag"), col("version"), col("o_totalprice").as("dim_totalprice"),
          lit(null).cast("long").as("l_orderkey"), lit(null).cast("long").as("l_linenumber"))
      val facts = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k"), col("l_shipdate").as("dt"),
          lit(1).as("tag"), lit(null).cast("long").as("version"),
          lit(null).cast("double").as("dim_totalprice"),
          col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("dt"), col("tag"), col("version"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dim.unionByName(facts)
        .withColumn("v_pit", last(col("version"), ignoreNulls = true).over(w))
        .withColumn("tp_pit", last(col("dim_totalprice"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("k").as("o_custkey"),
          col("dt").as("l_shipdate"), col("v_pit").as("version"),
          col("tp_pit").as("dim_totalprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Two-sample Kolmogorov–Smirnov test (distribution-drift gate —
    // the standard check that this month's training batch still looks
    // like last month's): D = sup |F̂₁(v) − F̂₂(v)| between the 'click'
    // and 'view' value distributions. EXACT INTEGER throughout: values
    // quantize to milli-units, the two ECDFs are running integer
    // counts, and the sup comparison is done on the common numerator
    // |c₁·n₂ − c₂·n₁| (D = that / n₁n₂), so no float ever enters the
    // trajectory until the final reporting division — identical ASTs
    // over identical exact integers give bit-equal doubles in both
    // engines (the q_linear_fit recipe). Bounds: c·n ≤ (10⁵)² ≪ 2⁶³.
    //
    // Scale posture: one milli-value aggregate collapses the stream to
    // ≤ |value domain| distinct points BEFORE the ordered cumulative
    // window, so the single-partition prefix sum runs over the bounded
    // distinct-value table, not the event stream (and the running sum
    // could be two-phased per partition if the domain ever outgrew
    // that). The n₁/n₂ totals ride a broadcast 1-row aggregate.
    "q_ks_test" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
      val pts = ev.groupBy(col("vm")).agg(sum(col("ia")).as("a"), sum(col("ib")).as("b"))
      val w = Window.orderBy(col("vm"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pts.select(col("vm"),
        sum(col("a")).over(w).as("c1"), sum(col("b")).over(w).as("c2"))
      val tot = ev.agg(sum(col("ia")).as("n1"), sum(col("ib")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .select(abs(col("c1") * col("n2") - col("c2") * col("n1")).as("dn"),
          col("n1"), col("n2"))
        .groupBy(col("n1"), col("n2")).agg(max(col("dn")).as("d_num"))
        .withColumn("d_micro", expr("(d_num * 1000000) DIV (n1 * n2)"))
        .withColumn("ks_d", round(expr("CAST(d_num AS DOUBLE) / (n1 * n2)"), 6))
        // Smirnov large-sample critical value at α=0.05 (c(α)=1.358)
        .withColumn("reject_05", expr(
          "CAST(d_num AS DOUBLE) / (n1 * n2) > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (n1 * n2))"))
        .select(col("n1"), col("n2"), col("d_num"), col("d_micro"),
          col("ks_d"), col("reject_05"))
    }),

    // POPULATION STABILITY INDEX between the 'click' and 'view' value
    // distributions — the fourth drift gate next to q_ks_test
    // (continuous sup-distance), q_chi2 (categorical), q_t_test
    // (mean shift): PSI = Σ_buckets (p−q)·ln(p/q), THE score-drift
    // metric ML monitoring dashboards alarm on (>0.25 = retrain).
    // Ten width-50 value buckets on a generated spine (empty buckets
    // still contribute via add-1/Laplace smoothing — deterministic
    // integer counts, never a NaN). EXACT except one guarded ln: p, q
    // as truncated micro shares of exact integers; the log-ratio of
    // the exact cross products quantized floor(ln·10⁴ + 0.5) (the
    // q_bigram_lm micro-nat discipline; RelationalExtSpec's libm guard
    // pins every input far from a floor boundary). Per-bucket terms
    // are products of same-sign quantities, so the final DIV is
    // non-negative and truncation is engine-independent.
    //
    // Scale posture: one (arm, bucket) aggregate collapses the stream
    // to ≤ 20 rows; everything after runs on the broadcast 10-row
    // spine.
    "q_psi" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("greatest(least(CAST(floor(value / 50.0) AS BIGINT), 9L), 0L)").as("bucket"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
      val cnt = ev.groupBy(col("bucket")).agg(sum(col("ia")).as("a"), sum(col("ib")).as("b"))
      val tot = ev.agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb"))
      val spine = s.range(10).select(col("id").as("bucket"))
      val terms = spine
        .join(cnt, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("a"), lit(0L)).as("a"),
          coalesce(col("b"), lit(0L)).as("b"))
        .crossJoin(broadcast(tot))
        .withColumn("p_micro", expr("((a + 1) * 1000000) DIV (na + 10)"))
        .withColumn("q_micro", expr("((b + 1) * 1000000) DIV (nb + 10)"))
        .withColumn("lr_e4", expr(
          """CAST(floor(ln(CAST((a + 1) * (nb + 10) AS DOUBLE)
            |             / CAST((b + 1) * (na + 10) AS DOUBLE)) * 10000 + 0.5) AS BIGINT)""".stripMargin))
        .withColumn("term_micro", expr("((p_micro - q_micro) * lr_e4) DIV 10000"))
      val psi = terms.agg(sum(col("term_micro")).as("psi_micro"))
      terms
        .crossJoin(broadcast(psi))
        .select(col("bucket"), col("a"), col("b"), col("p_micro"), col("q_micro"),
          col("lr_e4"), col("term_micro"), col("psi_micro"))
        .orderBy(col("bucket"))
    }),

    // WELCH two-sample test (unequal variances) between the 'en' and
    // non-'en' document-length distributions per source — the mixture
    // sanity check next to q_ks_test's drift gate: does a source write
    // systematically longer English docs? EXACT INTEGER trajectory:
    // sample mean and variance in micro fixed point ((n·Σx² − (Σx)²)·
    // 10⁶ DIV n(n−1), numerator non-negative by Cauchy–Schwarz), the
    // standard-error term as var DIV n, and t² (not t — no square
    // root) as diff² DIV se², so both engines walk identical integers.
    // Overflow envelope: n·Σx²·10⁶ < 2⁶³ holds for n ≤ ~10⁵ per group
    // at n_chars ≤ 10³ (the fixture is ≪ that); the 100 TB form lifts
    // the multiply into DECIMAL(38) or Welford partials — the shape
    // (one groupBy, one self-align join) is unchanged.
    //
    // Scale posture: ONE aggregate at (source, group) grain collapses
    // the corpus to 2 rows per source; the en/other align is a join of
    // two aggregate-grain frames. Nothing else shuffles.
    "q_t_test" -> ((s, d) => {
      val stats = Tables.documents(s, d)
        .withColumn("grp", when(col("lang") === "en", "en").otherwise("other"))
        .groupBy(col("source"), col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(expr("n_chars * n_chars")).as("sxx"))
        .selectExpr("source", "grp", "n",
          "(sx * 1000000) DIV n AS mean_micro",
          "CASE WHEN n > 1 THEN ((n * sxx - sx * sx) * 1000000) DIV (n * (n - 1)) ELSE 0 END AS var_micro")
      val a = stats.filter(col("grp") === "en")
        .select(col("source"), col("n").as("n_en"),
          col("mean_micro").as("mean_en_micro"), col("var_micro").as("var_en_micro"))
      val b = stats.filter(col("grp") === "other")
        .select(col("source"), col("n").as("n_other"),
          col("mean_micro").as("mean_other_micro"), col("var_micro").as("var_other_micro"))
      a.join(b, Seq("source")) // sources with both samples — stated contract
        .withColumn("se2_micro",
          expr("var_en_micro DIV n_en + var_other_micro DIV n_other"))
        .withColumn("t2_micro", expr(
          """CASE WHEN se2_micro > 0 THEN
            |  ((mean_en_micro - mean_other_micro) * (mean_en_micro - mean_other_micro))
            |    DIV se2_micro END""".stripMargin))
        .select(col("source"), col("n_en"), col("n_other"),
          col("mean_en_micro"), col("mean_other_micro"),
          col("var_en_micro"), col("var_other_micro"),
          col("se2_micro"), col("t2_micro"))
        .orderBy(col("source"))
    }),

    // 2-D skyline (Pareto frontier): the parts no other part beats on
    // BOTH price and size (minimize each) — the multi-criteria shortlist
    // operator (cheapest-and-smallest, best-quality-per-cost). The
    // sort-based formulation: over distinct quantized points ordered by
    // price, a point survives iff no strictly-cheaper point had
    // size ≤ its own (running min via a RANGE frame that excludes the
    // current price) and it carries the minimum size at its own price.
    // O(n log n) — one range-partitioned sort — where the textbook
    // dominance predicate (the oracle keeps that independent NOT EXISTS
    // form) is an all-pairs quadratic. Integer-exact: price in
    // centi-units, size already integral.
    "q_skyline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pts = Tables.part(s, d)
        .select(expr("CAST(floor(p_retailprice * 100) AS BIGINT)").as("price_centi"),
          col("p_size"))
        .distinct()
      val wPrev = Window.orderBy(col("price_centi"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(col("price_centi"))
      pts
        .withColumn("min_prev", min(col("p_size")).over(wPrev))
        .withColumn("min_same", min(col("p_size")).over(wSame))
        .filter((col("min_prev").isNull || col("min_prev") > col("p_size")) &&
          col("p_size") === col("min_same"))
        .select(col("price_centi"), col("p_size"))
        .orderBy(col("price_centi"), col("p_size"))
    }),

    // Session-level summary over the gaps-and-islands sessionization
    // (q_islands' 15-min-gap rule): session count, exact medians of
    // events-per-session and duration (the ×2-scaled integer-median
    // trick — percentile of integers interpolates at most one
    // half-step, so 2× is an exact BIGINT in both engines), and the
    // bounce rate (single-event sessions) in micro-units. One user_id
    // shuffle serves the lag + running-sum windows; the summary is a
    // single partial+final aggregate over session-grain rows.
    "q_session_stats" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """WITH g AS (
          |  SELECT user_id, event_id, unix_micros(ts) AS us,
          |    CASE WHEN unix_micros(ts) - lag(unix_micros(ts)) OVER w > 900000000
          |         THEN 1 ELSE 0 END AS brk
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts), event_id)),
          |i AS (
          |  SELECT user_id, us,
          |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |  FROM g),
          |sess AS (
          |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_events,
          |    max(us) - min(us) AS dur_us
          |  FROM i GROUP BY user_id, island)
          |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
          |  CAST(2 * percentile(n_events, 0.5D) AS BIGINT) AS med2_events,
          |  CAST(2 * percentile(dur_us, 0.5D) AS BIGINT) AS med2_dur_us,
          |  CAST(max(dur_us) AS BIGINT) AS max_dur_us,
          |  (CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
          |    DIV count(*) AS bounce_micro
          |FROM sess""".stripMargin)
    }),

    // Rolling active users — DAU / trailing-7-day WAU / stickiness per
    // day, the product-analytics staple. The one data-scale shuffle
    // collapses events to (day, user) grain FIRST; the trailing window
    // then REPLICATES each such row across the ≤7 days it serves
    // (map-side sequence+explode — the replicate-then-distinct form of
    // a sliding distinct-count, which no engine can do as a plain
    // window) and re-distincts at (day, user) grain. Day keys are
    // integer epoch-day quotients; stickiness is micro-unit truncating
    // division.
    "q_dau_wau" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"), col("user_id"))
        .distinct()
      val days = du.select(col("day")).distinct()
      val wau = du
        .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
        .join(days, Seq("day"), "left_semi") // only days that exist in the data
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness_micro", expr("(dau * 1000000) DIV wau"))
        .orderBy(col("day"))
    }),

    // Per-group z-score standardization — the feature-engineering
    // staple (normalize a metric within its segment before modeling).
    // Two-pass moment form: one partial+final aggregate per group for
    // (n, Σv, Σv²) over MILLI-QUANTIZED integers, broadcast back, then
    // a map-only scoring pass. The mean/stddev/z chain is float, but
    // every operand enters as an exact BIGINT and BOTH engines run the
    // IDENTICAL expression tree of correctly-rounded IEEE ops (÷, ×,
    // −, √), so the doubles agree bit-for-bit and the final
    // micro-unit floor is safe (the q_linear_fit recipe). Σv² ≤
    // 10⁵·(5·10⁵)² ≈ 2.4·10¹⁶ ≪ 2⁶³ at sf0.1.
    "q_group_norm" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      val mom = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"),
          sum(col("vm") * col("vm")).as("svv"))
      ev.join(broadcast(mom), "event_type")
        .withColumn("z_micro", expr(
          """CAST(floor(
            |  (CAST(vm AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
            |  / sqrt((CAST(svv AS DOUBLE)
            |          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
            |         / CAST(n - 1 AS DOUBLE))
            |  * 1000000) AS BIGINT)""".stripMargin))
        .select(col("event_id"), col("event_type"), col("vm"), col("z_micro"))
        .orderBy(col("event_id"))
    }),

    // Lag-k autocorrelation (k = 1..7) of the daily event-count series
    // — the seasonality-strength diagnostic behind q_seasonal (a
    // strong lag-7 ACF says "weekly pattern"). Each lag is the exact
    // Pearson correlation of (cₜ, cₜ₊ₖ) pairs: the series collapses to
    // the DAY-GRAIN aggregate first (the KS posture — ~30 rows at the
    // fixture, bounded by the time span at any scale), lags come from
    // one window over that table, and the five moments are exact
    // BIGINT sums, so r comes from the identical float AST in both
    // engines (the q_linear_fit recipe).
    "q_autocorr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("day"))
      val lagged = daily.select((col("day") +: col("c") +:
        (1 to 7).map(k => lead(col("c"), k).over(w).as(s"c$k"))): _*)
      val perLag = (1 to 7).map { k =>
        lagged.filter(col(s"c$k").isNotNull)
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
            sum(col(s"c$k")).as("sy"), sum(col("c") * col(s"c$k")).as("sxy"),
            sum(col("c") * col("c")).as("sxx"),
            sum(col(s"c$k") * col(s"c$k")).as("syy"))
          .select(lit(k).as("lag"), col("n"),
            round(expr(
              """CAST(n * sxy - sx * sy AS DOUBLE)
                |/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"""
                .stripMargin), 6).as("acf"))
      }
      perLag.reduce(_ unionByName _).orderBy(col("lag"))
    }),

    // AR(2) FIT via the Yule-Walker equations (Yule 1927; Walker 1931)
    // on the per-type daily count series — the parametric step after
    // q_autocorr's diagnostic: closed-form φ₁ = r₁(1−r₂)/(1−r₁²),
    // φ₂ = (r₂−r₁²)/(1−r₁²) from the lag-1/2 autocorrelations, plus
    // the innovation variance σ² = c₀(1 − φ₁r₁ − φ₂r₂). The biased
    // autocovariance uses the COMMON mean μ = S/n (the standard YW
    // convention, not the per-lag Pearson of q_autocorr):
    // cₖ = (Pₖ − μ(Hₖ+Tₖ) + nₖμ²)/n where Pₖ, Hₖ, Tₖ are the exact
    // BIGINT lagged cross/head/tail sums. Every aggregate is integer;
    // the closed form runs on the k-row final in IDENTICAL float AST
    // under round(4) (the q_linear_fit recipe); degenerate series
    // (c₀ = 0 or |r₁| = 1) null out via the shared nullif text.
    //
    // Scale posture: the corpus collapses to the (type, day) grain in
    // one shuffle (calendar-bounded at any corpus size); the lag
    // columns come from a PER-TYPE window (partition-parallel, never a
    // global sort); the closed form runs on one row per type.
    "q_ar_fit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val lagged = daily
        .withColumn("c1", lead(col("c"), 1).over(w))
        .withColumn("c2", lead(col("c"), 2).over(w))
      val mom = lagged.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(expr("c * c")).as("p0"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN c * c1 ELSE 0 END")).as("p1"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN c ELSE 0 END")).as("h1"),
        sum(expr("coalesce(c1, 0)")).as("t1"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN c * c2 ELSE 0 END")).as("p2"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN c ELSE 0 END")).as("h2"),
        sum(expr("coalesce(c2, 0)")).as("t2"))
      mom
        .withColumn("mu", expr("CAST(sx AS DOUBLE) / n"))
        .withColumn("c0", expr("(CAST(p0 AS DOUBLE) - mu * (sx + sx) + n * mu * mu) / n"))
        .withColumn("cv1", expr("(CAST(p1 AS DOUBLE) - mu * (h1 + t1) + (n - 1) * mu * mu) / n"))
        .withColumn("cv2", expr("(CAST(p2 AS DOUBLE) - mu * (h2 + t2) + (n - 2) * mu * mu) / n"))
        .withColumn("r1", expr("cv1 / nullif(c0, 0.0)"))
        .withColumn("r2", expr("cv2 / nullif(c0, 0.0)"))
        .select(col("event_type"), col("n"), round(col("mu"), 4).as("mu"),
          round(col("r1"), 4).as("r1"), round(col("r2"), 4).as("r2"),
          round(expr("r1 * (1 - r2) / nullif(1 - r1 * r1, 0.0)"), 4).as("phi1"),
          round(expr("(r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0)"), 4).as("phi2"),
          round(expr(
            """c0 * (1 - (r1 * (1 - r2) / nullif(1 - r1 * r1, 0.0)) * r1
              |        - ((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0)) * r2)""".stripMargin),
            4).as("sigma2"))
        .orderBy(col("event_type"))
    }),

    // HOLT linear (double exponential) smoothing of the daily event
    // series per event type — the level+TREND leg of the smoothing
    // family (q_ewma tracks level only, q_seasonal the weekly shape):
    // l_t = (y_t + l + b)/2, b_t = (l_t − l + b)/2 (α = β = ½), plus
    // the 7-day-ahead forecast l + 7b that capacity planning actually
    // consumes. The recursion is inherently sequential, so it runs at
    // the RIGHT grain: the corpus collapses to a bounded (type, day)
    // count table first (one shuffle), each type's series folds into
    // one sorted array, and the recursion is a per-row aggregate()
    // lambda — the q_ewma/q_unigram_lm sequential-DP recipe. EXACT
    // integer trajectory: milli fixed point with halving as
    // floor(x/2.0) — |x| < 2⁵² keeps the double exact, and floor of an
    // exact half-integer is engine-independent (truncating DIV would
    // disagree with DuckDB's floor-div on negative trends).
    "q_holt" -> ((s, d) => {
      val lt = "CAST(floor((x.c * 1000 + st.l + st.b) / 2.0) AS BIGINT)"
      Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("sd"))
        .selectExpr("event_type",
          "CAST(size(sd) AS BIGINT) AS n_days",
          s"""aggregate(
             |  slice(sd, 2, size(sd) - 1),
             |  named_struct('l', element_at(sd, 1).c * 1000L, 'b', 0L),
             |  (st, x) -> named_struct(
             |    'l', $lt,
             |    'b', CAST(floor(($lt - st.l + st.b) / 2.0) AS BIGINT)),
             |  st -> st) AS h""".stripMargin)
        .selectExpr("event_type", "n_days",
          "h.l AS level_milli", "h.b AS trend_milli",
          "h.l + 7 * h.b AS forecast7_milli")
        .orderBy(col("event_type"))
    }),

    // CUSUM changepoint detection over the daily event-count series —
    // the level-shift monitor (did volume step up/down, and when?).
    // Exact integer form: the cumulative deviation Sₜ = Σᵢ≤ₜ(n·cᵢ − Σc)
    // multiplies through by n so no mean division ever happens; the
    // changepoint is the day with max |Sₜ| (ties to the earliest day).
    // One day-grain aggregate, one broadcast 1-row total, one
    // cumulative window over the bounded day table, one
    // TakeOrdered(1).
    "q_changepoint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val tot = daily.agg(sum(col("c")).as("sc"), count(lit(1)).as("n"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(tot))
        .withColumn("s_t", sum(expr("n * c - sc")).over(w))
        .select(col("day"), col("c"), col("s_t"), abs(col("s_t")).as("abs_s"))
        .orderBy(col("abs_s").desc, col("day"))
        .limit(1)
    }),

    // Gini coefficient of customer revenue concentration — the
    // inequality/skew audit (how top-heavy is the key distribution
    // before choosing a partitioning or sampling strategy). Rank-sum
    // identity: G = (2·Σr·x − (n+1)·Σx) / (n·Σx) with r from a total
    // order (revenue, customer id) — swapping tied-revenue ranks
    // leaves Σr·x unchanged, so the tiebreak only fixes determinism,
    // not the value. EXACT BIGINT numerator (Σr·x ≲ 10¹⁷ at sf0.1);
    // the rank runs over the CUSTOMER-GRAIN aggregate (orders collapse
    // first) via the [[graft.operators.Ranks.globalOrderScan]]
    // bucket-offset scan (revenue-width buckets) — the customer
    // catalog is itself corpus-proportional, so even the aggregate
    // grain never funnels through one reducer.
    "q_gini" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("x"))
      Ranks.globalOrderScan(rev, expr("x DIV 1000000"),
          Seq(col("x"), col("o_custkey")), "r")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("r * x")).as("srx"))
        .withColumn("gini_num", expr("2 * srx - (n + 1) * sx"))
        .withColumn("gini", round(expr(
          "CAST(2 * srx - (n + 1) * sx AS DOUBLE) / (CAST(n AS DOUBLE) * sx)"), 6))
        .select(col("n"), col("sx"), col("gini_num"), col("gini"))
    }),

    // χ² goodness-of-fit of the event-type mix against uniform — the
    // CATEGORICAL drift gate pairing q_ks_test's continuous one (a
    // shifted class mix is the other way a training batch silently
    // changes). Rational-arithmetic form: with k cells and n events,
    // the statistic Σ(obs−n/k)²/(n/k) rewrites to Σ(k·obs−n)² / (k·n),
    // whose numerator is an EXACT BIGINT ((k·obs)² ≤ (5·10⁵)² ≪ 2⁶³ at
    // sf0.1; 100 TB would move to the same trick in 128-bit or split
    // limbs) — only the final reporting division touches floats, on
    // identical exact integers in both engines. One partial+final
    // aggregate over event_type, a 5-row broadcast of the totals,
    // nothing collects.
    "q_chi2" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("obs"))
      val tot = obs.agg(sum(col("obs")).as("n"), count(lit(1)).as("k"))
      obs.crossJoin(broadcast(tot))
        .groupBy(col("n"), col("k"))
        .agg(sum(expr("(k * obs - n) * (k * obs - n)")).as("chi2_num"))
        .withColumn("df", col("k") - 1)
        .withColumn("chi2", round(expr("CAST(chi2_num AS DOUBLE) / (k * n)"), 6))
        // χ²₀.₀₅ critical value at df=4 (the fixture's 5 event types)
        .withColumn("reject_05", expr("CAST(chi2_num AS DOUBLE) / (k * n) > 9.4877"))
        .select(col("n"), col("k"), col("df"), col("chi2_num"), col("chi2"),
          col("reject_05"))
    }),

    // Bivariate statistics per group: Pearson correlation, sample
    // covariance, sample stddev — single partial+final aggregate with
    // mergeable moment state (sum, sum², sum of products), the same
    // shape that scales to any data size.
    "q_stats_corr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
          round(stddev_samp(col("l_discount")), 4).as("sd_disc"))
        .orderBy(col("l_returnflag"))),

    // MANN-WHITNEY U rank-sum test (Mann & Whitney 1947) between the
    // 'click' and 'view' value distributions — the NONPARAMETRIC drift
    // gate next to q_t_test (mean shift under normality) and q_ks_test
    // (sup-distance): does one arm stochastically dominate, without
    // assuming any distribution shape? Tie handling is exact: values
    // quantize to milli units, ranking runs at DISTINCT-VALUE grain
    // (never per row), and tie groups carry the textbook average rank
    // in DOUBLED units so everything stays integral — a tie group
    // occupying min-rank s with multiplicity t has average rank
    // s+(t−1)/2, i.e. doubled rank r2 = 2·cum_before + t + 1. Then
    //   2·ΣR_A = Σ_v na_v·r2_v,   U2_A = 2·ΣR_A − n_A(n_A+1),
    //   U2_A + U2_B = 2·n_A·n_B  (the identity the spec pins),
    // and the tie-corrected normal approximation (Lehmann 1975)
    //   z² = 3·(2U − n_A n_B)²·n(n−1) / (n_A n_B (n³−n−T)),
    // T = Σ(t³−t), evaluated as a fixed ladder of truncating DIVs on
    // non-negative integers — both engines walk identical BIGINTs, no
    // sqrt, no libm. The nesting order bounds every intermediate
    // ≪ 2⁶³ for n up to ~10⁷ per arm; past that the 100 TB form lifts
    // the products into DECIMAL(38) — same plan shape.
    //
    // Scale posture: one partial+final aggregate collapses the stream
    // to distinct-value grain (bounded: the metric is milli-quantized
    // and range-bounded, ≤ ~5·10⁵ rows regardless of corpus size); the
    // rank scan is ONE ordered window over that bounded table; the
    // final combine is a 1-row aggregate. Raw rows never sort.
    "q_mann_whitney" -> ((s, d) => {
      val byVal = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
        .groupBy(col("vm"))
        .agg(sum(col("ia")).as("na_v"), sum(col("ib")).as("nb_v"))
        .withColumn("t", col("na_v") + col("nb_v"))
      val w = Window.orderBy(col("vm")).rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byVal
        .withColumn("cum_before", coalesce(sum(col("t")).over(w), lit(0L)))
        .withColumn("r2", lit(2L) * col("cum_before") + col("t") + 1L)
      ranked.agg(
        sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
        sum(expr("na_v * r2")).as("sr2_a"),
        sum(expr("t * t * t - t")).as("ties_t"))
        .withColumn("u2_a", expr("sr2_a - n_a * (n_a + 1)"))
        .withColumn("u2_b", expr("2 * n_a * n_b - u2_a"))
        .withColumn("n", col("n_a") + col("n_b"))
        .withColumn("z2_micro", expr(
          """((3 * ((u2_a DIV 2 - (n_a * n_b) DIV 2) * (u2_a DIV 2 - (n_a * n_b) DIV 2))
            |      DIV (n_a * n_b)) * 1000000)
            |  DIV ((n * n * n - n - ties_t) DIV (n * (n - 1)))""".stripMargin))
        .withColumn("reject_05", col("z2_micro") > 3841500L)
        .select(col("n_a"), col("n_b"), col("u2_a"), col("u2_b"), col("ties_t"),
          col("z2_micro"), col("reject_05"))
    }),

    // SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003):
    // compress each user's event-value series into a short SYMBOLIC
    // word (here 8 segments × a 5-letter alphabet) so downstream motif
    // mining, anomaly grouping, and similarity lookups run on strings
    // instead of raw series. Two classic steps, both integral here:
    // PAA (piecewise aggregate approximation — segment k of n rows is
    // positions (k·8) DIV n, segment mean by truncating DIV on
    // non-negative milli sums) then letter assignment by FIXED literal
    // breakpoints (100/200/300/400 in value units — the paper's
    // Gaussian breakpoints assume z-normalized input; a bounded
    // uniform metric takes equal-width cuts, and literals keep both
    // engines bit-identical, no quantile pass). The word assembles
    // with an order-pinned string fold — collect_list alone would be
    // nondeterministic; the (seg, letter) array_sort makes it stable.
    //
    // Scale posture: one user_id shuffle serves the two windows AND
    // both aggregates (q_twap's shape); per-user state is ≤ 8 segment
    // partials. The report is user-grain — at 100 TB the words are
    // what you'd feed the next groupBy(sax) motif count, which is a
    // ≤ 5⁸-key aggregate regardless of corpus size.
    "q_sax" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      val seg = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("xm"))
        .withColumn("k", (row_number().over(w) - 1).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("seg", expr("(k * 8) DIV n"))
        .groupBy(col("user_id"), col("seg"))
        .agg(sum(col("xm")).as("sx"), count(lit(1)).as("c"))
        .withColumn("paa", expr("sx DIV c"))
        .withColumn("letter", expr(
          """CASE WHEN paa < 100000 THEN 'a' WHEN paa < 200000 THEN 'b'
            |     WHEN paa < 300000 THEN 'c' WHEN paa < 400000 THEN 'd'
            |     ELSE 'e' END""".stripMargin))
      seg.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_events"),
          array_join(expr("transform(array_sort(collect_list(struct(seg, letter))), x -> x.letter)"), "")
            .as("sax"))
        .orderBy(col("user_id"))
    }),

    // RFM SEGMENTATION (recency / frequency / monetary quintiles) —
    // the classic customer-value grid every growth dashboard ships:
    // per customer, days since last order (vs the corpus max date),
    // order count, and lifetime spend; each scored 1..5 by ntile and
    // packed into the familiar three-digit segment code (555 = best).
    // Determinism discipline: spend sums CENTI-QUANTIZED per order
    // (floor(price·100 + 0.5) — summing raw doubles would make the
    // quintile boundary engine-dependent), and every ntile ordering
    // carries the custkey tiebreak so equal metrics land in the same
    // bucket on both engines. Report grain = segment code (≤ 125
    // rows) with population and spend share.
    //
    // Scale posture: one aggregate at customer grain, then the three
    // quintile assignments come from [[Ranks.globalOrderScan]]
    // bucket-offset ranks + [[Ranks.ntileFromRank]] (the exact NTILE
    // arithmetic — RanksSpec pins parity with the native window), so
    // every data-grain window partitions by an order-aligned bucket;
    // DESC orderings bucket on the negated key. The 1-row max-date and
    // count aggregates broadcast.
    "q_rfm" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("last_d"),
          count(lit(1)).as("n_orders"),
          sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("spend_centi"))
      val maxD = cust.agg(max(col("last_d")).as("gmax"))
      val nTot = cust.agg(count(lit(1)).as("n_cust"))
      val withDays = cust.crossJoin(broadcast(maxD))
        .withColumn("r_days", datediff(col("gmax"), col("last_d")).cast("long"))
      val rRanked = Ranks.globalOrderScan(withDays, expr("r_days DIV 8"),
        Seq(col("r_days"), col("o_custkey")), "r_rk")
      val fRanked = Ranks.globalOrderScan(rRanked, expr("-n_orders"),
        Seq(col("n_orders").desc, col("o_custkey")), "f_rk")
      val mRanked = Ranks.globalOrderScan(fRanked, expr("-(spend_centi DIV 1048576)"),
        Seq(col("spend_centi").desc, col("o_custkey")), "m_rk")
      val scored = mRanked.crossJoin(broadcast(nTot))
        .withColumn("r_q", Ranks.ntileFromRank("r_rk", "n_cust", 5))
        .withColumn("f_q", Ranks.ntileFromRank("f_rk", "n_cust", 5))
        .withColumn("m_q", Ranks.ntileFromRank("m_rk", "n_cust", 5))
      scored
        .withColumn("rfm", expr("CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT)"))
        .groupBy(col("rfm"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend_centi")).as("spend_centi"),
          min(col("o_custkey")).as("sample_custkey"))
        .orderBy(col("rfm"))
    }),

    // CUSUM control chart (Page 1954) per event-type series — the
    // SEQUENTIAL drift alarm next to q_changepoint's offline split and
    // q_psi's batch-vs-batch gate: S_t = max(0, S_{t−1} + x_t − μ − k)
    // accumulates evidence of a sustained upward shift and alarms at
    // S_t > h. The recurrence looks inherently serial, but the
    // reflection identity S_t = P_t − min(0, min_{j≤t} P_j) with
    // P_t = Σ_{i≤t}(x_i − μ − k) turns it into two PREFIX windows —
    // a running sum and a running min — so it parallelizes exactly
    // like any prefix scan (per-partition partials + carry-in at
    // 100 TB; one ordered pass here). All-integer: values in milli
    // units, per-type target μ from a first aggregate pass (DIV on
    // non-negative sums), slack k = 5 000 milli, threshold h = 200 000
    // milli. Report grain is the TYPE (alarm count, peak statistic,
    // first alarm), so the result is dashboard-sized.
    "q_cusum" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("ts"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("xm"))
      val mu = ev.groupBy(col("event_type"))
        .agg(expr("sum(xm) DIV count(*)").as("mean_milli"))
      val wRun = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val scanned = ev
        .join(broadcast(mu), Seq("event_type"))
        .withColumn("p", sum(expr("xm - mean_milli - 5000")).over(wRun))
        .withColumn("s_milli", col("p") - least(min(col("p")).over(wRun), lit(0L)))
      scanned.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("mean_milli")).as("mean_milli"),
          max(col("s_milli")).as("peak_s_milli"),
          sum(when(col("s_milli") > 200000L, 1L).otherwise(0L)).as("n_alarms"),
          min(when(col("s_milli") > 200000L, col("event_id"))).as("first_alarm_id"))
        .select(col("event_type"), col("n"), col("mean_milli"),
          col("peak_s_milli"), col("n_alarms"), col("first_alarm_id"))
        .orderBy(col("event_type"))
    }),

    // GRID-BLOCKED SPATIAL RADIUS JOIN — the distributed spatial-join
    // pattern (Sedona/GeoSpark partitioned joins): bucket both point
    // sets to an R-sized planar grid, expand the PROBE side to its
    // 3×3 neighbor cells MAP-SIDE (a 9× fanout of the small side, not
    // the big one), equi-join on the cell key, then the exact distance
    // predicate inside the join — every true within-R pair is in some
    // neighbor cell by construction, so the blocking is lossless.
    // Points are synthetic-but-deterministic (milli-degree coordinates
    // hashed from the keys with LCG multipliers, kept NON-NEGATIVE so
    // truncating and flooring integer division agree across engines);
    // distances are exact planar BIGINT d² (no floats, no haversine —
    // the planar contract is documented; lon wraparound is out of
    // scope). Per supplier: customers within R plus the nearest one
    // via a PACKED d²·2²¹+custkey min (strict order, exact argmin).
    //
    // Scale posture: one shuffle per side on the cell key; the
    // neighbor expansion multiplies only the probe side; a
    // pathologically dense cell is the q_dbscan hot-cell situation —
    // the cell size (= R) is the knob, and AQE's skew split covers
    // the join stage.
    "q_spatial_join" -> ((s, d) => {
      val R = 5000L
      def pts(df: DataFrame, key: String): DataFrame = df.select(
        col(key).as("id"),
        ((col(key) * 16807) % 180000).as("lat"),
        ((col(key) * 48271) % 360000).as("lon"))
      val cust = pts(Tables.customer(s, d).select(col("c_custkey")), "c_custkey")
        .withColumn("cla", expr(s"lat DIV $R"))
        .withColumn("clo", expr(s"lon DIV $R"))
      val supp = pts(Tables.supplier(s, d).select(col("s_suppkey")), "s_suppkey")
        .select(col("id").as("sid"), col("lat").as("slat"), col("lon").as("slon"))
        .withColumn("cla", explode(sequence(
          expr(s"slat DIV $R - 1"), expr(s"slat DIV $R + 1"))))
        .withColumn("clo", explode(sequence(
          expr(s"slon DIV $R - 1"), expr(s"slon DIV $R + 1"))))
      supp.join(cust, Seq("cla", "clo"))
        .withColumn("d2", expr(
          "(slat - lat) * (slat - lat) + (slon - lon) * (slon - lon)"))
        .filter(col("d2") <= lit(R * R))
        .groupBy(col("sid"))
        .agg(count(lit(1)).as("n_within"),
          min(expr(s"d2 * ${1L << 21} + id")).as("pknn"))
        .select(col("sid"), col("n_within"),
          (col("pknn") % (1L << 21)).as("nearest_cust"),
          expr(s"pknn DIV ${1L << 21}").as("nearest_d2"))
        .orderBy(col("sid"))
    }),

    // SWEEP-LINE MAX CONCURRENCY — the classic interval-overlap
    // counting query (how many sessions/streams were open at once),
    // as a pure window plan: each event becomes a +1 at its start and
    // a −1 at its end (duration = ⌊value⌋+1 seconds), and the running
    // sum over the (t, delta) order is the live-interval count. Ties
    // need no explicit tie-break: both engines' default cumulative
    // frame is RANGE, so all rows at the same (t, delta) aggregate as
    // one group and the max is order-independent — ends at the same
    // instant as starts retire FIRST (delta −1 sorts before +1), the
    // standard touching-intervals-don't-overlap convention.
    //
    // Scale posture: map-only ±1 emission (2 rows per event), one
    // per-type sort for the window, one aggregate — the same
    // calendar-friendly shape as q_islands; no joins, no self-join
    // against the interval table (the naive overlap join is
    // quadratic and appears nowhere).
    "q_concurrency" -> ((s, d) => {
      val marks = Tables.events(s, d)
        .select(col("event_type"), expr("unix_micros(ts)").as("us"),
          expr("CAST(floor(value) + 1 AS BIGINT) * 1000000").as("dur"))
        .select(col("event_type"), explode(array(
          struct(col("us").as("t"), lit(1L).as("delta")),
          struct((col("us") + col("dur")).as("t"), lit(-1L).as("delta")))).as("m"))
        .select(col("event_type"), col("m.t").as("t"), col("m.delta").as("delta"))
      val cum = marks.withColumn("live", sum(col("delta")).over(
        Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))))
      cum.groupBy(col("event_type"))
        .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
          max(col("live")).as("max_concurrent"))
        .orderBy(col("event_type"))
    }),

    // WEIGHTED exact quantiles — doc-length percentiles where each
    // doc counts its TOKEN MASS, not itself (the question a packing
    // planner actually asks: "below what length sits half the token
    // volume" — the unweighted median is dominated by short docs).
    // Same census rank-cut machinery as the exact-quantile family,
    // with the cumulative counter summing WEIGHT: distinct-length
    // census → weight prefix window → target ⌈p·W/100⌉ → min length
    // reaching it. All exact BIGINT; 3-row percentile grid broadcast.
    "q_weighted_quantile" -> ((s, d) => {
      val census = Tables.documents(s, d)
        .select(expr("size(split(text, ' '))").cast("long").as("len"))
        .groupBy(col("len"))
        .agg(count(lit(1)).as("c"), sum(col("len")).as("wsum"))
        .ckpt() // totals + rank cut share it
      val tot = census.agg(sum(col("wsum")).as("w"), sum(col("c")).as("n"))
      val below = Window.orderBy(col("len")).rowsBetween(Window.unboundedPreceding, -1)
      val cum = census.withColumn("bw", coalesce(sum(col("wsum")).over(below), lit(0L)))
      val ps = s.sql("SELECT CAST(p AS BIGINT) AS p FROM VALUES (50), (90), (99) AS t(p)")
      cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ps))
        .filter(expr("bw + wsum >= (p * w + 99) DIV 100"))
        .groupBy(col("p"))
        .agg(min(col("len")).as("q_len_weighted"), max(col("n")).as("n_docs"),
          max(col("w")).as("tokens_total"))
        .orderBy(col("p"))
    }),

    // MONTH-OVER-MONTH growth per event type — the reporting staple:
    // calendar-month rollup (epoch-day ÷ 30 is the fixture's month
    // proxy — exact integers, no calendar library drift between
    // engines), lag within type, growth in exact sign-safe milli
    // (Δ·1000 ÷ previous). One corpus aggregate; the lag window runs
    // over the (type × month) grain frame.
    "q_mom_growth" -> ((s, d) => {
      val months = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000 DIV 30").as("m30"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("val_c"))
      val wl = Window.partitionBy(col("event_type")).orderBy(col("m30"))
      months
        .withColumn("n_prev", lag(col("n"), 1).over(wl))
        .withColumn("v_prev", lag(col("val_c"), 1).over(wl))
        .filter(col("n_prev").isNotNull)
        .select(col("event_type"), col("m30"), col("n"), col("val_c"),
          expr(sdiv("(n - n_prev) * 1000", "n_prev")).as("n_growth_milli"),
          expr("CASE WHEN v_prev <> 0 THEN " +
            sdiv("(val_c - v_prev) * 1000", "abs(v_prev)") + " END").as("v_growth_milli"))
        .orderBy(col("event_type"), col("m30"))
    }),

    // MARKOV HITTING TIME — expected steps to reach 'purchase' from
    // each state of q_markov's transition chain, by SIX unrolled
    // value-iteration rounds of E(s) ← 1 + Σ_t P(s,t)·E(t) with the
    // purchase state absorbing at 0 (the truncated-horizon answer to
    // "how far is each behavior from converting"). The corpus work is
    // q_markov's one transition aggregate; every round after that is a
    // join + aggregate over the ≤k² transition matrix at STATE grain.
    // E is exact integer micro: per round ONE truncating division
    // after the integer Σ n·E (sum-then-divide — order-free), so the
    // trajectory replays bit-for-bit as unrolled CTEs.
    "q_markov_hitting" -> ((s, d) => {
      val wl = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(wl))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .ckpt() // 6 value-iteration rounds read it
      val outN = trans.groupBy(col("src")).agg(sum(col("n")).as("n_out"))
        .ckpt() // state-grain; every round joins it
      var e = outN.select(col("src").as("st"), lit(0L).as("e_micro"))
      for (_ <- 1 to 6) {
        val step = trans.join(e.select(col("st").as("dst"), col("e_micro")), "dst")
          .groupBy(col("src")).agg(sum(expr("n * e_micro")).as("se"))
        e = outN.join(step, Seq("src"), "left")
          .select(col("src").as("st"),
            expr("""CASE WHEN src = 'purchase' THEN CAST(0 AS BIGINT)
                   | ELSE 1000000 + (coalesce(se, CAST(0 AS BIGINT)) DIV n_out)
                   | END""".stripMargin).as("e_micro"))
          .ckpt() // state-grain frame per round
      }
      outN.join(e.select(col("st").as("src"), col("e_micro").as("e_steps_micro")), "src")
        .select(col("src"), col("n_out"), col("e_steps_micro"))
        .orderBy(col("src"))
    }),

    // INTERVAL SCHEDULING — the classic earliest-deadline greedy
    // (provably the maximum non-overlapping set), per user over the
    // q_concurrency duration convention: how many of this user's
    // activity intervals could run back-to-back without overlap —
    // a capacity/attention readout the raw event count overstates.
    // The greedy is inherently ORDER-dependent (sorted by end time),
    // so it runs as the q_bandit_replay typed fold:
    // groupByKey(user).flatMapSortedGroups(end, event_id) — one user
    // exchange with the sort INSIDE the shuffle (secondary sort, no
    // per-group materialization), O(1) streamed state; the oracle
    // replays the identical fold as a per-user recursive CTE. All
    // integer microseconds.
    "q_interval_sched" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(
          col("user_id"),
          expr("unix_micros(ts)").as("st"),
          expr("unix_micros(ts) + CAST(floor(value) + 1 AS BIGINT) * 1000000").as("en"),
          col("event_id"))
        .as[(Long, Long, Long, Long)]
      ev.groupByKey(_._1)
        .flatMapSortedGroups(col("en"), col("event_id")) { (uid, it) =>
          var n = 0L
          var cnt = 0L
          var lastEnd = Long.MinValue
          it.foreach { case (_, st, en, _) =>
            n += 1
            if (st >= lastEnd) { cnt += 1; lastEnd = en }
          }
          Iterator((uid, n, cnt))
        }
        .toDF("user_id", "n_events", "n_scheduled")
        .orderBy(col("user_id"))
    }),

    // CHEAPEST SUPPLIER per part (the TPC-H Q2 correlated-min shape,
    // re-aimed at this schema: no partsupp table, so the offer price
    // is the observed lineitem unit price). The point of writing it as
    // a CORRELATED scalar subquery in Spark SQL — not a pre-joined
    // groupBy — is to pin Catalyst's decorrelation: the per-part MIN
    // subquery rewrites into one aggregate + join, which is exactly
    // the plan a hand-decorrelated version would build. Unit price in
    // exact cents: l_extendedprice·100 is an integer-valued double
    // (< 2⁵³), the division by the integer quantity is the same IEEE
    // op in both engines, and floor of identical doubles is identical.
    //
    // Scale posture: the subquery decorrelates to a partkey-grain
    // aggregate joined back on partkey — both sides shuffle once on
    // the join key; the p_size filter pushes to the part scan and
    // prunes the probe side before the join.
    "q_cheapest_supplier" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT DISTINCT p.p_partkey, l.l_suppkey,
          |  CAST(floor(l.l_extendedprice * 100 / l.l_quantity) AS BIGINT) AS unit_cents
          |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
          |WHERE p.p_size >= 40
          |  AND CAST(floor(l.l_extendedprice * 100 / l.l_quantity) AS BIGINT) =
          |      (SELECT MIN(CAST(floor(l2.l_extendedprice * 100 / l2.l_quantity) AS BIGINT))
          |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
          |ORDER BY p_partkey, l_suppkey
          |LIMIT 100""".stripMargin)
    }),

    // SMALL-QUANTITY REVENUE (the TPC-H Q17 shape): revenue carried by
    // lineitems whose quantity is below 20% of their part's average —
    // the "would dropping sub-threshold orders matter" sizing readout.
    // The correlated avg comparison is EXACT integer throughout:
    // l_quantity < 0.2 · (Σq/n) ⟺ 5·q·n < Σq — no division, no float,
    // no epsilon. Revenue in exact cents.
    //
    // Scale posture: the per-part (n, Σq) aggregate is partkey-grain
    // (bounded by the part catalog); it joins back to lineitem on
    // partkey — one fact shuffle — and the final is a 1-row total.
    "q_small_qty_avg" -> ((s, d) => {
      val pa = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_p"),
          sum(expr("CAST(l_quantity AS BIGINT)")).as("s_p"))
      Tables.lineitem(s, d)
        .join(pa, Seq("l_partkey"))
        .filter(expr("CAST(l_quantity AS BIGINT) * 5 * n_p < s_p"))
        .agg(count(lit(1)).as("n_small"),
          sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .as("revenue_cents"))
    }),

    // TOP SUPPLIER by quarterly revenue (the TPC-H Q15 shape): the
    // supplier(s) whose Q1-1995 shipped revenue equals the global
    // maximum — Q15's view + scalar-max, written as a Spark SQL scalar
    // subquery over the revenue CTE so Catalyst plans the 1-row max
    // as a subquery broadcast, and ties surface as multiple rows
    // (the Q15 contract) instead of an arbitrary top-1. Revenue in
    // exact cent·percent units (the q_local_revenue idiom).
    //
    // Scale posture: revenue aggregates at supplier grain off the
    // date-pruned lineitem slice (predicate pushes to the scan); the
    // max is a 1-row aggregate over that supplier-grain frame; the
    // supplier dim joins broadcast.
    "q_top_supplier" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
          |        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev_cp
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s.s_suppkey, s.s_name, r.rev_cp
          |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
          |WHERE r.rev_cp = (SELECT MAX(rev_cp) FROM rev)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // RICH IDLE CUSTOMERS (the TPC-H Q22 shape): customers whose
    // balance beats the positive-balance average but who have gone
    // DORMANT (no order since 1999; the fixture has no never-ordered
    // customers), rolled up per nation — the dormant-capital readout.
    // Written with NOT EXISTS + a scalar subquery in Spark SQL to pin
    // both rewrites at once: the NOT EXISTS → left-anti join and the
    // scalar avg → 1-row broadcast. The above-average comparison is
    // exact: bal·n > S over positive-balance cents.
    //
    // Scale posture: the 1-row (S, n) aggregate broadcasts; the anti
    // join is keyed on custkey (orders project to the key column
    // only); the nation rollup is catalog-grain.
    "q_cust_above_avg" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """WITH pos AS (
          |  SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal, c_custkey, c_nationkey
          |  FROM customer),
          |thr AS (
          |  SELECT SUM(bal) AS s_bal, COUNT(*) AS n_bal FROM pos WHERE bal > 0)
          |SELECT p.c_nationkey AS nationkey,
          |  CAST(COUNT(*) AS BIGINT) AS n_cust,
          |  CAST(SUM(p.bal) AS BIGINT) AS bal_cents
          |FROM pos p, thr
          |WHERE p.bal * thr.n_bal > thr.s_bal
          |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
          |                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
          |GROUP BY p.c_nationkey
          |ORDER BY nationkey""".stripMargin)
    }),

    // NATION-PAIR TRADE VOLUME (the TPC-H Q7 shape): shipping revenue
    // between distinct customer-nation / supplier-nation pairs by
    // ship year — the international-flows readout. Revenue is the
    // exact integer cents×percent product (the q_window_rank idiom:
    // floor(price·100+0.5) · (100 − floor(disc·100+0.5))), summed as
    // BIGINT, so the group totals hash-match bit-for-bit.
    //
    // Scale posture: the lineitem→orders join is the only fact-fact
    // shuffle (keyed on orderkey); customer, supplier, and nation are
    // catalog-grain and join hint-free (AQE broadcasts them); the
    // group-by lands on the bounded (nation², year) grid.
    "q_nation_volume" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d).select(col("n_nationkey").as("c_nationkey"),
          col("n_name").as("cust_nation")), "c_nationkey")
        .join(Tables.nation(s, d).select(col("n_nationkey").as("s_nationkey"),
          col("n_name").as("supp_nation")), "s_nationkey")
        .filter(col("cust_nation") =!= col("supp_nation"))
      rev
        .select(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).cast("bigint").as("l_year"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
            "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))").as("rev"))
        .groupBy(col("cust_nation"), col("supp_nation"), col("l_year"))
        .agg(count(lit(1)).as("n_lines"), sum(col("rev")).as("revenue_cp"))
        .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
    }),

    // PRODUCT-LINE PROFIT by supplier nation and order year (the
    // TPC-H Q9 shape, re-based on the fixture's columns: no partsupp
    // table, so unit cost is 80% of p_retailprice — the substitution
    // changes the constant, not the plan): profit = Σ revenue − cost,
    // both exact integer cents×percent, groups on the bounded
    // (nation, year) grid. Profit may be negative — it's a SUM only,
    // no division, so Spark/DuckDB agree without the sdiv bridge.
    //
    // Scale posture: lineitem→orders keyed on orderkey is the one
    // fact-fact shuffle; part and supplier/nation attach hint-free
    // (catalog grain, AQE broadcast); the aggregate grain is tiny.
    "q_product_profit" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("bigint").as("o_year"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
            "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) - " +
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 80 * " +
            "CAST(l_quantity AS BIGINT)").as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(count(lit(1)).as("n_lines"), sum(col("amount")).as("profit_cp"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // LONE LATE SUPPLIER (the TPC-H Q21 shape, re-based: the fixture
    // carries no commit/receipt dates, so "late" = shipped more than
    // 60 days after the order date): suppliers who were the ONLY late
    // supplier on a multi-supplier order — the classic blame query,
    // and the classic double-correlated-EXISTS decorrelation exercise.
    // Expressed as one per-order aggregate (distinct suppliers,
    // distinct LATE suppliers) joined back to the late lines: the
    // EXISTS (another supplier on the order) becomes n_supp ≥ 2, the
    // NOT EXISTS (another LATE supplier) becomes n_late_supp = 1 —
    // the aggregate form Catalyst's decorrelation would produce, with
    // the semantics in plain sight.
    //
    // Scale posture: lineitem→orders keyed on orderkey; the per-order
    // aggregate reuses the same key (no extra shuffle partitioning);
    // the final supplier rollup is catalog-grain; top-20 is a
    // TakeOrdered heap.
    "q_late_solo_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderdate")), "l_orderkey")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate").cast("date") >
            date_add(col("o_orderdate").cast("date"), 60)).as("late"))
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      li.filter(col("late"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
          "l_orderkey")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
        .limit(20)
    }),

    // IMPORTANT STOCK (the TPC-H Q11 shape, re-based: no partsupp, so
    // "stock value" = shipped value through one nation's suppliers —
    // the LOWEST supplier nationkey present, a deterministic anchor
    // that exists at every SF): parts whose value through that
    // nation's suppliers exceeds 0.1% of the nation's total — the
    // correlated HAVING-against-a-global-scalar shape, decorrelated to
    // a 1-row broadcast and an exact integer cross-multiplied
    // threshold (value·1000 > total; all non-negative, shares in
    // micro via DIV).
    //
    // Scale posture: the 1-row min-nation aggregate broadcasts into
    // the catalog-grain supplier filter, which prunes the fact join;
    // one partkey-grain aggregate; the 1-row total broadcasts; top-50
    // is a TakeOrdered heap.
    "q_important_stock" -> ((s, d) => {
      val minNation = Tables.supplier(s, d)
        .agg(min(col("s_nationkey")).as("mn"))
      val nationSupp = Tables.supplier(s, d).crossJoin(broadcast(minNation))
        .filter(col("s_nationkey") === col("mn"))
      val perPart = Tables.lineitem(s, d)
        .join(nationSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
            "CAST(l_quantity AS BIGINT)").as("v"))
        .groupBy(col("l_partkey")).agg(sum(col("v")).as("value_cq"))
      val tot = perPart.agg(sum(col("value_cq")).as("total_cq"))
      perPart.crossJoin(broadcast(tot))
        .filter(expr("value_cq * 1000 > total_cq"))
        .select(col("l_partkey"), col("value_cq"),
          expr("(value_cq * 1000000) DIV total_cq").as("share_micro"))
        .orderBy(col("value_cq").desc, col("l_partkey"))
        .limit(50)
    }),

    // ORDER-COUNT DISTRIBUTION (the TPC-H Q13 shape): how many
    // customers placed exactly k non-urgent orders — the LEFT-join
    // histogram that keeps zero-order customers (count(o_orderkey)
    // counts non-NULL matches, so an unmatched customer lands in the
    // k = 0 bucket; the fixture's every-customer-orders property makes
    // that bucket empty today, but the plan shape is the contract).
    //
    // Scale posture: one custkey-keyed left join (orders project to
    // key + the filter column only), a customer-grain count, a bounded
    // histogram aggregate.
    "q_order_count_dist" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("c_count").desc)
    }),

    // LJUNG-BOX portmanteau test (Ljung & Box 1978) on the daily
    // event-count series — "is there ANY autocorrelation in the first
    // K lags" as one statistic, the whiteness gate a per-lag ACF read
    // can't give: Q = n(n+2)·Σ_{k≤7} r_k²/(n−k) against χ²₇. The r_k
    // are the COMMON-mean autocorrelations (the q_ar_fit Yule-Walker
    // convention): every lagged cross/head/tail sum is an exact BIGINT
    // window aggregate, and the float closed form runs once on the
    // 1-row moment final in identical expression text.
    //
    // Scale posture: one corpus shuffle to the bounded day grain, K
    // lead columns from one window, one aggregate — day-table work.
    "q_ljung_box" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 7
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("day"))
      val lagged = daily.select((col("day") +: col("c") +:
        (1 to K).map(k => lead(col("c"), k).over(w).as(s"c$k"))): _*)
      val momCols = Seq(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(expr("c * c")).as("p0")) ++
        (1 to K).flatMap(k => Seq(
          sum(expr(s"CASE WHEN c$k IS NOT NULL THEN c * c$k ELSE 0 END")).as(s"p$k"),
          sum(expr(s"CASE WHEN c$k IS NOT NULL THEN c ELSE 0 END")).as(s"h$k"),
          sum(expr(s"coalesce(c$k, 0)")).as(s"t$k")))
      val mom = lagged.agg(momCols.head, momCols.tail: _*)
      val rTerms = (1 to K).map { k =>
        s"""pow((CAST(p$k AS DOUBLE) - mu * (h$k + t$k) + (n - $k) * mu * mu) / n
           |  / nullif(c0, 0.0), 2) / (n - $k)""".stripMargin
      }.mkString(" + ")
      mom
        .withColumn("mu", expr("CAST(sx AS DOUBLE) / n"))
        .withColumn("c0", expr("(CAST(p0 AS DOUBLE) - mu * (sx + sx) + n * mu * mu) / n"))
        .withColumn("q_lb", expr(s"n * (n + 2.0) * ($rTerms)"))
        .select(col("n"), round(col("q_lb"), 4).as("q_lb"),
          expr("n * (n + 2.0) * (" + rTerms + ") > 14.0671").as("reject_05"))
    }),

    // AUGMENTED-free DICKEY-FULLER unit-root test (Dickey & Fuller
    // 1979, lag-0 form) on the daily count series — "is this series a
    // random walk or mean-reverting", the stationarity gate before any
    // ARMA fit: Δy_t = α + β·y_{t−1} + ε, DF = β̂/se(β̂), reject unit
    // root when DF < −2.89 (the 5% constant-only critical value at
    // this n). All regression moments are exact BIGINT sums over the
    // day table; the closed form (slope, intercept, SSE, se) runs on
    // the 1-row final in identical float text.
    //
    // Scale posture: identical to q_ljung_box — day-grain everything.
    "q_dickey_fuller" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("day"))
      daily
        .withColumn("yl", lag(col("c"), 1).over(w))
        .filter(col("yl").isNotNull)
        .select(col("yl").as("x"), (col("c") - col("yl")).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          sum(expr("y * y")).as("syy"))
        .withColumn("den", expr("CAST(n * sxx - sx * sx AS DOUBLE)"))
        .withColumn("beta", expr("CAST(n * sxy - sx * sy AS DOUBLE) / nullif(den, 0.0)"))
        .withColumn("alpha", expr("(sy - beta * sx) / n"))
        .withColumn("sse", expr(
          "syy - 2 * alpha * sy - 2 * beta * sxy + n * alpha * alpha " +
            "+ 2 * alpha * beta * sx + beta * beta * sxx"))
        .withColumn("se", expr("sqrt(sse / (n - 2) * n / nullif(den, 0.0))"))
        .select(col("n"), round(col("beta"), 6).as("beta"),
          round(expr("beta / nullif(se, 0.0)"), 4).as("df_stat"),
          expr("beta / nullif(se, 0.0) < -2.89").as("reject_unit_root_05"))
    }),

    // THEIL INDEX of customer revenue concentration (Theil 1967) — the
    // DECOMPOSABLE inequality partner of q_gini (Theil splits exactly
    // into within/between group terms; Gini does not): T = Σ x·ln(n·x/S)/S
    // over positive customer revenues. ln runs on exact integer
    // arguments (n·x and S are BIGINTs) in identical expression text —
    // the q_js_drift integer-ratio recipe — and the x-weighted sum is
    // taken at micro fixed point so double summation order can't leak.
    //
    // Scale posture: one orders shuffle to customer grain, a 1-row
    // (n, S) broadcast, one map-side term computation + total.
    "q_theil_index" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("x"))
        .filter(col("x") > 0)
      val tot = rev.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      rev.crossJoin(broadcast(tot))
        .select(col("n"), col("sx"),
          expr("CAST(floor(x * (ln(CAST(n AS DOUBLE) * x) - ln(CAST(sx AS DOUBLE))) " +
            "* 1000000 + 0.5) AS BIGINT)").as("term_micro"))
        .groupBy(col("n"), col("sx"))
        .agg(sum(col("term_micro")).as("s_term"))
        .select(col("n"), col("sx").as("total_cents"),
          round(expr("CAST(s_term AS DOUBLE) / 1000000 / sx"), 6).as("theil"))
    }),

    // LORENZ CURVE decile points of customer revenue — the curve
    // behind q_gini's single number: rank customers by (revenue, id),
    // cut at each decile boundary, report the cumulative population
    // and revenue share. Decile assignment is pure integer arithmetic
    // (((r−1)·10) DIV n), boundary rows are the max-rank row per
    // decile, and shares are exact micro units (cum·10⁶ DIV S).
    //
    // Scale posture: ranks AND the cumulative revenue both come from
    // ONE [[Ranks.globalOrderScan]] bucket-offset pass (revenue-width
    // buckets, x DIV 2²² cents ≈ $42k bands) — the data-grain window
    // partitions by bucket; only the bucket-grain offset scan is
    // partitionless.
    "q_lorenz_points" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("x"))
      val tot = rev.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      Ranks.globalOrderScan(rev, expr("x DIV 4194304"),
          Seq(col("x"), col("o_custkey")), "r", Seq((col("x"), "cum")))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("((r - 1) * 10) DIV n + 1"))
        .groupBy(col("decile"))
        .agg(max(col("r")).as("n_cum"), max(col("cum")).as("cum_cents"),
          max(expr("(cum * 1000000) DIV sx")).as("share_micro"))
        .orderBy(col("decile"))
    }),

    // HOLT-WINTERS additive triple smoothing (Winters 1960) per event
    // type — q_holt's level+trend extended with the WEEKLY seasonal
    // component that daily event series actually have: with m = 7 and
    // α = β = γ = ½, l_t = ⌊(y − s_{t−7} + l + b)/2⌋,
    // b_t = ⌊(l_t − l + b)/2⌋, s_t = ⌊(y − l_t + s_{t−7})/2⌋, seasonal
    // state zero-initialized (the first week smooths the seasonals
    // in). Same exact-integer discipline as q_holt: milli fixed point,
    // floor(x/2.0) halving (identical to DuckDB's floor-div on
    // negative trends where truncating DIV would not be), the
    // sequential recursion as a per-type aggregate() fold over the
    // sorted (day, count) array. The 7-day forecast adds the seasonal
    // of the target weekday — (t+7) mod 7 = t mod 7, the last day's
    // own slot. Oracle replays the identical fold as a per-type
    // recursive CTE carrying (l, b, s0..s6).
    //
    // Scale posture: the corpus collapses to the bounded (type, day)
    // grain in one shuffle; each type's series folds in one lambda —
    // the q_ewma/q_holt sequential-DP recipe.
    "q_holt_winters" -> ((s, d) => {
      val sOld = "element_at(st.s, CAST(x.day % 7 AS INT) + 1)"
      val lt = s"CAST(floor((x.c * 1000 - $sOld + st.l + st.b) / 2.0) AS BIGINT)"
      val sNew = s"CAST(floor((x.c * 1000 - $lt + $sOld) / 2.0) AS BIGINT)"
      Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("sd"))
        .selectExpr("event_type",
          "CAST(size(sd) AS BIGINT) AS n_days",
          "element_at(sd, size(sd)).day AS last_day",
          s"""aggregate(
             |  slice(sd, 2, size(sd) - 1),
             |  named_struct('l', element_at(sd, 1).c * 1000L, 'b', 0L,
             |    's', array_repeat(0L, 7)),
             |  (st, x) -> named_struct(
             |    'l', $lt,
             |    'b', CAST(floor(($lt - st.l + st.b) / 2.0) AS BIGINT),
             |    's', transform(st.s, (v, j) ->
             |      CASE WHEN j = CAST(x.day % 7 AS INT) THEN $sNew ELSE v END)),
             |  st -> st) AS h""".stripMargin)
        .selectExpr("event_type", "n_days",
          "h.l AS level_milli", "h.b AS trend_milli",
          "element_at(h.s, CAST(last_day % 7 AS INT) + 1) AS s_last_milli",
          "h.l + 7 * h.b + element_at(h.s, CAST(last_day % 7 AS INT) + 1) AS forecast7_milli")
        .orderBy(col("event_type"))
    }),

    // HURST EXPONENT by rescaled-range analysis (Hurst 1951; Mandelbrot
    // & Wallis 1969) on the daily count series — the long-memory
    // readout (H ≈ ½ random walk increments, H > ½ trending, H < ½
    // mean-reverting) behind burstiness and capacity models. For each
    // window size w ∈ {4, 8, 16}: complete blocks of w days, per-block
    // cumulative deviation multiplied through by w so it stays BIGINT
    // (dev_t = w·cum_t − t·S), R/S = (max dev − min dev)/√(w·Σx² − S²)
    // — numerator and the radicand both exact integers, so the only
    // float is one sqrt-division per block in identical text,
    // quantized to micro before the per-w integer mean. H is the OLS
    // slope of ln(R/S) on ln(w) over the 3 points, computed on the
    // 3-row final.
    //
    // Scale posture: day-grain everything (the q_ljung_box note); the
    // per-block window partitions by block — no global sort.
    "q_hurst" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
      val perW = Seq(4L, 8L, 16L).map { wsize =>
        val blocks = daily
          .withColumn("blk", expr(s"(rn - 1) DIV $wsize"))
          .withColumn("t", expr(s"(rn - 1) % $wsize + 1"))
        val full = blocks.groupBy(col("blk"))
          .agg(count(lit(1)).as("nb"), sum(col("c")).as("sb"),
            sum(expr("c * c")).as("sxx"))
          .filter(col("nb") === wsize)
        val wcum = Window.partitionBy(col("blk")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        blocks
          .withColumn("cum", sum(col("c")).over(wcum))
          .join(full, Seq("blk"))
          .withColumn("dev", expr(s"$wsize * cum - t * sb"))
          .groupBy(col("blk"), col("sb"), col("sxx"))
          .agg(max(col("dev")).as("maxd"), min(col("dev")).as("mind"))
          .select(expr(
            s"""CAST(floor((maxd - mind) / sqrt(CAST($wsize * sxx - sb * sb AS DOUBLE))
               |* 1000000 + 0.5) AS BIGINT)""".stripMargin).as("rs_micro"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("rs_micro")).as("s_rs"))
          .select(lit(wsize).as("w"), col("n_blocks"),
            expr("s_rs DIV n_blocks").as("rs_mean_micro"))
      }
      val pts = perW.reduce(_ unionByName _)
      val fit = pts.agg(count(lit(1)).as("k"),
        sum(expr("ln(CAST(w AS DOUBLE))")).as("su"),
        sum(expr("ln(CAST(rs_mean_micro AS DOUBLE) / 1000000)")).as("sv"),
        sum(expr("ln(CAST(w AS DOUBLE)) * ln(CAST(rs_mean_micro AS DOUBLE) / 1000000)")).as("suv"),
        sum(expr("ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))")).as("suu"))
      pts.crossJoin(broadcast(fit))
        .select(col("w"), col("n_blocks"), col("rs_mean_micro"),
          round(expr("(k * suv - su * sv) / (k * suu - su * su)"), 4).as("hurst"))
        .orderBy(col("w"))
    }),

    // CLASSICAL ADDITIVE DECOMPOSITION (the moving-average
    // decomposition behind every STL-style seasonal readout) of the
    // daily count series: trend = centered MA-7 (defined only where
    // the ±3 window is FULL), seasonal = per-weekday mean of the
    // detrended series, remainder = y − trend − seasonal. All milli
    // fixed point: the MA is an exact 7-day window sum DIV 7, the
    // seasonal mean routes through the sign-safe division (detrended
    // values go negative), so both engines land on identical integers
    // — the anomaly-on-remainder downstream never sees float drift.
    //
    // Scale posture: day-grain everything (one corpus shuffle); the
    // seasonal join is a broadcast 7-row table.
    "q_classical_decomp" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val tr = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("s7", sum(col("c")).over(w7))
        .filter(col("n7") === 7)
        .select(col("day"), col("c"),
          expr("(s7 * 1000) DIV 7").as("trend_milli"))
        .withColumn("det_milli", expr("c * 1000 - trend_milli"))
      val seas = tr.groupBy(expr("day % 7").as("dow"))
        .agg(count(lit(1)).as("nd"), sum(col("det_milli")).as("sd"))
        .select(col("dow"), expr(sdiv("sd", "nd")).as("seasonal_milli"))
      tr.join(broadcast(seas), expr("day % 7") === col("dow"))
        .select(col("day"), col("c"), col("trend_milli"), col("seasonal_milli"),
          expr("c * 1000 - trend_milli - seasonal_milli").as("remainder_milli"))
        .orderBy(col("day"))
    }),

    // DEMAND ELASTICITY by pooled log-log OLS over lineitem (price
    // varies per sale in this fixture; the slope of ln(qty) on
    // ln(unit price) is the textbook elasticity read): both logs run
    // on EXACT integer arguments (unit cents via the q_cheapest
    // floor(·) recipe, integer quantities) and quantize to the 1e4
    // grid BEFORE the moment sums, so Σx, Σxy, Σx² are exact BIGINTs
    // (sums ≤ ~7e15 at sf0.1, exact in BIGINT far beyond; the slope
    // uses CENTERED moments with division-before-product in DOUBLE —
    // identical text both engines — so no n·Σ product ever forms; the
    // 1e4 grid radix is the documented knob past ~10⁹ rows) and no float summation order exists. The
    // slope/intercept/r² closed form runs on the 1-row final.
    //
    // Scale posture: map-only quantized logs + one aggregate.
    "q_elasticity" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          expr("CAST(floor(ln(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT)) " +
            "* 10000 + 0.5) AS BIGINT)").as("x"),
          expr("CAST(floor(ln(CAST(l_quantity AS BIGINT)) * 10000 + 0.5) AS BIGINT)").as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          sum(expr("y * y")).as("syy"))
        .withColumn("cxy", expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n"))
        .withColumn("cxx", expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n"))
        .withColumn("cyy", expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n"))
        .withColumn("beta", expr("cxy / nullif(cxx, 0.0)"))
        .select(col("n"),
          round(col("beta"), 6).as("elasticity"),
          round(expr("(CAST(sy AS DOUBLE) - beta * sx) / n / 10000"), 6).as("intercept"),
          round(expr("cxy * cxy / nullif(cxx * cyy, 0.0)"), 6).as("r2"))
    }),

    // RETENTION DECAY FIT: the exponential half-life behind
    // q_retention's cohort matrix — pool cohorts to per-offset
    // (active, base) totals, rate = active·10⁶ DIV base (exact), then
    // OLS of the micro-quantized ln(rate) on the offset over the
    // ≤31-row offset table; half-life = ln 2 / (−slope) on the 1-row
    // final (null when the slope is non-negative — flat retention has
    // no half-life, and both engines agree on the null).
    //
    // Scale posture: the user-grain cohort aggregate is the only
    // corpus shuffle; everything after lives at offset grain.
    "q_retention_fit" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val cohortSize = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cs"))
      val perOffset = ev.distinct().join(cohort, "user_id")
        .withColumn("offset_days", col("day") - col("cohort_day"))
        .filter(col("offset_days") >= 1)
        .groupBy(col("cohort_day"), col("offset_days"))
        .agg(countDistinct(col("user_id")).as("active"))
        .join(cohortSize, "cohort_day")
        .groupBy(col("offset_days"))
        .agg(sum(col("active")).as("act"), sum(col("cs")).as("base"))
        .select(col("offset_days").as("t"),
          expr("(act * 1000000) DIV base").as("rate_micro"))
        .filter(col("rate_micro") > 0)
      perOffset
        .select(col("t"),
          expr("CAST(floor(ln(CAST(rate_micro AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("lr"))
        .agg(count(lit(1)).as("n"), sum(col("t")).as("st"), sum(col("lr")).as("sl"),
          sum(expr("t * lr")).as("stl"), sum(expr("t * t")).as("stt"))
        .withColumn("slope", expr(
          "CAST(n * stl - st * sl AS DOUBLE) / nullif(CAST(n * stt - st * st AS DOUBLE), 0.0) / 1000000"))
        .select(col("n"),
          round(col("slope"), 6).as("decay_slope"),
          round(expr("CASE WHEN slope < 0 THEN ln(2.0) / (-slope) END"), 4)
            .as("half_life_days"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS cid, epoch_us(ts) AS cus,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS channel
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT pid, channel, cus, cid
        |  FROM p JOIN c USING (user_id)
        |  WHERE cus < pus AND cus >= pus - 86400000000),
        |r AS (
        |  SELECT pid, channel,
        |    CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS nclk,
        |    row_number() OVER (PARTITION BY pid ORDER BY cus DESC, cid DESC) AS rn
        |  FROM j)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_clicks,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
        |  CAST(SUM(1000000 // nclk) AS BIGINT) AS linear_micro
        |FROM r GROUP BY channel ORDER BY channel""".stripMargin,

    "q_forecast_eval" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, s,
        |    lag(s, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1,
        |    lag(s, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7
        |  FROM daily),
        |e AS (
        |  SELECT event_type, abs(s - f1) AS e1, abs(s - f7) AS e7,
        |    CASE WHEN s + f1 > 0 THEN (abs(s - f1) * 2000000) // (s + f1) END AS sm1,
        |    CASE WHEN s + f7 > 0 THEN (abs(s - f7) * 2000000) // (s + f7) END AS sm7
        |  FROM l WHERE f1 IS NOT NULL AND f7 IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(SUM(e1) AS BIGINT) // count(*) AS mae_naive_c,
        |  CAST(SUM(e7) AS BIGINT) // count(*) AS mae_snaive_c,
        |  CASE WHEN count(sm1) > 0
        |    THEN CAST(SUM(sm1) AS BIGINT) // count(sm1) END AS smape_naive_micro,
        |  CASE WHEN count(sm7) > 0
        |    THEN CAST(SUM(sm7) AS BIGINT) // count(sm7) END AS smape_snaive_micro
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ctr_smoothing" ->
      """WITH ev AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ic,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS iv
        |  FROM events WHERE event_type IN ('click', 'view')),
        |items AS (
        |  SELECT item, CAST(SUM(ic) AS BIGINT) AS clicks,
        |    CAST(SUM(iv) AS BIGINT) AS views
        |  FROM ev GROUP BY item),
        |g AS (
        |  SELECT (CAST(SUM(ic) AS BIGINT) * 1000000) // CAST(SUM(iv) AS BIGINT)
        |    AS gm_micro
        |  FROM ev)
        |SELECT item, views, clicks,
        |  CASE WHEN views > 0 THEN (clicks * 1000000) // views END AS raw_micro,
        |  (clicks * 1000000 + 100 * gm_micro) // (views + 100) AS shrunk_micro
        |FROM items, g ORDER BY item""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(event_id) AS e1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(event_id) AS e2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND event_id > e1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(event_id) AS e3 FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND event_id > e2 GROUP BY e.user_id)
        |SELECT 1 AS stage_no, 'view' AS stage, count(*) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY stage_no""".stripMargin,

    "q_markov" ->
      """WITH t AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
        |  FROM events),
        |m AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM t
        |  WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_micro
        |FROM m ORDER BY src, dst""".stripMargin,

    "q_seasonal" ->
      """SELECT event_type,
        |  (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli,
        |  (CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) * 1000)
        |    // count(*) AS mean_micro
        |FROM events
        |GROUP BY event_type, dow
        |ORDER BY event_type, dow""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT cohort_day, day - cohort_day AS offset_days,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin,

    "q_linear_fit" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 - 19700 AS x,
        |         CAST(floor(value * 1000) AS BIGINT) AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS slope_milli,
        |  round((sy - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n, 4) AS intercept_milli
        |FROM m ORDER BY event_type""".stripMargin,

    "q_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |m2 AS (
        |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM u),
        |bi AS (
        |  SELECT CAST(sum(CASE WHEN user_id % 10 < 6 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 10 >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM u),
        |rows_ AS (
        |  SELECT 'mod2' AS scheme, n0, n1 FROM m2
        |  UNION ALL
        |  SELECT 'biased' AS scheme, n0, n1 FROM bi)
        |SELECT scheme, n0, n1,
        |  ((n0 - n1) * (n0 - n1) * 1000000) // (n0 + n1) AS chi2_micro,
        |  ((n0 - n1) * (n0 - n1) * 1000000) // (n0 + n1) > 3841000 AS srm
        |FROM rows_ ORDER BY scheme""".stripMargin,

    "q_abtest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id),
        |a AS (SELECT user_id % 2 AS arm, converted FROM u),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
        |  FROM a)
        |SELECT n0, c0, n1, c1,
        |  round(CAST(c0 AS DOUBLE) / n0, 4) AS p0_r,
        |  round(CAST(c1 AS DOUBLE) / n1, 4) AS p1_r,
        |  round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
        |        / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
        |               * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 4) AS z
        |FROM s""".stripMargin,

    "q_bayes_rate" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv
        |  FROM events),
        |per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(cv) AS BIGINT) AS conv
        |  FROM ev GROUP BY user_id),
        |gl AS (
        |  SELECT (CAST(SUM(cv) AS BIGINT) * 1000000) // count(*) AS p_micro
        |  FROM ev)
        |SELECT user_id, n, conv,
        |  (conv * 1000000) // n AS raw_micro,
        |  (conv * 1000000 + 20 * p_micro) // (n + 20) AS smoothed_micro
        |FROM per, gl ORDER BY user_id""".stripMargin,

    "q_anomaly_mad" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
        |med AS (
        |  SELECT event_type, CAST(2 * quantile_cont(vm, 0.5) AS BIGINT) AS m2
        |  FROM ev GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, CAST(2 * quantile_cont(abs(2 * vm - m2), 0.5) AS BIGINT) AS mad4
        |  FROM ev e JOIN med USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN 2 * abs(2 * vm - m2) > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(floor(CAST(any_value(m2) AS DOUBLE) / 20) AS BIGINT) AS med_centi,
        |  CAST(floor(CAST(any_value(mad4) AS DOUBLE) / 40) AS BIGINT) AS mad_centi
        |FROM ev e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY event_type""".stripMargin,

    "q_ewma" -> {
      val terms = ewmaWeights.zipWithIndex.map { case (w, j) =>
        s"$w * coalesce(lag(value_milli, $j) OVER w, 0)"
      }.mkString(" + ")
      s"""SELECT event_id, user_id, value_milli,
         |  CAST($terms AS BIGINT) AS ewma_nano
         |FROM (SELECT event_id, user_id,
         |        CAST(floor(value * 1000) AS BIGINT) AS value_milli
         |      FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY event_id""".stripMargin
    },

    "q_winsorize" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(floor(least(greatest(value, lo), hi) * 100) AS BIGINT)) AS BIGINT)
        |        / count(*) / 100, 4) AS winsor_mean,
        |  round(min(least(greatest(value, lo), hi)), 2) AS w_min,
        |  round(max(least(greatest(value, lo), hi)), 2) AS w_max
        |FROM events JOIN cuts USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_heavy_hitters" ->
      """WITH counts AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token)
        |SELECT token, n FROM counts
        |WHERE n * 50 >= (SELECT CAST(sum(n) AS BIGINT) FROM counts)
        |ORDER BY n DESC, token""".stripMargin,

    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS val
        |  FROM orders),
        |last AS (
        |  SELECT key, arg_max(op, seq) AS op, arg_max(val, seq) AS val
        |  FROM log GROUP BY key)
        |SELECT c_custkey,
        |  round(COALESCE(val, c_acctbal), 2) AS balance,
        |  op IS NOT NULL AS changed
        |FROM customer LEFT JOIN last ON key = c_custkey
        |WHERE COALESCE(op, 'U') <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    "q_pit_join" ->
      // the declarative interval form — the union+window plan must
      // match it exactly (empty same-date intervals resolve to the
      // later version in both formulations)
      """WITH dim AS (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER w AS version,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |f AS (
        |  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, l.l_shipdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.l_shipdate,
        |  d.version, d.o_totalprice AS dim_totalprice
        |FROM f LEFT JOIN dim d
        |  ON d.o_custkey = f.o_custkey AND d.valid_from <= f.l_shipdate
        |    AND (d.valid_to > f.l_shipdate OR d.valid_to IS NULL)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scd2" ->
      """SELECT o_custkey, version, o_orderkey, valid_from, valid_to,
        |  valid_to IS NULL AS is_current, o_orderstatus, o_totalprice
        |FROM (
        |  SELECT o_custkey,
        |    row_number() OVER w AS version,
        |    o_orderkey, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to,
        |    o_orderstatus, o_totalprice
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |ORDER BY o_custkey, version""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_groupingsets" ->
      """SELECT event_type, user_id % 10 AS cohort, count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), (event_type, user_id % 10))
        |ORDER BY event_type NULLS FIRST, cohort NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(c_custkey, o_custkey) AS k, c_name, o_orderkey,
        | round(o_totalprice, 2) AS price
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
        |FULL JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000) o
        | ON c_custkey = o_custkey
        |ORDER BY k NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_asof" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | epoch_us(p.ts) AS purchase_us,
        | c.event_id AS click_id, epoch_us(c.ts) AS click_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,

    "q_join_range" ->
      """SELECT band_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |JOIN (SELECT band_id, band_id * 100.0 AS lo, (band_id + 1) * 100.0 AS hi
        |      FROM (SELECT unnest(range(0, 5)) AS band_id))
        | ON value >= lo AND value < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT floor(avg(c_acctbal)) FROM customer)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q_lateral" ->
      """SELECT c_custkey, t.max_price, t.n_orders
        |FROM customer c,
        |LATERAL (SELECT max(o_totalprice) AS max_price,
        |                CAST(count(*) AS BIGINT) AS n_orders
        |         FROM orders o WHERE o.o_custkey = c.c_custkey) t
        |WHERE t.n_orders > 0
        |ORDER BY c_custkey""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE chain(k, anc, depth) AS (
        |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT k, anc // 2, depth + 1 FROM chain WHERE anc > 1)
        |SELECT k AS c_custkey, CAST(max(depth) AS BIGINT) AS depth,
        |  CAST(sum(anc) AS BIGINT) AS chain_sum
        |FROM chain GROUP BY k ORDER BY c_custkey""".stripMargin,

    "q_window_range" ->
      """SELECT event_id, event_type, round(value, 2) AS value,
        |  count(*) OVER w AS n_near,
        |  round(sum(value) OVER w, 2) AS sum_near
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value
        |             RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_window_dist" ->
      """SELECT o_orderkey, o_orderstatus,
        | round(percent_rank() OVER w, 4) AS pr,
        | round(cume_dist() OVER w, 4) AS cd,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name, count(*) AS n,
        | string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9900
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_quantile_exact" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.25), 4) AS p25,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.75), 4) AS p75,
        | round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stats_corr" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        | round(stddev_samp(l_discount), 4) AS sd_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_ks_test" ->
      """WITH ev AS (
        |  SELECT CAST(floor(value * 1000) AS BIGINT) AS vm,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pts AS (
        |  SELECT vm, CAST(SUM(ia) AS BIGINT) AS a, CAST(SUM(ib) AS BIGINT) AS b
        |  FROM ev GROUP BY vm),
        |cum AS (
        |  SELECT vm,
        |    CAST(SUM(a) OVER (ORDER BY vm) AS BIGINT) AS c1,
        |    CAST(SUM(b) OVER (ORDER BY vm) AS BIGINT) AS c2
        |  FROM pts),
        |tot AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS n1, CAST(SUM(ib) AS BIGINT) AS n2 FROM ev),
        |d AS (
        |  SELECT n1, n2, MAX(abs(c1 * n2 - c2 * n1)) AS d_num
        |  FROM cum, tot GROUP BY n1, n2)
        |SELECT n1, n2, d_num,
        |  (d_num * 1000000) // (n1 * n2) AS d_micro,
        |  round(CAST(d_num AS DOUBLE) / (n1 * n2), 6) AS ks_d,
        |  CAST(d_num AS DOUBLE) / (n1 * n2)
        |    > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (n1 * n2)) AS reject_05
        |FROM d""".stripMargin,

    "q_psi" ->
      """WITH ev AS (
        |  SELECT greatest(least(CAST(floor(value / 50.0) AS BIGINT), 9), 0) AS bucket,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('click', 'view')),
        |cnt AS (
        |  SELECT bucket, CAST(SUM(ia) AS BIGINT) AS a, CAST(SUM(ib) AS BIGINT) AS b
        |  FROM ev GROUP BY bucket),
        |tot AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS na, CAST(SUM(ib) AS BIGINT) AS nb FROM ev),
        |spine AS (SELECT unnest(range(0, 10)) AS bucket),
        |terms AS (
        |  SELECT s.bucket, coalesce(a, 0) AS a, coalesce(b, 0) AS b, na, nb,
        |    ((coalesce(a, 0) + 1) * 1000000) // (na + 10) AS p_micro,
        |    ((coalesce(b, 0) + 1) * 1000000) // (nb + 10) AS q_micro,
        |    CAST(floor(ln(CAST((coalesce(a, 0) + 1) * (nb + 10) AS DOUBLE)
        |               / CAST((coalesce(b, 0) + 1) * (na + 10) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS lr_e4
        |  FROM spine s LEFT JOIN cnt USING (bucket), tot),
        |t2 AS (
        |  SELECT bucket, a, b, p_micro, q_micro, lr_e4,
        |    ((p_micro - q_micro) * lr_e4) // 10000 AS term_micro
        |  FROM terms),
        |psi AS (SELECT CAST(SUM(term_micro) AS BIGINT) AS psi_micro FROM t2)
        |SELECT bucket, a, b, p_micro, q_micro, lr_e4, term_micro, psi_micro
        |FROM t2, psi ORDER BY bucket""".stripMargin,

    "q_t_test" ->
      """WITH g AS (
        |  SELECT source, CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS grp,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY 1, 2),
        |st AS (
        |  SELECT source, grp, n,
        |    (sx * 1000000) // n AS mean_micro,
        |    CASE WHEN n > 1 THEN ((n * sxx - sx * sx) * 1000000) // (n * (n - 1))
        |         ELSE 0 END AS var_micro
        |  FROM g),
        |j AS (
        |  SELECT a.source, a.n AS n_en, b.n AS n_other,
        |    a.mean_micro AS mean_en_micro, b.mean_micro AS mean_other_micro,
        |    a.var_micro AS var_en_micro, b.var_micro AS var_other_micro,
        |    a.var_micro // a.n + b.var_micro // b.n AS se2_micro
        |  FROM st a JOIN st b ON a.source = b.source
        |  WHERE a.grp = 'en' AND b.grp = 'other')
        |SELECT source, n_en, n_other, mean_en_micro, mean_other_micro,
        |  var_en_micro, var_other_micro, se2_micro,
        |  CASE WHEN se2_micro > 0 THEN
        |    ((mean_en_micro - mean_other_micro) * (mean_en_micro - mean_other_micro))
        |      // se2_micro END AS t2_micro
        |FROM j ORDER BY source""".stripMargin,

    "q_funnel_time" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(event_id) AS e1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, e1, MIN(event_id) AS e2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND event_id > e1 GROUP BY e.user_id, e1),
        |s3 AS (
        |  SELECT e.user_id, e1, e2, MIN(event_id) AS e3 FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND event_id > e2 GROUP BY e.user_id, e1, e2),
        |durs AS (
        |  SELECT epoch_us(t2.ts) - epoch_us(t1.ts) AS d12,
        |    epoch_us(t3.ts) - epoch_us(t2.ts) AS d23
        |  FROM s3
        |  JOIN events t1 ON t1.event_id = s3.e1
        |  JOIN events t2 ON t2.event_id = s3.e2
        |  JOIN events t3 ON t3.event_id = s3.e3)
        |SELECT count(*) AS n_converted,
        |  CAST(2 * quantile_cont(d12, 0.5) AS BIGINT) AS med2_view_click_us,
        |  CAST(2 * quantile_cont(d23, 0.5) AS BIGINT) AS med2_click_purchase_us,
        |  CAST(max(d12) AS BIGINT) AS max_view_click_us,
        |  CAST(max(d23) AS BIGINT) AS max_click_purchase_us
        |FROM durs""".stripMargin,

    "q_session_stats" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 900000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |i AS (
        |  SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g),
        |sess AS (
        |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_events,
        |    max(us) - min(us) AS dur_us
        |  FROM i GROUP BY user_id, island)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(2 * quantile_cont(n_events, 0.5) AS BIGINT) AS med2_events,
        |  CAST(2 * quantile_cont(dur_us, 0.5) AS BIGINT) AS med2_dur_us,
        |  CAST(max(dur_us) AS BIGINT) AS max_dur_us,
        |  (CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // count(*) AS bounce_micro
        |FROM sess""".stripMargin,

    "q_dau_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |rep AS (
        |  SELECT DISTINCT r.day, du.user_id
        |  FROM du, (SELECT unnest(range(0, 7)) AS o) oo,
        |    LATERAL (SELECT du.day + oo.o AS day) r
        |  WHERE r.day IN (SELECT day FROM days)),
        |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM rep GROUP BY day),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau,
        |  (dau.dau * 1000000) // wau.wau AS stickiness_micro
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,

    "q_group_norm" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) AS vm
        |  FROM events),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(vm) AS BIGINT) AS sv, CAST(SUM(vm * vm) AS BIGINT) AS svv
        |  FROM ev GROUP BY event_type)
        |SELECT ev.event_id, ev.event_type, ev.vm,
        |  CAST(floor(
        |    (CAST(vm AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(svv AS DOUBLE)
        |            - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
        |           / CAST(n - 1 AS DOUBLE))
        |    * 1000000) AS BIGINT) AS z_micro
        |FROM ev JOIN mom USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_autocorr" -> {
      def lagSel(k: Int): String =
        s"""SELECT $k AS lag, CAST(count(*) AS BIGINT) AS n,
           |  round(CAST(count(*) * CAST(SUM(c * c$k) AS BIGINT)
           |             - CAST(SUM(c) AS BIGINT) * CAST(SUM(c$k) AS BIGINT) AS DOUBLE)
           |        / sqrt(CAST(count(*) * CAST(SUM(c * c) AS BIGINT)
           |                    - CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT) AS DOUBLE)
           |               * CAST(count(*) * CAST(SUM(c$k * c$k) AS BIGINT)
           |                      - CAST(SUM(c$k) AS BIGINT) * CAST(SUM(c$k) AS BIGINT) AS DOUBLE)), 6) AS acf
           |FROM lagged WHERE c$k IS NOT NULL""".stripMargin
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |lagged AS (
         |  SELECT day, c,
         |    ${(1 to 7).map(k => s"lead(c, $k) OVER (ORDER BY day) AS c$k").mkString(",\n    ")}
         |  FROM daily)
         |${(1 to 7).map(lagSel).mkString("\nUNION ALL\n")}
         |ORDER BY lag""".stripMargin
    },

    // Same exact-BIGINT lagged sums; the Yule-Walker closed form in
    // the identical float expression text, layered through CTEs to
    // mirror the Spark withColumn chain.
    "q_ar_fit" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, c,
        |    lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
        |    lead(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS c2
        |  FROM daily),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sx,
        |    CAST(SUM(c * c) AS BIGINT) AS p0,
        |    CAST(SUM(CASE WHEN c1 IS NOT NULL THEN c * c1 ELSE 0 END) AS BIGINT) AS p1,
        |    CAST(SUM(CASE WHEN c1 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(SUM(coalesce(c1, 0)) AS BIGINT) AS t1,
        |    CAST(SUM(CASE WHEN c2 IS NOT NULL THEN c * c2 ELSE 0 END) AS BIGINT) AS p2,
        |    CAST(SUM(CASE WHEN c2 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h2,
        |    CAST(SUM(coalesce(c2, 0)) AS BIGINT) AS t2
        |  FROM lagged GROUP BY 1),
        |m1 AS (SELECT *, CAST(sx AS DOUBLE) / n AS mu FROM mom),
        |m2 AS (SELECT *,
        |    (CAST(p0 AS DOUBLE) - mu * (sx + sx) + n * mu * mu) / n AS c0,
        |    (CAST(p1 AS DOUBLE) - mu * (h1 + t1) + (n - 1) * mu * mu) / n AS cv1,
        |    (CAST(p2 AS DOUBLE) - mu * (h2 + t2) + (n - 2) * mu * mu) / n AS cv2
        |  FROM m1),
        |m3 AS (SELECT *, cv1 / nullif(c0, 0.0) AS r1, cv2 / nullif(c0, 0.0) AS r2
        |  FROM m2)
        |SELECT event_type, n, round(mu, 4) AS mu,
        |  round(r1, 4) AS r1, round(r2, 4) AS r2,
        |  round(r1 * (1 - r2) / nullif(1 - r1 * r1, 0.0), 4) AS phi1,
        |  round((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0), 4) AS phi2,
        |  round(c0 * (1 - (r1 * (1 - r2) / nullif(1 - r1 * r1, 0.0)) * r1
        |              - ((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0)) * r2), 4) AS sigma2
        |FROM m3 ORDER BY event_type""".stripMargin,

    // The Holt recursion replayed as a recursive CTE over the row
    // number within each type's day series — same milli integers,
    // same floor(x/2.0) halving.
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ord AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |rec AS (
        |  SELECT event_type, i, n, c * 1000 AS l, CAST(0 AS BIGINT) AS b
        |  FROM ord WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.i, r.n,
        |    CAST(floor((o.c * 1000 + r.l + r.b) / 2.0) AS BIGINT) AS l,
        |    CAST(floor((CAST(floor((o.c * 1000 + r.l + r.b) / 2.0) AS BIGINT)
        |                - r.l + r.b) / 2.0) AS BIGINT) AS b
        |  FROM rec r JOIN ord o ON o.event_type = r.event_type AND o.i = r.i + 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  l AS level_milli, b AS trend_milli,
        |  l + 7 * b AS forecast7_milli
        |FROM rec WHERE i = n ORDER BY event_type""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS sc, CAST(count(*) AS BIGINT) AS n FROM daily),
        |cum AS (
        |  SELECT day, c,
        |    CAST(SUM(n * c - sc) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_t
        |  FROM daily, tot)
        |SELECT day, c, s_t, abs(s_t) AS abs_s
        |FROM cum ORDER BY abs_s DESC, day LIMIT 1""".stripMargin,

    "q_gini" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS r FROM rev),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(r * x) AS BIGINT) AS srx
        |  FROM ranked)
        |SELECT n, sx, 2 * srx - (n + 1) * sx AS gini_num,
        |  round(CAST(2 * srx - (n + 1) * sx AS DOUBLE) / (CAST(n AS DOUBLE) * sx), 6) AS gini
        |FROM agg""".stripMargin,

    "q_chi2" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS obs FROM events GROUP BY event_type),
        |tot AS (
        |  SELECT CAST(SUM(obs) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM obs),
        |agg AS (
        |  SELECT n, k, CAST(SUM((k * obs - n) * (k * obs - n)) AS BIGINT) AS chi2_num
        |  FROM obs, tot GROUP BY n, k)
        |SELECT n, k, k - 1 AS df, chi2_num,
        |  round(CAST(chi2_num AS DOUBLE) / (k * n), 6) AS chi2,
        |  CAST(chi2_num AS DOUBLE) / (k * n) > 9.4877 AS reject_05
        |FROM agg""".stripMargin,

    "q_skyline" ->
      """WITH p AS (
        |  SELECT DISTINCT CAST(floor(p_retailprice * 100) AS BIGINT) AS price_centi, p_size
        |  FROM part)
        |SELECT price_centi, p_size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_centi <= a.price_centi AND b.p_size <= a.p_size
        |    AND (b.price_centi < a.price_centi OR b.p_size < a.p_size))
        |ORDER BY price_centi, p_size""".stripMargin,

    "q_mann_whitney" ->
      """WITH byval AS (
        |  SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |r AS (
        |  SELECT vm, na_v, nb_v, na_v + nb_v AS t,
        |    CAST(COALESCE(SUM(na_v + nb_v) OVER (ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM byval),
        |a AS (
        |  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a, CAST(SUM(nb_v) AS BIGINT) AS n_b,
        |    CAST(SUM(na_v * (2 * cum_before + t + 1)) AS BIGINT) AS sr2_a,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties_t
        |  FROM r),
        |b AS (
        |  SELECT n_a, n_b, n_a + n_b AS n, ties_t, sr2_a - n_a * (n_a + 1) AS u2_a FROM a)
        |SELECT n_a, n_b, u2_a, 2 * n_a * n_b - u2_a AS u2_b, ties_t,
        |  ((3 * ((u2_a // 2 - (n_a * n_b) // 2) * (u2_a // 2 - (n_a * n_b) // 2))
        |       // (n_a * n_b)) * 1000000)
        |    // ((n * n * n - n - ties_t) // (n * (n - 1))) AS z2_micro,
        |  ((3 * ((u2_a // 2 - (n_a * n_b) // 2) * (u2_a // 2 - (n_a * n_b) // 2))
        |       // (n_a * n_b)) * 1000000)
        |    // ((n * n * n - n - ties_t) // (n * (n - 1))) > 3841500 AS reject_05
        |FROM b""".stripMargin,

    "q_mann_kendall" ->
      """WITH days AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CAST(sign(b.c - a.c) AS BIGINT)) AS BIGINT) AS s
        |  FROM days a JOIN days b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |tt AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS ties_t,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
        |        FROM days GROUP BY 1, 2)
        |  GROUP BY 1),
        |j AS (
        |  SELECT p.event_type, n, s, ties_t,
        |    n * (n - 1) * (2 * n + 5) - ties_t AS var18
        |  FROM p JOIN tt ON p.event_type = tt.event_type),
        |z AS (
        |  SELECT event_type, n, s, ties_t,
        |    CASE WHEN abs(s) >= 1 AND var18 > 0
        |      THEN (18 * (abs(s) - 1) * (abs(s) - 1) * 1000000) // var18
        |      ELSE 0 END AS z2_micro
        |  FROM j)
        |SELECT event_type, n, s, ties_t, z2_micro,
        |  CASE WHEN z2_micro <= 3841500 THEN 'none'
        |       WHEN s > 0 THEN 'up' ELSE 'down' END AS trend
        |FROM z ORDER BY event_type""".stripMargin,

    "q_theil_sen" -> {
      val slope = sdivSql("(b.c - a.c) * 1000", "b.day - a.day")
      s"""WITH days AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |sl AS (
         |  SELECT a.event_type, $slope AS slope_milli
         |  FROM days a JOIN days b
         |    ON a.event_type = b.event_type AND a.day < b.day)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(2 * quantile_cont(slope_milli, 0.5) AS BIGINT) AS med2_slope_milli
         |FROM sl GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "q_cuped" -> {
      val theta = sdivSql("cov_num", "nullif(var_num // 1000000, 0)")
      val corr = sdivSql("theta_micro * (pre - sp // n)", "1000000")
      s"""WITH b AS (
         |  SELECT (min(epoch_us(ts) // 3600000000)
         |        + max(epoch_us(ts) // 3600000000) + 1) // 2 AS mid
         |  FROM events),
         |u AS (
         |  SELECT user_id, user_id % 2 AS arm,
         |    CAST(SUM(CASE WHEN epoch_us(ts) // 3600000000 < mid
         |         THEN CAST(floor(value * 10 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
         |    CAST(SUM(CASE WHEN epoch_us(ts) // 3600000000 >= mid
         |         THEN CAST(floor(value * 10 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS post
         |  FROM events, b GROUP BY user_id),
         |m0 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(pre) AS BIGINT) AS sp,
         |    CAST(SUM(post) AS BIGINT) AS so,
         |    CAST(SUM(pre * pre) AS BIGINT) AS spp,
         |    CAST(SUM(pre * post) AS BIGINT) AS spo
         |  FROM u),
         |m1 AS (SELECT n, sp, n * spo - sp * so AS cov_num,
         |              n * spp - sp * sp AS var_num FROM m0),
         |m AS (SELECT n, sp, $theta AS theta_micro FROM m1),
         |a AS (
         |  SELECT arm, post, theta_micro, post - $corr AS adj FROM u, m),
         |g AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(MAX(theta_micro) AS BIGINT) AS theta_micro,
         |    CAST(SUM(post) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_post_deci,
         |    ${sdivSql("CAST(SUM(adj) AS BIGINT)", "CAST(count(*) AS BIGINT)")} AS mean_adj_deci,
         |    CAST(count(*) * SUM(post * post) - SUM(post) * SUM(post) AS BIGINT) AS var_post_num,
         |    CAST(count(*) * SUM(adj * adj) - SUM(adj) * SUM(adj) AS BIGINT) AS var_adj_num
         |  FROM a GROUP BY arm)
         |SELECT arm, n_users, theta_micro, mean_post_deci, mean_adj_deci,
         |  var_post_num, var_adj_num,
         |  ${sdivSql("(var_post_num - var_adj_num) * 1000000", "nullif(var_post_num, 0)")} AS red_micro
         |FROM g ORDER BY arm""".stripMargin
    },

    "q_seq_pairs" ->
      """WITH spans AS (
        |  SELECT user_id, event_type,
        |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
        |ha AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a FROM spans GROUP BY 1),
        |f AS (
        |  SELECT x.event_type AS a, y.event_type AS b, CAST(count(*) AS BIGINT) AS n_follow
        |  FROM spans x JOIN spans y
        |    ON x.user_id = y.user_id AND x.event_type <> y.event_type AND x.lo < y.hi
        |  GROUP BY 1, 2)
        |SELECT a, b, n_follow,
        |  (n_follow * 1000000) // n_users AS support_micro,
        |  (n_follow * 1000000) // n_a AS conf_micro
        |FROM f JOIN ha ON f.a = ha.event_type, u
        |ORDER BY a, b""".stripMargin,

    "q_sax" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS xm
        |  FROM events),
        |r AS (
        |  SELECT user_id, xm,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS k,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM ev),
        |p AS (
        |  SELECT user_id, (k * 8) // n AS seg,
        |    CAST(SUM(xm) AS BIGINT) // CAST(count(*) AS BIGINT) AS paa,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, seg, c,
        |    CASE WHEN paa < 100000 THEN 'a' WHEN paa < 200000 THEN 'b'
        |         WHEN paa < 300000 THEN 'c' WHEN paa < 400000 THEN 'd'
        |         ELSE 'e' END AS letter
        |  FROM p)
        |SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
        |  string_agg(letter, '' ORDER BY seg) AS sax
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_centi
        |  FROM orders GROUP BY o_custkey),
        |gm AS (SELECT MAX(last_d) AS gmax FROM cust),
        |scored AS (
        |  SELECT o_custkey, spend_centi,
        |    CAST(date_diff('day', last_d, gmax) AS BIGINT) AS r_days,
        |    ntile(5) OVER (ORDER BY date_diff('day', last_d, gmax), o_custkey) AS r_q,
        |    ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f_q,
        |    ntile(5) OVER (ORDER BY spend_centi DESC, o_custkey) AS m_q
        |  FROM cust, gm)
        |SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(spend_centi) AS BIGINT) AS spend_centi,
        |  CAST(MIN(o_custkey) AS BIGINT) AS sample_custkey
        |FROM scored GROUP BY 1 ORDER BY rfm""".stripMargin,

    "q_cusum" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, ts,
        |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS xm
        |  FROM events),
        |mu AS (
        |  SELECT event_type,
        |    CAST(SUM(xm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_milli
        |  FROM ev GROUP BY event_type),
        |p AS (
        |  SELECT e.event_type, e.event_id, e.ts, mean_milli,
        |    CAST(SUM(xm - mean_milli - 5000) OVER (PARTITION BY e.event_type
        |      ORDER BY e.ts, e.event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        |  FROM ev e JOIN mu USING (event_type)),
        |sc AS (
        |  SELECT event_type, event_id, mean_milli,
        |    p - LEAST(CAST(MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_milli
        |  FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(MAX(mean_milli) AS BIGINT) AS mean_milli,
        |  CAST(MAX(s_milli) AS BIGINT) AS peak_s_milli,
        |  CAST(SUM(CASE WHEN s_milli > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(MIN(CASE WHEN s_milli > 200000 THEN event_id END) AS BIGINT) AS first_alarm_id
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q_approx_stats: no oracle (sketches are engine-specific).

    "q_spatial_join" ->
      """WITH cust AS (
        |  SELECT c_custkey AS id,
        |    (c_custkey * 16807) % 180000 AS lat,
        |    (c_custkey * 48271) % 360000 AS lon
        |  FROM customer),
        |supp AS (
        |  SELECT s_suppkey AS sid,
        |    (s_suppkey * 16807) % 180000 AS slat,
        |    (s_suppkey * 48271) % 360000 AS slon
        |  FROM supplier),
        |sexp AS (
        |  SELECT sid, slat, slon,
        |    slat // 5000 + da.o AS cla, slon // 5000 + db.o AS clo
        |  FROM supp,
        |    (VALUES (-1), (0), (1)) da(o),
        |    (VALUES (-1), (0), (1)) db(o)),
        |cand AS (
        |  SELECT sid,
        |    (slat - lat) * (slat - lat) + (slon - lon) * (slon - lon) AS d2,
        |    id
        |  FROM sexp JOIN cust
        |    ON cust.lat // 5000 = sexp.cla AND cust.lon // 5000 = sexp.clo)
        |SELECT sid, CAST(count(*) AS BIGINT) AS n_within,
        |  CAST(MIN(d2 * 2097152 + id) % 2097152 AS BIGINT) AS nearest_cust,
        |  CAST(MIN(d2 * 2097152 + id) // 2097152 AS BIGINT) AS nearest_d2
        |FROM cand WHERE d2 <= 25000000
        |GROUP BY sid ORDER BY sid""".stripMargin,

    "q_concurrency" ->
      """WITH marks AS (
        |  SELECT event_type, t, delta FROM (
        |    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t,
        |      CAST(1 AS BIGINT) AS delta
        |    FROM events
        |    UNION ALL
        |    SELECT event_type,
        |      CAST(epoch_us(ts) AS BIGINT)
        |        + CAST(floor(value) + 1 AS BIGINT) * 1000000 AS t,
        |      CAST(-1 AS BIGINT) AS delta
        |    FROM events)),
        |cum AS (
        |  SELECT event_type,
        |    CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS BIGINT) AS live
        |  FROM marks)
        |SELECT event_type,
        |  CAST(count(*) / 2 AS BIGINT) AS n_intervals,
        |  CAST(MAX(live) AS BIGINT) AS max_concurrent
        |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_weighted_quantile" ->
      """WITH census AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
        |    CAST(count(*) AS BIGINT) AS c,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS wsum
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(wsum) AS BIGINT) AS w, CAST(SUM(c) AS BIGINT) AS n FROM census),
        |cum AS (
        |  SELECT *, COALESCE(CAST(SUM(wsum) OVER (ORDER BY len
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS bw
        |  FROM census),
        |ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (50), (90), (99)) t(p))
        |SELECT p, CAST(MIN(len) AS BIGINT) AS q_len_weighted,
        |  CAST(MAX(n) AS BIGINT) AS n_docs, CAST(MAX(w) AS BIGINT) AS tokens_total
        |FROM cum, tot, ps
        |WHERE bw + wsum >= (p * w + 99) // 100
        |GROUP BY p ORDER BY p""".stripMargin,

    "q_mom_growth" -> {
      val nG = sdivSql("(n - n_prev) * 1000", "n_prev")
      val vG = sdivSql("(val_c - v_prev) * 1000", "abs(v_prev)")
      s"""WITH months AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 // 30 AS m30,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS val_c
         |  FROM events GROUP BY 1, 2),
         |lagged AS (
         |  SELECT *, lag(n, 1) OVER w AS n_prev, lag(val_c, 1) OVER w AS v_prev
         |  FROM months WINDOW w AS (PARTITION BY event_type ORDER BY m30))
         |SELECT event_type, m30, n, val_c,
         |  $nG AS n_growth_milli,
         |  CASE WHEN v_prev <> 0 THEN $vG END AS v_growth_milli
         |FROM lagged WHERE n_prev IS NOT NULL
         |ORDER BY event_type, m30""".stripMargin
    },

    "q_markov_hitting" -> {
      def round(prev: String, k: Int): String =
        s"""s$k AS (
           |  SELECT m.src, CAST(SUM(m.n * e.e_micro) AS BIGINT) AS se
           |  FROM m JOIN $prev e ON m.dst = e.st GROUP BY m.src),
           |e$k AS (
           |  SELECT o.src AS st,
           |    CASE WHEN o.src = 'purchase' THEN CAST(0 AS BIGINT)
           |         ELSE 1000000 + (COALESCE(s$k.se, 0) // o.n_out)
           |    END AS e_micro
           |  FROM outn o LEFT JOIN s$k ON o.src = s$k.src)""".stripMargin
      s"""WITH t AS (
         |  SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
         |  FROM events),
         |m AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         |  FROM t WHERE dst IS NOT NULL GROUP BY 1, 2),
         |outn AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out FROM m GROUP BY src),
         |e0 AS (SELECT src AS st, CAST(0 AS BIGINT) AS e_micro FROM outn),
         |${round("e0", 1)},
         |${round("e1", 2)},
         |${round("e2", 3)},
         |${round("e3", 4)},
         |${round("e4", 5)},
         |${round("e5", 6)}
         |SELECT o.src, o.n_out, e6.e_micro AS e_steps_micro
         |FROM outn o JOIN e6 ON o.src = e6.st
         |ORDER BY o.src""".stripMargin
    },

    "q_interval_sched" ->
      """WITH RECURSIVE ev AS MATERIALIZED (
        |  SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + CAST(floor(value) + 1 AS BIGINT) * 1000000 AS en,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) + CAST(floor(value) + 1 AS BIGINT) * 1000000,
        |               event_id) AS BIGINT) AS seq
        |  FROM events),
        |nev AS (SELECT user_id, CAST(max(seq) AS BIGINT) AS n FROM ev GROUP BY user_id),
        |fold(user_id, i, cnt, last_end) AS (
        |  SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(-9223372036854775807 AS BIGINT)
        |  FROM nev
        |  UNION ALL
        |  SELECT f.user_id, f.i + 1,
        |    f.cnt + CASE WHEN e.st >= f.last_end THEN 1 ELSE 0 END,
        |    CASE WHEN e.st >= f.last_end THEN e.en ELSE f.last_end END
        |  FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.seq = f.i + 1)
        |SELECT f.user_id, nev.n AS n_events, f.cnt AS n_scheduled
        |FROM fold f JOIN nev ON f.user_id = nev.user_id AND f.i = nev.n
        |ORDER BY f.user_id""".stripMargin,

    "q_cheapest_supplier" ->
      """SELECT DISTINCT p.p_partkey, l.l_suppkey,
        |  CAST(floor(l.l_extendedprice * 100 / l.l_quantity) AS BIGINT) AS unit_cents
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_size >= 40
        |  AND CAST(floor(l.l_extendedprice * 100 / l.l_quantity) AS BIGINT) =
        |      (SELECT MIN(CAST(floor(l2.l_extendedprice * 100 / l2.l_quantity) AS BIGINT))
        |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p_partkey, l_suppkey
        |LIMIT 100""".stripMargin,

    "q_small_qty_avg" ->
      """WITH pa AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_p,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_p
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n_p < s_p""".stripMargin,

    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS rev_cp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.rev_cp
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        |WHERE r.rev_cp = (SELECT MAX(rev_cp) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_cust_above_avg" ->
      """WITH pos AS (
        |  SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal, c_custkey, c_nationkey
        |  FROM customer),
        |thr AS (
        |  SELECT CAST(SUM(bal) AS BIGINT) AS s_bal, CAST(COUNT(*) AS BIGINT) AS n_bal
        |  FROM pos WHERE bal > 0)
        |SELECT p.c_nationkey AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(p.bal) AS BIGINT) AS bal_cents
        |FROM pos p, thr
        |WHERE p.bal * thr.n_bal > thr.s_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY p.c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_band_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cc
        |FROM lineitem
        |WHERE year(l_shipdate) = 1997 AND l_quantity < 24
        |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7""".stripMargin,

    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(rev) AS BIGINT) AS total_cp,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END) AS BIGINT)
        |    AS nation_cp,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev ELSE 0 END) * 1000 AS BIGINT)
        |    // CAST(SUM(rev) AS BIGINT) AS share_permille
        |FROM (
        |  SELECT o_orderdate, sn.n_name AS supp_nation,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
        |    AS revenue_cp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cp DESC, c_custkey LIMIT 20""".stripMargin,

    "q_part_supplier_count" ->
      """SELECT p_brand, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20""".stripMargin,

    "q_excess_suppliers" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qtot,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1997
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q97
        |  FROM lineitem GROUP BY 1, 2),
        |ex AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_excess_parts,
        |    CAST(SUM(q97) AS BIGINT) AS q97_total
        |  FROM sp WHERE 2 * q97 > qtot GROUP BY 1)
        |SELECT s_suppkey, s_name, n_excess_parts, q97_total
        |FROM ex JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY n_excess_parts DESC, s_suppkey LIMIT 20""".stripMargin,

    "q_ship_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
        |    AS revenue_cp
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cp DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q_late_priority_mix" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_promo_share" ->
      """WITH rev AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')
        |SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_cp,
        |  CAST(SUM(rev) AS BIGINT) AS total_cp,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 1000 AS BIGINT)
        |    // CAST(SUM(rev) AS BIGINT) AS promo_permille
        |FROM rev""".stripMargin,

    "q_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_bracket_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
        |    AS revenue_cp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
        |        AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30
        |        AND l_quantity BETWEEN 20 AND 35)""".stripMargin,

    "q_nation_volume" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
        |    AS revenue_cp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE cn.n_name <> sn.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY cust_nation, supp_nation, l_year""".stripMargin,

    "q_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |    - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 80
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_late_solo_supplier" ->
      """WITH li AS MATERIALIZED (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |per_order AS (
        |  SELECT l_orderkey,
        |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |    CAST(count(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT)
        |      AS n_late_supp
        |  FROM li GROUP BY 1)
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late) s
        |JOIN per_order USING (l_orderkey)
        |WHERE n_supp >= 2 AND n_late_supp = 1
        |GROUP BY l_suppkey
        |ORDER BY numwait DESC, l_suppkey LIMIT 20""".stripMargin,

    "q_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cq
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
        |  GROUP BY l_partkey),
        |tot AS (SELECT CAST(SUM(value_cq) AS BIGINT) AS total_cq FROM per_part)
        |SELECT l_partkey, value_cq,
        |  (value_cq * 1000000) // total_cq AS share_micro
        |FROM per_part, tot
        |WHERE value_cq * 1000 > total_cq
        |ORDER BY value_cq DESC, l_partkey LIMIT 50""".stripMargin,

    "q_order_count_dist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |  ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
        |FROM per_cust GROUP BY c_count
        |ORDER BY n_customers DESC, c_count DESC""".stripMargin,

    "q_ljung_box" -> {
      val rTerms = (1 to 7).map { k =>
        s"""pow((CAST(p$k AS DOUBLE) - mu * (h$k + t$k) + (n - $k) * mu * mu) / n
           |  / nullif(c0, 0.0), 2) / (n - $k)""".stripMargin
      }.mkString(" + ")
      val moms = (1 to 7).map { k =>
        s"""CAST(SUM(CASE WHEN c$k IS NOT NULL THEN c * c$k ELSE 0 END) AS BIGINT) AS p$k,
           |    CAST(SUM(CASE WHEN c$k IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS h$k,
           |    CAST(SUM(coalesce(c$k, 0)) AS BIGINT) AS t$k""".stripMargin
      }.mkString(",\n    ")
      val leads = (1 to 7).map(k =>
        s"lead(c, $k) OVER (ORDER BY day) AS c$k").mkString(",\n    ")
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |lagged AS (
         |  SELECT day, c,
         |    $leads
         |  FROM daily),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sx,
         |    CAST(SUM(c * c) AS BIGINT) AS p0,
         |    $moms
         |  FROM lagged),
         |ev AS (
         |  SELECT *, CAST(sx AS DOUBLE) / n AS mu,
         |    (CAST(p0 AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * (sx + sx)
         |      + n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / n AS c0
         |  FROM mom)
         |SELECT n, round(n * (n + 2.0) * ($rTerms), 4) AS q_lb,
         |  n * (n + 2.0) * ($rTerms) > 14.0671 AS reject_05
         |FROM ev""".stripMargin
    },

    "q_dickey_fuller" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT yl AS x, c - yl AS y FROM (
        |    SELECT c, lag(c, 1) OVER (ORDER BY day) AS yl FROM daily)
        |  WHERE yl IS NOT NULL),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pairs),
        |fit AS (
        |  SELECT *,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS den,
        |    CAST(n * sxy - sx * sy AS DOUBLE) / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS beta
        |  FROM mom),
        |fit2 AS (
        |  SELECT *, (sy - beta * sx) / n AS alpha FROM fit),
        |fit3 AS (
        |  SELECT *,
        |    syy - 2 * alpha * sy - 2 * beta * sxy + n * alpha * alpha
        |      + 2 * alpha * beta * sx + beta * beta * sxx AS sse
        |  FROM fit2),
        |fin AS (
        |  SELECT *, sqrt(sse / (n - 2) * n / nullif(den, 0.0)) AS se FROM fit3)
        |SELECT n, round(beta, 6) AS beta,
        |  round(beta / nullif(se, 0.0), 4) AS df_stat,
        |  beta / nullif(se, 0.0) < -2.89 AS reject_unit_root_05
        |FROM fin""".stripMargin,

    "q_theil_index" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |pos AS (SELECT * FROM rev WHERE x > 0),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM pos),
        |terms AS (
        |  SELECT n, sx,
        |    CAST(floor(x * (ln(CAST(n AS DOUBLE) * x) - ln(CAST(sx AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) AS term_micro
        |  FROM pos, tot)
        |SELECT n, sx AS total_cents,
        |  round(CAST(CAST(SUM(term_micro) AS BIGINT) AS DOUBLE) / 1000000 / sx, 6) AS theil
        |FROM terms GROUP BY n, sx""".stripMargin,

    "q_lorenz_points" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM rev),
        |ranked AS (
        |  SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS r,
        |    CAST(SUM(x) OVER (ORDER BY x, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM rev)
        |SELECT ((r - 1) * 10) // n + 1 AS decile,
        |  CAST(MAX(r) AS BIGINT) AS n_cum,
        |  CAST(MAX(cum) AS BIGINT) AS cum_cents,
        |  CAST(MAX((cum * 1000000) // sx) AS BIGINT) AS share_micro
        |FROM ranked, tot
        |GROUP BY 1
        |ORDER BY decile""".stripMargin,

    // Replays the identical fold as a per-type recursive CTE carrying
    // (l, b, s0..s6); the seasonal-slot CASE trees repeat the lt/snew
    // text per column — mechanical, and bit-identical to the Spark
    // lambda because every halving is floor(x/2.0) on BIGINTs.
    "q_holt_winters" -> {
      val sOld = "(CASE CAST(d.day % 7 AS BIGINT) " +
        (0 to 6).map(i => s"WHEN $i THEN r.s$i").mkString(" ") + " END)"
      val lt = s"CAST(floor((d.c * 1000 - $sOld + r.l + r.b) / 2.0) AS BIGINT)"
      val sNew = s"CAST(floor((d.c * 1000 - $lt + $sOld) / 2.0) AS BIGINT)"
      val sCols = (0 to 6).map(i =>
        s"CASE WHEN CAST(d.day % 7 AS BIGINT) = $i THEN $sNew ELSE r.s$i END").mkString(",\n         |    ")
      s"""WITH RECURSIVE daily AS MATERIALIZED (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |seq AS MATERIALIZED (
         |  SELECT event_type, day, c,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn
         |  FROM daily),
         |nmax AS (SELECT event_type, CAST(max(rn) AS BIGINT) AS n,
         |           CAST(max(day) AS BIGINT) AS last_day
         |         FROM seq GROUP BY event_type),
         |rec(event_type, rn, l, b, s0, s1, s2, s3, s4, s5, s6) AS (
         |  SELECT event_type, CAST(1 AS BIGINT), CAST(c * 1000 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.rn + 1,
         |    $lt,
         |    CAST(floor(($lt - r.l + r.b) / 2.0) AS BIGINT),
         |    $sCols
         |  FROM rec r JOIN seq d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
         |SELECT f.event_type, m.n AS n_days, f.l AS level_milli, f.b AS trend_milli,
         |  (CASE CAST(m.last_day % 7 AS BIGINT) ${(0 to 6).map(i => s"WHEN $i THEN f.s$i").mkString(" ")} END) AS s_last_milli,
         |  f.l + 7 * f.b +
         |  (CASE CAST(m.last_day % 7 AS BIGINT) ${(0 to 6).map(i => s"WHEN $i THEN f.s$i").mkString(" ")} END) AS forecast7_milli
         |FROM rec f JOIN nmax m ON f.event_type = m.event_type AND f.rn = m.n
         |ORDER BY f.event_type""".stripMargin
    },

    "q_hurst" -> {
      def perW(w: Long, tag: String): String =
        s"""blk$tag AS (
           |  SELECT (rn - 1) // $w AS blk, (rn - 1) % $w + 1 AS t, c FROM seqd),
           |full$tag AS (
           |  SELECT blk, CAST(count(*) AS BIGINT) AS nb, CAST(SUM(c) AS BIGINT) AS sb,
           |    CAST(SUM(c * c) AS BIGINT) AS sxx
           |  FROM blk$tag GROUP BY blk HAVING count(*) = $w),
           |dev$tag AS (
           |  SELECT b.blk, f.sb, f.sxx,
           |    CAST(MAX($w * cum - t * f.sb) AS BIGINT) AS maxd,
           |    CAST(MIN($w * cum - t * f.sb) AS BIGINT) AS mind
           |  FROM (SELECT blk, t,
           |          CAST(SUM(c) OVER (PARTITION BY blk ORDER BY t
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |        FROM blk$tag) b
           |  JOIN full$tag f ON b.blk = f.blk
           |  GROUP BY b.blk, f.sb, f.sxx),
           |rs$tag AS (
           |  SELECT CAST($w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n_blocks,
           |    CAST(SUM(CAST(floor((maxd - mind) / sqrt(CAST($w * sxx - sb * sb AS DOUBLE))
           |      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) // count(*) AS rs_mean_micro
           |  FROM dev$tag)""".stripMargin
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |seqd AS MATERIALIZED (
         |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn FROM daily),
         |${perW(4, "4")},
         |${perW(8, "8")},
         |${perW(16, "16")},
         |pts AS MATERIALIZED (
         |  SELECT * FROM rs4 UNION ALL SELECT * FROM rs8 UNION ALL SELECT * FROM rs16),
         |fit AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    SUM(ln(CAST(w AS DOUBLE))) AS su,
         |    SUM(ln(CAST(rs_mean_micro AS DOUBLE) / 1000000)) AS sv,
         |    SUM(ln(CAST(w AS DOUBLE)) * ln(CAST(rs_mean_micro AS DOUBLE) / 1000000)) AS suv,
         |    SUM(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))) AS suu
         |  FROM pts)
         |SELECT w, n_blocks, rs_mean_micro,
         |  round((k * suv - su * sv) / (k * suu - su * su), 4) AS hurst
         |FROM pts, fit
         |ORDER BY w""".stripMargin
    },

    "q_classical_decomp" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tr AS (
        |  SELECT day, c, (s7 * 1000) // 7 AS trend_milli,
        |    c * 1000 - (s7 * 1000) // 7 AS det_milli
        |  FROM (
        |    SELECT day, c,
        |      CAST(count(*) OVER w AS BIGINT) AS n7,
        |      CAST(SUM(c) OVER w AS BIGINT) AS s7
        |    FROM daily
        |    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |  WHERE n7 = 7),
        |seas AS (
        |  SELECT day % 7 AS dow,
        |    (CASE WHEN CAST(SUM(det_milli) AS BIGINT) >= 0
        |       THEN CAST(SUM(det_milli) AS BIGINT) // CAST(count(*) AS BIGINT)
        |       ELSE -((-CAST(SUM(det_milli) AS BIGINT)) // CAST(count(*) AS BIGINT)) END)
        |      AS seasonal_milli
        |  FROM tr GROUP BY 1)
        |SELECT day, c, trend_milli, seasonal_milli,
        |  c * 1000 - trend_milli - seasonal_milli AS remainder_milli
        |FROM tr JOIN seas ON tr.day % 7 = seas.dow
        |ORDER BY day""".stripMargin,

    "q_elasticity" ->
      """WITH pts AS (
        |  SELECT
        |    CAST(floor(ln(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT))
        |      * 10000 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(l_quantity AS BIGINT)) * 10000 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pts),
        |fit AS (
        |  SELECT *,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy
        |  FROM mom),
        |fit2 AS (SELECT *, cxy / nullif(cxx, 0.0) AS beta FROM fit)
        |SELECT n, round(beta, 6) AS elasticity,
        |  round((CAST(sy AS DOUBLE) - beta * sx) / n / 10000, 6) AS intercept,
        |  round(cxy * cxy / nullif(cxx * cyy, 0.0), 6) AS r2
        |FROM fit2""".stripMargin,

    "q_retention_fit" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |cohort AS (SELECT user_id, CAST(MIN(day) AS BIGINT) AS cohort_day
        |           FROM ev GROUP BY user_id),
        |cs AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS csz
        |       FROM cohort GROUP BY cohort_day),
        |po AS (
        |  SELECT e.day - c.cohort_day AS offset_days,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS active, c.cohort_day
        |  FROM (SELECT DISTINCT user_id, day FROM ev) e
        |  JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.day - c.cohort_day >= 1
        |  GROUP BY 1, 3),
        |rate AS (
        |  SELECT offset_days AS t,
        |    (CAST(SUM(active) AS BIGINT) * 1000000)
        |      // CAST(SUM(cs.csz) AS BIGINT) AS rate_micro
        |  FROM po JOIN cs ON po.cohort_day = cs.cohort_day
        |  GROUP BY 1),
        |lr AS (
        |  SELECT t, CAST(floor(ln(CAST(rate_micro AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lr
        |  FROM rate WHERE rate_micro > 0),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(t) AS BIGINT) AS st,
        |    CAST(SUM(lr) AS BIGINT) AS sl, CAST(SUM(t * lr) AS BIGINT) AS stl,
        |    CAST(SUM(t * t) AS BIGINT) AS stt
        |  FROM lr),
        |fit AS (
        |  SELECT *, CAST(n * stl - st * sl AS DOUBLE)
        |    / nullif(CAST(n * stt - st * st AS DOUBLE), 0.0) / 1000000 AS slope
        |  FROM mom)
        |SELECT n, round(slope, 6) AS decay_slope,
        |  round(CASE WHEN slope < 0 THEN ln(2.0) / (-slope) END, 4) AS half_life_days
        |FROM fit""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Reshape / temporal / maintenance operators: unpivot (wide→long),
  * time-series resampling with gap-fill + forward-fill, last-wins
  * upsert merge (the batch form of MERGE INTO), and PII scrubbing —
  * the snapshot-maintenance and redaction stages of a training-data
  * pipeline.
  *
  * Scale posture:
  *  - unpivot is a map-side `stack` over an already-aggregated frame —
  *    no extra shuffle beyond the aggregate.
  *  - resample joins a generated hour spine (tiny: buckets × strata)
  *    against the bucketed aggregate; the raw 100 TB table is touched
  *    once, by the bucket aggregate. Forward-fill is one window per
  *    stratum — state is a single value, so it streams.
  *  - upsert shuffles BOTH sides on the key once (the updates batch is
  *    typically ≪ base; Catalyst broadcast-joins... but last-wins needs
  *    co-partitioned dedup, so it's one shuffle on the merge key —
  *    exactly what MERGE INTO costs anywhere).
  *  - PII scrub is map-only regex; at 100 TB it runs at scan speed and
  *    is the shape you'd fuse with other per-doc text transforms.
  */
object Reshape {
  type Q = (SparkSession, String) => DataFrame

  /** Benford expected first-digit shares in micro-units —
    * floor(10⁶·log₁₀(1+1/d)) for d = 1..9, computed once here and
    * baked as the same literal into both plans so neither engine's
    * libm log is consulted. */
  private val benfordMicro: IndexedSeq[Long] =
    (1 to 9).map(dd => math.floor(1e6 * math.log10(1 + 1.0 / dd)).toLong)

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "555-[0-9]+"

  val queries: Map[String, Q] = Map(
    // Wide→long unpivot of per-nation account-balance stats via
    // stack(); the long form is what plotting/metric stores ingest.
    "q_unpivot" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(min(col("c_acctbal")), 2).as("mn"),
          round(avg(col("c_acctbal")), 4).as("av"),
          round(max(col("c_acctbal")), 2).as("mx"))
        .selectExpr("n_name", "stack(3, 'min', mn, 'avg', av, 'max', mx) AS (metric, value)")
        .orderBy(col("n_name"), col("metric"))
    }),

    // Hourly resample per event_type: bucket-aggregate the raw events
    // once, generate the dense hour spine per stratum (sequence +
    // explode), left-join, then forward-fill the last observed value
    // across gaps with last(ignoreNulls) over an unbounded-preceding
    // frame. `gap` marks synthesized rows.
    "q_resample" -> ((s, d) => {
      val base = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
      val spine = base.groupBy(col("event_type"))
        .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(col("event_type"), explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(base, Seq("event_type", "h"), "left")
        .withColumn("v_ffill", round(last(col("v"), ignoreNulls = true).over(w), 4))
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          col("v_ffill"),
          col("n").isNull.as("gap"))
        .orderBy(col("event_type"), col("h"))
    }),

    // Last-wins upsert: merge an updates batch (modified balances for
    // custkey % 7 = 0, brand-new rows for % 13 = 0) onto the customer
    // snapshot. union → row_number by key, updates win — the
    // deterministic batch equivalent of MERGE INTO ... WHEN MATCHED
    // UPDATE WHEN NOT MATCHED INSERT.
    "q_upsert" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val base = c.select(col("c_custkey"), col("c_name"),
        col("c_acctbal").as("acctbal"), lit(0).as("prio"), lit("base").as("src"))
      val upd = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0).as("acctbal"), lit(1).as("prio"), lit("upd").as("src"))
      val ins = c.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_name"),
          lit(0.0).as("acctbal"), lit(1).as("prio"), lit("new").as("src"))
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("prio").desc)
      base.union(upd).union(ins)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("c_name"),
          round(col("acctbal"), 2).as("acctbal"), col("src"))
        .orderBy(col("c_custkey"))
    }),

    // PII scrub: redact emails/phones with regexp_replace (patterns
    // kept to the Java∩RE2 regex subset so the oracle replays them).
    // The fixtures' text is synthetic, so deterministic PII is woven
    // in per doc first; output is the fully scrubbed text plus a
    // redaction count — map-only, scan-speed at any scale.
    "q_pii_scrub" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("pii_text",
          concat(col("text"), lit(" Contact user"), col("doc_id"),
            lit("@mail.example.com or call 555-0"), (col("doc_id") % 1000).cast("string"),
            lit(" now.")))
        .select(col("doc_id"),
          (regexp_count(col("pii_text"), lit(EmailPat)) +
            regexp_count(col("pii_text"), lit(PhonePat))).cast("long").as("n_pii"),
          regexp_replace(regexp_replace(col("pii_text"), EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>").as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // TIME-WEIGHTED average (TWAP — the finance/sensor staple a plain
    // AVG gets wrong whenever sampling is irregular: a value that HELD
    // for an hour must weigh 3600× one that held a second). Per user:
    // each event's value weighs its holding duration (until the next
    // event; the last holds nothing — the standard right-open
    // convention), twap = Σ v·dur / span. EXACT integers: milli values
    // × whole-second durations (bounded ≪ 2⁶³ at the fixture's value
    // and span ranges — and DuckDB errors loudly on BIGINT overflow,
    // so drift cannot silently wrap), truncating DIV on non-negatives.
    // Single-event users report NULL (no span) in BOTH engines.
    //
    // Scale posture: ONE user_id shuffle serves the lead() window and
    // the aggregate that follows — the q_islands shape; epoch math is
    // integer µs → s (unix_micros / epoch_us parity).
    "q_twap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"),
          expr("unix_micros(ts) DIV 1000000").as("sec"))
        .withColumn("nxt", lead(col("sec"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("sec")) - min(col("sec"))).as("span_s"),
          sum(expr("vm * coalesce(nxt - sec, 0L)")).as("wsum"))
        .withColumn("twap_milli", expr("wsum DIV nullif(span_s, 0)"))
        .select(col("user_id"), col("n_events"), col("span_s"), col("twap_milli"))
        .orderBy(col("user_id"))
    }),

    // K-ANONYMITY audit (Sweeney 2002) — the privacy companion to
    // q_pii_scrub: scrubbing removes DIRECT identifiers, but a record
    // is still re-identifiable when its QUASI-identifier combination
    // (here: language × coarse length band, the release-schema columns
    // an adversary can cross-link) is shared by fewer than k records.
    // Per equivalence class: size, the k ≥ 5 verdict, and the
    // suppression cost (suppress-below-k is the baseline remedy; the
    // at-risk doc count is what generalizing the band would have to
    // absorb). The audit GRAIN is the class, so the report is
    // release-schema-sized, never corpus-sized.
    //
    // Scale posture: one map-only bucket projection + one partial+final
    // aggregate at class grain; nothing else. All integer.
    "q_k_anon" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), expr("n_chars DIV 256").as("len_band"))
        .groupBy(col("lang"), col("len_band"))
        .agg(count(lit(1)).as("n"))
        .withColumn("k_anonymous", col("n") >= 5)
        .withColumn("suppressed_docs", when(col("n") < 5, col("n")).otherwise(lit(0L)))
        .select(col("lang"), col("len_band"), col("n"),
          col("k_anonymous"), col("suppressed_docs"))
        .orderBy(col("lang"), col("len_band"))
    }),

    // L-DIVERSITY audit (Machanavajjhala 2007) — the second privacy
    // gate k-anonymity can't provide: a class of 50 identical rows is
    // 50-anonymous, but if every row shares one SENSITIVE value
    // (here: source, standing in for the attribute the release must
    // not disclose), membership alone reveals it. Per quasi-identifier
    // class (the q_k_anon schema): distinct sensitive values l, the
    // l ≥ 2 verdict, and the majority-value share in exact micro (the
    // probabilistic-disclosure measure — 1e6 means homogeneous). Same
    // class-grain scale posture as q_k_anon: one aggregate, one
    // max-over-class window on the class×value table.
    "q_l_diversity" -> ((s, d) => {
      val cls = Tables.documents(s, d)
        .select(col("lang"), expr("n_chars DIV 256").as("len_band"), col("source"))
        .groupBy(col("lang"), col("len_band"), col("source"))
        .agg(count(lit(1)).as("nv"))
      cls.groupBy(col("lang"), col("len_band"))
        .agg(sum(col("nv")).as("n"),
          count(lit(1)).as("l_distinct"),
          max(col("nv")).as("majority"))
        .withColumn("l_diverse", col("l_distinct") >= 2)
        .withColumn("majority_micro", expr("(majority * 1000000) DIV n"))
        .select(col("lang"), col("len_band"), col("n"), col("l_distinct"),
          col("l_diverse"), col("majority_micro"))
        .orderBy(col("lang"), col("len_band"))
    }),

    // T-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the third
    // privacy gate completing the q_k_anon → q_l_diversity ladder:
    // a class can be diverse yet still LEAK when its sensitive-value
    // DISTRIBUTION deviates from the corpus-wide one (a class that is
    // 90% source-web in a 33/33/33 corpus tells an adversary plenty).
    // Per equivalence class: total-variation distance to the global
    // source distribution — the EMD under the uniform ground metric,
    // the standard instantiation for categorical sensitive attributes
    // — in exact micro units: t = ½·Σ_v |p_v − q_v| with p, q as
    // truncated micro shares of exact integer counts, and the t ≤ 0.2
    // verdict. Classes missing a source still contribute that
    // source's full global share, so the sum runs over the class ×
    // source SPINE, not just observed pairs.
    //
    // Scale posture: everything after the two aggregates (class ×
    // source counts; global source counts) runs at release-schema
    // grain — the spine is classes × |sources|, never corpus-sized;
    // the global 3-row distribution broadcasts.
    "q_t_closeness" -> ((s, d) => {
      val cls = Tables.documents(s, d)
        .select(col("lang"), expr("n_chars DIV 256").as("len_band"), col("source"))
        .groupBy(col("lang"), col("len_band"), col("source"))
        .agg(count(lit(1)).as("nv"))
      val classTot = cls.groupBy(col("lang"), col("len_band")).agg(sum(col("nv")).as("n"))
      val glob = cls.groupBy(col("source")).agg(sum(col("nv")).as("gs"))
      val globTot = glob.agg(sum(col("gs")).as("gn"))
      val spine = classTot.crossJoin(broadcast(glob.crossJoin(broadcast(globTot))))
      spine
        .join(cls, Seq("lang", "len_band", "source"), "left")
        .withColumn("p_micro", expr("(coalesce(nv, 0L) * 1000000) DIV n"))
        .withColumn("q_micro", expr("(gs * 1000000) DIV gn"))
        .groupBy(col("lang"), col("len_band"), col("n"))
        .agg(expr("sum(abs(p_micro - q_micro)) DIV 2").as("tvd_micro"))
        .withColumn("t_close", col("tvd_micro") <= 200000L)
        .select(col("lang"), col("len_band"), col("n"), col("tvd_micro"), col("t_close"))
        .orderBy(col("lang"), col("len_band"))
    }),

    // Incremental aggregate maintenance: the warehouse pattern where a
    // materialized daily rollup absorbs a new delta batch WITHOUT
    // rescanning history — possible exactly when the aggregate is
    // mergeable (count/sum here; sketches in q_hll_union). The fixture
    // splits events into a "materialized" base (90%) and an arriving
    // delta (10%, by id hash), aggregates each independently, and
    // full-outer-merges partials with coalesce. At 100 TB the base agg
    // is a stored table and only the delta is scanned per refresh —
    // the oracle (one flat aggregate over everything) PROVES
    // merge-of-partials ≡ full recompute, bit-for-bit, because sums
    // are exact fixed-point BIGINTs.
    "q_incr_agg" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("event_id"), expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      def agg(df: DataFrame) = df.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sm"))
      val base = agg(ev.filter(col("event_id") % 10 =!= 0))
      val delta = agg(ev.filter(col("event_id") % 10 === 0))
      base.withColumnRenamed("n", "n_b").withColumnRenamed("sm", "sm_b")
        .join(delta.withColumnRenamed("n", "n_d").withColumnRenamed("sm", "sm_d"),
          Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
          (coalesce(col("sm_b"), lit(0L)) + coalesce(col("sm_d"), lit(0L))).as("sum_milli"))
        .orderBy(col("event_type"), col("day"))
    }),

    // INCREMENTAL JOIN MAINTENANCE — the IVM identity for joins that
    // q_incr_agg's mergeable-aggregate identity cannot cover: with
    // base and delta partitions of both sides,
    //   (Ob ∪ dO) ⋈ (Cb ∪ dC) = Ob⋈Cb ∪ Ob⋈dC ∪ dO⋈Cb ∪ dO⋈dC,
    // so a stored join view absorbs new rows by computing only the
    // three DELTA terms — each bounded by a delta side — instead of
    // rescanning history (the materialized-view refresh every
    // warehouse runs). The fixture splits orders (10% by key hash)
    // and customers (the % 13 cohort) into arriving deltas, computes
    // the four terms independently at segment grain, and emits
    // term counts plus their SUM; the oracle computes `n_total` from
    // the FLAT one-shot join, so the hash match IS the proof that
    // sum-of-terms ≡ full recompute, exactly (integer counts).
    //
    // Scale posture: at 100 TB only dO and dC are scanned per
    // refresh (Ob⋈Cb is the stored view); the delta terms broadcast
    // the small delta sides. Here all four compute for the proof.
    "q_incr_join" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val (ob, od) = (o.filter(col("o_orderkey") % 10 =!= 0), o.filter(col("o_orderkey") % 10 === 0))
      val (cb, cd) = (c.filter(col("c_custkey") % 13 =!= 0), c.filter(col("c_custkey") % 13 === 0))
      // the four IVM terms as genuinely separate joins — the delta
      // terms are the only ones a refresh would run (delta sides
      // broadcast; Catalyst picks BHJ for them at any scale)
      def term(l: DataFrame, r: DataFrame, tag: String): DataFrame =
        l.join(r, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("tag", lit(tag))
      term(ob, cb, "bb")
        .unionByName(term(ob, broadcast(cd), "bd"))
        .unionByName(term(broadcast(od), cb, "db"))
        .unionByName(term(broadcast(od), broadcast(cd), "dd"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(when(col("tag") === "bb", col("n")).otherwise(0L)).as("n_bb"),
          sum(when(col("tag") === "bd", col("n")).otherwise(0L)).as("n_bd"),
          sum(when(col("tag") === "db", col("n")).otherwise(0L)).as("n_db"),
          sum(when(col("tag") === "dd", col("n")).otherwise(0L)).as("n_dd"))
        .withColumn("n_total", expr("n_bb + n_bd + n_db + n_dd"))
        .orderBy(col("c_mktsegment"))
    }),

    // Data-quality validation report (the dbt-test / Deequ pattern):
    // pipeline gates run as ONE declarative plan over the tables they
    // audit — uniqueness, null fraction, referential integrity, range
    // and enum membership — each check a count of violations, unioned
    // into a single report. At 100 TB each check is a partial+final
    // aggregate (the anti-join for referential integrity broadcasts
    // the 100×-smaller dimension's keys); nothing collects, so the
    // gate costs one pass over each audited table.
    "q_dq_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      def check(no: Int, name: String, viol: DataFrame) =
        viol.agg(count(lit(1)).as("n_violations"))
          .select(lit(no).as("check_no"), lit(name).as("check"), col("n_violations"))
      check(1, "documents.doc_id unique",
        docs.groupBy(col("doc_id")).count().filter(col("count") > 1))
        .unionByName(check(2, "documents.text not null",
          docs.filter(col("text").isNull)))
        .unionByName(check(3, "documents.lang in enum",
          docs.filter(!col("lang").isin("en", "de", "es", "fr", "zh"))))
        .unionByName(check(4, "documents.n_chars = length(text)",
          docs.filter(col("n_chars") =!= length(col("text")))))
        .unionByName(check(5, "orders.o_custkey references customer",
          orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti")))
        .orderBy(col("check_no"))
    }),

    // Gaps-and-islands sessionization in pure windows (the batch
    // analogue of session_window, and the form that works for ANY gap
    // predicate): an island breaks where the gap to the previous event
    // exceeds 15 minutes; island id = running sum of break flags. Gap
    // arithmetic on integer epoch-micros (exact in both engines). One
    // shuffle on user_id serves both windows — lag and the running
    // sum share the same (user, time) ordering.
    // Benford first-digit screen over order totals — the fraud /
    // data-fabrication audit (genuine multiplicative-process amounts
    // follow P(d) = log₁₀(1+1/d); fabricated ones rarely do). First
    // significant digit via pure string arithmetic on the integer
    // part; observed shares in exact micro-units; the expected Benford
    // shares are the one float — computed ONCE in Scala and baked as
    // the SAME literal array into both plans (the q_ndcg recipe).
    // One 9-key partial+final aggregate + a 1-row broadcast total.
    "q_benford" -> ((s, d) => {
      val elit = benfordMicro.mkString("array(", "L,", "L)")
      // amounts < 1 have first significant digit 0 where the engines
      // DIVERGE on the lookup edge (Spark element_at throws on index 0,
      // DuckDB list[0] returns NULL) — Benford is defined on the first
      // SIGNIFICANT digit, so the audit's domain is amounts ≥ 1, stated
      // as an explicit filter in both plans (TPC-H totalprice is always
      // ≥ ~900, so this guards the contract, not today's data)
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1)
        .select(expr(
          "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .withColumn("obs_micro", expr("(n * 1000000) DIV total"))
        .withColumn("exp_micro", expr(s"element_at($elit, digit)"))
        .withColumn("dev_micro", expr("(n * 1000000) DIV total - " +
          s"element_at($elit, digit)"))
        .select(col("digit"), col("n"), col("obs_micro"), col("exp_micro"), col("dev_micro"))
        .orderBy(col("digit"))
    }),

    // Column profiling report — the dbt-docs / Deequ / Glue-crawler
    // summary every data platform runs on landing a table: per column,
    // row/null/distinct counts and lexicographic min/max, from ONE
    // stack() pass (map-side wide→long, no extra shuffle) plus one
    // partial+final aggregate at column grain. Values canonicalize to
    // engine-stable strings first (doubles via centi-unit integers,
    // timestamps via DATE) so min/max text compares identically in
    // both engines. Output is schema-sized.
    "q_profile" -> ((s, d) => {
      Tables.orders(s, d).selectExpr(
        """stack(6,
          |  'o_orderkey', CAST(o_orderkey AS STRING),
          |  'o_custkey', CAST(o_custkey AS STRING),
          |  'o_orderstatus', o_orderstatus,
          |  'o_totalprice', CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING),
          |  'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS STRING),
          |  'o_orderpriority', o_orderpriority) AS (col_name, val)""".stripMargin)
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"),
          max(col("val")).as("max_val"))
        .orderBy(col("col_name"))
    }),

    "q_islands" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """WITH g AS (
          |  SELECT user_id, event_id, unix_micros(ts) AS us,
          |    CASE WHEN unix_micros(ts) - lag(unix_micros(ts)) OVER w > 900000000
          |         THEN 1 ELSE 0 END AS brk
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts), event_id)),
          |i AS (
          |  SELECT user_id, event_id,
          |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |  FROM g)
          |SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_events,
          |  min(event_id) AS e_min, max(event_id) AS e_max
          |FROM i GROUP BY user_id, island
          |ORDER BY user_id, island""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_benford" -> {
      val el = benfordMicro.mkString("[", ", ", "]")
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM digits)
         |SELECT digit, n,
         |  (n * 1000000) // total AS obs_micro,
         |  ($el)[digit] AS exp_micro,
         |  (n * 1000000) // total - ($el)[digit] AS dev_micro
         |FROM digits, tot
         |ORDER BY digit""".stripMargin
    },

    "q_profile" ->
      """WITH long AS (
        |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders)
        |SELECT col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT val) AS n_distinct,
        |  min(val) AS min_val, max(val) AS max_val
        |FROM long GROUP BY col_name
        |ORDER BY col_name""".stripMargin,

    "q_incr_agg" ->
      // the flat recompute — merge-of-partials must equal this exactly
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli
        |FROM events GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "q_dq_report" ->
      """SELECT 1 AS check_no, 'documents.doc_id unique' AS "check",
        |  count(*) AS n_violations
        |FROM (SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1)
        |UNION ALL
        |SELECT 2, 'documents.text not null', count(*)
        |FROM documents WHERE text IS NULL
        |UNION ALL
        |SELECT 3, 'documents.lang in enum', count(*)
        |FROM documents WHERE lang NOT IN ('en', 'de', 'es', 'fr', 'zh')
        |UNION ALL
        |SELECT 4, 'documents.n_chars = length(text)', count(*)
        |FROM documents WHERE n_chars <> length(text)
        |UNION ALL
        |SELECT 5, 'orders.o_custkey references customer', count(*)
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY check_no""".stripMargin,

    "q_islands" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 900000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |i AS (
        |  SELECT user_id, event_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g)
        |SELECT user_id, CAST(island AS BIGINT) AS island, count(*) AS n_events,
        |  min(event_id) AS e_min, max(event_id) AS e_max
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,

    "q_unpivot" ->
      """WITH st AS (
        |  SELECT n_name, round(min(c_acctbal), 2) AS mn,
        |    round(avg(c_acctbal), 4) AS av, round(max(c_acctbal), 2) AS mx
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, metric, value FROM (
        |  SELECT n_name, 'min' AS metric, mn AS value FROM st
        |  UNION ALL SELECT n_name, 'avg', av FROM st
        |  UNION ALL SELECT n_name, 'max', mx FROM st)
        |ORDER BY n_name, metric""".stripMargin,

    "q_resample" ->
      """WITH base AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |    sum(value) AS v, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM base GROUP BY event_type)
        |SELECT s.event_type, s.h, coalesce(b.n, 0) AS n_events,
        |  round(last_value(b.v IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_ffill,
        |  b.n IS NULL AS gap
        |FROM spine s LEFT JOIN base b ON s.event_type = b.event_type AND s.h = b.h
        |ORDER BY s.event_type, s.h""".stripMargin,

    "q_upsert" ->
      """WITH merged AS (
        |  SELECT c_custkey, c_name, c_acctbal AS acctbal, 0 AS prio, 'base' AS src FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal + 1000.0, 1, 'upd' FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, 0.0, 1, 'new' FROM customer WHERE c_custkey % 13 = 0)
        |SELECT c_custkey, c_name, round(acctbal, 2) AS acctbal, src FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY prio DESC) AS rn
        |  FROM merged)
        |WHERE rn = 1 ORDER BY c_custkey""".stripMargin,

    "q_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' Contact user' || doc_id || '@mail.example.com or call 555-0'
        |      || CAST(doc_id % 1000 AS VARCHAR) || ' now.' AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(pii_text, '555-[0-9]+')) AS n_pii,
        |  regexp_replace(regexp_replace(pii_text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '555-[0-9]+', '<PHONE>', 'g') AS scrubbed
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(value * 1000) AS BIGINT) AS vm,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |l AS (
        |  SELECT user_id, vm, sec,
        |    lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM e),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(sec) - min(sec) AS BIGINT) AS span_s,
        |    CAST(SUM(vm * COALESCE(nxt - sec, 0)) AS BIGINT) AS wsum
        |  FROM l GROUP BY user_id)
        |SELECT user_id, n_events, span_s, wsum // NULLIF(span_s, 0) AS twap_milli
        |FROM g ORDER BY user_id""".stripMargin,

    "q_k_anon" ->
      """SELECT lang, n_chars // 256 AS len_band, CAST(count(*) AS BIGINT) AS n,
        |  count(*) >= 5 AS k_anonymous,
        |  CASE WHEN count(*) < 5 THEN CAST(count(*) AS BIGINT) ELSE 0 END AS suppressed_docs
        |FROM documents GROUP BY lang, len_band
        |ORDER BY lang, len_band""".stripMargin,

    "q_l_diversity" ->
      """WITH cls AS (
        |  SELECT lang, n_chars // 256 AS len_band, source,
        |    CAST(count(*) AS BIGINT) AS nv
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, len_band, CAST(sum(nv) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS l_distinct,
        |  count(*) >= 2 AS l_diverse,
        |  (CAST(max(nv) AS BIGINT) * 1000000) // CAST(sum(nv) AS BIGINT) AS majority_micro
        |FROM cls GROUP BY lang, len_band
        |ORDER BY lang, len_band""".stripMargin,

    "q_incr_join" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |    o_orderkey % 10 = 0 AS o_delta, c_custkey % 13 = 0 AS c_delta
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN NOT o_delta AND NOT c_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_bb,
        |  CAST(SUM(CASE WHEN NOT o_delta AND c_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_bd,
        |  CAST(SUM(CASE WHEN o_delta AND NOT c_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_db,
        |  CAST(SUM(CASE WHEN o_delta AND c_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_dd,
        |  CAST(count(*) AS BIGINT) AS n_total
        |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_t_closeness" ->
      """WITH cls AS (
        |  SELECT lang, n_chars // 256 AS len_band, source,
        |    CAST(count(*) AS BIGINT) AS nv
        |  FROM documents GROUP BY 1, 2, 3),
        |ct AS (SELECT lang, len_band, CAST(SUM(nv) AS BIGINT) AS n
        |       FROM cls GROUP BY 1, 2),
        |gsrc AS (SELECT source, CAST(SUM(nv) AS BIGINT) AS gs FROM cls GROUP BY 1),
        |gt AS (SELECT CAST(SUM(gs) AS BIGINT) AS gn FROM gsrc),
        |spine AS (SELECT * FROM ct, gsrc, gt),
        |terms AS (
        |  SELECT s.lang, s.len_band, s.n,
        |    (COALESCE(c.nv, 0) * 1000000) // s.n AS p_micro,
        |    (s.gs * 1000000) // s.gn AS q_micro
        |  FROM spine s LEFT JOIN cls c
        |    ON s.lang = c.lang AND s.len_band = c.len_band AND s.source = c.source)
        |SELECT lang, len_band, n,
        |  CAST(SUM(abs(p_micro - q_micro)) AS BIGINT) // 2 AS tvd_micro,
        |  CAST(SUM(abs(p_micro - q_micro)) AS BIGINT) // 2 <= 200000 AS t_close
        |FROM terms GROUP BY lang, len_band, n
        |ORDER BY lang, len_band""".stripMargin
  )
}

package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset-audit bank — the "is this corpus / warehouse fit to train
  * on?" layer that a 100 TB pipeline runs BEFORE the mixture and
  * dedup stages commit compute: distributional drift between corpus
  * slices (q_js_drift), vocabulary-growth health (q_heaps), schema
  * constraint discovery (q_fd_discovery), calendar-gap repair
  * (q_gap_fill), and preference-pair construction (q_pref_pairs).
  * The reference keeps its warehouse continuously queryable for
  * exactly this kind of readout (reference: etl_service/main.py
  * maintains the BigQuery tables downstream analysis runs over);
  * here each audit is an on-engine operator with the repo's
  * exactness discipline:
  *
  *   - corpus-grain work is map-only or (doc, token)-grain shuffles;
  *     finals run at vocab / checkpoint / calendar grain — always
  *     bounded by something other than corpus size;
  *   - ln() is only ever applied to ratios of exact BIGINTs, in
  *     identical expression text in both engines, then snapped to a
  *     fixed-point grid (floor(x·1e6 + 0.5)) so summation is exact
  *     integer arithmetic from there on (the q_psi precedent);
  *   - possibly-negative integer division routes through the
  *     sign-safe CASE ([[graft.functions.SqlBridge.sdiv]]) because Spark DIV truncates
  *     while DuckDB // floors.
  */
object Audit {
  type Q = (SparkSession, String) => DataFrame

  import graft.functions.SqlBridge.{sdiv, sdivSql}

  val queries: Map[String, Q] = Map(

    // JENSEN-SHANNON drift between two corpus slices (Lin 1991) —
    // the token-distribution partner of q_psi (which drifts a NUMERIC
    // column over bins): did slice B's language shift relative to
    // slice A's? JSD is the symmetric, always-finite KL blend
    // ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2 — the standard corpus-drift
    // gate before mixing a new crawl snapshot into the training set.
    // Slices here are the even/odd doc_id halves (a deterministic
    // stand-in for snapshot-t vs snapshot-t+1). Shape: one (token)
    // -grain shuffle to per-token counts a/b (text never shuffles —
    // only tokens), a broadcast 1-row total, and per-token ln terms
    // on exact integer ratios: p/m = 2·a·nb / (a·nb + b·na) — every
    // argument an exact BIGINT product, the ln snapped to e6 grid,
    // then Σ a·term is exact integer. Final division + /ln(2) is the
    // only float, identical text both engines, round 6.
    "q_js_drift" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .select(col("t"),
          when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("ia"),
          when(col("doc_id") % 2 === 1, 1L).otherwise(0L).as("ib"))
      val cnt = tok.groupBy(col("t")).agg(sum(col("ia")).as("a"), sum(col("ib")).as("b"))
      val tot = tok.agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb"))
      cnt.crossJoin(broadcast(tot))
        .withColumn("ta_e6", expr(
          """CASE WHEN a > 0 THEN CAST(floor(ln(CAST(2 * a * nb AS DOUBLE)
            |  / CAST(a * nb + b * na AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            |ELSE 0 END""".stripMargin))
        .withColumn("tb_e6", expr(
          """CASE WHEN b > 0 THEN CAST(floor(ln(CAST(2 * b * na AS DOUBLE)
            |  / CAST(a * nb + b * na AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
            |ELSE 0 END""".stripMargin))
        .agg(count(lit(1)).as("vocab"),
          sum(expr("a * ta_e6")).as("sa"), sum(expr("b * tb_e6")).as("sb"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
        .select(col("vocab"), col("na"), col("nb"),
          round(expr(
            "(CAST(sa AS DOUBLE) / na + CAST(sb AS DOUBLE) / nb) / 2000000.0 / ln(2)"), 6)
            .as("jsd_bits"))
    }),

    // HEAPS' law vocabulary-growth audit (Heaps 1978) — the partner
    // of q_zipf (rank-frequency) on the OTHER axis: V(n) ≈ K·n^β.
    // A healthy natural corpus grows vocabulary with β ≈ 0.4–0.6; a
    // template-stamped or duplicated corpus flattens early (β → 0) —
    // this is the cheap pre-dedup smell test. Scale shape: the corpus
    // collapses to 64 CALENDAR-OF-INGEST checkpoints (doc_id ranges),
    // cumulative token counts per checkpoint from a (checkpoint)-grain
    // aggregate, cumulative vocabulary from min-first-occurrence-doc
    // per token (one (token)-grain shuffle) — the only ordered window
    // runs over the 64-row checkpoint table, NEVER over documents.
    // β is the least-squares slope of ln V vs ln n over the 64 points:
    // ln on exact BIGINTs snapped to e6, Gram sums exact integers,
    // one float division at the end (round 4).
    "q_heaps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mx = docs.agg(max(col("doc_id")).as("mid"))
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
      val tokCk = tok.crossJoin(broadcast(mx))
        .select(expr("(doc_id * 64) DIV (mid + 1)").as("ck"))
        .groupBy(col("ck")).agg(count(lit(1)).as("tk"))
      val vocCk = tok.groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
        .crossJoin(broadcast(mx))
        .select(expr("(fd * 64) DIV (mid + 1)").as("ck"))
        .groupBy(col("ck")).agg(count(lit(1)).as("nv"))
      val w = Window.orderBy(col("ck"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokCk.join(vocCk, Seq("ck"), "left")
        .na.fill(0L, Seq("nv"))
        .withColumn("cn", sum(col("tk")).over(w))
        .withColumn("cv", sum(col("nv")).over(w))
        .select(
          expr("CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("x"),
          expr("CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)").as("y"),
          col("cn"), col("cv"))
        .agg(count(lit(1)).as("p"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          max(col("cn")).as("tokens"), max(col("cv")).as("vocab"))
        .select(col("p").as("points"), col("tokens"), col("vocab"),
          round(expr(
            "CAST(p * sxy - sx * sy AS DOUBLE) / CAST(p * sxx - sx * sx AS DOUBLE)"), 4)
            .as("beta"))
    }),

    // CALENDAR gap-fill with linear interpolation — the repair step
    // feature pipelines run before lag/window features (q_lag_features
    // assumes a dense series; this op MAKES it dense): the hourly
    // per-event-type sum series, with missing hours filled by the
    // line between the nearest observed neighbors and edge hours
    // clamped to the nearest observation. Scale shape: one
    // (type, hour)-grain aggregate off the corpus (per-row fixed-point
    // cents BEFORE the sum, so the hourly totals are exact BIGINTs
    // independent of summation order), then ALL remaining work — the
    // spine, the neighbor windows, the interpolation — runs at
    // calendar grain (types × hours), bounded by the clock, never by
    // corpus size. Interpolation is exact integer: pv + ⌊Δv·Δh/span⌋
    // with the sign-safe divide (Δv may be negative).
    "q_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("h"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val hourly = ev.groupBy(col("event_type"), col("h")).agg(sum(col("vc")).as("s"))
      val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val spine = hourly.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("h"))
      val wp = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("ph", last(when(col("s").isNotNull, col("h")), ignoreNulls = true).over(wp))
        .withColumn("pv", last(col("s"), ignoreNulls = true).over(wp))
        .withColumn("nh", first(when(col("s").isNotNull, col("h")), ignoreNulls = true).over(wn))
        .withColumn("nv", first(col("s"), ignoreNulls = true).over(wn))
        .select(col("event_type"), col("h"),
          expr(
            s"""CASE WHEN s IS NOT NULL THEN s
               |  WHEN ph IS NULL THEN nv
               |  WHEN nh IS NULL THEN pv
               |  ELSE pv + ${sdiv("(nv - pv) * (h - ph)", "nh - ph")} END""".stripMargin)
            .as("filled"),
          expr(
            """CASE WHEN s IS NOT NULL THEN 'obs'
              |  WHEN ph IS NULL OR nh IS NULL THEN 'edge'
              |  ELSE 'interp' END""".stripMargin).as("src"))
        .orderBy(col("event_type"), col("h"))
    }),

    // FUNCTIONAL-DEPENDENCY discovery (Huhtala et al. 1999, TANE's
    // candidate-check primitive) — schema-constraint profiling for
    // the warehouse the reference keeps loaded: does A → B actually
    // hold in the data? The check is the classic NDV identity
    // (A → B ⟺ |distinct A| = |distinct (A,B)|), run over a fixed
    // candidate slate spanning key → attr, attr → attr, and a
    // composite LHS — discovery REPORTS which hold; it assumes
    // nothing (the synthetic lineitem in fact violates the composite
    // candidate, and the report says so). Each candidate is
    // ONE exact-distinct aggregate (partial+final; at 100 TB the
    // relaxation is the q_approx_stats HLL posture — same plan shape,
    // sketch merge instead of exact distinct); the report is 6 rows.
    "q_fd_discovery" -> ((s, d) => {
      def fd(df: DataFrame, tbl: String, lhs: Seq[String], rhs: String): DataFrame =
        df.agg(
            countDistinct(lhs.head, lhs.tail: _*).as("d_lhs"),
            countDistinct(lhs.head, (lhs.tail :+ rhs): _*).as("d_pair"))
          .select(lit(tbl).as("tbl"), lit(lhs.mkString(",")).as("lhs"),
            lit(rhs).as("rhs"), col("d_lhs"), col("d_pair"),
            (col("d_pair") - col("d_lhs")).as("violations"),
            (col("d_pair") === col("d_lhs")).as("holds"))
      fd(Tables.orders(s, d), "orders", Seq("o_orderkey"), "o_custkey")
        .unionAll(fd(Tables.orders(s, d), "orders", Seq("o_custkey"), "o_orderstatus"))
        .unionAll(fd(Tables.customer(s, d), "customer", Seq("c_custkey"), "c_nationkey"))
        .unionAll(fd(Tables.customer(s, d), "customer", Seq("c_nationkey"), "c_mktsegment"))
        .unionAll(fd(Tables.nation(s, d), "nation", Seq("n_nationkey"), "n_regionkey"))
        .unionAll(fd(Tables.lineitem(s, d), "lineitem",
          Seq("l_orderkey", "l_linenumber"), "l_returnflag"))
        .orderBy(col("tbl"), col("lhs"))
    }),

    // LINEAR-KERNEL MMD drift between two embedding slices (Gretton
    // et al. 2012; the linear kernel collapses MMD² to ‖μ_A − μ_B‖²)
    // — the EMBEDDING-space partner of q_js_drift's token-space gate:
    // a fine-tune or re-embed that shifted the representation shows
    // up here even when the token mix is unchanged. Slices are the
    // even/odd vec_id halves. Shape: one (dim)-grain aggregate over
    // the posexploded quantized grid (vectors quantize to exact
    // BIGINTs at the QuantTok 1e-4 boundary — the SimSearch/Learn
    // discipline), per-dim mean gap in exact milli-quant units via
    // the sign-safe divide, Σd² exact BIGINT over 64 dims, argmax
    // dim by exact integer struct order. One float at the end.
    "q_mmd_drift" -> ((s, d) => {
      val q = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(expr(Learn.QuantTok)).as(Seq("dim", "qv")))
        .select(col("dim"), col("qv"),
          when(col("vec_id") % 2 === 0, 1L).otherwise(0L).as("ia"),
          when(col("vec_id") % 2 === 1, 1L).otherwise(0L).as("ib"))
      val dims = q.groupBy(col("dim")).agg(
          sum(expr("ia * qv")).as("sa"), sum(col("ia")).as("na"),
          sum(expr("ib * qv")).as("sb"), sum(col("ib")).as("nb"))
        .withColumn("dmil",
          expr(s"${sdiv("sa * 1000", "na")} - ${sdiv("sb * 1000", "nb")}"))
      val top = dims
        .withColumn("rn", row_number().over(Window.orderBy(
          expr("dmil * dmil").desc, col("dim"))))
        .filter(col("rn") === 1)
        .select(col("dim").as("top_dim"), expr("dmil * dmil").as("top_dsq"))
      dims.agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(expr("dmil * dmil")).as("ssq"))
        .crossJoin(broadcast(top))
        .select(col("na"), col("nb"), col("top_dim"),
          round(expr("CAST(ssq AS DOUBLE) / 1e14"), 8).as("mmd2"),
          round(expr("CAST(top_dsq AS DOUBLE) / 1e14"), 8).as("top_dim_share"))
    }),

    // ENTROPY RATE of the user-behavior Markov chain (Shannon 1948;
    // the empirical-transition form) — q_markov ships the transition
    // MATRIX; this collapses it to the one-number predictability
    // audit: H = −Σ_ij (c_ij/N)·ln(c_ij/c_i) nats per step, reported
    // in bits with the 2^H "effective branching factor" perplexity.
    // A bot-farm's clickstream collapses toward 0 bits; organic
    // traffic sits well above — the behavioral twin of q_heaps'
    // corpus-health check. Shape: one user_id-partitioned lead()
    // window + one (src, dst) count — the same two shuffles as
    // q_markov — then all ln/divides run over the |types|²-row
    // matrix. ln only ever sees ratios of exact BIGINTs, snapped to
    // e6; Σ n·term is exact; two float finals in identical text.
    "q_entropy_rate" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """WITH t AS (
          |  SELECT event_type AS src,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
          |  FROM events),
          |m AS (
          |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM t
          |  WHERE dst IS NOT NULL GROUP BY src, dst),
          |r AS (
          |  SELECT src, dst, n,
          |    CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS rn FROM m),
          |terms AS (
          |  SELECT n,
          |    CAST(floor(ln(CAST(rn AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5)
          |      AS BIGINT) AS le6
          |  FROM r)
          |SELECT CAST(count(*) AS BIGINT) AS n_cells,
          |  CAST(SUM(n) AS BIGINT) AS n_transitions,
          |  round(CAST(SUM(n * le6) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
          |    / 1000000.0 / ln(2), 6) AS h_bits,
          |  round(pow(2.0, CAST(SUM(n * le6) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
          |    / 1000000.0 / ln(2)), 4) AS perplexity
          |FROM terms""".stripMargin)
    }),

    // SPECULATIVE-DECODING acceptance audit (Leviathan et al. 2023) —
    // if a 1-token greedy bigram draft proposed the next token, how
    // often would the corpus accept it? accept(src) = max_dst
    // c(src,dst) / Σ_dst c(src,dst); the corpus-weighted mean of this
    // is the expected draft acceptance rate, which bounds speculative
    // speedup — measured here per source token for the 20 heaviest
    // contexts. Shape: one (doc, pos)-grain lead() window (the
    // q_markov shuffle at token grain), one (src, dst) count, then
    // ranking runs over the BIGRAM-TABLE grain — vocab², never corpus
    // — with WindowGroupLimit pruning the rank-1 cut map-side.
    // Everything is exact integer (counts and truncating micro divs).
    "q_spec_accept" -> ((s, d) => {
      val tr = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
        .filter(length(col("t")) > 0)
        .withColumn("dst", lead(col("t"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .filter(col("dst").isNotNull)
        .groupBy(col("t").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val perSrc = tr
        .withColumn("n_out", sum(col("n")).over(Window.partitionBy(col("src"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("n").desc, col("dst"))))
        .filter(col("rn") === 1)
      perSrc.select(col("src"), col("n_out"), col("dst").as("top_dst"),
          col("n").as("top_n"),
          expr("(n * 1000000) DIV n_out").as("accept_micro"))
        .orderBy(col("n_out").desc, col("src"))
        .limit(20)
    }),

    // DISTINCTIVE TERMS per source via log-odds with an informed
    // Dirichlet prior (Monroe, Colaresi & Quinn 2008 — "Fightin'
    // Words"): raw log-odds overweights rare tokens and raw frequency
    // overweights stopwords; the informed prior (α_w ∝ global
    // frequency, α₀ = 1000 pseudo-tokens) fixes both, and the
    // variance-standardized z ranks what actually CHARACTERIZES a
    // source — the domain-profiling audit run before mixing sources.
    // Shape: one (source, token)-grain count + a broadcast token-
    // grain global; z is computed in identical-text doubles from
    // exact BIGINT counts (the ln/sqrt args are exact-integer
    // rationals widened identically), ranked per source with token
    // tie-break, rank ≤ 3 cut pruned map-side by WindowGroupLimit.
    "q_log_odds" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
      val bySrc = tok.groupBy(col("source"), col("t")).agg(count(lit(1)).as("y"))
      val glob = tok.groupBy(col("t")).agg(count(lit(1)).as("yw"))
      val totals = tok.agg(count(lit(1)).as("nn"))
      val srcTot = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val z =
        """(ln((y + aw) / (ns + 1000.0 - y - aw))
          | - ln((yw - y + aw) / (nn - ns + 1000.0 - (yw - y) - aw)))
          | / sqrt(1.0 / (y + aw) + 1.0 / (yw - y + aw))""".stripMargin
      bySrc.join(glob, Seq("t")).join(srcTot, Seq("source"))
        .crossJoin(broadcast(totals))
        .withColumn("aw", expr("CAST(yw AS DOUBLE) * 1000.0 / nn"))
        .withColumn("z", expr(z))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("z").desc, col("t"))))
        .filter(col("rn") <= 3)
        .select(col("source"), col("rn").cast("long").as("rank"), col("t").as("term"),
          col("y"), col("yw"), round(col("z"), 4).as("z"))
        .orderBy(col("source"), col("rank"))
    }),

    // PER-DIMENSION VARIANCE audit of the embedding space — the
    // evidence q_mrl_recall's truncation gamble rests on: matryoshka
    // prefixes only work if variance is front-loaded, and this op
    // measures exactly that (per-dim scatter Σ(q−μ)², its share of
    // total, and the cumulative share in dim order). All exact
    // BIGINT on the QuantTok grid: (n·Σq² − (Σq)²) DIV n per dim —
    // the DIV-n normalization keeps the ×10⁶ share product inside
    // 2⁶³ at any corpus size — micro shares by truncating division,
    // the 64-row cumulative window. One (dim)-grain aggregate over
    // the posexploded corpus.
    "q_dim_variance" -> ((s, d) => {
      val dims = graft.Tables.embeddings(s, d)
        .select(posexplode(expr(Learn.QuantTok)).as(Seq("dim", "qv")))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("qv")).as("sq"),
          sum(expr("qv * qv")).as("sqq"))
        .withColumn("var_s", expr("(n * sqq - sq * sq) DIV n"))
      val tot = dims.agg(sum(col("var_s")).as("tv"))
      dims.crossJoin(broadcast(tot))
        .withColumn("share_micro", expr("(var_s * 1000000) DIV tv"))
        .withColumn("cum_share_micro", sum(col("share_micro")).over(
          Window.orderBy(col("dim"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("dim"), col("var_s"), col("share_micro"), col("cum_share_micro"))
        .orderBy(col("dim"))
    }),

    // PREFERENCE-PAIR construction — the DPO/RLHF data-prep step: per
    // (lang, length-bucket) stratum, pair the highest-scoring document
    // (chosen) against the lowest (rejected), score = lexical
    // diversity (distinct tokens — deterministic, no model in the
    // loop), ties broken by doc_id so the pairing is reproducible.
    // Degenerate strata (one doc, or all scores equal) emit nothing —
    // a zero-margin pair teaches nothing. Scale shape: one
    // (doc, token)-grain distinct-count, then TWO rank windows over
    // the same (lang, bucket) partitioning — one shuffle, and
    // WindowGroupLimit prunes both rank-1 scans map-side.
    "q_pref_pairs" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), expr("n_chars DIV 200").as("lb"),
          explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy(col("doc_id"), col("lang"), col("lb"))
        .agg(countDistinct(col("t")).as("score"))
      val wb = Window.partitionBy(col("lang"), col("lb"))
        .orderBy(col("score").desc, col("doc_id"))
      val ww = Window.partitionBy(col("lang"), col("lb"))
        .orderBy(col("score"), col("doc_id"))
      val best = scored.withColumn("rn", row_number().over(wb)).filter(col("rn") === 1)
        .select(col("lang"), col("lb"), col("doc_id").as("chosen_id"),
          col("score").as("chosen_score"))
      val worst = scored.withColumn("rn", row_number().over(ww)).filter(col("rn") === 1)
        .select(col("lang"), col("lb"), col("doc_id").as("rejected_id"),
          col("score").as("rejected_score"))
      best.join(worst, Seq("lang", "lb"))
        .filter(col("chosen_id") =!= col("rejected_id"))
        .filter(col("chosen_score") > col("rejected_score"))
        .select(col("lang"), col("lb"), col("chosen_id"), col("rejected_id"),
          col("chosen_score"), col("rejected_score"),
          (col("chosen_score") - col("rejected_score")).as("margin"))
        .orderBy(col("lang"), col("lb"))
    }),

    // REFERENTIAL-INTEGRITY audit across the star schema — the first
    // gate a warehouse health check runs: for every declared FK edge,
    // how many child rows point at a parent that does not exist. Each
    // edge is one LEFT ANTI join counted against the child total; the
    // three dimension parents (customer / supplier / nation) broadcast
    // (catalog-scale — the q_local_revenue posture), the fact-fact
    // edge (lineitem → orders) shuffles on the key it would shuffle on
    // anyway. Orphan rate in exact micro (non-negative truncating
    // division). Output is one row per FK edge — bounded by the
    // schema, never the data.
    "q_ri_check" -> ((s, d) => {
      def edge(name: String, child: DataFrame, key: String,
               parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
        val c = child.select(col(key).as("k"))
        val p0 = parent.select(col(pkey).as("k")).distinct()
        val p = if (bcast) broadcast(p0) else p0
        c.agg(count(lit(1)).as("n_child"))
          .crossJoin(c.join(p, Seq("k"), "left_anti").agg(count(lit(1)).as("n_orphan")))
          .select(lit(name).as("fk"), col("n_child"), col("n_orphan"),
            expr("(n_orphan * 1000000) DIV n_child").as("orphan_micro"))
      }
      val li = Tables.lineitem(s, d)
      Seq(
        edge("lineitem.orderkey", li, "l_orderkey",
          Tables.orders(s, d), "o_orderkey", bcast = false),
        edge("lineitem.partkey", li, "l_partkey",
          Tables.part(s, d), "p_partkey", bcast = true),
        edge("lineitem.suppkey", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey", bcast = true),
        edge("orders.custkey", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", bcast = true),
        edge("customer.nationkey", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true),
        edge("supplier.nationkey", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true)
      ).reduce(_ union _).orderBy(col("fk"))
    }),

    // FRESHNESS audit — per event-type staleness against the
    // warehouse watermark: max event time, lag behind the global max
    // in exact seconds, and the count inside the trailing 24 h window
    // before the watermark (is this stream still producing?). The
    // global watermark is a broadcast 1-row aggregate; everything else
    // is one map-side-combined groupBy. All integer microseconds.
    "q_freshness" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      val wm = ev.agg(max(col("us")).as("wm_us"))
      ev.crossJoin(broadcast(wm))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("us")).as("max_us"),
          max(col("wm_us")).as("wm_us"),
          sum(expr("CASE WHEN us > wm_us - 86400000000 THEN 1 ELSE 0 END")).as("n_last_day"))
        .select(col("event_type"), col("n"),
          expr("(wm_us - max_us) DIV 1000000").as("lag_sec"),
          col("n_last_day"))
        .orderBy(col("event_type"))
    }),

    // MODE per group — the most frequent value-milli per event type
    // (ties to the LOWEST value), by the house packed-argmax over the
    // distinct-value census: max(cnt·2³² + (2³²−1−offset)) picks max
    // count then min value in one aggregate, no window over data. The
    // offset keeps the packed term non-negative for values on the
    // signed milli grid (|vm| < 2³¹ asserted by the fixture grid).
    "q_mode_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"),
          max(expr("c * 4294967296 + (4294967295 - (vm + 2147483648))")).as("pk"))
        .select(col("event_type"), col("n"),
          expr("pk DIV 4294967296").as("mode_n"),
          expr("(4294967295 - pk % 4294967296) - 2147483648").as("mode_vm"))
        .orderBy(col("event_type"))
    }),

    // 2-D HISTOGRAM heat grid — (hour-of-day × event-type) counts plus
    // each cell's share of its hour (exact micro) — the layout every
    // traffic dashboard draws, computed as ONE corpus aggregate at
    // cell grain plus a broadcast join of the 24-row hour margins.
    "q_histogram2d" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(expr("CAST((unix_micros(ts) DIV 3600000000) % 24 AS BIGINT)").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val marg = cells.groupBy(col("hour")).agg(sum(col("n")).as("n_hour"))
      cells.join(broadcast(marg), "hour")
        .select(col("hour"), col("event_type"), col("n"),
          expr("(n * 1000000) DIV n_hour").as("share_micro"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // MUTUAL INFORMATION + CRAMÉR'S V between hour-of-day and event
    // type — the feature-selection readout ("is time-of-day
    // informative about the label?") computed entirely at CONTINGENCY
    // grain: one corpus aggregate to the (hour × type) table, margins
    // and the total by broadcast rollups of it. MI = (1/n)·Σ nᵢⱼ·
    // ln(nᵢⱼ·n/(nᵢ·nⱼ)) with each log quantized to exact micro at
    // cell grain (the q_psi recipe — the sum is then exact integer,
    // order-free; the final division is sign-safe because sparse
    // cells carry negative terms). χ² and V = √(χ²/(n·(k−1))) run in
    // DOUBLE over the ≤120-cell frame in identical expression text,
    // round(6).
    "q_mutual_info" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(expr("CAST((unix_micros(ts) DIV 3600000000) % 24 AS BIGINT)").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("nij"))
        .ckpt() // margins, total, and the term scan share it
      val rm = cells.groupBy(col("hour")).agg(sum(col("nij")).as("ni"))
      val cm = cells.groupBy(col("event_type")).agg(sum(col("nij")).as("nj"))
      val nt = cells.agg(sum(col("nij")).as("n"),
        countDistinct(col("hour")).as("n_rows"),
        countDistinct(col("event_type")).as("n_cols"))
      cells.join(broadcast(rm), "hour").join(broadcast(cm), "event_type")
        .crossJoin(broadcast(nt))
        .select(col("nij"), col("ni"), col("nj"), col("n"), col("n_rows"), col("n_cols"),
          expr("""nij * CAST(floor(ln(CAST(nij AS DOUBLE) * n
                 | / (CAST(ni AS DOUBLE) * nj)) * 1000000 + 0.5) AS BIGINT)""".stripMargin)
            .as("t"),
          expr("CAST(nij AS DOUBLE) * nij / (CAST(ni AS DOUBLE) * nj)").as("q"))
        .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
          max(col("n_rows")).as("n_rows"), max(col("n_cols")).as("n_cols"),
          sum(col("t")).as("tsum"), sum(col("q")).as("qsum"))
        .select(col("n"), col("n_cells"),
          expr(sdiv("tsum", "n")).as("mi_nat_micro"),
          round(expr("n * (qsum - 1)"), 4).as("chi2"),
          round(expr(
            """sqrt(CASE WHEN n * (qsum - 1) > 0 THEN n * (qsum - 1) ELSE 0 END
              | / (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)))""".stripMargin), 6)
            .as("cramers_v"))
    }),

    // BLOOM-FILTER FPR CALIBRATION — the measurement loop behind every
    // Bloom sizing decision (q_dedup_sink_bloom picks m and k from the
    // textbook formula; THIS query measures the formula against the
    // data): an EXPLICIT m=8192, k=3 filter built from md5-prefix hash
    // positions (the house md5-fold recipe — deterministic, so unlike
    // Spark's built-in bloom_filter aggregate the whole filter is
    // oracle-replayable bit for bit), probed with a key set provably
    // disjoint from the inserts (+3·10⁶ id offset); measured FPR in
    // exact micro next to the theoretical (1−e^{−kn/m})^k. The bit
    // set is position-grain (≤ m rows); candidates check membership
    // via one semi join at (probe, position) grain.
    "q_bloom_fpr" -> ((s, d) => {
      val m = 8192
      def pos(i: Int): String =
        s"CAST(conv(substring(md5(CONCAT('$i:', CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % $m"
      val keys = Tables.orders(s, d).select(col("o_orderkey").as("k")).distinct()
        .ckpt() // insert count + bit build share it
      val nIns = keys.agg(count(lit(1)).as("n_keys"))
      val bits = keys
        .select(explode(expr(s"array(${pos(0)}, ${pos(1)}, ${pos(2)})")).as("b"))
        .distinct()
        .ckpt() // probed once per (candidate, hash)
      val probes = Tables.lineitem(s, d)
        .select((col("l_orderkey") + 3000000L).as("k")).distinct()
        .ckpt() // probe count + membership scan share it
      val fp = probes
        .select(col("k"), explode(expr(s"array(${pos(0)}, ${pos(1)}, ${pos(2)})")).as("b"))
        .join(bits, Seq("b"), "left_semi")
        .groupBy(col("k")).agg(count(lit(1)).as("nb"))
        .filter(col("nb") === 3)
        .agg(count(lit(1)).as("n_fp"))
      probes.agg(count(lit(1)).as("n_probes"))
        .crossJoin(broadcast(fp))
        .crossJoin(broadcast(nIns))
        .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
        .select(col("n_keys"), col("n_probes"), col("n_bits_set"), col("n_fp"),
          expr("(n_fp * 1000000) DIV n_probes").as("fpr_micro"),
          round(expr(s"pow(1.0 - exp(-3.0 * n_keys / $m), 3)"), 6).as("fpr_theory"))
    }),

    // H-INDEX of the supplier and customer participation distributions
    // — the single-number concentration readout (h entities each carry
    // ≥ h fact rows) used everywhere a "how broad is the head" answer
    // beats a full histogram. Computed WITHOUT a global sort: over the
    // degree CENSUS, cum(d) = entities with degree ≥ d, and
    // h = max over census rows of min(d, cum) — exactly the classic
    // definition because cum is monotone down in d. Two tiny census
    // windows; corpus work is one groupBy per entity side.
    "q_h_index" -> ((s, d) => {
      def h(df: DataFrame, key: String, tag: String): DataFrame = {
        val deg = df.groupBy(col(key).as("e")).agg(count(lit(1)).as("deg"))
        val cen = deg.groupBy(col("deg")).agg(count(lit(1)).as("c"))
        val wge = Window.orderBy(col("deg").desc).rowsBetween(Window.unboundedPreceding, 0)
        cen.withColumn("cum", sum(col("c")).over(wge))
          .agg(max(expr("least(deg, cum)")).as("h_index"),
            sum(col("c")).as("n_entities"), max(col("deg")).as("max_deg"))
          .select(lit(tag).as("entity"), col("h_index"), col("n_entities"), col("max_deg"))
      }
      val li = Tables.lineitem(s, d)
      h(li, "l_suppkey", "supplier")
        .union(h(Tables.orders(s, d), "o_custkey", "customer"))
        .orderBy(col("entity"))
    }),

    // ORDER-INVARIANT TABLE CHECKSUM over orders — the cross-system
    // reconciliation primitive ("did the copy land bit-identical?")
    // that a row count alone can't give: per-row 60-bit md5-fold of a
    // canonical text rendering (integer cents, ISO date — every field
    // formatted identically in both engines), combined with
    // commutative aggregates (XOR + a modular sum) so partitioning
    // and row order can't change the answer. Exactly the shape a
    // 100 TB copy check wants: one map-side hash per row, one
    // all-commutative aggregate, no sort, no shuffle beyond the final
    // 1-row combine.
    "q_row_checksum" -> ((s, d) => {
      Tables.orders(s, d)
        .select(expr(
          """CAST(conv(substring(md5(concat_ws('|',
            |  CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), o_orderstatus,
            |  CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING),
            |  CAST(CAST(o_orderdate AS DATE) AS STRING), o_orderpriority)),
            |  1, 15), 16, 10) AS BIGINT)""".stripMargin).as("fp"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(fp)").as("xor_fp"),
          sum(expr("fp % 1000000007")).as("sum_fp_mod"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_js_drift" ->
      """WITH tok AS (
        |  SELECT t,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS ib
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |cnt AS (
        |  SELECT t, CAST(SUM(ia) AS BIGINT) AS a, CAST(SUM(ib) AS BIGINT) AS b
        |  FROM tok GROUP BY t),
        |tot AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS na, CAST(SUM(ib) AS BIGINT) AS nb FROM tok),
        |terms AS (
        |  SELECT a, b, na, nb,
        |    CASE WHEN a > 0 THEN CAST(floor(ln(CAST(2 * a * nb AS DOUBLE)
        |      / CAST(a * nb + b * na AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    ELSE 0 END AS ta_e6,
        |    CASE WHEN b > 0 THEN CAST(floor(ln(CAST(2 * b * na AS DOUBLE)
        |      / CAST(a * nb + b * na AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    ELSE 0 END AS tb_e6
        |  FROM cnt, tot)
        |SELECT CAST(count(*) AS BIGINT) AS vocab, max(na) AS na, max(nb) AS nb,
        |  round((CAST(SUM(a * ta_e6) AS DOUBLE) / max(na)
        |       + CAST(SUM(b * tb_e6) AS DOUBLE) / max(nb)) / 2000000.0 / ln(2), 6) AS jsd_bits
        |FROM terms""".stripMargin,

    "q_heaps" ->
      """WITH mx AS (SELECT max(doc_id) AS mid FROM documents),
        |tok AS (
        |  SELECT doc_id, t
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |tokck AS (
        |  SELECT (doc_id * 64) // (mid + 1) AS ck, CAST(count(*) AS BIGINT) AS tk
        |  FROM tok, mx GROUP BY 1),
        |vocck AS (
        |  SELECT (fd * 64) // (mid + 1) AS ck, CAST(count(*) AS BIGINT) AS nv
        |  FROM (SELECT t, min(doc_id) AS fd FROM tok GROUP BY t), mx GROUP BY 1),
        |pts AS (
        |  SELECT ck,
        |    CAST(SUM(tk) OVER (ORDER BY ck
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(SUM(coalesce(nv, 0)) OVER (ORDER BY ck
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cv
        |  FROM tokck LEFT JOIN vocck USING (ck)),
        |pp AS (
        |  SELECT CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y,
        |    cn, cv
        |  FROM pts)
        |SELECT CAST(count(*) AS BIGINT) AS points, max(cn) AS tokens, max(cv) AS vocab,
        |  round(CAST(count(*) * CAST(SUM(x * y) AS BIGINT)
        |        - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
        |      / CAST(count(*) * CAST(SUM(x * x) AS BIGINT)
        |        - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS DOUBLE), 4) AS beta
        |FROM pp""".stripMargin,

    "q_gap_fill" ->
      s"""WITH ev AS (
         |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
         |  FROM events),
         |hourly AS (
         |  SELECT event_type, h, CAST(SUM(vc) AS BIGINT) AS s
         |  FROM ev GROUP BY 1, 2),
         |b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
         |spine AS (
         |  SELECT event_type, unnest(generate_series(lo, hi)) AS h
         |  FROM (SELECT DISTINCT event_type FROM hourly), b),
         |j AS (
         |  SELECT sp.event_type, sp.h, hourly.s AS s
         |  FROM spine sp LEFT JOIN hourly
         |    ON sp.event_type = hourly.event_type AND sp.h = hourly.h),
         |f AS (
         |  SELECT event_type, h, s,
         |    last_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER (PARTITION BY event_type ORDER BY h
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         |    last_value(s IGNORE NULLS)
         |      OVER (PARTITION BY event_type ORDER BY h
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    first_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER (PARTITION BY event_type ORDER BY h
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
         |    first_value(s IGNORE NULLS)
         |      OVER (PARTITION BY event_type ORDER BY h
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
         |  FROM j)
         |SELECT event_type, h,
         |  CASE WHEN s IS NOT NULL THEN s
         |    WHEN ph IS NULL THEN nv
         |    WHEN nh IS NULL THEN pv
         |    ELSE pv + ${sdivSql("(nv - pv) * (h - ph)", "nh - ph")} END AS filled,
         |  CASE WHEN s IS NOT NULL THEN 'obs'
         |    WHEN ph IS NULL OR nh IS NULL THEN 'edge'
         |    ELSE 'interp' END AS src
         |FROM f ORDER BY event_type, h""".stripMargin,

    "q_fd_discovery" ->
      """WITH raw AS (
        |  SELECT 'orders' AS tbl, 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_lhs,
        |    CAST(count(DISTINCT (o_orderkey, o_custkey)) AS BIGINT) AS d_pair
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'o_orderstatus',
        |    CAST(count(DISTINCT o_custkey) AS BIGINT),
        |    CAST(count(DISTINCT (o_custkey, o_orderstatus)) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'customer', 'c_custkey', 'c_nationkey',
        |    CAST(count(DISTINCT c_custkey) AS BIGINT),
        |    CAST(count(DISTINCT (c_custkey, c_nationkey)) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'customer', 'c_nationkey', 'c_mktsegment',
        |    CAST(count(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(count(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'nation', 'n_nationkey', 'n_regionkey',
        |    CAST(count(DISTINCT n_nationkey) AS BIGINT),
        |    CAST(count(DISTINCT (n_nationkey, n_regionkey)) AS BIGINT)
        |  FROM nation
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey,l_linenumber', 'l_returnflag',
        |    CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |    CAST(count(DISTINCT (l_orderkey, l_linenumber, l_returnflag)) AS BIGINT)
        |  FROM lineitem)
        |SELECT tbl, lhs, rhs, d_lhs, d_pair,
        |  d_pair - d_lhs AS violations, d_pair = d_lhs AS holds
        |FROM raw ORDER BY tbl, lhs""".stripMargin,

    "q_mmd_drift" ->
      """WITH q AS (
        |  SELECT vec_id, dim, qv,
        |    CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END AS ib
        |  FROM (
        |    SELECT vec_id,
        |      generate_subscripts(embedding, 1) - 1 AS dim,
        |      unnest(list_transform(embedding,
        |        x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS qv
        |    FROM embeddings)),
        |dims AS (
        |  SELECT dim,
        |    CAST(SUM(ia * qv) AS BIGINT) AS sa, CAST(SUM(ia) AS BIGINT) AS na,
        |    CAST(SUM(ib * qv) AS BIGINT) AS sb, CAST(SUM(ib) AS BIGINT) AS nb
        |  FROM q GROUP BY dim),
        |dd AS (
        |  SELECT dim, na, nb,
        |    (CASE WHEN (sa * 1000) >= 0 THEN (sa * 1000) // (na)
        |          ELSE -((-(sa * 1000)) // (na)) END)
        |  - (CASE WHEN (sb * 1000) >= 0 THEN (sb * 1000) // (nb)
        |          ELSE -((-(sb * 1000)) // (nb)) END) AS dmil
        |  FROM dims),
        |top AS (
        |  SELECT dim AS top_dim, dmil * dmil AS top_dsq
        |  FROM dd ORDER BY dmil * dmil DESC, dim LIMIT 1)
        |SELECT max(na) AS na, max(nb) AS nb, max(top_dim) AS top_dim,
        |  round(CAST(CAST(SUM(dmil * dmil) AS BIGINT) AS DOUBLE) / 1e14, 8) AS mmd2,
        |  round(CAST(max(top_dsq) AS DOUBLE) / 1e14, 8) AS top_dim_share
        |FROM dd, top""".stripMargin,

    "q_entropy_rate" ->
      """WITH t AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
        |  FROM events),
        |m AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM t
        |  WHERE dst IS NOT NULL GROUP BY src, dst),
        |r AS (
        |  SELECT src, dst, n,
        |    CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS rn FROM m),
        |terms AS (
        |  SELECT n,
        |    CAST(floor(ln(CAST(rn AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT) AS le6
        |  FROM r)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(n) AS BIGINT) AS n_transitions,
        |  round(CAST(SUM(n * le6) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
        |    / 1000000.0 / ln(2), 6) AS h_bits,
        |  round(pow(2.0, CAST(SUM(n * le6) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
        |    / 1000000.0 / ln(2)), 4) AS perplexity
        |FROM terms""".stripMargin,

    "q_spec_accept" ->
      """WITH tok AS (
        |  SELECT doc_id, pos, t
        |  FROM (SELECT doc_id,
        |          generate_subscripts(string_split(text, ' '), 1) AS pos,
        |          unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  WHERE len(t) > 0),
        |tr AS (
        |  SELECT t AS src,
        |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
        |  FROM tok),
        |m AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        |  FROM tr WHERE dst IS NOT NULL GROUP BY src, dst),
        |per AS (
        |  SELECT src, dst, n,
        |    CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS n_out,
        |    row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rn
        |  FROM m)
        |SELECT src, n_out, dst AS top_dst, n AS top_n,
        |  (n * 1000000) // n_out AS accept_micro
        |FROM per WHERE rn = 1
        |ORDER BY n_out DESC, src LIMIT 20""".stripMargin,

    "q_log_odds" ->
      """WITH tok AS (
        |  SELECT source, t
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |bysrc AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS y FROM tok GROUP BY 1, 2),
        |gtok AS (SELECT t, CAST(count(*) AS BIGINT) AS yw FROM tok GROUP BY t),
        |totals AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tok),
        |srctot AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM tok GROUP BY source),
        |zt AS (
        |  SELECT source, t, y, yw, ns, nn,
        |    CAST(yw AS DOUBLE) * 1000.0 / nn AS aw
        |  FROM bysrc JOIN gtok USING (t) JOIN srctot USING (source), totals),
        |zz AS (
        |  SELECT source, t, y, yw,
        |    (ln((y + aw) / (ns + 1000.0 - y - aw))
        |     - ln((yw - y + aw) / (nn - ns + 1000.0 - (yw - y) - aw)))
        |     / sqrt(1.0 / (y + aw) + 1.0 / (yw - y + aw)) AS z
        |  FROM zt),
        |rk AS (
        |  SELECT source, t, y, yw, z,
        |    row_number() OVER (PARTITION BY source ORDER BY z DESC, t) AS rn
        |  FROM zz)
        |SELECT source, CAST(rn AS BIGINT) AS rank, t AS term, y, yw,
        |  round(z, 4) AS z
        |FROM rk WHERE rn <= 3 ORDER BY source, rank""".stripMargin,

    "q_dim_variance" ->
      """WITH q AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    unnest(list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS qv
        |  FROM embeddings),
        |dims AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(qv) AS BIGINT) AS sq, CAST(SUM(qv * qv) AS BIGINT) AS sqq
        |  FROM q GROUP BY dim),
        |dd AS (SELECT dim, (n * sqq - sq * sq) // n AS var_s FROM dims),
        |tot AS (SELECT CAST(SUM(var_s) AS BIGINT) AS tv FROM dd)
        |SELECT dim, var_s, (var_s * 1000000) // tv AS share_micro,
        |  CAST(SUM((var_s * 1000000) // tv) OVER (ORDER BY dim
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_share_micro
        |FROM dd, tot ORDER BY dim""".stripMargin,

    "q_pref_pairs" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, n_chars // 200 AS lb,
        |    CAST(count(DISTINCT t) AS BIGINT) AS score
        |  FROM (SELECT doc_id, lang, n_chars,
        |          unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0
        |  GROUP BY doc_id, lang, lb),
        |best AS (
        |  SELECT lang, lb, doc_id AS chosen_id, score AS chosen_score
        |  FROM (SELECT *, row_number() OVER (PARTITION BY lang, lb
        |          ORDER BY score DESC, doc_id) AS rn FROM scored)
        |  WHERE rn = 1),
        |worst AS (
        |  SELECT lang, lb, doc_id AS rejected_id, score AS rejected_score
        |  FROM (SELECT *, row_number() OVER (PARTITION BY lang, lb
        |          ORDER BY score, doc_id) AS rn FROM scored)
        |  WHERE rn = 1)
        |SELECT lang, lb, chosen_id, rejected_id, chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM best JOIN worst USING (lang, lb)
        |WHERE chosen_id <> rejected_id AND chosen_score > rejected_score
        |ORDER BY lang, lb""".stripMargin,

    "q_ri_check" -> {
      def edge(name: String, child: String, key: String,
               parent: String, pkey: String): String =
        s"""SELECT '$name' AS fk,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child
           |   WHERE $key NOT IN (SELECT $pkey FROM $parent)) AS n_orphan""".stripMargin
      val edges = Seq(
        edge("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("\nUNION ALL\n")
      s"""SELECT fk, n_child, n_orphan,
         |  (n_orphan * 1000000) // n_child AS orphan_micro
         |FROM ($edges)
         |ORDER BY fk""".stripMargin
    },

    "q_freshness" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT CAST(MAX(us) AS BIGINT) AS wm_us FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  (CAST(MAX(wm_us) AS BIGINT) - CAST(MAX(us) AS BIGINT)) // 1000000 AS lag_sec,
        |  CAST(SUM(CASE WHEN us > wm_us - 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day
        |FROM ev, wm
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_mode_agg" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |pk_ AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(MAX(c * 4294967296 + (4294967295 - (vm + 2147483648))) AS BIGINT) AS pk
        |  FROM cells GROUP BY event_type)
        |SELECT event_type, n, pk // 4294967296 AS mode_n,
        |  (4294967295 - pk % 4294967296) - 2147483648 AS mode_vm
        |FROM pk_ ORDER BY event_type""".stripMargin,

    "q_histogram2d" ->
      """WITH cells AS (
        |  SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |marg AS (SELECT hour, CAST(SUM(n) AS BIGINT) AS n_hour FROM cells GROUP BY hour)
        |SELECT hour, event_type, n, (n * 1000000) // n_hour AS share_micro
        |FROM cells JOIN marg USING (hour)
        |ORDER BY hour, event_type""".stripMargin,

    "q_mutual_info" ->
      s"""WITH cells AS (
         |  SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour, event_type,
         |    CAST(count(*) AS BIGINT) AS nij
         |  FROM events GROUP BY 1, 2),
         |rm AS (SELECT hour, CAST(SUM(nij) AS BIGINT) AS ni FROM cells GROUP BY hour),
         |cm AS (SELECT event_type, CAST(SUM(nij) AS BIGINT) AS nj FROM cells GROUP BY event_type),
         |nt AS (
         |  SELECT CAST(SUM(nij) AS BIGINT) AS n,
         |    CAST(count(DISTINCT hour) AS BIGINT) AS n_rows,
         |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_cols
         |  FROM cells),
         |terms AS (
         |  SELECT nij, ni, nj, n, n_rows, n_cols,
         |    nij * CAST(floor(ln(CAST(nij AS DOUBLE) * n
         |      / (CAST(ni AS DOUBLE) * nj)) * 1000000 + 0.5) AS BIGINT) AS t,
         |    CAST(nij AS DOUBLE) * nij / (CAST(ni AS DOUBLE) * nj) AS q
         |  FROM cells JOIN rm USING (hour) JOIN cm USING (event_type), nt),
         |agg_ AS (
         |  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(MAX(n_rows) AS BIGINT) AS n_rows, CAST(MAX(n_cols) AS BIGINT) AS n_cols,
         |    CAST(SUM(t) AS BIGINT) AS tsum, SUM(q) AS qsum
         |  FROM terms)
         |SELECT n, n_cells, ${sdivSql("tsum", "n")} AS mi_nat_micro,
         |  round(n * (qsum - 1), 4) AS chi2,
         |  round(sqrt(CASE WHEN n * (qsum - 1) > 0 THEN n * (qsum - 1) ELSE 0 END
         |    / (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1))), 6) AS cramers_v
         |FROM agg_""".stripMargin,

    "q_bloom_fpr" -> {
      def pos(i: Int, x: String): String =
        s"""list_reduce(list_transform(range(1, 9),
           |      j -> CAST(strpos('0123456789abcdef',
           |        substr(md5(CONCAT('$i:', CAST($x AS VARCHAR))), j, 1)) - 1 AS BIGINT)),
           |      (a, b) -> a * 16 + b) % 8192""".stripMargin
      s"""WITH keys AS MATERIALIZED (SELECT DISTINCT o_orderkey AS k FROM orders),
         |nins AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM keys),
         |bits AS MATERIALIZED (
         |  SELECT DISTINCT b FROM (
         |    SELECT unnest([${pos(0, "k")},
         |      ${pos(1, "k")},
         |      ${pos(2, "k")}]) AS b
         |    FROM keys)),
         |nbits AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
         |probes AS MATERIALIZED (SELECT DISTINCT l_orderkey + 3000000 AS k FROM lineitem),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
         |cand AS (
         |  SELECT k, unnest([${pos(0, "k")},
         |    ${pos(1, "k")},
         |    ${pos(2, "k")}]) AS b
         |  FROM probes),
         |hits AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS nb
         |  FROM cand WHERE b IN (SELECT b FROM bits) GROUP BY k),
         |fp AS (SELECT CAST(count(*) AS BIGINT) AS n_fp FROM hits WHERE nb = 3)
         |SELECT n_keys, n_probes, n_bits_set, n_fp,
         |  (n_fp * 1000000) // n_probes AS fpr_micro,
         |  round(pow(1.0 - exp(-3.0 * n_keys / 8192), 3), 6) AS fpr_theory
         |FROM nins, np, nbits, fp""".stripMargin
    },

    "q_h_index" -> {
      def h(rel: String, key: String, tag: String): String =
        s"""SELECT '$tag' AS entity,
           |  CAST(MAX(least(deg, cum)) AS BIGINT) AS h_index,
           |  CAST(SUM(c) AS BIGINT) AS n_entities,
           |  CAST(MAX(deg) AS BIGINT) AS max_deg
           |FROM (
           |  SELECT deg, c, CAST(SUM(c) OVER (ORDER BY deg DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM (
           |    SELECT deg, CAST(count(*) AS BIGINT) AS c FROM (
           |      SELECT $key, CAST(count(*) AS BIGINT) AS deg FROM $rel GROUP BY $key)
           |    GROUP BY deg))""".stripMargin
      s"""SELECT * FROM (
         |${h("lineitem", "l_suppkey", "supplier")}
         |UNION ALL
         |${h("orders", "o_custkey", "customer")})
         |ORDER BY entity""".stripMargin
    },

    // The 15-hex md5 fold is the house hshSql idiom (q_substr_dedup);
    // the canonical row text matches Spark's formatting field by field
    // (BIGINT decimal, ISO date).
    "q_row_checksum" ->
      """WITH fps AS (
        |  SELECT list_reduce(list_transform(range(1, 16),
        |      j -> CAST(strpos('0123456789abcdef',
        |        substr(md5(concat_ws('|',
        |          CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus,
        |          CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
        |          CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)),
        |          j, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS fp
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(fp) AS BIGINT) AS xor_fp,
        |  CAST(SUM(fp % 1000000007) AS BIGINT) AS sum_fp_mod
        |FROM fps""".stripMargin
  )
}

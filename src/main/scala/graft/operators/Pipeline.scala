package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Training-data pipeline operators (SURVEY §2.6 north-star): the
  * corpus-construction steps a 100 TB LLM-data run needs between "raw
  * documents" and "training shards" — reproducible sampling, stratified
  * rebalancing, mixture construction, deterministic sharding,
  * benchmark decontamination, TF-IDF corpus statistics, and length
  * histograms.
  *
  * Every sampling decision derives from a universal hash of the row's
  * stable key — h(id) = (a·(id mod p) + b) mod p, p = 2³¹−1 — NOT from
  * an RNG: at 100 TB a re-run (failed stage, added source, audit) must
  * make bit-identical keep/drop decisions per document, and a seeded
  * RNG is partition-order-dependent while the hash is a pure function
  * of the row. Products stay < 2⁶² so the DuckDB oracle (which errors
  * on BIGINT overflow) replays the same arithmetic exactly.
  *
  * Scale posture, per query:
  *  - sample/shard are MAP-ONLY (no shuffle): filter/project on the
  *    hash. At 100 TB they run at scan speed and pushdown-prune
  *    columns.
  *  - mixture needs per-stratum top-k by hash — a single shuffle on
  *    the stratum key. At extreme scale the window sort is replaced by
  *    an approximate hash-threshold (quantile of h per stratum, then a
  *    map-only filter); the window form here is the exact baseline.
  *  - decontamination broadcasts the benchmark n-gram set (eval suites
  *    are KBs–MBs; the corpus is the 100 TB side) — a broadcast
  *    semi-join at n-gram grain, then an anti-join back at doc grain.
  *    No shuffle touches the big side's text.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private val P = 2147483647L // 2^31 − 1, prime
  // Arbitrary fixed coefficients in [1, p−1]; plan literals in both engines.
  private val A1 = 1103617541L; private val B1 = 94370269L
  private val A2 = 1803301271L; private val B2 = 592394837L

  /** h(id) as an inline SQL fragment — identical text works in Spark
    * and DuckDB (both have %, both are BIGINT-safe below 2⁶²). */
  private def h(col: String, a: Long, b: Long): String =
    s"($a * ($col % $P) + $b) % $P"

  /** Training-shard count for q_train_shard / q_pack_sequences, read
    * from session conf `graft.pipeline.shards` (default 8 — the
    * fixture/oracle scale). The 100 TB rule: shards must comfortably
    * EXCEED reducer parallelism, or each of the N shards funnels
    * 100 TB / N through a single window reducer (8 shards × 12.5 TB
    * is a stall; thousands of shards at a few GB each keeps every
    * reducer busy and each sort in memory). Shard count is part of the
    * output contract (ids are (shard, pos) / (shard, chunk) pairs),
    * so it is a per-run parameter, not a literal.
    *
    * The DuckDB oracles for q_train_shard / q_shard_balance interpolate
    * [[DefaultShards]] — they are valid exactly when the conf is left at
    * its default, which Verify does. One shared constant keeps the
    * Spark/oracle coupling explicit instead of a hardcoded `% 8`.
    */
  private[graft] val DefaultShards = 8
  private def shardCount(s: SparkSession): Int =
    s.conf.get("graft.pipeline.shards", DefaultShards.toString).toInt

  /** Basket-size cap for the pair generators (q_copurchase,
    * q_assoc_rules, q_triangle's edge build): pairs per basket are
    * bounded by C(cap, 2) no matter how pathological the basket, so one
    * hot basket can never emit n²/2 rows from a single task. Applied as
    * `slice(sorted_items, 1, cap)` — deterministic (keeps the lowest
    * item ids), and a no-op on the fixture (baskets ≤ 7 ≪ 64), so the
    * uncapped oracles are unchanged. 64 caps a basket's pair emission
    * at 2016 rows — co-occurrence support from a 64-item sample of a
    * mega-basket is statistically indistinguishable from the full set,
    * which is why the cap is standard in production co-occurrence jobs.
    */
  val BasketCap = 64

  /** One shard's FFD placement: each (doc_id, n_tokens), longest first
    * with doc_id tiebreak, goes into the first bin with room; a new bin
    * opens when none fits. A doc LONGER than the capacity can never fit
    * and is routed to the marked overflow bin −1 (never-split invariant
    * kept; downstream truncates or re-chunks those explicitly) instead
    * of silently opening an over-capacity bin — the fixture has none,
    * but a drifted corpus must not produce an invalid packing.
    * Returns (doc_id, bin_id, n_tokens). */
  private[graft] def ffdPlace(docs: Seq[(Long, Long)], cap: Long): Seq[(Long, Long, Long)] = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    docs.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
      if (n > cap) (id, -1L, n)
      else {
        var b = fills.indexWhere(_ + n <= cap)
        if (b < 0) { fills += 0L; b = fills.length - 1 }
        fills(b) += n
        (id, b.toLong, n)
      }
    }
  }

  /** q_bootstrap: cumulative Poisson(1) inverse-CDF thresholds in
    * micro units — floor(CDF(k)·10⁶) for k = 0..9, computed ONCE here
    * and baked as the SAME literal array into both plans (the
    * q_entropy shared-literal recipe: neither engine's exp/factorial
    * is consulted at eval time). A hash draw u < T[0] means weight 0,
    * [T[0], T[1]) means 1, … — the standard inverse-CDF table. */
  private val poissonCdfMicro: IndexedSeq[Long] = {
    var cdf = 0.0; var fact = 1.0
    (0 to 9).map { k =>
      if (k > 0) fact *= k
      cdf += math.exp(-1.0) / fact
      math.floor(cdf * 1e6).toLong
    }
  }
  private val A3 = 797003437L; private val B3 = 321017101L

  val queries: Map[String, Q] = Map(
    // GREEDY SUBMODULAR DATA SELECTION (max-coverage / facility
    // location — the Nemhauser 1978 greedy with its (1-1/e) guarantee;
    // the data-selection form of Coleman's selection-via-proxy /
    // coreset line): pick 8 documents that together cover the most
    // distinct word-3-gram shingles — the "small seed set that spans
    // the corpus" primitive behind curriculum seeds, eval-set
    // selection, and annotation budgeting.
    //
    // Distributed greedy, the q_kcenter pattern — NEVER a collect:
    // each round is one anti-join (remaining universe vs the covered
    // set), one doc-grain aggregate, and a 1-row TakeOrdered winner
    // that broadcasts back; the covered set grows by the winner's
    // shingles (≤ doc-length rows, broadcast). 8 rounds = 8 bounded
    // shuffle stages over the (doc, shingle) frame; the frame itself
    // is one map-only shingle explode, checkpointed and shared.
    // Tie-break max gain → min doc_id, both engines. covered_cum is a
    // window over the 8-row selection page (checkpoint-hidden
    // aggregate — exempted in the Round12 sweep with the reason).
    "q_select_coverage" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("tok"))
        .ckpt() // 8 rounds + the winner-shingle lookups share it
      var avail = toks
      var picks = Seq.empty[DataFrame]
      for (r <- 1 to 8) {
        val win = avail.groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .ckpt() // 1 row: the pick page AND the coverage update read it
        picks = picks :+ win.select(lit(r.toLong).as("sel_round"),
          col("doc_id"), col("gain"))
        val winToks = toks.join(broadcast(win.select(col("doc_id"))), "doc_id")
          .select(col("tok"))
        avail = avail.join(broadcast(winToks), Seq("tok"), "left_anti")
          .ckpt() // cut the per-round lineage growth
      }
      picks.reduce(_ unionByName _)
        .withColumn("covered_cum", sum(col("gain")).over(
          Window.orderBy(col("sel_round"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("sel_round"))
    }),

    // POISSON BOOTSTRAP confidence interval (Chamandy et al. 2012, the
    // Google large-scale-estimation paper) — THE distributed bootstrap:
    // a classical resample needs a global sample-with-replacement
    // (impossible to coordinate across a 100 TB scan); the Poisson
    // trick gives each (row, resample) an INDEPENDENT Poisson(1)
    // weight, so all B resamples compute in ONE map-only pass with a
    // per-resample weighted aggregate. Determinism discipline: the
    // weight is the inverse-CDF table lookup ([[poissonCdfMicro]],
    // shared literal) on a universal-hash draw of (doc_id, b) — RNG-
    // free, bit-identical across engines/re-runs/stage retries (the
    // q_sample_hash recipe). The CI is the exact 2nd/31st order
    // statistic of the B = 32 resample means (all integer milli via
    // truncating DIV on non-negatives); the resample-mean variance
    // numerator B·Σm² − (Σm)² ships alongside, exact.
    //
    // Scale posture: docs × 32 fan-out is MAP-SIDE (broadcast range
    // spine) feeding a 32-group partial+final aggregate — the corpus
    // scans once; the order statistics run on the 32-row result page
    // via one sorted array literal-sized fold. Nothing else shuffles.
    "q_bootstrap" -> ((s, d) => {
      val tArr = poissonCdfMicro.mkString("array(", "L,", "L)")
      val bs = s.range(32).select(col("id").as("b"))
      val weighted = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .crossJoin(broadcast(bs))
        .withColumn("u", expr(s"(${h("(doc_id * 37 + b)", A3, B3)}) % 1000000"))
        .withColumn("w", expr(s"CAST(size(filter($tArr, t -> t <= u)) AS BIGINT)"))
      val means = weighted.groupBy(col("b"))
        .agg(sum(expr("w * n_chars")).as("sw"), sum(col("w")).as("cw"))
        .withColumn("m_milli", expr("(sw * 1000) DIV cw"))
      val point = Tables.documents(s, d)
        .agg(expr("(sum(n_chars) * 1000) DIV count(*)").as("point_milli"))
      means.agg(count(lit(1)).as("b_resamples"),
        sort_array(collect_list(col("m_milli"))).as("ms"),
        sum(col("m_milli")).as("sm"), sum(expr("m_milli * m_milli")).as("sm2"))
        .crossJoin(broadcast(point))
        .select(col("b_resamples"), col("point_milli"),
          expr("element_at(ms, 2)").as("boot_lo_milli"),
          expr("element_at(ms, 31)").as("boot_hi_milli"),
          expr("b_resamples * sm2 - sm * sm").as("var_num"))
    }),
    // Reproducible 10% Bernoulli sample: keep iff h(doc_id) mod 100 < 10.
    // Map-only — the filter sits directly on the scan, columns prune.
    "q_sample_hash" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(expr(s"${h("doc_id", A1, B1)} % 100 < 10"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Stratified rebalancing: skewed corpora keep majority strata at a
    // low rate and minority strata at a high one. Rates are per-lang
    // CASE literals; still map-only.
    "q_sample_stratified" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("rate", expr("CASE WHEN lang = 'en' THEN 10 ELSE 40 END"))
        .filter(expr(s"${h("doc_id", A1, B1)} % 100 < rate"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Weighted sampling without replacement (Efraimidis & Spirakis
    // 2006, A-Res): keep the k rows with the smallest −ln(u)/w, which
    // draws each doc with probability proportional to its weight
    // (n_chars here — the "sample long docs more" curriculum knob).
    // RNG-FREE: u = (h(doc_id)+1) / 2³¹ from the same universal hash
    // family as q_sample_hash — u is EXACT in double (the divisor is a
    // power of two), reproducible across engines and runs. Keys
    // quantize to integer nano-units (the q_lm_score recipe), ties
    // break by doc_id.
    //
    // Scale posture: key computation is MAP-ONLY on the scan; top-k
    // plans as TakeOrderedAndProject (per-partition heaps of k, driver
    // merges k×partitions rows) — the distributed form of the weighted
    // reservoir, with no shuffle and no global sort.
    "q_sample_weighted" -> ((s, d) => {
      // KNOWN LIBM BOUNDARY (same class as q_dsir_weight): -ln(u) runs
      // on each engine's libm before the ×10⁹ floor, and u's domain
      // (2³¹ hash values) is far too large for the shared-literal-table
      // recipe. PipelineSpec's divergence guard recomputes every doc's
      // key at all three fixture SFs and asserts a ≥ 10⁻⁵ gap to the
      // nearest floor boundary — ~50× the worst cross-libm drift
      // (≤ |ln u|·4ulp·10⁹/n_chars ≈ 2·10⁻⁷), measured ≥ 1.1·10⁻⁴ —
      // so an engine ln() disagreement cannot flip key_nano here, and
      // a fixture change that lands near a boundary fails the spec.
      Tables.documents(s, d)
        .withColumn("u", expr(s"(${h("doc_id", A2, B2)} + 1) / ${P + 1}.0D"))
        .withColumn("key_nano", expr("CAST(floor(-ln(u) / n_chars * 1e9) AS BIGINT)"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("key_nano"))
        .orderBy(col("key_nano"), col("doc_id"))
        .limit(100)
    }),

    // Mixture construction: exact per-stratum quotas (en:40 de:15 es:15
    // fr:15 zh:15) taken as the quota-many smallest hashes per stratum
    // — a deterministic uniform sample at exact size. One shuffle on
    // the stratum key; ties broken by doc_id so the result is total.
    "q_mixture" -> ((s, d) => {
      val quota = expr("CASE WHEN lang = 'en' THEN 40 ELSE 15 END")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", expr(h("doc_id", A1, B1)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= quota)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // The extreme-scale form of q_mixture, as documented there: when a
    // stratum has billions of rows, the per-stratum window sort is the
    // bottleneck — instead, ESTIMATE the hash threshold that admits
    // ~quota rows (percentile_approx over h per stratum, one partial+
    // final sketch aggregate), broadcast the per-stratum thresholds,
    // and keep rows with h below threshold in a MAP-ONLY filter. Quota
    // is approximate (sketch accuracy), which is why this variant is
    // spec-pinned (size within tolerance, subset-of-stratum, and
    // determinism) rather than oracle-hashed; q_mixture stays the
    // exact baseline.
    "q_mixture_approx" -> ((s, d) => {
      // percentile_approx needs a FOLDABLE percentage, so the sketch
      // returns a fixed 200-point quantile grid per stratum and the
      // stratum's own quota/count picks the grid entry afterwards —
      // one partial+final sketch aggregate either way.
      val grid = (1 to 200).map(i => (i / 200.0).toString).mkString("array(", ", ", ")")
      val docs = Tables.documents(s, d).withColumn("h", expr(h("doc_id", A1, B1)))
      val thresholds = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_lang"),
          expr(s"percentile_approx(h, $grid, 10000)").as("qs"))
        .withColumn("quota", expr("CASE WHEN lang = 'en' THEN 40 ELSE 15 END"))
        .withColumn("idx", expr(
          "greatest(1, least(200, cast(ceil(quota / n_lang * 200) as int)))"))
        .select(col("lang"), expr("element_at(qs, idx)").as("h_max"))
      docs.join(broadcast(thresholds), "lang")
        .filter(col("h") <= col("h_max"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Deterministic shuffle + shard: shard = h1 mod `graft.pipeline
    // .shards` (default 8 at fixture scale; see shardCount for the
    // 100 TB sizing rule), order within a
    // shard by an INDEPENDENT hash h2 (reusing h1 would sort each
    // shard by the same key that assigned it — a correlated, biased
    // order). This is the "global shuffle" of training-data prep as a
    // pure function of doc_id: map-only shard assignment, one shuffle
    // to sort within shards — exactly the write pattern of
    // partitionBy("shard").sortWithinPartitions(h2) at 100 TB.
    "q_train_shard" -> ((s, d) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("h2"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("shard", expr(s"${h("doc_id", A1, B1)} % ${shardCount(s)}"))
        .withColumn("h2", expr(h("doc_id", A2, B2)))
        .withColumn("pos", row_number().over(w))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Sequence packing (concat-and-chunk): the standard LLM-pretraining
    // packing scheme — documents are concatenated in a deterministic
    // order and chopped into fixed-capacity context windows, so a doc
    // may straddle a window boundary. The running offset is a window
    // cumsum WITHIN each hash shard (never a global cumsum — that
    // would serialize 100 TB through one reducer); the shard is part
    // of the output key, so chunk ids are (shard, chunk) pairs and
    // shards pack in parallel. Offsets are exact integer arithmetic on
    // n_chars — re-runs and both engines agree bit-for-bit.
    "q_pack_sequences" -> ((s, d) => {
      val cap = 4096L
      val w = Window.partitionBy(col("shard")).orderBy(col("h2"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .withColumn("shard", expr(s"${h("doc_id", A1, B1)} % ${shardCount(s)}"))
        .withColumn("h2", expr(h("doc_id", A2, B2)))
        .withColumn("pack_offset", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .selectExpr("doc_id", "shard", "pack_offset",
          s"pack_offset div $cap AS start_chunk",
          s"(pack_offset + n_chars - 1) div $cap AS end_chunk")
        .orderBy(col("shard"), col("pack_offset"))
    }),

    // FIRST-FIT-DECREASING sequence packing (Krell et al. 2021,
    // "Efficient Sequence Packing without Cross-contamination") — the
    // padding-minimizing alternative to q_pack_sequences'
    // concat-and-chunk: documents are NEVER split across context
    // windows; each window holds whole docs and the FFD heuristic
    // bounds waste (≤ 11/9·OPT + 1 bins). Greedy FFD is inherently
    // sequential, so it runs per SHARD via flatMapGroups — the
    // imperative per-key tier (q_grouped_map precedent), used exactly
    // where no window/aggregate can express the semantics. At 100 TB
    // the shards ≫ reducers rule (shardCount) bounds each group:
    // a shard's (doc_id, n_tokens) pairs are 16 bytes/doc — the text
    // itself never enters the group iterator. ORACLE-CHECKED via the
    // SQL-replayed-DP recipe (the q_tokenize precedent): the greedy
    // first-fit loop replays as a recursive CTE that advances every
    // shard one item per round, carrying the bin-fills LIST as state —
    // the first-fitting bin is the head of a list_filter over the
    // fills, exactly ffdPlace's indexWhere. PipelineSpec additionally
    // pins validity invariants against an independent reimplementation.
    "q_pack_ffd" -> ((s, d) => {
      import s.implicits._
      val cap = 128L
      val shards = shardCount(s)
      Tables.documents(s, d)
        .selectExpr("doc_id", s"${h("doc_id", A1, B1)} % $shards AS shard",
          "cast(size(split(text, ' ')) as bigint) AS n_tokens")
        .as[(Long, Long, Long)]
        .groupByKey(_._2)
        .flatMapGroups { (shard: Long, rows: Iterator[(Long, Long, Long)]) =>
          ffdPlace(rows.map { case (id, _, n) => (id, n) }.toSeq, cap)
            .iterator.map { case (id, bin, n) => (id, shard, bin, n) }
        }
        .toDF("doc_id", "shard", "bin_id", "n_tokens")
        .orderBy(col("doc_id"))
    }),

    // Scalable global row numbering: training pipelines need a dense
    // 0..N-1 example id (shard manifests, resumable data loaders,
    // sample-without-replacement bookkeeping). The naive form —
    // row_number() OVER (ORDER BY key) with no PARTITION BY — funnels
    // the entire corpus through ONE reducer; monotonically_increasing_id
    // is parallel but neither dense nor stable across re-runs. The
    // scalable shape is two-phase: (1) order-aligned buckets (here
    // doc_id DIV 64; at 100 TB, range-sampled split points — the same
    // mechanism repartitionByRange uses) are counted in one tiny
    // aggregate; (2) bucket offsets are a running sum over the
    // BUCKET-COUNT-sized table (driver-scale, broadcast back), and
    // each bucket numbers its own rows independently in parallel.
    // row_id = bucket_offset + intra-bucket row_number — identical to
    // the single-reducer answer, bit-for-bit, with per-bucket
    // parallelism.
    "q_rowid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("bucket", expr("doc_id DIV 64"))
      val offsets = docs.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(
          sum(col("n")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bucket"), col("off"))
      val wb = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      docs.join(broadcast(offsets), "bucket")
        .withColumn("row_id", col("off") + row_number().over(wb) - 1)
        .select(col("doc_id"), col("lang"), col("row_id"))
        .orderBy(col("row_id"))
    }),

    // BUDGET WATER-FILLING CAP — the step after q_token_budget's
    // share table and before an actual training run: given
    // a token budget B (here half the corpus), find the per-source cap
    // C that spends it, i.e. the LARGEST integer C with
    // Σ_s min(tokens_s, C) ≤ B — exactly how production data recipes
    // cap over-represented sources (the "no source exceeds X tokens"
    // rule) while taking small sources whole. Closed form at source
    // grain: sort sources by tokens ascending with prefix sums; i* =
    // the last rank where taking ranks ≤ i whole and capping the rest
    // at t_i still fits (p_i + (n−i)·t_i ≤ B); then
    // C = (B − p_{i*}) DIV (n − i*). All exact integer arithmetic —
    // non-negative throughout, so DIV agrees across engines.
    //
    // Scale posture: one corpus shuffle to SOURCE grain (bounded
    // catalog); the rank/prefix windows and the 1-row cap solve run on
    // that bounded frame (the accepted aggregate-grain partitionless
    // window); the per-source allocation is a broadcast join readout.
    // The doc-level realization of the cap would be q_sample_hash's
    // map-only hash filter at rate C/tokens_s — this query computes
    // the recipe those rates come from.
    "q_budget_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val srcTok = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("bigint").as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
      val tot = srcTok.agg(sum(col("tokens")).as("tt"), count(lit(1)).as("n_src"))
        .withColumn("budget", expr("tt DIV 2"))
      val wOrd = Window.orderBy(col("tokens"), col("source"))
      val ranked = srcTok
        .withColumn("rk", row_number().over(wOrd).cast("bigint"))
        .withColumn("p", sum(col("tokens")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
      // alloc(t_i) = p_i + (n−i)·t_i is nondecreasing in i, so the
      // feasibility condition holds on a rank PREFIX — i* and p_{i*}
      // are plain filtered maxes.
      val capRow = ranked
        .groupBy(col("budget"), col("n_src"))
        .agg(
          coalesce(max(when(expr("p + (n_src - rk) * tokens <= budget"),
            col("rk"))), lit(0L)).as("istar"),
          coalesce(max(when(expr("p + (n_src - rk) * tokens <= budget"),
            col("p"))), lit(0L)).as("pstar"))
        .select(col("budget"), col("n_src"),
          expr("CASE WHEN n_src > istar THEN (budget - pstar) DIV (n_src - istar) END")
            .as("cap_tokens"))
      srcTok.crossJoin(broadcast(capRow))
        .select(col("source"), col("n_docs"), col("tokens"),
          least(col("tokens"), col("cap_tokens")).as("allocated"),
          col("cap_tokens"), col("budget"))
        .orderBy(col("source"))
    }),

    // Market-basket co-occurrence (the support count of frequent-pair
    // mining, and the candidate generator for item-item collaborative
    // filtering): part pairs co-ordered in the same order, counted,
    // support ≥ 3. The self-join is keyed on the BASKET id — each
    // order's items meet in one partition and emit C(n,2) pairs with
    // p1 < p2 (each unordered pair once). At 100 TB the guard is the
    // basket-size cap standard in co-occurrence jobs (a pathological
    // million-item basket would emit ~n²/2 pairs from one task); the
    // fixture's baskets are ≤7 items so the cap is a no-op here, but
    // the shape — distinct items, cap, self-join per basket, count —
    // is the production plan.
    "q_copurchase" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      // One shuffle builds the per-basket item set; pairs are emitted
      // MAP-SIDE from the sorted array (p1 < p2 by construction), so
      // there is no self-join at all — the only other shuffle is the
      // pair-count aggregate, which is the output grain. The slice() is
      // the basket-size cap ([[BasketCap]]); the native sorted_pairs
      // generator replaces the nested interpreted-lambda form (two
      // lambda frames + a slice allocation per inner pair).
      val baskets = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      baskets
        .select(explode(expr(s"sorted_pairs(slice(items, 1, $BasketCap))")).as("p"))
        .select(col("p.a").as("p1"), col("p.b").as("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
        .orderBy(col("support").desc, col("p1"), col("p2"))
    }),

    // Association rules over the co-purchase pairs — the market-basket
    // step AFTER support counting (recommenders, cross-sell): each
    // unordered frequent pair emits BOTH directed rules a→b MAP-SIDE,
    // then confidence = support/count(antecedent) and lift =
    // support·N/(count(a)·count(b)) attach via two item-count joins
    // and a broadcast 1-row basket total. EXACT micro-unit integers
    // throughout (support·N·10⁶ ≤ 2.2·10¹⁶ ≪ 2⁶³ at sf0.1); top-50 by
    // confidence. The item-count table is item-catalog-sized; at
    // 100 TB the joins shuffle (item, count) pairs only.
    "q_assoc_rules" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .persist() // consumed by the basket total, item counts, AND pair build
      val nB = items.agg(countDistinct(col("ok")).as("n_baskets"))
      val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
      val pairs = items
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("basket"))
        .select(explode(expr(s"sorted_pairs(slice(basket, 1, $BasketCap))")).as("p"))
        .select(col("p.a").as("p1"), col("p.b").as("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
      pairs
        .select(explode(array(
          struct(col("p1").as("ante"), col("p2").as("cons"), col("support")),
          struct(col("p2").as("ante"), col("p1").as("cons"), col("support")))).as("r"))
        .select(col("r.ante"), col("r.cons"), col("r.support"))
        .join(cnt.select(col("pk").as("ante"), col("cnt").as("n_ante")), Seq("ante"))
        .join(cnt.select(col("pk").as("cons"), col("cnt").as("n_cons")), Seq("cons"))
        .crossJoin(broadcast(nB))
        .withColumn("conf_micro", expr("(support * 1000000) DIV n_ante"))
        .withColumn("lift_micro", expr("(support * n_baskets * 1000000) DIV (n_ante * n_cons)"))
        .select(col("ante"), col("cons"), col("support"), col("n_ante"),
          col("conf_micro"), col("lift_micro"))
        .orderBy(col("conf_micro").desc, col("ante"), col("cons"))
        .limit(50)
    }),

    // Frequent 3-itemsets via A-PRIORI candidate generation (Agrawal &
    // Srikant 1994 round L2→L3) — the step after q_copurchase's pair
    // supports: candidate triples come from FREQUENT-PAIR occurrences
    // extended by a third same-basket item (p3 > p2 on the sorted
    // basket), then A-priori-pruned — (p1,p3) and (p2,p3) must also be
    // frequent — BEFORE the counting aggregate. The prunes cannot
    // change the result (any triple with support ≥ 3 has all three
    // sub-pairs at support ≥ 3 by containment — which is exactly why
    // the oracle can be the direct triple join); they exist to bound
    // the aggregate's input at scale, A-priori's entire point: without
    // them every frequent pair × basket item feeds the count. The
    // frequent-pair table is catalog-scale → broadcast into both the
    // extension semi-join and the prunes; occurrences key on the
    // basket id, so the extension join is co-partitioned with the
    // basket build.
    "q_freq_triples" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        .persist() // consumed by the pair build AND the triple extension
      val pairOcc = items
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("basket"))
        .select(col("ok"), explode(expr(s"sorted_pairs(slice(basket, 1, $BasketCap))")).as("p"))
        .select(col("ok"), col("p.a").as("p1"), col("p.b").as("p2"))
        .persist() // feeds the frequent-pair count AND the candidate extension
      // minsup 2 for the L3 round (triples sparsify faster than pairs —
      // at sf0.1 even support-2 triples vanish); the pair prune uses the
      // SAME threshold so containment still guarantees result-identity
      // persisted: THREE broadcast exchanges read this table (the
      // extension semi-join and both A-priori prunes) and each
      // exchange otherwise re-runs the pair-count aggregate
      val freqPairs = pairOcc.groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("s2")).filter(col("s2") >= 2)
        .select(col("p1"), col("p2"))
        .persist()
      pairOcc
        .join(broadcast(freqPairs), Seq("p1", "p2"), "left_semi")
        .join(items.select(col("ok"), col("pk").as("p3")), Seq("ok"))
        .filter(col("p3") > col("p2"))
        .join(broadcast(freqPairs.select(col("p1"), col("p2").as("p3"))),
          Seq("p1", "p3"), "left_semi")
        .join(broadcast(freqPairs.select(col("p1").as("p2"), col("p2").as("p3"))),
          Seq("p2", "p3"), "left_semi")
        .groupBy(col("p1"), col("p2"), col("p3"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("support").desc, col("p1"), col("p2"), col("p3"))
    }),

    // Item-item collaborative-filtering recommendations (Sarwar et al.
    // 2001 / Amazon's item-to-item CF) — the SERVING step after
    // co-occurrence counting: the co-purchase pair supports are the
    // similarity model, TRUNCATED to the top-10 co-items per item
    // (deterministic tiebreak) — the bounded model every production
    // item-item CF ships, and the reason the expansion join below has
    // bounded fan-out (≤ 10 candidates per owned item) no matter how
    // hot an item is. Each customer's owned set expands through the
    // model, candidate scores sum per (customer, item), already-owned
    // items are anti-joined out, and a top-3 window (map-side pruned
    // by WindowGroupLimit, the q_domain_cap idiom) picks the recs.
    //
    // Scale posture: the model is item-catalog-sized → broadcast into
    // the expansion join, so the owned table (the 100 TB side) never
    // shuffles for it; the score aggregate and the owned anti-join
    // both key on (customer, item) — co-partitioned, id/int pairs
    // only. Exact integer scores end-to-end.
    "q_item_rec" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val pairs = li
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("basket"))
        .select(explode(expr(s"sorted_pairs(slice(basket, 1, $BasketCap))")).as("p"))
        .select(col("p.a").as("p1"), col("p.b").as("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
      val simsW = Window.partitionBy(col("item"))
        .orderBy(col("support").desc, col("co_item"))
      val sims = pairs
        .select(explode(array(
          struct(col("p1").as("item"), col("p2").as("co_item"), col("support")),
          struct(col("p2").as("item"), col("p1").as("co_item"), col("support")))).as("r"))
        .select(col("r.item"), col("r.co_item"), col("r.support"))
        .withColumn("rn", row_number().over(simsW))
        .filter(col("rn") <= 10)
        .drop("rn")
      val owned = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
        .distinct()
      val recW = Window.partitionBy(col("cust"))
        .orderBy(col("score").desc, col("rec_item"))
      owned.join(broadcast(sims), "item")
        .groupBy(col("cust"), col("co_item").as("rec_item"))
        .agg(sum(col("support")).as("score"), count(lit(1)).as("n_common"))
        .join(owned.select(col("cust"), col("item").as("rec_item")),
          Seq("cust", "rec_item"), "left_anti")
        .withColumn("rk", row_number().over(recW))
        .filter(col("rk") <= 3)
        .orderBy(col("cust"), col("rk"))
    }),

    // Z-order (Morton) layout key — the multi-dimensional data-skipping
    // primitive (Delta OPTIMIZE ZORDER BY, Iceberg sort orders): bit-
    // interleaving two keys gives ONE sort key whose contiguous ranges
    // are small rectangles in BOTH dimensions, so parquet row-group
    // min/max footers prune scans filtered on either key (a plain sort
    // by (a, b) prunes only on a). The write path at 100 TB is
    // repartitionByRange(zval) + sortWithinPartitions(zval) before the
    // sink; this query materializes the key itself over the distinct
    // (part, supplier) cells. Pure integer bit arithmetic — 16 bits
    // per dimension at fixture key ranges (the bit width is the only
    // scale-dependent constant), identical in both engines.
    "q_zorder" -> ((s, d) => {
      val z = (0 until 16).map(i =>
        s"shiftleft(shiftright(l_partkey, $i) & 1, ${2 * i}) + " +
          s"shiftleft(shiftright(l_suppkey, $i) & 1, ${2 * i + 1})").mkString(" + ")
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .withColumn("zval", expr(z))
        .orderBy(col("zval"))
    }),

    // Per-domain document cap — the crawl-curation staple: a handful
    // of hot domains dominate any web crawl, and capping them bounds
    // both topical skew and downstream per-key work. Kept docs are the
    // K smallest by an INDEPENDENT hash (unbiased and deterministic —
    // not "first K crawled", which over-samples whatever the crawler
    // saw first). The row_number ≤ K idiom is map-side pruned by
    // Spark's built-in WindowGroupLimit (see plans/WindowTopK): each
    // mapper forwards ≤ K rows per domain it sees, so at 100 TB a hot
    // domain's millions of pages never cross the wire. Plan pinned in
    // PlanAuditSpec.
    "q_domain_cap" -> ((s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("h2"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h2", expr(h("doc_id", A2, B2)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy(col("source"), col("rn"))
    }),

    // Lexical diversity (type-token ratio): low-TTR documents are
    // boilerplate / keyword-stuffed spam — the classic cheap quality
    // signal next to q_repetition's shingle fractions. Map-only
    // (tokenize → distinct → two counts per row), so it runs at scan
    // speed and the text column never shuffles. Counts cast to long
    // for oracle type parity (DuckDB len() is BIGINT).
    "q_ttr" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_types"))
        .withColumn("ttr", round(col("n_types").cast("double") / col("n_tokens"), 4))
        .withColumn("keep", (col("ttr") >= 0.3).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style quality terciles: rank each language's documents by
    // a cheap quality score (lexical diversity here; a broadcast-LM
    // perplexity in a production run) and cut head / middle / tail.
    // ntile needs a per-lang total order — but PARTITION BY lang alone
    // bounds nothing on web text (English IS ~half the corpus, so the
    // hot partition is a single-reducer sort of half the data). The
    // per-lang tiles are reconstructed instead from a lang-scoped
    // [[graft.operators.Ranks.globalOrderScan]] (data-grain window
    // partitions by (lang, score-bucket) — every language fans out
    // across its score buckets) + a broadcast per-lang total feeding
    // [[graft.operators.Ranks.ntileFromRank]] — bit-identical to
    // `ntile(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id)`
    // (the SQL-standard tile formula; RanksSpec pins the parity), so
    // both engines tile identically.
    "q_quality_tercile" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("score",
          size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
        .select(col("doc_id"), col("lang"), col("score"))
      val perLang = scored.groupBy(col("lang")).agg(count(lit(1)).as("__n_lang"))
      // bucket = −⌊score·1000⌋: monotone non-decreasing along the
      // (score desc) order within every lang — floor(x·1000) is
      // monotone in IEEE doubles, so the globalOrderScan contract holds
      Ranks.globalOrderScan(scored,
          expr("-CAST(floor(score * 1000) AS BIGINT)"),
          Seq(col("score").desc, col("doc_id")), "__rk", parts = Seq("lang"))
        .join(broadcast(perLang), Seq("lang"))
        .withColumn("bucket", Ranks.ntileFromRank("__rk", "__n_lang", 3))
        .select(col("doc_id"), col("lang"),
          expr("CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END")
            .as("tier"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: drop any training doc sharing a word
    // 3-gram with the eval set (docs with doc_id ≡ 0 mod 23 stand in
    // for the benchmark). The eval n-gram set is broadcast — the 100 TB
    // side is never shuffled; contaminated ids come from a broadcast
    // semi-join at n-gram grain, then one anti-join at doc grain.
    "q_decontaminate" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val docs = Tables.documents(s, d)
      val ng = docs.select(col("doc_id"), col("lang"),
        explode(expr("word_shingles(text, 3)")).as("ng"))
      val evalNg = ng.filter(col("doc_id") % 23 === 0).select(col("ng")).distinct()
      val contaminated = ng.filter(col("doc_id") % 23 =!= 0)
        .join(broadcast(evalNg), Seq("ng"), "left_semi")
        .select(col("doc_id")).distinct()
      docs.filter(col("doc_id") % 23 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Contamination REPORT — q_decontaminate's diagnostic twin: for
    // each eval doc, what fraction of its 3-grams appears anywhere in
    // the training side? (Decontamination drops on ANY overlap; audits
    // want the overlap distribution before choosing that policy.)
    // Scale shape: the eval n-gram set is broadcast; the 100 TB train
    // side is filtered DOWN to matched n-grams via a broadcast semi
    // join (surviving set ≤ |eval n-grams|, tiny) and only then
    // distinct'd and joined back — the train side's text never
    // shuffles and nothing larger than the eval set ever aggregates.
    // hit/total is a single int/int division → bit-exact both engines.
    "q_contamination_report" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val ng = Tables.documents(s, d).select(col("doc_id"),
        explode(expr("word_shingles(text, 3)")).as("ng")) // distinct within doc
      val evalNg = ng.filter(col("doc_id") % 23 === 0)
      val evalSet = evalNg.select(col("ng")).distinct()
      val hitNg = ng.filter(col("doc_id") % 23 =!= 0).select(col("ng"))
        .join(broadcast(evalSet), Seq("ng"), "left_semi").distinct()
        .withColumn("hit", lit(1))
      evalNg.join(hitNg, Seq("ng"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_hit"))
        .withColumn("overlap", round(col("n_hit").cast("double") / col("n_ngrams"), 4))
        .orderBy(col("doc_id"))
    }),

    // Token-budget planning report: tokens per (lang, source) slice
    // plus each source's cumulative share of its language — the table
    // a mixture designer reads before setting q_mixture quotas. All
    // integer sums (exact), one aggregate + one per-lang window over
    // the SLICE table (20 sources × 5 langs — window input is
    // aggregate-sized, never corpus-sized), single division rounded.
    "q_token_budget" -> ((s, d) => {
      val slices = Tables.documents(s, d)
        .withColumn("ntok", expr("cast(size(split(text, ' ')) as bigint)"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
      val wCum = Window.partitionBy(col("lang"))
        .orderBy(col("tokens").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("lang"))
      slices
        .withColumn("cum_tokens", sum(col("tokens")).over(wCum))
        .withColumn("lang_share", round(
          col("cum_tokens").cast("double") / sum(col("tokens")).over(wAll), 4))
        .orderBy(col("lang"), col("cum_tokens"))
    }),

    // Corpus TF-IDF statistics per (lang, token): document frequency
    // within the language, total term frequency, idf = ln(N_lang/df).
    // One explode + two hash aggregates (token grain, then join with
    // the broadcast per-lang doc counts). Emitted for df >= 10 to keep
    // the result a "vocabulary report", not a full posting list.
    "q_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      tok.groupBy(col("lang"), col("token"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .filter(col("df") >= 10)
        .join(broadcast(nLang), "lang")
        .select(col("lang"), col("token"), col("df"), col("tf"),
          round(log(col("n_docs") / col("df")), 4).as("idf"),
          round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf_mass"))
        .orderBy(col("lang"), col("token"))
    }),

    // END-TO-END corpus construction — the capstone composition: the
    // dup-laden raw corpus (NearDup.corpus: documents ∪ truncated
    // variants, modelling real crawl duplication) flows through
    //   quality filter → exact dedup → near-dup drop →
    //   decontamination → stratified sample → shard assignment
    // as ONE declarative plan per stage, each stage the same operator
    // already verified standalone. Scale posture: quality/sample/shard
    // are map-only; exact dedup is one shuffle on md5(text); near-dup
    // reuses the subquadratic PPJoin pipeline; decontamination
    // broadcasts the eval n-gram set. Nothing collects to the driver.
    "q_corpus_e2e" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val raw = NearDup.corpus(s, d)
      val quality = raw.filter(length(col("text")) >= 64)
      // exact dedup: canonical = smallest doc_id per identical text
      val wm = Window.partitionBy(col("m")).orderBy(col("doc_id"))
      val exact = quality.withColumn("m", md5(col("text")))
        .withColumn("rn", row_number().over(wm))
        .filter(col("rn") === 1).drop("m", "rn")
      // near-dup drop: the larger id of every verified jaccard pair
      val dupIds = NearDup.jaccardPairs(s, d).select(col("b_id").as("doc_id")).distinct()
      val near = exact.join(dupIds, Seq("doc_id"), "left_anti")
      // decontamination vs the eval stand-in (doc_id ≡ 0 mod 23 in the raw corpus)
      // Two separate (small) shingle passes beat one shared big one:
      // Catalyst pushes the doc_id filters BELOW the explode, so the
      // eval side shingles only 1/23 of the corpus and the probe side
      // only the surviving candidates — materializing a shared
      // all-corpus n-gram frame was measured 2× slower.
      val ngAll = raw.select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("ng"))
      val evalNg = ngAll.filter(col("doc_id") % 23 === 0).select(col("ng")).distinct()
      // candidates feeds BOTH the contamination probe and the final
      // anti-join; the shared shuffle subtree is deduplicated by
      // ReusedExchange (measured: materializing it via localCheckpoint
      // is no faster here and would spill the text column to executor
      // disk at scale).
      val candidates = near.filter(col("doc_id") % 23 =!= 0)
      val contaminated = candidates
        .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("ng"))
        .join(broadcast(evalNg), Seq("ng"), "left_semi")
        .select(col("doc_id")).distinct()
      val clean = candidates.join(contaminated, Seq("doc_id"), "left_anti")
      // stratified sample + deterministic shard
      clean
        .filter(expr(s"${h("doc_id", A1, B1)} % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 80 END"))
        .select(col("doc_id"), col("lang"),
          expr(s"${h("doc_id", A2, B2)} % ${shardCount(s)}").as("shard"))
        .orderBy(col("doc_id"))
    }),

    // Length histogram: fixed-width integer buckets (64 chars), all
    // integer arithmetic so both engines bucket identically. A single
    // partial+final hash aggregate.
    "q_histogram" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket", expr("least(n_chars div 64, 9)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("bucket"))
    }),

    // LENGTH-BUCKETED batching report — the dynamic-batching /
    // padding-efficiency planner (every serving stack batches by
    // length: pad-to-multiple-of-16 buckets vs pad-everything-to-
    // global-max): per bucket, docs, real tokens, padding paid under
    // bucketing, padding the naive global-max batcher would pay, and
    // the bucket's waste fraction in micro-units. Complements the
    // PACKING family from the other side: q_pack_sequences/q_pack_ffd
    // eliminate padding by concatenation (training), bucketing bounds
    // it when sequences must stay whole (inference).
    //
    // Scale posture: one map-only bucket projection on the scan, one
    // partial+final aggregate at BUCKET grain, and a 1-row broadcast
    // (the global max) attached to the bucket table — nothing
    // collects, text never shuffles, all-integer arithmetic (waste is
    // truncating micro-units on non-negatives, where Spark DIV and
    // DuckDB // agree).
    // DATA-CONSTRAINED repetition planner (Muennighoff et al. 2023,
    // "Scaling Data-Constrained Language Models"): given a token
    // budget and a per-language UNIFORM target (the rebalancing case —
    // proportional allocation would make every epoch count identical),
    // plan how many epochs each language's data must repeat, capped at
    // 4 epochs — the paper's empirical knee, past which repeated
    // tokens stop buying loss. Per language: corpus tokens, the
    // uniform target, epochs in micro-units (capped), effective tokens
    // actually obtainable, the shortfall the cap leaves unfilled, and
    // the constrained flag. Budget = session conf
    // `graft.pipeline.budget_tokens` (default 100000 — the
    // fixture/oracle scale; a real run sets its trillion-token budget
    // the q_train_shard way). ALL integer: truncating DIV on
    // non-negatives, so both engines plan bit-identically.
    //
    // Scale posture: one lang-grain aggregate + a 1-row broadcast
    // (language count); everything downstream is arithmetic on the
    // aggregate-sized table. Text never shuffles — token counts ride
    // the partial aggregation.
    "q_epoch_plan" -> ((s, d) => {
      val budget = s.conf.get("graft.pipeline.budget_tokens", "100000").toLong
      val g = Tables.documents(s, d)
        .select(col("lang"), size(split(col("text"), " ")).cast("bigint").as("nt"))
        .groupBy(col("lang")).agg(sum(col("nt")).as("tokens"))
      val langs = g.agg(count(lit(1)).as("n_langs"))
      g.crossJoin(broadcast(langs))
        .withColumn("target", expr(s"$budget DIV n_langs"))
        .withColumn("epochs_micro", expr(
          "least((target * 1000000) DIV tokens, CAST(4000000 AS BIGINT))"))
        .withColumn("effective", expr("least(target, 4 * tokens)"))
        .withColumn("shortfall", expr("target - least(target, 4 * tokens)"))
        .withColumn("constrained", expr("target > 4 * tokens"))
        .select(col("lang"), col("tokens"), col("target"), col("epochs_micro"),
          col("effective"), col("shortfall"), col("constrained"))
        .orderBy(col("lang"))
    }),

    "q_length_bucket" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      val g = docs.agg(max(col("n_tokens")).as("max_len"))
      docs.withColumn("bucket_len", expr("((n_tokens + 15) DIV 16) * 16"))
        .groupBy(col("bucket_len"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .crossJoin(broadcast(g))
        .withColumn("pad_tokens", expr("n_docs * bucket_len - sum_tokens"))
        .withColumn("naive_pad_tokens", expr("n_docs * max_len - sum_tokens"))
        .withColumn("waste_micro", expr("(pad_tokens * 1000000) DIV (n_docs * bucket_len)"))
        .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
          col("pad_tokens"), col("naive_pad_tokens"), col("waste_micro"))
        .orderBy(col("bucket_len"))
    }),

    // LOCAL differential privacy via k-ary randomized response (Warner
    // 1965; Kairouz et al. 2016) — the privacy tier a pipeline applies
    // when per-record attributes (here: language) must be aggregated
    // without trusting the aggregator. Each doc reports its TRUE lang
    // with p = 3/5, else one of the other 4 uniformly (ε = ln(p·4/(1−p))
    // = ln 6 per record); the debiasing identity E[n_rep] = n_k/2 + n/10
    // inverts to n̂_k = 2·n_rep − n/5 — in milli-units EXACT integers
    // (est_milli = 2000·n_rep − 200·n), so both engines replay the
    // estimator bit-for-bit. The "coin" is the universal hash (A2/B2 —
    // decoupled from the A1/B1 sampling streams): deterministic per
    // doc, so a re-run or audit reproduces every report, which is how
    // production DP pipelines make their noise replayable (fixed seed
    // per record id). ENTIRELY map + one 5-group aggregate — scan
    // speed at 100 TB; err_milli is reported because the fixture KNOWS
    // ground truth — production publishes est only.
    "q_dp_response" -> ((s, d) => {
      val cls = "array('de','en','es','fr','zh')"
      val idx = "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2 " +
        "WHEN 'fr' THEN 3 ELSE 4 END"
      val hh = h("doc_id", A2, B2)
      val rep = Tables.documents(s, d).selectExpr("doc_id", "lang",
          s"CASE WHEN ($hh) % 5 < 3 THEN lang " +
            s"ELSE element_at($cls, CAST(($idx + 1 + (($hh) DIV 5) % 4) % 5 AS INT) + 1) " +
            "END AS rep_lang")
      val truec = rep.groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
      val repc = rep.groupBy(col("rep_lang").as("lang")).agg(count(lit(1)).as("n_rep"))
      val tot = rep.agg(count(lit(1)).as("n"))
      truec.join(repc, Seq("lang"), "full_outer")
        .crossJoin(broadcast(tot))
        .selectExpr("lang",
          "coalesce(n_true, 0) AS n_true", "coalesce(n_rep, 0) AS n_rep",
          "2000 * coalesce(n_rep, 0) - 200 * n AS est_milli")
        .selectExpr("lang", "n_true", "n_rep", "est_milli",
          "est_milli - 1000 * n_true AS err_milli")
        .orderBy(col("lang"))
    }),

    // SHARD BALANCE AUDIT — q_skew_audit's twin for the OUTPUT side:
    // after hash-sharding (the q_train_shard assignment, same A1/B1
    // hash so this audits exactly what that query ships), how even are
    // the shards in docs and TOKENS? Token imbalance is what actually
    // hurts: the epoch takes as long as the fattest shard, so
    // max/mean_micro IS the straggler multiple of the training data
    // loader. One shard-grain aggregate + a 1-row summary crossJoin;
    // ratios cross-multiplied exact integers. The doc-count balance is
    // guaranteed by the hash; token balance is NOT (long docs clump by
    // chance) — reporting both is the point.
    "q_shard_balance" -> ((s, d) => {
      val perShard = Tables.documents(s, d)
        .selectExpr(s"${h("doc_id", A1, B1)} % ${shardCount(s)} AS shard",
          "CAST(size(split(text, ' ')) AS BIGINT) AS nt")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      val tot = perShard.agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("tot_docs"), sum(col("n_tokens")).as("tot_tokens"),
        max(col("n_tokens")).as("max_tokens"), min(col("n_tokens")).as("min_tokens"),
        max(col("n_docs")).as("max_docs"), min(col("n_docs")).as("min_docs"))
      perShard.crossJoin(broadcast(tot))
        .selectExpr("shard", "n_docs", "n_tokens",
          "(n_tokens * n_shards * 1000000) DIV tot_tokens AS load_micro",
          "(max_tokens * n_shards * 1000000) DIV tot_tokens AS straggler_micro",
          "(max_docs * 1000000) DIV min_docs AS doc_spread_micro",
          "(max_tokens * 1000000) DIV min_tokens AS token_spread_micro")
        .orderBy(col("shard"))
    }),

    // SNAPSHOT DIFF — the release-reconciliation report between two
    // corpus versions: per (source, status) counts of added / removed
    // / changed / unchanged docs, where "changed" is a content-hash
    // disagreement on a shared id. This is the diff a dataset release
    // publishes next to its card, and the regression tripwire between
    // crawl refreshes ("why did src7 lose 40% of its docs?"). The new
    // snapshot is synthesized deterministically (every 7th doc
    // dropped, every 5th rewritten, every 11th re-appearing under a
    // new id) so the oracle replays it. One full-outer join on doc_id
    // carrying (source, md5) only — text never shuffles — then a
    // matrix-sized rollup.
    "q_snapshot_diff" -> ((s, d) => {
      val old = Tables.documents(s, d)
        .selectExpr("doc_id", "source", "md5(text) AS fp")
      val neu = Tables.documents(s, d).filter(col("doc_id") % 7 =!= 0)
        .selectExpr("doc_id", "source",
          "md5(CASE WHEN doc_id % 5 = 0 THEN concat(text, ' rev') ELSE text END) AS fp")
        .unionByName(Tables.documents(s, d).filter(col("doc_id") % 11 === 0)
          .selectExpr("doc_id + 1000000 AS doc_id", "source", "md5(text) AS fp"))
      old.select(col("doc_id"), col("source").as("src_a"), col("fp").as("fp_a"))
        .join(neu.select(col("doc_id"), col("source").as("src_b"), col("fp").as("fp_b")),
          Seq("doc_id"), "full_outer")
        .selectExpr("coalesce(src_a, src_b) AS source",
          """CASE WHEN fp_a IS NULL THEN 'added'
            |     WHEN fp_b IS NULL THEN 'removed'
            |     WHEN fp_a = fp_b THEN 'unchanged'
            |     ELSE 'changed' END AS status""".stripMargin)
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("status"))
    }),

    // CONTENT MANIFEST — the per-source integrity signature a release
    // ships so a consumer can verify a copy without re-downloading:
    // content_sig = Σ (md5-derived 60-bit int of each doc's text)
    // mod p, a COMMUTATIVE fold (order- and partitioning-independent,
    // unlike a hash of concatenated text), plus doc/token totals. Two
    // manifests are equal iff the per-source content multisets agree
    // (up to the 2⁻⁶⁰ collision budget). One partial-agg'd aggregate
    // at source grain; the md5 prefix fold is the hshSql recipe.
    "q_manifest" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr("source",
          "CAST(size(split(text, ' ')) AS BIGINT) AS nt",
          // reduce each 60-bit hash mod p BEFORE the sum: Σ over a
          // corpus of raw 2⁶⁰ values overflows int64 silently in
          // Spark and widens to HUGEINT in DuckDB — per-element mod
          // keeps the fold in-range at any corpus size
          "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) % 2147483647 AS hsig")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          expr("sum(hsig) % 2147483647").as("content_sig"))
        .orderBy(col("source"))),

    // BLOCK JACKKNIFE variance of a corpus statistic (Quenouille/Tukey;
    // the delete-one-block estimator survey statisticians attach to
    // every published mean) — the error bar q_dataset_card's
    // mean-tokens number needs before two snapshots can be compared:
    // is the drift real or sampling noise? Blocks = the 20 sources
    // (the natural correlated unit — docs within a source are not
    // independent, so a doc-grain jackknife would understate the
    // variance). Leave-one-block-out means in exact micro, variance
    // numerator (B−1)·Σ(m_i − m̄)²/B in exact micro² — no sqrt, no
    // float anywhere; consumers compare var·z² against drift². One
    // source-grain aggregate (20 rows) + arithmetic at block grain.
    "q_jackknife" -> ((s, d) => {
      val blocks = Tables.documents(s, d)
        .selectExpr("source", "CAST(size(split(text, ' ')) AS BIGINT) AS nt")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_b"), sum(col("nt")).as("x_b"))
      val tot = blocks.agg(
        count(lit(1)).as("bb"), sum(col("n_b")).as("nn"), sum(col("x_b")).as("tt"))
      val loo = blocks.crossJoin(broadcast(tot))
        .selectExpr("bb", "nn", "tt",
          "((tt - x_b) * 1000000) DIV (nn - n_b) AS m_i")
      val mbar = loo.groupBy(col("bb"), col("nn"), col("tt"))
        .agg(sum(col("m_i")).as("sm"), count(lit(1)).as("b2"))
        .selectExpr("bb", "nn", "tt", "sm DIV bb AS m_bar")
      loo.join(broadcast(mbar), Seq("bb", "nn", "tt"))
        .selectExpr("bb", "nn", "tt",
          "(m_i - m_bar) * (m_i - m_bar) AS sq")
        .groupBy(col("bb"), col("nn"), col("tt"))
        .agg(sum(col("sq")).as("ssq"))
        .selectExpr("nn AS n_docs", "bb AS n_blocks",
          "(tt * 1000000) DIV nn AS mean_micro",
          "((bb - 1) * ssq) DIV bb AS jk_var_micro2")
    }),

    // DATASET CARD — the one-row corpus datasheet (Gebru et al. 2021,
    // "Datasheets for Datasets"): scale (docs/tokens/bytes), diversity
    // (language and source cardinalities), hygiene (exact-dup fraction
    // via content-hash distinct, length-gate fraction), and density
    // (mean tokens/doc) — the summary row a data release publishes and
    // a training run logs before it starts. ONE aggregate over the
    // corpus; the three COUNT(DISTINCT) columns are exact here (the
    // oracle-parity form) — at 100 TB each swaps for its HLL sketch
    // (the q_approx_stats/q_hll_union tier) without changing the
    // query's shape. Ratios in exact micro units.
    "q_dataset_card" -> ((s, d) =>
      Tables.documents(s, d).selectExpr("lang", "source", "md5(text) AS fp",
          "CAST(size(split(text, ' ')) AS BIGINT) AS nt",
          "CAST(length(text) AS BIGINT) AS nc")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"), sum(col("nc")).as("n_chars"),
          countDistinct(col("fp")).as("n_unique"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(when(col("nt") < 5 || col("nt") > 120, 1L).otherwise(0L)).as("n_gated"))
        .selectExpr("n_docs", "n_tokens", "n_chars", "n_langs", "n_sources",
          "((n_docs - n_unique) * 1000000) DIV n_docs AS dup_micro",
          "(n_tokens * 1000000) DIV n_docs AS mean_tokens_micro",
          "(n_gated * 1000000) DIV n_docs AS gated_micro")),

    // CENTRAL differential privacy via the GEOMETRIC MECHANISM (Ghosh
    // Roughgarden Sundararajan 2009 — the discrete Laplace): the
    // (lang × length-bucket) histogram published with two-sided
    // geometric noise, α = 1/2 ⇒ ε = ln 2 per cell. q_dp_response is
    // the LOCAL tier (noise per record, no trusted aggregator); this
    // is the central tier (exact aggregate + calibrated noise at
    // publish time) — together they bracket how production publishes
    // counts. The noise is ALL-INTEGER and hash-replayable: per cell,
    // h = universal hash of the cell id; sign = lowest bit; magnitude
    // = TRAILING-ONES of h>>1, isolated with the two's-complement
    // identity (~x) & (x+1) = 1 << trailing_ones(x), so
    // bit_count(that − 1) samples Geometric(1/2) exactly — no log, no
    // float, identical in both engines. One partial-agg'd histogram
    // aggregate; noise is a map over the matrix-sized cell table.
    "q_dp_histogram" -> ((s, d) => {
      val idx = "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2 " +
        "WHEN 'fr' THEN 3 ELSE 4 END"
      Tables.documents(s, d)
        .selectExpr("lang",
          "((CAST(size(split(text, ' ')) AS BIGINT) + 15) DIV 16) * 16 AS bucket_len")
        .groupBy(col("lang"), col("bucket_len"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("cell_id", expr(s"bucket_len * 7 + $idx"))
        .withColumn("h", expr(h("cell_id", A2, B2)))
        .withColumn("sign", expr("CASE WHEN (h & 1) = 1 THEN 1 ELSE -1 END"))
        .withColumn("mag", expr(
          "CAST(bit_count(((~(h DIV 2)) & ((h DIV 2) + 1)) - 1) AS BIGINT)"))
        .selectExpr("lang", "bucket_len", "n_true",
          "sign * mag AS noise", "n_true + sign * mag AS n_noisy")
        .orderBy(col("lang"), col("bucket_len"))
    }),

    // COMPETENCE-BASED curriculum schedule (Platanios et al. 2019,
    // "Competence-based Curriculum Learning for NMT"): training
    // proceeds in phases whose competence c(t) = t/4 admits the
    // easiest c(t)-fraction of the corpus, difficulty = token count
    // (longer = harder, the standard text proxy). The schedule table a
    // data loader consumes: per phase, its eligible pool (docs +
    // tokens), the NEWLY admitted slice, and the difficulty frontier.
    // Admission is the EXACT integer predicate 4·rank ≤ t·n (rank/n ≤
    // t/4 cross-multiplied) — no division anywhere, so engines agree
    // bit-for-bit. The total-order rank comes from
    // [[Ranks.globalOrderScan]] (token-count-width buckets — the
    // data-grain window partitions by bucket), then a 4-phase explode
    // + matrix-sized aggregate.
    "q_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("nt"))
      val ranked = Ranks.globalOrderScan(docs, expr("nt DIV 16"),
        Seq(col("nt"), col("doc_id")), "rk")
      val n = ranked.agg(count(lit(1)).as("n"))
      val phases = ranked.crossJoin(broadcast(n))
        .select(col("doc_id"), col("nt"), col("rk"), col("n"),
          explode(expr("sequence(1, 4)")).as("t"))
        .filter(expr("4 * rk <= t * n"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_eligible"), sum(col("nt")).as("tokens_eligible"),
          max(col("nt")).as("frontier_tokens"))
      val w = Window.orderBy(col("t"))
      phases
        .withColumn("competence_micro", expr("CAST(t AS BIGINT) * 250000"))
        .withColumn("n_new",
          col("n_eligible") - coalesce(lag(col("n_eligible"), 1).over(w), lit(0L)))
        .withColumn("tokens_new",
          col("tokens_eligible") - coalesce(lag(col("tokens_eligible"), 1).over(w), lit(0L)))
        .select(col("t"), col("competence_micro"), col("n_eligible"),
          col("tokens_eligible"), col("frontier_tokens"), col("n_new"), col("tokens_new"))
        .orderBy(col("t"))
    }),

    // SUCCESSIVE-HALVING schedule replay (Jamieson & Talwalkar 2016;
    // Hyperband's inner loop) — the hyperparameter-tuning scheduler a
    // training pipeline runs ON the engine: 16 configs (the q_bandit
    // arm convention, user_id % 16 cohorts) start at budget 1 day of
    // data; each rung doubles the budget (1→2→4→8 days) and keeps the
    // top half by mean milli-reward (tie-break: config asc), so rung r
    // ranks 16/2^r survivors. The output is the full promotion table —
    // which configs reached which rung at what metric — i.e. exactly
    // what an experiment tracker renders. Integer-exact: milli rewards,
    // truncating DIV on non-negative sums, rank windows over ≤16 rows.
    //
    // Scale posture: ONE corpus shuffle builds the (config, day) cell
    // table; the 4 rung views are a 4-way explode over those cells
    // (map-side, calendar-bounded); ranking and halving run on ≤16-row
    // frames with broadcast survivor joins — the corpus is never
    // rescanned per rung (localCheckpoint pins the cell table).
    "q_sha_tuning" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lo = Tables.events(s, d)
        .agg(min(expr("unix_micros(ts) DIV 86400000000")).as("lo"))
      val rungCells = Tables.events(s, d)
        .crossJoin(broadcast(lo))
        .select((col("user_id") % 16).as("config"),
          expr("unix_micros(ts) DIV 86400000000 - lo").as("di"),
          expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
        .groupBy(col("config"), col("di"))
        .agg(count(lit(1)).as("c"), sum(col("vm")).as("s"))
        .withColumn("rung", explode(expr("sequence(0, 3)")))
        .filter(col("di") <
          expr("CASE rung WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END"))
        .groupBy(col("rung"), col("config"))
        .agg(sum(col("c")).as("n_ev"), sum(col("s")).as("sv"))
        .withColumn("metric_milli", expr("(sv * 1000) DIV n_ev"))
        .ckpt() // consumed by all 4 rung selections
      def ranked(df: DataFrame): DataFrame =
        df.withColumn("rk", row_number().over(
          Window.orderBy(col("metric_milli").desc, col("config"))).cast("bigint"))
      var cur = ranked(rungCells.filter(col("rung") === 0))
      var acc = cur
      for (r <- 1 to 3) {
        val keep = cur.filter(col("rk") <= (16 >> r)).select(col("config"))
        cur = ranked(rungCells.filter(col("rung") === r)
          .join(broadcast(keep), "config"))
        acc = acc.unionByName(cur)
      }
      acc.select(col("rung"), col("config"), col("n_ev"), col("metric_milli"), col("rk"))
        .orderBy(col("rung"), col("rk"))
    })
  )

  private val ngSql =
    """ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS ng
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin

  val oracles: Map[String, String] = Map(
    // The 8 greedy rounds unrolled: a_r = remaining (doc, shingle)
    // universe, s_r = that round's argmax(gain, tiebreak doc_id);
    // the next universe drops every shingle the winner covers.
    // MATERIALIZED is load-bearing: s_r and a_{r+1} both reference
    // a_r, so inlined CTEs re-evaluate a1's subtree 2^7 times — the
    // unrolled chain must checkpoint each stage exactly like the
    // Spark side's per-round localCheckpoint.
    "q_select_coverage" -> {
      val stages = (1 to 8).map { r =>
        val src = if (r == 1) "toks" else s"a$r"
        val drop = if (r == 1) ""
        else
          s"""a$r AS MATERIALIZED (
             |  SELECT doc_id, tok FROM a${r - 1}
             |  WHERE tok NOT IN (
             |    SELECT t.tok FROM a${r - 1} t
             |    JOIN s${r - 1} USING (doc_id))),
             |""".stripMargin
        s"""$drop
           |s$r AS MATERIALIZED (
           |  SELECT CAST($r AS BIGINT) AS sel_round, doc_id,
           |    CAST(count(*) AS BIGINT) AS gain
           |  FROM $src GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1)""".stripMargin
      }
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |toks AS MATERIALIZED (SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(t) - 1),
         |      i -> array_to_string(t[i:i+2], ' '))) AS tok
         |  FROM tk),
         |a1 AS (SELECT doc_id, tok FROM toks),
         |${stages.mkString(",\n")}
         |SELECT sel_round, doc_id, gain,
         |  CAST(sum(gain) OVER (ORDER BY sel_round) AS BIGINT) AS covered_cum
         |FROM (${(1 to 8).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")})
         |ORDER BY sel_round""".stripMargin
    },

    // Unrolled halving: rung r ranks the survivors of rung r−1 (top
    // 16/2^r by mean milli-reward, config tiebreak).
    "q_sha_tuning" -> {
      def rung(r: Int, prevKeep: String): String =
        s"""r$r AS (
           |  SELECT m.rung, m.config, m.n_ev, m.metric_milli,
           |    CAST(row_number() OVER (ORDER BY m.metric_milli DESC, m.config) AS BIGINT) AS rk
           |  FROM m $prevKeep WHERE m.rung = $r)""".stripMargin
      s"""WITH lo_ AS (SELECT MIN(epoch_us(ts) // 86400000000) AS lo FROM events),
         |cells AS (
         |  SELECT user_id % 16 AS config,
         |    (epoch_us(ts) // 86400000000) - lo AS di,
         |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
         |  FROM events, lo_),
         |rc AS (
         |  SELECT r.rung, config, CAST(count(*) AS BIGINT) AS n_ev,
         |    CAST(SUM(vm) AS BIGINT) AS sv
         |  FROM cells, (VALUES (0), (1), (2), (3)) r(rung)
         |  WHERE di < CASE r.rung WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END
         |  GROUP BY 1, 2),
         |m AS (SELECT rung, config, n_ev, (sv * 1000) // n_ev AS metric_milli FROM rc),
         |${rung(0, "")},
         |k1 AS (SELECT config FROM r0 WHERE rk <= 8),
         |${rung(1, "JOIN k1 ON m.config = k1.config")},
         |k2 AS (SELECT config FROM r1 WHERE rk <= 4),
         |${rung(2, "JOIN k2 ON m.config = k2.config")},
         |k3 AS (SELECT config FROM r2 WHERE rk <= 2),
         |${rung(3, "JOIN k3 ON m.config = k3.config")}
         |SELECT rung, config, n_ev, metric_milli, rk FROM (
         |  SELECT * FROM r0 UNION ALL SELECT * FROM r1
         |  UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
         |ORDER BY rung, rk""".stripMargin
    },

    "q_bootstrap" -> {
      val tList = poissonCdfMicro.mkString("[", ",", "]")
      val hu = h("(doc_id * 37 + b)", A3, B3)
      s"""WITH bs AS (SELECT unnest(range(0, 32)) AS b),
         |wt AS (
         |  SELECT b, n_chars,
         |    CAST(len(list_filter($tList,
         |      t -> t <= ($hu) % 1000000)) AS BIGINT) AS w
         |  FROM documents, bs),
         |means AS (
         |  SELECT b,
         |    (CAST(SUM(w * n_chars) AS BIGINT) * 1000)
         |      // CAST(SUM(w) AS BIGINT) AS m_milli
         |  FROM wt GROUP BY b),
         |pt AS (
         |  SELECT (CAST(SUM(n_chars) AS BIGINT) * 1000)
         |    // CAST(count(*) AS BIGINT) AS point_milli FROM documents),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS b_resamples,
         |    list_sort(list(m_milli)) AS ms,
         |    CAST(SUM(m_milli) AS BIGINT) AS sm,
         |    CAST(SUM(m_milli * m_milli) AS BIGINT) AS sm2
         |  FROM means)
         |SELECT b_resamples, point_milli,
         |  ms[2] AS boot_lo_milli, ms[31] AS boot_hi_milli,
         |  b_resamples * sm2 - sm * sm AS var_num
         |FROM agg, pt""".stripMargin
    },
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${h("doc_id", A1, B1)} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h("doc_id", A1, B1)} % 100 <
         |  CASE WHEN lang = 'en' THEN 10 ELSE 40 END
         |ORDER BY doc_id""".stripMargin,

    "q_mixture" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h("doc_id", A1, B1)}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= CASE WHEN lang = 'en' THEN 40 ELSE 15 END
         |ORDER BY lang, doc_id""".stripMargin,

    "q_sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(floor(-ln((${h("doc_id", A2, B2)} + 1) / ${P + 1}.0)
         |             / n_chars * 1e9) AS BIGINT) AS key_nano
         |FROM documents
         |ORDER BY key_nano, doc_id LIMIT 100""".stripMargin,

    "q_train_shard" ->
      s"""SELECT doc_id, shard,
         |  row_number() OVER (PARTITION BY shard
         |    ORDER BY ${h("doc_id", A2, B2)}, doc_id) AS pos
         |FROM (SELECT doc_id, ${h("doc_id", A1, B1)} % $DefaultShards AS shard FROM documents)
         |ORDER BY shard, pos""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH packed AS (
         |  SELECT doc_id, n_chars,
         |    ${h("doc_id", A1, B1)} % $DefaultShards AS shard,
         |    ${h("doc_id", A2, B2)} AS h2
         |  FROM documents),
         |off AS (
         |  SELECT doc_id, shard, n_chars,
         |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY shard ORDER BY h2, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pack_offset
         |  FROM packed)
         |SELECT doc_id, shard, pack_offset,
         |  pack_offset // 4096 AS start_chunk,
         |  (pack_offset + n_chars - 1) // 4096 AS end_chunk
         |FROM off ORDER BY shard, pack_offset""".stripMargin,

    // ffdPlace replayed exactly: every shard advances one item per
    // recursion round, the bin-fills list is the carried state, and
    // the first-fit choice is the head of a list_filter — b NULL means
    // "open a new bin", n > cap means the oversize -1 sentinel.
    "q_pack_ffd" ->
      s"""WITH RECURSIVE items AS (
         |  SELECT doc_id, ${h("doc_id", A1, B1)} % $DefaultShards AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         |    row_number() OVER (PARTITION BY (${h("doc_id", A1, B1)} % $DefaultShards)
         |      ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS i
         |  FROM documents),
         |rec AS (
         |  SELECT shard, CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS fills,
         |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS bin, CAST(NULL AS BIGINT) AS n
         |  FROM (SELECT DISTINCT shard FROM items)
         |  UNION ALL
         |  SELECT shard, i,
         |    CASE WHEN n > 128 THEN fills
         |         WHEN b IS NULL THEN list_append(fills, n)
         |         ELSE list_transform(range(1, len(fills) + 1),
         |                j -> CASE WHEN j = b THEN fills[j] + n ELSE fills[j] END) END AS fills,
         |    doc_id,
         |    CASE WHEN n > 128 THEN -1 WHEN b IS NULL THEN CAST(len(fills) AS BIGINT)
         |         ELSE b - 1 END AS bin,
         |    n
         |  FROM (
         |    SELECT it.shard, it.i, r.fills, it.doc_id, it.n,
         |      list_filter(range(1, len(r.fills) + 1), j -> r.fills[j] + it.n <= 128)[1] AS b
         |    FROM rec r JOIN items it ON it.shard = r.shard AND it.i = r.i + 1))
         |SELECT doc_id, shard, bin AS bin_id, n AS n_tokens
         |FROM rec WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin,

    "q_rowid" ->
      """SELECT doc_id, lang, row_number() OVER (ORDER BY doc_id) - 1 AS row_id
        |FROM documents ORDER BY row_id""".stripMargin,

    "q_budget_cap" ->
      """WITH src AS MATERIALIZED (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
        |    CAST(count(*) AS BIGINT) AS n_src,
        |    CAST(SUM(tokens) AS BIGINT) // 2 AS budget
        |  FROM src),
        |ranked AS (
        |  SELECT source, tokens,
        |    CAST(row_number() OVER (ORDER BY tokens, source) AS BIGINT) AS rk,
        |    CAST(SUM(tokens) OVER (ORDER BY tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        |  FROM src),
        |cap AS (
        |  SELECT budget, n_src,
        |    COALESCE(MAX(CASE WHEN p + (n_src - rk) * tokens <= budget THEN rk END), 0) AS istar,
        |    COALESCE(MAX(CASE WHEN p + (n_src - rk) * tokens <= budget THEN p END), 0) AS pstar
        |  FROM ranked, tot GROUP BY budget, n_src),
        |capv AS (
        |  SELECT budget, n_src,
        |    CASE WHEN n_src > istar THEN (budget - pstar) // (n_src - istar) END AS cap_tokens
        |  FROM cap)
        |SELECT source, n_docs, tokens,
        |  LEAST(tokens, cap_tokens) AS allocated, cap_tokens, budget
        |FROM src, capv ORDER BY source""".stripMargin,

    "q_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
        |cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY pk),
        |pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS support
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= 3),
        |rules AS (
        |  SELECT p1 AS ante, p2 AS cons, support FROM pairs
        |  UNION ALL SELECT p2, p1, support FROM pairs)
        |SELECT ante, cons, support, ca.cnt AS n_ante,
        |  (support * 1000000) // ca.cnt AS conf_micro,
        |  (support * n_baskets * 1000000) // (ca.cnt * cb.cnt) AS lift_micro
        |FROM rules JOIN cnt ca ON ca.pk = rules.ante
        |  JOIN cnt cb ON cb.pk = rules.cons, nb
        |ORDER BY conf_micro DESC, ante, cons LIMIT 50""".stripMargin,

    // Direct triple join — support ≥ 3 on the triple implies all
    // sub-pairs frequent, so the A-priori prunes drop nothing.
    "q_freq_triples" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM items a
        |JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |JOIN items c ON b.ok = c.ok AND b.pk < c.pk
        |GROUP BY a.pk, b.pk, c.pk
        |HAVING count(*) >= 2
        |ORDER BY support DESC, p1, p2, p3""".stripMargin,

    "q_item_rec" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS MATERIALIZED (
        |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS support
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= 3),
        |sims AS MATERIALIZED (
        |  SELECT item, co_item, support FROM (
        |    SELECT item, co_item, support,
        |      row_number() OVER (PARTITION BY item
        |        ORDER BY support DESC, co_item) AS rn
        |    FROM (SELECT p1 AS item, p2 AS co_item, support FROM pairs
        |          UNION ALL SELECT p2, p1, support FROM pairs))
        |  WHERE rn <= 10),
        |owned AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS cust, l_partkey AS item
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |cand AS (
        |  SELECT o.cust, s.co_item AS rec_item,
        |    CAST(SUM(s.support) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM owned o JOIN sims s ON o.item = s.item
        |  GROUP BY o.cust, s.co_item),
        |fresh AS (
        |  SELECT c.* FROM cand c
        |  WHERE NOT EXISTS (SELECT 1 FROM owned o
        |                    WHERE o.cust = c.cust AND o.item = c.rec_item))
        |SELECT cust, rec_item, score, n_common, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY cust
        |    ORDER BY score DESC, rec_item) AS rk
        |  FROM fresh)
        |WHERE rk <= 3
        |ORDER BY cust, rk""".stripMargin,

    "q_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
        |FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY a.pk, b.pk
        |HAVING count(*) >= 3
        |ORDER BY support DESC, p1, p2""".stripMargin,

    "q_zorder" -> {
      val z = (0 until 16).map(i =>
        s"(((l_partkey >> $i) & 1) << ${2 * i}) + " +
          s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
      s"""SELECT l_partkey, l_suppkey, CAST($z AS BIGINT) AS zval
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         |ORDER BY zval""".stripMargin
    },

    "q_domain_cap" ->
      s"""SELECT doc_id, source, rn FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${h("doc_id", A2, B2)}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 10
         |ORDER BY source, rn""".stripMargin,

    "q_ttr" ->
      """SELECT doc_id, n_tokens, n_types, ttr,
        |  CAST(ttr >= 0.3 AS INT) AS keep
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS ttr
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_quality_tercile" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS bucket
        |  FROM scored)
        |SELECT doc_id, lang,
        |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_contamination_report" ->
      s"""WITH $ngSql,
         |hit AS (
         |  SELECT DISTINCT ng FROM ng WHERE doc_id % 23 != 0
         |  AND ng IN (SELECT ng FROM ng WHERE doc_id % 23 = 0))
         |SELECT e.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_ngrams,
         |  CAST(count(h.ng) AS BIGINT) AS n_hit,
         |  round(CAST(count(h.ng) AS DOUBLE) / count(*), 4) AS overlap
         |FROM (SELECT doc_id, ng FROM ng WHERE doc_id % 23 = 0) e
         |LEFT JOIN hit h ON e.ng = h.ng
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,

    "q_token_budget" ->
      """WITH slices AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, tokens,
        |  CAST(sum(tokens) OVER (PARTITION BY lang ORDER BY tokens DESC, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |  round(CAST(sum(tokens) OVER (PARTITION BY lang ORDER BY tokens DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / sum(tokens) OVER (PARTITION BY lang), 4) AS lang_share
        |FROM slices ORDER BY lang, cum_tokens""".stripMargin,

    "q_decontaminate" ->
      s"""WITH $ngSql,
         |contaminated AS (
         |  SELECT DISTINCT t.doc_id FROM ng t
         |  JOIN (SELECT DISTINCT ng FROM ng WHERE doc_id % 23 = 0) e ON t.ng = e.ng
         |  WHERE t.doc_id % 23 != 0)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id % 23 != 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |nl AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
        |SELECT t.lang, token, count(DISTINCT doc_id) AS df, count(*) AS tf,
        |  round(ln(n_docs / count(DISTINCT doc_id)), 4) AS idf,
        |  round(count(*) * ln(n_docs / count(DISTINCT doc_id)), 4) AS tfidf_mass
        |FROM tok t JOIN nl ON t.lang = nl.lang
        |GROUP BY t.lang, token, n_docs
        |HAVING count(DISTINCT doc_id) >= 10
        |ORDER BY t.lang, token""".stripMargin,

    "q_histogram" ->
      """SELECT least(n_chars // 64, 9) AS bucket, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_epoch_plan" ->
      """WITH g AS (
        |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang),
        |l AS (SELECT CAST(count(*) AS BIGINT) AS n_langs FROM g)
        |SELECT lang, tokens,
        |  100000 // n_langs AS target,
        |  least(((100000 // n_langs) * 1000000) // tokens, 4000000) AS epochs_micro,
        |  least(100000 // n_langs, 4 * tokens) AS effective,
        |  (100000 // n_langs) - least(100000 // n_langs, 4 * tokens) AS shortfall,
        |  (100000 // n_langs) > 4 * tokens AS constrained
        |FROM g, l ORDER BY lang""".stripMargin,

    "q_length_bucket" ->
      """WITH docs AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |g AS (SELECT max(n_tokens) AS max_len FROM docs),
        |b AS (
        |  SELECT ((n_tokens + 15) // 16) * 16 AS bucket_len,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |  FROM docs GROUP BY 1)
        |SELECT bucket_len, n_docs, sum_tokens,
        |  n_docs * bucket_len - sum_tokens AS pad_tokens,
        |  n_docs * max_len - sum_tokens AS naive_pad_tokens,
        |  ((n_docs * bucket_len - sum_tokens) * 1000000) // (n_docs * bucket_len) AS waste_micro
        |FROM b, g ORDER BY bucket_len""".stripMargin,

    "q_dp_response" -> {
      val hh = h("doc_id", A2, B2)
      val idx = "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2 " +
        "WHEN 'fr' THEN 3 ELSE 4 END"
      s"""WITH rep AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN ($hh) % 5 < 3 THEN lang
         |         ELSE (['de','en','es','fr','zh'])[
         |           CAST(($idx + 1 + (($hh) // 5) % 4) % 5 AS INT) + 1]
         |    END AS rep_lang
         |  FROM documents),
         |truec AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_true FROM rep GROUP BY lang),
         |repc AS (SELECT rep_lang AS lang, CAST(count(*) AS BIGINT) AS n_rep
         |         FROM rep GROUP BY rep_lang),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rep),
         |j AS (
         |  SELECT coalesce(truec.lang, repc.lang) AS lang,
         |    coalesce(n_true, 0) AS n_true, coalesce(n_rep, 0) AS n_rep
         |  FROM truec FULL OUTER JOIN repc ON truec.lang = repc.lang)
         |SELECT lang, n_true, n_rep,
         |  2000 * n_rep - 200 * n AS est_milli,
         |  2000 * n_rep - 200 * n - 1000 * n_true AS err_milli
         |FROM j, tot ORDER BY lang""".stripMargin
    },

    "q_shard_balance" ->
      s"""WITH s AS (
         |  SELECT ${h("doc_id", A1, B1)} % $DefaultShards AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
         |  FROM documents),
         |ps AS (
         |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM s GROUP BY shard),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_shards,
         |    CAST(sum(n_docs) AS BIGINT) AS tot_docs, CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |    CAST(max(n_tokens) AS BIGINT) AS max_tokens, CAST(min(n_tokens) AS BIGINT) AS min_tokens,
         |    CAST(max(n_docs) AS BIGINT) AS max_docs, CAST(min(n_docs) AS BIGINT) AS min_docs
         |  FROM ps)
         |SELECT shard, n_docs, n_tokens,
         |  (n_tokens * n_shards * 1000000) // tot_tokens AS load_micro,
         |  (max_tokens * n_shards * 1000000) // tot_tokens AS straggler_micro,
         |  (max_docs * 1000000) // min_docs AS doc_spread_micro,
         |  (max_tokens * 1000000) // min_tokens AS token_spread_micro
         |FROM ps, tot ORDER BY shard""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, source, md5(text) AS fp FROM documents),
        |neu AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev' ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, source, md5(text) AS fp
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT coalesce(old.source, neu.source) AS source,
        |  CASE WHEN old.fp IS NULL THEN 'added'
        |       WHEN neu.fp IS NULL THEN 'removed'
        |       WHEN old.fp = neu.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM old FULL OUTER JOIN neu USING (doc_id)
        |GROUP BY 1, 2 ORDER BY source, status""".stripMargin,

    "q_manifest" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 16),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 2147483647) % 2147483647 AS BIGINT) AS content_sig
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_jackknife" ->
      """WITH blocks AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS x_b
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS bb, CAST(sum(n_b) AS BIGINT) AS nn,
        |    CAST(sum(x_b) AS BIGINT) AS tt
        |  FROM blocks),
        |loo AS (
        |  SELECT bb, nn, tt, ((tt - x_b) * 1000000) // (nn - n_b) AS m_i
        |  FROM blocks, tot),
        |mbar AS (
        |  SELECT bb, nn, tt, CAST(sum(m_i) AS BIGINT) // bb AS m_bar
        |  FROM loo GROUP BY bb, nn, tt)
        |SELECT nn AS n_docs, bb AS n_blocks,
        |  (tt * 1000000) // nn AS mean_micro,
        |  ((bb - 1) * CAST(sum((m_i - m_bar) * (m_i - m_bar)) AS BIGINT)) // bb AS jk_var_micro2
        |FROM loo JOIN mbar USING (bb, nn, tt)
        |GROUP BY bb, nn, tt""".stripMargin,

    "q_dataset_card" ->
      """WITH t AS (
        |  SELECT lang, source, md5(text) AS fp,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(len(text) AS BIGINT) AS nc
        |  FROM documents),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
        |    CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(sum(CASE WHEN nt < 5 OR nt > 120 THEN 1 ELSE 0 END) AS BIGINT) AS n_gated
        |  FROM t)
        |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources,
        |  ((n_docs - n_unique) * 1000000) // n_docs AS dup_micro,
        |  (n_tokens * 1000000) // n_docs AS mean_tokens_micro,
        |  (n_gated * 1000000) // n_docs AS gated_micro
        |FROM g""".stripMargin,

    "q_dp_histogram" -> {
      val idx = "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2 " +
        "WHEN 'fr' THEN 3 ELSE 4 END"
      s"""WITH hist AS (
         |  SELECT lang,
         |    ((CAST(len(string_split(text, ' ')) AS BIGINT) + 15) // 16) * 16 AS bucket_len,
         |    CAST(count(*) AS BIGINT) AS n_true
         |  FROM documents GROUP BY 1, 2),
         |keyed AS (
         |  SELECT lang, bucket_len, n_true,
         |    ${h(s"(bucket_len * 7 + $idx)", A2, B2)} AS h
         |  FROM hist),
         |noised AS (
         |  SELECT lang, bucket_len, n_true,
         |    CASE WHEN (h & 1) = 1 THEN 1 ELSE -1 END AS sign,
         |    CAST(bit_count(((~(h // 2)) & ((h // 2) + 1)) - 1) AS BIGINT) AS mag
         |  FROM keyed)
         |SELECT lang, bucket_len, n_true, sign * mag AS noise,
         |  n_true + sign * mag AS n_noisy
         |FROM noised ORDER BY lang, bucket_len""".stripMargin
    },

    "q_curriculum" ->
      """WITH ranked AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(row_number() OVER (ORDER BY len(string_split(text, ' ')), doc_id)
        |         AS BIGINT) AS rk
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
        |ph AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n_eligible,
        |    CAST(sum(nt) AS BIGINT) AS tokens_eligible,
        |    CAST(max(nt) AS BIGINT) AS frontier_tokens
        |  FROM ranked, n, (SELECT unnest(range(1, 5)) AS t)
        |  WHERE 4 * rk <= t * n
        |  GROUP BY t)
        |SELECT t, CAST(t AS BIGINT) * 250000 AS competence_micro,
        |  n_eligible, tokens_eligible, frontier_tokens,
        |  n_eligible - coalesce(lag(n_eligible, 1) OVER (ORDER BY t), 0) AS n_new,
        |  tokens_eligible - coalesce(lag(tokens_eligible, 1) OVER (ORDER BY t), 0) AS tokens_new
        |FROM ph ORDER BY t""".stripMargin,

    // The capstone: every stage of q_corpus_e2e replayed in one CTE
    // chain — same corpus, same hashes, same order of operations.
    "q_corpus_e2e" ->
      s"""WITH ${NearDup.corpusSql},
         |${NearDup.shinglesSql},
         |${NearDup.hshSql},
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |quality AS (SELECT doc_id, text, lang FROM corpus WHERE length(text) >= 64),
         |exact AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |near AS (
         |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT b_id FROM pairs)),
         |ngall AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS ng
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
         |evalng AS (SELECT DISTINCT ng FROM ngall WHERE doc_id % 23 = 0),
         |cand AS (SELECT * FROM near WHERE doc_id % 23 != 0),
         |contaminated AS (
         |  SELECT DISTINCT n.doc_id
         |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS ng
         |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM cand)) n
         |  JOIN evalng e ON n.ng = e.ng),
         |clean AS (
         |  SELECT * FROM cand
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
         |SELECT doc_id, lang, ${h("doc_id", A2, B2)} % $DefaultShards AS shard
         |FROM clean
         |WHERE ${h("doc_id", A1, B1)} % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 80 END
         |ORDER BY doc_id""".stripMargin
  )
}

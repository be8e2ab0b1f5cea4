package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection (SURVEY §2.6 Q-dedup-near + north-star):
  * exact n-gram Jaccard, MinHash + banded LSH, SimHash, and
  * embedding-cosine near-dup — each fully deterministic (hashes derive
  * from md5, not a seeded RNG) so DuckDB replays them bit-for-bit.
  *
  * The fixture corpus has no real near-dups, so every query builds
  * `corpus = documents ∪ perturbed copies` (id + 1_000_000): dropping
  * the last token (text) or adding 0.01 per dimension (embeddings).
  * The planted pairs are what the detectors must find.
  *
  * Scale posture (100 TB):
  *  - signatures (minhash/simhash) are computed per-row with
  *    higher-order expressions — a map-only pass, no explode of the
  *    (doc × shingle × hash) space through a shuffle.
  *  - candidate generation shuffles only (band_idx, band_signature,
  *    doc_id) — bytes per doc, not the document text.
  *  - the exact-Jaccard join is blocked on (lang, source) — the
  *    classic blocking-key trick; at 100 TB the block key must bound
  *    the quadratic term, and the LSH band join is the unblocked
  *    alternative.
  *  - the O(n²) embedding join is blocked on label; the LSH bucket
  *    path in SimSearch is the unblocked form.
  */
object NearDup {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val NumHashes = 12
  private[graft] val Bands = 4
  private[graft] val Rows = 3 // NumHashes / Bands

  /** documents ∪ near-duplicate copies (last token dropped). */
  def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"), col("source"))
    val dup = docs.filter(col("doc_id") % 5 === 0).selectExpr(
      "doc_id + 1000000 AS doc_id",
      "array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ') AS text",
      "lang", "source")
    docs.unionByName(dup)
  }

  private[operators] val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string((string_split(text, ' '))[1:len(string_split(text, ' ')) - 1], ' ') AS text,
      |    lang, source
      |  FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  /** Distinct word-3-gram shingles — map-only, via the native
    * [[graft.functions.WordShingles]] expression (the HOF composition
    * ran interpreted and dominated the whole near-dup pipeline).
    */
  def withShingles(df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.withColumn("shingles", expr("word_shingles(text, 3)"))
  }

  /** Same shingle set, hashed to 60-bit ints for cheap pairwise set
    * ops ([[graft.functions.WordShingleHashes]]).
    */
  def withHashedShingles(df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.withColumn("hs", expr("word_shingle_hashes(text, 3)"))
  }

  private[operators] val shinglesSql =
    """sh AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
      |  FROM (SELECT *, string_split(text, ' ') AS toks FROM corpus))""".stripMargin

  /** MinHash signatures over the hashed shingle sets:
    * sig[j] = min over h ∈ hs of ((a_j · (h mod p) + b_j) mod p),
    * the classic universal hash family with p = 2³¹−1 and
    * deterministic md5-derived coefficients a_j, b_j ∈ [1, p−1].
    *
    * Earlier this hashed every *string* shingle NumHashes times with
    * md5 — 12 digests per shingle dominated the whole minhash stage.
    * The universal family reuses the one 60-bit content hash the
    * pipeline already computes (WordShingleHashes) and replaces each
    * digest with three integer ops; products stay < 2⁶² so neither
    * engine can overflow (DuckDB errors on BIGINT overflow rather than
    * wrapping, so this bound is load-bearing for the oracle).
    *
    * Spark plan: explode hs → NumHashes codegen'd integer columns →
    * one partial+final hash aggregate of NumHashes min(bigint)s.
    * Integer buffers keep the aggregate on HashAggregate's mutable
    * fast path, and the shuffle carries NumHashes longs per doc —
    * signature bytes, never document text. The coefficients are plan
    * literals, replayed verbatim in the oracle SQL, so signatures
    * match bit-for-bit.
    */
  private val P = 2147483647L // 2^31 − 1, prime

  /** Deterministic coefficient in [1, P−1] from md5("which:j") —
    * engine-neutral constants baked into both plans as literals. */
  private def hashParam(j: Int, which: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$which:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L; var b = 0
    while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
    (v >>> 4) % (P - 1) + 1
  }

  def signaturesOf(hsh: DataFrame): DataFrame = {
    val mins = (0 until NumHashes).map { j =>
      val a = hashParam(j, "a"); val b = hashParam(j, "b")
      min(expr(s"($a * (h % $P) + $b) % $P")).as(s"m$j")
    }
    hsh.select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(j => col(s"m$j")): _*).as("sigs"))
  }

  private def sigSql: String = (0 until NumHashes).map { j =>
    val a = hashParam(j, "a"); val b = hashParam(j, "b")
    s"list_aggregate(list_transform(hs, h -> ($a * (h % $P) + $b) % $P), 'min')"
  }.mkString("[", ", ", "]")

  /** The [[signaturesOf]] MinHash signature computed MAP-ONLY per row
    * (`array_min(transform(hs, …))` instead of explode + aggregate) —
    * same universal-hash family, same md5-derived constants, so
    * signatures are identical to the batch form. The batch pipeline
    * keeps the aggregate form (codegen'd, map-side partials beat the
    * interpreted HOF at corpus scale); this row form exists for the
    * STREAMING ingest guard (graft.streaming.DocStreams), where the
    * signature must come out of a stateless projection — no shuffle,
    * no aggregation state — before the watermarked dedup/state op,
    * and per-row rates are source-bounded. Docs too short to shingle
    * (< 3 tokens) get an empty `hs` and NULL signature entries —
    * callers filter or pass them through unpaired.
    */
  def withRowSignatures(df: DataFrame): DataFrame = {
    val sig = (0 until NumHashes).map { j =>
      val a = hashParam(j, "a"); val b = hashParam(j, "b")
      s"array_min(transform(hs, h -> ($a * (h % $P) + $b) % $P))"
    }.mkString("array(", ", ", ")")
    withHashedShingles(df).withColumn("sigs", expr(sig))
  }

  /** 32-bit SimHash, bit-majority voted — all integer math, so both
    * engines agree exactly.
    *
    * Spark plan: explode distinct tokens → one codegen'd
    * `conv(md5-prefix)` hash per token → 32 `sum(±1)` bit votes with
    * map-side partial aggregation → assemble the signature in a single
    * projection. Higher-order-function lambdas run interpreted (no
    * whole-stage codegen), so the nested-fold formulation was ~30×
    * slower; this shape keeps every operator codegen'd and shuffles
    * only (doc_id, 32 longs) per document.
    *
    * DuckDB replays the same math with list folds (fast enough there);
    * `conv(hex, 16, 10)` ≡ the explicit base-16 digit fold, and
    * `0*16 + d1 == d1` makes DuckDB's first-element list_reduce init
    * match, so signatures are bit-identical.
    */
  def simhashed(df: DataFrame): DataFrame = {
    val votes = (0 until 32).map(k =>
      sum(when(expr(s"(shiftright(h, $k) & 1) = 1"), 1).otherwise(-1)).as(s"b$k"))
    val assemble = (0 until 32).map(k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    df.select(col("doc_id"), col("lang"),
        explode(expr("array_distinct(split(text, ' '))")).as("t"))
      .withColumn("h", expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), col("lang"), assemble.as("simhash"))
  }

  private val tokHashSql =
    """list_transform(list_distinct(string_split(text, ' ')), t ->
      |  list_reduce(list_transform(range(1, 9),
      |    i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)),
      |    (a, b) -> a * 16 + b))""".stripMargin

  private val simhashSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), k ->
      |  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(hs, h -> CASE WHEN (h >> k) & 1 = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
      |         (a, b) -> a + b) > 0
      |       THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)),
      |  (a, b) -> a + b)""".stripMargin

  /** DuckDB twin of WordShingleHashes: 15-hex-digit md5 prefix folded
    * base-16 — bit-identical to the Spark expression's top-60-bits.
    */
  private[operators] val hshSql =
    """hsh AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_transform(shingles,
      |      s -> list_reduce(list_transform(range(1, 16),
      |        i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
      |        (a, b) -> a * 16 + b))) AS hs
      |  FROM sh)""".stripMargin

  private def dotD(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"

  /** Verified jaccard >= 0.6 near-dup pairs (a_id < b_id, jaccard
    * unrounded) — the subquadratic PPJoin pipeline shared by
    * q_dedup_jaccard (which reports the pairs) and q_dedup_cluster
    * (which treats them as edges).
    */
  def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = withHashedShingles(corpus(s, d))
      .select(col("doc_id"), col("lang"), col("source"), col("hs"),
        size(col("hs")).as("ns"))
    val pre = sh.select(col("doc_id"), col("lang"), col("source"),
      explode(expr("slice(hs, 1, ns - ((3*ns + 4) div 5) + 1)")).as("tok"))
    val cand = pre.as("x").join(pre.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val ha = sh.select(col("doc_id").as("a_id"), col("hs").as("ha"), col("ns").as("na"))
    val hb = sh.select(col("doc_id").as("b_id"), col("hs").as("hb"), col("ns").as("nb"))
    cand.join(ha, "a_id").join(hb, "b_id")
      .filter(least(col("na"), col("nb")) >= greatest(col("na"), col("nb")) * 0.6)
      .withColumn("jaccard", expr("jaccard_sorted(ha, hb)"))
      .filter(col("jaccard") >= 0.6)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Connected-component labels (doc_id → min doc_id of its component)
    * over the verified jaccard edges, via the alternating large-star /
    * small-star engine ([[Graph.alternatingStar]], Kiveris et al.
    * 2014) — O(log² n) rounds REGARDLESS of component diameter, where
    * the previous min-label propagation needed O(diameter) rounds each
    * with a driver-side convergence probe (a long re-post chain on a
    * web-scale dup graph made that the slow path).
    *
    * Driver-action budget — the 100 TB contract this rebase exists
    * for: chunks of round pairs run as single unrolled linear lineages
    * with NO per-round actions (one localCheckpoint per chunk cuts the
    * candidate-pipeline lineage), and convergence is asserted by ONE
    * star-shape probe per chunk ([[Graph.starConverged]]). The chunk
    * schedule is GEOMETRIC — 3, 6, 12, … round pairs — because the
    * round count a graph NEEDS is its effective depth, not ⌈log₂ n⌉:
    * near-dup components are almost always shallow (a dup cluster's
    * diameter is small even when n is huge), so the steady state pays
    * 3 pairs + one probe, while an adversarial long-chain graph grows
    * into its O(log² n) worst case within a constant factor (the
    * geometric sum is ≤ 2× the final chunk) using O(log log) probes.
    * A fixed ⌈log₂ n⌉-sized first chunk — the previous policy — made
    * every corpus pay the worst case up front: ~14 unrolled round
    * pairs (28 shuffle stages) at sf0.1 where 3 suffice, a measured
    * 5× on q_dedup_cluster.
    *
    * The labels are memoized per (session, dir) via [[CachedRelation]]
    * (the tradeBase pattern, 1 h TTL): q_dedup_cluster and
    * q_dedup_canonical both consume them, and at 100 TB the pair
    * generation + CC is far too expensive to run twice for two views
    * of the same clustering. Determinism: the frame is a pure function
    * of the inputs (literal-seeded hashes, deterministic star rounds),
    * so memoization cannot change any result.
    * Only docs touching an edge appear; singletons are the caller's
    * left-join + coalesce.
    */
  private[graft] val clusterLabelCache = new CachedRelation(ttlMillis = 3600L * 1000)

  def clusterLabels(s: SparkSession, d: String): DataFrame =
    clusterLabelCache.resolve(s"${System.identityHashCode(s)}:$d") {
      val e = jaccardPairs(s, d)
        .select(col("a_id").as("u"), col("b_id").as("v"))
        .ckpt() // consumed by round 1 and the node catalog
      var chunk = 3
      var total = 0
      var star = Graph.alternatingStar(e, chunk).ckpt()
      total += chunk
      var converged = Graph.starConverged(star)
      while (!converged && total < 96) {
        chunk *= 2
        star = Graph.alternatingStar(star, chunk).ckpt()
        total += chunk
        converged = Graph.starConverged(star)
      }
      require(converged,
        s"connected components did not converge in $total round pairs")
      val nodes = e.select(explode(array(col("u"), col("v"))).as("doc_id")).distinct()
      nodes
        .join(star.select(col("u").as("doc_id"), col("v").as("root")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    }

  val queries: Map[String, Q] = Map(
    // Exact n-gram Jaccard over (lang, source)-blocked pairs. The
    // naive form is the quadratic all-pairs join within each block —
    // the thing that does NOT survive a 100× scale-up. This plan is
    // result-identical but subquadratic, via prefix filtering from the
    // set-similarity-join literature (SSJoin/PPJoin):
    //
    //   J(a,b) >= t  ⟹  |a∩b| >= ceil(t·|a|) and >= ceil(t·|b|)
    //   (because |∪| >= max(|a|,|b|)), and two sorted sets with
    //   overlap >= α must share an element within their first
    //   (n − α + 1) elements under any global total order.
    //
    // WordShingleHashes emits hashes sorted ascending — that order IS
    // the global order, so the prefix is a plain array slice. The
    // candidate join keys on (block, prefix-token): docs pair up only
    // if they share a rare leading hash, collapsing the block²
    // pair space to near the true-duplicate count. ceil(0.6·n) is
    // computed in exact integer arithmetic ((3n+4) div 5) — a float
    // ceil could round up past the true bound and drop a real pair.
    // Verification of the surviving candidates uses the fused
    // O(|a|+|b|) merge (SortedJaccard); the size-ratio prune
    // (min/max >= t, another necessary condition) runs first on the
    // already-available lengths.
    "q_dedup_jaccard" -> ((s, d) =>
      jaccardPairs(s, d)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))),

    // CONTAINMENT near-dup (set-containment join) — the asymmetric
    // case Jaccard structurally misses: a short doc quoted inside a
    // long one has |∩|/|∪| ≈ |S|/|L| (arbitrarily low) but
    // |∩|/min(|S|,|L|) ≈ 1. ExactSubstr-style span dedup catches
    // verbatim quotes; this catches shuffled/partial containment at
    // the shingle-set level. Candidate generation is the containment
    // variant of the PPJoin prefix filter: containment ≥ t forces the
    // SMALLER set to overlap the pair by ⌈t·|S|⌉, so S must share an
    // element within its first |S| − ⌈t·|S|⌉ + 1 sorted elements —
    // but the larger side admits no prefix bound, so the probe's
    // prefix joins an inverted index of ALL tokens (the asymmetric
    // index/probe shape of the containment-join literature). Keyed on
    // (lang, source, token); candidate volume is bounded by the
    // posting lists of the probe's rare leading hashes. ⌈0.9n⌉ is
    // exact-integer ((9n+9) div 10); verify = array_intersect on the
    // candidate pairs only; ns ≥ 1 guards stated on both sides (the
    // min(|S|,|L|) division must never see 0).
    "q_dedup_contain" -> ((s, d) => {
      val sh = withHashedShingles(corpus(s, d))
        .select(col("doc_id"), col("lang"), col("source"), col("hs"),
          size(col("hs")).as("ns"))
        .filter(col("ns") >= 1)
      val probe = sh.select(col("doc_id"), col("lang"), col("source"), col("ns"),
        explode(expr("slice(hs, 1, ns - ((9*ns + 9) div 10) + 1)")).as("tok"))
      val index = sh.select(col("doc_id").as("b_doc"), col("lang"), col("source"),
        col("ns").as("b_ns"), explode(col("hs")).as("tok"))
      val cand = probe.join(index, Seq("lang", "source", "tok"))
        .filter(col("doc_id") =!= col("b_doc") && col("ns") <= col("b_ns"))
        .select(least(col("doc_id"), col("b_doc")).as("a_id"),
          greatest(col("doc_id"), col("b_doc")).as("b_id"))
        .distinct()
      val ha = sh.select(col("doc_id").as("a_id"), col("hs").as("ha"), col("ns").as("na"))
      val hb = sh.select(col("doc_id").as("b_id"), col("hs").as("hb"), col("ns").as("nb"))
      cand.join(ha, "a_id").join(hb, "b_id")
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
        .withColumn("small_n", least(col("na"), col("nb")).cast("long"))
        .withColumn("contain_micro", expr("(inter * 1000000) DIV small_n"))
        .filter(col("contain_micro") >= 900000L)
        .withColumn("jaccard", round(expr("jaccard_sorted(ha, hb)"), 4))
        .select(col("a_id"), col("b_id"), col("inter"), col("small_n"),
          col("contain_micro"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Sorted-neighborhood dedup (Hernández & Stolfo 1995 — the
    // merge/purge blocking classic, the fourth candidate-generation
    // family next to prefix-filter/LSH-band/SimHash-chunk): sort each
    // (lang, source) block by TEXT — a near-dup that shares a long
    // prefix sorts adjacent; the planted mirrors drop only the final
    // token, the SNM-favorable case — then exact-verify only pairs
    // within rank distance W=8 of the sorted order. Window pairing
    // reuses the SemDeDup pigeonhole: a rank-block join on
    // (lang, source, block) enumerates ≤ 2W candidates per doc, so the
    // whole pass is O(n·W) — never a block². (SNM trades recall for
    // a sort instead of a signature index: dups that differ early in
    // the sort key are missed — the documented limitation.)
    "q_dedup_snm" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val W = 8
      val ranked = withHashedShingles(corpus(s, d))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lang"), col("source"))
            .orderBy(col("text"), col("doc_id"))))
      val probe = ranked.withColumn("blk", expr(s"(rnk - 1) div $W"))
        .select(col("lang"), col("source"), col("blk"), col("doc_id"), col("hs"), col("rnk"))
      val index = ranked.select(col("lang"), col("source"),
          col("doc_id").as("b_doc"), col("hs").as("hb"), col("rnk").as("b_rnk"))
        .withColumn("blk",
          explode(expr(s"array((b_rnk - 1) div $W, (b_rnk - 1) div $W + 1)")))
      probe.join(index, Seq("lang", "source", "blk"))
        .filter(col("b_rnk") < col("rnk") && col("rnk") - col("b_rnk") <= W)
        .withColumn("jaccard", expr("jaccard_sorted(hs, hb)"))
        .filter(col("jaccard") >= 0.6)
        .select(least(col("doc_id"), col("b_doc")).as("a_id"),
          greatest(col("doc_id"), col("b_doc")).as("b_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Edit-distance near-dup — the character-level verifier the
    // merge/purge literature pairs with sorted-neighborhood blocking
    // (typo-grade duplicates that token-set Jaccard misses: one
    // transposed word is a 2-token symmetric difference but a 2-edit
    // string). Same SNM candidate generator as q_dedup_snm (per-(lang,
    // source) sort, rank-block join, window W=8 ⇒ ≤2W candidates/doc);
    // the verify is built-in levenshtein over the 64-char PREFIX —
    // capping the operand bounds the O(len²) DP per pair, the standard
    // guard that keeps edit-distance verification affordable at scale
    // (a prefix mismatch implies a body mismatch for the clone-with-
    // edits duplicates this targets; documented recall tradeoff).
    "q_dedup_edit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // installs RewriteBoundedLevenshtein: the edit <= 16 verify takes
      // the banded threshold form (result-identical; see the rule's
      // scaladoc + VectorExpressionsSpec equivalence pins)
      graft.functions.VectorFunctions.register(s)
      val W = 8
      val ranked = corpus(s, d)
        .withColumn("pfx", expr("substring(text, 1, 64)"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lang"), col("source"))
            .orderBy(col("text"), col("doc_id"))))
        .select(col("lang"), col("source"), col("doc_id"), col("pfx"), col("rnk"))
      val probe = ranked.withColumn("blk", expr(s"(rnk - 1) div $W"))
      val index = ranked.select(col("lang"), col("source"),
          col("doc_id").as("b_doc"), col("pfx").as("b_pfx"), col("rnk").as("b_rnk"))
        .withColumn("blk",
          explode(expr(s"array((b_rnk - 1) div $W, (b_rnk - 1) div $W + 1)")))
      probe.join(index, Seq("lang", "source", "blk"))
        .filter(col("b_rnk") < col("rnk") && col("rnk") - col("b_rnk") <= W)
        .withColumn("edit", levenshtein(col("pfx"), col("b_pfx")))
        .filter(col("edit") <= 16)
        .select(least(col("doc_id"), col("b_doc")).as("a_id"),
          greatest(col("doc_id"), col("b_doc")).as("b_id"),
          col("edit"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // WINNOWING-based near-dup candidates (Schleimer et al. 2003 —
    // the plagiarism-detection/MOSS candidate family, the FIFTH
    // independent generator next to prefix-filter / LSH-band /
    // SimHash-chunk / sorted-neighborhood): per doc, the winnowed
    // fingerprint selection (min hash of each window of W=4
    // consecutive 8-token-gram hashes — q_winnowing's selection over
    // the dup-planted corpus), then candidate pairs = docs sharing a
    // selected fingerprint, exact-Jaccard verified ≥ 0.6. The coverage
    // theorem makes this generator's recall STRUCTURAL: any two docs
    // sharing ≥ K+W−1 = 11 consecutive tokens are guaranteed a common
    // selected fingerprint — a positional guarantee the set-sampling
    // families can only provide probabilistically.
    //
    // Scale posture: selections are map-only; the candidate join is
    // keyed on the 60-bit fingerprint and pruned by a stop-fingerprint
    // df-cap (df ≤ 100 — a boilerplate fingerprint shared by k docs
    // would emit k² pairs; the q_sparse_knn stop-feature / block-max
    // rationale, a no-op on the fixture); verify touches candidate
    // pairs only, via the fused O(|a|+|b|) sorted merge.
    "q_dedup_winnow" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val K = 8; val W = 4; val DfCap = 100
      // persist the gram-hash frame BEFORE the winnowing transform:
      // otherwise predicate pushdown rewrites the downstream size
      // filters in terms of word_window_hashes and re-evaluates the
      // md5 gram hashing (and the whole winnowing HOF) per row INSIDE
      // the scan's data filters, interpreted outside codegen — a
      // measured 7 s where the materialized form takes 0.9 s at sf0.1.
      val wh = corpus(s, d)
        .selectExpr("doc_id", s"word_window_hashes(text, $K) AS wh")
        .persist()
      val sel = wh
        .filter(size(col("wh")) >= W)
        // greatest() guard: predicate pushdown substitutes wh through
        // this projection into the scan's data filters, where rows
        // with size(wh) < W are still evaluated — and sequence(1, 0)
        // DESCENDS in Spark, so i = 0 would crash slice. The filter
        // still governs which rows survive.
        .selectExpr("doc_id",
          s"array_distinct(transform(sequence(1, greatest(size(wh) - ${W - 1}, 1)), i -> array_min(slice(wh, i, $W)))) AS sel")
        .select(col("doc_id"), explode(col("sel")).as("fp"))
        // persist the fingerprint-grain rows (KB per thousand docs):
        // three consumers (df prune + both self-join sides) would each
        // re-run the md5 gram hashing otherwise — worse, pushdown
        // rewrites the size filters in terms of word_window_hashes and
        // re-evaluates the whole winnowing transform INSIDE the scan's
        // data filters (a measured 15 s → 2 s at sf0.1)
        .persist()
      val rare = sel.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap).select(col("fp"))
      val posting = sel.join(rare, "fp")
      val pairs = posting.as("x").join(posting.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
      val hsh = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      pairs
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("jaccard", expr("jaccard_sorted(ha, hb)"))
        .filter(col("jaccard") >= 0.6)
        .select(col("a_id"), col("b_id"), col("n_shared"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Empirical RECALL/PRECISION of q_dedup_edit's 64-char-prefix
    // verifier against the FULL-text levenshtein ground truth — the
    // q_dedup_recall self-evaluation applied to the edit-distance
    // family: the prefix cap bounds the O(len²) DP per pair (the
    // scale guard), and this query measures what that cap costs. Over
    // the SAME SNM candidate set (rank-block W=8), count pairs the
    // full-text verdict admits (edit ≤ 16), pairs the prefix verdict
    // admits, and their overlap; recall in exact micro-units
    // (greatest(full_n, 1) guards the all-clean corpus). The full-text
    // arm deliberately ships text pairs through the join — it is the
    // EVALUATION ground truth, the one place that cost is the point;
    // at 100 TB this runs on a calibration sample, exactly like
    // q_dedup_recall's exact-truth arm.
    "q_edit_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // both hit predicates take the banded threshold form (the
      // full-text one especially: 16·len vs len² per pair)
      graft.functions.VectorFunctions.register(s)
      val W = 8
      val ranked = corpus(s, d)
        .withColumn("pfx", expr("substring(text, 1, 64)"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lang"), col("source"))
            .orderBy(col("text"), col("doc_id"))))
        .select(col("lang"), col("source"), col("doc_id"),
          col("text"), col("pfx"), col("rnk"))
      val probe = ranked.withColumn("blk", expr(s"(rnk - 1) div $W"))
      val index = ranked.select(col("lang"), col("source"),
          col("doc_id").as("b_doc"), col("text").as("b_text"),
          col("pfx").as("b_pfx"), col("rnk").as("b_rnk"))
        .withColumn("blk",
          explode(expr(s"array((b_rnk - 1) div $W, (b_rnk - 1) div $W + 1)")))
      probe.join(index, Seq("lang", "source", "blk"))
        .filter(col("b_rnk") < col("rnk") && col("rnk") - col("b_rnk") <= W)
        .withColumn("pfx_hit", levenshtein(col("pfx"), col("b_pfx")) <= 16)
        .withColumn("full_hit", levenshtein(col("text"), col("b_text")) <= 16)
        .agg(count(lit(1)).as("cand_n"),
          sum(when(col("full_hit"), 1L).otherwise(0L)).as("full_n"),
          sum(when(col("pfx_hit"), 1L).otherwise(0L)).as("pfx_n"),
          sum(when(col("pfx_hit") && col("full_hit"), 1L).otherwise(0L)).as("tp"))
        .withColumn("recall_micro", expr("(tp * 1000000) DIV greatest(full_n, 1)"))
    }),

    // Dedup clustering: near-dup PAIRS are not a dedup decision — a
    // training pipeline must group transitively-connected docs into
    // components and keep one canonical per component. Connected
    // components over the verified jaccard edges ride the alternating
    // large-star/small-star engine (Graph.alternatingStar — the same
    // O(log² n)-round machinery as q_concomp), with the round budget
    // derived from ONE upfront edge count and convergence asserted by
    // one star-shape probe per chunk — see clusterLabels for the
    // driver-action contract. The fixpoint label (component min) is
    // identical to what min-label propagation converges to, so the
    // transitive-closure oracle is unchanged.
    "q_dedup_cluster" -> ((s, d) =>
      clusterLabels(s, d)
        .withColumn("canonical", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id"))),

    // Canonical selection — the dedup ENDGAME: pairs → components →
    // exactly one survivor per component. Every corpus doc gets its
    // component label (docs with no near-dup edge are their own
    // singleton component via the left join + coalesce), then one
    // window per component keeps the best doc — longest text, doc_id
    // as the deterministic tiebreak. At 100 TB this is one join
    // against the (tiny) label table plus one shuffle on cluster_id;
    // the window state is one row per component.
    "q_dedup_canonical" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = corpus(s, d).selectExpr("doc_id", "length(text) AS n_chars")
      val full = docs.join(clusterLabels(s, d), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      full.withColumn("rn", row_number().over(w))
        .withColumn("keep", col("rn") === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // MinHash + banded LSH: candidates from band-signature equality,
    // then exact-Jaccard verification of candidates only.
    "q_dedup_minhash" -> ((s, d) => {
      val hsh = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      // The signature table is consumed 2× (band self-join) and the
      // hashed shingles 2× (verify join). At 100 TB a production run
      // persists both (signatures are ~100 bytes/doc vs re-reading the
      // raw text); here they stay unpersisted — a query lambda has no
      // lifecycle hook to unpersist, and leaking cache entries into
      // the caller's long-lived session is worse than the recompute.
      // size(hs) >= 1 guard: signaturesOf's explode drops empty-shingle
      // docs implicitly, but the oracle's sig CTE keeps them with NULL
      // sigs (banding to '' and colliding with each other) — so the
      // filter is stated EXPLICITLY on both sides; symmetry is visible,
      // not incidental.
      val sig = signaturesOf(hsh.filter(size(col("hs")) >= 1))
      val bands = sig
        .select(col("doc_id"), explode(expr(s"sequence(0, ${Bands - 1})")).as("b"), col("sigs"))
        .withColumn("bs", expr(s"concat_ws('|', slice(sigs, b * $Rows + 1, $Rows))"))
        .select(col("doc_id"), col("b"), col("bs"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bs") === col("y.bs")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("jaccard", expr("jaccard_sorted(ha, hb)"))
        .filter(col("jaccard") >= 0.6)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // MINHASH ESTIMATOR ERROR — how far the 12-hash signature's
    // Jaccard estimate (matching positions / 12) sits from the exact
    // shingle Jaccard, per candidate pair, bucketed into a signed
    // error histogram. This is the sketch-quality audit that justifies
    // (or resizes) NumHashes: E[est] = J with σ = √(J(1−J)/12) ≈ 0.14,
    // so the histogram should mass near 0 with that spread — a broken
    // hash family or band wiring shows up as bias, which no
    // recall-style check (q_dedup_recall) can see. Integer end to end:
    // est_micro = matches·10⁶ DIV 12, exact_micro = |∩|·10⁶ DIV |∪|,
    // bucket = (est − exact + 10⁶) DIV 10⁵ (offset keeps the
    // truncating division on non-negatives). Candidates from the same
    // banded join — signatures shuffle, text never does; the histogram
    // aggregate is bucket-grain.
    "q_minhash_est" -> ((s, d) => {
      val hsh = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      val sig = signaturesOf(hsh.filter(size(col("hs")) >= 1))
      val bands = sig
        .select(col("doc_id"), explode(expr(s"sequence(0, ${Bands - 1})")).as("b"), col("sigs"))
        .withColumn("bs", expr(s"concat_ws('|', slice(sigs, b * $Rows + 1, $Rows))"))
        .select(col("doc_id"), col("b"), col("bs"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bs") === col("y.bs")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      cand
        .join(sig.select(col("doc_id").as("a_id"), col("sigs").as("siga")), "a_id")
        .join(sig.select(col("doc_id").as("b_id"), col("sigs").as("sigb")), "b_id")
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .selectExpr(
          s"(CAST(size(filter(sequence(1, $NumHashes), i -> element_at(siga, i) = element_at(sigb, i))) AS BIGINT) * 1000000) DIV $NumHashes AS est_micro",
          "(CAST(size(array_intersect(ha, hb)) AS BIGINT) * 1000000) DIV size(array_union(ha, hb)) AS exact_micro")
        .selectExpr("(est_micro - exact_micro + 1000000) DIV 100000 AS err_bucket",
          "est_micro", "exact_micro")
        .groupBy(col("err_bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("abs(est_micro - exact_micro)")).as("sum_abs_err_micro"))
        .orderBy(col("err_bucket"))
    }),

    // CROSS-SOURCE duplication matrix — WHERE duplication lives, not
    // just how much: verified near-dup pairs grouped by their
    // (source, source) cell. The matrix drives the dedup strategy a
    // 100 TB pipeline actually deploys (heavy cross-source mass ⇒
    // global dedup before mixing; purely diagonal mass ⇒ cheaper
    // per-source dedup shards suffice) and is the standard CC-dump
    // audit ("which crawls re-host which"). Fixture surrogate for the
    // re-hosting feed: every 5th doc re-appears under the NEXT source
    // (cyclic src(N)→src(N+1)) with its last token dropped — so the
    // matrix provably has off-diagonal mass and the oracle replays it.
    //
    // Same banded-MinHash candidate pipeline as q_dedup_minhash
    // (signatures shuffle, text never does); the matrix aggregate
    // runs at verified-pair grain, and the two source lookups join on
    // doc_id — at 100 TB that is the id→metadata side-table join, not
    // a text join.
    "q_crossdup" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
      val rehost = Tables.documents(s, d).filter(col("doc_id") % 5 === 0).selectExpr(
        "doc_id + 1000000 AS doc_id",
        "array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ') AS text",
        "concat('src', CAST((CAST(substring(source, 4) AS INT) + 1) % 20 AS STRING)) AS source")
      val cross = base.unionByName(rehost)
      val hsh = withHashedShingles(cross).select(col("doc_id"), col("source"), col("hs"))
      val sig = signaturesOf(hsh.filter(size(col("hs")) >= 1)
        .select(col("doc_id"), col("hs")))
      val bands = sig
        .select(col("doc_id"), explode(expr(s"sequence(0, ${Bands - 1})")).as("b"), col("sigs"))
        .withColumn("bs", expr(s"concat_ws('|', slice(sigs, b * $Rows + 1, $Rows))"))
        .select(col("doc_id"), col("b"), col("bs"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bs") === col("y.bs")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha"),
          col("source").as("sa")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb"),
          col("source").as("sb")), "b_id")
        .filter(expr("jaccard_sorted(ha, hb) >= 0.6"))
        .selectExpr("least(sa, sb) AS src_a", "greatest(sa, sb) AS src_b")
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("is_cross", col("src_a") =!= col("src_b"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // INCREMENTAL near-dup admission — the reference's core contract
    // (ingest only rows not already in the sink, etl_service/main.py:
    // 95-104 + :175) lifted from exact-id grain to NEAR-DUP grain: the
    // incoming batch (here the corpus's synthetic re-crawl copies,
    // doc_id ≥ 10⁶ — modified near-copies of docs the corpus already
    // holds) is checked against the EXISTING corpus, and only docs
    // with no verified near-duplicate are admitted. Candidates come
    // from the banded-MinHash band join NEW × OLD (no self-join: the
    // sides are disjoint), verification is exact Jaccard ≥ 0.6 on the
    // hashed shingle sets, and each new doc reports its canonical
    // match (min old_id), match count, best Jaccard, and the admit
    // verdict.
    //
    // Scale posture: in production the OLD side's band signatures are
    // precomputed and persisted (the sink-id-cache posture — you never
    // re-shingle the corpus per batch); the incoming batch is tiny
    // relative to the corpus, so its band table BROADCASTS into the
    // candidate join and the 100 TB side never shuffles for it. The
    // verify join touches only candidate pairs; shuffles carry
    // signatures and ids, never text.
    "q_dedup_incremental" -> ((s, d) => {
      val all = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      val newDocs = all.filter(col("doc_id") >= 1000000L)
      val oldDocs = all.filter(col("doc_id") < 1000000L)
      def bandsOf(docs: DataFrame): DataFrame =
        signaturesOf(docs.filter(size(col("hs")) >= 1))
          .select(col("doc_id"), explode(expr(s"sequence(0, ${Bands - 1})")).as("b"), col("sigs"))
          .withColumn("bs", expr(s"concat_ws('|', slice(sigs, b * $Rows + 1, $Rows))"))
          .select(col("doc_id"), col("b"), col("bs"))
      val cand = broadcast(bandsOf(newDocs)).as("x")
        .join(bandsOf(oldDocs).as("y"),
          col("x.b") === col("y.b") && col("x.bs") === col("y.bs"))
        .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
        .distinct()
      val verified = cand
        .join(newDocs.select(col("doc_id").as("new_id"), col("hs").as("hn")), "new_id")
        .join(oldDocs.select(col("doc_id").as("old_id"), col("hs").as("ho")), "old_id")
        .withColumn("jaccard", expr("jaccard_sorted(hn, ho)"))
        .filter(col("jaccard") >= 0.6)
      val dec = verified.groupBy(col("new_id"))
        .agg(min(col("old_id")).as("dup_of"), count(lit(1)).as("n_matches"),
          round(max(col("jaccard")), 4).as("best_jaccard"))
      newDocs.select(col("doc_id").as("new_id"))
        .join(dec, Seq("new_id"), "left")
        .select(col("new_id"), col("dup_of"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("best_jaccard"), col("dup_of").isNull.as("admit"))
        .orderBy(col("new_id"))
    }),

    // Empirical RECALL of the banded-MinHash candidate stage against
    // the exact PPJoin ground truth — the dedup pipeline's
    // SELF-EVALUATION: banded LSH trades candidate volume for recall
    // by construction, and a production pipeline re-measures this
    // number whenever shingle size / hash count / banding / threshold
    // changes. Both sides are DETERMINISTIC here (the universal-hash
    // family is literal-seeded), so unlike q_simsearch_lsh the
    // evaluation itself is oracle-checkable even though the mechanism
    // it measures is probabilistic. truth = (lang, source)-blocked
    // PPJoin-verified pairs at j ≥ 0.6; cand = band-collision pairs
    // BEFORE verification (unblocked); tp = their intersection;
    // recall in exact micro-units. All three counts are 1-row frames
    // combined by broadcast cross join (the q_auc totals pattern).
    "q_dedup_recall" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val truth = jaccardPairs(s, d).select(col("a_id"), col("b_id"))
      val hsh = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      // size(hs) >= 1: keeps cand_n honest if the corpus ever gains a
      // doc with < 3 tokens — see the q_dedup_minhash sig note; the
      // oracle's sig CTE carries the same filter.
      val bands = signaturesOf(hsh.filter(size(col("hs")) >= 1))
        .select(col("doc_id"), explode(expr(s"sequence(0, ${Bands - 1})")).as("b"), col("sigs"))
        .withColumn("bs", expr(s"concat_ws('|', slice(sigs, b * $Rows + 1, $Rows))"))
        .select(col("doc_id"), col("b"), col("bs"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bs") === col("y.bs")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      val tn = truth.agg(count(lit(1)).as("truth_n"))
      val cn = cand.agg(count(lit(1)).as("cand_n"))
      val tpn = truth.join(cand, Seq("a_id", "b_id"), "left_semi")
        .agg(count(lit(1)).as("tp"))
      tn.crossJoin(broadcast(cn)).crossJoin(broadcast(tpn))
        .withColumn("recall_micro", expr("(tp * 1000000) DIV truth_n"))
    }),

    // LSH BAND-CONFIGURATION TUNING SWEEP — the third leg of the LSH
    // self-evaluation triad: q_dedup_recall answers "did we find
    // them", q_minhash_est answers "is the sketch sound", this
    // answers "WHICH (bands × rows) config should production run".
    // For every factorization of the 12-hash signature — (2,6),
    // (3,4), (4,3), (6,2) — it reports the candidate volume (the
    // COST axis: every candidate pays an exact verify), the verified
    // and ground-truth pair counts, and precision/recall in exact
    // micro. More bands ⇒ S-curve shifts left ⇒ higher recall, more
    // candidates — this table is where that tradeoff stops being
    // folklore and becomes a measurement on YOUR corpus. One
    // signature table feeds all four configs (band keys are slices of
    // the same 12 minhashes); each config is one band self-join at
    // signature grain — text never shuffles; the blocked exact truth
    // is computed once. At 100 TB the sweep runs on a hash-sampled
    // slice (the q_sample_hash gate composes in front unchanged) —
    // recall/precision are ratio estimates, so a 0.1% slice measures
    // them to ±1% while the full-corpus truth join would dwarf the
    // dedup run it is tuning.
    "q_lsh_tuning" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      // ONE lineage for all four (bands × rows) configs — the per-
      // config loop compiled FOUR separate band/join/verify/aggregate
      // codegen sets, and janino compilation (not arithmetic)
      // dominated cold runs (25.5 s pass-1 vs 3.3 s pass-2 at sf0.1).
      // The cosine_all consolidation precedent, applied to the sweep:
      // every config's band keys are slices of the SAME 12-hash
      // signature, so one exploded (nb, b) table carries all 15 band
      // slots (2+3+4+6), one self-join on (nb, b, bs) produces every
      // config's candidates (nb identifies the config — distinct per
      // row), one verify join scores them, and per-config counts are
      // three groupBy(nb) aggregates stitched onto a 4-row literal
      // spine (so a zero-candidate config still reports 0s).
      val truth = jaccardPairs(s, d).select(col("a_id"), col("b_id"))
      val hsh = withHashedShingles(corpus(s, d)).select(col("doc_id"), col("hs"))
      val sig = signaturesOf(hsh.filter(size(col("hs")) >= 1))
      val tn = truth.agg(count(lit(1)).as("truth_n"))
      val configs = Seq((2, 6), (3, 4), (4, 3), (6, 2))
      val cfgArr = configs.map { case (nb, nr) =>
        s"transform(sequence(0, ${nb - 1}), b -> named_struct('nb', $nb, 'nr', $nr, 'b', b))"
      }.mkString("flatten(array(", ", ", "))")
      val bands = sig
        .select(col("doc_id"), explode(expr(cfgArr)).as("cb"), col("sigs"))
        .withColumn("bs", expr("concat_ws('|', slice(sigs, cb.b * cb.nr + 1, cb.nr))"))
        .select(col("cb.nb").as("nb"), col("cb.b").as("b"), col("doc_id"), col("bs"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.nb") === col("y.nb") && col("x.b") === col("y.b")
            && col("x.bs") === col("y.bs") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.nb").as("nb"), col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
        .ckpt() // consumed by the count, the verify, and the tp semi-join
      val cn = cand.groupBy(col("nb")).agg(count(lit(1)).as("cand_n"))
      val vn = cand
        .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .filter(expr("jaccard_sorted(ha, hb) >= 0.6"))
        .groupBy(col("nb")).agg(count(lit(1)).as("verified_n"))
      val tp = cand.join(truth, Seq("a_id", "b_id"), "left_semi")
        .groupBy(col("nb")).agg(count(lit(1)).as("tp"))
      val spine = s.range(1).select(explode(expr(
        configs.map { case (nb, nr) => s"named_struct('nb', $nb, 'nr', $nr)" }
          .mkString("array(", ", ", ")"))).as("c"))
        .select(col("c.nb").as("nb"), col("c.nr").as("nr"))
      spine
        .join(broadcast(cn), Seq("nb"), "left")
        .join(broadcast(vn), Seq("nb"), "left")
        .join(broadcast(tp), Seq("nb"), "left")
        .crossJoin(broadcast(tn))
        .selectExpr("nb AS bands", "nr AS rows_per_band",
          "coalesce(cand_n, 0L) AS cand_n", "coalesce(verified_n, 0L) AS verified_n",
          "truth_n",
          "CASE WHEN coalesce(cand_n, 0L) = 0 THEN 0 ELSE (verified_n * 1000000) DIV cand_n END AS precision_micro",
          "(coalesce(tp, 0L) * 1000000) DIV truth_n AS recall_micro")
        .orderBy(col("bands"))
    }),

    // SimHash near-dup: 32-bit signatures, lang-blocked pairs within
    // Hamming distance 3. The pair space is pruned with the classic
    // Manku/Jain/Sarma chunk trick: split the 32-bit signature into 4
    // disjoint 8-bit chunks — hamming(a,b) <= 3 means the 3 differing
    // bits touch at most 3 chunks, so at least one chunk is identical
    // (pigeonhole). Candidates come from an equi-join on
    // (lang, chunk_idx, chunk_value) — joinable, shuffle-partitionable,
    // and subquadratic — then the exact Hamming check runs on
    // candidates only. Result-identical to the all-pairs join.
    "q_dedup_simhash" -> ((s, d) => {
      val sims = simhashed(corpus(s, d))
      val chunks = sims.select(col("doc_id"), col("lang"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("c"))
        .withColumn("cv", expr("shiftright(simhash, cast(c * 8 as int)) & 255"))
      val cand = chunks.as("x").join(chunks.as("y"),
          col("x.lang") === col("y.lang") && col("x.c") === col("y.c") &&
            col("x.cv") === col("y.cv") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          col("x.simhash").as("ha"), col("y.simhash").as("hb"), col("x.c").as("c"))
        // Emit each pair exactly once — from its FIRST equal chunk —
        // instead of deduplicating with a distinct (which re-shuffles
        // the whole candidate set): a candidate from chunk c is kept
        // only if every earlier chunk differs.
        .filter(expr(
          """c = 0
            |OR (c = 1 AND (ha & 255) != (hb & 255))
            |OR (c = 2 AND (ha & 255) != (hb & 255)
            |    AND (shiftright(ha, 8) & 255) != (shiftright(hb, 8) & 255))
            |OR (c = 3 AND (ha & 255) != (hb & 255)
            |    AND (shiftright(ha, 8) & 255) != (shiftright(hb, 8) & 255)
            |    AND (shiftright(ha, 16) & 255) != (shiftright(hb, 16) & 255))""".stripMargin))
      cand
        .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(col("hamming") <= 3)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Embedding-cosine near-dup: pairs with cos >= 0.95 over embeddings
    // ∪ (+0.01/dim) planted copies — found via IVF-cell candidate
    // generation, NOT a label-block all-pairs join. Exactness argument
    // (triangle inequality on angles, θmax = acos(0.95)):
    //   every vector is INDEXED once, in its nearest-centroid cell;
    //   every vector u PROBES each cell c with
    //     angle(u,c) ≤ angle(u, home(u)) + 2·θmax,
    //   which covers home(v) for every v with angle(u,v) ≤ θmax:
    //     angle(u, home(v)) ≤ angle(u,v) + angle(v, home(v))
    //                       ≤ θmax + (angle(v,u) + angle(u, home(u)))
    //                       ≤ 2·θmax + angle(u, home(u)).
    // So the (cell, label) equi-join sees every qualifying pair exactly
    // once (index side is unique per vector; probe_id < index_id keeps
    // one direction), and exact cosine verify reproduces the all-pairs
    // oracle hash-for-hash. The acos slack (1e-5) only adds candidates.
    // At 100 TB the cell id is the co-partition key: candidates are
    // cone-local, never block-wide, and the probe fan-out is bounded by
    // how many cells a 2·θmax cone intersects. Pair scoring via the
    // native codegen'd cosine (double overload) — the arithmetic order
    // matches the HOF fold bit-for-bit, so the >= 0.95 boundary agrees
    // with DuckDB.
    "q_dedup_embed" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
        .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      val dup = Tables.embeddings(s, d).filter(col("vec_id") % 5 === 0)
        .selectExpr("vec_id + 1000000 AS vec_id", "label",
          "transform(embedding, x -> cast(x as double) + 0.01) AS e")
      val all = emb.unionByName(dup)
      // codebook as ONE typedLit literal (cosine is scale-invariant, so
      // the 1e-4-grid integer centroids ride unscaled; value-identical
      // to the old Double.toString plan-text round-trip) — the foldable
      // arg CosineMulti decodes once; no O(K·dim) expr string to parse
      val centsCol = typedLit(
        Learn.coarseCentroids(s, d).map(_._2.map(_.toDouble).toSeq))
      val cosc = call_function("cosine_all", col("e"), centsCol)
      val twoTheta = 2 * math.acos(0.95)
      val clamp = (x: String) => s"acos(greatest(-1.0D, least(1.0D, $x)))"
      val assigned = all
        .withColumn("cosc", cosc)
        .withColumn("home", expr("cast(array_position(cosc, array_max(cosc)) as int) - 1"))
        .withColumn("probe_limit", expr(s"${clamp("array_max(cosc)")} + $twoTheta + 1e-5"))
      val index = assigned.select(col("home").as("cell"), col("vec_id").as("b_id"),
        col("label"), col("e").as("eb"))
      val probe = assigned
        .select(col("vec_id").as("a_id"), col("label"), col("e").as("ea"),
          col("probe_limit"), posexplode(col("cosc")).as(Seq("cell", "cosk")))
        .filter(expr(s"${clamp("cosk")} <= probe_limit"))
        .drop("cosk", "probe_limit")
      probe.join(index, Seq("cell", "label"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("cos_sim", expr("cosine_sim(ea, eb)"))
        .filter(col("cos_sim") >= 0.95)
        .select(col("a_id"), col("b_id"), col("label"), round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // INCREMENTAL near-dup admission at EMBEDDING grain — the vector
    // twin of q_dedup_incremental, lifting the reference's core ingest
    // contract (only rows not already in the sink are written,
    // etl_service/main.py:95-104 + :175) to the second near-dup grain
    // a training-data pipeline dedups on. The incoming batch (the
    // corpus's planted +0.01/dim re-crawl copies, vec_id ≥ 10⁶) is
    // checked against the EXISTING corpus under the TRAINED IVF
    // codebook, and only vectors with no verified near-duplicate
    // (cos ≥ 0.95, same label block) are admitted.
    //
    // Losslessness is the q_dedup_embed cone-probe argument, one-sided:
    // every EXISTING vector v is indexed once in home(v); an incoming u
    // probes every cell within angle(u, home(u)) + 2·θmax, which covers
    // home(v) for every v with angle(u,v) ≤ θmax (triangle inequality
    // on angles) — so the (cell, label) equi-join sees every qualifying
    // (new, old) pair EXACTLY once (old side unique per vector) and the
    // exact-cosine verify reproduces the all-pairs oracle.
    //
    // Scale posture: the corpus-side index is assign-once under the
    // codebook that trained at index-build time (coarseCentroids — the
    // production posture: the 100 TB side is persisted cell-partitioned
    // and NEVER re-shuffles per batch); the incoming batch explodes
    // over its probe cone and BROADCASTS into the candidate join, so
    // admission of a batch touches only cone-local corpus rows.
    "q_dedup_embed_inc" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val oldV = Tables.embeddings(s, d)
        .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      val newV = Tables.embeddings(s, d).filter(col("vec_id") % 5 === 0)
        .selectExpr("vec_id + 1000000 AS vec_id", "label",
          "transform(embedding, x -> cast(x as double) + 0.01) AS e")
      val centsCol = typedLit(
        Learn.coarseCentroids(s, d).map(_._2.map(_.toDouble).toSeq))
      val twoTheta = 2 * math.acos(0.95)
      val clamp = (x: String) => s"acos(greatest(-1.0D, least(1.0D, $x)))"
      val index = oldV
        .withColumn("cosc", call_function("cosine_all", col("e"), centsCol))
        .withColumn("cell", expr("cast(array_position(cosc, array_max(cosc)) as int) - 1"))
        .select(col("cell"), col("vec_id").as("old_id"), col("label"), col("e").as("eo"))
      val probe = broadcast(newV
        .withColumn("cosc", call_function("cosine_all", col("e"), centsCol))
        .withColumn("probe_limit", expr(s"${clamp("array_max(cosc)")} + $twoTheta + 1e-5"))
        .select(col("vec_id").as("new_id"), col("label"), col("e").as("en"),
          col("probe_limit"), posexplode(col("cosc")).as(Seq("cell", "cosk")))
        .filter(expr(s"${clamp("cosk")} <= probe_limit"))
        .drop("cosk", "probe_limit"))
      val verified = probe.join(index, Seq("cell", "label"))
        .withColumn("cos_sim", expr("cosine_sim(en, eo)"))
        .filter(col("cos_sim") >= 0.95)
      val dec = verified.groupBy(col("new_id"))
        .agg(min(col("old_id")).as("dup_of"), count(lit(1)).as("n_matches"),
          round(max(col("cos_sim")), 4).as("best_cos"))
      newV.select(col("vec_id").as("new_id"))
        .join(dec, Seq("new_id"), "left")
        .select(col("new_id"), col("dup_of"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("best_cos"), col("dup_of").isNull.as("admit"))
        .orderBy(col("new_id"))
    }),

    // EMBEDDING-dedup THRESHOLD SWEEP — the tuning leg of the
    // embedding-grain triad (q_dedup_embed finds, q_dedup_embed_inc
    // admits, this CALIBRATES): pair mass and affected-vector mass at
    // each candidate cosine cutoff, the page a pipeline owner reads
    // before committing to a threshold (too loose glues the corpus,
    // too tight misses the paraphrase tier — the same decision
    // q_lsh_tuning serves at the MinHash grain). ONE candidate pass at
    // the LOOSEST cutoff (0.90) bounds every tighter row: the cone
    // probe runs once with 2·acos(0.90), exact cosine verifies once,
    // and the sweep is a cheap explode × thresholds over the verified
    // pair page (pair-mass grain, never corpus).
    "q_dedup_embed_sweep" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val thresholds = Seq(900, 920, 940, 950, 960, 980)
      // THREE planted noise tiers (cos ~0.997 / ~0.96 / ~0.93 on this
      // corpus) so the sweep page actually separates — one tier would
      // make every threshold row identical and the calibration moot
      val emb = Tables.embeddings(s, d)
        .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      def tier(mod: Int, rem: Int, off: Long, shift: String) =
        Tables.embeddings(s, d).filter(col("vec_id") % mod === rem)
          .selectExpr(s"vec_id + $off AS vec_id", "label",
            s"transform(embedding, x -> cast(x as double) + $shift) AS e")
      val all = emb
        .unionByName(tier(5, 0, 1000000L, "0.01"))
        .unionByName(tier(7, 1, 2000000L, "0.03"))
        .unionByName(tier(9, 2, 3000000L, "0.05"))
      val centsCol = typedLit(
        Learn.coarseCentroids(s, d).map(_._2.map(_.toDouble).toSeq))
      val twoTheta = 2 * math.acos(0.90)
      val clamp = (x: String) => s"acos(greatest(-1.0D, least(1.0D, $x)))"
      val assigned = all
        .withColumn("cosc", call_function("cosine_all", col("e"), centsCol))
        .withColumn("home", expr("cast(array_position(cosc, array_max(cosc)) as int) - 1"))
        .withColumn("probe_limit", expr(s"${clamp("array_max(cosc)")} + $twoTheta + 1e-5"))
      val index = assigned.select(col("home").as("cell"), col("vec_id").as("b_id"),
        col("label"), col("e").as("eb"))
      val probe = assigned
        .select(col("vec_id").as("a_id"), col("label"), col("e").as("ea"),
          col("probe_limit"), posexplode(col("cosc")).as(Seq("cell", "cosk")))
        .filter(expr(s"${clamp("cosk")} <= probe_limit"))
        .drop("cosk", "probe_limit")
      val pairs = probe.join(index, Seq("cell", "label"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("cos_sim", expr("cosine_sim(ea, eb)"))
        .filter(col("cos_sim") >= 0.90)
        .select(col("a_id"), col("b_id"), col("cos_sim"))
        .ckpt() // the sweep reads the verified page per threshold
      val thr = thresholds.map(t => lit(t.toLong)).toArray
      val swept = pairs
        .select(col("a_id"), col("b_id"), col("cos_sim"),
          explode(array(thr: _*)).as("thr_milli"))
        .filter(expr("cos_sim >= CAST(thr_milli AS DOUBLE) / 1000.0D"))
      val pairMass = swept.groupBy(col("thr_milli"))
        .agg(count(lit(1)).as("n_pairs"))
      val vecMass = swept
        .select(col("thr_milli"),
          explode(array(col("a_id"), col("b_id"))).as("vid"))
        .groupBy(col("thr_milli"))
        .agg(countDistinct(col("vid")).as("n_dup_vecs"))
      pairMass.join(vecMass, Seq("thr_milli"))
        .orderBy(col("thr_milli"))
    }),

    // LEAKAGE-SAFE k-fold assignment — GROUP k-fold at NEAR-DUP-CLUSTER
    // grain (the evaluation-hygiene step the dedup literature motivates:
    // Lee et al. 2022 measure test-set contamination from duplicates
    // crossing the train/eval split; sklearn's GroupKFold is the
    // single-node shape). A doc-grain hash split CANNOT be leakage-safe:
    // two near-identical docs hash independently and land in different
    // folds, so the eval fold "tests" on training data. Here the fold is
    // a function of the near-dup CLUSTER id — every member of a cluster
    // shares its fold BY CONSTRUCTION (fold(doc) = h(cluster(doc)), a
    // pure function of cluster), so no dup pair can ever span folds.
    //
    // Scale posture: rides the memoized [[clusterLabels]] vector (pairs
    // → alternating-star CC, all signature-grain); the fold hash is
    // map-only arithmetic on the label table + one co-partitioned
    // doc_id join for singletons (left join + coalesce). Every
    // intermediate term of the universal hash stays < 2⁶² (the
    // walkHash overflow discipline — DuckDB errors on BIGINT overflow).
    "q_kfold" -> ((s, d) => {
      val docs = corpus(s, d).select(col("doc_id"))
      docs.join(clusterLabels(s, d), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("fold", expr(
          "(1203958717 * (cluster_id % 2147483647) + 776531401) % 2147483647 % 5"))
        .select(col("doc_id"), col("cluster_id"), col("fold"))
        .orderBy(col("doc_id"))
    }),

    // DUP-GRAPH DIAGNOSTICS — the component-size histogram of the
    // near-dup clustering (the audit a production dedup run ships with
    // its delete list: a sudden giant component means boilerplate or a
    // degenerate shingle config is gluing the corpus together — the
    // known failure mode of web-scale dedup — while the singleton mass
    // says how much of the corpus is untouched). Per component size:
    // cluster count and doc mass. Rides the memoized [[clusterLabels]]
    // vector; singletons enter via the same left-join + coalesce as
    // q_dedup_canonical, then two aggregate-grain rollups (cluster →
    // size, size → histogram) — nothing beyond label-table scale
    // shuffles.
    "q_dup_stats" -> ((s, d) => {
      val docs = corpus(s, d).select(col("doc_id"))
      docs.join(clusterLabels(s, d), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
        .orderBy(col("sz"))
    }),

    // DUPLICATION × QUALITY cross-tab — the sanity check every
    // curation pipeline runs before weighting dedup into its quality
    // gate ("are duplicated docs actually worse?"): per dup class
    // (unique vs member-of-a-duplicate-cluster), document mass and the
    // mean/min distinct-token ratio (the q_quality_ensemble signal) in
    // exact integer micro. On the synthetic fixture the duplicated
    // class is the planted near-copy clusters, so the readout is
    // deterministic.
    //
    // Scale posture: rides the memoized [[clusterLabels]] vector (one
    // CC run serves the whole dedup family); the quality signal is
    // map-only off one corpus scan; joins run at label grain and the
    // report is 2 rows.
    "q_dup_quality" -> ((s, d) => {
      val q = corpus(s, d).selectExpr("doc_id",
        "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000) " +
          "DIV size(split(text, ' ')) AS distinct_micro")
      val labeled = q.join(clusterLabels(s, d), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val sizes = labeled.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      labeled.join(sizes, "cluster_id")
        .withColumn("dup_class",
          when(col("sz") === 1L, "unique").otherwise("duplicated"))
        .groupBy(col("dup_class"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(distinct_micro) DIV count(1)").as("mean_distinct_micro"),
          min(col("distinct_micro")).as("min_distinct_micro"))
        .orderBy(col("dup_class"))
    }),

    // FELLEGI-SUNTER probabilistic record linkage (Fellegi & Sunter
    // 1969; Winkler's Census deployments) — the ENTITY-resolution
    // sibling of the document dedup bank: same-entity detection across
    // two tables that share no key, which is how real training-data
    // joins (user↔account, doc↔source-of-truth) actually happen. The
    // classic architecture, Spark-first:
    //   1. BLOCKING: candidate pairs come from an equi-join on
    //      (brand, size) — a plain shuffle join whose cost is
    //      Σ_b |A_b|·|B_b|, never |A|·|B|; at 100 TB the block key IS
    //      the partitioner, and block-size skew is visible/boundable
    //      at the blocking aggregate before any comparison runs.
    //   2. COMPARISON VECTOR: per pair, field agreements — name via
    //      the native codegen'd [[graft.functions.JaroWinklerSim]]
    //      (quantized to 1e-4 then thresholded at 0.85; the float
    //      never leaves the row), category equality, banded price.
    //   3. SCORING: Σ log₂(m/u) agreement weights as exact milli
    //      LITERALS (declared model config here, where production
    //      would EM-fit them; swapping weights changes literals, not
    //      the plan), decisions at the classic two-threshold rule
    //      (match / possible / nonmatch).
    // The dirty side is a deterministic in-plan corruption of part
    // (per-token reversal keyed on (p_partkey + i) % 3, category
    // wipe-out at pk % 7, price shift at pk % 11 — both engines build
    // the identical twin), which doubles as ground truth: n_true
    // counts pairs whose hidden key matches, so the report grades the
    // linker's decisions against truth per class. Text/pairs never
    // carry more than the compare fields; one shuffle (blocking),
    // one aggregate.
    "q_record_linkage" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val clean = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_brand"), col("p_size"), col("p_type"),
        expr("CAST(floor(p_retailprice * 100) AS BIGINT)").as("pc"))
      val dirty = Tables.part(s, d)
        .select(col("p_partkey").as("b_pk"), col("p_brand"), col("p_size"),
          expr("""array_join(transform(sequence(1, size(split(p_name, ' '))),
                 |  i -> IF((p_partkey + i) % 3 = 0,
                 |          reverse(element_at(split(p_name, ' '), i)),
                 |          element_at(split(p_name, ' '), i))), ' ')""".stripMargin)
            .as("dname"),
          expr("CASE WHEN p_partkey % 7 = 0 THEN 'UNKNOWN' ELSE p_type END").as("dtype"),
          expr("CAST(floor(p_retailprice * 100) AS BIGINT) + IF(p_partkey % 11 = 0, 5000, 0)")
            .as("pc2"))
      clean.join(dirty, Seq("p_brand", "p_size"))
        .withColumn("jw_q", expr("CAST(floor(jaro_winkler(p_name, dname) * 10000 + 0.5) AS BIGINT)"))
        .withColumn("w_milli", expr(
          """CASE WHEN jw_q >= 8500 THEN 4248 ELSE -4248 END
            | + CASE WHEN p_type = dtype THEN 3170 ELSE -3170 END
            | + CASE WHEN pc DIV 1000 = pc2 DIV 1000 THEN 2503 ELSE -2503 END""".stripMargin))
        .withColumn("decision", expr(
          "CASE WHEN w_milli >= 6000 THEN 'match' WHEN w_milli >= 0 THEN 'possible' ELSE 'nonmatch' END"))
        .groupBy(col("decision"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN p_partkey = b_pk THEN 1 ELSE 0 END")).as("n_true"),
          sum(col("w_milli")).as("sum_w_milli"))
        .withColumn("mean_w_micro", expr(
          "CASE WHEN sum_w_milli >= 0 THEN (sum_w_milli * 1000) DIV n_pairs ELSE -((-sum_w_milli * 1000) DIV n_pairs) END"))
        .select(col("decision"), col("n_pairs"), col("n_true"), col("mean_w_micro"))
        .orderBy(col("decision"))
    }),

    // DEDUP SAVINGS SWEEP — the "what does each similarity threshold
    // buy" planning readout a dedup rollout runs BEFORE committing a
    // threshold: for t ∈ {0.60, 0.70, 0.80, 0.90}, how many docs would
    // the pair-grain drop rule (drop the higher id of every verified
    // pair ≥ t) remove, and what character mass does that save. Rides
    // the shared [[jaccardPairs]] pipeline ONCE — per-doc max-jaccard
    // collapses the pair table to doc grain, the 4-row threshold grid
    // broadcasts, totals broadcast 1-row. floor(max·100) is safe
    // cross-engine: the jaccard is an exact small-integer rational,
    // identical text → identical double → identical floor.
    "q_dedup_savings" -> ((s, d) => {
      val cor = corpus(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("nc"))
        .ckpt() // totals + drop-side char lookup share it
      val jm = jaccardPairs(s, d)
        .groupBy(col("b_id")).agg(max(col("jaccard")).as("jmax"))
        .select(col("b_id"), expr("CAST(floor(jmax * 100) AS BIGINT)").as("jc"))
      val dropped = jm.join(cor.select(col("doc_id").as("b_id"), col("nc")), "b_id")
      val tot = cor.agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("chars_tot"))
      val grid = s.sql(
        "SELECT CAST(t AS BIGINT) AS t FROM VALUES (60), (70), (80), (90) AS g(t)")
      val per = dropped.crossJoin(broadcast(grid))
        .filter(col("jc") >= col("t"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("nd"), sum(col("nc")).as("cd"))
      grid.join(per, Seq("t"), "left")
        .crossJoin(broadcast(tot))
        .select(col("t"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"),
          coalesce(col("cd"), lit(0L)).as("chars_dropped"),
          col("n_docs"), col("chars_tot"),
          expr("(coalesce(cd, CAST(0 AS BIGINT)) * 1000000) DIV chars_tot").as("savings_micro"))
        .orderBy(col("t"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_jaccard" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql
         |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
         |  round(len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))), 4) AS jaccard
         |FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |WHERE len(list_intersect(x.hs, y.hs))
         |      / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6
         |ORDER BY a_id, b_id""".stripMargin,

    // Winnowed selections replayed positionally (md5-fold gram stream,
    // inclusive-slice window minima), df-capped fingerprint self-join,
    // then the same exact-Jaccard verify as q_dedup_jaccard.
    "q_dedup_winnow" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
         |fpx AS (
         |  SELECT doc_id, list_transform(range(1, len(tk) - 6),
         |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
         |      j -> CAST(strpos('0123456789abcdef',
         |             substr(md5(array_to_string(tk[i:i+7], ' ')), j, 1)) - 1 AS BIGINT))),
         |      (a, b) -> a * 16 + b)) AS fps
         |  FROM tk),
         |sel AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(fps) - 2),
         |    i -> list_aggregate(fps[i:i+3], 'min')))) AS fp
         |  FROM fpx WHERE len(fps) >= 4),
         |sel2 AS MATERIALIZED (
         |  SELECT sel.doc_id, sel.fp FROM sel
         |  JOIN (SELECT fp FROM (SELECT fp, count(*) AS df FROM sel GROUP BY fp)
         |        WHERE df <= 100) r USING (fp)),
         |pr AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM sel2 x JOIN sel2 y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id)
         |SELECT pr.a_id, pr.b_id, pr.n_shared,
         |  round(len(list_intersect(a.hs, b.hs))
         |        / len(list_distinct(list_concat(a.hs, b.hs))), 4) AS jaccard
         |FROM pr JOIN hsh a ON pr.a_id = a.doc_id JOIN hsh b ON pr.b_id = b.doc_id
         |WHERE len(list_intersect(a.hs, b.hs))
         |      / len(list_distinct(list_concat(a.hs, b.hs))) >= 0.6
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_snm" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |ranked AS (
         |  SELECT h.doc_id, h.lang, h.source, h.hs,
         |    row_number() OVER (PARTITION BY h.lang, h.source
         |      ORDER BY c.text, h.doc_id) AS rnk
         |  FROM hsh h JOIN corpus c ON h.doc_id = c.doc_id)
         |SELECT least(x.doc_id, y.doc_id) AS a_id,
         |  greatest(x.doc_id, y.doc_id) AS b_id,
         |  round(len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))), 4) AS jaccard
         |FROM ranked x JOIN ranked y
         |  ON x.lang = y.lang AND x.source = y.source
         | AND y.rnk < x.rnk AND x.rnk - y.rnk <= 8
         |WHERE len(list_intersect(x.hs, y.hs))
         |      / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_edit" ->
      s"""WITH $corpusSql,
         |ranked AS (
         |  SELECT doc_id, lang, source, substr(text, 1, 64) AS pfx,
         |    row_number() OVER (PARTITION BY lang, source
         |      ORDER BY text, doc_id) AS rnk
         |  FROM corpus)
         |SELECT least(x.doc_id, y.doc_id) AS a_id,
         |  greatest(x.doc_id, y.doc_id) AS b_id,
         |  levenshtein(x.pfx, y.pfx) AS edit
         |FROM ranked x JOIN ranked y
         |  ON x.lang = y.lang AND x.source = y.source
         | AND y.rnk < x.rnk AND x.rnk - y.rnk <= 8
         |WHERE levenshtein(x.pfx, y.pfx) <= 16
         |ORDER BY a_id, b_id""".stripMargin,

    "q_edit_recall" ->
      s"""WITH $corpusSql,
         |ranked AS (
         |  SELECT doc_id, lang, source, text, substr(text, 1, 64) AS pfx,
         |    row_number() OVER (PARTITION BY lang, source
         |      ORDER BY text, doc_id) AS rnk
         |  FROM corpus),
         |cand AS (
         |  SELECT x.text AS xt, y.text AS yt, x.pfx AS xp, y.pfx AS yp
         |  FROM ranked x JOIN ranked y
         |    ON x.lang = y.lang AND x.source = y.source
         |   AND y.rnk < x.rnk AND x.rnk - y.rnk <= 8),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS cand_n,
         |    CAST(SUM(CASE WHEN levenshtein(xt, yt) <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS full_n,
         |    CAST(SUM(CASE WHEN levenshtein(xp, yp) <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS pfx_n,
         |    CAST(SUM(CASE WHEN levenshtein(xp, yp) <= 16
         |              AND levenshtein(xt, yt) <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |  FROM cand)
         |SELECT cand_n, full_n, pfx_n, tp,
         |  (tp * 1000000) // greatest(full_n, 1) AS recall_micro
         |FROM agg""".stripMargin,

    // Connected components over the verified jaccard edges: the oracle
    // computes full transitive closure (reach) with a recursive CTE and
    // takes min(reachable id) per node — the same fixpoint the Spark
    // min-label propagation converges to.
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(src, dst) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT src AS doc_id, min(dst) AS cluster_id,
         |  min(dst) = src AS canonical
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    // Same recursive closure as q_dedup_cluster, then the fold hash on
    // the component label (identical non-negative BIGINT arithmetic in
    // both engines).
    "q_kfold" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(src, dst) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |fulll AS (
         |  SELECT c.doc_id, COALESCE(l.cluster_id, c.doc_id) AS cluster_id
         |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc_id)
         |SELECT doc_id, cluster_id,
         |  (1203958717 * (cluster_id % 2147483647) + 776531401) % 2147483647 % 5 AS fold
         |FROM fulll ORDER BY doc_id""".stripMargin,

    // Same closure as q_dedup_cluster, joined against the map-only
    // distinct-token-ratio signal and rolled up per dup class.
    "q_dup_quality" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(src, dst) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |q AS (
         |  SELECT doc_id,
         |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000)
         |      // len(string_split(text, ' ')) AS distinct_micro
         |  FROM corpus),
         |fulll AS (
         |  SELECT q.doc_id, q.distinct_micro, COALESCE(l.cluster_id, q.doc_id) AS cluster_id
         |  FROM q LEFT JOIN labels l ON q.doc_id = l.doc_id),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM fulll GROUP BY 1)
         |SELECT CASE WHEN sz = 1 THEN 'unique' ELSE 'duplicated' END AS dup_class,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(distinct_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_distinct_micro,
         |  CAST(MIN(distinct_micro) AS BIGINT) AS min_distinct_micro
         |FROM fulll JOIN sizes USING (cluster_id)
         |GROUP BY 1 ORDER BY dup_class""".stripMargin,

    // Same closure as q_dedup_cluster, rolled up to the size histogram.
    "q_dup_stats" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(src, dst) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |fulll AS (
         |  SELECT c.doc_id, COALESCE(l.cluster_id, c.doc_id) AS cluster_id
         |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc_id),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM fulll GROUP BY cluster_id)
         |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters, CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin,

    "q_dedup_canonical" ->
      s"""WITH RECURSIVE $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(src, dst) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |fulll AS (
         |  SELECT c.doc_id, CAST(length(c.text) AS BIGINT) AS n_chars,
         |    COALESCE(l.cluster_id, c.doc_id) AS cluster_id
         |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc_id)
         |SELECT doc_id, cluster_id, n_chars, rn = 1 AS keep FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM fulll)
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |sig AS (SELECT doc_id, $sigSql AS sigs FROM hsh WHERE len(hs) >= 1),
         |bands AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bs = y.bs AND x.doc_id < y.doc_id)
         |SELECT a_id, b_id,
         |  round(len(list_intersect(sa.hs, sb.hs))
         |        / len(list_distinct(list_concat(sa.hs, sb.hs))), 4) AS jaccard
         |FROM cand
         |JOIN hsh sa ON sa.doc_id = a_id
         |JOIN hsh sb ON sb.doc_id = b_id
         |WHERE len(list_intersect(sa.hs, sb.hs))
         |      / len(list_distinct(list_concat(sa.hs, sb.hs))) >= 0.6
         |ORDER BY a_id, b_id""".stripMargin,

    "q_lsh_tuning" -> {
      val configs = Seq((2, 6), (3, 4), (4, 3), (6, 2))
      val perConfig = configs.map { case (nb, nr) =>
        s"""bands_$nb AS (
           |  SELECT doc_id, b, array_to_string(sigs[b * $nr + 1 : b * $nr + $nr], '|') AS bs
           |  FROM (SELECT doc_id, sigs, unnest(range(0, $nb)) AS b FROM sig)),
           |cand_$nb AS (
           |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           |  FROM bands_$nb x JOIN bands_$nb y
           |    ON x.b = y.b AND x.bs = y.bs AND x.doc_id < y.doc_id),
           |ver_$nb AS (
           |  SELECT a_id, b_id FROM cand_$nb
           |  JOIN hsh sa ON sa.doc_id = a_id
           |  JOIN hsh sb ON sb.doc_id = b_id
           |  WHERE len(list_intersect(sa.hs, sb.hs))
           |        / len(list_distinct(list_concat(sa.hs, sb.hs))) >= 0.6),
           |stats_$nb AS (
           |  SELECT $nb AS bands, $nr AS rows_per_band,
           |    (SELECT CAST(count(*) AS BIGINT) FROM cand_$nb) AS cand_n,
           |    (SELECT CAST(count(*) AS BIGINT) FROM ver_$nb) AS verified_n,
           |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS truth_n,
           |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
           |       WHERE EXISTS (SELECT 1 FROM cand_$nb c
           |                     WHERE c.a_id = t.a_id AND c.b_id = t.b_id)) AS tp)""".stripMargin
      }
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |sig AS (SELECT doc_id, $sigSql AS sigs FROM hsh WHERE len(hs) >= 1),
         |truth AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |${perConfig.mkString(",\n")}
         |${configs.map { case (nb, _) =>
        s"""SELECT bands, rows_per_band, cand_n, verified_n, truth_n,
           |  CASE WHEN cand_n = 0 THEN 0 ELSE (verified_n * 1000000) // cand_n END AS precision_micro,
           |  (tp * 1000000) // truth_n AS recall_micro
           |FROM stats_$nb""".stripMargin
      }.mkString("\nUNION ALL\n")}
         |ORDER BY bands""".stripMargin
    },

    "q_minhash_est" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |sig AS (SELECT doc_id, $sigSql AS sigs FROM hsh WHERE len(hs) >= 1),
         |bands AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bs = y.bs AND x.doc_id < y.doc_id),
         |err AS (
         |  SELECT
         |    (CAST(len(list_filter(range(1, $NumHashes + 1),
         |        i -> pa.sigs[i] = pb.sigs[i])) AS BIGINT) * 1000000) // $NumHashes AS est_micro,
         |    (CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT) * 1000000)
         |      // len(list_distinct(list_concat(sa.hs, sb.hs))) AS exact_micro
         |  FROM cand
         |  JOIN sig pa ON pa.doc_id = a_id
         |  JOIN sig pb ON pb.doc_id = b_id
         |  JOIN hsh sa ON sa.doc_id = a_id
         |  JOIN hsh sb ON sb.doc_id = b_id)
         |SELECT (est_micro - exact_micro + 1000000) // 100000 AS err_bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(abs(est_micro - exact_micro)) AS BIGINT) AS sum_abs_err_micro
         |FROM err GROUP BY 1 ORDER BY err_bucket""".stripMargin,

    // Same banded pipeline over the cross-source re-hosting corpus;
    // the corpus CTE keeps the shared name so sh/hsh reuse verbatim.
    "q_crossdup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string((string_split(text, ' '))[1:len(string_split(text, ' ')) - 1], ' ') AS text,
         |    lang,
         |    'src' || CAST((CAST(substr(source, 4) AS INT) + 1) % 20 AS VARCHAR) AS source
         |  FROM documents WHERE doc_id % 5 = 0),
         |$shinglesSql,
         |$hshSql,
         |sig AS (SELECT doc_id, $sigSql AS sigs FROM hsh WHERE len(hs) >= 1),
         |bands AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bs = y.bs AND x.doc_id < y.doc_id),
         |ver AS (
         |  SELECT least(sa.source, sb.source) AS src_a,
         |    greatest(sa.source, sb.source) AS src_b
         |  FROM cand
         |  JOIN hsh sa ON sa.doc_id = a_id
         |  JOIN hsh sb ON sb.doc_id = b_id
         |  WHERE len(list_intersect(sa.hs, sb.hs))
         |        / len(list_distinct(list_concat(sa.hs, sb.hs))) >= 0.6)
         |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  src_a <> src_b AS is_cross
         |FROM ver GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    // Independent algorithm: the oracle runs the quadratic blocked
    // all-pairs containment directly — no prefix filter — so the
    // compare also proves the filter is lossless on the fixture.
    "q_dedup_contain" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |h AS MATERIALIZED (
         |  SELECT doc_id, lang, source, hs, len(hs) AS ns FROM hsh WHERE len(hs) >= 1)
         |SELECT a_id, b_id, inter, small_n, contain_micro,
         |  round(jacc, 4) AS jaccard
         |FROM (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
         |    CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS inter,
         |    CAST(least(x.ns, y.ns) AS BIGINT) AS small_n,
         |    (CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) * 1000000)
         |      // least(x.ns, y.ns) AS contain_micro,
         |    len(list_intersect(x.hs, y.hs))
         |      / len(list_distinct(list_concat(x.hs, y.hs))) AS jacc
         |  FROM h x JOIN h y ON x.lang = y.lang AND x.source = y.source
         |    AND x.doc_id < y.doc_id)
         |WHERE contain_micro >= 900000
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |newd AS MATERIALIZED (SELECT doc_id, hs FROM hsh WHERE doc_id >= 1000000),
         |oldd AS MATERIALIZED (SELECT doc_id, hs FROM hsh WHERE doc_id < 1000000),
         |sgn AS (SELECT doc_id, $sigSql AS sigs FROM newd WHERE len(hs) >= 1),
         |sgo AS (SELECT doc_id, $sigSql AS sigs FROM oldd WHERE len(hs) >= 1),
         |bn AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sgn)),
         |bo AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sgo)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |  FROM bn x JOIN bo y ON x.b = y.b AND x.bs = y.bs),
         |ver AS (
         |  SELECT new_id, old_id,
         |    len(list_intersect(sn.hs, so.hs))
         |      / len(list_distinct(list_concat(sn.hs, so.hs))) AS jacc
         |  FROM cand
         |  JOIN newd sn ON sn.doc_id = new_id
         |  JOIN oldd so ON so.doc_id = old_id
         |  WHERE len(list_intersect(sn.hs, so.hs))
         |        / len(list_distinct(list_concat(sn.hs, so.hs))) >= 0.6),
         |dec AS (
         |  SELECT new_id, min(old_id) AS dup_of,
         |    CAST(count(*) AS BIGINT) AS n_matches,
         |    round(max(jacc), 4) AS best_jaccard
         |  FROM ver GROUP BY new_id)
         |SELECT n.doc_id AS new_id, dec.dup_of,
         |  COALESCE(dec.n_matches, 0) AS n_matches,
         |  dec.best_jaccard,
         |  dec.dup_of IS NULL AS admit
         |FROM newd n LEFT JOIN dec ON dec.new_id = n.doc_id
         |ORDER BY new_id""".stripMargin,

    "q_dedup_recall" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |truth AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM hsh x JOIN hsh y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |sig AS (SELECT doc_id, $sigSql AS sigs FROM hsh WHERE len(hs) >= 1),
         |bands AS (
         |  SELECT doc_id, b, array_to_string(sigs[b * $Rows + 1 : b * $Rows + $Rows], '|') AS bs
         |  FROM (SELECT doc_id, sigs, unnest(range(0, $Bands)) AS b FROM sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bs = y.bs AND x.doc_id < y.doc_id),
         |tp AS (SELECT count(*) AS n FROM (SELECT * FROM truth INTERSECT SELECT * FROM cand))
         |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS truth_n,
         |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS cand_n,
         |  CAST(tp.n AS BIGINT) AS tp,
         |  (CAST(tp.n AS BIGINT) * 1000000) // (SELECT count(*) FROM truth) AS recall_micro
         |FROM tp""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH $corpusSql,
         |sims AS (
         |  SELECT doc_id, lang, $simhashSql AS simhash
         |  FROM (SELECT doc_id, lang, $tokHashSql AS hs FROM corpus))
         |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
         |FROM sims x JOIN sims y ON x.lang = y.lang AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_embed" ->
      """WITH all_v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01) AS e
        |  FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT a_id, b_id, label, round(cos_sim, 4) AS cos_sim FROM (
        |  SELECT x.vec_id AS a_id, y.vec_id AS b_id, x.label AS label,
        |    list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))) AS cos_sim
        |  FROM all_v x JOIN all_v y ON x.label = y.label AND x.vec_id < y.vec_id)
        |WHERE cos_sim >= 0.95 ORDER BY a_id, b_id""".stripMargin,

    // All-pairs replay of the incremental admission: NEW × OLD within
    // the label block, exact cosine, per-new decision — the lossless
    // bound makes the IVF-probed Spark plan reproduce this exactly.
    "q_dedup_embed_inc" ->
      """WITH oldv AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |newv AS (
        |  SELECT vec_id + 1000000 AS vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01) AS e
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |ver AS (
        |  SELECT new_id, old_id, cos_sim FROM (
        |    SELECT n.vec_id AS new_id, o.vec_id AS old_id,
        |      list_dot_product(n.e, o.e)
        |        / (sqrt(list_dot_product(n.e, n.e)) * sqrt(list_dot_product(o.e, o.e))) AS cos_sim
        |    FROM newv n JOIN oldv o ON n.label = o.label)
        |  WHERE cos_sim >= 0.95),
        |dec AS (
        |  SELECT new_id, min(old_id) AS dup_of,
        |    CAST(count(*) AS BIGINT) AS n_matches,
        |    round(max(cos_sim), 4) AS best_cos
        |  FROM ver GROUP BY new_id)
        |SELECT n.vec_id AS new_id, dec.dup_of,
        |  COALESCE(dec.n_matches, 0) AS n_matches,
        |  dec.best_cos,
        |  dec.dup_of IS NULL AS admit
        |FROM newv n LEFT JOIN dec ON dec.new_id = n.vec_id
        |ORDER BY new_id""".stripMargin,

    // All-pairs replay of the threshold sweep at the loosest cutoff,
    // then the same explode × thresholds over the verified page.
    "q_dedup_embed_sweep" ->
      """WITH all_v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01) AS e
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id + 2000000 AS vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.03) AS e
        |  FROM embeddings WHERE vec_id % 7 = 1
        |  UNION ALL
        |  SELECT vec_id + 3000000 AS vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.05) AS e
        |  FROM embeddings WHERE vec_id % 9 = 2),
        |pairs AS MATERIALIZED (
        |  SELECT a_id, b_id, cos_sim FROM (
        |    SELECT x.vec_id AS a_id, y.vec_id AS b_id,
        |      list_dot_product(x.e, y.e)
        |        / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))) AS cos_sim
        |    FROM all_v x JOIN all_v y ON x.label = y.label AND x.vec_id < y.vec_id)
        |  WHERE cos_sim >= 0.90),
        |thr AS (SELECT CAST(unnest([900, 920, 940, 950, 960, 980]) AS BIGINT) AS thr_milli),
        |swept AS (
        |  SELECT thr.thr_milli, p.a_id, p.b_id
        |  FROM pairs p, thr
        |  WHERE p.cos_sim >= CAST(thr.thr_milli AS DOUBLE) / 1000.0),
        |pm AS (SELECT thr_milli, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM swept GROUP BY 1),
        |vm AS (SELECT thr_milli, CAST(count(DISTINCT vid) AS BIGINT) AS n_dup_vecs
        |       FROM (SELECT thr_milli, unnest([a_id, b_id]) AS vid FROM swept)
        |       GROUP BY 1)
        |SELECT pm.thr_milli, pm.n_pairs, vm.n_dup_vecs
        |FROM pm JOIN vm USING (thr_milli) ORDER BY thr_milli""".stripMargin,

    "q_record_linkage" ->
      """WITH clean AS (
        |  SELECT p_partkey, p_name, p_brand, p_size, p_type,
        |    CAST(floor(p_retailprice * 100) AS BIGINT) AS pc
        |  FROM part),
        |dirty AS (
        |  SELECT p_partkey AS b_pk, p_brand, p_size,
        |    array_to_string(list_transform(generate_series(1, len(string_split(p_name, ' '))),
        |      i -> CASE WHEN (p_partkey + i) % 3 = 0
        |             THEN reverse(string_split(p_name, ' ')[i])
        |             ELSE string_split(p_name, ' ')[i] END), ' ') AS dname,
        |    CASE WHEN p_partkey % 7 = 0 THEN 'UNKNOWN' ELSE p_type END AS dtype,
        |    CAST(floor(p_retailprice * 100) AS BIGINT)
        |      + CASE WHEN p_partkey % 11 = 0 THEN 5000 ELSE 0 END AS pc2
        |  FROM part),
        |scored AS (
        |  SELECT c.p_partkey, d.b_pk,
        |    CASE WHEN CAST(floor(jaro_winkler_similarity(c.p_name, d.dname) * 10000 + 0.5) AS BIGINT) >= 8500
        |      THEN 4248 ELSE -4248 END
        |    + CASE WHEN c.p_type = d.dtype THEN 3170 ELSE -3170 END
        |    + CASE WHEN c.pc // 1000 = d.pc2 // 1000 THEN 2503 ELSE -2503 END AS w_milli
        |  FROM clean c JOIN dirty d ON c.p_brand = d.p_brand AND c.p_size = d.p_size),
        |dec AS (
        |  SELECT CASE WHEN w_milli >= 6000 THEN 'match'
        |              WHEN w_milli >= 0 THEN 'possible' ELSE 'nonmatch' END AS decision,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN p_partkey = b_pk THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |    CAST(SUM(w_milli) AS BIGINT) AS sum_w_milli
        |  FROM scored GROUP BY 1)
        |SELECT decision, n_pairs, n_true,
        |  CASE WHEN sum_w_milli >= 0 THEN (sum_w_milli * 1000) // n_pairs
        |       ELSE -((-sum_w_milli * 1000) // n_pairs) END AS mean_w_micro
        |FROM dec ORDER BY decision""".stripMargin,

    "q_dedup_savings" ->
      s"""WITH $corpusSql,
         |$shinglesSql,
         |$hshSql,
         |pairs AS (
         |  SELECT y.doc_id AS b_id,
         |    len(list_intersect(x.hs, y.hs))
         |      / len(list_distinct(list_concat(x.hs, y.hs))) AS j
         |  FROM hsh x JOIN hsh y
         |    ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.hs, y.hs))
         |        / len(list_distinct(list_concat(x.hs, y.hs))) >= 0.6),
         |cor AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc FROM corpus),
         |jm AS (
         |  SELECT b_id, CAST(floor(MAX(j) * 100) AS BIGINT) AS jc
         |  FROM pairs GROUP BY b_id),
         |dropped AS (SELECT jm.b_id, jm.jc, cor.nc FROM jm JOIN cor ON jm.b_id = cor.doc_id),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(nc) AS BIGINT) AS chars_tot
         |  FROM cor),
         |grid AS (SELECT CAST(t AS BIGINT) AS t FROM (VALUES (60), (70), (80), (90)) g(t)),
         |per AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS nd, CAST(SUM(nc) AS BIGINT) AS cd
         |  FROM dropped, grid WHERE jc >= t GROUP BY t)
         |SELECT t, COALESCE(nd, 0) AS n_dropped, COALESCE(cd, 0) AS chars_dropped,
         |  n_docs, chars_tot,
         |  (COALESCE(cd, CAST(0 AS BIGINT)) * 1000000) // chars_tot AS savings_micro
         |FROM grid LEFT JOIN per USING (t), tot
         |ORDER BY t""".stripMargin
  )
}

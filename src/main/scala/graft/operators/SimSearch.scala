package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY §2.6
  * Q-simsearch): brute-force cosine top-k as the exact baseline, and a
  * sign-random-projection (SimHash-for-vectors) bucketed variant as the
  * 100 TB scale path.
  *
  * Scale posture:
  *  - the query vector is a one-row broadcast — the "join" is a
  *    broadcast nested loop over a map-only scan; no shuffle at all.
  *  - top-k plans as TakeOrderedAndProject: per-partition heaps of k,
  *    driver merges k×partitions rows — never a global sort.
  *  - the LSH variant buckets vectors by the signs of 16 deterministic
  *    hyperplane projections; at scale the bucket id becomes a
  *    partition/cluster key so a query touches 1/65536 of the data.
  *    Probabilistic → no SQL oracle; recall is pinned by SimSearchSpec.
  */
object SimSearch {
  type Q = (SparkSession, String) => DataFrame

  /** Left-fold dot product in double precision. Floats are widened
    * BEFORE the multiply so DuckDB's DOUBLE[] dot product sees
    * bit-identical terms; both engines then fold left-to-right.
    */
  private def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"

  /** Query-vector cross join: vec_id 0's embedding against all rows.
    * Registers the graft functions + RewriteDotProducts so the HOF dot
    * idiom below compiles to the native DotProduct loop — the query
    * text stays declarative, the optimizer owns the physical form.
    */
  private def withQuery(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    // limit(1) is a no-op on the unique-key filter but makes the
    // 1-row bound PROVABLE in-plan (GlobalLimit) — the broadcast side
    // of the scan crossJoin is page-bounded by construction, and the
    // keyless-join sweep can see it without a name exemption.
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")).limit(1)
    emb.crossJoin(broadcast(q))
  }

  /** Deterministic ±1 hyperplanes: sign(j,i) from md5 — reproducible
    * across sessions and engines, no RNG state to ship.
    */
  def hyperplanes(s: SparkSession, nPlanes: Int, dim: Int): DataFrame =
    s.range(nPlanes).selectExpr("id AS j")
      .crossJoin(s.range(dim).selectExpr("id AS i"))
      .selectExpr("j", "i",
        "CASE WHEN substring(md5(concat(cast(j as string), ':', cast(i as string))), 1, 1) < '8' THEN 1.0 ELSE -1.0 END AS sign")

  /** Driver-side twin of [[hyperplanes]]' sign cell: first hex digit of
    * md5("j:i") < '8' — i.e. high nibble of the first digest byte ≤ 7.
    */
  private def planeSignPositive(j: Int, i: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((h(0) >> 4) & 0xf) < 8
  }

  /** The 16-cell FIRST-16-VECTORS codebook as plan literals — kept for
    * q_semantic_dedup, whose oracle replays this exact cosine
    * assignment (its rank-blocked pairing is hot-cell-safe by
    * construction, so balance is not load-bearing there). The
    * cone-probe candidate generators use [[trainedCentroidLits]].
    */
  private[operators] def centroidLits(s: SparkSession, d: String): Array[String] =
    Tables.embeddings(s, d).filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).map(v => s"${v}D").mkString("array(", ",", ")"))

  /** STALE coarse codebook for the IVF maintenance page
    * (q_ivf_maintain): Learn.coarseCentroids' exact recipe — K =
    * coarseK(n), k-lowest-vec_id init, ONE Lloyd round with
    * floorDiv updates — but trained over the PRE-ARRIVAL members
    * only (vec_id ≢ 11 mod 23), so arrivals route into an index that
    * has never seen them, the state every production IVF tier is in
    * between retrains. Memoized per (session, dir) like the trained
    * codebook; deliberately NOT a producer row (single consumer —
    * the q_ann_filtered "annfilt" posture). */
  private[graft] val staleCoarseMemo =
    new TtlMemo[Seq[(Int, Array[Long])]](ttlMillis = 3600L * 1000)
  private[graft] def staleCoarseCentroids(s: SparkSession, d: String): Seq[(Int, Array[Long])] =
    staleCoarseMemo.resolve(Learn.clsKey(s, d)) {
      val qdf = Tables.embeddings(s, d).filter(col("vec_id") % 23 =!= 11)
        .select(col("vec_id"), expr(Learn.QuantTok).as("qv"))
        .withColumn("qs", col("qv"))
      val k = Learn.coarseK(qdf.count())
      val init: Seq[(Int, Array[Long])] =
        qdf.orderBy(col("vec_id")).limit(k).collect().zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Long](r.fieldIndex("qs")).toArray)
        }.toSeq
      val sums = Learn.assign(qdf, init)
        .select(col("cluster"), posexplode(col("qs")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect() // k·dim rows — codebook-scale, never data-scale
      sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val cv = new Array[Long](Learn.Dim)
        rows.foreach(r => cv(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3)))
        (cid, cv)
      }
    }

  /** RE-ESTIMATED codebook: one Lloyd round of [[staleCoarseCentroids]]
    * over the FULL post-arrival membership under the ROUTED assignment
    * — exactly the update whose displacement q_ivf_maintain prices as
    * drift_d2, materialized as a servable codebook so
    * q_ivf_stale_recall can measure what that drift MEANS for recall.
    * Same memo posture as the stale book (single-consumer family). */
  private[graft] val refitCoarseMemo =
    new TtlMemo[Seq[(Int, Array[Long])]](ttlMillis = 3600L * 1000)
  private[graft] def refitCoarseCentroids(s: SparkSession, d: String): Seq[(Int, Array[Long])] =
    refitCoarseMemo.resolve(Learn.clsKey(s, d)) {
      val stale = staleCoarseCentroids(s, d)
      val sums = Learn.assignRouted(
          Tables.embeddings(s, d)
            .select(col("vec_id"), expr(Learn.QuantTok).as("qs")),
          stale)
        .select(col("cluster"), posexplode(col("qs")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect() // k·dim rows — codebook-scale, never data-scale
      sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val cv = new Array[Long](Learn.Dim)
        rows.foreach(r => cv(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3)))
        (cid, cv)
      }
    }

  /** The IVF maintenance page behind q_ivf_maintain, parameterized by
    * the ARRIVALS frame (vec_id, qs — quantized) so the streaming twin
    * ([[graft.streaming.VecStreams.ivfMaintainStream]]) can feed the
    * cumulative arrival set per trigger: existing members and arrivals
    * route through the STALE codebook ([[staleCoarseCentroids]]), and
    * the page reports per cell the arrival mass, the cohort-split
    * distortion, and one Lloyd re-estimation round's centroid drift.
    * Everything after the routed map pass shuffles at (cell) or
    * (cell, dim) grain — codebook-scale. */
  private[graft] def ivfMaintainPage(s: SparkSession, d: String,
      arrivals: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val cents = staleCoarseCentroids(s, d)
    val members = Tables.embeddings(s, d).filter(col("vec_id") % 23 =!= 11)
      .select(col("vec_id"), expr(Learn.QuantTok).as("qs"), lit(0L).as("is_new"))
      .unionByName(arrivals
        .select(col("vec_id"), col("qs"), lit(1L).as("is_new")))
    val asg = Learn.assignRouted(members, cents)
      .select(col("vec_id"), col("qs"), col("cluster").as("cell"),
        col("qdist"), col("is_new"))
      .ckpt() // read by the mass page AND the re-estimation round
    val mass = asg.groupBy(col("cell")).agg(
      sum(lit(1L) - col("is_new")).as("n_before"),
      sum(col("is_new")).as("n_added"),
      sum(when(col("is_new") === 0L, col("qdist")).otherwise(0L)).as("dist_before"),
      sum(col("qdist")).as("dist_after"))
    // ONE Lloyd update over the post-arrival membership (the
    // trainer's floorDiv recipe), then displacement vs the stale
    // centroid — the codebook frame is K driver-side rows
    val newC = asg
      .select(col("cell"), posexplode(col("qs")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .select(col("cell"), col("pos"),
        floor(col("sv").cast("double") / col("n")).cast("long").as("ctr"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("ctr")))).as("ps"))
      .select(col("cell"), transform(col("ps"), p => p.getField("ctr")).as("cv_new"))
    val oldC = {
      import s.implicits._
      cents.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cell", "cv_old")
    }
    val drift = newC.join(broadcast(oldC), "cell")
      .select(col("cell"), Learn.l2Col(col("cv_new"), col("cv_old")).as("drift_d2"))
    mass.join(drift, Seq("cell"))
      .select(col("cell").cast("long").as("cell"), col("n_before"), col("n_added"),
        expr("(n_added * 1000) DIV (n_before + n_added)").as("added_milli"),
        col("dist_before"), col("dist_after"), col("drift_d2"))
      .orderBy(col("cell"))
  }

  // The cone-probe generators (q_knn_label, q_dedup_embed) consume the
  // TRAINED ⌈√n⌉-cell codebook (Learn.coarseCentroids) as ONE typedLit
  // double-array literal. The 1e-4-grid integer centroids ride UNSCALED
  // — cosine is scale-invariant, so dividing by 10⁴ would only add a
  // float op per element. Safe by construction: the triangle-inequality
  // exactness proofs hold for ANY centroid set (centroids only pick
  // which cells are probed), so the all-pairs oracles are untouched —
  // training changes cell BALANCE, not results.

  /** Clamped arccos — numeric safety at the ±1 boundary. */
  private[operators] def angleOf(cosExpr: String): String =
    s"acos(greatest(-1.0D, least(1.0D, $cosExpr)))"

  /** Bucket id = nPlanes sign bits of hyperplane projections. The plane
    * dimension is read from the data (one-row lookup) — a silent
    * dimension mismatch would NULL every projection and collapse all
    * vectors into bucket 0.
    *
    * The planes are model *constants* (nPlanes × dim ±1 doubles, a few
    * KB), so they are folded into the plan as literal arrays and the
    * whole signature computation is one map-only, fully codegen'd pass
    * over the vectors — no crossJoin row blow-up, no groupBy shuffle.
    * The previous formulation (explode vectors × planes, aggregate sign
    * bits back) shuffled nPlanes rows per vector and ran the projection
    * as an interpreted HOF fold; at 100 TB a shuffle of 16× the corpus
    * to compute a per-row value is exactly the plan-shape bug AQE can't
    * fix for you. Bit values are unchanged (same md5 signs, same
    * ascending-i fold order), so bucket ids are stable across versions.
    */
  def signatures(s: SparkSession, d: String, nPlanes: Int = 16): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val dim = Tables.embeddings(s, d)
      .selectExpr("size(embedding)").limit(1).collect()(0).getInt(0)
    // one rp_signature call vs nPlanes inlined dot loops: identical
    // bits (same per-plane fold, strict > 0), but the generated
    // projection stays small — see CosineMulti/RpSignature scaladoc
    // for why janino compile time, not arithmetic, was the cost here
    val planes = (0 until nPlanes).map { j =>
      (0 until dim)
        .map(i => if (planeSignPositive(j, i)) "1.0D" else "-1.0D")
        .mkString("array(", ",", ")")
    }.mkString(",")
    Tables.embeddings(s, d)
      .withColumn("edbl", col("embedding").cast("array<double>"))
      .select(col("vec_id"), expr(s"rp_signature(edbl, array($planes))").as("bucket"))
  }

  /** Deterministic hash-geometric HNSW level: the first md5 byte of
    * the vec_id string as a ratio-1/4 geometric draw — lvl ≥ 1 on
    * byte ≡ 0 (mod 4), lvl ≥ 2 on byte ≡ 0 (mod 16), capped at 2. The
    * hex-digit fold parses identically in both engines (the
    * classifier-bucket recipe; the q_randwalk hash-for-RNG posture:
    * no RNG, every replica of the plan draws the same hierarchy). */
  private def hnswLevelOf(hx: Int => String): String = {
    val byte0 = s"(${hx(1)} * 16 + ${hx(2)})"
    s"(CASE WHEN $byte0 % 16 = 0 THEN 2 WHEN $byte0 % 4 = 0 THEN 1 ELSE 0 END)"
  }
  private[graft] val hnswLevelSpark = hnswLevelOf(p =>
    s"(instr('0123456789abcdef', substring(md5(CAST(vec_id AS STRING)), $p, 1)) - 1)")
  private val hnswLevelDuck = hnswLevelOf(p =>
    s"(strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), $p, 1)) - 1)")

  /** Shared HNSW layer-graph builders — ONE definition of each
    * (k, pred, tag) triple so the lifecycle queries (q_hnsw,
    * q_hnsw_batch, q_hnsw_insert), the streaming insert twin, and
    * Bench's `producer:*` rows all resolve the SAME knnCache entries
    * (the key folds pred.expr.sql in, so a drifting re-statement of
    * the predicate would silently fork the memo). Upper layers are the
    * exact 4-NN among the level-ℓ members; the insert family excludes
    * the arrival batch (vec_id ≡ 11 mod 23) — the index must not
    * contain what is being inserted. */
  private[graft] def hnswUpperSpec(l: Int): (org.apache.spark.sql.Column, String) =
    (expr(hnswLevelSpark) >= l && col("vec_id") =!= 0, s"hnsw_lvl$l")
  private[graft] def hnswUpperAdj(s: SparkSession, d: String, l: Int): DataFrame = {
    val (p, t) = hnswUpperSpec(l); Learn.exactKnnL2Among(s, d, 4, p, t)
  }
  private[graft] def hnswInsSpec(l: Int): (Int, org.apache.spark.sql.Column, String) = {
    val existing = col("vec_id") =!= 0 && col("vec_id") % 23 =!= 11
    if (l == 0) (8, existing, "hnswins_lvl0")
    else (4, existing && expr(hnswLevelSpark) >= l, s"hnswins_lvl$l")
  }
  private[graft] def hnswInsAdj(s: SparkSession, d: String, l: Int): DataFrame = {
    val (k, p, t) = hnswInsSpec(l); Learn.exactKnnL2Among(s, d, k, p, t)
  }

  /** DuckDB quantized-L2 over two BIGINT-list columns — shared by the
    * HNSW-family oracles. */
  private def duckD2(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($a) + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), " +
      s"(x, y) -> x + y)"

  /** SELECT-NEIGHBORS-HEURISTIC unroll (Algorithm 4) as DuckDB CTEs,
    * mirroring [[diversifyLinks]]: round 1 = per-qid argmin of `beam`
    * (a (qid, vec_id, d2q) CTE); round r admits candidates whose
    * d2-to-query strictly beats their min d2 to the r−1 picks, then
    * takes the argmin of those. Ties reject in both engines (strict
    * <). `vecs` is the (vec_id, qv) table covering every beam member;
    * the final pick set is `${name}_s$m` (callers must pass the SAME m as the diversifyLinks call they mirror — the default matches the family's M = 4). */
  private def duckDivSel(name: String, beam: String, vecs: String, m: Int = 4): String = {
    val pair =
      s"""${name}_pair AS MATERIALIZED (
         |  SELECT a.qid, a.vec_id AS c_id, b.vec_id AS s_id,
         |    ${duckD2("va.qv", "vb.qv")} AS d2cs
         |  FROM $beam a JOIN $beam b ON a.qid = b.qid AND a.vec_id <> b.vec_id
         |  JOIN $vecs va ON va.vec_id = a.vec_id
         |  JOIN $vecs vb ON vb.vec_id = b.vec_id)""".stripMargin
    val s1 =
      s"""${name}_s1 AS (
         |  SELECT qid, vec_id, d2q FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
         |    FROM $beam) WHERE rn = 1)""".stripMargin
    val rounds = (2 to m).map { r =>
      s"""${name}_e$r AS (
         |  SELECT c.qid, c.vec_id, c.d2q
         |  FROM $beam c
         |  JOIN ${name}_pair p ON p.qid = c.qid AND p.c_id = c.vec_id
         |  JOIN ${name}_s${r - 1} s ON s.qid = p.qid AND s.vec_id = p.s_id
         |  WHERE NOT EXISTS (SELECT 1 FROM ${name}_s${r - 1} x
         |                    WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         |  GROUP BY c.qid, c.vec_id, c.d2q
         |  HAVING c.d2q < min(p.d2cs)),
         |${name}_s$r AS (
         |  SELECT * FROM ${name}_s${r - 1}
         |  UNION ALL
         |  SELECT qid, vec_id, d2q FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
         |    FROM ${name}_e$r) WHERE rn = 1)""".stripMargin
    }
    (Seq(pair, s1) ++ rounds).mkString(",\n")
  }

  /** The insert family's INDEX-SIDE vector frame (existing members
    * with quantized vectors + levels), memoized like the layer graphs:
    * the streaming insert twin resolves it every micro-batch and must
    * read persisted blocks, never re-scan the corpus per trigger. */
  private[graft] val hnswEmbCache = new CachedRelation(ttlMillis = 3600L * 1000)
  private[graft] def hnswEmbKey(s: SparkSession, d: String): String =
    s"${System.identityHashCode(s)}:$d"
  private[graft] def hnswInsEmb(s: SparkSession, d: String): DataFrame =
    hnswEmbCache.resolveProbed(hnswEmbKey(s, d)) {
      Tables.embeddings(s, d)
        .filter(col("vec_id") =!= 0 && col("vec_id") % 23 =!= 11)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv"),
          expr(hnswLevelSpark).as("lvl"))
        .ckpt()
    }

  /** HNSW DELETE core — repair pages for the survivors affected by a
    * tombstone frame `tomb0` = (vec_id rows to erase), against the
    * memoized directed M-link lists (the exactKnnL2 index):
    * candidates = surviving links ∪ 2-hop bridges through each deleted
    * neighbor, re-selected with Algorithm 4 ([[diversifyLinks]]).
    * Repairs always derive from the PRISTINE index + the full
    * tombstone set (never iteratively from a prior repair), so a
    * bridge target deleted by a LATER tombstone batch simply drops out
    * of the recomputed candidates — which is what lets the streaming
    * twin (graft.streaming.VecStreams.hnswDeleteStream) emit the exact
    * batch page per trigger from cumulative tombstone state.
    *
    * Shared by q_hnsw_delete (tombstones = the vec_id ≡ 3 mod 29
    * batch) and the streaming twin. Cost: \|affected\|·M(1+M)
    * candidate rows — tombstone scale, never corpus scale; the
    * tombstone side broadcasts into every join. */
  private[graft] def hnswDeleteRepair(s: SparkSession, d: String, tomb0: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val M = 4
    val tomb = tomb0.select(col("vec_id")).distinct().ckpt()
    val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), expr(Learn.QuantTok).as("nv")).ckpt()
    // the index's directed M-link lists (rank over the full corpus,
    // 0-edges dropped — the exactKnnL2 convention)
    val links = Learn.exactKnnL2(s, d, 8)
      .filter(col("a_id") =!= 0 && col("b_id") =!= 0 && col("rn") <= M)
      .select(col("a_id"), col("b_id"))
      .ckpt() // read as lost-page, keep-side, and bridge hop
    val lost = links
      .join(broadcast(tomb.select(col("vec_id").as("b_id"))), Seq("b_id"), "left_semi")
      .join(broadcast(tomb.select(col("vec_id").as("a_id"))), Seq("a_id"), "left_anti")
    val affected = lost.groupBy(col("a_id")).agg(count(lit(1)).as("n_lost")).ckpt()
    val keep = links
      .join(affected.select(col("a_id")), "a_id")
      .join(broadcast(tomb.select(col("vec_id").as("b_id"))), Seq("b_id"), "left_anti")
      .select(col("a_id"), col("b_id"))
    val bridges = lost.select(col("a_id"), col("b_id").as("mid"))
      .join(links.select(col("a_id").as("mid"), col("b_id").as("c_id")), "mid")
      .join(broadcast(tomb.select(col("vec_id").as("c_id"))), Seq("c_id"), "left_anti")
      .filter(col("c_id") =!= col("a_id"))
      .select(col("a_id"), col("c_id").as("b_id"))
    val cand = keep.unionByName(bridges).distinct()
      .join(emb.select(col("vec_id").as("a_id"), col("nv").as("qv")), "a_id")
      .join(emb.select(col("vec_id").as("b_id"), col("nv")), "b_id")
      .select(col("a_id").as("qid"), col("b_id").as("vec_id"),
        expr("aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
          .as("d2q"))
    val repaired = diversifyLinks(cand, emb, M)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_links_after"), min(col("d2q")).as("best_link_d2"),
        sum(col("vec_id")).as("links_sum"))
    affected.join(repaired, col("a_id") === col("qid"), "left")
      .select(col("a_id"), col("n_lost"),
        coalesce(col("n_links_after"), lit(0L)).as("n_links_after"),
        col("best_link_d2"), col("links_sum"))
      .orderBy(col("a_id"))
  }

  /** SELECT-NEIGHBORS-HEURISTIC (Malkov & Yashunin 2018, Algorithm 4)
    * over a per-qid candidate page: scanning candidates by distance to
    * the query, KEEP c only if it is strictly closer to the query than
    * to every already-kept link — each kept link then covers a
    * distinct direction around the new node, which is what preserves
    * graph navigability at the same M (naive top-M links cluster on
    * one side of the node when the beam landed in a tight region; the
    * r13 measurement that motivated this: top-M link quality needed
    * ef=16 to reach what the heuristic gives at ef=8 — Round14Spec
    * pins the recall comparison).
    *
    * Declarative unroll, no collect (the q_logreg_gd posture): round 1
    * takes the per-qid argmin; round r admits candidates whose
    * d2-to-query beats their MIN d2 to the r−1 picks and takes the
    * argmin of those. Provably the paper's sequential scan: the accept
    * condition only HARDENS as picks accumulate, so the scan's next
    * accepted candidate is exactly the round's minimal eligible one.
    * Ties (d2-to-query = d2-to-pick) reject, in both engines.
    *
    * `beam` = (keyCols..., vec_id, d2q); `vecs` = (vec_id, nv) covering
    * every beam member. Pairwise cost is |Q|·ef² rows — query-page
    * scale, never corpus scale. Returns (keyCols..., vec_id, d2q) of
    * ≤ m picks per key.
    *
    * `keyCols` generalizes the per-query key to a COMPOSITE (r14
    * VERDICT #2): selection state is independent per key, so callers
    * with several independent selection pages (q_hnsw_insert's three
    * per-layer link selections) union them under a (qid, layer) key
    * and pay ONE set of m+1 checkpoint jobs instead of one per page —
    * result-identical by construction (every join, window, and
    * aggregate here is keyed), measured ~3× fewer jobs on the insert
    * path whose cost was job-count overhead, not data. */
  private[graft] def diversifyLinks(beam: DataFrame, vecs: DataFrame, m: Int,
      keyCols: Seq[String] = Seq("qid")): DataFrame = {
    val key = keyCols.map(col)
    // r15 OPTIMIZATION: the selection rounds are now a WINDOWED STATE
    // CHAIN instead of per-round checkpointed sel-frames. The old form
    // read `sel` twice per round (union + dmin join), which forced an
    // eager checkpoint every round — m+2 actions of job-count overhead
    // on a page-scale frame (the r14 bench's q_hnsw_insert spread was
    // exactly this). The state form carries, per beam row, a picked
    // flag and the running min d² to the picks so far (`__dminp`), so
    // each round reads the state ONCE (one window argmin + one
    // broadcast join against the pairwise table) and the whole
    // selection is one linear plan with two checkpoints total (the
    // beam and the pairwise table), not m+2.
    //
    // Equivalence to Algorithm 4 (the paper's sequential scan — see
    // the scaladoc above): round r's eligible set is {unpicked c :
    // d2q(c) < min over picks p of d²(c,p)}; the old form recomputed
    // that min from pair⋈sel each round, the state form accumulates it
    // incrementally via least() over each round's single new pick —
    // identical sets, identical (d2q, vec_id) argmin, identical strict
    // tie-reject. A round with no eligible candidate picks nothing and
    // every later round is provably also empty (the accept condition
    // only hardens), matching the old empty-nxt union.
    val b = beam.ckpt() // read by the pair build AND as the state base
    val pair = {
      val withV = b.join(vecs.select(col("vec_id"), col("nv")), "vec_id")
      withV
        .select(key :+ col("vec_id").as("c_id") :+ col("nv").as("cv"): _*)
        .join(withV.select(key :+ col("vec_id").as("s_id") :+ col("nv").as("sv"): _*), keyCols)
        .filter(col("c_id") =!= col("s_id"))
        .select(key :+ col("c_id") :+ col("s_id") :+
          expr("aggregate(zip_with(cv, sv, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
            .as("d2cs"): _*)
        .ckpt() // read by every selection round (page-scale — |Q|·ef²
                // rows at ANY corpus size, hence broadcast below)
    }
    val wKey = Window.partitionBy(key: _*)
    // round 1: per-key argmin of the beam (min over a struct is the
    // lexicographic (d2q, vec_id) argmin — the rankQ === 1 row)
    var state = b
      .withColumn("__m", min(struct(col("d2q"), col("vec_id"))).over(wKey))
      .select(key ++ Seq(col("vec_id"), col("d2q"),
        (col("vec_id") === col("__m.vec_id")).as("__picked"),
        col("__m.vec_id").as("__new")): _*)
    for (r <- 2 to m) {
      // d² from every row to the round's new pick (null when the round
      // picked nothing — least() then keeps the running min unchanged)
      val p = pair.select(key ++ Seq(col("c_id").as("vec_id"),
        col("s_id").as("__new"), col("d2cs").as("__dnew")): _*)
      val upd = state
        .join(broadcast(p), keyCols ++ Seq("vec_id", "__new"), "left")
        .withColumn("__dminp",
          if (r == 2) col("__dnew") else least(col("__dminp"), col("__dnew")))
        .drop("__new", "__dnew")
      val elig = when(!col("__picked") && col("d2q") < col("__dminp"),
        struct(col("d2q"), col("vec_id")))
      state = upd
        .withColumn("__m", min(elig).over(wKey))
        .select(key ++ Seq(col("vec_id"), col("d2q"),
          (col("__picked") ||
            (col("__m").isNotNull && col("vec_id") === col("__m.vec_id"))).as("__picked"),
          col("__m.vec_id").as("__new"), col("__dminp")): _*)
    }
    state.filter(col("__picked")).select(key :+ col("vec_id") :+ col("d2q"): _*)
  }

  /** Symmetrized adjacency WITH SELF-LOOPS — the fused-walk form of
    * the family's `sym` helper (r15 OPTIMIZATION). A beam-search hop
    * needs candidates = neighbors(beam) ∪ beam; expressing the union
    * explicitly reads the beam twice per hop, which forces an eager
    * checkpoint every hop (without it the recompute doubles per hop) —
    * the per-hop job-count overhead that dominated the whole HNSW
    * family at page scale. With a self-loop row per node, ONE inner
    * equi-join against this frame emits neighbors AND the node itself,
    * the beam is read exactly once per hop, and a multi-hop walk runs
    * as one linear plan with no per-hop checkpoint (measured at sf0.1:
    * q_hnsw_batch 110 jobs → 33, ~2× wall). The inner join also keeps
    * the 100 TB shape: the page-scale beam side of an inner join is
    * broadcastable (a left-outer's preserved side is not).
    *
    * Every walk's beam vec_ids are drawn from the graph's own node set
    * (entries and neighbors), so the self-loop rows cover every beam
    * member and candidate sets are IDENTICAL to the explicit union. */
  private[graft] def symSelf(adj: DataFrame): DataFrame = {
    val s = adj.select(col("a_id"), col("b_id")).unionByName(
      adj.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    s.unionByName(s.select(col("a_id")).distinct()
      .select(col("a_id"), col("a_id").as("b_id")))
  }

  /** One fused expansion step over a self-loop adjacency: candidates =
    * beam ∪ neighbors(beam), beam read ONCE (see [[symSelf]]). `tag`
    * columns (ef / fraction keys) ride the beam; pass adjacency-side
    * join keys beyond a_id via `adjKeys` (q_hnsw_compact's per-fraction
    * graphs join on (f, a_id)). */
  private[graft] def expandOnce(beam: DataFrame, adjSelf: DataFrame,
      keyCols: Seq[String], adjKeys: Seq[String] = Nil): DataFrame =
    adjSelf
      .join(beam.select(keyCols.map(col) :+ col("vec_id").as("a_id"): _*),
        adjKeys :+ "a_id")
      .select((keyCols.map(col) :+ col("b_id").as("vec_id")): _*)
      .distinct()

  /** INCREMENTAL HNSW INSERT core — link pages for an ARRIVAL frame
    * `nu0` = (qid, qv, qlvl) against the persisted existing-members
    * layer graphs ([[hnswInsAdj]], memoized index builds — never
    * rebuilt per batch or per trigger). Shared by the batch query
    * q_hnsw_insert (arrivals = the vec_id ≡ 11 mod 23 holdout) and the
    * streaming twin (graft.streaming.VecStreams.hnswInsertStream runs
    * it per micro-batch; per-qid search state never crosses qids, so a
    * split feed replays the batch page bit-for-bit — pinned by
    * Round14Spec).
    *
    * Search: ef=8 beam per upper layer (2 hops), layer 0 at the batch
    * operating point (ef=16 over 6 hops); links per layer ≤ the node's
    * level via [[diversifyLinks]] (Algorithm 4), M = 4. */
  private[graft] def hnswInsertLinks(s: SparkSession, d: String, nu0: DataFrame): DataFrame =
    insertLinksPage(hnswInsertPicks(s, d, nu0))

  /** The per-(arrival, layer) link-page aggregate over a picks frame. */
  private def insertLinksPage(picks: DataFrame): DataFrame =
    picks
      .groupBy(col("qid"), col("layer"))
      .agg(count(lit(1)).as("n_links"), min(col("d2q")).as("best_link_d2"),
        sum(col("vec_id")).as("links_sum"))
      .select(col("qid").as("new_id"), col("layer"),
        col("n_links"), col("best_link_d2"), col("links_sum"))
      .orderBy(col("new_id"), col("layer"))

  /** The canonical HOLDOUT arrival frame (vec_id ≡ 11 mod 23) — the
    * batch q_hnsw_insert and the lifecycle capstone both insert exactly
    * this set. */
  private[graft] def holdoutArrivals(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0 && col("vec_id") % 23 === 11)
      .select(col("vec_id").as("qid"), expr(Learn.QuantTok).as("qv"),
        expr(hnswLevelSpark).as("qlvl"))

  /** [[hnswInsertPicks]] for the canonical holdout batch, MEMOIZED per
    * (session, dir) — r15: q_hnsw_insert and q_hnsw_lifecycle each ran
    * the identical multi-layer search + Algorithm-4 selection for the
    * same arrival set (the lifecycle wires the same picks into its
    * composed graph that the insert page fingerprints), which is the
    * producer pattern: build once, serve both. Priced by the
    * producer:hnswins_picks bench row; the streaming twin keeps calling
    * the RAW hnswInsertPicks per micro-batch (its arrival frames
    * differ per trigger and must never share this entry). */
  private[graft] val insertPicksCache = new CachedRelation(ttlMillis = 3600L * 1000)

  private[graft] def holdoutInsertPicks(s: SparkSession, d: String): DataFrame =
    insertPicksCache.resolveProbed(hnswEmbKey(s, d)) {
      hnswInsertPicks(s, d, holdoutArrivals(s, d)).ckpt()
    }

  /** The RAW per-(arrival, layer) link picks behind [[hnswInsertLinks]]
    * — (qid, layer, vec_id, d2q) rows, ≤ M per key. Exposed so the
    * lifecycle capstone (q_hnsw_lifecycle) can wire the selected links
    * into a composed graph instead of only reading the aggregate
    * fingerprint page. */
  private[graft] def hnswInsertPicks(s: SparkSession, d: String, nu0: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val M = 4; val Ef = 8
    val emb = hnswInsEmb(s, d)
    val nu = nu0.ckpt() // the arrival batch: broadcast into every hop
    val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    def scored(cand: DataFrame): DataFrame = cand
      .join(emb.select(col("vec_id"), col("nv")), "vec_id")
      .join(broadcast(nu.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("vec_id"), expr(d2).as("d2q"))
    // layer graphs over the EXISTING members only (kNN AMONG the
    // subset — the arrival batch is not in the index yet), self-loop
    // augmented so each hop reads the beam once ([[symSelf]], r15)
    def adjAt(l: Int): DataFrame = symSelf(hnswInsAdj(s, d, l)
      .select(col("a_id"), col("b_id"))).ckpt()
    val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
    val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
    val e0 = emb.agg(min(col("vec_id")).as("e0"))
    val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
      .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
    val rankQ = row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id")))
    var beam = scored(nu.select(col("qid")).crossJoin(broadcast(entry)))
    var selPages = Seq.empty[DataFrame]
    // layer 0 searches at the batch-search operating point (ef = 16
    // over 6 hops — measured there: 0.94 recall@1 vs 0.50 at ef=8/4);
    // the sparse upper layers need only the narrow beam.
    // FUSED hops (r15): each hop reads the previous beam exactly once
    // (expandOnce over the self-loop adjacency), so a layer's whole
    // walk is one linear plan; only the LAYER-BOUNDARY beam is
    // checkpointed (it is read twice — by the level-filtered selection
    // page and by the next layer's first hop).
    for ((l, hops, keep) <- Seq((2, 2, Ef), (1, 2, Ef), (0, 6, 16))) {
      val adj = adjAt(l)
      for (_ <- 1 to hops) {
        beam = scored(expandOnce(beam, adj, Seq("qid")))
          .withColumn("rn", rankQ).filter(col("rn") <= keep).drop("rn")
      }
      beam = beam.ckpt()
      // select links ONLY for arrivals whose level reaches this layer
      // (r14 review): the geometric draw leaves ~1/16 of the batch at
      // layer 2 and ~1/4 at layer 1, and running the 3-round selection
      // for everyone just to drop the rows afterwards paid the
      // dominant per-layer cost for nothing — per-qid selection state
      // is independent, so pre-filtering the beam is result-identical
      val levelQids = nu.filter(col("qlvl") >= l).select(col("qid"))
      selPages = selPages :+ beam.join(broadcast(levelQids), "qid")
        .select(col("qid"), lit(l.toLong).as("layer"), col("vec_id"), col("d2q"))
    }
    // ONE Algorithm-4 selection over the union of the level-filtered
    // final beams, keyed by the composite (qid, layer) — per-key
    // selection state is independent, so this is result-identical to
    // the old one-call-per-layer form while paying the m+1 checkpoint
    // jobs ONCE instead of three times (r14 VERDICT #2: the insert
    // path's 5.7–11.5 s spread was job-count overhead at page scale,
    // not data; scheduling ~15 small jobs dominated the query).
    diversifyLinks(selPages.reduce(_ unionByName _), emb, M,
      keyCols = Seq("qid", "layer"))
  }

  val queries: Map[String, Q] = Map(
    // GRAPH-BASED ANN (the NSW/HNSW base layer, Malkov & Yashunin
    // 2018): BEAM search over the k-NN graph — keep the ef=8 closest
    // frontier, expand every frontier node's neighbors each hop, trim
    // back to ef by exact distance. This is the missing serving
    // family next to IVF/PQ/LSH/BQ: no codebook, no buckets —
    // navigation over the (memoized, provably-exact) Learn.exactKnnL2
    // 8-NN graph, HNSW's layer-0 with a deterministic entry instead
    // of the layer hierarchy (pure greedy ef=1 parks in a local
    // minimum one hop in on this corpus; ef=8 reaches the true NN by
    // hop ~3 at every fixture SF — the measured reason HNSW carries a
    // beam at all). The output is the per-hop TRACE (beam best, exact
    // quantized d², did the best improve) against the brute-force
    // true-NN distance — the serving path and its recall audit in
    // one page.
    //
    // Scale posture: the distance table is ONE map-only pass (the
    // limit(1) query vector broadcast), each hop is one equi-join of
    // the ≤ ef·k candidate page — at 100 TB the graph is the big
    // object and hops touch ef·k rows each; nothing else moves.
    // 8 hops fixed; the oracle unrolls them CTE-for-CTE.
    "q_graph_ann" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val H = 8; val Ef = 8
      val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0)
        .select(expr(Learn.QuantTok).as("qv")).limit(1)
      val dq = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv"))
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), expr(d2).as("d2q"))
        .ckpt() // every hop's trim and the true-NN page read it
      // 8-NN graph (node 0 excluded AFTER ranking — its neighbors keep
      // their true rank order, just lose the query itself as a hop target)
      val adj = Learn.exactKnnL2(s, d, Ef)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id"))
      def best(beam: DataFrame): DataFrame =
        beam.agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      var beam = dq.orderBy(col("vec_id")).limit(1).ckpt()
      var trace = Seq(best(beam)
        .select(lit(0L).as("hop"), col("vec_id"), col("d2q"), lit(0L).as("moved")))
      for (h <- 1 to H) {
        val nbrs = adj.join(broadcast(beam.select(col("vec_id").as("a_id"))), "a_id")
          .select(col("b_id").as("vec_id")).distinct()
          .unionByName(beam.select(col("vec_id"))).distinct()
        val nxt = nbrs.join(dq, "vec_id")
          .orderBy(col("d2q"), col("vec_id")).limit(Ef)
          .ckpt() // read by the trace page AND the next hop
        trace = trace :+ best(nxt)
          .crossJoin(broadcast(best(beam).select(col("vec_id").as("prev"))))
          .select(lit(h.toLong).as("hop"), col("vec_id"), col("d2q"),
            when(col("vec_id") === col("prev"), 0L).otherwise(1L).as("moved"))
        beam = nxt
      }
      val trueNN = dq.agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
        .select(col("m.d2q").as("true_nn_d2"))
      trace.reduce(_ unionByName _)
        .crossJoin(broadcast(trueNN))
        .select(col("hop"), col("vec_id").as("node_id"), col("d2q"), col("moved"),
          col("true_nn_d2"),
          when(col("d2q") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("hop"))
    }),

    // MULTI-LAYER HNSW (Malkov & Yashunin 2018, the full hierarchy) —
    // what makes graph-ANN hop counts LOGARITHMIC at 100 TB: q_graph_ann's
    // layer-0 beam starts cold at a fixed entry and pays O(diameter)
    // hops; HNSW assigns each node a geometric level (P[lvl ≥ ℓ] =
    // 4^-ℓ — here a DETERMINISTIC md5-byte draw, the q_randwalk
    // hash-for-RNG recipe, so both engines replay the same hierarchy),
    // descends the upper layers GREEDILY (long edges over the sparse
    // top), and hands the layer-0 beam a warm start next to the target.
    //
    // Upper-layer adjacency is the exact 4-NN AMONG the layer members
    // (Learn.exactKnnL2Among — the member-filtered slice of the full
    // kNN graph would be near-empty at 1/4 sampling; the subset kNN is
    // the navigable graph the paper builds). Greedy steps carry the
    // monotone "stay if no improvement" semantics — candidates always
    // include the current node — so the fixed per-layer hop budget
    // (2 per upper layer) is replayable: exhausted improvement = no-op
    // rows, never divergence. Layer 0 runs the proven ef=8 beam for 4
    // hops (HALF q_graph_ann's 8 — the warm start is the point; the
    // Round13 spec pins that it still reaches the true NN no later).
    //
    // Output: the full descent+beam TRACE (step ordinal, layer, hop,
    // node, exact quantized d², moved flag) against the brute-force
    // true-NN distance. Scale posture: each greedy step is one
    // equi-join of a 1-row broadcast frame against the layer graph;
    // each beam hop touches ≤ ef·k candidate rows; the three kNN
    // graphs are memoized builds (top layers geometrically cheaper).
    "q_hnsw" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val H0 = 4; val Ef = 8; val Hu = 2
      val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0)
        .select(expr(Learn.QuantTok).as("qv")).limit(1)
      val dq = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv"),
          expr(hnswLevelSpark).as("lvl"))
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("lvl"), expr(d2).as("d2q"))
        .ckpt() // read by every step's candidate join + the true-NN page
      // layer 0 = the full corpus 8-NN (shared memo with q_graph_ann);
      // upper layers = exact 4-NN among the level-ℓ members, query node
      // excluded from membership (it is the target, never a waypoint)
      val adj0 = Learn.exactKnnL2(s, d, Ef)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id"))
      def adjUp(l: Int) = hnswUpperAdj(s, d, l)
        .select(col("a_id"), col("b_id"))
      // entry: lowest id on the highest non-empty layer (deterministic;
      // on a fixture whose top layer drew empty the descent's top-layer
      // steps are provable no-ops, not failures)
      val e2 = dq.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = dq.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = dq.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      var cur = entry.join(dq.select(col("vec_id"), col("d2q")), "vec_id")
        .limit(1) // semantically a no-op (vec_id unique) — makes the
                  // 1-row bound PROVABLE in-plan for the keyless-join
                  // sweep (the r12 broadcast-side recipe)
        .ckpt()
      var step = 0L
      def traceRow(frame: DataFrame, layer: Int, hop: Int, prev: DataFrame) = {
        val r = frame
          .crossJoin(broadcast(prev.select(col("vec_id").as("prev"))))
          .select(lit(step).as("step"), lit(layer.toLong).as("layer"),
            lit(hop.toLong).as("hop"), col("vec_id"), col("d2q"),
            when(col("vec_id") === col("prev"), 0L).otherwise(1L).as("moved"))
        step += 1
        r
      }
      var trace = Seq(traceRow(cur, 2, 0, cur))
      for (l <- Seq(2, 1); h <- 1 to Hu) {
        val adj = adjUp(l)
        val cand = adj
          .join(broadcast(cur.select(col("vec_id").as("a_id"))), "a_id")
          .select(col("b_id").as("vec_id"))
          .unionByName(cur.select(col("vec_id"))).distinct()
          .join(dq.select(col("vec_id"), col("d2q")), "vec_id")
        val nxt = cand.orderBy(col("d2q"), col("vec_id")).limit(1)
          .ckpt() // read by the trace row AND the next step
        trace = trace :+ traceRow(nxt, l, h, cur)
        cur = nxt
      }
      var beam = cur
      for (h <- 1 to H0) {
        val cand = adj0
          .join(broadcast(beam.select(col("vec_id").as("a_id"))), "a_id")
          .select(col("b_id").as("vec_id"))
          .unionByName(beam.select(col("vec_id"))).distinct()
          .join(dq.select(col("vec_id"), col("d2q")), "vec_id")
        val nxt = cand.orderBy(col("d2q"), col("vec_id")).limit(Ef)
          .ckpt()
        val best = nxt.agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
        val prevBest = beam.agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("m.vec_id").as("vec_id"))
        trace = trace :+ traceRow(best, 0, h, prevBest)
        beam = nxt
      }
      val trueNN = dq.agg(min(col("d2q")).as("true_nn_d2"))
      trace.reduce(_ unionByName _)
        .crossJoin(broadcast(trueNN))
        .select(col("step"), col("layer"), col("hop"),
          col("vec_id").as("node_id"), col("d2q"), col("moved"),
          col("true_nn_d2"),
          when(col("d2q") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("step"))
    }),

    // BATCHED multi-query HNSW — the SERVING shape: one declarative
    // plan carries a PAGE of queries (vec_id ≡ 7 mod 31) through the
    // same hierarchy q_hnsw walks for one. Per-query search state is a
    // (qid, vec_id, d2q) frame — greedy steps are per-qid argmin
    // AGGREGATES, the layer-0 beam is a per-qid rank window (ef = 8) —
    // so a hop for the whole batch is ONE equi-join of |Q|·ef·k
    // candidate rows against the layer graph, and adding queries
    // widens the frame without adding jobs. All queries share the
    // single top-layer entry point (the HNSW contract).
    //
    // The per-query verdict page reports found vs TRUE NN (ground
    // truth read off the memoized exact 8-NN index — provably exact,
    // no extra brute-force pass) — recall@1 of the hierarchy at batch
    // grain, the number an ANN serving tier actually monitors.
    // Node 0 is excluded corpus-wide (the family's singleton-query
    // convention; the layer graphs are shared memo builds with q_hnsw).
    "q_hnsw_batch" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val H0 = 6; val Ef = 16; val Hu = 2
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv"),
          expr(hnswLevelSpark).as("lvl"))
        .ckpt() // read by every hop's candidate join + entry + queries
      val queries = emb.filter(col("vec_id") % 31 === 7)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
      // self scores a sentinel ∞ (> any real d² ≤ 64·(2·10⁴)²), NOT a
      // filter: dropping the row would silently erase a query whose
      // search state is momentarily just itself (e.g. a query that IS
      // the shared entry node) — the penalty keeps the frame alive so
      // its neighbors still expand next hop, and self never wins
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      // UNDIRECTED links (the paper's form): a node is reachable from
      // its neighbors too, not only the other way. Measured recall@1
      // on the fixture page: 0.50 at the directed ef=8/4-hop baseline,
      // 0.94 with symmetric links + ef=16 over 6 hops — the knob
      // ladder every HNSW deployment climbs, here with each rung
      // oracle-replayable
      // self-loop symmetric layer graphs: each hop reads the beam once
      // (expandOnce), so the WHOLE descent+beam walk is one linear plan
      // with no per-hop checkpoint ([[symSelf]], r15 — 110 jobs → ~33
      // measured at sf0.1, identical rows)
      val adj0 = symSelf(Learn.exactKnnL2(s, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id"))).ckpt()
      def adjUp(l: Int) = symSelf(hnswUpperAdj(s, d, l)
        .select(col("a_id"), col("b_id"))).ckpt()
      val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = emb.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      def argminPerQ(sc: DataFrame): DataFrame =
        sc.groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      var cur = argminPerQ(scored(
          queries.select(col("qid")).crossJoin(broadcast(entry))))
      for (l <- Seq(2, 1)) {
        val adj = adjUp(l)
        for (_ <- 1 to Hu)
          cur = argminPerQ(scored(expandOnce(cur, adj, Seq("qid"))))
      }
      var beam = cur
      for (_ <- 1 to H0) {
        beam = scored(expandOnce(beam, adj0, Seq("qid")))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id"))))
          .filter(col("rn") <= Ef).drop("rn")
      }
      val best = argminPerQ(beam)
        .select(col("qid"), col("vec_id").as("found_id"), col("d2q").as("found_d2"))
      val truth = Learn.exactKnnL2(s, d, 8)
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("b_id") =!= 0)
        .groupBy(col("a_id"))
        .agg(min(struct(col("d2"), col("b_id"))).as("m"))
        .select(col("a_id").as("qid"), col("m.d2").as("true_nn_d2"))
      best.join(truth, "qid")
        .select(col("qid"), col("found_id"), col("found_d2"), col("true_nn_d2"),
          when(col("found_d2") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("qid"))
    }),

    // INCREMENTAL HNSW INSERT (r13; r14: heuristic link selection) —
    // index MAINTENANCE, not rebuild: a held-out arrival batch
    // (vec_id ≡ 11 mod 23) gets its levels from the same deterministic
    // draw and its per-layer LINKS by the paper's insert algorithm —
    // SEARCH the existing graph (beam per layer, descending), then
    // link via SELECT-NEIGHBORS-HEURISTIC over each layer's final beam
    // ([[diversifyLinks]], Algorithm 4 — keep a candidate only if it
    // is closer to the new node than to every already-kept link), at
    // every layer ≤ the new node's level. This is what makes HNSW an
    // online index: an insert costs one multi-layer search (the
    // q_hnsw_batch machinery — the whole batch rides one plan), never
    // a graph rebuild; at 100 TB the existing layer graphs are the
    // persisted index and only the batch-side beams move. Core shared
    // with the streaming twin: [[hnswInsertLinks]].
    //
    // Output: the per-(new vector, layer) link page — link count
    // (≤ M = 4; can be < M where the heuristic prunes a crowded beam),
    // nearest-link distance, and the link-id sum (the deterministic
    // set fingerprint the oracle replays — the oracle unrolls the
    // SAME greedy selection, so the diversity semantics are
    // hash-checked, not just spec-asserted). Layer rows exist only
    // where the node's level reaches the layer.
    "q_hnsw_insert" -> ((s, d) =>
      // the holdout picks are the memoized shared build (r15) — the
      // lifecycle capstone wires the same selection into its composed
      // graph, so the search+selection runs once per session
      insertLinksPage(holdoutInsertPicks(s, d))),

    // HNSW EF-SWEEP (r14) — the serving-knob calibration page, the
    // q_lsh_tuning / q_dedup_embed_sweep of the graph-ANN family:
    // recall@1 and total distance regret of the SAME query page
    // (vec_id ≡ 7 mod 31) through the SAME hierarchy at layer-0 beam
    // widths ef ∈ {4, 8, 16} — the one knob an HNSW serving tier
    // actually turns, measured on-engine so capacity planning reads a
    // table instead of re-deriving it. The upper-layer greedy descent
    // is ef-INDEPENDENT and computed once; the three ef branches then
    // ride ONE ef-tagged layer-0 beam frame (r15 — 6 hop jobs total,
    // not 6 per branch) against the shared memoized graphs. Ground
    // truth reads the memoized exact index (no extra brute-force
    // pass). Regret = Σ(found d² − true d²): the miss MAGNITUDE, which
    // recall alone hides (an ef=4 miss that lands at the 2nd NN is not
    // an ef=4 miss that parks across the graph).
    "q_hnsw_tuning" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val Hu = 2; val H0 = 6
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv"),
          expr(hnswLevelSpark).as("lvl"))
        .ckpt() // read by every hop's candidate join + entry + queries
      val queries = emb.filter(col("vec_id") % 31 === 7)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      // self-loop symmetric graphs + fused hops (r15 — see [[symSelf]])
      val adj0 = symSelf(Learn.exactKnnL2(s, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id"))).ckpt()
      def adjUp(l: Int) = symSelf(hnswUpperAdj(s, d, l)
        .select(col("a_id"), col("b_id"))).ckpt()
      val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = emb.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      def argminPerQ(sc: DataFrame): DataFrame =
        sc.groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      // shared ef-independent descent (the q_hnsw_batch upper walk),
      // fused; checkpointed ONCE at the handoff — the three ef branches
      // each read it
      var cur = argminPerQ(scored(
          queries.select(col("qid")).crossJoin(broadcast(entry))))
      for (l <- Seq(2, 1)) {
        val adj = adjUp(l)
        for (_ <- 1 to Hu)
          cur = argminPerQ(scored(expandOnce(cur, adj, Seq("qid"))))
      }
      cur = cur.ckpt()
      val truth = Learn.exactKnnL2(s, d, 8)
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("b_id") =!= 0)
        .groupBy(col("a_id"))
        .agg(min(struct(col("d2"), col("b_id"))).as("m"))
        .select(col("a_id").as("qid"), col("m.d2").as("true_nn_d2"))
      // ALL THREE ef branches ride ONE ef-tagged beam frame (the
      // q_hnsw_compact composite recipe, r15): beams evolve
      // independently under a (ef, qid) rank partition with a per-row
      // cutoff, so each hop serves every branch at once — and with the
      // fused expandOnce hops the whole 6-hop sweep is ONE linear plan
      // (no per-hop checkpoint at all). Result-identical: candidates
      // of an (ef, qid) group derive only from that group's own beam.
      def scoredE(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("ef"), col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      val rankEQ = row_number().over(
        Window.partitionBy(col("ef"), col("qid")).orderBy(col("d2q"), col("vec_id")))
      var beam = Seq(4L, 8L, 16L).map(e => cur.withColumn("ef", lit(e)))
        .reduce(_ unionByName _)
      for (_ <- 1 to H0) {
        beam = scoredE(expandOnce(beam, adj0, Seq("ef", "qid")))
          .withColumn("rn", rankEQ).filter(col("rn") <= col("ef")).drop("rn")
      }
      beam.groupBy(col("ef"), col("qid"))
        .agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
        .select(col("ef"), col("qid"), col("m.d2q").as("d2q"))
        .join(truth, "qid")
        .groupBy(col("ef"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("d2q") === col("true_nn_d2"), 1L).otherwise(0L)).as("n_reached"),
          sum(col("d2q") - col("true_nn_d2")).as("regret_d2_sum"))
        .select(col("ef"), col("n_queries"), col("n_reached"),
          expr("(n_reached * 1000) DIV n_queries").as("recall_milli"),
          col("regret_d2_sum"))
        .orderBy(col("ef"))
    }),

    // FILTERED ANN (r14) — attribute-predicate vector search, the
    // serving-tier production gap: "top-k among label = 3". Two
    // strategies at EQUAL candidate budget (ef = 8 beam, 6 hops),
    // verdict-paged against the exact member NN:
    //  - PRE-filter: search a subset graph built AMONG the qualifying
    //    members (Learn.exactKnnL2Among — at 100 TB this is the
    //    label-partitioned per-partition index every filtered-ANN tier
    //    ships; build cost amortizes over the query stream);
    //  - POST-filter: search the FULL graph, then drop non-qualifying
    //    candidates from the final beam — no extra index, but the beam
    //    budget is spent mostly on non-members, and when none of the
    //    surviving candidates qualify the query comes back EMPTY
    //    (post_d2 null, post_kept 0 — the recall loss this page
    //    measures; Round14Spec pins pre-recall ≥ post-recall).
    // Self never wins either arm (sentinel-∞ self score + excluded at
    // the verdict aggregation); both engines replay the same walks.
    "q_ann_filtered" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val Ef = 8; val Hops = 6; val Lbl = 3
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), expr(Learn.QuantTok).as("nv"))
        .ckpt() // read by every hop's candidate join + entries + truth
      val mem = emb.filter(col("label") === Lbl)
      val queries = mem.filter(col("vec_id") % 7 === 2)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("label"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"), col("label"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      val rankQ = row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id")))
      // fused hops over self-loop graphs (r15, [[symSelf]]): the beam
      // is read once per hop, so each arm's 6-hop walk is one linear
      // plan with no per-hop checkpoint. (The old per-hop-ckpt comment
      // measured the UNION-expansion lazy tower, which reads the beam
      // twice per hop and recompute-doubles — the single-read form
      // does not.)
      def beamSearch(adj: DataFrame, entry: DataFrame): DataFrame = {
        var beam = scored(queries.select(col("qid")).crossJoin(broadcast(entry)))
        for (_ <- 1 to Hops) {
          beam = scored(expandOnce(beam, adj, Seq("qid")))
            .withColumn("rn", rankQ).filter(col("rn") <= Ef).drop("rn")
        }
        beam.filter(col("vec_id") =!= col("qid"))
      }
      val memPred = col("label") === Lbl && col("vec_id") =!= 0
      val adjPre = symSelf(Learn.exactKnnL2Among(s, d, Ef, memPred, "annfilt")).ckpt()
      val adjFull = symSelf(Learn.exactKnnL2(s, d, Ef)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)).ckpt()
      val pre = beamSearch(adjPre, mem.agg(min(col("vec_id")).as("vec_id")))
        .groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
        .select(col("qid"), col("m.vec_id").as("pre_id"), col("m.d2q").as("pre_d2"))
      val post = beamSearch(adjFull, emb.agg(min(col("vec_id")).as("vec_id")))
        .filter(col("label") === Lbl)
        .groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"),
          count(lit(1)).as("post_kept"))
        .select(col("qid"), col("m.vec_id").as("post_id"),
          col("m.d2q").as("post_d2"), col("post_kept"))
      // exact truth among members, read off the memoized subset index
      val truth = Learn.exactKnnL2Among(s, d, Ef, memPred, "annfilt")
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("rn") === 1)
        .select(col("a_id").as("qid"), col("d2").as("true_d2"))
      pre.join(post, Seq("qid"), "left").join(truth, "qid")
        .select(col("qid"), col("pre_id"), col("pre_d2"),
          col("post_id"), col("post_d2"),
          coalesce(col("post_kept"), lit(0L)).as("post_kept"), col("true_d2"),
          when(col("pre_d2") === col("true_d2"), 1L).otherwise(0L).as("pre_reached"),
          when(col("post_d2") === col("true_d2"), 1L).otherwise(0L).as("post_reached"))
        .orderBy(col("qid"))
    }),

    // HNSW DELETE with neighbor repair (r14) — the third lifecycle
    // operation (search: q_hnsw/q_hnsw_batch, insert: q_hnsw_insert,
    // delete: here), because a production vector index sheds vectors
    // (GDPR erasure, retention windows, re-embeds) without a rebuild.
    // Tombstone semantics: a delete batch (vec_id ≡ 3 mod 29) leaves
    // the graph, and every SURVIVOR that linked to a deleted node
    // repairs its link list locally —
    //  candidates = its surviving links ∪ 2-HOP BRIDGES (the deleted
    //  node's own surviving links — the classic repair that preserves
    //  the path the deletion severed),
    //  re-scored by exact d², re-selected with Algorithm 4
    //  ([[diversifyLinks]] — same selection as insert, so repair
    //  cannot degrade link diversity below build quality).
    // Repair cost is |affected|·M(1+M) candidate rows — delete-batch
    // scale, never corpus scale; the kNN index is the shared memoized
    // build. Output per affected survivor: links lost, links after
    // repair, nearest repaired distance, link-id sum (the set
    // fingerprint — the oracle replays bridge collection AND the
    // greedy re-selection).
    "q_hnsw_delete" -> ((s, d) =>
      // core shared with the streaming twin ([[hnswDeleteRepair]]);
      // the tombstone batch is the vec_id ≡ 3 mod 29 holdout
      hnswDeleteRepair(s, d,
        Tables.embeddings(s, d)
          .filter(col("vec_id") =!= 0 && col("vec_id") % 29 === 3)
          .select(col("vec_id")))),

    // TOMBSTONE-FRACTION CALIBRATION (r15) — the q_hnsw_tuning of the
    // DELETE path: how much search quality survives local repair as
    // delete mass grows, the measured rebuild-vs-repair crossover a
    // production index needs for its compaction policy. Three delete
    // fractions (vec_id ≡ 3 mod 29 ≈ 3%, mod 7 ≈ 14%, mod 3 ≈ 33%)
    // each erase their batch from the flat M=4-link graph; every
    // affected survivor repairs locally (keep ∪ 2-hop bridges,
    // Algorithm-4 re-selection — the q_hnsw_delete machinery); a fixed
    // 48-query survivor panel then beam-searches each repaired graph
    // (ef = 8, 6 hops) and reports recall@1 + distance regret against
    // the exact survivor-NN truth.
    //
    // Shared-work shape (the q_hnsw_tuning discipline): ONE |panel|×n
    // distance table feeds every hop's scoring and every fraction's
    // exact truth (the panel is GlobalLimit-bounded — the q_ivf_recall
    // sampled-panel posture: a ground-truth pass inherently touches
    // every vector, so it runs once, broadcast-side bounded); the
    // three fractions' repair selections run as ONE composite-key
    // diversifyLinks call; the three beam walks ride ONE
    // fraction-tagged frame, so a hop is one join for all fractions.
    // Repair cost stays |affected|·M(1+M) per fraction; only the
    // tagged beams and the candidate pages move.
    "q_hnsw_compact" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val M = 4; val Ef = 8; val Hops = 6; val NQ = 48
      val fracs = Seq(29L, 7L, 3L)
      def tombP(c: org.apache.spark.sql.Column, f: Long) = c % f === (3L % f)
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv")).ckpt()
      // the panel: survivors under EVERY fraction, so one panel rides
      // all three branches; LIMIT makes the truth crossJoin provably
      // panel-bounded in-plan
      val queries = emb.filter(col("vec_id") % 31 === 7 &&
          fracs.map(f => !tombP(col("vec_id"), f)).reduce(_ && _))
        .orderBy(col("vec_id")).limit(NQ)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      val d2q = emb.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(
              "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
            .as("d2q"))
        .ckpt() // read by every hop's scoring + every fraction's truth
      val links = Learn.exactKnnL2(s, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0 && col("rn") <= M)
        .select(col("a_id"), col("b_id")).ckpt()
      def lostF(f: Long) =
        links.filter(!tombP(col("a_id"), f) && tombP(col("b_id"), f))
      val affected = fracs.map(f =>
          lostF(f).select(col("a_id")).distinct().withColumn("f", lit(f)))
        .reduce(_ unionByName _)
        .ckpt() // read by keep-side, edge anti-join, and the page counts
      // repair candidates for ALL fractions → ONE composite-key
      // Algorithm-4 selection (the r15 diversifyLinks form)
      val candAll = fracs.map { f =>
        val aff = affected.filter(col("f") === f).select(col("a_id"))
        val keep = links.join(aff, "a_id").filter(!tombP(col("b_id"), f))
          .select(col("a_id"), col("b_id"))
        val bridges = lostF(f).select(col("a_id"), col("b_id").as("mid"))
          .join(links.select(col("a_id").as("mid"), col("b_id").as("c_id")), "mid")
          .filter(!tombP(col("c_id"), f) && col("c_id") =!= col("a_id"))
          .select(col("a_id"), col("c_id").as("b_id"))
        keep.unionByName(bridges).distinct().withColumn("f", lit(f))
      }.reduce(_ unionByName _)
        .join(emb.select(col("vec_id").as("a_id"), col("nv").as("av")), "a_id")
        .join(emb.select(col("vec_id").as("b_id"), col("nv").as("bv")), "b_id")
        .select(col("f"), col("a_id").as("qid"), col("b_id").as("vec_id"),
          expr("aggregate(zip_with(bv, av, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("d2q"))
      val picks = diversifyLinks(candAll, emb, M, keyCols = Seq("f", "qid"))
      // repaired graph per fraction: unaffected survivors keep their
      // original links (none tombstoned, by definition); affected ones
      // carry exactly their re-selected pages. Symmetrized for search.
      val edges = fracs.map { f =>
        links.filter(!tombP(col("a_id"), f))
          .join(affected.filter(col("f") === f).select(col("a_id")),
            Seq("a_id"), "left_anti")
          .select(col("a_id"), col("b_id")).withColumn("f", lit(f))
      }.reduce(_ unionByName _)
        .unionByName(picks.select(col("f"), col("qid").as("a_id"),
          col("vec_id").as("b_id")))
      // symmetrized + per-fraction SURVIVOR self-loops (the fused-hop
      // form, r15 — see [[symSelf]]; self-loops come from the survivor
      // set, not edge endpoints, so a survivor left isolated by repair
      // still carries its own beam row exactly like the old explicit
      // union did)
      val adj = edges.unionByName(
          edges.select(col("f"), col("b_id").as("a_id"), col("a_id").as("b_id")))
        .unionByName(fracs.map(f =>
            emb.filter(!tombP(col("vec_id"), f))
              .select(lit(f).as("f"), col("vec_id").as("a_id"),
                col("vec_id").as("b_id")))
          .reduce(_ unionByName _))
        .ckpt() // read by every hop
      val entries = fracs.map(f =>
          emb.filter(!tombP(col("vec_id"), f)).agg(min(col("vec_id")).as("vec_id"))
            .withColumn("f", lit(f)))
        .reduce(_ unionByName _)
      val rankQ = row_number().over(
        Window.partitionBy(col("f"), col("qid")).orderBy(col("d2q"), col("vec_id")))
      var beam = queries.select(col("qid")).crossJoin(broadcast(entries))
        .join(d2q, Seq("qid", "vec_id"))
        .select(col("f"), col("qid"), col("vec_id"), col("d2q"))
      for (_ <- 1 to Hops) {
        beam = expandOnce(beam, adj, Seq("f", "qid"), adjKeys = Seq("f"))
          .join(d2q, Seq("qid", "vec_id"))
          .select(col("f"), col("qid"), col("vec_id"), col("d2q"))
          .withColumn("rn", rankQ).filter(col("rn") <= Ef).drop("rn")
      }
      // the per-fraction verdict pages each read the final beam — ckpt
      // ONCE here instead of once per hop (r15)
      beam = beam.ckpt()
      val pages = fracs.map { f =>
        val truth = d2q
          .filter(!tombP(col("vec_id"), f) && col("vec_id") =!= col("qid"))
          .groupBy(col("qid")).agg(min(col("d2q")).as("true_d2"))
        val found = beam.filter(col("f") === f)
          .groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.d2q").as("found_d2"))
        val verdict = found.join(truth, "qid")
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("found_d2") === col("true_d2"), 1L).otherwise(0L)).as("n_reached"),
            sum(col("found_d2") - col("true_d2")).as("regret_d2_sum"))
        val nTomb = emb.filter(tombP(col("vec_id"), f)).agg(count(lit(1)).as("n_tomb"))
        val nAff = affected.filter(col("f") === f).agg(count(lit(1)).as("n_affected"))
        verdict.crossJoin(broadcast(nTomb)).crossJoin(broadcast(nAff))
          .select(lit(f).as("tomb_mod"), col("n_tomb"), col("n_affected"),
            col("n_queries"), col("n_reached"),
            expr("(n_reached * 1000) DIV n_queries").as("recall_milli"),
            col("regret_d2_sum"))
      }
      pages.reduce(_ unionByName _).orderBy(col("n_tomb"))
    }),

    // MIXED-CRUD LIFECYCLE CAPSTONE (r15) — insert, delete, and search
    // COMPOSED in one graph, because a production index never sees the
    // operations in isolation: the arrival batch (vec_id ≡ 11 mod 23)
    // wires in with its Algorithm-4 layer-0 links ([[hnswInsertPicks]]
    // — the same selection q_hnsw_insert fingerprints), THEN the
    // tombstone batch (vec_id ≡ 3 mod 29) erases nodes from the
    // post-insert graph with local repair (keep ∪ 2-hop bridges,
    // re-selected) — and because bridges walk the POST-INSERT link
    // lists, an insert link can bridge a repaired region (the
    // composition property this query exists to prove; a tombstoned
    // ARRIVAL is likewise erased and a survivor that linked to it
    // repairs through the arrival's own picks). Finally the
    // q_hnsw_batch-shaped panel (vec_id ≡ 7 mod 31, surviving members
    // only — arrivals included) beam-searches the composed graph at
    // the batch operating point (ef = 16, 6 hops) against the exact
    // final-member NN truth.
    //
    // Scale posture: base links and the insert search read the SAME
    // memoized layer graphs as q_hnsw_insert (no new index builds);
    // repair candidates are |affected|·M(1+M); the serve walk touches
    // |panel|·ef·k rows per hop; the panel distance table is
    // GlobalLimit-bounded (the q_hnsw_compact recipe).
    "q_hnsw_lifecycle" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val M = 4; val Ef = 16; val Hops = 6; val NQ = 48
      def tombP(c: org.apache.spark.sql.Column) = c % 29 === 3
      val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(Learn.QuantTok).as("nv")).ckpt()
      // INSERT: arrivals' layer-0 selected links against the existing
      // members — the MEMOIZED holdout picks (r15): exactly the
      // selection q_hnsw_insert fingerprints, built once per session
      val arrivalEdges = holdoutInsertPicks(s, d).filter(col("layer") === 0)
        .select(col("qid").as("a_id"), col("vec_id").as("b_id"))
      // base: directed M-link lists AMONG the existing members (the
      // memoized insert-side layer-0 graph, top-M prefix)
      val baseEdges = hnswInsAdj(s, d, 0).filter(col("rn") <= M)
        .select(col("a_id"), col("b_id"))
      val g1 = baseEdges.unionByName(arrivalEdges).ckpt() // post-insert
      // DELETE with repair over the POST-INSERT lists (bridges may
      // pass through arrival links — the composition property)
      val lost = g1.filter(!tombP(col("a_id")) && tombP(col("b_id")))
      val affected = lost.select(col("a_id")).distinct().ckpt()
      val keep = g1.join(affected, "a_id").filter(!tombP(col("b_id")))
        .select(col("a_id"), col("b_id"))
      val bridges = lost.select(col("a_id"), col("b_id").as("mid"))
        .join(g1.select(col("a_id").as("mid"), col("b_id").as("c_id")), "mid")
        .filter(!tombP(col("c_id")) && col("c_id") =!= col("a_id"))
        .select(col("a_id"), col("c_id").as("b_id"))
      val cand = keep.unionByName(bridges).distinct()
        .join(emb.select(col("vec_id").as("a_id"), col("nv").as("av")), "a_id")
        .join(emb.select(col("vec_id").as("b_id"), col("nv").as("bv")), "b_id")
        .select(col("a_id").as("qid"), col("b_id").as("vec_id"),
          expr("aggregate(zip_with(bv, av, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("d2q"))
      val repaired = diversifyLinks(cand, emb, M)
        .select(col("qid").as("a_id"), col("vec_id").as("b_id"))
      val g2 = g1.filter(!tombP(col("a_id")))
        .join(affected, Seq("a_id"), "left_anti")
        .unionByName(repaired)
      val adj = g2.unionByName(
          g2.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        // survivor self-loops (fused-hop form, r15 — see [[symSelf]]):
        // candidates = beam ∪ neighbors from ONE join, beam read once
        .unionByName(emb.filter(!tombP(col("vec_id")))
          .select(col("vec_id").as("a_id"), col("vec_id").as("b_id")))
        .ckpt() // read by every serve hop
      // SERVE: the batch page through the composed graph
      val queries = emb.filter(col("vec_id") % 31 === 7 && !tombP(col("vec_id")))
        .orderBy(col("vec_id")).limit(NQ)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      val d2t = emb.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(
              "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
            .as("d2q"))
        .ckpt() // read by every hop's scoring + the truth page
      val entry = emb.filter(!tombP(col("vec_id")))
        .agg(min(col("vec_id")).as("vec_id"))
      val rankQ = row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id")))
      var beam = queries.select(col("qid")).crossJoin(broadcast(entry))
        .join(d2t, Seq("qid", "vec_id"))
        .select(col("qid"), col("vec_id"), col("d2q"))
      for (_ <- 1 to Hops) {
        beam = expandOnce(beam, adj, Seq("qid"))
          .join(d2t, Seq("qid", "vec_id"))
          .select(col("qid"), col("vec_id"), col("d2q"))
          .withColumn("rn", rankQ).filter(col("rn") <= Ef).drop("rn")
      }
      val found = beam.groupBy(col("qid"))
        .agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
        .select(col("qid"), col("m.vec_id").as("found_id"), col("m.d2q").as("found_d2"))
      val truth = d2t.filter(!tombP(col("vec_id")) && col("vec_id") =!= col("qid"))
        .groupBy(col("qid")).agg(min(col("d2q")).as("true_nn_d2"))
      found.join(truth, "qid")
        .select(col("qid"), col("found_id"), col("found_d2"), col("true_nn_d2"),
          when(col("found_d2") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("qid"))
    }),

    // Exact brute-force cosine top-20 vs the vec_id=0 query vector.
    "q_simsearch" -> ((s, d) => {
      withQuery(s, d)
        .withColumn("cos_sim", expr(
          s"round(${dot("embedding", "q_emb")} / (sqrt(${dot("embedding", "embedding")}) * sqrt(${dot("q_emb", "q_emb")})), 4)"))
        .select(col("vec_id"), col("label"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    }),

    // MATRYOSHKA truncation audit (Kusupati et al. 2022, MRL) — how
    // much retrieval quality survives keeping only the first d dims?
    // MRL-trained embeddings front-load information, so serving
    // systems keep a d=8/16/32 prefix index and re-rank with the full
    // vector; this op measures recall@10 of each prefix against the
    // full-dim brute-force top-10 — the go/no-go gate before shrinking
    // the 100 TB vector index 8×. Shape: the ×4 dim fan-out of the
    // same map-only broadcast-query scan (no joins until the 40-row
    // rank table), cosine rounded to 4 BEFORE ranking with vec_id
    // tie-break (the q_simsearch determinism discipline), rank-10 cut
    // via WindowGroupLimit, then a 40×10-row self-join on the d=64
    // baseline ids. At corpus scale nothing but (dm, vec_id, cs)
    // triples ever shuffles.
    "q_mrl_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      def sl(c: String) = s"slice($c, 1, dm)"
      val rk = withQuery(s, d)
        .filter(col("vec_id") =!= 0)
        .withColumn("dm", explode(expr("array(8, 16, 32, 64)")))
        .withColumn("cs", expr(
          s"round(${dot(sl("embedding"), sl("q_emb"))} / (sqrt(${dot(sl("embedding"), sl("embedding"))}) * sqrt(${dot(sl("q_emb"), sl("q_emb"))})), 4)"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("dm")).orderBy(col("cs").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
      val full = rk.filter(col("dm") === 64)
        .select(col("vec_id"), lit(1L).as("infull"))
      rk.join(full, Seq("vec_id"), "left")
        .groupBy(col("dm"))
        .agg(sum(coalesce(col("infull"), lit(0L))).as("hits"))
        .select(col("dm"), col("hits"), (col("hits") * 10).as("recall_pct"))
        .orderBy(col("dm"))
    }),

    // Same top-20 via the native codegen'd Catalyst expression
    // (graft.functions.CosineSimilarity): one fused loop, no
    // intermediate arrays — the hot-path form for scoring billions of
    // rows. Oracle identical to q_simsearch (semantics must match).
    "q_simsearch_native" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      withQuery(s, d)
        .withColumn("cos_sim", round(expr("cosine_sim(embedding, q_emb)"), 4))
        .select(col("vec_id"), col("label"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    }),

    // Scale path: search only the query's LSH bucket (no oracle —
    // probabilistic recall; SimSearchSpec pins behavior instead).
    "q_simsearch_lsh" -> ((s, d) => {
      val sigs = signatures(s, d)
      val emb = Tables.embeddings(s, d).join(sigs, "vec_id")
      val qBucket = sigs.filter(col("vec_id") === 0).select(col("bucket").as("q_bucket"))
      // limit(1): provable 1-row bound for the sweep (the withQuery rationale)
      val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")).limit(1)
      emb.join(broadcast(qBucket), col("bucket") === col("q_bucket"), "left_semi")
        .crossJoin(broadcast(q))
        .withColumn("cos_sim", expr(
          s"round(${dot("embedding", "q_emb")} / (sqrt(${dot("embedding", "embedding")}) * sqrt(${dot("q_emb", "q_emb")})), 4)"))
        .select(col("vec_id"), col("label"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    }),

    // IVF-style ANN: a K-cell inverted-file index (K = ⌈√n⌉, floor 16
    // — Learn.coarseK; a constant cell count leaves Θ(n/K)-deep
    // serving lists that grow linearly with the corpus) with a TRAINED
    // codebook (Learn.coarseCentroids — one Lloyd round over the
    // 1e-4-quantized grid from the K-lowest-vec_id init; the old
    // "first K vectors" codebook made cell BALANCE depend on data
    // order — K clumped early vectors meant one hot cell did all the
    // serving work). Cell assignment is one map-only pass per vector:
    // integer-L2 argmin against the k·dim centroid literals (the
    // q_kmeans_fit assignment — codebook-scale metadata folded into
    // the plan, exactly like the LSH hyperplanes). The query probes
    // its nprobe=2 nearest cells by the same integer L2 (computed
    // driver-side on the identical collected codebook) and
    // brute-forces only those with the exact double cosine — at
    // 100 TB the cell id becomes the partition key, so a query
    // touches ~nprobe/√n of the data. Hash-checkable end to end: the
    // oracle replays the TRAINING round (init → assign → update) plus
    // assignment, probe, and cosine CTE-for-CTE; Double.toString
    // round-trips exactly through the plan literal, and both engines
    // fold the cosine sums in the same element order.
    "q_simsearch_ivf" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val cents = Learn.coarseCentroids(s, d)
      // two-level ROUTED assignment (Learn.assignRouted): O(√K·dim)
      // per vector vs the flat O(K·dim) that grew as √n — the oracle
      // replays the routing chain (Learn.routedAssignCtes)
      val emb = Learn.assignRouted(
        Tables.embeddings(s, d)
          .withColumn("edbl", col("embedding").cast("array<double>"))
          .withColumn("qs", expr(Learn.QuantTok)),
        cents).withColumnRenamed("cluster", "cell")
      // query literals: vec_id 0's raw doubles (for the exact cosine)
      // and quantized grid (for the probe) — one 1-row collect
      val q0 = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"), expr(Learn.QuantTok))
        .collect()(0)
      val qLit = q0.getSeq[Double](0).map(v => s"${v}D").mkString("array(", ",", ")")
      val q0q = q0.getSeq[Long](1).toArray
      def l2(a: Array[Long], b: Array[Long]): Long =
        a.indices.foldLeft(0L) { (acc, i) => val x = a(i) - b(i); acc + x * x }
      val probe = cents.map { case (cid, cv) => (cid, l2(q0q, cv)) }
        .sortBy { case (cid, dd) => (dd, cid) }.take(2).map(_._1)
      emb.filter(col("cell").isin(probe.map(Integer.valueOf): _*))
        .withColumn("cos_sim", round(expr(s"cosine_sim(edbl, $qLit)"), 4))
        .select(col("vec_id"), col("label"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    }),

    // IVF recall@10 SELF-EVALUATION — the q_dedup_recall twin for the
    // ANN side: for 10 query vectors, rank the nprobe=2 IVF result
    // against the exact brute-force top-10 and report recall plus the
    // candidate volume (the work-saved axis: production quotes
    // "recall R at fraction-scanned F", never recall alone). This is
    // the measurement a pipeline runs BEFORE trusting an index config
    // at 100 TB — and it's hash-checkable end to end because the
    // trained codebook, probe, and cosine all replay CTE-for-CTE
    // (the q_simsearch_ivf recipe, multi-query form: per-query probe
    // ranking replaces the driver-side argmin so the oracle needs no
    // literals).
    //
    // Scale posture: the 10-row query table broadcasts everywhere;
    // IVF candidates come from a cell-keyed join (~nprobe/k of the
    // corpus); ONLY the ground-truth pass touches every vector
    // (inherent to measuring true recall — run it on a sampled slice
    // in production, which is exactly what the 10-query panel is).
    // Windows run at candidate grain, partitioned by query.
    "q_ivf_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val cents = Learn.coarseCentroids(s, d)
      // corpus side: two-level ROUTED assignment (Learn.assignRouted,
      // O(√K·dim)/vector); the oracle replays the routing chain
      val emb = Learn.assignRouted(
        Tables.embeddings(s, d)
          .withColumn("edbl", col("embedding").cast("array<double>"))
          .withColumn("qs", expr(Learn.QuantTok)),
        cents).withColumnRenamed("cluster", "cell")
        .select(col("vec_id"), col("edbl"), col("qs"), col("cell"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("edbl").as("qe"), col("qs").as("qqs"))
      // per-query top-nprobe probe cells: the QUERY side stays FLAT
      // (10 rows — probing must see every cell to pick the nearest
      // lists, exactly like the oracle's probe CTE); the codebook
      // rides one struct-array literal + a transform loop (Learn.l2Col
      // rationale), sorted lexicographically by (dist, cid)
      val dcLit = typedLit(cents.map { case (cid, cv) => (cid, cv.toSeq) })
      val dcSorted = array_sort(transform(dcLit, c =>
        struct(Learn.l2Col(col("qqs"), c.getField("_2")).as("dist"),
          c.getField("_1").as("cid"))))
      val probes = queries
        .withColumn("cell", explode(transform(
          slice(dcSorted, 1, Learn.NProbe), s => s.getField("cid"))))
        .select(col("q_id"), col("qe"), col("cell"))
      val rk = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val cand = emb.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos_sim", round(expr("cosine_sim(edbl, qe)"), 4))
        .select(col("q_id"), col("vec_id"), col("cos_sim"))
      val nCand = cand.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
      val ivfTop = cand.withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 10).select(col("q_id"), col("vec_id"))
      val bruteTop = emb.crossJoin(
          broadcast(queries.select(col("q_id"), col("qe"))))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos_sim", round(expr("cosine_sim(edbl, qe)"), 4))
        .select(col("q_id"), col("vec_id"), col("cos_sim"))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 10).select(col("q_id"), col("vec_id"))
      val tp = bruteTop.join(ivfTop, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("tp"))
      queries.select(col("q_id"))
        .join(nCand, Seq("q_id"), "left")
        .join(tp, Seq("q_id"), "left")
        .selectExpr("q_id", "coalesce(n_cand, 0) AS n_cand",
          "coalesce(tp, 0) AS tp", "coalesce(tp, 0) * 100000 AS recall_micro")
        .orderBy(col("q_id"))
    }),

    // IVF INDEX MAINTENANCE (r15) — the q_hnsw_insert/q_hnsw_compact
    // story for the INVERTED-FILE family: the codebook was trained
    // BEFORE the arrival batch landed ([[staleCoarseCentroids]] —
    // pre-arrival members only, the state every production IVF tier
    // is in between retrains), arrivals (vec_id ≡ 11 mod 23) route
    // into that stale index, and the page reports per cell what a
    // serving tier's compaction policy actually reads:
    //  - n_before / n_added — list-depth growth (a hot cell whose
    //    arrival share spikes is the re-split trigger);
    //  - dist_before / dist_after — the cell's distortion mass split
    //    by cohort (arrivals landing FAR from their centroid =
    //    distribution drift the recall ladder will feel);
    //  - drift_d2 — how far ONE Lloyd re-estimation round over the
    //    post-arrival membership would move the centroid (the
    //    retrain-vs-serve crossover, the q_hnsw_compact analog).
    // Scale posture: assignment is the routed O(√K·dim)/vector map
    // pass; everything after shuffles at (cell) or (cell, dim) grain
    // — ≤ K·dim rows, codebook-scale. The oracle replays training,
    // routing, and the update round CTE-for-CTE.
    "q_ivf_maintain" -> ((s, d) =>
      ivfMaintainPage(s, d,
        Tables.embeddings(s, d).filter(col("vec_id") % 23 === 11)
          .select(col("vec_id"), expr(Learn.QuantTok).as("qs")))),

    // STALENESS-COST PAGE (r15) — what q_ivf_maintain's drift_d2
    // MEANS for serving quality: the ARRIVAL panel (the cohort the
    // stale index has never seen) searches the corpus twice at
    // nprobe = 2, once through the STALE codebook and once through
    // the RE-ESTIMATED one ([[refitCoarseCentroids]] — the exact
    // update round the maintenance page prices), reporting recall@1
    // vs the exact corpus-NN and the candidate mass per arm. This is
    // the refit-vs-serve decision a production IVF tier makes from
    // the maintenance page: drift is only worth a re-index when the
    // recall delta at equal probe budget says so.
    // Scale posture: both corpus assignments are the routed
    // O(√K·dim)/vector map pass; the panel broadcasts into the
    // cell-keyed candidate joins; ONLY the ground-truth pass touches
    // every vector (inherent to measuring true recall — the
    // q_ivf_recall caveat: run it on a sampled panel, which the
    // arrival batch is).
    "q_ivf_stale_recall" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), expr(Learn.QuantTok).as("qs")).ckpt()
      val queries = emb.filter(col("vec_id") % 23 === 11)
        .select(col("vec_id").as("qid"), col("qs").as("qv"))
      val truth = emb.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), Learn.l2Col(col("qs"), col("qv")).as("d2"))
        .groupBy(col("qid")).agg(min(col("d2")).as("true_d2"))
        .ckpt() // joined by both arms' verdicts
      def arm(tag: String, cents: Seq[(Int, Array[Long])]): DataFrame = {
        val asg = Learn.assignRouted(emb, cents)
          .select(col("vec_id"), col("qs"), col("cluster").as("cell"))
        // panel-side probe stays FLAT over the cells (probing must see
        // every centroid to pick the nearest lists — the q_ivf_recall
        // shape); the codebook rides one struct-array literal
        val dcLit = typedLit(cents.map { case (cid, cv) => (cid, cv.toSeq) })
        val dcSorted = array_sort(transform(dcLit, c =>
          struct(Learn.l2Col(col("qv"), c.getField("_2")).as("dist"),
            c.getField("_1").as("cid"))))
        val probes = queries
          .withColumn("cell", explode(transform(
            slice(dcSorted, 1, Learn.NProbe), x => x.getField("cid"))))
          .select(col("qid"), col("qv"), col("cell"))
        val cand = asg.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), Learn.l2Col(col("qs"), col("qv")).as("d2"))
        val found = cand.groupBy(col("qid"))
          .agg(min(col("d2")).as("found_d2"), count(lit(1)).as("n_cand"))
        queries.select(col("qid")).join(found, Seq("qid"), "left")
          .join(truth, "qid")
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("found_d2") === col("true_d2"), 1L).otherwise(0L)).as("n_reached"),
            sum(coalesce(col("n_cand"), lit(0L))).as("cand_rows"))
          .select(lit(tag).as("codebook"), col("n_queries"), col("n_reached"),
            expr("(n_reached * 1000) DIV n_queries").as("recall_milli"),
            col("cand_rows"))
      }
      arm("refit", refitCoarseCentroids(s, d))
        .unionByName(arm("stale", staleCoarseCentroids(s, d)))
        .orderBy(col("codebook"))
    }),

    // EMBEDDING HEALTH AUDIT — the model-output QA gate a pipeline
    // runs before indexing a new embedding drop: zero vectors (failed
    // inference), DEAD DIMENSIONS (zero variance across the corpus —
    // the collapsed-representation signature), and the norm spread
    // (norm drift between drops breaks cosine thresholds tuned on the
    // old drop). All on the 1e-4 quantized grid so every statistic is
    // an exact BIGINT: per-dim variance numerator n·Σq² − (Σq)² needs
    // no division at all. Two aggregates — one at vector grain
    // (norms), one at (dim) grain after a posexplode (64 rows out) —
    // both partial-aggregated; nothing but per-dim sums shuffles.
    "q_embedding_audit" -> ((s, d) => {
      val v = Tables.embeddings(s, d)
        .withColumn("q", expr(Learn.QuantTok))
        .withColumn("n2", expr(
          "aggregate(q, 0L, (acc, x) -> acc + x * x)"))
      val vecStats = v.agg(
        count(lit(1)).as("n_vecs"),
        max(size(col("q")).cast("long")).as("n_dims"),
        sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero_vecs"),
        min(col("n2")).as("min_norm2"), max(col("n2")).as("max_norm2"),
        sum(col("n2")).as("sum_norm2"))
      val dimStats = v
        .select(posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("var_num", expr("n * sxx - sx * sx"))
        .agg(sum(when(col("var_num") === 0L, 1L).otherwise(0L)).as("n_dead_dims"))
      vecStats.crossJoin(broadcast(dimStats))
        .selectExpr("n_vecs", "n_dims", "n_zero_vecs", "n_dead_dims",
          "min_norm2", "max_norm2", "sum_norm2 DIV n_vecs AS mean_norm2")
    }),

    // Binary quantization + Hamming scan + exact rescore — the
    // serving pattern modern vector stores ship (1 bit/dimension, 8
    // bytes/vector here): each dimension's SIGN packs into two 32-bit
    // words, candidate generation is bit_count(xor) Hamming distance
    // over the packed words (top-100), and the final page reranks only
    // those 100 by exact rounded cosine. Sign-of-dimension is the
    // degenerate nPlanes=dim case of the rp_signature hyperplane
    // family, so the recall story inherits the SimHash cosine bound.
    // Everything is integer-exact except the last-mile cosine, which
    // follows the q_simsearch_ivf literal-replay recipe — the whole
    // trajectory hash-matches DuckDB.
    //
    // Scale posture: packing is MAP-ONLY on the scan (the 100 TB corpus
    // becomes an 8-byte-per-vector sketch — 400× less scan volume);
    // the Hamming scan is two XOR+popcount ops per row feeding a
    // TakeOrderedAndProject heap (no shuffle); the exact rescore
    // touches 100 rows. The query's packed words are collected once
    // (2 BIGINTs) and ride the plan as literals.
    "q_simsearch_bq" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      def pack(from: Int, to: Int, base: Int): String =
        s"aggregate(transform(sequence($from, $to), " +
          s"i -> IF(element_at(e, i) > 0D, shiftleft(1L, $base - i), 0L)), 0L, (a, x) -> a + x)"
      val b = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .withColumn("lo", expr(pack(1, 32, 32)))
        .withColumn("hi", expr(pack(33, 64, 64)))
      val q = b.filter(col("vec_id") === 0)
        .select(col("lo"), col("hi"), col("e")).collect()(0)
      val (qlo, qhi) = (q.getLong(0), q.getLong(1))
      val qe = q.getSeq[Double](2).map(v => s"${v}D").mkString("array(", ",", ")")
      b.filter(col("vec_id") =!= 0)
        .withColumn("hamming", expr(
          s"CAST(bit_count(lo ^ ${qlo}L) + bit_count(hi ^ ${qhi}L) AS BIGINT)"))
        .orderBy(col("hamming"), col("vec_id"))
        .limit(100)
        .withColumn("cos_sim", round(expr(s"cosine_sim(e, $qe)"), 4))
        .select(col("vec_id"), col("label"), col("hamming"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(20)
    }),

    // Int8 symmetric quantization of the embedding column — the
    // storage/serving form of a 100 TB vector corpus (4 bytes → 1 byte
    // per dimension, 4× less scan volume before any index). Map-only,
    // fully codegen-eligible: per-vector scale = max|x|/127, element
    // code = floor(x/scale + 0.5) (round-half-up via exact floor —
    // both engines floor identically, so the codes are exact integers
    // and the oracle hash-matches). Emits the codes plus cheap
    // integrity stats (L1 mass, min/max code). The codes are DECLARED
    // as a csv string (`qvec_csv`), not array<int>: the driver's
    // pandas-based checker cannot hash array-typed cells (same
    // precedent as q_fingerprint_rolling's bottom4_csv) — the storage
    // form in a real pipeline would of course stay `array<tinyint>`.
    "q_vec_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .withColumn("scale", expr("array_max(transform(e, x -> abs(x))) / 127.0D"))
        .withColumn("qvec", expr("transform(e, x -> cast(floor(x / scale + 0.5D) as int))"))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale_r"),
          expr("array_join(qvec, ',')").as("qvec_csv"),
          expr("aggregate(qvec, 0, (a, q) -> a + abs(q))").as("l1_q"),
          expr("array_max(qvec)").as("q_max"),
          expr("array_min(qvec)").as("q_min"))
        .orderBy(col("vec_id"))),

    // JOHNSON-LINDENSTRAUSS RANDOM PROJECTION to k = 8 dimensions —
    // the dimensionality-reduction front-end of every large-scale
    // embedding pipeline (sketch before cluster, hash before index:
    // Achlioptas 2003 showed ±1 entries suffice, no Gaussians). The
    // projection matrix is never materialized: entry sign(i, j) is a
    // deterministic bit of a mixed hash (bit 16 of
    // xor(i·73856093, j·19349663) — the low bit of an odd-constant
    // product preserves input parity, so a HIGH bit is taken), making
    // the operator a pure function both engines replay bit-identically
    // on micro-quantized coordinates. ENTIRELY map-only: per row, an
    // 8-way transform over an index-aggregate — no shuffle, no join,
    // no state; at 100 TB it runs at scan speed fused with the
    // parquet read, which is the entire point of projecting BEFORE
    // anything that shuffles (8 longs ship instead of 64 floats).
    "q_rand_proj" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("vm",
          expr("transform(cast(embedding as array<double>), x -> CAST(floor(x * 1000000) AS BIGINT))"))
        .withColumn("proj", expr(
          """transform(sequence(0, 7), j ->
            |  aggregate(sequence(0, size(vm) - 1), 0L, (acc, i) ->
            |    acc + (1 - 2 * (shiftright((cast(i as bigint) * 73856093) ^ (cast(j as bigint) * 19349663), 16) & 1))
            |          * vm[i]))""".stripMargin))
        .selectExpr("vec_id", "label",
          "proj[0] AS p0", "proj[1] AS p1", "proj[2] AS p2", "proj[3] AS p3",
          "proj[4] AS p4", "proj[5] AS p5", "proj[6] AS p6", "proj[7] AS p7")
        .orderBy(col("vec_id"))),

    // EXACT k-NN self-join (k=3, same-label), with IVF-cell candidate
    // generation instead of a label-block all-pairs join. Two passes,
    // both provably lossless (triangle inequality on angles):
    //  1. BOUND: candidates from each query's home cell give an upper
    //     bound θ3 on its true 3rd-neighbor angle (the true 3rd best is
    //     at least as good as the home-cell 3rd best). Queries with <3
    //     home-cell neighbors fall back to θ3 = π.
    //  2. PROBE: any vector v with angle(u,v) ≤ θ3 is indexed in a cell
    //     whose centroid satisfies angle(u,c) ≤ angle(u,v) +
    //     angle(v,c) ≤ θ3 + radius(c) — so probing exactly those
    //     (cell, label) pairs reaches every true top-3 neighbor. The
    //     final window ranks candidates only.
    // The candidate joins are equi-joins on (cell, label): at 100 TB
    // the cell id is the co-partition key and a query touches the
    // cells its cone intersects, never the whole label block. The
    // slack terms (5e-5 for the rounded-cos ordering, 1e-5 for acos
    // conditioning near ±1) only ever ADD candidates, so the result
    // stays hash-identical to the all-pairs oracle.
    "q_knn_label" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      // codebook as ONE typedLit literal (foldable — CosineMulti
      // decodes it once); no O(K·dim) expr string to parse
      val centsCol = typedLit(
        Learn.coarseCentroids(s, d).map(_._2.map(_.toDouble).toSeq))
      val cosc = call_function("cosine_all", col("e"), centsCol)
      val assigned = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
        .withColumn("cosc", cosc)
        .withColumn("home", expr("cast(array_position(cosc, array_max(cosc)) as int) - 1"))
        .withColumn("home_cos", expr("array_max(cosc)"))
      val index = assigned.select(col("home").as("cell"), col("vec_id").as("b_id"),
        col("label"), col("e").as("eb"), col("home_cos").as("b_home_cos"))
      // angular radius of each (cell, label) block: how far its
      // farthest member sits from the centroid
      val rad = index.groupBy(col("cell"), col("label"))
        .agg(expr(s"${angleOf("min(b_home_cos)")} AS rad"))
      val aSide = assigned.select(col("vec_id").as("a_id"), col("label"),
        col("e").as("ea"), col("home").as("cell"), col("cosc"))
      val w = Window.partitionBy(col("a_id")).orderBy(col("cos_sim").desc, col("b_id"))
      // pass 1: home-cell candidates → per-query 3rd-best bound
      val bound = aSide.drop("cosc")
        .join(index.drop("b_home_cos"), Seq("cell", "label"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("cos_sim", round(expr("cosine_sim(ea, eb)"), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 3)
        .select(col("a_id"), col("cos_sim").as("bound3"))
      // pass 2: cone probe — (query × cell) pairs the bound admits
      val probe = aSide
        .join(bound, Seq("a_id"), "left")
        .withColumn("theta3", expr(
          s"CASE WHEN bound3 IS NULL THEN pi() ELSE ${angleOf("bound3 - 5e-5")} END"))
        .select(col("a_id"), col("label"), col("ea"), col("theta3"),
          posexplode(col("cosc")).as(Seq("cell", "cosk")))
      probe.join(rad, Seq("cell", "label"))
        .filter(expr(s"${angleOf("cosk")} <= theta3 + rad + 1e-5"))
        .join(index.drop("b_home_cos"), Seq("cell", "label"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("cos_sim", round(expr("cosine_sim(ea, eb)"), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("a_id"), col("b_id"), col("label"), col("cos_sim"), col("rn"))
        .orderBy(col("a_id"), col("rn"))
    }),

    // MMR diversity re-rank (Carbonell & Goldstein '98) — the serving-
    // layer step after ANN: from the top-20 relevance candidates, pick
    // 5 greedily by score = λ·rel − (1−λ)·max-sim-to-already-picked
    // (λ = 0.7, scaled to integers 7/3), so near-duplicate hits don't
    // crowd the result page. Exactness recipe: embeddings quantize to
    // the 1e-4 grid (q_kmeans_fit), relevance and pairwise similarity
    // are exact BIGINT dot products, ties break to the lower vec_id —
    // the greedy trajectory replays bit-identically in DuckDB's
    // unrolled CTE chain.
    //
    // Scale posture: the DISTRIBUTED part is candidate generation
    // (TakeOrderedAndProject: per-partition top-k, driver merge of
    // k-row heaps). The greedy loop runs on the collected candidate
    // page — 20 rows, O(k²·dim) — the same result-page-scale collect
    // class as the codebook literals (never data-scale). At 100 TB
    // only the top-k scan grows; the re-rank stays 20 rows.
    "q_mmr" -> ((s, d) => {
      import s.implicits._
      val quant =
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
      val qdf = Tables.embeddings(s, d).select(col("vec_id"), expr(quant).as("qv"))
      val q0 = qdf.filter(col("vec_id") === 0).collect()(0).getSeq[Long](1).toArray
      val qlit = q0.mkString("array(", "L,", "L)")
      val cands = qdf.filter(col("vec_id") =!= 0)
        .withColumn("rel", expr(
          s"aggregate(zip_with(qv, $qlit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(20)
        .collect() // result-page scale (20 rows)
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
        .sortBy { case (id, _, rel) => (-rel, id) }
      def dotL(a: Array[Long], b: Array[Long]): Long =
        a.indices.foldLeft(0L)((acc, i) => acc + a(i) * b(i))
      val sel = scala.collection.mutable.ArrayBuffer(cands.head)
      while (sel.size < 5) {
        val rest = cands.filterNot(c => sel.exists(_._1 == c._1))
        sel += rest.map { c =>
          (c, 7L * c._3 - 3L * sel.map(p => dotL(c._2, p._2)).max)
        }.minBy { case (c, score) => (-score, c._1) }._1
      }
      sel.toSeq.zipWithIndex
        .map { case ((id, _, rel), i) => (i + 1, id, rel) }
        .toDF("mmr_rank", "vec_id", "rel")
    }),

    // NDCG@10 of the lexical ranking against semantic relevance grades
    // — the ranking-quality metric (Järvelin & Kekäläinen 2002) every
    // retrieval stack reports, computed ON-ENGINE: the lexical arm's
    // top-10 is scored by how much quantized-dot-product relevance it
    // captured vs the ideal ordering of the same grades. The log2
    // discount is the one float in NDCG, and neither engine's libm can
    // be trusted to agree (the q_entropy lesson) — so the 10 discount
    // values floor(10⁶/log₂(i+1)) are computed ONCE in Scala and baked
    // as the SAME literal array into both plans; everything else is
    // exact integer products (grade ≤ 6.4·10⁹ × disc ≤ 10⁶, ×10 terms
    // ≪ 2⁶³). Both top-10s are TakeOrdered heaps; rank assignment
    // windows over 10 rows; nothing data-scale sorts globally.
    "q_ndcg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val items = hybridItems(s, d)
        .select(col("doc_id"), col("tfn"), greatest(col("rel"), lit(0L)).as("g"))
        .persist() // consumed by the actual AND the ideal ranking
      val dlit = ndcgDisc.mkString("array(", "L,", "L)")
      val dcg = items.orderBy(col("tfn").desc, col("doc_id")).limit(10)
        .withColumn("r", row_number().over(Window.orderBy(col("tfn").desc, col("doc_id"))))
        .agg(sum(expr(s"g * element_at($dlit, r)")).as("dcg_num"))
      val idcg = items.orderBy(col("g").desc, col("doc_id")).limit(10)
        .withColumn("r", row_number().over(Window.orderBy(col("g").desc, col("doc_id"))))
        .agg(sum(expr(s"g * element_at($dlit, r)")).as("idcg_num"))
      dcg.crossJoin(broadcast(idcg))
        .withColumn("ndcg", round(expr(
          "CAST(dcg_num AS DOUBLE) / CAST(idcg_num AS DOUBLE)"), 6))
    }),

    // Precision@10 of the lexical arm against the semantic top-10 as
    // ground truth — the third leg of the on-engine retrieval-eval
    // family (q_auc: classification, q_ndcg: graded ranking, here:
    // set overlap). Both top-10s are TakeOrdered heaps; the overlap is
    // a 10-row semi join; precision reports in exact micro-units. At
    // 100 TB this is two scans of the shared item frame and a
    // page-scale intersection — nothing data-scale sorts.
    "q_prec_at_k" -> ((s, d) => {
      val items = hybridItems(s, d).persist() // consumed by both arms
      val ta = items.orderBy(col("tfn").desc, col("doc_id")).limit(10)
        .select(col("doc_id").as("a_id"))
      val tb = items.orderBy(col("rel").desc, col("doc_id")).limit(10)
        .select(col("doc_id").as("b_id"))
      ta.join(tb, col("a_id") === col("b_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(10L).as("k"), col("n_overlap"),
          expr("(n_overlap * 1000000) DIV 10").as("prec_micro"))
    }),

    // Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    // hybrid-retrieval combiner every modern RAG stack ships: fuse a
    // LEXICAL ranking (length-normalized query-term frequency over the
    // document text) with a SEMANTIC ranking (embedding dot product vs
    // the vec_id=0 query, joined on doc_id = vec_id) by
    // score(d) = Σ_lists 1/(k + rank_list(d)), k=60. Rank, not score,
    // is what's fused — which is why RRF needs no score calibration
    // between the two signals. INTEGER-EXACT throughout: tfn is a
    // micro-unit truncating division, rel is the q_mmr quantized dot
    // product, and the RRF terms are 10¹² DIV (60+rank), so the whole
    // trajectory hash-matches DuckDB with no float anywhere.
    //
    // Scale posture: real RRF fuses bounded top-k LISTS, not full
    // rankings — each arm is a TakeOrdered heap (top-100, no global
    // sort), rank assignment is a window over those 100 rows, and the
    // fusion is a page-scale full-outer join; a doc absent from one
    // list contributes 0 from that list, per the paper. Both arms'
    // relevance computations are map-only over the scan (the term
    // filter runs inside the token array; the codebook-scale query
    // vector is a plan literal).
    // MRR — the fourth leg of the retrieval-eval family (q_ndcg:
    // graded, q_prec_at_k: set overlap, q_rrf: fusion; MRR grades
    // WHERE the first relevant hits surface): relevant = semantic
    // top-3, ranked list = the lexical arm. Each relevant doc's
    // lexical rank is computed as 1 + count-strictly-ahead via a
    // broadcast 3-row join — NEVER a global row_number over the
    // corpus (the one-reducer sort q_rowid exists to avoid);
    // reciprocal ranks are exact micro with truncating division.
    "q_mrr" -> ((s, d) => {
      val items = hybridItems(s, d).persist()
      val rel3 = items.orderBy(col("rel").desc, col("doc_id")).limit(3)
        .select(col("doc_id").as("r_id"), col("tfn").as("r_tfn"))
      val ranks = items.crossJoin(broadcast(rel3))
        .filter(col("tfn") > col("r_tfn") ||
          (col("tfn") === col("r_tfn") && col("doc_id") < col("r_id")))
        .groupBy(col("r_id")).agg(count(lit(1)).as("ahead"))
      val full = rel3.join(ranks, Seq("r_id"), "left")
        .select(col("r_id"), (coalesce(col("ahead"), lit(0L)) + 1L).as("rank"))
      full.agg(count(lit(1)).as("n_rel"), min(col("rank")).as("best_rank"),
          sum(expr("1000000 DIV rank")).as("srr"))
        .select(col("n_rel"), col("best_rank"),
          expr("srr DIV n_rel").as("mrr_micro"))
    }),

    "q_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val items = hybridItems(s, d)
        .persist() // consumed by BOTH ranking arms — one scan+join, not two
      val ra = items.orderBy(col("tfn").desc, col("doc_id")).limit(100)
        .withColumn("r", row_number().over(Window.orderBy(col("tfn").desc, col("doc_id"))))
        .select(col("doc_id").as("a_id"), col("r").as("ra"))
      val rb = items.orderBy(col("rel").desc, col("doc_id")).limit(100)
        .withColumn("r", row_number().over(Window.orderBy(col("rel").desc, col("doc_id"))))
        .select(col("doc_id").as("b_id"), col("r").as("rb"))
      ra.join(rb, col("a_id") === col("b_id"), "full_outer")
        .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
          (coalesce(expr("1000000000000 DIV (60 + ra)"), lit(0L)) +
            coalesce(expr("1000000000000 DIV (60 + rb)"), lit(0L))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    }),

    // RANK-BIASED OVERLAP (Webber, Moffat & Zobel 2010) between the
    // lexical and semantic top-20 rankings — the fifth leg of the
    // retrieval-eval family: where q_prec_at_k reports overlap at ONE
    // depth, RBO weights the overlap at EVERY depth by the
    // top-weighted geometric p^(d−1) (p = 0.9), which is how ranking
    // drift between two retrieval arms (or two index builds) is
    // actually monitored. Truncated-at-depth-20 form (no tail
    // extrapolation — RBO_min). A doc joint-present at ranks (ra, rb)
    // first enters the overlap at depth max(ra, rb), so its total
    // contribution Σ_{k=max..20} (1−p)p^(k−1)/k depends only on that
    // max — the per-depth sum collapses to one weight lookup per
    // common doc. Weights are computed ONCE in Scala as exact nano
    // literals baked into BOTH engines' plans (the ndcgDisc recipe),
    // so the whole query is integer-exact.
    //
    // Scale posture: two TakeOrdered heaps (never a global sort), rank
    // windows over 20 rows, a 20×20 join, one 1-row aggregate.
    "q_rbo" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val items = hybridItems(s, d).persist() // consumed by BOTH ranking arms
      val wlit = rboWNano.mkString("array(", "L,", "L)")
      val ra = items.orderBy(col("tfn").desc, col("doc_id")).limit(20)
        .withColumn("ra", row_number().over(Window.orderBy(col("tfn").desc, col("doc_id"))))
        .select(col("doc_id"), col("ra"))
      val rb = items.orderBy(col("rel").desc, col("doc_id")).limit(20)
        .withColumn("rb", row_number().over(Window.orderBy(col("rel").desc, col("doc_id"))))
        .select(col("doc_id"), col("rb"))
      ra.join(rb, "doc_id")
        .select(greatest(col("ra"), col("rb")).as("m"))
        .agg(count(lit(1)).as("n_common"),
          coalesce(sum(expr(s"element_at($wlit, CAST(m AS INT))")), lit(0L))
            .as("rbo_nano"))
        .select(lit(20L).as("k"), col("n_common"), col("rbo_nano"))
    })
  )

  private val cosSql =
    """list_dot_product(a, q) / (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(q, q)))"""

  /** The hybrid-retrieval item frame shared by q_rrf / q_ndcg /
    * q_prec_at_k: every document that has an embedding, with its
    * LEXICAL relevance (micro-unit length-normalized query-term
    * frequency) and SEMANTIC relevance (exact integer dot product of
    * 1e-4-quantized vectors against the vec_id=0 query literal).
    * Callers persist() it when they consume both arms. */
  private def hybridItems(s: SparkSession, d: String): DataFrame = {
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
    val qdf = Tables.embeddings(s, d).select(col("vec_id"), expr(quant).as("qv"))
    val q0 = qdf.filter(col("vec_id") === 0).collect()(0).getSeq[Long](1).toArray
    val qlit = q0.mkString("array(", "L,", "L)")
    val lex = Tables.documents(s, d)
      .select(col("doc_id"), expr("split(text, ' ')").as("tk"))
      .select(col("doc_id"), expr(
        """(CAST(size(filter(tk, t -> t IN ('the', 'and', 'of'))) AS BIGINT) * 1000000)
          |  DIV CAST(size(tk) AS BIGINT)""".stripMargin).as("tfn"))
    lex.join(qdf, lex("doc_id") === qdf("vec_id"))
      .withColumn("rel", expr(
        s"aggregate(zip_with(qv, $qlit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("tfn"), col("rel"))
  }

  /** The q_rrf/q_ndcg/q_prec_at_k oracle CTE prefix — the DuckDB
    * rendering of [[hybridItems]] (ends with an `items` CTE exposing
    * doc_id / tfn / rel). */
  private val hybridItemsSql =
    """WITH dt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |lex AS (
      |  SELECT doc_id,
      |    (CAST(len(list_filter(tk, t -> t IN ('the', 'and', 'of'))) AS BIGINT) * 1000000)
      |      // CAST(len(tk) AS BIGINT) AS tfn
      |  FROM dt),
      |qe AS (SELECT vec_id, list_transform(embedding,
      |  x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv FROM embeddings),
      |q0 AS (SELECT qv AS q0v FROM qe WHERE vec_id = 0),
      |items AS (
      |  SELECT lex.doc_id, lex.tfn,
      |    CAST(list_sum(list_transform(range(1, 65), j -> qe.qv[j] * q0.q0v[j])) AS BIGINT) AS rel
      |  FROM lex JOIN qe ON qe.vec_id = lex.doc_id, q0)""".stripMargin

  /** NDCG@10 log₂ discounts in micro-units — floor(10⁶ / log₂(i+1))
    * for rank i = 1..10, computed ONCE here and baked as the same
    * literal array into the Spark plan and the DuckDB oracle so
    * neither engine's libm log is consulted (the q_entropy
    * shared-literal recipe: libm logs are not correctly rounded and
    * differ between implementations). */
  private val ndcgDisc: IndexedSeq[Long] =
    (1 to 10).map(i => math.floor(1e6 * math.log(2) / math.log(i + 1)).toLong)

  /** RBO per-doc weights in nano-units: entry m−1 is
    * round(10⁹ · Σ_{k=m..20} (1−p)·p^(k−1)/k) at p = 0.9 — the total
    * contribution of a doc whose max(ra, rb) = m. Computed once here
    * and baked into both engines' plans (the [[ndcgDisc]] recipe). */
  private val rboWNano: IndexedSeq[Long] =
    (1 to 20).map(m =>
      math.round((m to 20).map(k => 0.1 * math.pow(0.9, k - 1) / k).sum * 1e9))

  /** One greedy MMR step: pick #n from the candidates not yet in
    * sel(n−1), maximizing 7·rel − 3·(max dot vs selected). */
  private def mmrStep(n: Int): String = {
    // join + GROUP BY rather than a correlated scalar subquery: DuckDB
    // can't reference the outer row inside a subquery's lambda, but a
    // cross join puts both vectors in lambda scope.
    val prev = s"sel${n - 1}"
    s"""pick$n AS (
       |  SELECT vec_id, qv, rel, $n AS mmr_rank FROM (
       |    SELECT c.vec_id, c.qv, c.rel,
       |      MAX(CAST(list_sum(list_transform(range(1, 65),
       |        j -> c.qv[j] * s.qv[j])) AS BIGINT)) AS maxdot
       |    FROM cand c, $prev s
       |    WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev)
       |    GROUP BY c.vec_id, c.qv, c.rel)
       |  ORDER BY 7 * rel - 3 * maxdot DESC, vec_id LIMIT 1),
       |sel$n AS (SELECT * FROM $prev UNION ALL SELECT * FROM pick$n)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // The beam search unrolled hop by hop: adj ranks ALL pairs
    // (node 0 included, exactly like the Spark side's exactKnnL2) and
    // drops 0 after the rank; each c_h is the (d2, id)-ordered top-8
    // over the previous beam plus all its neighbors, MATERIALIZED so
    // the chain doesn't re-expand (the q_concomp lesson); each t_h is
    // the hop's trace row (beam best + did-it-improve vs the previous
    // best).
    "q_graph_ann" -> {
      val dd = duckD2 _
      val hops = (1 to 8).map { h =>
        s"""c$h AS MATERIALIZED (
           |  SELECT vec_id, d2q FROM (
           |    SELECT DISTINCT d.vec_id, d.d2q
           |    FROM adj j JOIN c${h - 1} p ON j.ai = p.vec_id JOIN dq d ON d.vec_id = j.bi
           |    UNION SELECT vec_id, d2q FROM c${h - 1})
           |  ORDER BY d2q, vec_id LIMIT 8),
           |t$h AS (
           |  SELECT CAST($h AS BIGINT) AS hop, b.vec_id, b.d2q,
           |    CASE WHEN b.vec_id = pb.vec_id THEN CAST(0 AS BIGINT)
           |         ELSE CAST(1 AS BIGINT) END AS moved
           |  FROM (SELECT vec_id, d2q FROM c$h ORDER BY d2q, vec_id LIMIT 1) b,
           |       (SELECT vec_id FROM c${h - 1} ORDER BY d2q, vec_id LIMIT 1) pb)""".stripMargin
      }
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |dq AS MATERIALIZED (
         |  SELECT n.vec_id, ${dd("n.qv", "z.qv")} AS d2q
         |  FROM q n, (SELECT qv FROM q WHERE vec_id = 0) z
         |  WHERE n.vec_id <> 0),
         |adj AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM q a JOIN q b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8 AND ai <> 0 AND bi <> 0),
         |c0 AS MATERIALIZED (
         |  SELECT vec_id, d2q FROM dq ORDER BY vec_id LIMIT 1),
         |t0 AS (SELECT CAST(0 AS BIGINT) AS hop, vec_id, d2q, CAST(0 AS BIGINT) AS moved FROM c0),
         |${hops.mkString(",\n")},
         |tn AS (SELECT min(d2q) AS true_nn_d2 FROM dq)
         |SELECT hop, vec_id AS node_id, d2q, moved, tn.true_nn_d2,
         |  CASE WHEN d2q = tn.true_nn_d2 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS reached
         |FROM (${(0 to 8).map(h => s"SELECT * FROM t$h").mkString(" UNION ALL ")}) t, tn
         |ORDER BY hop""".stripMargin
    },

    // The full hierarchy unrolled: level draw, per-layer 4-NN subset
    // graphs (all-pairs rank — oracle scale), 4 greedy descent steps
    // (2 per upper layer, monotone), then the ef=8 beam for 4 hops.
    "q_hnsw" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= 4)""".stripMargin
      // greedy step i over layer l (hop h): candidates = {cur} ∪ nbrs, min
      def gStep(i: Int, l: Int, h: Int) =
        s"""g$i AS MATERIALIZED (
           |  SELECT vec_id, d2q FROM (
           |    SELECT DISTINCT d.vec_id, d.d2q
           |    FROM adj$l j JOIN g${i - 1} p ON j.ai = p.vec_id JOIN dq d ON d.vec_id = j.bi
           |    UNION SELECT vec_id, d2q FROM g${i - 1})
           |  ORDER BY d2q, vec_id LIMIT 1),
           |t$i AS (
           |  SELECT CAST($i AS BIGINT) AS step, CAST($l AS BIGINT) AS layer,
           |    CAST($h AS BIGINT) AS hop, b.vec_id, b.d2q,
           |    CASE WHEN b.vec_id = pb.vec_id THEN CAST(0 AS BIGINT)
           |         ELSE CAST(1 AS BIGINT) END AS moved
           |  FROM g$i b, g${i - 1} pb)""".stripMargin
      // beam hop: step i = 4 + h, frame c(4+h) seeded from c4 = g4
      def bStep(i: Int, h: Int) =
        s"""c$i AS MATERIALIZED (
           |  SELECT vec_id, d2q FROM (
           |    SELECT DISTINCT d.vec_id, d.d2q
           |    FROM adj0 j JOIN c${i - 1} p ON j.ai = p.vec_id JOIN dq d ON d.vec_id = j.bi
           |    UNION SELECT vec_id, d2q FROM c${i - 1})
           |  ORDER BY d2q, vec_id LIMIT 8),
           |t$i AS (
           |  SELECT CAST($i AS BIGINT) AS step, CAST(0 AS BIGINT) AS layer,
           |    CAST($h AS BIGINT) AS hop, b.vec_id, b.d2q,
           |    CASE WHEN b.vec_id = pb.vec_id THEN CAST(0 AS BIGINT)
           |         ELSE CAST(1 AS BIGINT) END AS moved
           |  FROM (SELECT vec_id, d2q FROM c$i ORDER BY d2q, vec_id LIMIT 1) b,
           |       (SELECT vec_id FROM c${i - 1} ORDER BY d2q, vec_id LIMIT 1) pb)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |dq AS MATERIALIZED (
         |  SELECT n.vec_id, $hnswLevelDuck AS lvl, ${dd("n.qv", "z.qv")} AS d2q
         |  FROM q n, (SELECT qv FROM q WHERE vec_id = 0) z
         |  WHERE n.vec_id <> 0),
         |adj0 AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM q a JOIN q b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8 AND ai <> 0 AND bi <> 0),
         |m1 AS (SELECT q.vec_id, q.qv FROM q JOIN dq ON dq.vec_id = q.vec_id WHERE dq.lvl >= 1),
         |m2 AS (SELECT q.vec_id, q.qv FROM q JOIN dq ON dq.vec_id = q.vec_id WHERE dq.lvl >= 2),
         |${subsetAdj("adj1", "m1")},
         |${subsetAdj("adj2", "m2")},
         |g0 AS MATERIALIZED (
         |  SELECT vec_id, d2q FROM dq
         |  WHERE vec_id = COALESCE(
         |    (SELECT min(vec_id) FROM dq WHERE lvl >= 2),
         |    (SELECT min(vec_id) FROM dq WHERE lvl >= 1),
         |    (SELECT min(vec_id) FROM dq))),
         |t0 AS (SELECT CAST(0 AS BIGINT) AS step, CAST(2 AS BIGINT) AS layer,
         |  CAST(0 AS BIGINT) AS hop, vec_id, d2q, CAST(0 AS BIGINT) AS moved FROM g0),
         |${gStep(1, 2, 1)},
         |${gStep(2, 2, 2)},
         |${gStep(3, 1, 1)},
         |${gStep(4, 1, 2)},
         |c4 AS (SELECT vec_id, d2q FROM g4),
         |${bStep(5, 1)},
         |${bStep(6, 2)},
         |${bStep(7, 3)},
         |${bStep(8, 4)},
         |tn AS (SELECT min(d2q) AS true_nn_d2 FROM dq)
         |SELECT step, layer, hop, vec_id AS node_id, d2q, moved, tn.true_nn_d2,
         |  CASE WHEN d2q = tn.true_nn_d2 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS reached
         |FROM (${(0 to 8).map(i => s"SELECT * FROM t$i").mkString(" UNION ALL ")}) t, tn
         |ORDER BY step""".stripMargin
    },

    // The batched search unrolled: every step is ONE set-valued CTE
    // over the whole query page (per-qid rank), never per-query.
    "q_hnsw_batch" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String) =
        s"""${name}_d AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= 4),
           |$name AS MATERIALIZED (
           |  SELECT ai, bi FROM ${name}_d
           |  UNION SELECT bi AS ai, ai AS bi FROM ${name}_d)""".stripMargin
      def step(i: Int, adj: String, keep: Int) =
        s"""g$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id,
           |        CASE WHEN c.vec_id = c.qid THEN CAST(1000000000000 AS BIGINT)
           |             ELSE ${dd("v.qv", "w.qv")} END AS d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM $adj j JOIN g${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM g${i - 1}) c
           |      JOIN e1 v ON v.vec_id = c.vec_id
           |      JOIN qs w ON w.qid = c.qid))
           |  WHERE rn <= $keep)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |e1 AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE vec_id <> 0),
         |lv AS (SELECT vec_id, $hnswLevelDuck AS lvl FROM e1),
         |qs AS MATERIALIZED (
         |  SELECT vec_id AS qid, qv FROM e1 WHERE vec_id % 31 = 7),
         |adj0_d AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM q a JOIN q b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8 AND ai <> 0 AND bi <> 0),
         |adj0 AS MATERIALIZED (
         |  SELECT ai, bi FROM adj0_d
         |  UNION SELECT bi AS ai, ai AS bi FROM adj0_d),
         |m1 AS (SELECT e1.vec_id, e1.qv FROM e1 JOIN lv USING (vec_id) WHERE lv.lvl >= 1),
         |m2 AS (SELECT e1.vec_id, e1.qv FROM e1 JOIN lv USING (vec_id) WHERE lv.lvl >= 2),
         |${subsetAdj("adj1", "m1")},
         |${subsetAdj("adj2", "m2")},
         |ent AS (SELECT COALESCE(
         |  (SELECT min(vec_id) FROM m2),
         |  (SELECT min(vec_id) FROM m1),
         |  (SELECT min(vec_id) FROM e1)) AS vec_id),
         |g0 AS MATERIALIZED (
         |  SELECT qs.qid, ent.vec_id,
         |    CASE WHEN ent.vec_id = qs.qid THEN CAST(1000000000000 AS BIGINT)
         |         ELSE ${dd("v.qv", "qs.qv")} END AS d2q
         |  FROM qs CROSS JOIN ent JOIN e1 v ON v.vec_id = ent.vec_id),
         |${step(1, "adj2", 1)},
         |${step(2, "adj2", 1)},
         |${step(3, "adj1", 1)},
         |${step(4, "adj1", 1)},
         |${step(5, "adj0", 16)},
         |${step(6, "adj0", 16)},
         |${step(7, "adj0", 16)},
         |${step(8, "adj0", 16)},
         |${step(9, "adj0", 16)},
         |${step(10, "adj0", 16)},
         |b AS (
         |  SELECT qid, vec_id, d2q FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
         |    FROM g10) WHERE rn = 1),
         |tr AS (
         |  SELECT qid, d2 AS true_nn_d2 FROM (
         |    SELECT qid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
         |    FROM (
         |      SELECT qs.qid, v.vec_id, ${dd("v.qv", "qs.qv")} AS d2
         |      FROM qs, e1 v WHERE v.vec_id <> qs.qid)) WHERE rn = 1)
         |SELECT b.qid, b.vec_id AS found_id, b.d2q AS found_d2, tr.true_nn_d2,
         |  CASE WHEN b.d2q = tr.true_nn_d2 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS reached
         |FROM b JOIN tr USING (qid) ORDER BY qid""".stripMargin
    },

    // The insert search unrolled over the existing-member graphs;
    // link pages read off the per-layer final beams.
    "q_hnsw_insert" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String, k: Int) =
        s"""${name}_d AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= $k),
           |$name AS MATERIALIZED (
           |  SELECT ai, bi FROM ${name}_d
           |  UNION SELECT bi AS ai, ai AS bi FROM ${name}_d)""".stripMargin
      def step(i: Int, adj: String, keep: Int) =
        s"""g$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id, ${dd("v.qv", "w.qv")} AS d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM $adj j JOIN g${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM g${i - 1}) c
           |      JOIN ex v ON v.vec_id = c.vec_id
           |      JOIN nu w ON w.qid = c.qid))
           |  WHERE rn <= $keep)""".stripMargin
      // Link selection replays [[diversifyLinks]] via the shared
      // Algorithm-4 CTE unroll (duckDivSel).
      def linkPage(name: String, beam: String, layer: Int) =
        s"""${duckDivSel(s"${name}_dv", beam, "ex")},
           |$name AS (
           |  SELECT t.qid, CAST($layer AS BIGINT) AS layer,
           |    CAST(count(*) AS BIGINT) AS n_links,
           |    min(t.d2q) AS best_link_d2,
           |    CAST(SUM(t.vec_id) AS BIGINT) AS links_sum
           |  FROM ${name}_dv_s4 t
           |  JOIN nu ON nu.qid = t.qid
           |  WHERE nu.qlvl >= $layer
           |  GROUP BY t.qid)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings WHERE vec_id <> 0),
         |lv AS (SELECT vec_id, $hnswLevelDuck AS lvl FROM q),
         |ex AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE vec_id % 23 <> 11),
         |nu AS MATERIALIZED (
         |  SELECT q.vec_id AS qid, q.qv, lv.lvl AS qlvl
         |  FROM q JOIN lv USING (vec_id) WHERE q.vec_id % 23 = 11),
         |m1 AS (SELECT ex.vec_id, ex.qv FROM ex JOIN lv USING (vec_id) WHERE lv.lvl >= 1),
         |m2 AS (SELECT ex.vec_id, ex.qv FROM ex JOIN lv USING (vec_id) WHERE lv.lvl >= 2),
         |${subsetAdj("adj0", "ex", 8)},
         |${subsetAdj("adj1", "m1", 4)},
         |${subsetAdj("adj2", "m2", 4)},
         |ent AS (SELECT COALESCE(
         |  (SELECT min(vec_id) FROM m2),
         |  (SELECT min(vec_id) FROM m1),
         |  (SELECT min(vec_id) FROM ex)) AS vec_id),
         |g0 AS MATERIALIZED (
         |  SELECT nu.qid, ent.vec_id, ${dd("v.qv", "nu.qv")} AS d2q
         |  FROM nu CROSS JOIN ent JOIN ex v ON v.vec_id = ent.vec_id),
         |${step(1, "adj2", 8)},
         |${step(2, "adj2", 8)},
         |${step(3, "adj1", 8)},
         |${step(4, "adj1", 8)},
         |${step(5, "adj0", 16)},
         |${step(6, "adj0", 16)},
         |${step(7, "adj0", 16)},
         |${step(8, "adj0", 16)},
         |${step(9, "adj0", 16)},
         |${step(10, "adj0", 16)},
         |${linkPage("lnk2", "g2", 2)},
         |${linkPage("lnk1", "g4", 1)},
         |${linkPage("lnk0", "g10", 0)}
         |SELECT qid AS new_id, layer, n_links, best_link_d2, links_sum
         |FROM (SELECT * FROM lnk2 UNION ALL SELECT * FROM lnk1 UNION ALL SELECT * FROM lnk0)
         |ORDER BY new_id, layer""".stripMargin
    },

    // Both beam walks unrolled (6 hops each at ef = 8), verdicts and
    // the member-NN truth read off the same frames the Spark plan uses.
    "q_ann_filtered" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String, k: Int) =
        s"""${name}_d AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= $k),
           |$name AS MATERIALIZED (
           |  SELECT ai, bi FROM ${name}_d
           |  UNION SELECT bi AS ai, ai AS bi FROM ${name}_d)""".stripMargin
      def step(pfx: String, i: Int, adj: String) =
        s"""$pfx$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id,
           |        CASE WHEN c.vec_id = c.qid THEN CAST(1000000000000 AS BIGINT)
           |             ELSE ${dd("v.qv", "w.qv")} END AS d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM $adj j JOIN $pfx${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM $pfx${i - 1}) c
           |      JOIN q v ON v.vec_id = c.vec_id
           |      JOIN qs w ON w.qid = c.qid))
           |  WHERE rn <= 8)""".stripMargin
      def entryStep(pfx: String, ent: String) =
        s"""${pfx}0 AS MATERIALIZED (
           |  SELECT qs.qid, $ent.vec_id,
           |    CASE WHEN $ent.vec_id = qs.qid THEN CAST(1000000000000 AS BIGINT)
           |         ELSE ${dd("v.qv", "qs.qv")} END AS d2q
           |  FROM qs CROSS JOIN $ent JOIN q v ON v.vec_id = $ent.vec_id)""".stripMargin
      s"""WITH qa AS MATERIALIZED (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |q AS MATERIALIZED (SELECT vec_id, label, qv FROM qa WHERE vec_id <> 0),
         |mem AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE label = 3),
         |qs AS MATERIALIZED (SELECT vec_id AS qid, qv FROM mem WHERE vec_id % 7 = 2),
         |${subsetAdj("adjp", "mem", 8)},
         |-- full-graph ranks are computed over the WHOLE corpus (incl.
         |-- vec_id 0, matching exactKnnL2), THEN 0-edges drop
         |adjf_d AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM qa a JOIN qa b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8 AND ai <> 0 AND bi <> 0),
         |adjf AS MATERIALIZED (
         |  SELECT ai, bi FROM adjf_d
         |  UNION SELECT bi AS ai, ai AS bi FROM adjf_d),
         |entp AS (SELECT min(vec_id) AS vec_id FROM mem),
         |entf AS (SELECT min(vec_id) AS vec_id FROM q),
         |${entryStep("p", "entp")},
         |${(1 to 6).map(i => step("p", i, "adjp")).mkString(",\n")},
         |${entryStep("f", "entf")},
         |${(1 to 6).map(i => step("f", i, "adjf")).mkString(",\n")},
         |pre AS (
         |  SELECT qid, vec_id AS pre_id, d2q AS pre_d2 FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
         |    FROM p6 WHERE vec_id <> qid) WHERE rn = 1),
         |postc AS (
         |  SELECT f.qid, f.vec_id, f.d2q
         |  FROM f6 f JOIN q v ON v.vec_id = f.vec_id
         |  WHERE v.label = 3 AND f.vec_id <> f.qid),
         |post AS (
         |  SELECT qid, vec_id AS post_id, d2q AS post_d2, post_kept FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn,
         |      CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS post_kept
         |    FROM postc) WHERE rn = 1),
         |tr AS (
         |  SELECT qid, d2 AS true_d2 FROM (
         |    SELECT qs.qid, ${dd("v.qv", "qs.qv")} AS d2,
         |      row_number() OVER (PARTITION BY qs.qid
         |        ORDER BY ${dd("v.qv", "qs.qv")}, v.vec_id) AS rn
         |    FROM qs, mem v WHERE v.vec_id <> qs.qid) WHERE rn = 1)
         |SELECT pre.qid, pre_id, pre_d2, post_id, post_d2,
         |  COALESCE(post_kept, CAST(0 AS BIGINT)) AS post_kept, true_d2,
         |  CAST(CASE WHEN pre_d2 = true_d2 THEN 1 ELSE 0 END AS BIGINT) AS pre_reached,
         |  CAST(CASE WHEN post_d2 = true_d2 THEN 1 ELSE 0 END AS BIGINT) AS post_reached
         |FROM pre LEFT JOIN post USING (qid) JOIN tr USING (qid)
         |ORDER BY qid""".stripMargin
    },

    // The shared descent + three per-ef layer-0 walks unrolled; each
    // verdict aggregates its own branch against the same truth CTE.
    "q_hnsw_tuning" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String) =
        s"""${name}_d AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= 4),
           |$name AS MATERIALIZED (
           |  SELECT ai, bi FROM ${name}_d
           |  UNION SELECT bi AS ai, ai AS bi FROM ${name}_d)""".stripMargin
      def step(pfx: String, i: Int, adj: String, keep: Int) =
        s"""$pfx$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id,
           |        CASE WHEN c.vec_id = c.qid THEN CAST(1000000000000 AS BIGINT)
           |             ELSE ${dd("v.qv", "w.qv")} END AS d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM $adj j JOIN $pfx${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM $pfx${i - 1}) c
           |      JOIN e1 v ON v.vec_id = c.vec_id
           |      JOIN qs w ON w.qid = c.qid))
           |  WHERE rn <= $keep)""".stripMargin
      def branch(ef: Int): String = {
        val pfx = s"x$ef"
        val hops = (1 to 6).map { i =>
          step(pfx, i, "adj0", ef)
        }.mkString(",\n")
        s"""${pfx}0 AS MATERIALIZED (SELECT qid, vec_id, d2q FROM g4),
           |$hops,
           |v$ef AS (
           |  SELECT CAST($ef AS BIGINT) AS ef,
           |    CAST(count(*) AS BIGINT) AS n_queries,
           |    CAST(sum(CASE WHEN b.d2q = tr.true_nn_d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
           |    CAST(sum(b.d2q - tr.true_nn_d2) AS BIGINT) AS regret_d2_sum
           |  FROM (
           |    SELECT qid, vec_id, d2q FROM (
           |      SELECT qid, vec_id, d2q,
           |        row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |      FROM ${pfx}6) WHERE rn = 1) b
           |  JOIN tr USING (qid))""".stripMargin
      }
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |e1 AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE vec_id <> 0),
         |lv AS (SELECT vec_id, $hnswLevelDuck AS lvl FROM e1),
         |qs AS MATERIALIZED (
         |  SELECT vec_id AS qid, qv FROM e1 WHERE vec_id % 31 = 7),
         |adj0_d AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM q a JOIN q b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8 AND ai <> 0 AND bi <> 0),
         |adj0 AS MATERIALIZED (
         |  SELECT ai, bi FROM adj0_d
         |  UNION SELECT bi AS ai, ai AS bi FROM adj0_d),
         |m1 AS (SELECT e1.vec_id, e1.qv FROM e1 JOIN lv USING (vec_id) WHERE lv.lvl >= 1),
         |m2 AS (SELECT e1.vec_id, e1.qv FROM e1 JOIN lv USING (vec_id) WHERE lv.lvl >= 2),
         |${subsetAdj("adj1", "m1")},
         |${subsetAdj("adj2", "m2")},
         |ent AS (SELECT COALESCE(
         |  (SELECT min(vec_id) FROM m2),
         |  (SELECT min(vec_id) FROM m1),
         |  (SELECT min(vec_id) FROM e1)) AS vec_id),
         |g0 AS MATERIALIZED (
         |  SELECT qs.qid, ent.vec_id,
         |    CASE WHEN ent.vec_id = qs.qid THEN CAST(1000000000000 AS BIGINT)
         |         ELSE ${dd("v.qv", "qs.qv")} END AS d2q
         |  FROM qs CROSS JOIN ent JOIN e1 v ON v.vec_id = ent.vec_id),
         |${step("g", 1, "adj2", 1)},
         |${step("g", 2, "adj2", 1)},
         |${step("g", 3, "adj1", 1)},
         |${step("g", 4, "adj1", 1)},
         |tr AS (
         |  SELECT qid, d2 AS true_nn_d2 FROM (
         |    SELECT qs.qid, ${dd("v.qv", "qs.qv")} AS d2,
         |      row_number() OVER (PARTITION BY qs.qid
         |        ORDER BY ${dd("v.qv", "qs.qv")}, v.vec_id) AS rn
         |    FROM qs, e1 v WHERE v.vec_id <> qs.qid) WHERE rn = 1),
         |${branch(4)},
         |${branch(8)},
         |${branch(16)}
         |SELECT ef, n_queries, n_reached,
         |  CAST(n_reached * 1000 // n_queries AS BIGINT) AS recall_milli,
         |  regret_d2_sum
         |FROM (SELECT * FROM v4 UNION ALL SELECT * FROM v8 UNION ALL SELECT * FROM v16)
         |ORDER BY ef""".stripMargin
    },

    // Bridge collection + Algorithm-4 re-selection replayed CTE-for-CTE
    // (duckDivSel mirrors diversifyLinks).
    "q_hnsw_delete" -> {
      val dd = duckD2 _
      s"""WITH qa AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |ex AS MATERIALIZED (SELECT vec_id, qv FROM qa WHERE vec_id <> 0),
         |-- directed M=4 link lists: ranks over the WHOLE corpus (incl.
         |-- vec_id 0, the exactKnnL2 convention), then 0-edges drop
         |lnk AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM qa a JOIN qa b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 4 AND ai <> 0 AND bi <> 0),
         |lost AS MATERIALIZED (
         |  SELECT ai, CAST(count(*) AS BIGINT) AS n_lost
         |  FROM lnk WHERE ai % 29 <> 3 AND bi % 29 = 3 GROUP BY ai),
         |keepc AS (
         |  SELECT l.ai, l.bi FROM lnk l JOIN lost ON lost.ai = l.ai
         |  WHERE l.bi % 29 <> 3),
         |bridge AS (
         |  SELECT l1.ai, l2.bi
         |  FROM lnk l1 JOIN lost ON lost.ai = l1.ai
         |  JOIN lnk l2 ON l2.ai = l1.bi
         |  WHERE l1.bi % 29 = 3 AND l2.bi % 29 <> 3 AND l2.bi <> l1.ai),
         |candi AS (
         |  SELECT DISTINCT ai, bi FROM (
         |    SELECT * FROM keepc UNION ALL SELECT * FROM bridge)),
         |cand AS MATERIALIZED (
         |  SELECT c.ai AS qid, c.bi AS vec_id, ${dd("vb.qv", "va.qv")} AS d2q
         |  FROM candi c
         |  JOIN ex va ON va.vec_id = c.ai
         |  JOIN ex vb ON vb.vec_id = c.bi),
         |${duckDivSel("dv", "cand", "ex")},
         |rep AS (
         |  SELECT qid, CAST(count(*) AS BIGINT) AS n_links_after,
         |    min(d2q) AS best_link_d2, CAST(sum(vec_id) AS BIGINT) AS links_sum
         |  FROM dv_s4 GROUP BY qid)
         |SELECT lost.ai AS a_id, lost.n_lost,
         |  COALESCE(rep.n_links_after, CAST(0 AS BIGINT)) AS n_links_after,
         |  rep.best_link_d2, rep.links_sum
         |FROM lost LEFT JOIN rep ON rep.qid = lost.ai
         |ORDER BY a_id""".stripMargin
    },

    // Per fraction: repair replay (lost → keep ∪ bridges → duckDivSel)
    // + the 6-hop beam walk over the repaired graph + exact survivor
    // truth, all off ONE shared panel distance CTE (mirrors the Spark
    // plan's shared d2q table).
    "q_hnsw_compact" -> {
      val dd = duckD2 _
      def frac(f: Int): String = {
        val r = 3 % f
        def surv(c: String) = s"$c % $f <> $r"
        def tomb(c: String) = s"$c % $f = $r"
        val hops = (1 to 6).map { i =>
          s"""b$f$i AS MATERIALIZED (
             |  SELECT qid, vec_id, d2q FROM (
             |    SELECT qid, vec_id, d2q,
             |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
             |    FROM (
             |      SELECT c.qid, c.vec_id, dq.d2q
             |      FROM (
             |        SELECT DISTINCT p.qid, j.bi AS vec_id
             |        FROM adj$f j JOIN b$f${i - 1} p ON j.ai = p.vec_id
             |        UNION SELECT qid, vec_id FROM b$f${i - 1}) c
             |      JOIN d2t dq ON dq.qid = c.qid AND dq.vec_id = c.vec_id))
             |  WHERE rn <= 8)""".stripMargin
        }.mkString(",\n")
        s"""lost$f AS MATERIALIZED (
           |  SELECT ai, bi FROM lnk WHERE ${surv("ai")} AND ${tomb("bi")}),
           |aff$f AS MATERIALIZED (SELECT DISTINCT ai FROM lost$f),
           |cand$f AS MATERIALIZED (
           |  SELECT c.ai AS qid, c.bi AS vec_id, ${dd("vb.qv", "va.qv")} AS d2q
           |  FROM (SELECT DISTINCT ai, bi FROM (
           |          SELECT l.ai, l.bi FROM lnk l JOIN aff$f a ON a.ai = l.ai
           |          WHERE ${surv("l.bi")}
           |          UNION ALL
           |          SELECT l1.ai, l2.bi
           |          FROM lost$f l1 JOIN lnk l2 ON l2.ai = l1.bi
           |          WHERE ${surv("l2.bi")} AND l2.bi <> l1.ai)) c
           |  JOIN e1 va ON va.vec_id = c.ai
           |  JOIN e1 vb ON vb.vec_id = c.bi),
           |${duckDivSel(s"dv$f", s"cand$f", "e1")},
           |edges$f AS (
           |  SELECT l.ai, l.bi FROM lnk l
           |  WHERE ${surv("l.ai")} AND l.ai NOT IN (SELECT ai FROM aff$f)
           |  UNION ALL SELECT qid AS ai, vec_id AS bi FROM dv${f}_s4),
           |adj$f AS MATERIALIZED (
           |  SELECT DISTINCT ai, bi FROM (
           |    SELECT ai, bi FROM edges$f UNION ALL SELECT bi, ai FROM edges$f)),
           |ent$f AS (SELECT min(vec_id) AS vec_id FROM e1 WHERE ${surv("vec_id")}),
           |b${f}0 AS MATERIALIZED (
           |  SELECT qs.qid, ent$f.vec_id, dq.d2q
           |  FROM qs CROSS JOIN ent$f
           |  JOIN d2t dq ON dq.qid = qs.qid AND dq.vec_id = ent$f.vec_id),
           |$hops,
           |tr$f AS (
           |  SELECT qid, min(d2q) AS true_d2 FROM d2t
           |  WHERE ${surv("vec_id")} AND vec_id <> qid GROUP BY qid),
           |page$f AS (
           |  SELECT CAST($f AS BIGINT) AS tomb_mod,
           |    (SELECT CAST(count(*) AS BIGINT) FROM e1 WHERE ${tomb("vec_id")}) AS n_tomb,
           |    (SELECT CAST(count(*) AS BIGINT) FROM aff$f) AS n_affected,
           |    CAST(count(*) AS BIGINT) AS n_queries,
           |    CAST(sum(CASE WHEN fd.found_d2 = t.true_d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
           |    CAST(sum(fd.found_d2 - t.true_d2) AS BIGINT) AS regret_d2_sum
           |  FROM (
           |    SELECT qid, d2q AS found_d2 FROM (
           |      SELECT qid, vec_id, d2q,
           |        row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |      FROM b${f}6) WHERE rn = 1) fd
           |  JOIN tr$f t USING (qid))""".stripMargin
      }
      s"""WITH qa AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |e1 AS MATERIALIZED (SELECT vec_id, qv FROM qa WHERE vec_id <> 0),
         |qs AS MATERIALIZED (
         |  SELECT vec_id AS qid, qv FROM e1
         |  WHERE vec_id % 31 = 7 AND vec_id % 29 <> 3 AND vec_id % 7 <> 3
         |    AND vec_id % 3 <> 0
         |  ORDER BY vec_id LIMIT 48),
         |d2t AS MATERIALIZED (
         |  SELECT qs.qid, v.vec_id,
         |    CASE WHEN v.vec_id = qs.qid THEN CAST(1000000000000 AS BIGINT)
         |         ELSE ${dd("v.qv", "qs.qv")} END AS d2q
         |  FROM qs, e1 v),
         |lnk AS MATERIALIZED (
         |  SELECT ai, bi FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM qa a JOIN qa b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 4 AND ai <> 0 AND bi <> 0),
         |${frac(29)},
         |${frac(7)},
         |${frac(3)}
         |SELECT tomb_mod, n_tomb, n_affected, n_queries, n_reached,
         |  CAST(n_reached * 1000 // n_queries AS BIGINT) AS recall_milli,
         |  regret_d2_sum
         |FROM (SELECT * FROM page29 UNION ALL SELECT * FROM page7
         |      UNION ALL SELECT * FROM page3)
         |ORDER BY n_tomb""".stripMargin
    },

    // Insert-then-delete-then-search replayed end-to-end: the
    // q_hnsw_insert search unroll feeds arrival links (duckDivSel over
    // the layer-0 beam), repair runs over the POST-INSERT lists so
    // bridges may pass through arrival links, and the serve walk +
    // truth read one shared panel distance CTE.
    "q_hnsw_lifecycle" -> {
      val dd = duckD2 _
      def subsetAdj(name: String, m: String, k: Int) =
        s"""${name}_d AS MATERIALIZED (
           |  SELECT ai, bi FROM (
           |    SELECT a.vec_id AS ai, b.vec_id AS bi,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
           |    FROM $m a JOIN $m b ON a.vec_id <> b.vec_id)
           |  WHERE rn <= $k),
           |$name AS MATERIALIZED (
           |  SELECT ai, bi FROM ${name}_d
           |  UNION SELECT bi AS ai, ai AS bi FROM ${name}_d)""".stripMargin
      def insStep(i: Int, adj: String, keep: Int) =
        s"""g$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id, ${dd("v.qv", "w.qv")} AS d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM $adj j JOIN g${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM g${i - 1}) c
           |      JOIN ex v ON v.vec_id = c.vec_id
           |      JOIN nu w ON w.qid = c.qid))
           |  WHERE rn <= $keep)""".stripMargin
      def serveStep(i: Int) =
        s"""s$i AS MATERIALIZED (
           |  SELECT qid, vec_id, d2q FROM (
           |    SELECT qid, vec_id, d2q,
           |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
           |    FROM (
           |      SELECT c.qid, c.vec_id, dq.d2q
           |      FROM (
           |        SELECT DISTINCT p.qid, j.bi AS vec_id
           |        FROM adjs j JOIN s${i - 1} p ON j.ai = p.vec_id
           |        UNION SELECT qid, vec_id FROM s${i - 1}) c
           |      JOIN d2t dq ON dq.qid = c.qid AND dq.vec_id = c.vec_id))
           |  WHERE rn <= 16)""".stripMargin
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |e1 AS MATERIALIZED (SELECT vec_id, qv FROM q WHERE vec_id <> 0),
         |lv AS (SELECT vec_id, $hnswLevelDuck AS lvl FROM e1),
         |ex AS MATERIALIZED (SELECT vec_id, qv FROM e1 WHERE vec_id % 23 <> 11),
         |nu AS MATERIALIZED (SELECT vec_id AS qid, qv FROM e1 WHERE vec_id % 23 = 11),
         |m1 AS (SELECT ex.vec_id, ex.qv FROM ex JOIN lv USING (vec_id) WHERE lv.lvl >= 1),
         |m2 AS (SELECT ex.vec_id, ex.qv FROM ex JOIN lv USING (vec_id) WHERE lv.lvl >= 2),
         |exrank AS MATERIALIZED (
         |  SELECT ai, bi, rn FROM (
         |    SELECT a.vec_id AS ai, b.vec_id AS bi,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dd("a.qv", "b.qv")}, b.vec_id) AS rn
         |    FROM ex a JOIN ex b ON a.vec_id <> b.vec_id)
         |  WHERE rn <= 8),
         |adj0 AS MATERIALIZED (
         |  SELECT ai, bi FROM exrank
         |  UNION SELECT bi AS ai, ai AS bi FROM exrank),
         |based AS (SELECT ai, bi FROM exrank WHERE rn <= 4),
         |${subsetAdj("adj1", "m1", 4)},
         |${subsetAdj("adj2", "m2", 4)},
         |ent AS (SELECT COALESCE(
         |  (SELECT min(vec_id) FROM m2),
         |  (SELECT min(vec_id) FROM m1),
         |  (SELECT min(vec_id) FROM ex)) AS vec_id),
         |g0 AS MATERIALIZED (
         |  SELECT nu.qid, ent.vec_id, ${dd("v.qv", "nu.qv")} AS d2q
         |  FROM nu CROSS JOIN ent JOIN ex v ON v.vec_id = ent.vec_id),
         |${insStep(1, "adj2", 8)},
         |${insStep(2, "adj2", 8)},
         |${insStep(3, "adj1", 8)},
         |${insStep(4, "adj1", 8)},
         |${insStep(5, "adj0", 16)},
         |${insStep(6, "adj0", 16)},
         |${insStep(7, "adj0", 16)},
         |${insStep(8, "adj0", 16)},
         |${insStep(9, "adj0", 16)},
         |${insStep(10, "adj0", 16)},
         |${duckDivSel("ins", "g10", "ex")},
         |g1e AS MATERIALIZED (
         |  SELECT ai, bi FROM based
         |  UNION ALL SELECT qid AS ai, vec_id AS bi FROM ins_s4),
         |lostl AS MATERIALIZED (
         |  SELECT ai, bi FROM g1e WHERE ai % 29 <> 3 AND bi % 29 = 3),
         |affl AS MATERIALIZED (SELECT DISTINCT ai FROM lostl),
         |candl AS MATERIALIZED (
         |  SELECT c.ai AS qid, c.bi AS vec_id, ${dd("vb.qv", "va.qv")} AS d2q
         |  FROM (SELECT DISTINCT ai, bi FROM (
         |          SELECT l.ai, l.bi FROM g1e l JOIN affl a ON a.ai = l.ai
         |          WHERE l.bi % 29 <> 3
         |          UNION ALL
         |          SELECT l1.ai, l2.bi
         |          FROM lostl l1 JOIN g1e l2 ON l2.ai = l1.bi
         |          WHERE l2.bi % 29 <> 3 AND l2.bi <> l1.ai)) c
         |  JOIN e1 va ON va.vec_id = c.ai
         |  JOIN e1 vb ON vb.vec_id = c.bi),
         |${duckDivSel("rep", "candl", "e1")},
         |g2e AS (
         |  SELECT l.ai, l.bi FROM g1e l
         |  WHERE l.ai % 29 <> 3 AND l.ai NOT IN (SELECT ai FROM affl)
         |  UNION ALL SELECT qid AS ai, vec_id AS bi FROM rep_s4),
         |adjs AS MATERIALIZED (
         |  SELECT DISTINCT ai, bi FROM (
         |    SELECT ai, bi FROM g2e UNION ALL SELECT bi, ai FROM g2e)),
         |qs AS MATERIALIZED (
         |  SELECT vec_id AS qid, qv FROM e1
         |  WHERE vec_id % 31 = 7 AND vec_id % 29 <> 3
         |  ORDER BY vec_id LIMIT 48),
         |d2t AS MATERIALIZED (
         |  SELECT qs.qid, v.vec_id,
         |    CASE WHEN v.vec_id = qs.qid THEN CAST(1000000000000 AS BIGINT)
         |         ELSE ${dd("v.qv", "qs.qv")} END AS d2q
         |  FROM qs, e1 v),
         |ents AS (SELECT min(vec_id) AS vec_id FROM e1 WHERE vec_id % 29 <> 3),
         |s0 AS MATERIALIZED (
         |  SELECT qs.qid, ents.vec_id, dq.d2q
         |  FROM qs CROSS JOIN ents
         |  JOIN d2t dq ON dq.qid = qs.qid AND dq.vec_id = ents.vec_id),
         |${(1 to 6).map(serveStep).mkString(",\n")},
         |tr AS (
         |  SELECT qid, min(d2q) AS true_nn_d2 FROM d2t
         |  WHERE vec_id % 29 <> 3 AND vec_id <> qid GROUP BY qid)
         |SELECT fd.qid, fd.found_id, fd.found_d2, tr.true_nn_d2,
         |  CAST(CASE WHEN fd.found_d2 = tr.true_nn_d2 THEN 1 ELSE 0 END AS BIGINT) AS reached
         |FROM (
         |  SELECT qid, vec_id AS found_id, d2q AS found_d2 FROM (
         |    SELECT qid, vec_id, d2q,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2q, vec_id) AS rn
         |    FROM s6) WHERE rn = 1) fd
         |JOIN tr USING (qid) ORDER BY fd.qid""".stripMargin
    },

    "q_mrl_recall" ->
      """WITH qv AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
        |base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a
        |  FROM embeddings WHERE vec_id <> 0),
        |dims AS (SELECT unnest([8, 16, 32, 64]) AS dm),
        |rk AS (
        |  SELECT dm, vec_id,
        |    row_number() OVER (PARTITION BY dm ORDER BY cs DESC, vec_id) AS rn
        |  FROM (
        |    SELECT dm, vec_id,
        |      round(list_dot_product(list_slice(a, 1, dm), list_slice(q, 1, dm))
        |        / (sqrt(list_dot_product(list_slice(a, 1, dm), list_slice(a, 1, dm)))
        |         * sqrt(list_dot_product(list_slice(q, 1, dm), list_slice(q, 1, dm)))), 4) AS cs
        |    FROM base, dims, qv)),
        |full_ AS (SELECT vec_id, 1 AS infull FROM rk WHERE dm = 64 AND rn <= 10)
        |SELECT dm, CAST(SUM(coalesce(infull, 0)) AS BIGINT) AS hits,
        |  CAST(SUM(coalesce(infull, 0)) * 10 AS BIGINT) AS recall_pct
        |FROM (SELECT * FROM rk WHERE rn <= 10) r LEFT JOIN full_ USING (vec_id)
        |GROUP BY dm ORDER BY dm""".stripMargin,
    "q_mmr" ->
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |q0 AS (SELECT qv FROM q WHERE vec_id = 0),
         |cand AS (
         |  SELECT q.vec_id, q.qv,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      j -> q.qv[j] * q0.qv[j])) AS BIGINT) AS rel
         |  FROM q, q0 WHERE q.vec_id <> 0
         |  ORDER BY rel DESC, vec_id LIMIT 20),
         |sel1 AS (
         |  SELECT vec_id, qv, rel, 1 AS mmr_rank
         |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
         |${mmrStep(2)},
         |${mmrStep(3)},
         |${mmrStep(4)},
         |${mmrStep(5)}
         |SELECT mmr_rank, vec_id, rel FROM sel5 ORDER BY mmr_rank""".stripMargin,
    "q_simsearch" ->
      s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round($cosSql, 4) AS cos_sim
         |FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS a FROM embeddings), qv
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    "q_simsearch_native" ->
      s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round($cosSql, 4) AS cos_sim
         |FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS a FROM embeddings), qv
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    // q_simsearch_lsh: no oracle (probabilistic bucketing).

    // Replays the coarse TRAINING round (init → assign → update via
    // Learn's kmeans CTEs at k = ⌈√n⌉), then the TWO-LEVEL ROUTED
    // assignment (super-cell training + routing — Learn's routed CTE
    // chain), the integer-L2 probe, and the exact double cosine over
    // probed cells.
    "q_simsearch_ivf" ->
      s"""WITH q AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS a,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |${Learn.CoarseKkCte},
         |${Learn.initCte("c0", 1, Learn.Dim, "", Learn.CoarseKSql)},
         |${Learn.assignCte("a1", "c0", 1, Learn.Dim)},
         |${Learn.updateCte("c1", "a1", 1, Learn.Dim)},
         |${Learn.routedAssignCtes("vcell", "c1", "q")},
         |q0 AS (SELECT a AS qa, qv AS q0v FROM q WHERE vec_id = 0),
         |qprobe AS (
         |  SELECT cid FROM (
         |    SELECT c1.cid,
         |      CAST(list_sum(list_transform(range(1, ${Learn.Dim + 1}),
         |        j -> (q0.q0v[j] - c1.cv[j]) * (q0.q0v[j] - c1.cv[j]))) AS BIGINT) AS dist
         |    FROM c1, q0)
         |  ORDER BY dist, cid LIMIT 2)
         |SELECT q.vec_id, q.label,
         |  round(list_dot_product(a, qa)
         |    / (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(qa, qa))), 4) AS cos_sim
         |FROM q JOIN vcell v USING (vec_id), q0
         |WHERE v.cell IN (SELECT cid FROM qprobe)
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    "q_embedding_audit" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |n2 AS (
        |  SELECT vec_id, q,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(q, x -> x * x)), (a, b) -> a + b) AS n2
        |  FROM v),
        |vs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |    CAST(max(len(q)) AS BIGINT) AS n_dims,
        |    CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
        |    CAST(min(n2) AS BIGINT) AS min_norm2, CAST(max(n2) AS BIGINT) AS max_norm2,
        |    CAST(sum(n2) AS BIGINT) AS sum_norm2
        |  FROM n2),
        |ds AS (
        |  SELECT CAST(sum(CASE WHEN n * sxx - sx * sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dead_dims
        |  FROM (
        |    SELECT t.i AS dim, CAST(count(*) AS BIGINT) AS n,
        |      CAST(sum(q[t.i]) AS BIGINT) AS sx,
        |      CAST(sum(q[t.i] * q[t.i]) AS BIGINT) AS sxx
        |    FROM v, range(1, 65) t(i)
        |    GROUP BY t.i))
        |SELECT n_vecs, n_dims, n_zero_vecs, n_dead_dims,
        |  min_norm2, max_norm2, sum_norm2 // n_vecs AS mean_norm2
        |FROM vs, ds""".stripMargin,

    // Multi-query replay of the trained-IVF trajectory plus the exact
    // brute-force ground truth; recall joins the two top-10 sets.
    "q_ivf_recall" ->
      s"""WITH q AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |${Learn.CoarseKkCte},
         |${Learn.initCte("c0", 1, Learn.Dim, "", Learn.CoarseKSql)},
         |${Learn.assignCte("a1", "c0", 1, Learn.Dim)},
         |${Learn.updateCte("c1", "a1", 1, Learn.Dim)},
         |${Learn.routedAssignCtes("vcell", "c1", "q")},
         |qs AS (SELECT vec_id AS q_id, a AS qe, qv AS qqv FROM q WHERE vec_id < 10),
         |probe AS (
         |  SELECT q_id, cid FROM (
         |    SELECT qs.q_id, c1.cid,
         |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
         |        CAST(list_sum(list_transform(range(1, ${Learn.Dim + 1}),
         |          j -> (qs.qqv[j] - c1.cv[j]) * (qs.qqv[j] - c1.cv[j]))) AS BIGINT),
         |        c1.cid) AS prn
         |    FROM qs, c1)
         |  WHERE prn <= ${Learn.NProbe}),
         |cand AS (
         |  SELECT qs.q_id, q.vec_id,
         |    round(list_dot_product(q.a, qs.qe)
         |      / (sqrt(list_dot_product(q.a, q.a)) * sqrt(list_dot_product(qs.qe, qs.qe))), 4) AS cos_sim
         |  FROM qs JOIN probe p ON p.q_id = qs.q_id
         |    JOIN vcell v ON v.cell = p.cid
         |    JOIN q ON q.vec_id = v.vec_id
         |  WHERE q.vec_id <> qs.q_id),
         |ncand AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY q_id),
         |ivf AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rk
         |    FROM cand)
         |  WHERE rk <= 10),
         |brute AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT qs.q_id, q.vec_id,
         |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
         |        round(list_dot_product(q.a, qs.qe)
         |          / (sqrt(list_dot_product(q.a, q.a)) * sqrt(list_dot_product(qs.qe, qs.qe))), 4) DESC,
         |        q.vec_id) AS rk
         |    FROM qs, q WHERE q.vec_id <> qs.q_id)
         |  WHERE rk <= 10),
         |tp AS (SELECT q_id, CAST(count(*) AS BIGINT) AS tp
         |       FROM brute JOIN ivf USING (q_id, vec_id) GROUP BY q_id)
         |SELECT qs.q_id, coalesce(n_cand, 0) AS n_cand, coalesce(tp.tp, 0) AS tp,
         |  coalesce(tp.tp, 0) * 100000 AS recall_micro
         |FROM qs LEFT JOIN ncand ON ncand.q_id = qs.q_id
         |  LEFT JOIN tp ON tp.q_id = qs.q_id
         |ORDER BY qs.q_id""".stripMargin,

    // Replays the STALE training (pre-arrival members only: init →
    // assign → update), routes the FULL corpus through the trained
    // cells, then mirrors the mass page and the one-round
    // re-estimation drift CTE-for-CTE.
    "q_ivf_maintain" -> {
      def l2(a: String, b: String): String =
        s"CAST(list_sum(list_transform(range(1, ${Learn.Dim + 1}), " +
          s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j]))) AS BIGINT)"
      s"""WITH qa AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |q AS (SELECT vec_id, qv FROM qa WHERE vec_id % 23 <> 11),
         |kk AS (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM q),
         |${Learn.initCte("c0", 1, Learn.Dim, "", Learn.CoarseKSql)},
         |${Learn.assignCte("a1", "c0", 1, Learn.Dim)},
         |${Learn.updateCte("c1", "a1", 1, Learn.Dim)},
         |${Learn.routedAssignCtes("vcell", "c1", "qa")},
         |vd AS MATERIALIZED (
         |  SELECT v.vec_id, v.cell, ${l2("r.qv", "c.cv")} AS qdist,
         |    CASE WHEN v.vec_id % 23 = 11 THEN 1 ELSE 0 END AS is_new
         |  FROM vcell v JOIN qa r USING (vec_id) JOIN c1 c ON c.cid = v.cell),
         |mass AS (
         |  SELECT cell, CAST(SUM(1 - is_new) AS BIGINT) AS n_before,
         |    CAST(SUM(is_new) AS BIGINT) AS n_added,
         |    CAST(SUM(CASE WHEN is_new = 0 THEN qdist ELSE 0 END) AS BIGINT) AS dist_before,
         |    CAST(SUM(qdist) AS BIGINT) AS dist_after
         |  FROM vd GROUP BY cell),
         |upd AS (
         |  SELECT cell, list(ctr ORDER BY pos) AS cv_new FROM (
         |    SELECT v.cell, t.pos,
         |      CAST(floor(CAST(CAST(SUM(r.qv[t.pos]) AS BIGINT) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ctr
         |    FROM vcell v JOIN qa r USING (vec_id), range(1, ${Learn.Dim + 1}) t(pos)
         |    GROUP BY v.cell, t.pos)
         |  GROUP BY cell),
         |drift AS (
         |  SELECT u.cell, ${l2("u.cv_new", "c.cv")} AS drift_d2
         |  FROM upd u JOIN c1 c ON c.cid = u.cell)
         |SELECT CAST(m.cell AS BIGINT) AS cell, n_before, n_added,
         |  CAST((n_added * 1000) // (n_before + n_added) AS BIGINT) AS added_milli,
         |  dist_before, dist_after, d.drift_d2
         |FROM mass m JOIN drift d USING (cell) ORDER BY cell""".stripMargin
    },

    // Replays the stale training, BOTH routed corpus assignments
    // (stale chain + the refit chain under the re-estimated book —
    // the r2-prefixed CTE namespace), both flat panel probes, and
    // both verdict pages against one exact-NN truth CTE.
    "q_ivf_stale_recall" -> {
      def l2(a: String, b: String): String =
        s"CAST(list_sum(list_transform(range(1, ${Learn.Dim + 1}), " +
          s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j]))) AS BIGINT)"
      def armCtes(tag: String, cc: String, vcell: String) =
        s"""probe_$tag AS (
           |  SELECT qid, cid FROM (
           |    SELECT qs.qid, c.cid,
           |      row_number() OVER (PARTITION BY qs.qid
           |        ORDER BY ${l2("qs.qv", "c.cv")}, c.cid) AS prn
           |    FROM qs, $cc c)
           |  WHERE prn <= ${Learn.NProbe}),
           |found_$tag AS (
           |  SELECT qid, MIN(d2) AS found_d2, CAST(COUNT(*) AS BIGINT) AS n_cand
           |  FROM (
           |    SELECT qs.qid, ${l2("r.qv", "qs.qv")} AS d2
           |    FROM qs JOIN probe_$tag p ON p.qid = qs.qid
           |      JOIN $vcell v ON v.cell = p.cid
           |      JOIN qa r ON r.vec_id = v.vec_id
           |    WHERE r.vec_id <> qs.qid)
           |  GROUP BY qid),
           |page_$tag AS (
           |  SELECT '$tag' AS codebook,
           |    CAST(COUNT(*) AS BIGINT) AS n_queries,
           |    CAST(SUM(CASE WHEN f.found_d2 = tr.true_d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
           |    CAST(SUM(COALESCE(f.n_cand, 0)) AS BIGINT) AS cand_rows
           |  FROM qs LEFT JOIN found_$tag f USING (qid) JOIN tr USING (qid))""".stripMargin
      s"""WITH qa AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |q AS (SELECT vec_id, qv FROM qa WHERE vec_id % 23 <> 11),
         |kk AS (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM q),
         |${Learn.initCte("c0", 1, Learn.Dim, "", Learn.CoarseKSql)},
         |${Learn.assignCte("a1", "c0", 1, Learn.Dim)},
         |${Learn.updateCte("c1", "a1", 1, Learn.Dim)},
         |${Learn.routedAssignCtes("vcell1", "c1", "qa")},
         |c2 AS MATERIALIZED (
         |  SELECT cell AS cid, list(ctr ORDER BY pos) AS cv FROM (
         |    SELECT v.cell, t.pos,
         |      CAST(floor(CAST(CAST(SUM(r.qv[t.pos]) AS BIGINT) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ctr
         |    FROM vcell1 v JOIN qa r USING (vec_id), range(1, ${Learn.Dim + 1}) t(pos)
         |    GROUP BY v.cell, t.pos)
         |  GROUP BY cell),
         |${Learn.routedAssignCtes("vcell2", "c2", "qa", "qv", "r2")},
         |qs AS MATERIALIZED (
         |  SELECT vec_id AS qid, qv FROM qa WHERE vec_id % 23 = 11),
         |tr AS MATERIALIZED (
         |  SELECT qs.qid, MIN(${l2("r.qv", "qs.qv")}) AS true_d2
         |  FROM qs, qa r WHERE r.vec_id <> qs.qid GROUP BY qs.qid),
         |${armCtes("stale", "c1", "vcell1")},
         |${armCtes("refit", "c2", "vcell2")}
         |SELECT codebook, n_queries, n_reached,
         |  CAST((n_reached * 1000) // n_queries AS BIGINT) AS recall_milli, cand_rows
         |FROM (SELECT * FROM page_refit UNION ALL SELECT * FROM page_stale)
         |ORDER BY codebook""".stripMargin
    },

    "q_simsearch_bq" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |b AS (
        |  SELECT vec_id, label, e,
        |    CAST(list_sum(list_transform(range(1, 33),
        |      i -> CASE WHEN e[i] > 0 THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(33, 65),
        |      i -> CASE WHEN e[i] > 0 THEN (CAST(1 AS BIGINT) << (64 - i)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM v),
        |q AS (SELECT lo AS qlo, hi AS qhi, e AS qe FROM b WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id, label, e,
        |    CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) AS BIGINT) AS hamming
        |  FROM b, q WHERE vec_id <> 0
        |  ORDER BY hamming, vec_id LIMIT 100)
        |SELECT vec_id, label, hamming,
        |  round(list_dot_product(e, qe)
        |    / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        |FROM cand, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    "q_rand_proj" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000000) AS BIGINT)) AS vm
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, label, unnest(vm) AS x,
        |    unnest(range(len(vm))) AS i
        |  FROM v),
        |js AS (SELECT unnest(range(8)) AS j),
        |p AS (
        |  SELECT vec_id, label, j,
        |    CAST(SUM((1 - 2 * ((xor(CAST(i AS BIGINT) * 73856093,
        |                            CAST(j AS BIGINT) * 19349663) >> 16) & 1)) * x)
        |      AS BIGINT) AS pr
        |  FROM u, js GROUP BY 1, 2, 3)
        |SELECT vec_id, label,
        |  MAX(CASE WHEN j = 0 THEN pr END) AS p0,
        |  MAX(CASE WHEN j = 1 THEN pr END) AS p1,
        |  MAX(CASE WHEN j = 2 THEN pr END) AS p2,
        |  MAX(CASE WHEN j = 3 THEN pr END) AS p3,
        |  MAX(CASE WHEN j = 4 THEN pr END) AS p4,
        |  MAX(CASE WHEN j = 5 THEN pr END) AS p5,
        |  MAX(CASE WHEN j = 6 THEN pr END) AS p6,
        |  MAX(CASE WHEN j = 7 THEN pr END) AS p7
        |FROM p GROUP BY vec_id, label ORDER BY vec_id""".stripMargin,

    "q_vec_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |q AS (
        |  SELECT vec_id, scale,
        |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS qvec
        |  FROM sc)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |  array_to_string(qvec, ',') AS qvec_csv,
        |  CAST(list_aggregate(list_transform(qvec, x -> abs(x)), 'sum') AS INTEGER) AS l1_q,
        |  list_max(qvec) AS q_max, list_min(qvec) AS q_min
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_knn_label" ->
      s"""SELECT a_id, b_id, label, cos_sim, rn FROM (
         | SELECT a_id, b_id, label, cos_sim,
         |  row_number() OVER (PARTITION BY a_id ORDER BY cos_sim DESC, b_id) AS rn
         | FROM (
         |  SELECT ea.vec_id AS a_id, eb.vec_id AS b_id, ea.label AS label,
         |   round(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
         |    / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
         |     * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))), 4) AS cos_sim
         |  FROM embeddings ea JOIN embeddings eb ON ea.label = eb.label AND ea.vec_id <> eb.vec_id
         | )) WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin,

    "q_ndcg" -> {
      val dl = ndcgDisc.mkString("[", ", ", "]")
      s"""$hybridItemsSql,
         |top AS (
         |  SELECT greatest(rel, 0) AS g, row_number() OVER (ORDER BY tfn DESC, doc_id) AS r
         |  FROM items ORDER BY tfn DESC, doc_id LIMIT 10),
         |ideal AS (
         |  SELECT g, row_number() OVER (ORDER BY g DESC, doc_id) AS r
         |  FROM (SELECT doc_id, greatest(rel, 0) AS g FROM items)
         |  ORDER BY g DESC, doc_id LIMIT 10),
         |d AS (SELECT CAST(SUM(g * ($dl)[r]) AS BIGINT) AS dcg_num FROM top),
         |i AS (SELECT CAST(SUM(g * ($dl)[r]) AS BIGINT) AS idcg_num FROM ideal)
         |SELECT dcg_num, idcg_num,
         |  round(CAST(dcg_num AS DOUBLE) / CAST(idcg_num AS DOUBLE), 6) AS ndcg
         |FROM d, i""".stripMargin
    },

    "q_mrr" ->
      s"""$hybridItemsSql,
         |rel3 AS (
         |  SELECT doc_id AS r_id, tfn AS r_tfn
         |  FROM items ORDER BY rel DESC, doc_id LIMIT 3),
         |ranks AS (
         |  SELECT r_id, CAST(count(*) AS BIGINT) AS ahead
         |  FROM items, rel3
         |  WHERE tfn > r_tfn OR (tfn = r_tfn AND doc_id < r_id)
         |  GROUP BY r_id),
         |full_ AS (
         |  SELECT r_id, coalesce(ahead, 0) + 1 AS rank
         |  FROM rel3 LEFT JOIN ranks USING (r_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_rel,
         |  CAST(min(rank) AS BIGINT) AS best_rank,
         |  CAST(SUM(1000000 // rank) AS BIGINT) // CAST(count(*) AS BIGINT) AS mrr_micro
         |FROM full_""".stripMargin,

    // Same two top-20 heaps; the per-doc weight is the shared
    // [[rboWNano]] nano literal indexed at max(ra, rb).
    "q_rbo" ->
      s"""$hybridItemsSql,
         |ra AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY tfn DESC, doc_id) AS ra
         |  FROM items ORDER BY tfn DESC, doc_id LIMIT 20),
         |rb AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY rel DESC, doc_id) AS rb
         |  FROM items ORDER BY rel DESC, doc_id LIMIT 20),
         |j AS (SELECT greatest(ra, rb) AS m FROM ra JOIN rb USING (doc_id))
         |SELECT CAST(20 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_common,
         |  COALESCE(CAST(SUM(${rboWNano.mkString("[", ", ", "]")}[CAST(m AS INT)]) AS BIGINT), 0)
         |    AS rbo_nano
         |FROM j""".stripMargin,

    "q_prec_at_k" ->
      s"""$hybridItemsSql,
         |ta AS (SELECT doc_id FROM items ORDER BY tfn DESC, doc_id LIMIT 10),
         |tb AS (SELECT doc_id FROM items ORDER BY rel DESC, doc_id LIMIT 10),
         |ov AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_overlap
         |  FROM ta WHERE EXISTS (SELECT 1 FROM tb WHERE tb.doc_id = ta.doc_id))
         |SELECT CAST(10 AS BIGINT) AS k, n_overlap,
         |  (n_overlap * 1000000) // 10 AS prec_micro
         |FROM ov""".stripMargin,

    "q_rrf" ->
      s"""$hybridItemsSql,
         |ra AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY tfn DESC, doc_id) AS r
         |  FROM items ORDER BY tfn DESC, doc_id LIMIT 100),
         |rb AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY rel DESC, doc_id) AS r
         |  FROM items ORDER BY rel DESC, doc_id LIMIT 100)
         |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         |  COALESCE(1000000000000 // (60 + ra.r), 0) + COALESCE(1000000000000 // (60 + rb.r), 0) AS rrf
         |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  )
}

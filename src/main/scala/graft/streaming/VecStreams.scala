package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming embedding-grain admission — q_dedup_embed_inc's online
  * twin, completing the ingest-guard pair: [[DocStreams]] blocks
  * near-duplicate TEXT at the MinHash grain, this blocks near-duplicate
  * VECTORS at the cosine grain, so a live embedding feed (a crawl's
  * encoder output, a re-upload stream) never lands a ≥0.95-cosine copy
  * of something the corpus already holds.
  *
  * Same lossless cone-probe contract as the batch op: the EXISTING
  * corpus is assigned once to its home cells under the trained
  * codebook (the static index — at 100 TB it is persisted
  * cell-partitioned and never rebuilt per trigger); each incoming
  * vector probes every cell within angle(u, home(u)) + 2·θmax, which
  * covers home(v) for every v with angle(u, v) ≤ θmax, so the
  * stream-static equi-join sees every qualifying (new, old) pair.
  *
  * Streaming shape: the probe fan-out is a STATELESS projection
  * (map-only — the codebook rides as a literal), the candidate match
  * is a stream-static LEFT OUTER join (unmatched vectors must still
  * get a verdict row), and the only stateful op is the per-(vec, ts)
  * verdict aggregation, expired by the watermark — state is one row
  * per in-flight vector, never corpus-proportional, and the corpus
  * side of the join is the STATIC build side exactly like the
  * reference's sink-id anti-join (main.py:95-104).
  */
object VecStreams {

  /** Per-vector admission verdicts for a stream of (vec_id, ts, label,
    * embedding) rows against a static corpus index, emitted once the
    * watermark passes each vector's event time: (new_id, ts, dup_of,
    * n_matches, best_cos, admit). `cents` is the trained IVF codebook
    * (Learn.coarseCentroids — train once at index build, serve many
    * triggers). */
  def vectorAdmission(vecs: DataFrame, corpus: DataFrame,
      cents: Seq[(Int, Array[Long])], watermark: String = "1 hour",
      minCos: Double = 0.95): DataFrame = {
    graft.functions.VectorFunctions.register(vecs.sparkSession)
    val centsCol = typedLit(cents.map(_._2.map(_.toDouble).toSeq))
    val twoTheta = 2 * math.acos(minCos)
    val clamp = (x: String) => s"acos(greatest(-1.0D, least(1.0D, $x)))"
    def assigned(df: DataFrame, emb: Column): DataFrame = df
      .withColumn("__e", emb)
      .withColumn("cosc", call_function("cosine_all", col("__e"), centsCol))
    val index = assigned(
        corpus.select(col("vec_id").as("old_id"), col("label")
          .as("olabel"), col("embedding")),
        expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("cell", expr("cast(array_position(cosc, array_max(cosc)) as int) - 1"))
      .select(col("cell"), col("olabel"), col("old_id"), col("__e").as("eo"))
    val probe = assigned(
        vecs.select(col("vec_id").as("new_id"), col("ts"), col("label"),
            col("embedding"))
          .withWatermark("ts", watermark),
        expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("probe_limit", expr(s"${clamp("array_max(cosc)")} + $twoTheta + 1e-5"))
      .select(col("new_id"), col("ts"), col("label"), col("__e").as("en"),
        col("probe_limit"), posexplode(col("cosc")).as(Seq("cell", "cosk")))
      .filter(expr(s"${clamp("cosk")} <= probe_limit"))
      .drop("cosk", "probe_limit")
    // LEFT OUTER keeps unmatched probe rows (their verdict is "admit");
    // the cosine threshold must sit INSIDE the join condition — as a
    // post-filter it would also drop the null rows the verdict needs
    val joined = probe.join(index,
      probe("cell") === index("cell") && col("label") === col("olabel")
        && expr(s"cosine_sim(en, eo) >= ${minCos}D"), "left_outer")
      .withColumn("cos_sim", expr("round(cosine_sim(en, eo), 4)"))
    joined
      .groupBy(col("new_id"), col("ts"))
      .agg(min(col("old_id")).as("dup_of"),
        count(col("old_id")).as("n_matches"),
        max(col("cos_sim")).as("best_cos"))
      .select(col("new_id"), col("ts"), col("dup_of"), col("n_matches"),
        col("best_cos"), col("dup_of").isNull.as("admit"))
  }

  /** Streaming HNSW insert — q_hnsw_insert's ONLINE form, completing
    * the vector-ingest pair: [[vectorAdmission]] decides whether an
    * arriving vector enters the corpus, this wires the admitted ones
    * into the ANN index. Each micro-batch of (vec_id, embedding) rows
    * gets levels from the same deterministic md5 draw and per-layer
    * links from ONE multi-layer search of the EXISTING graphs
    * (SimSearch.hnswInsertLinks — Algorithm 4 heuristic selection),
    * emitting the link page per trigger through `onPage`.
    *
    * Index posture (the vectorAdmission contract): the layer graphs
    * and the index-side vector frame are memoized builds resolved
    * against the DEFINING session — built once, read as persisted
    * blocks by every trigger, never rebuilt per batch. Only the
    * batch-side beams move, and per-arrival search state never crosses
    * arrivals, so a feed split across triggers replays the one-batch
    * link page bit-for-bit (pinned by Round14Spec over a two-batch
    * MemoryStream feed).
    *
    * The iterative beam descent (fixed hop unroll + per-qid rank
    * trims) is genuinely per-batch planning, which is exactly what
    * Structured Streaming's foreachBatch exists for — the hop loop
    * cannot ride a single incremental plan, and SHOULD not: the index
    * side must not re-resolve per hop. */
  def hnswInsertStream(vecs: DataFrame, d: String)(
      onPage: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val s = vecs.sparkSession // memo keys carry the session identity:
    // resolve against the DEFINING session, not the per-query
    // micro-batch clone, or every trigger would rebuild the index
    vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val nu = batch
          .select(col("vec_id").as("qid"),
            expr(graft.operators.Learn.QuantTok).as("qv"),
            expr(graft.operators.SimSearch.hnswLevelSpark).as("qlvl"))
        onPage(graft.operators.SimSearch.hnswInsertLinks(s, d, nu))
      }
      .start()
  }

  /** Streaming HNSW delete — q_hnsw_delete's ONLINE form, completing
    * the index-maintenance pair: [[hnswInsertStream]] wires admitted
    * vectors in, this erases a tombstone feed of (vec_id) rows and
    * repairs the severed survivors per micro-batch
    * (SimSearch.hnswDeleteRepair — keep ∪ 2-hop bridges, Algorithm-4
    * re-selection).
    *
    * State: the CUMULATIVE tombstone id set, checkpointed per trigger
    * — tombstone-scale, never corpus-scale. Repair must see the FULL
    * set, not just this trigger's ids: a survivor hit by tombstones in
    * two triggers re-selects against everything it lost, and a bridge
    * target deleted by a LATER trigger must drop out of an EARLIER
    * survivor's repaired candidates. Because repairs always derive
    * from the pristine index + cumulative tombstones (the
    * hnswDeleteRepair contract), each trigger's page IS the exact
    * batch page for the tombstones seen so far — REPLACE semantics
    * (the complete-mode posture): downstream overwrites survivors'
    * link lists, and after the last trigger the page equals the
    * one-shot batch output bit-for-bit (pinned by Round15Spec over a
    * two-batch feed). The index side stays the memoized build — never
    * rebuilt per trigger; only tombstone-scale state moves. */
  def hnswDeleteStream(tombs: DataFrame, d: String)(
      onPage: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.PlanStash.Ckpt
    val s = tombs.sparkSession // defining session: see hnswInsertStream
    var tombSoFar: Option[DataFrame] = None
    tombs.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = batch.select(col("vec_id"))
        val cum = tombSoFar match {
          case Some(t) => t.unionByName(ids).distinct().ckpt()
          case None => ids.distinct().ckpt()
        }
        tombSoFar = Some(cum)
        onPage(graft.operators.SimSearch.hnswDeleteRepair(s, d, cum))
      }
      .start()
  }

  /** Streaming IVF maintenance — q_ivf_maintain's ONLINE form,
    * completing the index-maintenance symmetry across both ANN
    * families ([[hnswInsertStream]]/[[hnswDeleteStream]] keep the
    * graph index current; this keeps the inverted-file index's
    * HEALTH PAGE current): each micro-batch of (vec_id, embedding)
    * arrivals routes into the STALE codebook
    * (SimSearch.staleCoarseCentroids — trained once on the
    * pre-arrival members, memoized against the defining session,
    * never retrained per trigger) and the trigger emits the full
    * per-cell maintenance page for everything that has arrived SO
    * FAR.
    *
    * State: the CUMULATIVE arrival frame, checkpointed per trigger —
    * arrival-scale, never corpus-scale. The page must fold ALL
    * arrivals, not just this trigger's (a cell's drift and added
    * share are properties of the post-arrival membership), so each
    * trigger's page IS the exact batch page for the arrivals seen so
    * far — REPLACE semantics, the hnswDeleteStream posture: after the
    * last trigger the page equals the one-shot q_ivf_maintain output
    * bit-for-bit (pinned by Round15Spec over a two-batch feed). */
  def ivfMaintainStream(vecs: DataFrame, d: String)(
      onPage: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.PlanStash.Ckpt
    val s = vecs.sparkSession // defining session: see hnswInsertStream
    var soFar: Option[DataFrame] = None
    vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val q = batch.select(col("vec_id"),
          expr(graft.operators.Learn.QuantTok).as("qs"))
        val cum = soFar match {
          case Some(t) => t.unionByName(q).ckpt()
          case None => q.ckpt()
        }
        soFar = Some(cum)
        onPage(graft.operators.SimSearch.ivfMaintainPage(s, d, cum))
      }
      .start()
  }
}

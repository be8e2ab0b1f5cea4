package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.operators.NearDup

/** Streaming near-duplicate suppression — the INGEST-TIME guard that
  * keeps a document stream (a live crawl, a re-posting feed) from
  * landing near-identical text in the corpus, within a bounded
  * reordering window. The batch near-dup bank (q_dedup_minhash et al.)
  * is the offline sweep; these builders are its online twin, built on
  * the same MinHash machinery (NearDup.withRowSignatures — identical
  * universal-hash constants, so online and offline signatures agree
  * bit-for-bit and a doc admitted by the stream guard lands in the
  * same LSH buckets offline).
  *
  * 100 TB-ingest posture: signatures are computed in a STATELESS
  * projection (map-only, no shuffle before the stateful op), so the
  * only streaming state is (band_key → first doc id), bounded by the
  * watermark horizon exactly like the reference's TTL'd id-cache
  * (main.py:53-66); document text never enters state.
  *
  * Builders take the source DataFrame so tests inject a MemoryStream
  * and production passes spark.readStream — the plan is identical.
  */
object DocStreams {

  /** One emitted candidate: the bucket's canonical (first-seen) doc
    * and the newcomer that collided with it, with the band that
    * matched. */
  case class CandPair(band_key: String, a_id: Long, b_id: Long)

  // public: Catalyst's generated (de)serializers cannot touch
  // private members — janino fails at codegen, not compile, time
  case class BandHit(band_key: String, doc_id: Long, ts: java.sql.Timestamp)
  case class BandState(firstDoc: Long, n: Long)
  case class BandMembers(docs: Seq[Long])

  /** Signature-grain streaming dedup: drops any doc whose FULL
    * 12-hash MinHash signature was already seen within the watermark —
    * the streaming `dropDuplicatesWithinWatermark` keyed on content
    * (catches exact dups and token-multiset-preserving edits, the
    * highest-similarity tier). Lower-similarity near-dups need band
    * grain → [[lshCandidates]].
    */
  def signatureDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    NearDup.withRowSignatures(docs)
      // Un-shingle-able docs (< 3 tokens) have an empty `hs`, so every
      // sigs entry is NULL and concat_ws would collapse them ALL to the
      // same "" key — distinct short docs would silently dedup against
      // each other. They get a doc-unique key instead: they pass
      // through unpaired (the withRowSignatures contract), and an
      // EXACT re-post of a short doc is still caught upstream by
      // whatever keys on doc identity, not here.
      .withColumn("sig_key",
        when(size(col("hs")) === 0, concat(lit("doc:"), col("doc_id")))
          .otherwise(concat_ws("|", col("sigs"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig_key")
      .select(col("doc_id"), col("ts"), col("text"))

  /** Streaming LSH candidate generation: each doc's 4 band signatures
    * key a stateful bucket; the bucket's FIRST doc becomes its
    * canonical representative, and every later arrival emits a
    * (canonical, newcomer) candidate pair — the online form of
    * q_dedup_minhash's band self-join, with the self-join replaced by
    * per-bucket state. Downstream (foreachBatch or the offline sweep)
    * runs the exact-Jaccard verify on candidates only, exactly like
    * the batch pipeline.
    *
    * Verification is against the canonical doc only (SemDeDup-style
    * canonical pick, documented recall tradeoff vs all-pairs); state
    * per bucket is ONE doc id + a count, expired by event-time timeout
    * one watermark past the bucket's last activity.
    */
  def lshCandidates(docs: DataFrame, watermark: String = "1 hour"): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val bands = NearDup.withRowSignatures(docs)
      .filter(size(col("hs")) >= 1) // un-shingle-able docs can't collide
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, ${NearDup.Bands - 1})")).as("b"), col("sigs"))
      .select(
        concat(col("b"), lit(":"),
          expr(s"concat_ws('|', slice(sigs, b * ${NearDup.Rows} + 1, ${NearDup.Rows}))")).as("band_key"),
        col("doc_id"), col("ts"))
    // the watermarked event-time column must survive INTO the stateful
    // operator's input — EventTimeTimeout's analyzer check looks for it
    // there, not just for an upstream watermark node
    bands.as[BandHit]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BandState, CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[BandHit], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: event time, then doc id
            val hits = rows.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
            val out = Seq.newBuilder[CandPair]
            var st = state.getOption
            hits.foreach { h =>
              st match {
                case None => st = Some(BandState(h.doc_id, 1L))
                case Some(s0) =>
                  if (h.doc_id != s0.firstDoc) out += CandPair(key, s0.firstDoc, h.doc_id)
                  st = Some(s0.copy(n = s0.n + 1))
              }
            }
            state.update(st.get)
            state.setTimeoutTimestamp(hits.map(_.ts.getTime).max, watermark)
            out.result().iterator
          }
      }
  }

  /** [[lshCandidates]] at FULL band-bucket grain: every newcomer pairs
    * with EVERY doc currently in its bucket (id-ordered a_id < b_id) —
    * the exact online twin of q_dedup_minhash's band self-join, where
    * the canonical-only variant trades recall for one-id state. State
    * per bucket is the member id LIST, bounded by the watermark horizon
    * × the bucket collision rate — banded LSH keeps buckets small by
    * construction (that is its candidate-bounding job), the same
    * argument that bounds the batch join's per-bucket fan-out; ids
    * only, never text. Expiry: event-time timeout one watermark past
    * the bucket's last activity, like the canonical variant.
    */
  def lshCandidatesAll(docs: DataFrame, watermark: String = "1 hour"): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val bands = NearDup.withRowSignatures(docs)
      .filter(size(col("hs")) >= 1)
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, ${NearDup.Bands - 1})")).as("b"), col("sigs"))
      .select(
        concat(col("b"), lit(":"),
          expr(s"concat_ws('|', slice(sigs, b * ${NearDup.Rows} + 1, ${NearDup.Rows}))")).as("band_key"),
        col("doc_id"), col("ts"))
    bands.as[BandHit]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BandMembers, CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[BandHit], state: GroupState[BandMembers]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val hits = rows.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
            val out = Seq.newBuilder[CandPair]
            var members = state.getOption.map(_.docs).getOrElse(Seq.empty)
            hits.foreach { h =>
              if (!members.contains(h.doc_id)) {
                members.foreach { m =>
                  out += CandPair(key, math.min(m, h.doc_id), math.max(m, h.doc_id))
                }
                members = members :+ h.doc_id
              }
            }
            state.update(BandMembers(members))
            state.setTimeoutTimestamp(hits.map(_.ts.getTime).max, watermark)
            out.result().iterator
          }
      }
  }

  /** EXACT-Jaccard verification of a candidate micro-batch against the
    * hashed-shingle bank (`bank` = (doc_id, hs) — in production the doc
    * store's signature side-table; NearDup.withHashedShingles builds
    * it) — the same verify the batch pipeline runs on its band join
    * (NearDup q_dedup_minhash), so online and offline verdicts agree
    * bit-for-bit on the same pair. Batch-local distinct first: a pair
    * colliding in k bands emits k times within its arrival batch, and
    * verifying it once is the point of candidate generation.
    */
  def verifyCandidates(cands: DataFrame, bank: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(cands.sparkSession)
    cands.select(col("a_id"), col("b_id")).distinct()
      .join(bank.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
      .join(bank.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
      .withColumn("jaccard", expr("jaccard_sorted(ha, hb)"))
      .filter(col("jaccard") >= 0.6)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** The CLOSED streaming near-dup loop: candidates at full bucket
    * grain → per-micro-batch exact verify → verified-duplicate rows to
    * `sink`. foreachBatch is the right tier: the verify is a bounded
    * batch join (candidate-page × signature bank), not stateful stream
    * processing, and the sink callback is where production appends to
    * the dedup ledger. Returns the writer un-started so callers own
    * trigger/checkpoint config.
    */
  def verifiedDuplicates(docs: DataFrame, bank: DataFrame, watermark: String = "1 hour")(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[CandPair] =
    lshCandidatesAll(docs, watermark).writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[CandPair], _: Long) =>
        sink(verifyCandidates(batch.toDF(), bank))
      }

  // ---------------------------------------------------------------
  // Streaming n-gram novelty (q_ngram_novelty's online twin)
  // ---------------------------------------------------------------

  case class DocShingle(doc_id: Long, h: Long)

  /** One doc's novelty contribution from one shard; serving sums the
    * shards per doc (the MgSketch union pattern). */
  case class NoveltyPartial(doc_id: Long, shard: Long, n_total: Long, n_novel: Long)

  /** Fixed-size Bloom bit array + insert count (for the documented
    * false-positive bound). Public: Catalyst's generated serializers
    * cannot touch private members. */
  case class BloomNoveltyState(bits: Array[Byte], n_inserted: Long)

  /** Per-shard Bloom "seen shingles" state: membership test + insert
    * for each incoming (doc, shingle hash). State is a FIXED mBits
    * bit array per shard — the whole point: an exact seen-set grows
    * with the corpus and cannot live in streaming state at 100 TB,
    * while the Bloom undercounts novelty only by its false-positive
    * rate (1 − e^{−2n/m})², deterministic given the hash constants.
    * Rows within a micro-batch are buffered (bounded by batch size)
    * and processed in doc_id order, so a batch replay of an id-ordered
    * feed reproduces the batch query's min-doc_id first-occurrence
    * semantics exactly (up to Bloom collisions).
    */
  class BloomNoveltyProcessor(mBits: Int)
      extends StatefulProcessor[Long, DocShingle, NoveltyPartial] {
    private val P = 2147483647L
    private val A1 = 1103617541L; private val B1 = 94370269L
    private val A2 = 1803301271L; private val B2 = 592394837L
    @transient private var bloom: ValueState[BloomNoveltyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bloom = getHandle.getValueState[BloomNoveltyState]("bloom",
        org.apache.spark.sql.Encoders.product[BloomNoveltyState], TTLConfig.NONE)

    private def pos(h: Long, a: Long, b: Long): Int =
      ((((h % P) * a + b) % P) % mBits).toInt
    private def get(bits: Array[Byte], p: Int): Boolean =
      (bits(p >> 3) & (1 << (p & 7))) != 0
    private def set(bits: Array[Byte], p: Int): Unit =
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte

    override def handleInputRows(shard: Long, rows: Iterator[DocShingle],
                                 timerValues: TimerValues): Iterator[NoveltyPartial] = {
      val st = if (bloom.exists()) bloom.get()
               else BloomNoveltyState(new Array[Byte](mBits / 8), 0L)
      val bits = st.bits.clone()
      var inserted = st.n_inserted
      val byDoc = rows.toSeq.groupBy(_.doc_id).toSeq.sortBy(_._1)
      val out = byDoc.map { case (docId, ss) =>
        var novel = 0L
        ss.foreach { r =>
          val p1 = pos(r.h, A1, B1); val p2 = pos(r.h, A2, B2)
          if (!(get(bits, p1) && get(bits, p2))) {
            novel += 1; set(bits, p1); set(bits, p2); inserted += 1
          }
        }
        NoveltyPartial(docId, shard, ss.size.toLong, novel)
      }
      bloom.update(BloomNoveltyState(bits, inserted))
      out.iterator
    }
  }

  /** STREAMING novelty scoring: per arriving doc, how many of its
    * distinct 3-gram shingles has this stream never seen — the online
    * form of q_ngram_novelty's first-occurrence profile, the gate a
    * live crawl applies BEFORE paying to store/tokenize a page.
    * Shingle hashes (same constants as the batch query) are computed
    * in a stateless projection and SHARDED BY HASH, so each shingle's
    * membership lives in exactly one shard's Bloom filter and per-doc
    * novelty is the sum of its shard partials (mergeable-summary
    * serving, the heavyHittersTws pattern). Text never enters state;
    * state per shard is a fixed 128 KiB bit array regardless of
    * corpus size.
    */
  def noveltyTws(docs: DataFrame, shards: Int = 4, mBits: Int = 1 << 20): Dataset[NoveltyPartial] = {
    import docs.sparkSession.implicits._
    NearDup.withHashedShingles(docs)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .as[DocShingle]
      .groupByKey(r => math.floorMod(r.h, shards.toLong))
      .transformWithState(new BloomNoveltyProcessor(mBits),
        TimeMode.None(), OutputMode.Update())
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming semantics with no SQL oracle (SURVEY §5.4): watermark
  * late-data drop, within-watermark dedup, stateful running totals —
  * driven through MemoryStream micro-batches like the reference's
  * page-loop replay.
  */
case class VecRow(vec_id: Long, ts: Timestamp, label: Int,
  embedding: Seq[Float])

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L, value: Double = 1.0): Event =
    Event(id, ts(minute), user, "click", value)

  test("within-watermark dedup collapses re-delivered ids across micro-batches") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedupWithinWatermark(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(ev(1, 0), ev(2, 1))
      q.processAllAvailable()
      input.addData(ev(1, 2), ev(3, 3)) // id 1 re-delivered, inside watermark
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
      assert(got.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("watermark drops late rows from windowed aggregation (append mode)") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.hourlyAgg(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("hourly_out").outputMode("append").start()
    try {
      input.addData(ev(1, 5), ev(2, 50))   // hour 10:00 window
      q.processAllAvailable()
      input.addData(ev(3, 125))            // 12:05 → watermark to 11:55, closes 10:00 & 11:00
      q.processAllAvailable()
      input.addData(ev(4, 30))             // 10:30 — LATE, behind watermark: dropped
      input.addData(ev(5, 130))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select($"ws".cast("string"), $"n").as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 10:00:00") === 2L) // late row 4 NOT counted
    } finally q.stop()
  }

  test("vector admission: the stream blocks planted cosine copies against the static corpus index") {
    // q_dedup_embed_inc's online twin: planted +0.01/dim copies of
    // corpus vectors must be BLOCKED (a verified >= 0.95-cosine match
    // in the static index), a negated vector must be ADMITTED, and a
    // verdict row exists for every in-flight vector once the watermark
    // passes its event time.
    val corpus = Tables.embeddings(spark, sf)
    val cents = graft.operators.Learn.coarseCentroids(spark, sf)
    val src = corpus.filter($"vec_id".isin(5L, 10L, 15L, 7L))
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getAs[scala.collection.Seq[Float]](2).toSeq)))
      .toMap
    def copyOf(id: Long, newId: Long): VecRow = {
      val (lab, e) = src(id); VecRow(newId, ts(0), lab, e.map(_ + 0.01f))
    }
    val novel = { val (lab, e) = src(7L); VecRow(9001L, ts(0), lab, e.map(x => -x)) }
    val input = MemoryStream[VecRow](spark)
    val q = graft.streaming.VecStreams
      .vectorAdmission(input.toDF(), corpus, cents, "1 hour")
      .writeStream.format("memory").queryName("vecadm_out")
      .outputMode("append").start()
    try {
      input.addData(copyOf(5L, 1005L), copyOf(10L, 1010L), copyOf(15L, 1015L), novel)
      q.processAllAvailable()
      // a far-future row advances the watermark past the batch, so its
      // verdicts EMIT (append mode); the pusher itself stays in flight
      input.addData(VecRow(9999L, ts(180), src(7L)._1, src(7L)._2))
      q.processAllAvailable()
      val got = spark.table("vecadm_out")
        .select($"new_id", $"n_matches", $"admit").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(Set(1005L, 1010L, 1015L, 9001L).subsetOf(got.keySet),
        s"missing verdicts: $got")
      Seq(1005L, 1010L, 1015L).foreach { id =>
        assert(!got(id)._2 && got(id)._1 >= 1L,
          s"planted copy $id not blocked: ${got(id)}")
      }
      assert(got(9001L)._2 && got(9001L)._1 == 0L,
        s"novel vector not admitted: ${got(9001L)}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window clicks only") {
    val clicks = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val q = EventStreams.clickAttribution(clicks.toDF(), purchases.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      // user 1: click at :05 and :40; purchases at :12 (matches :05
      // click) and :55 (matches :40? 55-40=15 > 10 → no). user 2:
      // click at :20, purchase at :25 (match). cross-user never joins.
      clicks.addData(ev(101, 5, user = 1), ev(102, 40, user = 1), ev(201, 20, user = 2))
      purchases.addData(ev(901, 12, user = 1), ev(902, 55, user = 1), ev(903, 25, user = 2))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(got === Set((901L, 101L), (903L, 201L)))
    } finally q.stop()
  }

  test("left-outer interval join emits NULL-click purchases once the watermark closes them") {
    val clicks = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val q = EventStreams.clickAttributionLeftOuter(clicks.toDF(), purchases.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("attr_outer_out").outputMode("append").start()
    try {
      // user 1's purchase at :12 matches the :05 click; user 2's
      // purchase at :25 has no click in [:15, :25].
      clicks.addData(ev(101, 5, user = 1))
      purchases.addData(ev(901, 12, user = 1), ev(902, 25, user = 2))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched one must NOT
      // yet — a :25-or-earlier click could still arrive
      val early = spark.table("attr_outer_out")
        .select($"purchase_id", $"click_id").as[(Long, Option[Long])].collect().toMap
      assert(early.get(902L).flatten.isEmpty, s"unmatched purchase emitted early: $early")
      // advance BOTH watermarks far past :25 + lag so state closes
      clicks.addData(ev(109, 120, user = 9))
      purchases.addData(ev(909, 120, user = 9))
      q.processAllAvailable()
      clicks.addData(ev(110, 130, user = 9)) // second nudge: outer rows emit on the NEXT batch
      purchases.addData(ev(910, 130, user = 9))
      q.processAllAvailable()
      val got = spark.table("attr_outer_out")
        .select($"purchase_id", $"click_id").as[(Long, Option[Long])].collect()
        .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      assert(got(901L) === Set(Some(101L)), s"matched purchase wrong: $got")
      assert(got(902L) === Set(None), s"closed unmatched purchase must emit exactly one NULL-click row: $got")
    } finally q.stop()
  }

  test("foreachBatch incremental upsert: newest row per user wins across batches") {
    val input = MemoryStream[Event](spark)
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val q = EventStreams.incrementalUpsert(input.toDF(), s"$base/snapshot", s"$base/ckpt")
    try {
      input.addData(ev(1, 0, user = 1, value = 10.0), ev(2, 5, user = 2, value = 20.0))
      q.processAllAvailable()
      val s1 = spark.read.parquet(s"$base/snapshot")
      assert(s1.count() === 2)
      // batch 2: user 1 gets a NEWER event (wins), user 2 an OLDER one (loses), user 3 is new
      input.addData(ev(3, 30, user = 1, value = 99.0), ev(4, 2, user = 2, value = 77.0),
        ev(5, 7, user = 3, value = 5.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/snapshot")
        .select($"user_id", $"event_id", $"value").as[(Long, Long, Double)]
        .collect().map(t => t._1 -> (t._2, t._3)).toMap
      assert(got === Map(1L -> (3L, 99.0), 2L -> (2L, 20.0), 3L -> (5L, 5.0)))
    } finally q.stop()
  }

  test("stateful running totals accumulate across micro-batches") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("totals_out").outputMode("update").start()
    try {
      input.addData(ev(1, 0, user = 7, value = 2.0), ev(2, 1, user = 7, value = 3.0))
      q.processAllAvailable()
      input.addData(ev(3, 2, user = 7, value = 5.0))
      q.processAllAvailable()
      val latest = spark.table("totals_out").filter($"user_id" === 7)
        .orderBy($"n".desc).head()
      assert(latest.getLong(1) === 3L)
      assert(latest.getDouble(2) === 10.0)
    } finally q.stop()
  }

  test("cusumTws: edge-triggered alarms match the serial recurrence and are batching-invariant") {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // a drifting series: baseline 50, short excursion to 300 at
      // minutes 10-11, deep recovery to 0 (drains S back under the
      // threshold), second excursion at 25
      def series(i: Int): Double =
        if (i >= 10 && i < 12) 300.0
        else if (i >= 12 && i < 25) 0.0
        else if (i >= 25) 280.0 else 50.0
      val evs = (0 until 30).map(i => ev(i.toLong, i, value = series(i)))
      // serial ground truth (target 50k milli, slack 5k, threshold 200k)
      var s = 0L; val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      evs.foreach { e =>
        val p = s
        s = math.max(0L, s + math.floor(e.value * 1000 + 0.5).toLong - 50000L - 5000L)
        if (s > 200000L && p <= 200000L) expected += ((e.event_id, s))
      }
      assert(expected.size == 2, s"fixture must produce exactly 2 crossings, got $expected")
      def run(name: String, batches: Seq[Seq[Event]]): Seq[(Long, Long)] = {
        val input = MemoryStream[Event](spark)
        val q = EventStreams.cusumTws(input.toDS(), targetMilli = 50000L)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
          spark.table(name).select($"event_id", $"s_milli").as[(Long, Long)]
            .collect().sortBy(_._1).toSeq
        } finally q.stop()
      }
      val oneShot = run("cusum_one", Seq(evs))
      val split = run("cusum_split", Seq(evs.take(7), evs.slice(7, 13), evs.drop(13)))
      assert(oneShot == expected.toSeq, s"single-batch alarms diverge: $oneShot vs $expected")
      assert(split == expected.toSeq, "alarm set depends on micro-batch boundaries")
    } finally {
      prev match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running totals accumulate (RocksDB store), TTL wiring runs") {
    // Spark 4's arbitrary-state v2 API requires the RocksDB provider
    // (multi-column-family state layout).
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val q = EventStreams.runningTotalsTws(input.toDS())
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()
      try {
        input.addData(ev(1, 0, user = 7, value = 2.0), ev(2, 1, user = 7, value = 3.0))
        q.processAllAvailable()
        input.addData(ev(3, 2, user = 7, value = 5.0), ev(4, 3, user = 8, value = 1.0))
        q.processAllAvailable()
        val latest = spark.table("tws_out").filter($"user_id" === 7)
          .orderBy($"n".desc).head()
        assert(latest.getLong(1) === 3L)
        assert(latest.getDouble(2) === 10.0)
        assert(spark.table("tws_out").filter($"user_id" === 8).head().getLong(1) === 1L)
      } finally q.stop()
      // TTL path: a 1-hour processing-time TTL must wire up and run
      // (state cannot expire within the test — this pins the
      // ProcessingTime mode + TTLConfig plumbing, not the expiry).
      // NOTE: in ProcessingTime mode the operator keeps scheduling
      // micro-batches for timer/TTL evaluation, so processAllAvailable
      // never observes an idle stream and would HANG — poll the sink
      // with a deadline instead.
      val input2 = MemoryStream[Event](spark)
      val q2 = EventStreams.runningTotalsTws(input2.toDS(), java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("tws_ttl_out").outputMode("update").start()
      try {
        input2.addData(ev(1, 0, user = 9, value = 4.0), ev(2, 1, user = 9, value = 6.0))
        val deadline = System.nanoTime() + 60L * 1000000000L
        def emitted(): Boolean = !spark.table("tws_ttl_out")
          .filter($"user_id" === 9 && $"n" === 2).isEmpty
        while (!emitted() && System.nanoTime() < deadline) Thread.sleep(200)
        assert(emitted(), "TTL'd TWS query did not emit the accumulated row in 60s")
        val latest = spark.table("tws_ttl_out").filter($"user_id" === 9)
          .orderBy($"n".desc).head()
        assert(latest.getLong(1) === 2L && latest.getDouble(2) === 10.0)
      } finally q2.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("timer-driven tws sessionization: inline close on gap, watermark close on idle") {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val q = EventStreams.sessionizeTws(input.toDS(), java.time.Duration.ofMinutes(30))
        .writeStream.format("memory").queryName("tws_sess_out").outputMode("append").start()
      try {
        def rows() = spark.table("tws_sess_out")
          .select($"user_id", $"session_start", $"session_end", $"n_events", $"total_milli")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3), r.getLong(4))).toSeq
        // open session for user 7 at minutes 0 and 10
        input.addData(ev(1, 0, user = 7, value = 2.5), ev(2, 10, user = 7, value = 1.0))
        q.processAllAvailable()
        assert(rows().isEmpty, "session closed before gap or watermark allowed")
        // minute 120 is past the 30m gap: session 1 closes INLINE
        input.addData(ev(3, 120, user = 7, value = 4.0))
        q.processAllAvailable()
        val afterInline = rows()
        assert(afterInline == Seq((7L, ts(0), ts(10), 2L, 3500L)),
          s"inline close wrong: $afterInline")
        // user 8's event at minute 200 pushes the watermark to 190 ≥
        // 120 + 30, so user 7's IDLE session closes via the TIMER path
        // (no user-7 event in this batch)
        input.addData(ev(4, 200, user = 8, value = 1.0))
        q.processAllAvailable()
        val afterTimer = rows()
        assert(afterTimer.contains((7L, ts(120), ts(120), 1L, 4000L)),
          s"timer close missing: $afterTimer")
        // user 8's fresh session must still be OPEN (watermark 190 < 230)
        assert(!afterTimer.exists(_._1 == 8L), s"user 8 closed early: $afterTimer")
      } finally q.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming sessionize merges events within the gap") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("session_out").outputMode("append").start()
    try {
      // session A: 10:00, 10:10; session B: 11:30 (gap > 30m)
      input.addData(ev(1, 0, user = 9), ev(2, 10, user = 9), ev(3, 90, user = 9))
      q.processAllAvailable()
      input.addData(ev(4, 300, user = 9)) // push watermark forward to close sessions
      q.processAllAvailable()
      val sessions = spark.table("session_out").filter($"user_id" === 9)
        .select($"n_events").as[Long].collect().sorted.toSeq
      assert(sessions.take(2) === Seq(1L, 2L))
    } finally q.stop()
  }

  test("batch and streaming window algebra agree on the fixture data") {
    val batch = operators.Streaming.queries("q_stream_window_hour")(spark, sf)
    val viaBuilder = EventStreams.hourlyAgg(Tables.events(spark, sf)).orderBy("ws")
    assert(batch.collect().toSeq === viaBuilder.collect().toSeq)
  }

  test("stream-static enrichment joins the dim per micro-batch, unmatched → 'unknown'") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.enrichWithDim(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      input.addData(ev(1, 0, user = 1), ev(2, 1, user = 2), ev(3, 2, user = 7))
      q.processAllAvailable()
      input.addData(ev(4, 3, user = 1)) // second micro-batch re-joins the dim
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select($"event_id", $"segment").as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "gold", 2L -> "silver", 3L -> "unknown", 4L -> "gold"))
    } finally q.stop()
  }

  private case class SDoc(doc_id: Long, text: String, ts: Timestamp)
  private val textA = "the quick brown fox jumps over the lazy dog near the river bank"
  private val textB = "completely unrelated words about spacecraft navigation telemetry systems module"

  test("streaming signature dedup drops a same-signature re-post within the watermark") {
    val input = MemoryStream[SDoc](spark)
    val q = graft.streaming.DocStreams.signatureDedup(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sigdedup_out").outputMode("append").start()
    try {
      input.addData(SDoc(1, textA, ts(0)))
      q.processAllAvailable()
      // doc 2 is a verbatim re-post (identical signature) inside the
      // watermark → dropped; doc 3 is unrelated → admitted
      input.addData(SDoc(2, textA, ts(5)), SDoc(3, textB, ts(6)))
      q.processAllAvailable()
      val got = spark.table("sigdedup_out").select($"doc_id").as[Long].collect().sorted
      assert(got.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming signature dedup passes DISTINCT un-shingle-able short docs through unpaired") {
    val input = MemoryStream[SDoc](spark)
    val q = graft.streaming.DocStreams.signatureDedup(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sigdedup_short_out").outputMode("append").start()
    try {
      // both docs have < 3 tokens → empty shingle set → all-NULL sigs;
      // without the doc-unique fallback key they'd share sig_key "" and
      // doc 2 would be silently dropped as a duplicate of doc 1
      input.addData(SDoc(1, "hello world", ts(0)), SDoc(2, "goodbye moon", ts(1)))
      q.processAllAvailable()
      val got = spark.table("sigdedup_short_out").select($"doc_id").as[Long].collect().sorted
      assert(got.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming LSH candidates pair newcomers with their bucket's canonical doc only") {
    val input = MemoryStream[SDoc](spark)
    val q = graft.streaming.DocStreams.lshCandidates(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("lshcand_out").outputMode("append").start()
    try {
      input.addData(SDoc(1, textA, ts(0)), SDoc(3, textB, ts(1)))
      q.processAllAvailable()
      // doc 2 duplicates doc 1 → collides in all 4 band buckets, each
      // bucket pairing it with its canonical (first-seen) doc 1; no
      // bucket pairs it with the unrelated doc 3
      input.addData(SDoc(2, textA, ts(10)))
      q.processAllAvailable()
      val after2 = spark.table("lshcand_out")
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
      assert(after2.toSet === Set((1L, 2L)), s"got $after2")
      assert(after2.size === 4, s"expected one pair per band, got $after2")
      // doc 4 re-posts the same text later (still in watermark): pairs
      // with the CANONICAL doc 1, not with doc 2
      input.addData(SDoc(4, textA, ts(20)))
      q.processAllAvailable()
      val after4 = spark.table("lshcand_out")
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
      assert(after4.toSet === Set((1L, 2L), (1L, 4L)), s"got $after4")
    } finally q.stop()
  }

  test("streaming verified duplicates equal the batch q_dedup_minhash pairs on the same feed") {
    import graft.operators.NearDup
    // the SAME corpus the batch detector runs on (documents + planted
    // near-dup copies), fed as a 2-micro-batch stream so cross-batch
    // bucket state is exercised; all events inside one watermark window
    val corpus = NearDup.corpus(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (feed1, feed2) = corpus.partition(_._1 % 2 == 0)
    val bank = NearDup.withHashedShingles(NearDup.corpus(spark, sf))
      .select($"doc_id", $"hs")
    val verified = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input = MemoryStream[SDoc](spark)
    val q = graft.streaming.DocStreams
      .verifiedDuplicates(input.toDF(), bank, "1 hour") { batch =>
        verified ++= batch.select($"a_id", $"b_id", $"jaccard")
          .as[(Long, Long, Double)](
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaDouble))
          .collect()
      }
      .start()
    try {
      input.addData(feed1.zipWithIndex.map { case ((id, text), i) => SDoc(id, text, ts(i % 30)) }.toSeq)
      q.processAllAvailable()
      input.addData(feed2.zipWithIndex.map { case ((id, text), i) => SDoc(id, text, ts(30 + i % 30)) }.toSeq)
      q.processAllAvailable()
      val batchPairs = NearDup.queries("q_dedup_minhash")(spark, sf)
        .select($"a_id", $"b_id", $"jaccard").as[(Long, Long, Double)].collect().toSet
      assert(batchPairs.nonEmpty, "fixture must contain planted near-dups")
      assert(verified.toSet === batchPairs,
        s"online/offline divergence: missing=${batchPairs -- verified.toSet} extra=${verified.toSet -- batchPairs}")
    } finally q.stop()
  }

  test("streaming Bloom novelty: shard partials reproduce the batch first-occurrence profile") {
    val conf = spark.conf
    val prev = try Some(conf.get("spark.sql.streaming.stateStore.providerClass"))
    catch { case _: Throwable => None }
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(docs.length >= 10)
      val (b1, b2) = docs.splitAt(docs.length / 2)
      val input = MemoryStream[SDoc](spark)
      val q = graft.streaming.DocStreams.noveltyTws(input.toDF())
        .writeStream.format("memory").queryName("novelty_out").outputMode("update").start()
      try {
        input.addData(b1.map { case (id, t) => SDoc(id, t, ts(0)) }.toSeq: _*)
        q.processAllAvailable()
        input.addData(b2.map { case (id, t) => SDoc(id, t, ts(1)) }.toSeq: _*)
        q.processAllAvailable()
        val got = spark.table("novelty_out")
          .groupBy($"doc_id")
          .agg(sum($"n_total").as("n_shingles"), sum($"n_novel").as("n_novel"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val exact = graft.operators.TextAnalysis.queries("q_ngram_novelty")(spark, sf)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(exact.keySet == got.keySet,
          s"doc coverage diverges: ${exact.keySet.diff(got.keySet).take(3)}")
        var undercount = 0L
        exact.foreach { case (id, (nSh, nNov)) =>
          val (gSh, gNov) = got(id)
          assert(gSh == nSh, s"doc $id shingle count: stream $gSh vs batch $nSh")
          assert(gNov <= nNov, s"doc $id stream novelty OVERcounts: $gNov > $nNov")
          undercount += nNov - gNov
        }
        // Bloom false positives only ever UNDERcount novelty; at this
        // corpus scale (≈10⁴ inserts into 2²⁰ bits) the deterministic
        // collision budget is tiny
        assert(undercount <= 5L, s"Bloom undercount $undercount exceeds the fp budget")
      } finally q.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming Misra-Gries: heavy users survive, counts undercount by ≤ n/(k+1), state ≤ k") {
    val conf = spark.conf
    val prev = try Some(conf.get("spark.sql.streaming.stateStore.providerClass"))
    catch { case _: Throwable => None }
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val k = 5; val shards = 2
      val q = EventStreams.heavyHittersTws(input.toDS(), k = k, shards = shards)
        .writeStream.format("memory").queryName("mg_out").outputMode("update").start()
      try {
        // skewed feed: user 6 dominates (40 events), 20 light users
        // with 3 each — delivered across TWO batches so the sketch
        // must survive state round-trips
        def batch(ids: Range, users: Seq[Long]): Seq[Event] =
          ids.zip(users).map { case (id, u) => ev(id, id % 60, user = u) }
        val heavy = Seq.fill(20)(6L)
        val light1 = (1 to 10).flatMap(u => Seq.fill(2)(u * 2L)) // even → shard 0
        input.addData(batch(1 to (heavy.size + light1.size), heavy ++ light1): _*)
        q.processAllAvailable()
        val light2 = (1 to 10).flatMap(u => Seq.fill(1)(u * 2L))
        input.addData(batch(1000 to (999 + heavy.size + light2.size), heavy ++ light2): _*)
        q.processAllAvailable()
        import spark.implicits._
        // latest sketch per shard
        val sketches = spark.table("mg_out").as[EventStreams.MgSketch].collect()
          .groupBy(_.shard).map(_._2.maxBy(_.processed)).toSeq
        assert(sketches.nonEmpty)
        sketches.foreach(s => assert(s.entries.size <= k, s"shard ${s.shard} overflows k"))
        // user 6 (shard 0): true count 40 within its shard of n₀ rows;
        // MG guarantees a surviving counter with count ≥ 40 − n₀/(k+1)
        val s0 = sketches.find(_.shard == 0L).get
        val n0 = s0.processed
        val c6 = s0.entries.find(_.item == 6L)
        assert(c6.isDefined, s"heavy user evicted from $s0")
        assert(c6.get.count >= 40L - n0 / (k + 1), s"undercount bound violated: $s0")
        assert(c6.get.count <= 40L, s"overcount: $s0")
      } finally q.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming CDC apply converges to the batch max_by fold on a scrambled feed") {
    val conf = spark.conf
    val prev = try Some(conf.get("spark.sql.streaming.stateStore.providerClass"))
    catch { case _: Throwable => None }
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      // the q_cdc_apply log derivation, scrambled by a fixed
      // multiplicative permutation and split across two batches —
      // arrival order is deliberately NOT seq order
      val log = Tables.orders(spark, sf).select(
          col("o_custkey").as("key"), col("o_orderkey").as("seq"),
          when(col("o_orderkey") % 11 === 0, "D").otherwise("U").as("op"),
          col("o_totalprice").as("value"))
        .as[EventStreams.CdcEvent].collect()
        .sortBy(e => (e.seq * 997) % 1009)
      val input = MemoryStream[EventStreams.CdcEvent](spark)
      val q = EventStreams.cdcApplyTws(input.toDS())
        .writeStream.format("memory").queryName("cdc_out").outputMode("update").start()
      try {
        val (b1, b2) = log.splitAt(log.length / 2)
        input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
        input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
        val got = spark.table("cdc_out").as[EventStreams.CdcRow].collect()
          .groupBy(_.key).map(_._2.maxBy(_.seq)).toSeq
          .map(r => (r.key, r.seq, r.op, r.value, r.deleted)).sortBy(_._1)
        val expected = log.groupBy(_.key).map { case (k, es) =>
          val last = es.maxBy(_.seq)
          (k, last.seq, last.op, last.value, last.op == "D")
        }.toSeq.sortBy(_._1)
        assert(got == expected, "streamed materialization diverges from batch max_by")
        // the guard must have seen out-of-order input for this to mean
        // anything: assert the scramble actually inverted some pairs
        val inverted = b1.sliding(2).count(p => p.length == 2 && p(0).seq > p(1).seq)
        assert(inverted > 0, "feed was accidentally seq-ordered — scramble broken")
      } finally q.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming GK quantiles: rank error ≤ εn across batches, bounded state") {
    val conf = spark.conf
    val prev = try Some(conf.get("spark.sql.streaming.stateStore.providerClass"))
    catch { case _: Throwable => None }
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event](spark)
      val eps = 0.05; val shards = 2
      val q = EventStreams.quantileTws(input.toDS(), eps = eps, shards = shards)
        .writeStream.format("memory").queryName("gk_out").outputMode("update").start()
      try {
        // values 1..2000 in a deterministic scrambled order (a fixed
        // multiplicative permutation), split over two batches so the
        // summary survives state round-trips
        val vals = (1 to 2000).map(i => ((i * 997) % 2000 + 1).toDouble)
        def batch(ids: Range, vs: Seq[Double]): Seq[Event] =
          ids.zip(vs).map { case (id, v) => ev(id, id % 60, value = v) }
        input.addData(batch(1 to 1000, vals.take(1000)): _*)
        q.processAllAvailable()
        input.addData(batch(1001 to 2000, vals.drop(1000)): _*)
        q.processAllAvailable()
        import spark.implicits._
        val sketches = spark.table("gk_out").as[EventStreams.GkSketch].collect()
          .groupBy(_.shard).map(_._2.maxBy(_.n)).toSeq
        val n = sketches.map(_.n).sum
        assert(n == 2000L, s"summary lost rows: $n")
        // state bound: O((1/ε)·log(εn)) per shard — generous ceiling
        sketches.foreach(s =>
          assert(s.entries.size <= 200, s"shard ${s.shard} summary too large: ${s.entries.size}"))
        // per-shard invariant: g + Δ ≤ ⌊2εn⌋ (the rank-query guarantee)
        sketches.foreach { s =>
          val cap = math.max(1L, (2 * eps * s.n).toLong)
          s.entries.foreach(e =>
            assert(e.g + e.delta <= cap, s"invariant broken in shard ${s.shard}: $e cap=$cap"))
        }
        // quantile answers: true rank of the estimate within ε·n of
        // the target (values are exactly 1..2000, so value == rank)
        Seq(0.5, 0.9, 0.99).foreach { phi =>
          val est = EventStreams.gkQuery(sketches, phi)
          val target = math.ceil(phi * n)
          assert(math.abs(est - target) <= eps * n + shards,
            s"phi=$phi estimate $est vs target $target exceeds εn=${eps * n}")
        }
      } finally q.stop()
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transitionsTws + entropyRateTws: online entropy matches the batch fixed-point formula") {
    import graft.streaming.EventStreams.{Transition, SrcEntropy}
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val seqU1 = Seq("view", "click", "view", "purchase", "view", "click")
      val seqU2 = Seq("click", "click", "view", "error", "click")
      val evs1 = seqU1.zipWithIndex.map { case (t, i) =>
        Event(i.toLong * 2, ts(i), 1L, t, 1.0) }
      val evs2 = seqU2.zipWithIndex.map { case (t, i) =>
        Event(i.toLong * 2 + 1, ts(i), 2L, t, 1.0) }
      val expected = (seqU1.zip(seqU1.tail) ++ seqU2.zip(seqU2.tail))
        .map { case (a, b) => Transition(a, b) }

      // stage 1: split mid-user so the LastEv state must bridge batches
      val in1 = MemoryStream[Event](spark)
      val q1 = EventStreams.transitionsTws(in1.toDS())
        .writeStream.format("memory").queryName("trans_t").outputMode("append").start()
      val got = try {
        in1.addData(evs1.take(3) ++ evs2.take(2): _*); q1.processAllAvailable()
        in1.addData(evs1.drop(3) ++ evs2.drop(2): _*); q1.processAllAvailable()
        spark.table("trans_t").as[Transition].collect().toSeq
      } finally q1.stop()
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
        expected.groupBy(identity).view.mapValues(_.size).toMap,
        "streamed transitions must equal the per-user zip, as a multiset")

      // stage 2: feed the transitions through the entropy processor
      val in2 = MemoryStream[Transition](spark)
      val q2 = EventStreams.entropyRateTws(in2.toDS())
        .writeStream.format("memory").queryName("ent_t").outputMode("update").start()
      val ent = try {
        val (b1, b2) = expected.splitAt(4)
        in2.addData(b1: _*); q2.processAllAvailable()
        in2.addData(b2: _*); q2.processAllAvailable()
        spark.table("ent_t").as[SrcEntropy].collect().toSeq
      } finally q2.stop()
      // live value per src = the row with the full count
      val finalBySrc = ent.groupBy(_.src).map { case (s, rs) => s -> rs.maxBy(_.n_out) }
      // replay the processor's exact fixed-point recipe from the raw set
      expected.groupBy(_.src).foreach { case (src, ts) =>
        val m = ts.groupBy(_.dst).map { case (d, v) => d -> v.size.toLong }
        val n = m.values.sum
        val hE6 = m.values.map { c =>
          c * math.floor(math.log(n.toDouble / c.toDouble) * 1000000 + 0.5).toLong
        }.sum / n
        val hBits = math.floor(hE6.toDouble / math.log(2.0) + 0.5).toLong
        assert(finalBySrc(src).n_out === n, s"src $src count")
        assert(finalBySrc(src).h_bits_e6 === hBits, s"src $src entropy")
      }
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("concurrencyTws: online max-concurrency matches the batch sweep line across batches") {
    import graft.streaming.EventStreams.LiveConc
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // type "click": nested + chained intervals; value → dur = ⌊v⌋+1 min-scale
      // events at minutes (start, value): overlap structure is known by hand
      val evs = Seq(
        Event(1L, ts(0), 1L, "click", 299.0),  // [0, 300s) = 5 min
        Event(2L, ts(1), 1L, "click", 59.0),   // [60, 120s) nested
        Event(3L, ts(2), 1L, "click", 59.0),   // [120, 180s) — starts AS ev2 ends
        Event(4L, ts(10), 1L, "click", 59.0),  // disjoint tail
        Event(5L, ts(0), 1L, "view", 59.0),
        Event(6L, ts(3), 1L, "view", 59.0))    // disjoint — view never overlaps
      // reference sweep (the batch q_concurrency recipe): ±1 marks,
      // order by (t, delta), running sum per RANGE group, max
      def sweepMax(es: Seq[Event]): Long = {
        val marks = es.flatMap { e =>
          val s = e.ts.getTime * 1000L
          Seq((s, 1L), (s + (math.floor(e.value).toLong + 1) * 1000000L, -1L))
        }
        val grouped = marks.groupBy(identity).view.mapValues(_.size).toSeq
          .map { case ((t, d), c) => (t, d, d * c) }.sortBy(m => (m._1, m._2))
        grouped.scanLeft(0L)((acc, m) => acc + m._3).tail.max
      }
      val in = MemoryStream[Event](spark)
      val q = EventStreams.concurrencyTws(in.toDS())
        .writeStream.format("memory").queryName("conc_t").outputMode("update").start()
      val got = try {
        // split mid-overlap: ev1/ev2 land in batch 1, ev3 (which overlaps
        // ev1 and touches ev2) in batch 2 — the end-list state must bridge
        in.addData(evs.take(2) ++ evs.slice(4, 5): _*); q.processAllAvailable()
        in.addData(evs.slice(2, 4) ++ evs.drop(5): _*); q.processAllAvailable()
        spark.table("conc_t").as[LiveConc].collect().toSeq
      } finally q.stop()
      val finalByType = got.groupBy(_.event_type)
        .map { case (t, rs) => t -> rs.maxBy(_.n_intervals) }
      Seq("click", "view").foreach { t =>
        val mine = evs.filter(_.event_type == t)
        assert(finalByType(t).n_intervals === mine.size.toLong, s"$t interval count")
        assert(finalByType(t).max_concurrent === sweepMax(mine),
          s"$t max concurrency vs batch sweep")
      }
      // ev2 ends exactly when ev3 starts: ends retire first, so click
      // peak is 2 (ev1+ev2 or ev1+ev3), never 3
      assert(finalByType("click").max_concurrent === 2L)
    } finally prev match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

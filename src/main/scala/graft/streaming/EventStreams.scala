package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming form of the engine (SURVEY §2.6 M5).
  *
  * The reference's ingest loop (main.py:163-210) is a hand-rolled
  * micro-batch protocol: page-token offsets, per-page dedup against the
  * sink, buffered flush. These builders re-express that contract on
  * Structured Streaming state primitives: watermarks bound state like
  * the TTL cache bounded the id-set (main.py:53-66), and
  * dropDuplicatesWithinWatermark is the streaming twin of the
  * anti-join dedup (main.py:175).
  *
  * Builders take the source DataFrame as input so tests can inject a
  * MemoryStream and production can pass spark.readStream — the plan is
  * identical either way.
  */
object EventStreams {

  /** Tumbling event-time window aggregate with late-data drop. */
  def hourlyAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("ws"), col("n"), col("total"))

  /** Sliding windows: 1 hour span every 30 minutes (2 windows/event). */
  def slidingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))

  /** Streaming dedup bounded by the watermark — the reference's
    * anti-join vs already-seen ids with TTL'd state.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user with a 30-minute gap. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total"))

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding `lag`. BOTH sides carry watermarks and
    * the join condition bounds event time in both directions — that is
    * what lets Spark expire join state: a buffered click can be
    * dropped once the purchase watermark passes click_ts + lag, so
    * state stays O(lag × rate) instead of growing with the stream.
    * (The batch as-of/range joins are the offline twins; this is the
    * online form.)
    */
  /** Stream-static enrichment join: the streaming fact side joins a
    * STATIC dimension (a lookup table, the streaming analogue of the
    * reference's per-run account roster). Spark re-resolves the static
    * side's files every micro-batch, so a slowly-refreshed dim
    * directory picks up new snapshots without restarting the query —
    * and a static side under the broadcast threshold plans as a
    * BroadcastHashJoin per batch: no shuffle ever touches the stream,
    * which is the only join shape that holds up when the stream is the
    * 100 TB side. Stateless (no watermark needed — static rows are
    * never late).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("segment"), lit("unknown")).as("segment"),
        col("value"))

  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       lag: String = "10 minutes",
                       watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
        s"c_user = p_user AND click_ts BETWEEN purchase_ts - INTERVAL $lag AND purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Left-outer variant of [[clickAttribution]]: every purchase is
    * emitted exactly once — matched purchases with their click(s), and
    * unattributed purchases with a NULL click once the CLICK-side
    * watermark passes `purchase_ts` (only then can Spark prove no
    * matching click is still in flight; until that point the purchase
    * waits in state). Same state bound as the inner form — both sides
    * watermarked, the join condition bounds event time in both
    * directions — plus the outer row's emission is watermark-delayed,
    * which is the price of a complete answer on an unbounded stream.
    */
  def clickAttributionLeftOuter(clicks: DataFrame, purchases: DataFrame,
                                lag: String = "10 minutes",
                                watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
        s"c_user = p_user AND click_ts BETWEEN purchase_ts - INTERVAL $lag AND purchase_ts"),
        "left_outer")
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Custom stateful operator via flatMapGroupsWithState: running
    * per-user totals emitted on every update — the shape a bespoke
    * state machine (beyond built-in windows) takes in this engine.
    */
  /** Last-wins merge of `batch` into a parquet snapshot: key = `key`,
    * recency = (`ver` desc, `tieBreak` desc). Stage-then-rename keeps
    * the swap atomic at the directory level — readers see the old or
    * the new snapshot, never a partial write. This is the MERGE INTO
    * shape for a plain-parquet sink (a table format would take the
    * same plan and add snapshot isolation).
    */
  def mergeIntoSnapshot(batch: DataFrame, snapshot: String,
                        key: String, ver: String, tieBreak: String): Unit = {
    val s = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    val snapPath = new org.apache.hadoop.fs.Path(snapshot)
    val cur = if (fs.exists(snapPath)) s.read.parquet(snapshot) else batch.limit(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ver).desc, col(tieBreak).desc)
    val merged = cur.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val staging = new org.apache.hadoop.fs.Path(snapshot + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    fs.delete(snapPath, true)
    fs.rename(staging, snapPath)
  }

  /** Streaming incremental snapshot maintenance via foreachBatch:
    * every micro-batch upserts its rows (newest per user wins) into
    * the parquet snapshot. Exactly-once per batch comes from the
    * idempotence of last-wins merge — replaying a batch after failure
    * converges to the same snapshot.
    */
  def incrementalUpsert(events: DataFrame, snapshotDir: String,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeIntoSnapshot(batch.toDF(), snapshotDir, "user_id", "ts", "event_id")
      }
      .start()

  /** [[runningTotals]] re-expressed on Spark 4's `transformWithState`
    * (SPARK-46815) — the successor of flatMapGroupsWithState: named,
    * typed per-key state variables with INDEPENDENT TTLs, timers, and
    * schema evolution, served by the RocksDB state store (the API
    * needs its multi-column-family layout; callers must set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `RocksDBStateStoreProvider`). A non-null `ttl` bounds per-user
    * state exactly like the reference's TTL'd id-cache
    * (main.py:53-66) — and state TTL is processing-time-based, so it
    * switches the query's TimeMode to ProcessingTime.
    */
  class RunningTotalProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var totals: ValueState[UserTotal] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        org.apache.spark.sql.Encoders.product[UserTotal],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))
    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserTotal] = {
      val prev = if (totals.exists()) totals.get() else UserTotal(uid, 0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotal(uid, n, total)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningTotalsTws(events: Dataset[Event],
                       ttl: java.time.Duration = null): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor(ttl),
        if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  case class CusumAlarm(event_type: String, event_id: Long, s_milli: Long)

  /** STREAMING CUSUM — the online twin of the batch q_cusum control
    * chart (RelationalExt): per event-type key the state is ONE long
    * (the current statistic S), updated by the textbook recurrence
    * S ← max(0, S + x − μ − k) and emitting an alarm row only on the
    * UPWARD CROSSING of the threshold (edge-triggered, so a sustained
    * excursion produces one alarm, not one per event — the pager
    * contract). The target μ is a run PARAMETER (production CUSUM
    * monitors against a reference mean; the batch query derives it
    * from history). In-batch iteration sorts by (ts, event_id) — a
    * micro-batch's group iterator has no order contract, and the
    * recurrence must not depend on shuffle arrival order — which also
    * makes the alarm set invariant to how the stream is batched
    * (spec-pinned). State per key: one BIGINT, forever — the
    * boundedness contract, trivially.
    */
  class CusumProcessor(targetMilli: Long, slackMilli: Long, thresholdMilli: Long)
      extends StatefulProcessor[String, Event, CusumAlarm] {
    @transient private var st: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("s",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[CusumAlarm] = {
      var s = if (st.exists()) st.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[CusumAlarm]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val xm = math.floor(e.value * 1000 + 0.5).toLong
        val prev = s
        s = math.max(0L, s + xm - targetMilli - slackMilli)
        if (s > thresholdMilli && prev <= thresholdMilli)
          out += CusumAlarm(key, e.event_id, s)
      }
      st.update(s)
      out.iterator
    }
  }

  def cusumTws(events: Dataset[Event], targetMilli: Long,
               slackMilli: Long = 5000L,
               thresholdMilli: Long = 200000L): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(targetMilli, slackMilli, thresholdMilli),
        TimeMode.None(), OutputMode.Append())
  }

  // ---- streaming entropy-rate twin (q_entropy_rate online) ----

  case class Transition(src: String, dst: String)
  case class LastEv(tsMs: Long, eventId: Long, eventType: String)
  case class SrcEntropy(src: String, n_out: Long, h_bits_e6: Long)

  /** Stage 1 of the online behavior-predictability monitor: per-user
    * LAST-EVENT memory that turns the raw stream into (src → dst)
    * transitions — the streaming form of q_entropy_rate's lead()
    * window. In-batch iteration sorts by (ts, event_id) (the
    * SessionTimerProcessor contract: a micro-batch group iterator has
    * no order guarantee, and the transition sequence must not depend
    * on shuffle arrival order); across batches the single fixed-size
    * state row carries the last event forward, so batching is
    * invariant for an in-order feed. State: one row per ACTIVE user
    * (the same boundedness class as sessionizeTws).
    */
  class TransitionProcessor extends StatefulProcessor[Long, Event, Transition] {
    @transient private var st: ValueState[LastEv] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LastEv]("last",
        org.apache.spark.sql.Encoders.product[LastEv], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Transition] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
      var prev: LastEv = if (st.exists()) st.get() else null
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (prev != null) out += Transition(prev.eventType, e.event_type)
        prev = LastEv(e.ts.getTime, e.event_id, e.event_type)
      }
      if (prev != null) st.update(prev)
      out.iterator
    }
  }

  def transitionsTws(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Stage 2: per-SOURCE transition-count state (bounded by
    * |event types| ≤ a handful of dst cells per src — the smallest
    * state in the file) emitting the src's CURRENT entropy
    * contribution after every batch, in e6-bits fixed point with the
    * batch operator's exact recipe (ln of exact integer ratios
    * snapped to the e6 grid, Σ c·term / n). Update mode: the latest
    * row per src is the live value; Σ_src n·h/Σn replays
    * q_entropy_rate's corpus number. Chaining [[transitionsTws]] into
    * this is the two-stage transformWithState pipeline the batch
    * lead()+groupBy pair becomes online.
    */
  class SrcEntropyProcessor extends StatefulProcessor[String, Transition, SrcEntropy] {
    @transient private var st: ValueState[Map[String, Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Map[String, Long]]("cnt",
        org.apache.spark.sql.Encoders.kryo[Map[String, Long]], TTLConfig.NONE)
    override def handleInputRows(src: String, rows: Iterator[Transition],
                                 timerValues: TimerValues): Iterator[SrcEntropy] = {
      var m: Map[String, Long] = if (st.exists()) st.get() else Map.empty
      rows.foreach { t => m = m.updated(t.dst, m.getOrElse(t.dst, 0L) + 1L) }
      st.update(m)
      val n = m.values.sum
      val hE6 = m.values.map { c =>
        val termE6 = math.floor(math.log(n.toDouble / c.toDouble) * 1000000 + 0.5).toLong
        c * termE6
      }.sum / n
      // nats → bits on the same fixed-point grid as the batch twin
      Iterator.single(SrcEntropy(src, n,
        math.floor(hE6.toDouble / math.log(2.0) + 0.5).toLong))
    }
  }

  def entropyRateTws(transitions: Dataset[Transition]): Dataset[SrcEntropy] = {
    import transitions.sparkSession.implicits._
    transitions.groupByKey(_.src)
      .transformWithState(new SrcEntropyProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ---- streaming concurrency twin (q_concurrency online) ----

  case class ConcState(endsUs: Vector[Long], maxLive: Long, nIntervals: Long)
  case class LiveConc(event_type: String, n_intervals: Long, n_open: Long,
                      max_concurrent: Long)

  /** Streaming twin of the batch q_concurrency sweep line: per event
    * type, how many intervals (duration = ⌊value⌋+1 s, the batch
    * convention) are open RIGHT NOW and the max ever open at once.
    * Instead of replaying ±1 marks, the state carries the open
    * intervals' end-times; each arrival first retires every end ≤ its
    * start (ends retire BEFORE starts at the same instant — exactly
    * the batch sweep's delta sort order), then opens itself, and the
    * live count after that step updates the running max. In-batch
    * iteration sorts by (ts, event_id) (the TransitionProcessor
    * contract); across batches the pruned end-list bridges, so
    * batching is invariant for an in-order feed. Update mode: one live
    * row per type per batch.
    *
    * State boundedness: the end-list self-prunes on every arrival, so
    * it holds only CURRENTLY-open intervals — bounded by arrival rate
    * × max duration (the live concurrency itself), never by stream
    * length.
    */
  class ConcurrencyProcessor extends StatefulProcessor[String, Event, LiveConc] {
    @transient private var st: ValueState[ConcState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ConcState]("conc",
        org.apache.spark.sql.Encoders.kryo[ConcState], TTLConfig.NONE)
    override def handleInputRows(et: String, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[LiveConc] = {
      var s = if (st.exists()) st.get() else ConcState(Vector.empty, 0L, 0L)
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val startUs = e.ts.getTime * 1000L
        val endUs = startUs + (math.floor(e.value).toLong + 1L) * 1000000L
        val open = s.endsUs.filter(_ > startUs) // end == start retires first
        s = ConcState(open :+ endUs,
          math.max(s.maxLive, open.size + 1L), s.nIntervals + 1L)
      }
      st.update(s)
      Iterator.single(LiveConc(et, s.nIntervals, s.endsUs.size.toLong, s.maxLive))
    }
  }

  def concurrencyTws(events: Dataset[Event]): Dataset[LiveConc] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new ConcurrencyProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class SessState(startMs: Long, lastMs: Long, n: Long, totalMilli: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           total_milli: Long)

  /** [[sessionize]] re-expressed on `transformWithState` with
    * EVENT-TIME TIMERS — the API surface the built-in session_window
    * hides: one timer per open session at last_event + gap; when the
    * WATERMARK passes it, `handleExpiredTimer` emits the closed
    * session and clears state (so an idle user's session closes
    * without waiting for their next event — the half the
    * close-on-next-arrival formulation structurally cannot do). An
    * event landing past the gap also closes the old session inline
    * (no reason to sit on a finished session until the watermark
    * catches up). Each update re-registers the key's single timer
    * (delete old, register new), so stale timers never fire.
    *
    * Semantics match session_window's merge rule: events within `gap`
    * of the CURRENT session extent merge (including late-but-in-gap
    * events extending the start backwards); totals are milli-unit
    * integers so replays are bit-stable. In-batch iteration sorts by
    * (ts, event_id) — a micro-batch's group iterator has no order
    * contract, and the session split must not depend on shuffle
    * arrival order. State per key is ONE fixed-size row + one timer,
    * expired by the watermark — the boundedness contract.
    */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, ClosedSession] {
    @transient private var st: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    private def closed(user: Long, s: SessState): ClosedSession =
      ClosedSession(user, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.lastMs), s.n, s.totalMilli)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      var out = List.empty[ClosedSession]
      var cur = if (st.exists()) Some(st.get()) else None
      cur.foreach(s => getHandle.deleteTimer(s.lastMs + gapMs))
      evs.foreach { e =>
        val t = e.ts.getTime
        val vm = math.floor(e.value * 1000).toLong
        cur match {
          case Some(s) if t > s.lastMs + gapMs =>
            out ::= closed(user, s) // past the gap: close inline, open anew
            cur = Some(SessState(t, t, 1L, vm))
          case Some(s) =>
            cur = Some(SessState(math.min(s.startMs, t), math.max(s.lastMs, t),
              s.n + 1, s.totalMilli + vm))
          case None =>
            cur = Some(SessState(t, t, 1L, vm))
        }
      }
      cur.foreach { s =>
        st.update(s)
        getHandle.registerTimer(s.lastMs + gapMs)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClosedSession] = {
      if (st.exists() &&
          expiredTimerInfo.getExpiryTimeInMs() >= st.get().lastMs + gapMs) {
        val s = st.get()
        st.clear()
        Iterator.single(closed(user, s))
      } else Iterator.empty
    }
  }

  def sessionizeTws(events: Dataset[Event], gap: java.time.Duration,
                    watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class MgEntry(item: Long, count: Long)
  case class MgSketch(shard: Long, processed: Long, entries: Seq[MgEntry])

  /** STREAMING heavy hitters — a Misra-Gries summary (Misra & Gries
    * 1982, the deterministic frequent-items sketch SpaceSaving and
    * Frequent generalize) maintained as `transformWithState` state:
    * at most k counters; a seen item increments its counter, an unseen
    * item claims a free slot, and when all k slots are taken every
    * counter decrements by one (dropping zeros). The guarantee: any
    * item with true frequency > n/(k+1) HAS a counter, and a counter
    * undercounts its item by at most n/(k+1) — the bound the spec
    * asserts. Unlike the windowed-count route, state is O(k) per shard
    * REGARDLESS of key cardinality: the operator this engine wants
    * when "top talkers" must come out of a stream whose key space
    * (users, IPs, doc fingerprints) cannot be enumerated.
    *
    * Distribution: the stream shards by item hash (shard = item mod
    * `shards`), one independent sketch per shard — each item's WHOLE
    * count lands in exactly one shard, so per-item guarantees hold
    * with n = that shard's row count (tighter than n_total); reading
    * the union of shard sketches is the standard mergeable-summary
    * serving pattern (the q_hll_union posture, deterministic instead
    * of probabilistic).
    */
  class MisraGriesProcessor(k: Int)
      extends StatefulProcessor[Long, Event, MgSketch] {
    @transient private var sketch: ValueState[MgSketch] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[MgSketch]("sketch",
        org.apache.spark.sql.Encoders.product[MgSketch], TTLConfig.NONE)
    override def handleInputRows(shard: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[MgSketch] = {
      val prev = if (sketch.exists()) sketch.get() else MgSketch(shard, 0L, Nil)
      val counters = scala.collection.mutable.LinkedHashMap.from(
        prev.entries.map(e => e.item -> e.count))
      var processed = prev.processed
      rows.foreach { e =>
        processed += 1
        val item = e.user_id
        counters.get(item) match {
          case Some(c) => counters(item) = c + 1
          case None if counters.size < k => counters(item) = 1L
          case None =>
            // decrement-all: the one O(k) step, amortized O(1) per row
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      val next = MgSketch(shard, processed,
        counters.toSeq.map { case (i, c) => MgEntry(i, c) })
      sketch.update(next)
      Iterator.single(next)
    }
  }

  /** Per-shard Misra-Gries heavy-hitter sketches over the event
    * stream (item = user_id). Emits each shard's updated sketch every
    * micro-batch; the caller unions the final sketches for serving.
    */
  def heavyHittersTws(events: Dataset[Event], k: Int = 10,
                      shards: Int = 4): Dataset[MgSketch] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => math.floorMod(e.user_id, shards.toLong))
      .transformWithState(new MisraGriesProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  case class CdcEvent(key: Long, seq: Long, op: String, value: Double)
  case class CdcRow(key: Long, seq: Long, op: String, value: Double, deleted: Boolean)

  /** STREAMING CDC APPLY — the online twin of q_cdc_apply's batch
    * max_by fold: a change log (I/U/D keyed by primary key, ordered by
    * a source sequence number) materializes into current row state as
    * it streams in. Per-key `transformWithState` ValueState holds ONE
    * row: (latest seq, op, value) — the seq GUARD (apply only if seq >
    * state.seq) makes the operator idempotent under replay and correct
    * under arbitrary reordering: a late-arriving stale update can
    * never overwrite a newer row, and a delete tombstone is never
    * resurrected by an earlier-seq event that arrives after it. That
    * last-writer-wins-by-SOURCE-seq semantics (not arrival order) is
    * exactly the batch query's max_by(_, seq), so the streamed
    * materialization converges to the batch answer on any
    * batching/ordering of the same log — the spec proves it on a
    * scrambled two-batch feed.
    *
    * Scale posture: state is one fixed-size row per live key (the
    * materialized table itself, which any CDC consumer must hold
    * somewhere); tombstones stay as state so the guard survives —
    * production ages them out with a TTL sized to the source's
    * maximum replay horizon.
    */
  class CdcApplyProcessor
      extends StatefulProcessor[Long, CdcEvent, CdcRow] {
    @transient private var row: ValueState[CdcRow] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      row = getHandle.getValueState[CdcRow]("row",
        org.apache.spark.sql.Encoders.product[CdcRow], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[CdcEvent],
                                 timerValues: TimerValues): Iterator[CdcRow] = {
      var cur = if (row.exists()) Some(row.get()) else None
      // in-batch order by seq: deterministic regardless of shuffle order
      rows.toSeq.sortBy(_.seq).foreach { e =>
        if (cur.forall(_.seq < e.seq))
          cur = Some(CdcRow(key, e.seq, e.op, e.value, e.op == "D"))
      }
      cur match {
        case Some(r) => row.update(r); Iterator.single(r)
        case None    => Iterator.empty
      }
    }
  }

  /** Materialize a CDC change stream into per-key current rows; emits
    * each key's latest state every micro-batch it changes in. */
  def cdcApplyTws(log: Dataset[CdcEvent]): Dataset[CdcRow] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.key)
      .transformWithState(new CdcApplyProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class GkEntry(v: Double, g: Long, delta: Long)
  case class GkSketch(shard: Long, n: Long, entries: Seq[GkEntry])

  /** STREAMING quantiles — a Greenwald-Khanna ε-approximate summary
    * (Greenwald & Khanna 2001) as `transformWithState` state: tuples
    * (v, g, Δ) sorted by value with rmin(i) = Σ_{j≤i} g_j and rmax(i)
    * = rmin(i) + Δ_i, maintaining the invariant g_i + Δ_i ≤ ⌊2εn⌋ so
    * any rank query answers within εn — DETERMINISTICALLY and
    * regardless of arrival order (the guarantee is an invariant of the
    * summary, not of a lucky sample; that is what the spec pins).
    * State is O((1/ε)·log(εn)) per shard no matter how many rows
    * stream through — the percentile companion to heavyHittersTws'
    * O(k) counters: latency/size percentiles out of an unbounded
    * stream without retaining values.
    *
    * Compress is the simplified band-free merge (adjacent tuples fuse
    * while g_i + g_{i+1} + Δ_{i+1} < ⌊2εn⌋): the ε-guarantee is
    * untouched (merging only ever respects the invariant); only the
    * worst-case constant in the space bound loosens — the documented
    * tradeoff for a fraction of the code.
    *
    * Distribution: shard by event hash, one summary per shard;
    * serving concatenates shard summaries sorted by value and walks
    * cumulative g ([[gkQuery]]) — per-shard rank slack is ε·n_shard,
    * so the union answers within ε·n_total (mergeable-summary
    * serving, the MgSketch posture).
    */
  class GkQuantileProcessor(eps: Double)
      extends StatefulProcessor[Long, Event, GkSketch] {
    @transient private var st: ValueState[GkSketch] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GkSketch]("gk",
        org.apache.spark.sql.Encoders.product[GkSketch], TTLConfig.NONE)

    private def compress(es: Vector[GkEntry], n: Long): Vector[GkEntry] = {
      if (es.size <= 2) return es
      val cap = math.max(1L, (2 * eps * n).toLong)
      val out = scala.collection.mutable.ArrayBuffer[GkEntry](es.last)
      // fold right-to-left: tuple i merges INTO its successor when the
      // fused tuple still honors g + Δ ≤ ⌊2εn⌋; first tuple never
      // merges away (min must survive for rank 1)
      var i = es.size - 2
      while (i >= 1) {
        val cur = es(i); val nxt = out.head
        if (cur.g + nxt.g + nxt.delta < cap)
          out(0) = GkEntry(nxt.v, cur.g + nxt.g, nxt.delta)
        else out.prepend(cur)
        i -= 1
      }
      out.prepend(es.head)
      out.toVector
    }

    override def handleInputRows(shard: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[GkSketch] = {
      val prev = if (st.exists()) st.get() else GkSketch(shard, 0L, Nil)
      var es = prev.entries.toVector
      var n = prev.n
      val period = math.max(1, (1.0 / (2 * eps)).toInt)
      rows.foreach { e =>
        val v = e.value
        n += 1
        val i = es.indexWhere(_.v > v)
        es =
          if (es.isEmpty || i == 0 || i < 0)
            // new min/max (or empty): exact-rank tuple, Δ = 0
            if (i == 0) GkEntry(v, 1L, 0L) +: es else es :+ GkEntry(v, 1L, 0L)
          else {
            val delta = math.max(0L, (2 * eps * n).toLong - 1)
            (es.take(i) :+ GkEntry(v, 1L, delta)) ++ es.drop(i)
          }
        if (n % period == 0) es = compress(es, n)
      }
      es = compress(es, n)
      val next = GkSketch(shard, n, es)
      st.update(next)
      Iterator.single(next)
    }
  }

  /** Per-shard GK quantile summaries over the event `value` stream;
    * emits each shard's updated summary every micro-batch. */
  def quantileTws(events: Dataset[Event], eps: Double = 0.01,
                  shards: Int = 4): Dataset[GkSketch] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => math.floorMod(e.event_id, shards.toLong))
      .transformWithState(new GkQuantileProcessor(eps),
        TimeMode.None(), OutputMode.Update())
  }

  /** Serve quantile φ from the union of shard summaries: concatenate
    * sorted by value, walk cumulative g until rmin + Δ reaches the
    * target rank ⌈φ·n⌉. Answers within ε·n_total of the true rank. */
  def gkQuery(sketches: Seq[GkSketch], phi: Double): Double = {
    val all = sketches.flatMap(_.entries).sortBy(_.v)
    val n = sketches.map(_.n).sum
    val target = math.max(1L, math.ceil(phi * n).toLong)
    var rmin = 0L
    var i = 0
    while (i < all.size - 1 && { rmin += all(i).g; rmin + all(i).delta < target }) i += 1
    all(i).v
  }

  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserTotal(uid, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }
}

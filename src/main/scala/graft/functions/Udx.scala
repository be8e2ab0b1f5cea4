package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.Tables

/** User-extension surface of the engine (SURVEY §2.6 "UDF/UDAF
  * surface"): a Scala UDF and a typed `Aggregator` UDAF, each exercised
  * by an oracle-checked query.
  *
  * The reference has no extension point at all — every transform is
  * inline Python (SURVEY §2.4). These demos establish the extension
  * contract for users who need semantics the built-ins lack, while the
  * rest of the engine deliberately avoids UDFs (they are codegen
  * opaque: Catalyst can't push filters through them or fuse them into
  * WholeStageCodegen — see the built-in `translate` form of
  * q_normalize for the hot-path alternative).
  */
object Udx {
  type Q = (SparkSession, String) => DataFrame

  /** The reference's filename sanitization (token_uploader/app.py:45)
    * as a Scala UDF — semantically identical to the codegen'd
    * `translate(email, '@.', '__')` used by q_normalize.
    */
  val sanitizeEmail: String => String =
    e => e.replace("@", "_").replace(".", "_")

  /** Per-event input to the argmin aggregator. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)

  /** Aggregation state: the earliest (ts, event_id) seen and its type.
    * Timestamps ride as epoch-micros so the buffer is a flat tuple.
    */
  case class FirstBuf(tsMicros: Long, eventId: Long, eventType: String)

  /** Typed UDAF: the first event's type per group, "first" =
    * min(ts, event_id) — the deterministic form of the reference's
    * first-match header extraction (main.py:199-202) as an aggregate.
    * Merge is associative/commutative, so Spark runs it partial+final
    * (map-side combine) like any built-in agg.
    */
  object FirstEventType extends Aggregator[Ev, FirstBuf, String] {
    override def zero: FirstBuf = FirstBuf(Long.MaxValue, Long.MaxValue, null)
    private def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    override def reduce(b: FirstBuf, e: Ev): FirstBuf = {
      val m = micros(e.ts)
      if (m < b.tsMicros || (m == b.tsMicros && e.event_id < b.eventId))
        FirstBuf(m, e.event_id, e.event_type)
      else b
    }
    override def merge(a: FirstBuf, b: FirstBuf): FirstBuf =
      if (a.tsMicros < b.tsMicros || (a.tsMicros == b.tsMicros && a.eventId < b.eventId)) a else b
    override def finish(b: FirstBuf): String = b.eventType
    override def bufferEncoder: Encoder[FirstBuf] = Encoders.product[FirstBuf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Per-order input to the top-k aggregator. */
  case class Ord(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

  /** Bounded top-k state: parallel arrays sorted by (price desc,
    * orderkey asc), never longer than K — flat primitive arrays so the
    * buffer stays columnar-encodable (no kryo).
    */
  case class TopBuf(prices: Array[Double], keys: Array[Long])

  /** Typed UDAF: top-K orders per customer with O(K) state.
    *
    * The window form (`row_number() OVER (PARTITION BY ... ORDER BY
    * ...)` then `rank <= K`) sorts EVERY group's full row set after a
    * shuffle of the whole table. This aggregator carries only K
    * (price, key) pairs per group, combines map-side like any
    * associative agg, and shuffles K rows per group instead of all of
    * them — at 100 TB that is the difference between a top-k and a
    * global sort. Merge is a k-way sorted merge, associative and
    * commutative, with ties broken by orderkey for determinism.
    */
  class TopKOrders(k: Int) extends Aggregator[Ord, TopBuf, TopBuf] {
    override def zero: TopBuf = TopBuf(Array.empty, Array.empty)
    private def better(p1: Double, k1: Long, p2: Double, k2: Long): Boolean =
      p1 > p2 || (p1 == p2 && k1 < k2)
    override def reduce(b: TopBuf, o: Ord): TopBuf =
      merge(b, TopBuf(Array(o.o_totalprice), Array(o.o_orderkey)))
    override def merge(a: TopBuf, b: TopBuf): TopBuf = {
      val n = math.min(k, a.prices.length + b.prices.length)
      val ps = new Array[Double](n); val ks = new Array[Long](n)
      var i = 0; var j = 0; var out = 0
      while (out < n) {
        val takeA = j >= b.prices.length ||
          (i < a.prices.length && better(a.prices(i), a.keys(i), b.prices(j), b.keys(j)))
        if (takeA) { ps(out) = a.prices(i); ks(out) = a.keys(i); i += 1 }
        else { ps(out) = b.prices(j); ks(out) = b.keys(j); j += 1 }
        out += 1
      }
      TopBuf(ps, ks)
    }
    override def finish(b: TopBuf): TopBuf = b
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Per-user gap statistics computed imperatively inside a group —
    * the `mapGroups` escape hatch for genuinely iterative per-key
    * logic. The double divisions happen once, on exact integer sums,
    * so the oracle replays them bit-identically.
    */
  case class GapStats(user_id: Long, n_events: Long,
    avg_gap_s: Option[Double], max_gap_s: Option[Double])

  val queries: Map[String, Q] = Map(
    // Scala UDF demo: the app.py:45 sanitization as a user function.
    "q_udf_sanitize" -> ((s, d) => {
      val slug = udf(sanitizeEmail)
      Tables.documents(s, d)
        .selectExpr("doc_id", "concat('user', cast(doc_id % 20 as string), '@example.com') AS email")
        .select(col("doc_id"),
          concat(lit("user_token_"), slug(col("email")), lit(".json")).as("token_file"))
        .orderBy(col("doc_id"))
    }),

    // DECLARATIVE SQL UDF (Spark 4's CREATE FUNCTION ... RETURN —
    // SQL-standard scalar functions with a SQL body): the token count
    // via the replace identity, declared once and reused inside a
    // per-language rollup. Unlike a Scala UDF the body is a Catalyst
    // expression tree — it inlines into the plan, stays inside
    // whole-stage codegen, and the optimizer sees through it (no
    // black-box boundary, no serialization). The oracle inlines the
    // identical arithmetic, so the surface is hash-compared.
    "q_sql_udf" -> ((s, d) => {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_ntok(t STRING)
              |RETURNS BIGINT
              |RETURN CAST(length(t) - length(replace(t, ' ', '')) + 1 AS BIGINT)""".stripMargin)
      Tables.documents(s, d).createOrReplaceTempView("sqludf_docs")
      s.sql(
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(graft_ntok(text)) AS BIGINT) AS n_tokens,
          |  (CAST(sum(graft_ntok(text)) AS BIGINT) * 1000000) DIV count(*) AS mean_micro
          |FROM sqludf_docs GROUP BY lang ORDER BY lang""".stripMargin)
    }),

    // Typed Aggregator UDAF: first event type per user.
    "q_udaf_first" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[Ev]
        .groupByKey(_.user_id)
        .agg(FirstEventType.toColumn.name("first_type"))
        .toDF("user_id", "first_type")
        .orderBy(col("user_id"))
    }),

    // Typed Aggregator top-k: O(K) state per group vs the window
    // form's full per-group sort (see TopKOrders doc).
    "q_topk_agg" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .as[Ord]
        .groupByKey(_.o_custkey)
        .agg(new TopKOrders(3).toColumn.name("top"))
        .toDF("o_custkey", "top")
        .selectExpr("o_custkey", "posexplode(arrays_zip(top.prices, top.keys)) AS (pos, pk)")
        .selectExpr("o_custkey", "CAST(pos + 1 AS BIGINT) AS rank",
          "pk.keys AS o_orderkey", "round(pk.prices, 2) AS o_totalprice")
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // mapGroups: per-user inter-event gap stats via imperative
    // in-group iteration (sorted by ts, event_id).
    "q_grouped_map" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[Ev]
        .groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          val micros = it.toArray
            .map(e => (e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L, e.event_id))
            .sorted.map(_._1)
          if (micros.length < 2) GapStats(uid, micros.length.toLong, None, None)
          else {
            val gaps = micros.sliding(2).map(w => w(1) - w(0)).toArray
            GapStats(uid, micros.length.toLong,
              Some(gaps.sum.toDouble / (gaps.length * 1000000.0)),
              Some(gaps.max.toDouble / 1000000.0))
          }
        }
        .toDF()
        .select(col("user_id"), col("n_events"),
          round(col("avg_gap_s"), 4).as("avg_gap_s"),
          round(col("max_gap_s"), 4).as("max_gap_s"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_udf_sanitize" ->
      """SELECT doc_id,
        | 'user_token_' || replace(replace('user' || CAST(doc_id % 20 AS VARCHAR) || '@example.com', '@', '_'), '.', '_') || '.json' AS token_file
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sql_udf" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(text) - len(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  (CAST(sum(ntok) AS BIGINT) * 1000000) // count(*) AS mean_micro
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q_udaf_first" ->
      """SELECT user_id, event_type AS first_type FROM (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_custkey, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rank
        | FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q_grouped_map" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(gap_us) AS BIGINT) / (count(gap_us) * 1000000.0), 4) AS avg_gap_s,
        |  round(CAST(max(gap_us) AS BIGINT) / 1000000.0, 4) AS max_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}

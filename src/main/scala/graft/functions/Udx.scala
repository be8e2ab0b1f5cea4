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
    })
  )

  val oracles: Map[String, String] = Map(
    "q_udf_sanitize" ->
      """SELECT doc_id,
        | 'user_token_' || replace(replace('user' || CAST(doc_id % 20 AS VARCHAR) || '@example.com', '@', '_'), '.', '_') || '.json' AS token_file
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_udaf_first" ->
      """SELECT user_id, event_type AS first_type FROM (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}

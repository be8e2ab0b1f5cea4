package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference's own operator bank (SURVEY.md §2.1–2.3): the Gmail →
  * sink ingest dataflow re-expressed as declarative Spark plans.
  *
  * The reference consumes nested Gmail API messages
  * (reference: etl_service/main.py:194-204 — `payload.headers` is an
  * array<struct<name,value>>, `labelIds` an array<string>). The driver
  * fixtures have no such table, so `emailsRaw` synthesizes one
  * deterministically from `documents`; the DuckDB oracles rebuild the
  * identical shape with a CTE, so every operator below is still
  * hash-checked end-to-end.
  *
  * Operator ↔ reference map:
  *  - label predicate (main.py:160)         → arrays_overlap / array_contains
  *  - anti-join vs sink ids (main.py:95-104, :175) → left_anti join
  *  - case-insensitive first-match header extraction (main.py:199-202)
  *                                          → get(filter(headers, …), 0)
  *  - record shaping + defaults (main.py:196-204)  → select + coalesce
  *  - labels CSV (main.py:203)              → array_join
  *  - last-wins within-batch dedup (main.py:158,:205) → row_number over
  *    (id ORDER BY page DESC) — the deterministic form of the dict
  *    overwrite (SURVEY §7.4)
  *  - suffix filter (main.py:122-125)       → !endsWith
  *  - filename normalization (token_uploader/app.py:45-48) → translate+concat
  *
  * Scale posture: the sink-id build side stays a DataFrame end to end —
  * never collected to a driver set like the reference's Python set
  * (main.py:101). At 100 TB the left_anti is a shuffled join; at small
  * SF AQE broadcasts it. (Note runtime Bloom pre-filtering —
  * spark.sql.optimizer.runtime.bloomFilter.enabled — does NOT apply to
  * the anti-join probe side: rows absent from the filter are exactly
  * the ones an anti-join must KEEP. It applies to the inner/semi joins
  * of the enrichment path; PlanAuditSpec pins that shape.) Header
  * extraction is a codegen'd higher-order expression — no UDF, no
  * per-row JVM boxing beyond the array itself.
  */
object Ingest {
  type Q = (SparkSession, String) => DataFrame

  /** Synthetic Gmail-shaped messages derived from `documents`.
    * Mirrors main.py:194-204: mixed-case header names, ~1/11 missing
    * subject, ~1/13 missing sender, ~1/17 missing date, a duplicate
    * lowercase `subject` header every 19th row (first-match must win),
    * absent threadId every 7th row, label mixes covering every branch
    * of the main.py:160 predicate (incl. the empty-labels row).
    */
  def emailsRaw(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).selectExpr(
      "doc_id",
      "concat('msg', cast(doc_id as string)) AS id",
      "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE concat('t', cast(doc_id % 50 as string)) END AS thread_id",
      """CASE cast(doc_id % 5 as int)
           WHEN 0 THEN array('INBOX','IMPORTANT')
           WHEN 1 THEN array('SENT')
           WHEN 2 THEN array('TRASH','INBOX')
           WHEN 3 THEN array('SPAM','INBOX')
           ELSE array()
         END AS labelIds""",
      s"""array(
           named_struct('name',
             CASE WHEN doc_id % 11 = 0 THEN 'X-Absent-Subject'
                  WHEN doc_id % 3 = 0 THEN 'SUBJECT'
                  WHEN doc_id % 3 = 1 THEN 'subject'
                  ELSE 'Subject' END,
             'value', substring(text, 1, 40)),
           named_struct('name',
             CASE WHEN doc_id % 13 = 0 THEN 'X-Absent-From'
                  WHEN doc_id % 2 = 0 THEN 'From' ELSE 'FROM' END,
             'value', concat('user', cast(doc_id % 20 as string), '@example.com')),
           named_struct('name', 'To',
             'value', concat('dest', cast(doc_id % 9 as string), '@example.org')),
           named_struct('name',
             CASE WHEN doc_id % 17 = 0 THEN 'X-Absent-Date' ELSE 'Date' END,
             'value', concat('Mon, ', cast(doc_id % 28 + 1 as string),
                             ' Jan 2024 0', cast(doc_id % 10 as string), ':00:00 +0000')),
           named_struct('name',
             CASE WHEN doc_id % 19 = 0 THEN 'subject' ELSE 'X-Pad' END,
             'value', 'DUPLICATE')
         ) AS headers""")

  /** The DuckDB twin of [[emailsRaw]] (+ the sink-id set and the
    * two-page stream), shared by every oracle below.
    */
  private val cte: String =
    """WITH emails_raw AS (
      |  SELECT doc_id,
      |    'msg' || CAST(doc_id AS VARCHAR) AS id,
      |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE 't' || CAST(doc_id % 50 AS VARCHAR) END AS thread_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN ['INBOX','IMPORTANT']
      |      WHEN 1 THEN ['SENT']
      |      WHEN 2 THEN ['TRASH','INBOX']
      |      WHEN 3 THEN ['SPAM','INBOX']
      |      ELSE CAST([] AS VARCHAR[])
      |    END AS labelIds,
      |    [
      |      {'name': CASE WHEN doc_id % 11 = 0 THEN 'X-Absent-Subject'
      |                    WHEN doc_id % 3 = 0 THEN 'SUBJECT'
      |                    WHEN doc_id % 3 = 1 THEN 'subject'
      |                    ELSE 'Subject' END,
      |       'value': substr(text, 1, 40)},
      |      {'name': CASE WHEN doc_id % 13 = 0 THEN 'X-Absent-From'
      |                    WHEN doc_id % 2 = 0 THEN 'From' ELSE 'FROM' END,
      |       'value': 'user' || CAST(doc_id % 20 AS VARCHAR) || '@example.com'},
      |      {'name': 'To', 'value': 'dest' || CAST(doc_id % 9 AS VARCHAR) || '@example.org'},
      |      {'name': CASE WHEN doc_id % 17 = 0 THEN 'X-Absent-Date' ELSE 'Date' END,
      |       'value': 'Mon, ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ' Jan 2024 0' || CAST(doc_id % 10 AS VARCHAR) || ':00:00 +0000'},
      |      {'name': CASE WHEN doc_id % 19 = 0 THEN 'subject' ELSE 'X-Pad' END, 'value': 'DUPLICATE'}
      |    ] AS headers
      |  FROM documents),
      |sink AS (
      |  SELECT 'msg' || CAST(doc_id AS VARCHAR) AS id FROM documents WHERE doc_id % 2 = 0),
      |pages AS (
      |  SELECT *, 1 AS page FROM emails_raw
      |  UNION ALL
      |  SELECT doc_id, id, thread_id, labelIds,
      |    list_transform(headers, h -> CASE WHEN lower(h.name) = 'subject'
      |      THEN {'name': h.name, 'value': 'RE: ' || h.value} ELSE h END) AS headers,
      |    2 AS page
      |  FROM emails_raw WHERE doc_id % 4 = 1)
      |""".stripMargin

  /** TTL memo over the sink-id scan — the reference's
    * `cache_with_timeout(3600)` on fetch_existing_email_ids
    * (main.py:53-66, used at :94). Within the hour every ingest run
    * reuses the persisted id relation; after it the scan re-resolves.
    */
  private[graft] val sinkIdCache = new CachedRelation(ttlMillis = 3600L * 1000)

  /** Already-ingested ids (the reference's BigQuery id scan,
    * main.py:95-104): every even doc_id. Stays distributed — broadcast
    * or shuffled by Catalyst, never a driver-side set — and memoized
    * via [[sinkIdCache]] (keyed per session × dir so scale dirs never
    * cross-contaminate).
    */
  def sinkIds(s: SparkSession, d: String): DataFrame =
    sinkIdCache.resolve(s"${System.identityHashCode(s)}:$d") {
      Tables.documents(s, d)
        .filter(col("doc_id") % 2 === 0)
        .selectExpr("concat('msg', cast(doc_id as string)) AS id")
    }

  /** Two "pages" of the paginated scan (main.py:163-210): page 2
    * re-delivers doc_id%4==1 messages with an updated subject — the
    * dict-overwrite/last-wins case (main.py:205).
    */
  def pages(s: SparkSession, d: String): DataFrame = {
    val base = emailsRaw(s, d)
    val page2 = base.filter(col("doc_id") % 4 === 1).withColumn("headers",
      expr("""transform(headers, h -> CASE WHEN lower(h.name) = 'subject'
             THEN named_struct('name', h.name, 'value', concat('RE: ', h.value)) ELSE h END)"""))
    base.withColumn("page", lit(1)).unionByName(page2.withColumn("page", lit(2)))
  }

  /** First-match case-insensitive header lookup (main.py:199-202):
    * null when absent — `get` (not ANSI `element_at`) so an empty
    * filter result yields null, matching the reference's `None`.
    */
  private def header(k: String): String =
    s"get(filter(headers, h -> lower(h.name) = '$k'), 0).value"

  private val labelPredicate =
    "arrays_overlap(labelIds, array('INBOX','SENT','TRASH')) AND NOT array_contains(labelIds, 'SPAM')"

  private val labelPredicateSql =
    "list_has_any(labelIds, ['INBOX','SENT','TRASH']) AND NOT list_contains(labelIds, 'SPAM')"

  private def headerSql(k: String): String =
    s"list_filter(headers, h -> lower(h.name) = '$k')[1].value"

  val queries: Map[String, Q] = Map(
    // M1 end-to-end slice: every reference operator class in one plan.
    // pages → label filter → anti-join(sink) → extract/shape → last-wins
    // dedup → 7-column EmailMeta output (schema of main.py:196-204).
    "q_ingest_e2e" -> ((s, d) => {
      val deduped = pages(s, d)
        .filter(expr(labelPredicate))
        .join(sinkIds(s, d), Seq("id"), "left_anti")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("page").desc)))
        .filter(col("rn") === 1)
      deduped.selectExpr(
        "id",
        "coalesce(thread_id, '') AS thread_id",
        s"${header("subject")} AS subject",
        s"${header("from")} AS sender",
        s"${header("to")} AS recipient",
        s"${header("date")} AS ts_raw",
        "array_join(labelIds, ',') AS combined_labels")
        .orderBy(col("id"))
    }),

    // Q-headers: extraction alone, over every raw message.
    "q_headers_extract" -> ((s, d) => {
      emailsRaw(s, d).selectExpr(
        "id",
        s"${header("subject")} AS subject",
        s"${header("from")} AS sender",
        s"${header("to")} AS recipient",
        s"${header("date")} AS ts_raw")
        .orderBy(col("id"))
    }),

    // Q-filter-labels: the main.py:160 boolean label algebra.
    "q_filter_labels" -> ((s, d) =>
      emailsRaw(s, d).filter(expr(labelPredicate)).select(col("id")).orderBy(col("id"))),

    // Q-labels-csv: array → delimited string, "" for the empty array.
    "q_labels_csv" -> ((s, d) =>
      emailsRaw(s, d)
        .selectExpr("id", "array_join(labelIds, ',') AS combined_labels")
        .orderBy(col("id"))),

    // Q-antijoin / Q-scan-ids: new-message ids vs the sink id scan.
    "q_dedup_sink" -> ((s, d) =>
      emailsRaw(s, d).select(col("id"))
        .join(sinkIds(s, d), Seq("id"), "left_anti")
        .orderBy(col("id"))),

    // The SURVEY §7.4 100 TB form of the sink anti-join: a Bloom
    // filter built over the sink ids (df.stat.bloomFilter — a FIXED
    //-size sketch regardless of row count, the one thing about the
    // sink that may ride to the driver and broadcast) pre-filters the
    // incoming side MAP-SIDE, so only might-contain rows reach the
    // anti-join shuffle. Spark's runtime bloom filter does this
    // automatically for inner/semi joins but NOT for anti joins —
    // there, absent-from-bloom is a definitive KEEP (no false
    // negatives), and only the might-contain slice (true members +
    // the ~1% false positives) needs the exact join to decide. The
    // union of the definite-keeps and the exact-join survivors is
    // hash-identical to the plain anti-join oracle.
    "q_dedup_sink_bloom" -> ((s, d) => {
      val incoming = emailsRaw(s, d).select(col("id"))
      val sink = sinkIds(s, d)
      val bloom = sink.stat.bloomFilter("id", 10000L, 0.01)
      val bloomBc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((id: String) => bloomBc.value.mightContainString(id))
      val definiteKeep = incoming.filter(!mightContain(col("id")))
      val candidates = incoming.filter(mightContain(col("id")))
        .join(sink, Seq("id"), "left_anti")
      definiteKeep.unionByName(candidates).orderBy(col("id"))
    }),

    // Q-dedup-run: last-wins across pages, made deterministic via
    // row_number (SURVEY §7.4 risk 2).
    "q_dedup_lastwins" -> ((s, d) =>
      pages(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("page").desc)))
        .filter(col("rn") === 1)
        .selectExpr("id", "page", s"${header("subject")} AS subject")
        .orderBy(col("id"))),

    // Q-ext-filter: drop .json-suffixed catalog entries (main.py:122-125).
    "q_ext_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr(
          "doc_id",
          """CASE WHEN doc_id % 4 = 0 THEN concat('sa_key_', cast(doc_id as string), '.json')
                  ELSE concat('token_', cast(doc_id as string), '.tok') END AS name""")
        .filter(!col("name").endsWith(".json"))
        .orderBy(col("doc_id"))),

    // Q-normalize: email → filename-safe token name (app.py:45-48).
    "q_normalize" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id", "concat('user', cast(doc_id % 20 as string), '@example.com') AS email")
        .selectExpr("doc_id", "concat('user_token_', translate(email, '@.', '__'), '.json') AS token_file")
        .orderBy(col("doc_id"))),

    // SOURCE-FORMAT ROUND TRIP — the interchange contract a pipeline
    // leans on when handing data to/from non-parquet consumers (the
    // reference hands rows to BigQuery as JSON, main.py:243; CSV is
    // the other lingua franca): write the documents catalog out as
    // CSV-with-header and as JSON lines, read both back through the
    // schema-first reader, and prove value fidelity with per-format
    // checksums against the parquet truth (the oracle computes the
    // same aggregates straight from parquet — a lossy writer, a
    // quoting bug, or a schema drift hash-mismatches loudly).
    // Scale: writes shard per partition (no coalesce — each task
    // writes its own file, the only write shape that scales); the
    // read-back aggregate is one scan per format.
    "q_format_roundtrip" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      // keyed on the session (the sinkIdCache pattern) so two
      // concurrent sessions on the same fixture dir never race on the
      // overwrite — the dir name alone is a shared mutable path
      val tmp = s"/tmp/graft_roundtrip_${System.identityHashCode(s)}_" +
        new java.io.File(d).getName
      base.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      base.write.mode("overwrite").json(s"$tmp/json")
      // ORC (r14): the other columnar interchange format Spark ships a
      // native reader/writer for — unlike the text formats it carries
      // its own schema and stats, so the round trip also covers the
      // binary-columnar handoff path (Hive-lineage warehouses)
      base.write.mode("overwrite").orc(s"$tmp/orc")
      val sch = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
      val back = s.read.schema(sch).option("header", "true").csv(s"$tmp/csv")
        .withColumn("fmt", lit("csv"))
        .unionByName(s.read.schema(sch).json(s"$tmp/json")
          .withColumn("fmt", lit("json")))
        .unionByName(s.read.schema(sch).orc(s"$tmp/orc")
          .withColumn("fmt", lit("orc")))
      back.groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("fmt"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_ingest_e2e" -> (cte +
      s"""SELECT id, coalesce(thread_id, '') AS thread_id,
         | ${headerSql("subject")} AS subject,
         | ${headerSql("from")} AS sender,
         | ${headerSql("to")} AS recipient,
         | ${headerSql("date")} AS ts_raw,
         | array_to_string(labelIds, ',') AS combined_labels
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY page DESC) AS rn
         |  FROM pages
         |  WHERE $labelPredicateSql
         |    AND NOT EXISTS (SELECT 1 FROM sink WHERE sink.id = pages.id)
         |) WHERE rn = 1 ORDER BY id""".stripMargin),

    "q_headers_extract" -> (cte +
      s"""SELECT id,
         | ${headerSql("subject")} AS subject,
         | ${headerSql("from")} AS sender,
         | ${headerSql("to")} AS recipient,
         | ${headerSql("date")} AS ts_raw
         |FROM emails_raw ORDER BY id""".stripMargin),

    "q_filter_labels" -> (cte +
      s"SELECT id FROM emails_raw WHERE $labelPredicateSql ORDER BY id"),

    "q_labels_csv" -> (cte +
      // coalesce: DuckDB's array_to_string is NULL on the empty list,
      // the reference contract (and Spark's array_join) is "".
      "SELECT id, coalesce(array_to_string(labelIds, ','), '') AS combined_labels FROM emails_raw ORDER BY id"),

    "q_dedup_sink" -> (cte +
      """SELECT id FROM emails_raw e
        |WHERE NOT EXISTS (SELECT 1 FROM sink WHERE sink.id = e.id) ORDER BY id""".stripMargin),

    "q_dedup_sink_bloom" -> (cte +
      // the bloom pre-pass is an optimization, not a semantic: the
      // oracle is the plain anti-join
      """SELECT id FROM emails_raw e
        |WHERE NOT EXISTS (SELECT 1 FROM sink WHERE sink.id = e.id) ORDER BY id""".stripMargin),

    "q_dedup_lastwins" -> (cte +
      s"""SELECT id, page, ${headerSql("subject")} AS subject FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY page DESC) AS rn FROM pages
         |) WHERE rn = 1 ORDER BY id""".stripMargin),

    "q_ext_filter" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 4 = 0 THEN 'sa_key_' || CAST(doc_id AS VARCHAR) || '.json'
        |      ELSE 'token_' || CAST(doc_id AS VARCHAR) || '.tok' END AS name
        |FROM documents
        |WHERE NOT (CASE WHEN doc_id % 4 = 0 THEN 'sa_key_' || CAST(doc_id AS VARCHAR) || '.json'
        |      ELSE 'token_' || CAST(doc_id AS VARCHAR) || '.tok' END LIKE '%.json')
        |ORDER BY doc_id""".stripMargin,

    "q_normalize" ->
      """SELECT doc_id,
        | 'user_token_' || translate('user' || CAST(doc_id % 20 AS VARCHAR) || '@example.com', '@.', '__') || '.json' AS token_file
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Truth computed straight from parquet — the round trip through
    // CSV/JSON must reproduce it exactly, per format.
    "q_format_roundtrip" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM documents)
        |SELECT 'csv' AS fmt, n_rows, sum_id, sum_chars, n_langs, n_sources FROM a
        |UNION ALL
        |SELECT 'json' AS fmt, n_rows, sum_id, sum_chars, n_langs, n_sources FROM a
        |UNION ALL
        |SELECT 'orc' AS fmt, n_rows, sum_id, sum_chars, n_langs, n_sources FROM a
        |ORDER BY fmt""".stripMargin
  )
}

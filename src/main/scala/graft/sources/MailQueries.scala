package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-checked queries over the DSv2 connector ([[MailSourceProvider]]).
  *
  * The fake transport generates messages for doc_id ∈ [0, n) where n =
  * |documents| at the active scale factor, so a DuckDB `range()` CTE
  * replays the dataset exactly and the correctness gate covers the
  * whole connector read path: pushdown, pruning, pagination.
  */
object MailQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Messages via the connector, sized to the fixture's documents
    * table. A parquet-footer count — no data scan.
    */
  def mail(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.MailSourceProvider")
      .option("nmsgs", Tables.documents(s, d).count())
      .option("pageSize", 500)
      .load()

  val queries: Map[String, Q] = Map(
    // The main.py:160 label algebra, pushed INTO the source: folder
    // IN (...) and != SPAM reach the transport as Gmail `q` syntax
    // ("(in:inbox OR in:sent OR in:trash) -in:spam"); .explain shows
    // them under PushedFilters with no residual Filter node.
    "q_connector_scan" -> ((s, d) =>
      mail(s, d)
        .filter(col("folder").isin("INBOX", "SENT", "TRASH") && col("folder") =!= "SPAM")
        .select(col("doc_id"), col("id"), col("folder"), col("subject"), col("sender"))
        .orderBy(col("doc_id"))),

    // Connector → relational composition: pushed-down scan joined to
    // an aggregate — a source that behaves like any other table.
    "q_connector_agg" -> ((s, d) =>
      mail(s, d)
        .filter(col("folder") === "INBOX")
        .groupBy(col("sender"))
        .agg(count(lit(1)).as("n"), max(col("ts_raw")).as("latest_raw"))
        .orderBy(col("sender"))),

    // Two-phase read (main.py:177-191): page LIST yields ids, then the
    // chunk-of-50 batched GET materializes metadata with per-message
    // error-as-value skip — doc_id % 97 == 13 poison messages fail
    // their get and are absent from the output, everything else in the
    // same chunk still lands. The pushed folder predicate composes: it
    // runs in the LIST phase, so skipped-folder ids are never fetched.
    "q_connector_enrich" -> ((s, d) =>
      s.read.format("graft.sources.MailSourceProvider")
        .option("nmsgs", Tables.documents(s, d).count())
        .option("pageSize", 500)
        .option("enrich", true)
        .option("errorEvery", 97)
        .option("errorOffset", 13)
        .load()
        .filter(col("folder") =!= "SPAM")
        .select(col("doc_id"), col("id"), col("folder"), col("subject"),
          col("sender"), col("ts_raw"))
        .orderBy(col("doc_id")))
    ,

    // PER-RUN INGEST REPORT — the engine analog of the reference's
    // JSON response contract (main.py:316-319: inserted count + error
    // summary per /fetch run, HTTP 200 'ok' vs the 500 error domain).
    // MEASURED from the dataflow, not replayed from the poison rule:
    // the LIST-phase scan (every non-spam id) anti-joined against the
    // enriched read (error-as-value skips absent) yields the skip set;
    // one row reports listed/inserted/skipped, the distinct 50-chunk
    // batches that saw an error (the reference's per-batch error
    // isolation grain), and the ok/partial status. All counts are
    // 1-row aggregates combined by broadcast cross join (the q_auc
    // totals pattern) — at 100 TB nothing but three counters moves.
    "q_ingest_report" -> ((s, d) => {
      val listed = mail(s, d).filter(col("folder") =!= "SPAM").select(col("doc_id"))
      val landed = s.read.format("graft.sources.MailSourceProvider")
        .option("nmsgs", Tables.documents(s, d).count())
        .option("pageSize", 500)
        .option("enrich", true)
        .option("errorEvery", 97)
        .option("errorOffset", 13)
        .load()
        .filter(col("folder") =!= "SPAM").select(col("doc_id"))
      val sk = listed.join(landed, Seq("doc_id"), "left_anti")
      val ln = listed.agg(count(lit(1)).as("n_listed"))
      val ins = landed.agg(count(lit(1)).as("n_inserted"))
      val skn = sk.agg(count(lit(1)).as("n_skipped"),
        countDistinct(expr("doc_id DIV 50")).as("n_err_batches"))
      ln.crossJoin(broadcast(ins)).crossJoin(broadcast(skn))
        .selectExpr("n_listed", "n_inserted", "n_skipped", "n_err_batches",
          "CASE WHEN n_skipped = 0 THEN 'ok' ELSE 'partial' END AS status")
    })
  )

  private val msgsCte =
    """WITH msgs AS (
      |  SELECT doc_id,
      |    'msg' || CAST(doc_id AS VARCHAR) AS id,
      |    ['INBOX','SENT','TRASH','SPAM','ARCHIVE'][CAST(doc_id % 5 AS INT) + 1] AS folder,
      |    'subject ' || CAST(doc_id % 997 AS VARCHAR) AS subject,
      |    'user' || CAST(doc_id % 20 AS VARCHAR) || '@example.com' AS sender,
      |    'Mon, ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ' Jan 2024 0' || CAST(doc_id % 10 AS VARCHAR) || ':00:00 +0000' AS ts_raw
      |  FROM (SELECT unnest(range(0, (SELECT count(*) FROM documents))) AS doc_id))
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_connector_scan" -> (msgsCte +
      """SELECT doc_id, id, folder, subject, sender FROM msgs
        |WHERE folder IN ('INBOX','SENT','TRASH') AND folder <> 'SPAM'
        |ORDER BY doc_id""".stripMargin),

    "q_connector_agg" -> (msgsCte +
      """SELECT sender, count(*) AS n, max(ts_raw) AS latest_raw FROM msgs
        |WHERE folder = 'INBOX' GROUP BY sender ORDER BY sender""".stripMargin),

    "q_connector_enrich" -> (msgsCte +
      """SELECT doc_id, id, folder, subject, sender, ts_raw FROM msgs
        |WHERE folder <> 'SPAM' AND doc_id % 97 <> 13
        |ORDER BY doc_id""".stripMargin),

    "q_ingest_report" -> (msgsCte +
      """SELECT
        |  CAST(count(*) AS BIGINT) AS n_listed,
        |  CAST(count(*) FILTER (WHERE doc_id % 97 <> 13) AS BIGINT) AS n_inserted,
        |  CAST(count(*) FILTER (WHERE doc_id % 97 = 13) AS BIGINT) AS n_skipped,
        |  CAST(count(DISTINCT doc_id // 50) FILTER (WHERE doc_id % 97 = 13) AS BIGINT) AS n_err_batches,
        |  CASE WHEN count(*) FILTER (WHERE doc_id % 97 = 13) = 0
        |       THEN 'ok' ELSE 'partial' END AS status
        |FROM msgs WHERE folder <> 'SPAM'""".stripMargin)
  )
}

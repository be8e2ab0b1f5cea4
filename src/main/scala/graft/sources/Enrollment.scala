package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Credential-enrollment utility — the engine-side form of the
  * reference's `token_uploader/app.py main()` (app.py:94-115), which
  * SURVEY §3.3 classifies as driver-side control plane, NOT an
  * operator. The OAuth browser flow and Drive upload are process
  * boundaries with no Spark analogue; what the engine owns is the
  * DATA-plane tail of the flow, modeled here:
  *
  *  - required-files gate (`check_required_files`, app.py:17-34):
  *    refuse to enroll without the client secret present;
  *  - email → filename-safe token name (app.py:45-48), the exact
  *    q_normalize fragment;
  *  - roster registration: the enrolled account row (account id,
  *    token file, credential state, enrollment time) last-wins-merged
  *    into the parquet roster snapshot via the same atomic
  *    stage-then-rename MERGE the streaming sink uses
  *    ([[graft.streaming.EventStreams.mergeIntoSnapshot]]) —
  *    re-enrolling an account replaces its row, never duplicates it;
  *  - roster → `tokens=` option bridge: [[rosterOption]] renders the
  *    snapshot into the `name:state` roster string
  *    [[MailSourceProvider]] consumes, closing the loop from
  *    enrollment to connector scan.
  */
object Enrollment {

  /** One enrolled account in the roster snapshot. */
  case class Enrolled(account: String, token_file: String, state: String,
                      enrolled_at: Long)

  /** app.py:17-34 — every required credential artifact must exist
    * before the flow starts; returns the missing ones (empty = go).
    */
  def missingRequiredFiles(paths: Seq[java.nio.file.Path]): Seq[java.nio.file.Path] =
    paths.filterNot(java.nio.file.Files.exists(_))

  /** app.py:45-48 — email → filename-safe token name; identical
    * transform to the q_normalize operator fragment.
    */
  def tokenFileName(email: String): String =
    s"user_token_${email.trim.toLowerCase.replace('@', '_').replace('.', '_')}.json"

  /** Enroll (or re-enroll) an account: last-wins upsert into the
    * parquet roster at `rosterDir`. Key = account; recency =
    * enrollment time (ties broken by state so a re-run in the same
    * millisecond is still deterministic).
    */
  def register(spark: SparkSession, rosterDir: String, email: String,
               state: String, nowMs: Long): Unit = {
    import spark.implicits._
    val account = email.trim.toLowerCase.takeWhile(_ != '@')
    val row = Seq(Enrolled(account, tokenFileName(email), state, nowMs)).toDF()
    graft.streaming.EventStreams.mergeIntoSnapshot(
      row, rosterDir, key = "account", ver = "enrolled_at", tieBreak = "state")
  }

  /** Render the roster snapshot as the `tokens=` option string the
    * connector consumes — `alice:valid,bob:expired_refresh,…`, sorted
    * by account for a deterministic option value.
    */
  def rosterOption(spark: SparkSession, rosterDir: String): String =
    spark.read.parquet(rosterDir)
      .select(col("account"), col("state"))
      .orderBy(col("account"))
      .collect()
      .map(r => s"${r.getString(0)}:${r.getString(1)}")
      .mkString(",")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by the operator modules under
  * `graft.operators.*`; each module pairs its Spark plans with DuckDB
  * oracle SQL over the same parquet tables.
  */
object SparkEntry {

  private[graft] def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.RelationalExt.queries, operators.RelationalExt.oracles),
      (operators.Skew.queries, operators.Skew.oracles),
      (operators.Stats.queries, operators.Stats.oracles),
      (operators.Audit.queries, operators.Audit.oracles),
      (operators.Graph.queries, operators.Graph.oracles),
      (operators.Learn.queries, operators.Learn.oracles),
      (operators.Pipeline.queries, operators.Pipeline.oracles),
      (operators.Reshape.queries, operators.Reshape.oracles),
      (operators.Ingest.queries, operators.Ingest.oracles),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
      (operators.Curation.queries, operators.Curation.oracles),
      (operators.SimSearch.queries, operators.SimSearch.oracles),
      (operators.NearDup.queries, operators.NearDup.oracles),
      (operators.Streaming.queries, operators.Streaming.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (functions.Udx.queries, functions.Udx.oracles),
      (sources.MailQueries.queries, sources.MailQueries.oracles),
      (sources.CatalogListing.queries, sources.CatalogListing.oracles),
      (plans.WindowTopK.queries, plans.WindowTopK.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core dataflow end-to-end: paged scan → label filter
    * → anti-join vs sink ids → header extraction → last-wins dedup.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_ingest_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation operators (100 TB posture). On a uniform fixture
  * these produce byte-identical results to their plain forms — the
  * point is the PLAN: a hot key never lands on a single reducer.
  *
  *  - Salted two-phase aggregation: groupBy(key, salt) partials, then
  *    groupBy(key) merge — the manual form of what AQE's skew handling
  *    cannot do for aggregations (AQE only splits skewed JOIN
  *    partitions). The heaviest key's work spreads over `salts`
  *    reducers in phase 1; phase 2 merges `salts` tiny rows per key.
  *  - Replicated broadcast join for skewed keys: when the probe side
  *    has hot keys, broadcasting the dimension (instead of shuffling
  *    the fact) removes the skewed shuffle entirely — that is the
  *    `broadcast()` pattern used throughout this engine; see
  *    Relational.q_join_inner.
  *
  * Results are deterministic: the salt only changes the partial-sum
  * grouping, and every aggregate used is merge-associative (count,
  * sum) with rounding applied after the final merge.
  */
object Skew {
  type Q = (SparkSession, String) => DataFrame

  /** Two-phase salted aggregation of `aggs` over `key`.
    * `saltCol` must be a deterministic expression (so re-computation
    * under task retry yields the same grouping).
    */
  def saltedAgg(df: DataFrame, key: Column, saltCol: Column, salts: Int)(
      partials: (Column, Column => Column)*): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(saltCol, lit(salts)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head._1.as("p0"),
        partials.tail.zipWithIndex.map { case ((c, _), i) => c.as(s"p${i + 1}") }: _*)
    phase1
      .groupBy(col("__key"))
      .agg(partials.head._2(col("p0")).as("a0"),
        partials.tail.zipWithIndex.map { case ((_, m), i) => m(col(s"p${i + 1}")).as(s"a${i + 1}") }: _*)
  }

  val queries: Map[String, Q] = Map(
    // Per-user event totals via salted two-phase aggregation — same
    // result as a plain groupBy (the oracle IS the plain form), but
    // the hot user's rows fan out over 8 reducers in phase 1.
    "q_agg_salted" -> ((s, d) => {
      val merged = saltedAgg(
        Tables.events(s, d), col("user_id"), crc32(col("event_id").cast("string")), 8)(
        (count(lit(1)), (c: Column) => sum(c)),
        (sum(col("value")), (c: Column) => sum(c)))
      merged.select(col("__key").as("user_id"),
          col("a0").as("n"), round(col("a1"), 2).as("total"))
        .orderBy(col("user_id"))
    }),

    // Salted shuffle JOIN, hot keys only: when a join key is hot AND
    // the dim is too big to broadcast, salt the fact side
    // deterministically and replicate the dim — but ONLY for the keys
    // that are actually hot. A frequency pre-pass (partial+final count,
    // so the skewed key itself costs one partial per mapper) finds keys
    // above the threshold; the hot slice joins salted (dim replicated
    // ×salts for those keys alone), the cold remainder joins plain, and
    // the two unions feed one aggregate. Replicating the whole dim
    // would octuple its shuffle for keys that never needed it; here the
    // replication factor is salts × |hot keys| rows — by construction a
    // tiny set (at 100 TB the threshold is set at a high quantile of
    // the key-frequency distribution, so `hot` is broadcast-scale).
    // (AQE's skew-join split handles many cases at runtime; the salted
    // form is the explicit, planner-independent fallback and composes
    // with bucketing.) Same result as the plain join — the oracle IS
    // the plain form; the fixture threshold of 4 makes both branches
    // non-empty at every SF.
    "q_join_salted" -> ((s, d) => {
      val salts = 8
      val hotThreshold = 4L
      val fact = Tables.lineitem(s, d)
      val dim = Tables.orders(s, d)
      val hot = fact.groupBy(col("l_orderkey").as("hk"))
        .agg(count(lit(1)).as("kn"))
        .filter(col("kn") > hotThreshold)
        .select(col("hk"))
      val factHot = fact
        .join(broadcast(hot), col("l_orderkey") === col("hk"), "left_semi")
        .withColumn("__salt", pmod(crc32(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), lit(salts)))
      val factCold = fact.join(broadcast(hot), col("l_orderkey") === col("hk"), "left_anti")
      val dimHot = dim
        .join(broadcast(hot), col("o_orderkey") === col("hk"), "left_semi")
        .withColumn("__salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
      val dimCold = dim.join(broadcast(hot), col("o_orderkey") === col("hk"), "left_anti")
      val hotJoined = factHot.join(dimHot,
          factHot("l_orderkey") === dimHot("o_orderkey") && factHot("__salt") === dimHot("__salt"))
        .select(col("o_orderstatus"), col("l_quantity"))
      val coldJoined = factCold.join(dimCold, factCold("l_orderkey") === dimCold("o_orderkey"))
        .select(col("o_orderstatus"), col("l_quantity"))
      hotJoined.unionByName(coldJoined)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_salted" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}

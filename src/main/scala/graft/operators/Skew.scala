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
    }),

    // JOIN-KEY SKEW AUDIT — the pre-flight measurement that decides
    // between the plain, salted (q_join_salted), and broadcast plans:
    // per candidate shuffle key, the key-frequency distribution's
    // head (max, exact p99) against its mean. skew_micro = max/mean
    // ×10⁶ is the "hot reducer multiple" — how much longer the
    // hottest task runs than the average if this key becomes the
    // shuffle partition key. Production runs this ONCE per table
    // profile and caches it next to the stats the optimizer reads.
    //
    // Exact integers end to end: mean_micro = (rows·10⁶) DIV keys and
    // skew_micro = (max·keys·10⁶) DIV rows (max/mean cross-multiplied
    // — no float, no double rounding). The p99 is EXACT, not sketched:
    // the one ordered window runs over the per-key COUNT table (the
    // q_auc/q_quantile_exact posture — bounded by distinct keys, two-
    // phase prefix sum at 100 TB), never over base rows. Per-key
    // counts come from one partial-agg'd groupBy per audited key.
    "q_skew_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      def audit(df: DataFrame, keyCol: String, tag: String): DataFrame = {
        val cnt = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        val ranked = cnt.withColumn("rk",
          row_number().over(Window.orderBy(col("c"), col("k"))))
        val nk = cnt.agg(count(lit(1)).as("nk"))
        // exact p99: the key at rank ⌈0.99·n_keys⌉ of the count order
        val p99 = ranked.crossJoin(broadcast(nk))
          .filter(expr("rk = CAST(ceil(0.99 * nk) AS BIGINT)"))
          .select(col("c").as("p99_rows"))
        cnt.agg(
            count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
            max(col("c")).as("max_rows"))
          .crossJoin(broadcast(p99))
          .selectExpr(s"'$tag' AS join_key", "n_keys", "n_rows", "max_rows", "p99_rows",
            "(n_rows * 1000000) DIV n_keys AS mean_micro",
            "(max_rows * n_keys * 1000000) DIV n_rows AS skew_micro")
      }
      audit(Tables.lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(audit(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
        .unionByName(audit(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
        .unionByName(audit(Tables.events(s, d), "user_id", "events.user_id"))
        .orderBy(col("join_key"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_salted" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_skew_audit" -> {
      def auditSql(table: String, key: String, tag: String, keyExpr: String = ""): String = {
        val kx = if (keyExpr.isEmpty) key else keyExpr
        s"""SELECT '$tag' AS join_key, n_keys, n_rows, max_rows, p99_rows,
           |  (n_rows * 1000000) // n_keys AS mean_micro,
           |  (max_rows * n_keys * 1000000) // n_rows AS skew_micro
           |FROM (
           |  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
           |    CAST(max(c) AS BIGINT) AS max_rows
           |  FROM (SELECT $kx AS k, CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY 1)),
           |(
           |  SELECT c AS p99_rows FROM (
           |    SELECT c, row_number() OVER (ORDER BY c, k) AS rk,
           |      count(*) OVER () AS nk
           |    FROM (SELECT $kx AS k, CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY 1))
           |  WHERE rk = CAST(ceil(0.99 * nk) AS BIGINT))""".stripMargin
      }
      Seq(
        auditSql("lineitem", "l_orderkey", "lineitem.l_orderkey"),
        auditSql("lineitem", "l_partkey", "lineitem.l_partkey"),
        auditSql("orders", "o_custkey", "orders.o_custkey"),
        auditSql("events", "user_id", "events.user_id")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY join_key")
    }
  )
}

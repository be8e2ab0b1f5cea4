package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Sanity invariants for the relational bank (the exact-value gate is
  * the driver's DuckDB compare; these pin structural properties).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  /** Queries with no SQL-expressible oracle (probabilistic or
    * streaming-stateful); the driver records a rows-only check and a
    * dedicated spec pins their behavior.
    */
  private val oracleExempt = Set("q_simsearch_lsh", "q_approx_stats", "q_hll_union",
    "q_mixture_approx", "q_compress_ratio", "q_tokenize", "q_pack_ffd")

  test("every declared query has an oracle or is explicitly exempt") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleExempt
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("all queries run non-empty on sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empty = counts.collect { case (n, 0L) => n }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query emits duplicate or empty column names (driver hash sorts by name)") {
    // The correctness gate sorts columns BY NAME before hashing — a
    // duplicate name makes the comparison ambiguous and an empty name
    // unaddressable, both silently. Schema-only: nothing executes.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols = fn(spark, sf).schema.fieldNames.toSeq
      val dups = cols.groupBy(identity).collect { case (c, xs) if xs.size > 1 => c }
      if (dups.nonEmpty || cols.exists(_.trim.isEmpty))
        Some(s"$name -> ${if (dups.nonEmpty) s"dup: ${dups.mkString(",")}" else "empty name"}")
      else None
    }
    assert(bad.isEmpty, s"ambiguous output schemas: $bad")
  }

  test("top-k plans as TakeOrderedAndProject (no global sort at scale)") {
    val plan = Relational.queries("q_sort_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("dimension join broadcasts the small side") {
    val plan = Relational.queries("q_join_inner")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("single-column scan prunes to one parquet column") {
    val plan = Relational.queries("q_scan_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint>"), plan.take(800))
  }

  test("window rank emits at most 3 rows per customer") {
    val over = Relational.queries("q_window_rank")(spark, sf)
      .groupBy("o_custkey").count().filter($"count" > 3).count()
    assert(over === 0)
  }

  test("setops partition: both + f_only = f") {
    val f = Tables.orders(spark, sf).filter($"o_orderstatus" === "F")
      .select($"o_custkey").distinct().count()
    val tagged = Relational.queries("q_setops")(spark, sf)
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    assert(tagged.getOrElse("both", 0L) + tagged.getOrElse("f_only", 0L) === f)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Skew}

/** Physical-plan audits: the shapes that matter at 100 TB, asserted on
  * the actual executed plans so a regression in pushdown, partial
  * aggregation, codegen participation, or partition pruning fails CI
  * — not just a slow bench.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg: shipdate predicate reaches the parquet scan") {
    val p = plan(Relational.queries("q1_agg")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q1_agg: aggregate is partial + final (map-side combine)") {
    val df = Relational.queries("q1_agg")(spark, sf)
    df.collect() // AQE finalizes (and codegen stages appear) only after execution
    val p = plan(df)
    assert(p.contains("partial_sum"), "no partial aggregation in:\n" + p.take(1200))
    assert(p.contains("*("), "aggregate fell out of codegen (no *(n) stages)")
  }

  test("native cosine_sim runs inside whole-stage codegen") {
    graft.functions.VectorFunctions.register(spark)
    val df = Tables.embeddings(spark, sf)
      .withColumn("c", expr("cosine_sim(embedding, embedding)"))
      .filter($"c" > 0.99)
    assert(df.count() > 0)
    val p = plan(df)
    assert(p.contains("cosine_sim"), p.take(800))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("cosine_sim")),
      "expression not inside a codegen stage:\n" + p.take(800))
  }

  test("salted aggregation matches plain aggregation exactly") {
    val salted = Skew.queries("q_agg_salted")(spark, sf).collect().toSeq
    val plain = Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"user_id").collect().toSeq
    assert(salted === plain)
  }

  test("salted aggregation shuffles on (key, salt) first") {
    val p = plan(Skew.queries("q_agg_salted")(spark, sf))
    assert(p.contains("__salt"), "salt column missing from plan:\n" + p.take(1200))
    // two exchanges: (key, salt) then (key)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 2, s"expected 2 shuffles, plan:\n$p")
  }

  test("partitioned sink: partition pruning skips non-matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter($"event_type" === "click")
    val p = plan(back)
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    val expected = Tables.events(spark, sf).filter($"event_type" === "click").count()
    assert(back.count() === expected)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins Spark 4's built-in per-key top-N prune (`InferWindowGroupLimit`,
  * SPARK-37099) on the q_topk_pushdown idiom: `WindowGroupLimit …
  * Partial` must sit BELOW the window exchange, actually shrink the
  * shuffle, and decline windows where a co-resident function needs the
  * full partition. Replaces the deleted custom `TopKPushdown` operator
  * (round-3 verdict: redundant with the built-in) — these tests are the
  * regression tripwire a Spark upgrade or conf change would hit.
  */
class WindowTopKSpec extends SparkSpec {

  private def topkDf(k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Final (AQE-resolved) plan after execution. */
  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("built-in prune fires: WindowGroupLimit(Partial) sits below the window exchange") {
    val df = topkDf()
    df.collect()
    val lines = finalPlan(df).toString.linesIterator.toVector
    val partial = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    val fin = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Final"))
    val exchange = lines.indexWhere(_.contains("Exchange hashpartitioning(o_custkey"))
    assert(partial >= 0 && fin >= 0 && exchange >= 0,
      "built-in WindowGroupLimit pair missing:\n" + lines.mkString("\n"))
    // tree prints children below parents: map-side Partial is a
    // descendant of the exchange, reduce-side Final its ancestor
    assert(fin < exchange && exchange < partial,
      s"Partial not below the shuffle (final@$fin exchange@$exchange partial@$partial):\n" +
        lines.mkString("\n"))
  }

  test("prune shrinks the window shuffle vs threshold-disabled plan, results identical") {
    // Parquet arrives as one input partition at this SF; spread it so the
    // map-side prune has >1 mapper to work with (and still must merge).
    // k=1: each mapper forwards one row per key it sees, so the window
    // shuffle carries ≤ keysPerPartition rows instead of every row.
    def run(threshold: String): (Seq[org.apache.spark.sql.Row], Long) =
      withConf("spark.sql.optimizer.windowGroupLimitThreshold", threshold) {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val df = Tables.orders(spark, sf)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .repartition(2, col("o_orderkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 1)
          .orderBy(col("o_custkey"))
        val rows = df.collect().toSeq
        // QueryStageExec is a leaf to TreeNode.collect — descend into each
        // stage's materialized plan or the exchange metrics are invisible
        // (the round-2/3 spec's on=0 off=0 bug).
        def written(p: SparkPlan): Long = {
          val own = p.collect {
            case e if e.metrics.contains("shuffleRecordsWritten") =>
              e.metrics("shuffleRecordsWritten").value
          }.sum
          val nested = p.collect {
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => written(q.plan)
          }.sum
          own + nested
        }
        (rows, written(finalPlan(df)))
      }
    val (rowsOn, writtenOn) = run(threshold = "1000") // default
    val (rowsOff, writtenOff) = run(threshold = "-1") // -1 disables the optimization
    assert(rowsOn === rowsOff)
    assert(writtenOn < writtenOff,
      s"built-in prune did not shrink shuffle: on=$writtenOn off=$writtenOff")
  }

  test("q_topk_pushdown matches the threshold-disabled plan bit-for-bit, rn included") {
    val pruned = plans.WindowTopK.queries("q_topk_pushdown")(spark, sf).collect().toSeq
    val vanilla = withConf("spark.sql.optimizer.windowGroupLimitThreshold", "-1") {
      val df = plans.WindowTopK.queries("q_topk_pushdown")(spark, sf)
      df.collect()
      val p = finalPlan(df).toString
      assert(!p.contains("WindowGroupLimit"), "threshold=-1 did not disable the prune:\n" + p.take(1500))
      df.collect().toSeq
    }
    assert(pruned === vanilla)
  }

  test("windows with co-resident functions are NOT pruned (sum needs the full partition)") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val mixed = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("s", sum(col("o_totalprice")).over(w))
      .filter(col("rn") <= 3)
    mixed.collect()
    val mp = finalPlan(mixed).toString
    assert(!mp.contains("WindowGroupLimit"), mp.take(1500))
  }

  test("rank() bound IS pruned by the built-in (unlike the deleted custom rule)") {
    // SPARK-37099 handles rank/dense_rank tie semantics; pin that the
    // prune extends to them so we never re-grow a custom path for it.
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    def ranked = Tables.orders(spark, sf) // def: a fresh plan per conf change
      .select(col("o_custkey"), col("o_totalprice"))
      .withColumn("r", rank().over(w))
      .filter(col("r") <= 3)
      .orderBy(col("o_custkey"), col("r"), col("o_totalprice"))
    val prunedDf = ranked
    val got = prunedDf.collect().toSeq
    val p = finalPlan(prunedDf).toString
    assert(p.contains("WindowGroupLimit"), "rank() bound not pruned:\n" + p.take(1500))
    val expected = withConf("spark.sql.optimizer.windowGroupLimitThreshold", "-1")(ranked.collect().toSeq)
    assert(got === expected)
  }
}

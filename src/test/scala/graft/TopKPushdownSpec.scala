package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPushdown

/** The custom Catalyst path (logical node + rule + strategy + physical
  * operator): the per-key top-N rewrite must fire, be bit-identical to
  * the vanilla window plan (rn included), stay correct under epoch
  * flushing, and actually shrink the window's shuffle.
  */
class TopKPushdownSpec extends SparkSpec {

  private def topkDf(k: Int = 3): DataFrame = {
    TopKPushdown.register(spark)
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

  test("rewrite fires: physical plan contains LocalTopKPerKeyExec below the window") {
    val df = topkDf()
    df.collect()
    val p = finalPlan(df).toString
    assert(p.contains("LocalTopKPerKeyExec"), "rewrite did not fire:\n" + p.take(1500))
    assert(p.contains("Window"), p.take(1500))
  }

  test("rewritten result is bit-identical to the vanilla window plan, rn included") {
    val rewritten = topkDf().collect().toSeq
    val vanilla = withConf("graft.topk.enabled", "false") {
      val df = topkDf()
      val p = finalPlan({ df.collect(); df }).toString
      assert(!p.contains("LocalTopKPerKeyExec"), "kill switch ignored:\n" + p.take(1500))
      df.collect().toSeq
    }
    assert(rewritten === vanilla)
  }

  test("epoch flush (maxKeysPerPartition=1) preserves the exact result") {
    val expected = withConf("graft.topk.enabled", "false")(topkDf().collect().toSeq)
    val flushed = withConf("graft.topk.maxKeysPerPartition", "1")(topkDf().collect().toSeq)
    assert(flushed === expected)
  }

  test("rn = 1 (EqualTo form) rewrites and matches") {
    TopKPushdown.register(spark)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def df = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .orderBy(col("o_custkey"))
    val got = df.collect().toSeq
    assert(finalPlan(df).toString.contains("LocalTopKPerKeyExec"))
    val expected = withConf("graft.topk.enabled", "false")(df.collect().toSeq)
    assert(got === expected)
    assert(got.nonEmpty && got.forall(_.getInt(3) == 1))
  }

  test("prune shrinks the window shuffle vs the vanilla plan") {
    // Parquet arrives as one input partition at this SF; spread it so the
    // map-side prune has >1 mapper to work with (and still must merge).
    // k=1: each mapper forwards one row per key it sees, so the window
    // shuffle carries ≤ keysPerPartition rows instead of every row.
    def run(enabled: Boolean): (Long, Long) = withConf("graft.topk.enabled", enabled.toString) {
      TopKPushdown.register(spark)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .repartition(2, col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1)
      val n = df.collect().length.toLong
      val written = finalPlan(df).collect {
        case e if e.metrics.contains("shuffleRecordsWritten") =>
          e.metrics("shuffleRecordsWritten").value
      }.sum
      (n, written)
    }
    val (nOn, writtenOn) = run(enabled = true)
    val (nOff, writtenOff) = run(enabled = false)
    assert(nOn === nOff)
    assert(writtenOn < writtenOff,
      s"prune did not shrink shuffle: on=$writtenOn off=$writtenOff")
  }

  test("windows with co-resident functions or rank() are NOT rewritten") {
    TopKPushdown.register(spark)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rank(): ties could spill past k per partition — must stay vanilla.
    val ranked = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"))
      .withColumn("r", rank().over(w))
      .filter(col("r") <= 3)
    ranked.collect()
    assert(!finalPlan(ranked).toString.contains("LocalTopKPerKeyExec"))
    // row_number + sum in one window node: sum sees the full partition.
    val mixed = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("s", sum(col("o_totalprice")).over(w))
      .filter(col("rn") <= 3)
    val mp = finalPlan({ mixed.collect(); mixed }).toString
    assert(!mp.contains("LocalTopKPerKeyExec"), mp.take(1500))
  }
}

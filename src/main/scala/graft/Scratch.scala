package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev timing harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/region.parquet").count()

    import org.apache.spark.sql.functions._
    import graft.operators.Graph
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val plan = Graph.orientedSupport(
      Graph.copurchaseEdges(spark, "/root/testdata/sf0.001").localCheckpoint(),
      checkpoint = false).queryExecution.optimizedPlan
    val csAggs = plan.collect { case a: Aggregate
      if a.aggregateExpressions.exists(_.toString.contains("collect_set")) => a }
    println(s"nAggs=${csAggs.size}")
    csAggs.foreach { a =>
      println("---- agg: " + a.aggregateExpressions.map(_.toString).mkString("|").take(150))
      a.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.foreach(j => println("  join: " + j.condition.map(_.toString).getOrElse("none").take(300)))
    }
    spark.stop()
  }
}

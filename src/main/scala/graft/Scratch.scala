package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
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
    // q_pagerank stage breakdown
    val orders = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val lineitem = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
    val directed = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    time("pr: directed edges") { directed.count() }
    val edges = directed.unionByName(directed.select(col("dst").as("src"), col("src").as("dst")))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    time("pr: outdeg") { outdeg.count() }
    time("pr: full query") { operators.Graph.queries("q_pagerank")(spark, d).count() }
    time("pr: full again") { operators.Graph.queries("q_pagerank")(spark, d).count() }
    val df = operators.Graph.queries("q_pagerank")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    println((if (cut >= 0) p.substring(0, cut) else p).linesIterator.map(_.take(100)).mkString("\n"))
    spark.stop()
  }
}

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
    time("tradeBase") { Graph.tradeBase(spark, d).count() }
    val edges = Graph.tradeBase(spark, d).select(col("src"), col("dst"))
    time("tradeBase again (cached)") { edges.count() }
    time("deg") { edges.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg")).count() }
    time("swap x1") { Graph.edgeSwapNull(edges, 1).count() }
    time("swap x2") { Graph.edgeSwapNull(edges, 2).count() }
    time("hash only") { edges.select(expr(
      "CAST(conv(substring(md5(concat_ws(':', src, dst, '1')), 1, 15), 16, 10) AS BIGINT)").as("h")).agg(sum("h")).count() }
    spark.stop()
  }
}

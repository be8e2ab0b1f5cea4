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

    // q_dedup_cluster breakdown
    time("cc: jaccard pairs") { operators.NearDup.jaccardPairs(spark, d).count() }
    time("cc: full query") { operators.NearDup.queries("q_dedup_cluster")(spark, d).count() }
    time("cc: full query again") { operators.NearDup.queries("q_dedup_cluster")(spark, d).count() }
    spark.stop()
  }
}

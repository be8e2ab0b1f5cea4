package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = operators.SimSearch.queries("q_simsearch")(spark, d)
    println("=== OPTIMIZED ===")
    println(q.queryExecution.optimizedPlan.toString.take(2500))
  }
}

package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc executed-plan dumper (dev tool, not part of the driver
  * contract — the PlanAuditSpec assertions are the CI form of these
  * checks). Usage: runMain graft.PlanDump q_name [q_name ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}

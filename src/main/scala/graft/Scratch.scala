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
      println(f"$name%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n)")
    }
    spark.read.parquet(s"$d/lineitem.parquet").count()

    time("200x read.parquet(lineitem).schema") {
      (1 to 200).map(_ => spark.read.parquet(s"$d/lineitem.parquet").schema.size.toLong).sum
    }
    val sch = spark.read.parquet(s"$d/lineitem.parquet").schema
    time("200x read.schema(s).parquet.schema") {
      (1 to 200).map(_ => spark.read.schema(sch).parquet(s"$d/lineitem.parquet").schema.size.toLong).sum
    }
    time("200x optimize plan (infer)") {
      (1 to 200).map(_ => spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey").queryExecution.optimizedPlan.stats.sizeInBytes.toLong % 7).sum
    }
    time("200x optimize plan (memo)") {
      (1 to 200).map(_ => spark.read.schema(sch).parquet(s"$d/lineitem.parquet")
        .select("l_orderkey").queryExecution.optimizedPlan.stats.sizeInBytes.toLong % 7).sum
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1-minute system load average, or -1 where unavailable. Recorded
    * before and after the sweep so a contaminated run (another process
    * fighting for the 32 CPUs) is self-identifying in the JSON instead
    * of needing a judge re-run to detect.
    */
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warm-up
    // Parquet/Hadoop-FS init warm-up (region is 5 rows; nothing is
    // cached) — otherwise the alphabetically-first query absorbs
    // several seconds of one-time reader initialization.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // Footer/schema touch per table (metadata only, no data read) so
    // the first query over each table doesn't absorb its one-time
    // footer parse + FileIndex listing.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => () }
    }
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    // Noise defense: a contended host can inflate any single pass by
    // 10×, so each query runs twice and reports the min — transient
    // load can only make the min pessimistic by appearing in BOTH
    // passes. (The second pass also measures the steady state the
    // per-round comparison cares about: plan + codegen are warm.)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val loadBefore = loadAvg()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // A failed query must not masquerade as a fast one: report -1.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
      val first = once()
      val best =
        if (first < 0) first
        else (2 to passes).foldLeft(first) { (b, _) =>
          val t = once(); if (t < 0) -1.0 else math.min(b, t)
        }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadAfter = loadAvg()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter}""")
    spark.stop()
  }
}

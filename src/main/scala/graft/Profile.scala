package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query cost profiler (dev tool, not part of the driver
  * contract). Runs named queries (or producer rows) under the exact
  * Bench session config and reports, per query: wall seconds, Spark
  * job count, stage count, task count, summed task time, and summed
  * shuffle bytes — the numbers that separate "job-count overhead"
  * from "data work" when deciding what to optimize.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Profile q_a q_b ...
  *        SPARK_GRAFT_PROFILE_PLANS=/dir  also writes
  *        <dir>/<query>.txt with explain("formatted").
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs: SPARK_GRAFT_PROFILE_CONF="k=v;k2=v2"
    val spark = sys.env.get("SPARK_GRAFT_PROFILE_CONF")
      .map(_.split(";").filter(_.contains("=")).foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }).getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val taskNanos = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val stageLog = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").isDefined
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (stageLog) {
          val i = s.stageInfo
          val rt = Option(i.taskMetrics).map(_.executorRunTime).getOrElse(0L)
          if (rt > 200)
            println(f"    stage ${i.stageId}%5d ${i.numTasks}%4dt ${rt / 1e3}%7.2fs  ${i.name.take(80)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          if (m.shuffleReadMetrics != null)
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          if (m.shuffleWriteMetrics != null)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val all = SparkEntry.queries ++ Producers.all
    val planDir = sys.env.get("SPARK_GRAFT_PROFILE_PLANS")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "1").toInt
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"taskSec"}%8s ${"shufMB"}%8s")
    for (p <- 1 to passes; q <- args) {
      all.get(q) match {
        case None => System.err.println(s"[profile] unknown query: $q")
        case Some(fn) =>
          val (j0, s0, t0, n0, r0, w0) =
            (jobs.get, stages.get, tasks.get, taskNanos.get, shufRead.get, shufWrite.get)
          val w = System.nanoTime()
          val df = fn(spark, sfDir)
          df.count()
          val wall = (System.nanoTime() - w) / 1e9
          if (p == passes) planDir.foreach { dir =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$dir/$q.txt"),
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          try spark.catalog.clearCache() catch { case _: Throwable => () }
          println(f"$q%-28s $wall%8.2f ${jobs.get - j0}%6d ${stages.get - s0}%7d ${tasks.get - t0}%7d ${(taskNanos.get - n0) / 1e9}%8.2f ${(shufRead.get - r0 + shufWrite.get - w0) / 1e6}%8.1f")
      }
    }
    spark.stop()
  }
}

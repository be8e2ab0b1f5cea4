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

    // q_corpus_e2e stage breakdown
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val raw = operators.NearDup.corpus(spark, d)
    time("e2e: raw corpus") { raw.count() }
    val quality = raw.filter(length(col("text")) >= 64)
    val wm = org.apache.spark.sql.expressions.Window.partitionBy(col("m")).orderBy(col("doc_id"))
    val exact = quality.withColumn("m", md5(col("text")))
      .withColumn("rn", row_number().over(wm)).filter(col("rn") === 1).drop("m", "rn")
    time("e2e: exact dedup") { exact.count() }
    time("e2e: jaccard pairs") { operators.NearDup.jaccardPairs(spark, d).count() }
    val ngAll = raw.select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("ng"))
    val evalNg = ngAll.filter(col("doc_id") % 23 === 0).select(col("ng")).distinct()
    time("e2e: eval ngrams") { evalNg.count() }
    time("e2e: full query") { operators.Pipeline.queries("q_corpus_e2e")(spark, d).count() }
    time("e2e: full again") { operators.Pipeline.queries("q_corpus_e2e")(spark, d).count() }
    spark.stop()
  }
}

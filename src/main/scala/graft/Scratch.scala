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
    import org.apache.spark.sql.expressions.Window
    val K = 30; val M = 20
    val tcounts = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "lang",
        "explode(transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))) AS tri")
      .groupBy(col("doc_id"), col("lang"), col("tri")).agg(count(lit(1)).as("c"))
    time("tcounts") { tcounts.count() }
    val langProf = tcounts.groupBy(col("lang"), col("tri")).agg(sum(col("c")).as("c"))
      .withColumn("r_lang", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("tri"))))
      .filter(col("r_lang") <= K)
      .select(col("lang").as("p_lang"), col("tri"), col("r_lang"))
    time("langProf") { langProf.count() }
    val docProf = tcounts
      .withColumn("r_doc", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("tri"))))
      .filter(col("r_doc") <= M)
      .select(col("doc_id"), col("tri"), col("r_doc"))
    time("docProf") { docProf.count() }
    val langs = tcounts.select(col("lang").as("p_lang")).distinct()
    val scored = docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("p_lang", "tri"), "left")
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(sum(coalesce(expr("CAST(abs(r_doc - r_lang) AS BIGINT)"), lit(K.toLong))).as("dist"))
    time("scored") { scored.count() }
    time("full query") { SparkEntry.queries("q_langid_trigram")(spark, d).count() }
    spark.stop()
  }
}

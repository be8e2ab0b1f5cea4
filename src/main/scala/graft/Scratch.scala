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
    graft.functions.VectorFunctions.register(spark)
    val W = 4
    val corpus = operators.NearDup.corpus(spark, d)
    time("corpus count") { corpus.count() }
    val wh = corpus.selectExpr("doc_id", "word_window_hashes(text, 8) AS wh")
    time("gram hashes") { wh.selectExpr("sum(size(wh))").collect()(0).getLong(0) }
    val sel0 = wh.filter(size(col("wh")) >= W)
      .selectExpr("doc_id",
        s"array_distinct(transform(sequence(1, greatest(size(wh) - ${W - 1}, 1)), i -> array_min(slice(wh, i, $W)))) AS sel")
      .select(col("doc_id"), explode(col("sel")).as("fp"))
    time("sel explode") { sel0.count() }
    val sel = sel0.persist()
    time("sel persist build") { sel.count() }
    val rare = sel.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select(col("fp"))
    val posting = sel.join(rare, "fp")
    val pairs = posting.as("x").join(posting.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
    time("pairs") { pairs.count() }
    val hsh = operators.NearDup.withHashedShingles(operators.NearDup.corpus(spark, d))
      .select(col("doc_id"), col("hs"))
    time("hsh") { hsh.count() }
    val fin = pairs
      .join(hsh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
      .join(hsh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
      .withColumn("jaccard", expr("jaccard_sorted(ha, hb)"))
      .filter(col("jaccard") >= 0.6)
    time("verify") { fin.count() }
    time("full query") { operators.NearDup.queries("q_dedup_winnow")(spark, d).count() }
    spark.stop()
  }
}

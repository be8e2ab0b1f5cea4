package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    import operators.NearDup
    val corpus = NearDup.corpus(spark, d)
    time("corpus")(corpus.count())
    val sh = NearDup.withShingles(corpus).select(col("doc_id"), col("shingles"))
    time("shingles")(sh.count())
    time("shingle_explode")(sh.select(explode(col("shingles"))).count())
    val sig = NearDup.signaturesOf(sh)
    time("signatures")(sig.count())
    val bands = sig
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("b"), col("sigs"))
      .withColumn("bs", expr("concat_ws('|', slice(sigs, b * 3 + 1, 3))"))
      .select(col("doc_id"), col("b"), col("bs"))
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bs") === col("y.bs")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingles").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("shingles").as("sb")), "b_id")
      .withColumn("jaccard", expr("size(array_intersect(sa, sb)) / size(array_union(sa, sb))"))
      .filter(col("jaccard") >= 0.6)
    time("verify")(verified.count())
    spark.stop()
  }
}

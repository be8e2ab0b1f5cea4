package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimSearch

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def floats(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine_sim matches hand-computed values") {
    VectorFunctions.register(spark)
    val df = Seq(
      (floats(1, 0, 0), floats(1, 0, 0)),   // identical → 1.0
      (floats(1, 0, 0), floats(0, 1, 0)),   // orthogonal → 0.0
      (floats(1, 2, 3), floats(-1, -2, -3)) // opposite → -1.0
    ).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)"))
    val got = df.select(round($"c", 9)).as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0, -1.0))
  }

  test("cosine_sim is null-safe") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(floats(1, 2)), None: Option[Array[Float]]),
      (None: Option[Array[Float]], Some(floats(1, 2)))
    ).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)"))
    assert(df.filter($"c".isNotNull).count() === 0)
  }

  test("native expression agrees with the HOF form on real embeddings") {
    val native = SimSearch.queries("q_simsearch_native")(spark, sf).collect().toSeq
    val hof = SimSearch.queries("q_simsearch")(spark, sf).collect().toSeq
    assert(native === hof)
  }

  test("type check rejects non-float arrays") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d))").collect()
    }
    assert(err.getMessage.contains("cosine_sim"))
  }
}

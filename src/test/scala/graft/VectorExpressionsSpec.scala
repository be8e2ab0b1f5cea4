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

  test("double-array overload matches the float path") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT round(cosine_sim(array(1.0d, 2.0d, 3.0d), array(-1.0d, -2.0d, -3.0d)), 9)")
      .as[Double].head()
    assert(got === -1.0)
  }

  test("type check rejects non-numeric arrays and mixed element types") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(1, 2))").collect()
    }
    assert(err.getMessage.contains("cosine_sim"))
    val mixed = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(cast(1 as float), cast(2 as float)))").collect()
    }
    assert(mixed.getMessage.contains("cosine_sim"))
  }
}

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

  test("cosine_sim is null-safe: null inputs, length mismatch, null elements") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(floats(1, 2)), None: Option[Array[Float]]),
      (None: Option[Array[Float]], Some(floats(1, 2)))
    ).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)"))
    assert(df.filter($"c".isNotNull).count() === 0)
    // HOF zip_with parity: ragged lengths and null elements → NULL,
    // never a silently truncated score
    val edge = spark.sql(
      """SELECT cosine_sim(array(cast(1 as float), cast(2 as float)), array(cast(1 as float))) AS ragged,
        |       cosine_sim(array(cast(1 as float), cast(null as float)),
        |                  array(cast(1 as float), cast(2 as float))) AS holed""".stripMargin)
      .head()
    assert(edge.isNullAt(0), "length mismatch must yield NULL")
    assert(edge.isNullAt(1), "null element must yield NULL")
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

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"

  test("RewriteDotProducts: HOF idiom is rewritten to the native expression") {
    VectorFunctions.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select($"embedding".as("a"), $"embedding".as("b"))
      .selectExpr(s"$hofDot AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), "rule did not fire:\n" + optimized.take(600))
    assert(!optimized.contains("aggregate("), "HOF fold survived:\n" + optimized.take(600))
  }

  test("RewriteDotProducts: rewritten result is bit-identical to the interpreted fold") {
    VectorFunctions.register(spark)
    def run(s: org.apache.spark.sql.SparkSession): (Seq[(Long, Double)], String) = {
      val df = Tables.embeddings(s, sf)
        .select(col("vec_id"), col("embedding").as("a"), col("embedding").as("b"))
        .selectExpr("vec_id", s"$hofDot AS d").orderBy(col("vec_id"))
      import s.implicits._
      (df.as[(Long, Double)].collect().toSeq, df.queryExecution.optimizedPlan.toString)
    }
    val (native, nativePlan) = run(spark)
    // fresh session state → no RewriteDotProducts → interpreted HOF path
    val plain = spark.newSession()
    val (interp, interpPlan) = run(plain)
    assert(nativePlan.contains("dot_product"), "rule missing on main session")
    assert(!interpPlan.contains("dot_product"), "fresh session unexpectedly has the rule")
    assert(native === interp)
  }

  test("RewriteDotProducts: null semantics match the HOF form") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),          // length mismatch → null
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))     // clean → 5.0
    ).toDF("a", "b").selectExpr(s"$hofDot AS d")
    // (plan-shape assertion lives in the parquet-based test; literal
    // inputs constant-fold before the plan is observable)
    val got = df.as[Option[Double]].collect().toSeq
    assert(got === Seq(None, Some(5.0)))
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

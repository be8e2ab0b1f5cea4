package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Pipeline

/** The native basket-pair / gram-pair generators: exact parity with the
  * nested-HOF forms they replaced, the null contract, codegen
  * participation, and the basket-size cap census.
  */
class PairExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofPairs =
    """flatten(transform(arr, (x, i) ->
      |  transform(slice(arr, i + 2, size(arr)), y -> struct(x AS a, y AS b))))""".stripMargin

  test("sorted_pairs is element-identical to the nested-HOF form on real baskets") {
    VectorFunctions.register(spark)
    val baskets = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("arr"))
    val both = baskets
      .withColumn("native", expr("sorted_pairs(arr)"))
      .withColumn("hof", expr(hofPairs))
    // same structs in the same (row-major upper-triangle) order
    assert(both.filter("native <> hof").count() === 0)
    assert(both.filter("size(native) <> size(arr) * (size(arr) - 1) / 2").count() === 0)
  }

  test("sorted_pairs null contract and degenerate sizes") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT sorted_pairs(CAST(NULL AS ARRAY<BIGINT>)) AS on_null,
        |       sorted_pairs(array(1L, CAST(NULL AS BIGINT), 3L)) AS on_holed,
        |       size(sorted_pairs(array(7L))) AS singleton,
        |       size(sorted_pairs(CAST(array() AS ARRAY<BIGINT>))) AS empty,
        |       sorted_pairs(array(1L, 2L, 3L)) AS tri""".stripMargin).head()
    assert(row.isNullAt(0), "null array must yield NULL")
    assert(row.isNullAt(1), "null element must yield NULL")
    assert(row.getInt(2) === 0 && row.getInt(3) === 0)
    val tri = row.getSeq[org.apache.spark.sql.Row](4)
    assert(tri.map(r => (r.getLong(0), r.getLong(1))) === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("sorted_pairs participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    val df = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("arr"))
      .select(explode(expr("sorted_pairs(arr)")).as("p"))
      .select($"p.a", $"p.b")
    assert(df.collect().nonEmpty) // AQE finalizes (and codegen stages appear) only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("sorted_pairs"), p.take(800))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("sorted_pairs")),
      "expression not inside a codegen stage:\n" + p.take(800))
  }

  test("gram_pairs is element-identical to the nested-HOF form on real embeddings") {
    VectorFunctions.register(spark)
    val d = 64
    val qdf = Tables.embeddings(spark, sf).select(expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    val both = qdf
      .withColumn("native", expr("gram_pairs(qv)"))
      .withColumn("hof", expr(
        s"""flatten(transform(sequence(1, $d), i ->
           |  transform(slice(qv, i, ${d + 1} - i), (y, k) ->
           |    struct(i AS di, i + k AS dj, element_at(qv, i) * y AS xy))))""".stripMargin))
    assert(both.filter("native <> hof").count() === 0)
    assert(both.filter(s"size(native) <> ${d * (d + 1) / 2}").count() === 0)
  }

  test("gram_pairs null contract, diagonal inclusion, 1-based indices") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT gram_pairs(CAST(NULL AS ARRAY<BIGINT>)) AS on_null,
        |       gram_pairs(array(2L, CAST(NULL AS BIGINT))) AS on_holed,
        |       gram_pairs(array(3L, 5L)) AS two""".stripMargin).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    val two = row.getSeq[org.apache.spark.sql.Row](2)
    assert(two.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))) ===
      Seq((1, 1, 9L), (1, 2, 15L), (2, 2, 25L)))
  }

  test("basket cap census: a hot basket emits at most C(cap, 2) pairs") {
    VectorFunctions.register(spark)
    val cap = Pipeline.BasketCap
    // synthetic 500-item hot basket — uncapped it would emit 124750
    // pairs; the production plan's slice() bounds it at C(64,2) = 2016
    val hot = Seq((1L, (1L to 500L).toArray)).toDF("ok", "items")
    val n = hot.select(explode(expr(s"sorted_pairs(slice(items, 1, $cap))")).as("p"))
      .count()
    assert(n === cap.toLong * (cap - 1) / 2)
    // and the cap is a no-op below the cap (fixture posture: baskets ≤ 7)
    val small = Seq((1L, (1L to 7L).toArray)).toDF("ok", "items")
      .select(expr(s"sorted_pairs(slice(items, 1, $cap))").as("capped"),
        expr("sorted_pairs(items)").as("raw"))
    assert(small.filter("capped <> raw").count() === 0)
  }

  test("fixture posture: no lineitem basket approaches the cap") {
    // The oracles run UNCAPPED SQL; parity holds because every fixture
    // basket is far below BasketCap. Assert it so a fixture change that
    // silently breaks the cap-is-a-no-op assumption fails loudly here
    // instead of as an oracle hash mismatch.
    val maxBasket = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey").agg(countDistinct($"l_partkey").as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(maxBasket <= Pipeline.BasketCap / 2,
      s"fixture basket of $maxBasket items is within 2× of BasketCap=${Pipeline.BasketCap}; " +
        "cap would soon bite and desync the uncapped oracles")
  }

  test("triangle_credits matches the concat+transform form and the null contract") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT triangle_credits(10L, 20L, array(3L, 7L)) AS tc,
        |       concat(array(struct(10L AS part, 2L AS n), struct(20L AS part, 2L AS n)),
        |              transform(array(3L, 7L), c -> struct(c AS part, 1L AS n))) AS hof,
        |       triangle_credits(1L, 2L, CAST(array() AS ARRAY<BIGINT>)) AS empty,
        |       triangle_credits(1L, 2L, CAST(NULL AS ARRAY<BIGINT>)) AS on_null
        |""".stripMargin).head()
    assert(row.getSeq[Any](0) === row.getSeq[Any](1))
    val empty = row.getSeq[org.apache.spark.sql.Row](2)
    assert(empty.map(r => (r.getLong(0), r.getLong(1))) === Seq((1L, 0L), (2L, 0L)),
      "k=0 edge must still emit two zero-credit corner structs")
    assert(row.isNullAt(3))
  }

  test("GraftExtensions resolves sorted_pairs and gram_pairs") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val fresh = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new VectorFunctions.GraftExtensions)
      .getOrCreate()
    try {
      val row = fresh.sql(
        "SELECT size(sorted_pairs(array(1L, 2L, 3L))) AS sp, " +
          "size(gram_pairs(array(1L, 2L))) AS gp").collect()(0)
      assert(row.getInt(0) === 3 && row.getInt(1) === 3)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

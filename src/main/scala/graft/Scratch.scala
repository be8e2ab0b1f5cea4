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
    import graft.operators.Graph
    var t0 = System.nanoTime()
    def lap(s: String): Unit = { println(f"$s (${(System.nanoTime()-t0)/1e9}%.2f s)"); t0 = System.nanoTime() }
    val edges0 = Graph.copurchaseEdges(spark, d).localCheckpoint()
    println(s"edges0: ${edges0.count()}"); lap("build")
    val minSupp = 2L
    val suppAll = Graph.orientedSupport(edges0).localCheckpoint()
    lap(s"suppAll=${suppAll.count()}")
    // state: touched edges only: (a, b, dectot, rmvd round or null)
    var state = suppAll.filter(col("supp") < minSupp)
      .select(col("a"), col("b"), lit(0L).as("dectot"), lit(1L).as("rmvd"))
      .localCheckpoint()
    var r = 1L
    var nRemoved = state.filter(col("rmvd") === r).count()
    lap(s"round1 removed=$nRemoved")
    while (nRemoved > 0 && r < 64) {
      val removedNew = state.filter(col("rmvd") === r).select(col("a"), col("b"))
      val removedOld = state.filter(col("rmvd").isNotNull && col("rmvd") < r)
        .select(col("a"), col("b"))
      val ends = removedNew.select(explode(array(col("a"), col("b"))).as("x")).distinct()
      val undBase = suppAll.select(col("a"), col("b"))
        .join(broadcast(removedOld), Seq("a", "b"), "left_anti")
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("c")),
          struct(col("b").as("x"), col("a").as("c")))).as("p"))
        .select(col("p.x").as("x"), col("p.c").as("c"))
      val undF = (if (nRemoved > 10000) undBase
        else undBase.join(broadcast(ends), Seq("x"), "left_semi"))
        .localCheckpoint()
      val tris = undF.select(col("x").as("a"), col("c"))
        .join(broadcast(removedNew), Seq("a"))
        .filter(col("c") =!= col("b"))
        .join(undF.select(col("x").as("b"), col("c")), Seq("b", "c"), "left_semi")
        .withColumn("x", least(col("a"), col("b"), col("c")))
        .withColumn("z", greatest(col("a"), col("b"), col("c")))
        .withColumn("y", col("a") + col("b") + col("c") - col("x") - col("z"))
        .select(col("x"), col("y"), col("z"))
        .distinct()
      val dec = tris.select(explode(array(
          struct(col("x").as("a"), col("y").as("b")),
          struct(col("x").as("a"), col("z").as("b")),
          struct(col("y").as("a"), col("z").as("b")))).as("e"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("dec"))
      // one merged state update: outer-merge dec into state, fetch supp0 for new rows
      val merged = state.join(dec, Seq("a", "b"), "full")
        .select(col("a"), col("b"),
          (coalesce(col("dectot"), lit(0L)) + coalesce(col("dec"), lit(0L))).as("dectot"),
          col("rmvd"))
      state = suppAll
        .join(broadcast(merged), Seq("a", "b"))
        .select(col("a"), col("b"), col("dectot"),
          when(col("rmvd").isNotNull, col("rmvd"))
            .when(col("supp") - col("dectot") < minSupp, lit(r + 1))
            .otherwise(lit(null).cast("bigint")).as("rmvd"))
        .localCheckpoint()
      r += 1
      nRemoved = state.filter(col("rmvd") === r).count()
      lap(s"r$r removed=$nRemoved state=${state.count()}")
    }
    val kept = suppAll.join(
        state.filter(col("rmvd").isNotNull).select(col("a"), col("b")),
        Seq("a", "b"), "left_anti")
      .join(broadcast(state.filter(col("rmvd").isNull).select(col("a"), col("b"), col("dectot"))),
        Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        (col("supp") - coalesce(col("dectot"), lit(0L))).as("supp"))
      .filter(col("supp") >= minSupp)
    lap(s"final kept=${kept.count()}")
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    graft.functions.VectorFunctions.register(spark)
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def time(name: String)(f: => Long): Unit = {
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s ${jobs.get - j0}%5d jobs ($n rows)")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/region.parquet").count()

    import org.apache.spark.sql.functions._
    import graft.operators.{Graph, PlanStash}
    import PlanStash.Ckpt

    var edges: DataFrame = null
    time("copurchaseEdges build+ckpt") {
      edges = Graph.copurchaseEdges(spark, d).ckpt(); edges.count()
    }
    var suppAll: DataFrame = null
    time("orientedSupport full pass") {
      suppAll = Graph.orientedSupport(edges).ckpt(); suppAll.count()
    }

    time("peel rounds (delta form)") {
      import graft.operators.PlanStash.Ckpt
      val minSupp = 2L
      val undAll0 = edges
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("c")),
          struct(col("b").as("x"), col("a").as("c")))).as("p"))
        .select(col("p.x").as("x"), col("p.c").as("c"))
        .ckpt()
      var removed = suppAll.filter(col("supp") < minSupp)
        .select(col("a"), col("b"))
        .ckpt()
      var remPrior: DataFrame = null
      var decTot: DataFrame = null
      var rounds = 1
      var nRemoved = removed.count()
      while (nRemoved > 0 && rounds < 64) {
        val t0 = System.nanoTime(); val j0 = jobs.get
        val undPrev =
          if (remPrior == null) undAll0
          else undAll0.join(
            broadcast(remPrior.select(col("a").as("x"), col("b").as("c"))
              .unionByName(remPrior.select(col("b").as("x"), col("a").as("c")))),
            Seq("x", "c"), "left_anti")
        val undF =
          if (nRemoved > 10000) undPrev.ckpt()
          else {
            val ends = removed
              .select(explode(array(col("a"), col("b"))).as("x")).distinct()
            undPrev.join(broadcast(ends), Seq("x"), "left_semi")
          }
        def smallSide(df: DataFrame): DataFrame =
          if (nRemoved <= 10000) broadcast(df) else df
        val tris = undF.select(col("x").as("a"), col("c"))
          .join(smallSide(removed), Seq("a"))
          .filter(col("c") =!= col("b"))
          .join(undF.select(col("x").as("b"), col("c")), Seq("b", "c"), "left_semi")
          .withColumn("x", least(col("a"), col("b"), col("c")))
          .withColumn("z", greatest(col("a"), col("b"), col("c")))
          .withColumn("y", col("a") + col("b") + col("c") - col("x") - col("z"))
          .select(col("x"), col("y"), col("z"))
          .distinct()
        val remNow =
          if (remPrior == null) removed else remPrior.unionByName(removed)
        val dec = tris
          .select(explode(array(
            struct(col("x").as("a"), col("y").as("b")),
            struct(col("x").as("a"), col("z").as("b")),
            struct(col("y").as("a"), col("z").as("b")))).as("e"))
          .groupBy(col("e.a").as("a"), col("e.b").as("b"))
          .agg(count(lit(1)).as("dec"))
          .join(broadcast(remNow), Seq("a", "b"), "left_anti")
          .ckpt()
        decTot = if (decTot == null) dec else decTot.unionByName(dec)
        val freshTot = decTot
          .join(dec.select(col("a"), col("b")), Seq("a", "b"), "left_semi")
          .groupBy(col("a"), col("b")).agg(sum(col("dec")).as("dec"))
        removed = suppAll
          .join(broadcast(freshTot), Seq("a", "b"))
          .filter(col("supp") - col("dec") < minSupp)
          .select(col("a"), col("b"))
          .ckpt()
        remPrior = remNow
        rounds += 1
        nRemoved = removed.count()
        println(f"  round $rounds: removed=$nRemoved  ${(System.nanoTime() - t0) / 1e9}%6.2f s ${jobs.get - j0}%4d jobs")
      }
      val remFinal = if (remPrior == null) removed else remPrior
      val kept0 = suppAll.join(remFinal, Seq("a", "b"), "left_anti")
      val kept =
        if (decTot == null) kept0
        else kept0.join(decTot.groupBy(col("a"), col("b"))
            .agg(sum(col("dec")).as("dec")), Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("supp") - coalesce(col("dec"), lit(0L))).as("supp"))
      kept.count()
    }

    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc dev timing harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
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
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Learn
    import graft.operators.PlanStash.Ckpt

    // ---------- shared pieces (q_hnsw_batch shape) ----------
    val hnswLevelSpark = {
      val hx = (p: Int) =>
        s"(instr('0123456789abcdef', substring(md5(CAST(vec_id AS STRING)), $p, 1)) - 1)"
      val byte0 = s"(${hx(1)} * 16 + ${hx(2)})"
      s"(CASE WHEN $byte0 % 16 = 0 THEN 2 WHEN $byte0 % 4 = 0 THEN 1 ELSE 0 END)"
    }
    def emb0 = Tables.embeddings(spark, d).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), expr(Learn.QuantTok).as("nv"),
        expr(hnswLevelSpark).as("lvl"))
    val d2 = "aggregate(zip_with(nv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    def sym(adj: DataFrame): DataFrame = adj.unionByName(
      adj.select(col("b_id").as("a_id"), col("a_id").as("b_id")))

    def variantA(): DataFrame = { // current shape: per-hop ckpt, union expand
      val H0 = 6; val Ef = 16; val Hu = 2
      val emb = emb0.ckpt()
      val queries = emb.filter(col("vec_id") % 31 === 7)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      val adj0 = sym(Learn.exactKnnL2(spark, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id")))
      def adjUp(l: Int) = sym(graft.operators.SimSearch.hnswUpperAdj(spark, d, l)
        .select(col("a_id"), col("b_id")))
      val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = emb.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      def argminPerQ(sc: DataFrame): DataFrame =
        sc.groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      var cur = argminPerQ(scored(
          queries.select(col("qid")).crossJoin(broadcast(entry))))
        .ckpt()
      for (l <- Seq(2, 1); _ <- 1 to Hu) {
        val cand = adjUp(l)
          .join(cur.select(col("vec_id").as("a_id"), col("qid")), "a_id")
          .select(col("qid"), col("b_id").as("vec_id"))
          .unionByName(cur.select(col("qid"), col("vec_id"))).distinct()
        cur = argminPerQ(scored(cand)).ckpt()
      }
      var beam = cur
      for (_ <- 1 to H0) {
        val cand = adj0
          .join(beam.select(col("vec_id").as("a_id"), col("qid")), "a_id")
          .select(col("qid"), col("b_id").as("vec_id"))
          .unionByName(beam.select(col("qid"), col("vec_id"))).distinct()
        beam = scored(cand)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id"))))
          .filter(col("rn") <= Ef).drop("rn")
          .ckpt()
      }
      val best = argminPerQ(beam)
        .select(col("qid"), col("vec_id").as("found_id"), col("d2q").as("found_d2"))
      val truth = Learn.exactKnnL2(spark, d, 8)
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("b_id") =!= 0)
        .groupBy(col("a_id"))
        .agg(min(struct(col("d2"), col("b_id"))).as("m"))
        .select(col("a_id").as("qid"), col("m.d2").as("true_nn_d2"))
      best.join(truth, "qid")
        .select(col("qid"), col("found_id"), col("found_d2"), col("true_nn_d2"),
          when(col("found_d2") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("qid"))
    }

    def variantB(finalCkpt: Boolean): DataFrame = { // fused: single-read hops, no per-hop ckpt
      val H0 = 6; val Ef = 16; val Hu = 2
      val emb = emb0.ckpt()
      val queries = emb.filter(col("vec_id") % 31 === 7)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      val adj0 = sym(Learn.exactKnnL2(spark, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id"))).ckpt()
      def adjUp(l: Int) = sym(graft.operators.SimSearch.hnswUpperAdj(spark, d, l)
        .select(col("a_id"), col("b_id")))
      val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = emb.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      def argminPerQ(sc: DataFrame): DataFrame =
        sc.groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      // single-read expansion: left-join the beam against the layer
      // graph and explode (self, neighbor) — the beam is read ONCE per
      // hop, so the whole walk stays one linear plan with no per-hop
      // checkpoint and no recompute doubling.
      def expand(beam: DataFrame, adj: DataFrame): DataFrame = beam
        .join(adj.withColumnRenamed("a_id", "vec_id"), Seq("vec_id"), "left")
        .select(col("qid"), explode(array(col("vec_id"), col("b_id"))).as("vec_id"))
        .filter(col("vec_id").isNotNull)
        .distinct()
      var cur = argminPerQ(scored(
          queries.select(col("qid")).crossJoin(broadcast(entry))))
      for (l <- Seq(2, 1); _ <- 1 to Hu) {
        cur = argminPerQ(scored(expand(cur, adjUp(l))))
      }
      var beam = cur
      for (_ <- 1 to H0) {
        beam = scored(expand(beam, adj0))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id"))))
          .filter(col("rn") <= Ef).drop("rn")
      }
      if (finalCkpt) beam = beam.ckpt()
      val best = argminPerQ(beam)
        .select(col("qid"), col("vec_id").as("found_id"), col("d2q").as("found_d2"))
      val truth = Learn.exactKnnL2(spark, d, 8)
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("b_id") =!= 0)
        .groupBy(col("a_id"))
        .agg(min(struct(col("d2"), col("b_id"))).as("m"))
        .select(col("a_id").as("qid"), col("m.d2").as("true_nn_d2"))
      best.join(truth, "qid")
        .select(col("qid"), col("found_id"), col("found_d2"), col("true_nn_d2"),
          when(col("found_d2") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("qid"))
    }

    def variantC(): DataFrame = { // fused + self-loop adj + broadcast beam + 1 exchange/hop
      val H0 = 6; val Ef = 16; val Hu = 2
      val emb = emb0.ckpt()
      val queries = emb.filter(col("vec_id") % 31 === 7)
        .select(col("vec_id").as("qid"), col("nv").as("qv"))
      def scored(cand: DataFrame): DataFrame = cand
        .join(emb.select(col("vec_id"), col("nv")), "vec_id")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("vec_id"),
          when(col("vec_id") === col("qid"), lit(1000000000000L))
            .otherwise(expr(d2)).as("d2q"))
      // self-loop-augmented symmetric adjacency: one INNER broadcast
      // join per hop emits neighbors AND the node itself, so the beam
      // is read once and the join's build side is the page-scale beam
      def withSelf(adj: DataFrame): DataFrame = adj
        .unionByName(adj.select(col("a_id")).distinct()
          .select(col("a_id"), col("a_id").as("b_id")))
      val adj0 = withSelf(sym(Learn.exactKnnL2(spark, d, 8)
        .filter(col("a_id") =!= 0 && col("b_id") =!= 0)
        .select(col("a_id"), col("b_id")))).ckpt()
      val adjUpM = Seq(1, 2).map(l => l -> withSelf(
        sym(graft.operators.SimSearch.hnswUpperAdj(spark, d, l)
          .select(col("a_id"), col("b_id")))).ckpt()).toMap
      def adjUp(l: Int) = adjUpM(l)
      val e2 = emb.filter(col("lvl") >= 2).agg(min(col("vec_id")).as("e2"))
      val e1 = emb.filter(col("lvl") >= 1).agg(min(col("vec_id")).as("e1"))
      val e0 = emb.agg(min(col("vec_id")).as("e0"))
      val entry = e2.crossJoin(broadcast(e1)).crossJoin(broadcast(e0))
        .select(coalesce(col("e2"), col("e1"), col("e0")).as("vec_id"))
      def argminPerQ(sc: DataFrame): DataFrame =
        sc.groupBy(col("qid")).agg(min(struct(col("d2q"), col("vec_id"))).as("m"))
          .select(col("qid"), col("m.vec_id").as("vec_id"), col("m.d2q").as("d2q"))
      def expand(beam: DataFrame, adj: DataFrame): DataFrame = adj
        .join(beam.select(col("vec_id").as("a_id"), col("qid")), "a_id")
        .select(col("qid"), col("b_id").as("vec_id"))
        .distinct()
      var cur = argminPerQ(scored(
          queries.select(col("qid")).crossJoin(broadcast(entry))))
      for (l <- Seq(2, 1); _ <- 1 to Hu) {
        cur = argminPerQ(scored(expand(cur, adjUp(l))))
      }
      var beam = cur
      for (_ <- 1 to H0) {
        beam = scored(expand(beam, adj0))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("d2q"), col("vec_id"))))
          .filter(col("rn") <= Ef).drop("rn")
      }
      val best = argminPerQ(beam)
        .select(col("qid"), col("vec_id").as("found_id"), col("d2q").as("found_d2"))
      val truth = Learn.exactKnnL2(spark, d, 8)
        .join(broadcast(queries.select(col("qid").as("a_id"))), "a_id")
        .filter(col("b_id") =!= 0)
        .groupBy(col("a_id"))
        .agg(min(struct(col("d2"), col("b_id"))).as("m"))
        .select(col("a_id").as("qid"), col("m.d2").as("true_nn_d2"))
      best.join(truth, "qid")
        .select(col("qid"), col("found_id"), col("found_d2"), col("true_nn_d2"),
          when(col("found_d2") === col("true_nn_d2"), 1L).otherwise(0L).as("reached"))
        .orderBy(col("qid"))
    }

    // warm the memoized indexes once so variants compare serve cost only
    time("warm: knn8 + upper layers") {
      Learn.exactKnnL2(spark, d, 8).count() +
        graft.operators.SimSearch.hnswUpperAdj(spark, d, 1).count() +
        graft.operators.SimSearch.hnswUpperAdj(spark, d, 2).count()
    }
    time("A current (per-hop ckpt)") { variantA().count() }
    time("A again") { variantA().count() }
    time("B fused (no ckpt)") { variantB(false).count() }
    time("B again") { variantB(false).count() }
    time("B fused + final ckpt") { variantB(true).count() }
    time("C selfloop+bcast") { variantC().count() }
    time("C again") { variantC().count() }
    time("C 3rd") { variantC().count() }
    // result identity check
    val a = variantA().collect().map(_.toString).sorted
    val b = variantB(false).collect().map(_.toString).sorted
    val c = variantC().collect().map(_.toString).sorted
    println(s"identical B: ${a.sameElements(b)}  C: ${a.sameElements(c)}  (${a.length} rows)")
    spark.stop()
  }
}

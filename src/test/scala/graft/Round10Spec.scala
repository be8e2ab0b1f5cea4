package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-10 pins: the oriented k-truss fixpoint (convergence inside
  * both the runaway backstop and the oracle's unrolled depth, plus a
  * naive whole-graph support replay), the oriented local-clustering
  * rewrite, the fixed-size closeness landmark panel, and the
  * edge_credits generator's exact emission.
  */
class Round10Spec extends SparkSpec {

  test("edge_credits emits canonical per-edge triangle credits") {
    graft.functions.VectorFunctions.register(spark)
    val rows = spark.sql(
      """SELECT explode(edge_credits(CAST(5 AS BIGINT), CAST(2 AS BIGINT),
        |  array(CAST(7 AS BIGINT), CAST(9 AS BIGINT)))) AS cr""".stripMargin)
      .select("cr.a", "cr.b", "cr.n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(
      (2L, 5L, 2L),          // base edge, |common| triangles
      (5L, 7L, 1L), (2L, 7L, 1L),  // triangle closed by 7
      (5L, 9L, 1L), (2L, 9L, 1L))) // triangle closed by 9
    // empty common: just the zero-support base edge row
    val z = spark.sql(
      """SELECT explode(edge_credits(CAST(3 AS BIGINT), CAST(8 AS BIGINT),
        |  CAST(array() AS ARRAY<BIGINT>)))""".stripMargin).collect()
    assert(z.length === 1)
  }

  test("q_ktruss peel converges to a true fixpoint well inside the bounds") {
    val edges = Graph.copurchaseEdges(spark, sf).localCheckpoint()
    val (supp, rounds) = Graph.trussSupportFixpoint(edges, minSupp = 2)
    // inside the oracle's unrolled depth (6) and the runaway cap (64)
    assert(rounds < 6, s"fixture took $rounds peel rounds; oracle unrolls 6")
    // fixpoint: one more support pass over the surviving edges removes nothing
    val again = Graph.orientedSupport(supp.select(col("a"), col("b")))
      .filter(col("supp") >= 2)
    assert(again.count() === supp.count())
  }

  test("oriented support equals the naive whole-graph triangle support") {
    val edges = Graph.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naive = edges.map { case (a, b) =>
      (a, b) -> (nbrs(a) & nbrs(b)).size.toLong
    }.toMap
    val got = Graph.orientedSupport(
        Graph.copurchaseEdges(spark, sf).localCheckpoint())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (e, s) =>
      assert(naive.getOrElse(e, -1L) === s, s"edge $e: oriented $s vs naive")
    }
    // every edge with support > 0 must be present in the oriented output
    naive.filter(_._2 > 0).foreach { case (e, s) =>
      assert(got.getOrElse(e, 0L) === s, s"edge $e missing from oriented output")
    }
  }

  test("q_local_cc replays naively from the collected edge set") {
    val edges = Graph.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = Graph.queries("q_local_cc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("node_id")
      val deg = nbrs(v).size.toLong
      val tri2 = nbrs(v).toSeq.map(w => (nbrs(v) & nbrs(w)).size.toLong).sum
      assert(r.getAs[Long]("deg") === deg, s"node $v deg")
      assert(r.getAs[Long]("tri2") === tri2, s"node $v tri2")
      assert(r.getAs[Long]("cc_micro") === tri2 * 1000000L / (deg * (deg - 1)))
    }
  }

  test("q_closeness: landmark panel is a fixed-size hash-rank top-32") {
    val rows = Graph.queries("q_closeness")(spark, sf).collect()
    assert(rows.nonEmpty)
    // no node can be reached from more landmarks than the panel holds
    assert(rows.map(_.getAs[Long]("n_landmarks")).max <= 32L)
    // replay the panel selection naively and the 3-hop tagged BFS from
    // it; every (n_landmarks, harm_micro) pair must match exactly
    val edges = Graph.tradeBase(spark, sf)
      .collect().flatMap(r => Seq(
        r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val panel = nodes.toSeq
      .sortBy(v => ((v * 2654435761L) % 1000003L, v)).take(32)
    assert(panel.size === 32)
    val harm = collection.mutable.Map.empty[Long, (Long, Long)]
    panel.foreach { lm =>
      var dist = Map(lm -> 0L)
      (1 to 3).foreach { _ =>
        val relax = dist.toSeq.flatMap { case (u, du) =>
          adj(u).toSeq.map(_ -> (du + 1)) :+ (u -> du)
        }
        dist = relax.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      }
      dist.foreach { case (v, dv) =>
        if (dv > 0) {
          val (c, h) = harm.getOrElse(v, (0L, 0L))
          harm(v) = (c + 1, h + 1000000L / dv)
        }
      }
    }
    rows.foreach { r =>
      val v = r.getAs[Long]("node_id")
      assert(harm(v) ===
        (r.getAs[Long]("n_landmarks"), r.getAs[Long]("harm_micro")), s"node $v")
    }
  }

  test("jaro_winkler('x','x') scores 1.0 after the window clamp") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('x', 'x')").collect()(0).getDouble(0)
    assert(r === 1.0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Learn, Pipeline}

/** Invariants for the graph/learning operators that the DuckDB hash
  * compare can't express: PageRank mass accounting, k-means inertia
  * monotonicity, classifier score reproduction against an independent
  * Scala computation, z-value bijectivity, dense row ids.
  */
class GraphLearnSpec extends SparkSpec {

  test("q_pagerank: rank mass is bounded and every node keeps the base rank") {
    val rows = Graph.queries("q_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getLong(2)).sum
    // Each iteration: Σ rank' = 0.15·n·1e6 + (≤ 0.85·Σ rank) — truncating
    // division only loses mass, so total stays ≤ n·1e6 and every node
    // retains at least the damping base.
    assert(rows.forall(_.getLong(2) >= 150000L), "node below base rank")
    assert(total <= n * 1000000L, s"rank mass grew: $total > ${n * 1000000L}")
    assert(total >= n * 150000L)
    val kinds = rows.map(_.getString(1)).toSet
    assert(kinds == Set("customer", "supplier"))
  }

  test("q_kmeans_fit: inertia is monotone non-increasing across Lloyd iterations") {
    def inertia(iters: Int): Long =
      Learn.fitKMeans(spark, sf, iters)._2
        .agg(sum(col("qdist"))).collect()(0).getLong(0)
    val i0 = inertia(0); val i1 = inertia(1); val i2 = inertia(2)
    assert(i1 <= i0, s"iteration 1 raised inertia: $i1 > $i0")
    assert(i2 <= i1, s"iteration 2 raised inertia: $i2 > $i1")
  }

  test("q_kmeans_fit: every assignment is the argmin over the trained centroids") {
    val (cents, assigned) = Learn.fitKMeans(spark, sf, 2)
    val rows = assigned.select(col("qv"), col("cluster"), col("qdist")).collect()
    rows.foreach { r =>
      val qv = r.getSeq[Long](0).toArray
      val dists = cents.map { case (cid, cv) =>
        (cid, qv.indices.map(j => { val d = qv(j) - cv(j); d * d }).sum)
      }
      val best = dists.minBy { case (cid, d) => (d, cid) }
      assert(best._1 == r.getInt(1) && best._2 == r.getLong(2))
    }
  }

  test("q_pq_codes: every subspace code is the argmin over its trained codebook") {
    val (books, codes) = Learn.fitPq(spark, sf, 1)
    val rows = codes.collect()
    val sub = 16
    rows.foreach { r =>
      val qv = r.getSeq[Long](r.fieldIndex("qv")).toArray
      books.indices.foreach { i =>
        val slice = qv.slice(i * sub, (i + 1) * sub)
        val dists = books(i).map { case (cid, cv) =>
          (cid, slice.indices.map(j => { val x = slice(j) - cv(j); x * x }).sum)
        }
        val best = dists.minBy { case (cid, dd) => (dd, cid) }
        assert(best._1 == r.getInt(r.fieldIndex(s"c$i")), s"vec ${r.getLong(0)} sub $i")
        assert(best._2 == r.getLong(r.fieldIndex(s"d$i")), s"vec ${r.getLong(0)} sub $i dist")
      }
    }
  }

  test("q_classifier_score: scores match an independent driver-side computation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(20).collect()
    val got = Learn.queries("q_classifier_score")(spark, sf)
      .select(col("doc_id"), col("score_milli"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16)
    }
    docs.foreach { r =>
      val expected = r.getString(1).split(" ", -1).map { t =>
        val b = bucket(t).toLong
        ((b * 2654435761L) % 1000003L) % 2001L - 1000L
      }.sum
      assert(got(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("q_zorder: the Morton key is bijective and de-interleaves to the input keys") {
    val rows = Pipeline.queries("q_zorder")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).distinct.length == rows.length, "zval collision")
    rows.take(100).foreach { r =>
      val z = r.getLong(2)
      var x = 0L; var y = 0L
      (0 until 16).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(x == r.getLong(0) && y == r.getLong(1), s"z=$z")
    }
  }

  test("q_rowid: ids are dense 0..N-1 in doc_id order") {
    val rows = Pipeline.queries("q_rowid")(spark, sf)
      .select(col("doc_id"), col("row_id")).collect()
    assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sortBy(identity).toSeq)
  }
}

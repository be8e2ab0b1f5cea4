package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub is deterministic: same bytes, same metadata") {
    val a = Multimodal.decoded(spark, sf).orderBy("doc_id").collect().toSeq
    val b = Multimodal.decoded(spark, sf).orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("decoded metadata matches payload arithmetic") {
    val rows = Multimodal.decoded(spark, sf).collect()
    rows.foreach { m =>
      assert(m.width === (m.n_bytes % 512 + 1).toInt)
      assert(m.height === (m.n_bytes % 384 + 1).toInt)
      assert(m.format === (if (m.n_bytes % 2 == 0) "png" else "jpeg"))
    }
  }

  test("binary payload round-trips document bytes") {
    val n = Multimodal.mediaTable(spark, sf)
      .filter($"payload".isNotNull).count()
    val docs = Tables.documents(spark, sf).count()
    assert(n === docs)
  }

  test("q_media_agg groups cover every document exactly once") {
    val agg = Multimodal.queries("q_media_agg")(spark, sf)
    val total = agg.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(total === Tables.documents(spark, sf).count())
  }

  test("q_media_phash: every one-byte-edited twin is found near its source") {
    val pairs = Multimodal.queries("q_media_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val mirrorIds = Tables.documents(spark, sf).select($"doc_id")
      .filter($"doc_id" % 6 === 0).as[Long].collect()
    assert(mirrorIds.nonEmpty)
    mirrorIds.foreach { id =>
      // the edit shifts the global byte total too, so several
      // threshold-marginal bits can flip — the guarantee is detection
      // within the hamming-3 pigeonhole, not hamming ≤ 1
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000000L)
      assert(hit.isDefined, s"edited twin of doc $id not recovered by blocked pHash join")
    }
    // symmetric sanity: every reported pair is a < b and within threshold
    assert(pairs.forall(p => p._1 < p._2 && p._3 <= 3))
  }

  test("q_media_cluster: labels are the transitive closure of the pHash pairs") {
    import spark.implicits._
    val pairs = Multimodal.queries("q_media_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Multimodal.queries("q_media_cluster")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = labels.map(l => l._1 -> l._2).toMap
    // every pair's endpoints share a cluster; label = min member
    pairs.foreach { case (a, b) =>
      assert(byId(a) == byId(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label is not its min member")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid,
        s"cluster $cid canonical flag wrong")
    }
    // a driver-side union-find over the pairs yields the same partition
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    labels.foreach { case (id, cid, _) =>
      val expected = if (parent.contains(id) || pairs.exists(p => p._1 == id || p._2 == id))
        find(id) else id
      assert(cid == expected, s"doc $id label $cid != union-find $expected")
    }
  }
}

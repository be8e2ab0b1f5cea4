package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One tombstone id for the streaming HNSW-delete feed. The
  * streaming IVF-maintenance feed reuses Round14Spec's ArrVec. */
case class TombId(vec_id: Long)

/** Round-15 pins: TtlMemo builds must not serialize across keys
  * (lazy-cell installs instead of compute-under-bin-lock), plus the
  * round's lifecycle additions as they land.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("TtlMemo: a slow build of one key never blocks another key's resolve") {
    // r14 ADVICE: the compute()-based resolve held a ConcurrentHashMap
    // bin lock for the build's duration, so two UNRELATED keys hashing
    // into one bin serialized a seconds-long retrain behind another.
    // The lazy-cell form runs builds under per-key monitors only; this
    // pins it by holding key A's build open on a latch while key B
    // resolves to completion on another thread.
    val memo = new graft.operators.TtlMemo[Int](ttlMillis = 60000)
    val aEntered = new CountDownLatch(1)
    val aRelease = new CountDownLatch(1)
    val slow = new Thread(() =>
      memo.resolve("keyA") { aEntered.countDown(); aRelease.await(); 1 })
    slow.setDaemon(true)
    slow.start()
    assert(aEntered.await(10, TimeUnit.SECONDS), "build A never started")
    // with A's build still in flight, B must resolve promptly
    val bDone = new CountDownLatch(1)
    @volatile var bResult = -1
    val other = new Thread(() => { bResult = memo.resolve("keyB")(2); bDone.countDown() })
    other.setDaemon(true)
    other.start()
    assert(bDone.await(10, TimeUnit.SECONDS),
      "resolve of keyB blocked behind keyA's in-flight build")
    assert(bResult == 2)
    aRelease.countDown()
    slow.join(10000)
    assert(memo.resolve("keyA")(99) == 1, "A's build result must be memoized")
    assert(memo.buildCount == 2)
  }

  test("TtlMemo: same-key concurrency still sees exactly one build; put() pre-populates without a builder run") {
    val memo = new graft.operators.TtlMemo[Int](ttlMillis = 60000)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var r1 = -1
    @volatile var r2 = -1
    val t1 = new Thread(() => r1 = memo.resolve("k") { entered.countDown(); release.await(); 7 })
    t1.setDaemon(true); t1.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    val t2 = new Thread(() => r2 = memo.resolve("k")(8))
    t2.setDaemon(true); t2.start()
    Thread.sleep(200) // t2 must be parked on the same cell, not building
    assert(memo.buildCount == 1, "second resolve of the same key started a second build")
    release.countDown()
    t1.join(10000); t2.join(10000)
    assert(r1 == 7 && r2 == 7, s"both resolvers must see the one build: $r1, $r2")
    memo.put("pre", 42)
    assert(memo.resolve("pre")(0) == 42, "put() value must serve")
    assert(memo.buildCount == 1, "put() must not count as a builder run")
  }

  test("IndexStore: a fresh session serves the HNSW lifecycle bit-for-bit from the loaded index, zero rebuilds") {
    val L = graft.operators.Learn
    val S = graft.operators.SimSearch
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    def page(s: org.apache.spark.sql.SparkSession, q: String): Seq[String] =
      SparkEntry.queries(q)(s, sf).collect().map(_.toString).sorted.toSeq
    val builtBatch = page(spark, "q_hnsw_batch")
    val builtInsert = page(spark, "q_hnsw_insert")
    val manifest = graft.operators.IndexStore.save(spark, sf, dir).collect()
    assert(manifest.length == 9, s"manifest must cover all 9 components: ${manifest.length}")
    // a FRESH session (new memo-key identity — the restart stand-in):
    // load must install every component under its keys so the
    // lifecycle queries serve with ZERO index rebuilds
    val s2 = spark.newSession()
    graft.operators.IndexStore.load(s2, sf, dir)
    val knn0 = L.knnCache.buildCount
    val emb0 = S.hnswEmbCache.buildCount
    val cb0 = L.coarseMemo.buildCount
    val loadedBatch = page(s2, "q_hnsw_batch")
    val loadedInsert = page(s2, "q_hnsw_insert")
    assert(loadedBatch == builtBatch, "q_hnsw_batch drifted between built and loaded index")
    assert(loadedInsert == builtInsert, "q_hnsw_insert drifted between built and loaded index")
    assert(L.knnCache.buildCount == knn0,
      "fresh session rebuilt a kNN/layer-graph component despite the loaded store")
    assert(S.hnswEmbCache.buildCount == emb0,
      "fresh session rebuilt the insert-side vector frame despite the loaded store")
    val cents2 = L.coarseCentroids(s2, sf)
    assert(L.coarseMemo.buildCount == cb0, "fresh session retrained the loaded codebook")
    assert(cents2.map { case (c, v) => (c, v.toSeq) } ==
      L.coarseCentroids(spark, sf).map { case (c, v) => (c, v.toSeq) },
      "loaded codebook drifted from the trained one")
  }

  test("IndexStore: load fails fast on a foreign format version and on a torn manifest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_v").toString
    graft.operators.IndexStore.save(spark, sf, dir)
    val rows = spark.read.parquet(s"$dir/manifest").collect()
      .map(r => (r.getAs[String]("component"), r.getAs[Long]("n_rows"), r.getAs[Long]("version")))
    // foreign version → refuse
    rows.map { case (c, n, v) => (c, n, v + 1) }.toSeq
      .toDF("component", "n_rows", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    intercept[IllegalStateException] {
      graft.operators.IndexStore.load(spark.newSession(), sf, dir)
    }
    // torn store (manifest missing a component) -> refuse
    rows.filterNot(_._1 == "knn8").map { case (c, n, _) => (c, n, graft.operators.IndexStore.FormatVersion) }
      .toSeq.toDF("component", "n_rows", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    intercept[IllegalStateException] {
      graft.operators.IndexStore.load(spark.newSession(), sf, dir)
    }
  }

  test("q_hnsw_compact: shared panel, exactness floor, and repair quality non-improving with delete mass") {
    val rows = SparkEntry.queries("q_hnsw_compact")(spark, sf).collect()
    assert(rows.length == 3, s"one row per fraction: ${rows.length}")
    assert(rows.map(_.getAs[Long]("tomb_mod")).toSet == Set(29L, 7L, 3L))
    val nq = rows.map(_.getAs[Long]("n_queries")).distinct
    assert(nq.length == 1 && nq.head >= 1, "the SAME survivor panel must ride every fraction")
    rows.foreach { r =>
      val reached = r.getAs[Long]("n_reached")
      assert(reached >= 0 && reached <= r.getAs[Long]("n_queries"), s"bad reach count: $r")
      // exactness floor: the beam returns a survivor, and truth is the
      // exact survivor-NN — found can never beat it
      assert(r.getAs[Long]("regret_d2_sum") >= 0, s"negative regret: $r")
      assert(r.getAs[Long]("recall_milli") == reached * 1000 / r.getAs[Long]("n_queries"), s"recall arithmetic drifted: $r")
      assert(r.getAs[Long]("n_affected") >= 1, s"fraction with no affected survivors: $r")
    }
    // rows are ordered by delete mass; local repair can only lose
    // ground as the graph sheds more of itself (regret is NOT
    // cross-fraction comparable — the truth itself moves with the
    // survivor set — so recall is the monotone axis)
    assert(rows.head.getAs[Long]("n_tomb") < rows.last.getAs[Long]("n_tomb"))
    assert(rows.head.getAs[Long]("recall_milli") >= rows.last.getAs[Long]("recall_milli"),
      "recall under the smallest delete fraction fell below the largest")
  }

  test("hnswDeleteStream: a two-batch tombstone feed converges to the batch repair page bit-for-bit") {
    val tombs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0 && col("vec_id") % 29 === 3)
      .select(col("vec_id")).collect().map(r => TombId(r.getLong(0)))
    assert(tombs.length >= 2, "fixture must hold at least two tombstones")
    val (b1, b2) = tombs.splitAt(tombs.length / 2)
    val input = MemoryStream[TombId](spark)
    val pages = scala.collection.mutable.ArrayBuffer[Array[org.apache.spark.sql.Row]]()
    val q = graft.streaming.VecStreams.hnswDeleteStream(input.toDF(), sf) { page =>
      pages += page.collect()
    }
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(pages.length >= 2, s"expected one page per trigger, got ${pages.length}")
    assert(pages.head.nonEmpty,
      "the first trigger's tombstones must already affect some survivor")
    // REPLACE semantics: the final page (cumulative tombstones) must
    // equal the one-shot batch output for the same total set
    def key(r: org.apache.spark.sql.Row) = r.toString
    val streamed = pages.last.map(key).sorted.toSeq
    val batch = SparkEntry.queries("q_hnsw_delete")(spark, sf).collect().map(key).sorted.toSeq
    assert(streamed == batch,
      s"final streamed page drifted from the batch page (${streamed.size} vs ${batch.size} rows)")
    // and an intermediate page never names a later tombstone as a
    // survivor (a_id repaired in trigger 1, deleted in trigger 2, must
    // vanish from the final page — the tombstone-wins contract)
    val t2 = b2.map(_.vec_id).toSet
    val finalIds = pages.last.map(_.getAs[Long]("a_id")).toSet
    assert(finalIds.intersect(t2).isEmpty, "a deleted node survived in the final repair page")
  }

  test("q_hnsw_lifecycle: composed insert+delete+search page is exact-bounded and meets the delete-only floor") {
    val rows = SparkEntry.queries("q_hnsw_lifecycle")(spark, sf).collect()
    assert(rows.nonEmpty, "empty lifecycle page")
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid"); val fid = r.getAs[Long]("found_id")
      val fd2 = r.getAs[Long]("found_d2"); val td2 = r.getAs[Long]("true_nn_d2")
      // panel members and served neighbors are SURVIVORS of the
      // composed graph: never a tombstone (mod-29), never self
      assert(qid % 31 == 7 && qid % 29 != 3, s"non-panel qid: $r")
      assert(fid % 29 != 3 && fid != qid, s"served neighbor not a surviving non-self member: $r")
      // the beam walks real members, so it can never beat the exact NN
      assert(fd2 >= td2, s"found beat the exact survivor-NN: $r")
      assert((r.getAs[Long]("reached") == 1L) == (fd2 == td2), s"reached flag drifted: $r")
    }
    // the composition property, measured: the post-insert post-delete
    // graph at the batch operating point (ef=16, arrival links wired
    // in) must serve AT LEAST as well as q_hnsw_compact's mod-29
    // branch — the delete-only repaired flat graph at ef=8 over the
    // same tombstone set. (Floor, not parity: the panels differ by the
    // compact query's all-fraction survivor constraint.)
    val recallMilli = rows.map(_.getAs[Long]("reached")).sum * 1000 / rows.length
    val floor = SparkEntry.queries("q_hnsw_compact")(spark, sf).collect()
      .find(_.getAs[Long]("tomb_mod") == 29L).get.getAs[Long]("recall_milli")
    assert(recallMilli >= floor,
      s"lifecycle page recall ${recallMilli}m fell below the delete-only floor ${floor}m")
  }

  test("q_ivf_maintain: mass conservation, cohort-split distortion, and arrival-driven drift") {
    val rows = SparkEntry.queries("q_ivf_maintain")(spark, sf).collect()
    assert(rows.nonEmpty, "empty maintenance page")
    val corpus = Tables.embeddings(spark, sf).count()
    val arrivals = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 23 === 11).count()
    // every vector routes to exactly one cell — the page partitions
    // the corpus (existing members AND arrivals)
    assert(rows.map(r => r.getAs[Long]("n_before") + r.getAs[Long]("n_added")).sum == corpus,
      "cells must partition the full corpus")
    assert(rows.map(_.getAs[Long]("n_added")).sum == arrivals,
      "arrival mass must land somewhere")
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_before"); val na = r.getAs[Long]("n_added")
      val db = r.getAs[Long]("dist_before"); val da = r.getAs[Long]("dist_after")
      // dist_after folds the arrival cohort in: it can only grow, and
      // a cell no arrival touched must be byte-stable
      assert(da >= db, s"distortion shrank with extra members: $r")
      assert(na > 0 || da == db, s"untouched cell's distortion moved: $r")
      assert(r.getAs[Long]("added_milli") == na * 1000 / (nb + na), s"share arithmetic drifted: $r")
      assert(r.getAs[Long]("drift_d2") >= 0, s"negative drift: $r")
    }
    // the stale codebook is ONE Lloyd round from init — a
    // re-estimation round must still be moving some centroid
    // (convergence after one round would make the page vacuous)
    assert(rows.exists(_.getAs[Long]("drift_d2") > 0), "no centroid drift anywhere")
  }

  test("ivfMaintainStream: a two-batch arrival feed converges to the batch maintenance page bit-for-bit") {
    val arrivals = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 23 === 11)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => ArrVec(r.getLong(0), r.getSeq[Float](1)))
    assert(arrivals.length >= 2, "fixture must hold at least two arrivals")
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    val input = MemoryStream[ArrVec](spark)
    val pages = scala.collection.mutable.ArrayBuffer[Array[org.apache.spark.sql.Row]]()
    val q = graft.streaming.VecStreams.ivfMaintainStream(input.toDF(), sf) { page =>
      pages += page.collect()
    }
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(pages.length >= 2, s"expected one page per trigger, got ${pages.length}")
    // REPLACE semantics: every trigger's page is the exact batch page
    // for the arrivals seen so far — the intermediate page must
    // already conserve (existing + first-half) mass...
    val corpusOld = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 23 =!= 11).count()
    val mid = pages.head
    assert(mid.map(r => r.getAs[Long]("n_before") + r.getAs[Long]("n_added")).sum
        == corpusOld + b1.length,
      "intermediate page must partition existing members + first-half arrivals")
    // ...and the final page equals the one-shot q_ivf_maintain output
    def key(r: org.apache.spark.sql.Row) = r.toString
    val streamed = pages.last.map(key).sorted.toSeq
    val batch = SparkEntry.queries("q_ivf_maintain")(spark, sf).collect().map(key).sorted.toSeq
    assert(streamed == batch,
      s"final streamed page drifted from the batch page (${streamed.size} vs ${batch.size} rows)")
  }

  test("q_ivf_stale_recall: both arms cover the full arrival panel at subquadratic candidate mass") {
    val rows = SparkEntry.queries("q_ivf_stale_recall")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("codebook")).toSet == Set("stale", "refit"))
    val corpus = Tables.embeddings(spark, sf).count()
    val arrivals = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 23 === 11).count()
    rows.foreach { r =>
      val nq = r.getAs[Long]("n_queries"); val nr = r.getAs[Long]("n_reached")
      assert(nq == arrivals, s"panel must be the full arrival batch: $r")
      assert(nr >= 0 && nr <= nq, s"reach count out of range: $r")
      assert(r.getAs[Long]("recall_milli") == nr * 1000 / nq, s"recall arithmetic drifted: $r")
      // the whole point of the probe: each arm scans a strict subset
      // of the brute-force panel × corpus mass (nprobe = 2 of K cells)
      val cand = r.getAs[Long]("cand_rows")
      assert(cand > 0, s"an arm produced no candidates: $r")
      assert(cand < nq * (corpus - 1),
        s"candidate mass reached brute-force scale — the probe is not pruning: $r")
    }
    // NOTE deliberately NOT pinned: which arm wins. Measured both ways
    // across fixtures (sf0.001: refit 409m > stale 272m; sf0.01:
    // stale 454m > refit 409m) — recall at a fixed probe budget is
    // not monotone in distortion, which is exactly why the page
    // exists: the refit decision needs this measurement, not the
    // drift number alone.
  }
}

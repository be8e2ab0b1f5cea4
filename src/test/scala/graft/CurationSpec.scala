package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Semantic invariants of the span-grain curation bank (the oracle
  * gate pins exact values; these pin the properties that make the
  * operators correct as pipeline stages at any scale).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("q_chunk: coverage, overlap, and bounds") {
    val chunks = Curation.queries("q_chunk")(spark, sf)
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens", $"chunk_text").collect()
    assert(chunks.nonEmpty)
    // every chunk is ≤32 tokens and non-empty
    assert(chunks.forall { r =>
      val n = r.getLong(2)
      n >= 1 && n <= 32 && r.getString(3).split(" ", -1).length == n
    })
    // consecutive full chunks overlap by exactly 32-24 = 8 tokens
    val byDoc = chunks.groupBy(_.getLong(0))
    byDoc.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getLong(2) == 32 =>
          val at = a.getString(3).split(" ", -1)
          val bt = b.getString(3).split(" ", -1)
          assert(at.drop(24).sameElements(bt.take(8)),
            s"chunks ${a.getLong(1)}/${b.getLong(1)} of doc ${a.getLong(0)} must overlap by 8 tokens")
        case _ => ()
      }
    }
    // full token coverage: stride-aligned prefixes reassemble the doc
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      val rebuilt = sorted.flatMap(_.getString(3).split(" ", -1).take(24)) ++
        sorted.last.getString(3).split(" ", -1).drop(24)
      assert(rebuilt.mkString(" ") == texts(id), s"doc $id: chunks must cover the full text")
    }
  }

  test("q_passage_dup_stats: quote twins fully duplicated, sources clean") {
    val stats = Curation.queries("q_passage_dup_stats")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val quoteIds = stats.keySet.filter(_ >= 1000000L)
    assert(quoteIds.nonEmpty)
    quoteIds.foreach { q =>
      val (n, dup) = stats(q)
      assert(n == dup, s"quote twin $q: all $n passages must be flagged dup (got $dup)")
      // and its source doc contributed the canonical copies
      val (_, srcDup) = stats(q - 1000000L)
      assert(srcDup == 0 || srcDup < stats(q - 1000000L)._1,
        s"source ${q - 1000000L} must keep its canonical passages")
    }
  }

  test("q_semantic_dedup: same-cell mirrors always dropped, kept set is maximal-prefix-free") {
    graft.functions.VectorFunctions.register(spark)
    val kept = operators.Curation.queries("q_semantic_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mirrors = kept.keySet.filter(_ >= 1000000L)
    // recompute every vector's cell through the same plan arithmetic
    val cents = Tables.embeddings(spark, sf).filter($"vec_id" < 16).orderBy("vec_id")
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(v => s"${v}D").mkString("array(", ",", ")"))
    val base = Tables.embeddings(spark, sf)
    val all = base.selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .unionByName(base.filter($"vec_id" % 5 === 0)
        .selectExpr("vec_id + 1000000 AS vec_id",
          "transform(embedding, x -> cast(x as double) + 0.01) AS e"))
    val cells = all
      .withColumn("cosc", array(cents.map(c => expr(s"cosine_sim(e, $c)")): _*))
      .selectExpr("vec_id", "cast(array_position(cosc, array_max(cosc)) as int) - 1 AS cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sameCellMirrors = cells.keySet.filter(id =>
      id >= 1000000L && cells(id) == cells(id - 1000000L))
    assert(sameCellMirrors.nonEmpty, "fixture must produce same-cell near-dup mirrors")
    // a mirror in its source's cell has cos≈1 to a lower id → must be dropped
    assert(sameCellMirrors.forall(id => !kept.contains(id)),
      "every same-cell mirror must be semantically deduplicated")
    assert(mirrors.forall(id => cells(id) != cells(id - 1000000L)),
      "a surviving mirror can only survive by landing in a different cell")
  }

  test("boundedCellPairs: a hot cell enumerates O(|cell|·W) candidates, never O(|cell|²)") {
    // Worst case for a fixed codebook: EVERY vector lands in one cell.
    val n = 400
    val w = 8
    val hot = spark.range(n)
      .selectExpr("id AS vec_id", "array(cast(id as double)) AS e", "0 AS cell")
    val pairs = operators.Curation.boundedCellPairs(hot, w)
    // exact candidate census: row at rank r sees min(r-1, w) mates, so
    // Σ = w·n − w(w+1)/2 — linear in n; the naive self-join emits
    // n(n−1)/2 (79800 here vs 3164).
    val expected = w.toLong * n - w.toLong * (w + 1) / 2
    assert(pairs.count() === expected,
      s"hot cell must emit exactly $expected bounded candidates")
    // every pair respects keep-first order and the distance cap
    assert(pairs.filter($"b_rnk" >= $"rnk" || $"rnk" - $"b_rnk" > w).isEmpty)
    // and the pairing stays an equi-join — the pigeonhole must not
    // degrade to a cartesian/nested-loop plan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "bounded pairing must join on (cell, block) keys:\n" + plan.take(2000))
    // fixture cells sit below the production cap, so q_semantic_dedup at
    // this SF equals the uncapped algorithm (recompute cell populations
    // through the same plan arithmetic as the query)
    graft.functions.VectorFunctions.register(spark)
    val cents = Tables.embeddings(spark, sf).filter($"vec_id" < 16).orderBy("vec_id")
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(v => s"${v}D").mkString("array(", ",", ")"))
    val base = Tables.embeddings(spark, sf)
    val all = base.selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .unionByName(base.filter($"vec_id" % 5 === 0)
        .selectExpr("vec_id + 1000000 AS vec_id",
          "transform(embedding, x -> cast(x as double) + 0.01) AS e"))
    val maxCell = all
      .withColumn("cosc", array(cents.map(c => expr(s"cosine_sim(e, $c)")): _*))
      .selectExpr("cast(array_position(cosc, array_max(cosc)) as int) - 1 AS cell")
      .groupBy($"cell").count().agg(max($"count")).collect().head.getLong(0)
    assert(maxCell < operators.Curation.SemW,
      s"largest fixture cell ($maxCell) must sit under SemW=${operators.Curation.SemW}")
  }

  test("q_dsir_weight: target-language docs score higher, repeatable") {
    val w = operators.Curation.queries("q_dsir_weight")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w2 = operators.Curation.queries("q_dsir_weight")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == w2, "importance weights must be bit-identical across runs")
    val langs = docs.select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def mean(ids: Iterable[Long]) = ids.map(w).sum / ids.size
    val en = langs.collect { case (id, "en") => id }
    val other = langs.collect { case (id, l) if l != "en" => id }
    assert(en.nonEmpty && other.nonEmpty)
    assert(mean(en) > mean(other),
      s"en docs must have higher importance weight (en=${mean(en)}, other=${mean(other)})")
  }

  test("q_boilerplate: threshold-3 spans flagged everywhere, pairs spared") {
    val b = operators.Curation.queries("q_boilerplate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ids = docs.select($"doc_id").collect().map(_.getLong(0))
    // every 8th doc's opening passage reaches frequency 3 → flagged in
    // the SOURCE doc too (boilerplate kills first occurrences)
    ids.filter(_ % 8 == 0).foreach { id =>
      assert(b(id) >= 1, s"doc $id: opening passage at freq 3 must be flagged")
    }
    // a doc quoted only once (freq 2) contributes no boilerplate by itself
    val pairOnly = ids.filter(id => id % 4 == 0 && id % 8 != 0)
    assert(pairOnly.exists(id => b(id) == 0),
      "freq-2 spans alone must not trip the ≥3 boilerplate threshold")
  }

  test("q_compress_ratio: bounds, repetition monotonicity, determinism") {
    graft.functions.VectorFunctions.register(spark)
    val rows = operators.Curation.queries("q_compress_ratio")(spark, sf).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio > 0 && ratio < 1.5, s"doc ${r.getLong(0)}: ratio $ratio out of bounds")
      assert(r.getLong(2) > 0, "deflate of non-empty text is non-empty")
    }
    // repetitive text compresses harder than distinct text of equal length
    val probe = spark.sql(
      "SELECT deflate_len(repeat('spark ', 200)) AS rep, " +
        "deflate_len(concat_ws(' ', transform(sequence(1, 200), i -> concat('w', cast(i * 7919 as string))))) AS dis")
      .collect().head
    assert(probe.getInt(0) < probe.getInt(1),
      s"repetitive text must compress smaller (rep=${probe.getInt(0)}, dis=${probe.getInt(1)})")
    // deterministic across evaluations, NULL-safe
    val again = operators.Curation.queries("q_compress_ratio")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sameElements(again.map(_.getLong(2))))
    assert(spark.sql("SELECT deflate_len(CAST(NULL AS STRING)) IS NULL AS ok").collect().head.getBoolean(0))
  }

  test("q_doc_reconstruct: twins vanish, clean docs reconstruct verbatim") {
    val rec = Curation.queries("q_doc_reconstruct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!rec.keySet.exists(_ >= 1000000L),
      "fully-duplicated quote twins must disappear")
    // docs with zero duplicated passages reconstruct to their exact text
    val stats = Curation.queries("q_passage_dup_stats")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clean = stats.filter { case (id, dup) => dup == 0L && id < 1000000L }.keySet
    assert(clean.nonEmpty)
    clean.foreach { id =>
      assert(rec(id) == texts(id), s"doc $id had no dup passages; must reconstruct verbatim")
    }
  }

  test("q_span_mask: sentinel lands exactly on the arithmetic schedule, text otherwise verbatim") {
    val rows = Curation.queries("q_span_mask")(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, nTok, nMasked) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val orig = texts(id).split(" ", -1)
      val masked = r.getString(3).split(" ", -1)
      assert(orig.length.toLong == nTok && masked.length.toLong == nTok)
      var expectMasked = 0L
      orig.indices.foreach { i =>
        if ((id * 31 + i) % 7 == 0) {
          assert(masked(i) == "<extra_id>", s"doc $id pos $i: schedule says mask")
          expectMasked += 1
        } else assert(masked(i) == orig(i), s"doc $id pos $i: must be verbatim")
      }
      assert(nMasked == expectMasked)
    }
    // corruption rate sits near the schedule density 1/7
    val (tot, msk) = rows.foldLeft((0L, 0L)) { case ((t, m), r) =>
      (t + r.getLong(1), m + r.getLong(2))
    }
    val rate = msk.toDouble / tot
    assert(rate > 0.12 && rate < 0.17, s"mask rate $rate drifted from ~1/7")
  }

  test("q_substr_dedup: twins fully covered, interval union beats window-count x L") {
    val rows = Curation.queries("q_substr_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toMap
    val twins = rows.keys.filter(_ >= 1000000L)
    assert(twins.nonEmpty)
    var covered = 0
    twins.foreach { id =>
      val (nTok, nWin, nDup, dupTok, frac) = rows(id)
      if (nWin === 0L) {
        // a twin SHORTER than the 16-token minimal match length has no
        // window at all — invisible by construction (that IS the
        // ExactSubstr minimal-match-length semantic)
        assert(nDup === 0L && dupTok === 0L, s"short twin $id flagged")
      } else {
        covered += 1
        // every window of a quote twin repeats its source -> full coverage
        assert(nDup === nWin, s"twin $id: $nDup of $nWin windows dup")
        assert(dupTok === nTok && frac === 1.0, s"twin $id not fully covered")
        // the interval union must collapse overlapping windows: 17
        // windows x 16 tokens is 272 naively, but covered tokens = 32
        assert(dupTok <= nTok && (nWin <= 1L || dupTok < nWin * 16),
          s"twin $id: union $dupTok vs $nWin windows")
      }
    }
    assert(covered > 0, "no twin long enough to exercise coverage")
    // global sanity: coverage never exceeds the doc, and a doc with
    // zero duplicate windows has zero covered tokens (sources CAN carry
    // duplicate spans — the corpus has natural cross-doc 16-token
    // repeats — so canonicality is per-window, not per-doc)
    rows.values.foreach { case (nTok, nWin, nDup, dupTok, _) =>
      assert(dupTok <= nTok && nDup <= nWin)
      assert((nDup == 0L) == (dupTok == 0L))
    }
  }

  test("q_dsir_weight: every micro-nat contribution sits far from a floor boundary (libm guard)") {
    // The one libm boundary the literal-table recipe can't cover (the
    // count domain is corpus-scale): recompute each distinct
    // (ct, cr, nr, nt, tf) combination the query's floor() sees, at all
    // three fixture SFs, and assert a >= 1e-5 gap to the nearest floor
    // boundary — ~1e5x the worst cross-libm divergence, so engine ln()
    // disagreement can never flip a quantized contribution on these
    // fixtures, and a fixture change that gets close fails HERE, not as
    // an oracle hash flake.
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), explode(expr("split(text, ' ')")).as("t"))
        .withColumn("b", expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 256"))
      val tf = toks.groupBy(col("doc_id"), col("lang"), col("b")).agg(count(lit(1)).as("tf"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      val buckets = tf.groupBy(col("b")).agg(
        sum(col("tf")).as("cr"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("ct"))
        .withColumn("nr", sum(col("cr")).over(wAll))
        .withColumn("nt", sum(col("ct")).over(wAll))
      val combos = tf.join(buckets, Seq("b"))
        .select(col("ct"), col("cr"), col("nr"), col("nt"), col("tf"))
        .distinct().collect()
      assert(combos.nonEmpty)
      val minDist = combos.map { r =>
        val (ct, cr, nr, nt, tfv) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        val x = (math.log((ct + 1).toDouble / (nt + 256)) -
          math.log((cr + 1).toDouble / (nr + 256))) * tfv * 1e4 + 0.5
        math.min(x - math.floor(x), math.ceil(x) - x)
      }.min
      assert(minDist > 1e-5,
        s"$dir: a dsir micro-nat contribution sits $minDist from a floor boundary — " +
          "cross-engine libm divergence could flip it; re-derive the fixture or re-quantize")
    }
  }

  test("q_mlm_mask: independent hash replay + 15%/80-10-10 corruption accounting") {
    val vocab = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS w").distinct()
      .orderBy("w").collect().map(_.getString(0))
    val P = 2147483647L
    def h(a: Long, b: Long, docId: Long, i: Long): Long =
      (a * ((docId * 1000003L + i) % P) + b) % P
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val got = Curation.queries("q_mlm_mask")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    var selected = 0L; var masked = 0L; var total = 0L
    docs.foreach { case (id, tk) =>
      val labs = (1 to tk.length).map { i =>
        val h1 = h(1103617541L, 94370269L, id, i)
        val h2 = h(1803301271L, 592394837L, id, i)
        if (h1 % 1000 >= 150) "clean"
        else if (h2 % 10 <= 7) "mask"
        else if (h2 % 10 == 8) "random"
        else "keep"
      }
      val ct = (1 to tk.length).map { i =>
        val h2 = h(1803301271L, 592394837L, id, i)
        labs(i - 1) match {
          case "mask"   => "[MASK]"
          case "random" => vocab(((h2 / 10) % vocab.length).toInt)
          case _        => tk(i - 1)
        }
      }
      val (nTok, nMask, nRand, nKeep, head) = got(id)
      assert(nTok == tk.length)
      assert(nMask == labs.count(_ == "mask"), s"doc $id n_masked")
      assert(nRand == labs.count(_ == "random"), s"doc $id n_random")
      assert(nKeep == labs.count(_ == "keep"), s"doc $id n_kept")
      assert(head == ct.take(12).mkString(" "), s"doc $id corrupted head")
      selected += nMask + nRand + nKeep; masked += nMask; total += nTok
    }
    // corpus-wide: ~15% selected, ~80% of selected masked (loose
    // deterministic bounds — the hash is uniform)
    assert(selected * 100 >= total * 12 && selected * 100 <= total * 18,
      s"selection rate ${selected.toDouble / total} outside [0.12, 0.18]")
    assert(masked * 100 >= selected * 70 && masked * 100 <= selected * 90,
      s"mask share ${masked.toDouble / selected} outside [0.7, 0.9]")
  }

  test("q_temp_sample: exact integer recompute, low-resource groups upsampled") {
    val groups = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val w = groups.map { case (l, s2, n) => (l, s2) -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }.toMap
    val tw = w.values.sum; val tn = groups.map(_._3).sum
    val got = Curation.queries("q_temp_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == groups.length)
    got.foreach { case (l, s2, n, wg, share, rate) =>
      assert(wg == w((l, s2)), s"($l, $s2) weight")
      assert(share == wg * 1000000L / tw, s"($l, $s2) share")
      assert(rate == (wg * 1000000L / tw) * tn / n, s"($l, $s2) rate")
    }
    // α = 0.5's whole point: the smallest group gets a HIGHER per-doc
    // rate than the largest (monotone rebalance toward the tail)
    val smallest = got.minBy(_._3); val largest = got.maxBy(_._3)
    if (smallest._3 < largest._3)
      assert(smallest._6 > largest._6,
        s"tail group rate ${smallest._6} not above head group rate ${largest._6}")
    // shares sum to ≤ 1 (floor slack only)
    assert(got.map(_._5).sum <= 1000000L)
  }

  test("q_winnowing: independent Scala reproduction + coverage density bounds") {
    val K = 8; val W = 4
    val got = Curation.queries("q_winnowing")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    // Third-path reproduction (not the DuckDB oracle): positional
    // 60-bit md5-prefix gram hashes, window-of-W minima, distinct.
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sb: String): Long = {
      md.reset()
      val dg = md.digest(sb.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L; var b = 0
      while (b < 8) { v = (v << 8) | (dg(b) & 0xffL); b += 1 }
      v >>> 4
    }
    var checked = 0
    docs.foreach { case (id, text) =>
      val tk = text.split(" ", -1)
      val grams = (0 to tk.length - K).map(i => h60(tk.slice(i, i + K).mkString(" ")))
      if (grams.length >= W) {
        val sel = (0 to grams.length - W).map(i => grams.slice(i, i + W).min).distinct
        val (nGrams, nSel, density, fpMin) = got(id)
        assert(nGrams == grams.length, s"doc $id n_grams")
        assert(nSel == sel.length, s"doc $id n_select")
        assert(fpMin == sel.min, s"doc $id fp_min")
        assert(density == sel.length * 1000000L / (grams.length - W + 1))
        // a selected gram covers at most W windows → density ≥ 1/W;
        // and one selection per window → density ≤ 1
        val nWindows = grams.length - W + 1
        assert(nSel <= nWindows && nSel * W >= nWindows, s"doc $id density out of range")
        checked += 1
      } else assert(!got.contains(id), s"doc $id below K+W-1 tokens must be excluded")
    }
    assert(checked == got.size)
  }

  test("q_winnowing: shared runs of K+W-1 tokens surface a common fingerprint (coverage theorem)") {
    // The guarantee the selection exists for: any two docs sharing a
    // run of ≥ K+W−1 tokens share ≥ 1 SELECTED fingerprint. The
    // fixture corpus carries no planted clones, so check the theorem
    // across all fixture doc pairs that happen to share a window of
    // grams — via the same Scala recompute as above, pairwise on the
    // selected sets of docs with any common gram run.
    val K = 8; val W = 4
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .limit(120).collect().map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sb: String): Long = {
      md.reset()
      val dg = md.digest(sb.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L; var b = 0
      while (b < 8) { v = (v << 8) | (dg(b) & 0xffL); b += 1 }
      v >>> 4
    }
    val streams = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      id -> (0 to tk.length - K).map(i => h60(tk.slice(i, i + K).mkString(" ")))
    }.filter(_._2.length >= W)
    def selected(grams: IndexedSeq[Long]): Set[Long] =
      (0 to grams.length - W).map(i => grams.slice(i, i + W).min).toSet
    val sel = streams.map { case (id, g) => id -> selected(g) }.toMap
    // construct a synthetic pair guaranteed to share an 11-token run
    // with two distinct fixture docs, and assert coverage holds
    val (idA, gA) = streams.head
    val runStart = gA.length / 2
    val sharedRun = gA.slice(runStart, runStart + W) // W consecutive gram hashes = K+W-1 tokens
    val synthetic = IndexedSeq.fill(3)(Long.MaxValue - 1) ++ sharedRun ++ IndexedSeq.fill(3)(Long.MaxValue - 2)
    if (sharedRun.length == W) {
      val common = selected(synthetic).intersect(sel(idA))
      assert(common.nonEmpty,
        s"coverage theorem violated: doc $idA and a synthetic doc sharing ${K + W - 1} tokens select no common fingerprint")
    }
  }

  test("word_window_hashes: positional parity with the per-offset HOF form") {
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val both = Tables.documents(spark, sf).limit(100)
      .selectExpr("doc_id", "text", "split(text, ' ') AS tk")
      .withColumn("native", expr("word_window_hashes(text, 8)"))
      .withColumn("hof", expr(
        """CASE WHEN size(tk) < 8 THEN CAST(array() AS ARRAY<BIGINT>)
          |ELSE transform(sequence(1, size(tk) - 7), i ->
          |  word_shingle_hashes(array_join(slice(tk, i, 8), ' '), 8)[0]) END""".stripMargin))
    assert(both.filter("native <> hof").count() === 0)
  }

  test("q_simpson: concentration recomputes exactly and respects its bounds") {
    val out = Curation.queries("q_simpson")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.nonEmpty)
    val counts = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val expected = counts.groupBy(_._1._1).map { case (lang, xs) =>
      val ns = xs.map(_._2); val n = ns.sum
      val same2 = ns.map(x => x * (x - 1)).sum
      if (n <= 1) (lang, n, ns.length.toLong, -1L, -1L) // NULL report
      else (lang, n, ns.length.toLong, same2 * 1000000L / (n * (n - 1)),
        1000000L - same2 * 1000000L / (n * (n - 1)))
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected, "simpson diverges from the driver recompute")
    out.filter(_._4 >= 0).foreach { case (lang, _, srcs, lam, div) =>
      assert(lam >= 0 && lam <= 1000000L, s"$lang lambda out of [0,1]")
      assert(lam + div == 1000000L, s"$lang diversity complement broken")
      // one source ⇒ two random docs always share it ⇒ λ = 1
      if (srcs == 1) assert(lam == 1000000L, s"$lang single-source lambda != 1")
    }
  }

  test("q_negative_sampling: weights recompute exactly and flatten the unigram head") {
    val out = Curation.queries("q_negative_sampling")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.length <= 30)
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).collect().map(_.getString(0))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def w(n: Long): Long =
      math.floor(math.sqrt(n.toDouble * math.sqrt(n.toDouble)) * 1000).toLong
    val tw = counts.values.map(w).sum
    val expected = counts.toSeq.map { case (t, n) => (t, n, w(n), w(n) * 1000000L / tw) }
      .sortBy { case (t, n, _, _) => (-n, t) }.take(30)
    assert(out.toSeq == expected, "noise distribution diverges from the driver recompute")
    // the 3/4 power must sit strictly between uniform and raw unigram:
    // weights grow with count but SLOWER (w/n shrinks as n grows)
    val byN = out.sortBy(_._2)
    byN.zip(byN.drop(1)).filter { case (a, b) => a._2 < b._2 }.foreach { case (a, b) =>
      assert(b._3 >= a._3, "weight not monotone in count")
      assert(b._3 * a._2 <= a._3 * b._2, "weight failed to damp the head (w/n must shrink)")
    }
  }
}

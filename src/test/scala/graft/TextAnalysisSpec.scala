package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: mirrored copies collapse, originals win") {
    val out = TextAnalysis.queries("q_dedup_exact")(spark, sf)
    // keepers are always the original (< 1000000) ids
    assert(out.filter($"keep_id" >= 1000000L).count() === 0)
    // docs with doc_id % 3 == 0 have exactly 2 copies, others 1
    val copies = out.filter($"n_copies" === 2).count()
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 3 === 0).count()
    assert(copies === expected)
  }

  test("fingerprints are unique for distinct texts") {
    val fp = TextAnalysis.queries("q_fingerprint")(spark, sf)
    assert(fp.select("fp").distinct().count() === fp.count())
  }

  test("quality score stays in [0, 1]") {
    val bad = TextAnalysis.queries("q_text_quality")(spark, sf)
      .filter($"quality_score" < 0 || $"quality_score" > 1).count()
    assert(bad === 0)
  }

  test("token stats: n_tokens >= n_distinct >= 1") {
    val bad = TextAnalysis.queries("q_text_stats")(spark, sf)
      .filter($"n_tokens" < $"n_distinct" || $"n_distinct" < 1).count()
    assert(bad === 0)
  }

  test("lang-id emits only known labels") {
    val labels = TextAnalysis.queries("q_lang_id")(spark, sf)
      .select("pred_lang").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("lm score: one score per doc, negative, bounded by the OOV floor") {
    val docs = Tables.documents(spark, sf)
    val scored = TextAnalysis.queries("q_lm_score")(spark, sf).cache()
    try {
      assert(scored.count() === docs.count())
      // avg ln p(token) is strictly negative and can never be worse
      // than the smoothing floor ln(1/T)
      val totalTokens = docs
        .selectExpr("cast(size(split(text, ' ')) as bigint) AS n")
        .agg(sum($"n")).head.getLong(0)
      val floor = math.log(1.0 / totalTokens)
      val bad = scored.filter($"score" >= 0.0 || $"score" < floor - 1e-4).count()
      assert(bad === 0, s"scores outside (ln(1/T)=$floor, 0)")
    } finally scored.unpersist()
  }

  /** Independent greedy-WordPiece reimplementation (the expression's
    * contract, not its code). */
  private def segment(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (w <- text.split(" ", -1) if true) {
      var pos = 0
      while (pos < w.length) {
        var len = math.min(4, w.length - pos)
        var done = false
        while (!done) {
          val piece = w.substring(pos, pos + len)
          if (len == 1 || (piece.hashCode & 0x7fffffff) % 5 == 0) {
            out += (if (pos == 0) piece else "##" + piece)
            pos += len
            done = true
          } else len -= 1
        }
      }
    }
    out.toSeq
  }

  test("wordpiece: expression output matches an independent greedy reimplementation") {
    graft.functions.VectorFunctions.register(spark)
    val rows = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text", "wordpiece_tokens(text) AS pieces")
      .orderBy($"doc_id").limit(50).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](2) == segment(r.getString(1)), s"doc ${r.getLong(0)}")
    }
  }

  test("wordpiece: pieces reassemble to the input and respect the vocab") {
    graft.functions.VectorFunctions.register(spark)
    val rows = Tables.documents(spark, sf)
      .selectExpr("text", "wordpiece_tokens(text) AS pieces").limit(100).collect()
    rows.foreach { r =>
      val pieces = r.getSeq[String](1)
      // reassembly: strip ## and concat == input without spaces
      assert(pieces.map(_.stripPrefix("##")).mkString == r.getString(0).replace(" ", ""))
      pieces.foreach { p =>
        val raw = p.stripPrefix("##")
        assert(raw.length >= 1 && raw.length <= 4)
        assert(raw.length == 1 || (raw.hashCode & 0x7fffffff) % 5 == 0,
          s"piece '$p' not in vocab")
      }
    }
  }

  test("q_tokenize: piece counts are at least word counts and head pins segmentation") {
    val df = TextAnalysis.queries("q_tokenize")(spark, sf)
    assert(df.filter($"n_pieces" < $"n_words").count() === 0)
    val head = df.orderBy($"doc_id").limit(1).collect()(0).getString(3)
    assert(head.nonEmpty && head.split(",").length <= 8)
  }

  test("q_inverted_index: postings are sorted doc-id prefixes consistent with df") {
    val rows = TextAnalysis.queries("q_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1); val ctf = r.getLong(2)
      val ids = r.getString(3).split(",").map(_.toLong)
      assert(ctf >= df, s"term '${r.getString(0)}': ctf $ctf < df $df")
      assert(ids.length == math.min(df, 20L),
        s"term '${r.getString(0)}': postings head ${ids.length} vs df $df")
      assert(ids.sameElements(ids.sorted), s"term '${r.getString(0)}': postings not sorted")
    }
    // spot-check one term's df/ctf against a direct recount
    val term = rows.head.getString(0)
    val direct = Tables.documents(spark, sf)
      .selectExpr("doc_id", s"size(filter(split(text, ' '), t -> t = '$term')) AS n")
      .filter($"n" > 0)
      .agg(count(lit(1)), sum($"n")).collect()(0)
    assert(direct.getLong(0) == rows.head.getLong(1) && direct.getLong(1) == rows.head.getLong(2))
  }

  test("q_langid_confusion: rows partition the corpus; cells agree with q_lang_id") {
    val conf = TextAnalysis.queries("q_langid_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val preds = TextAnalysis.queries("q_lang_id")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(conf.values.map(_._1).sum == preds.length.toLong, "cells must partition the corpus")
    preds.groupBy(identity).foreach { case (cell, hits) =>
      assert(conf(cell)._1 == hits.length.toLong, s"cell $cell count")
    }
    // per-actual-language shares are floors of n/row_total in micro-units
    val rowTotals = preds.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    conf.foreach { case ((l, p), (n, share)) =>
      assert(share == n * 1000000L / rowTotals(l), s"cell ($l,$p) share")
    }
  }

  test("q_vocab_coverage: monotone in k, consistent with a driver recount") {
    val got = TextAnalysis.queries("q_vocab_coverage")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(5, 10, 20))
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq, "cum_tokens must grow with k")
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ", -1).foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L)
    }
    val byRank = counts.toSeq.sortBy { case (t, n) => (-n, t) }.map(_._2)
    val total = byRank.sum
    got.foreach { case (k, cum, covMicro) =>
      assert(cum == byRank.take(k).sum, s"k=$k cum")
      assert(covMicro == cum * 1000000L / total, s"k=$k coverage")
    }
  }

  test("q_bpe_pairs: top-20 matches a driver-side pair recount") {
    val got = TextAnalysis.queries("q_bpe_pairs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ", -1).foreach { t =>
        (0 until t.length - 1).foreach { i =>
          val p = t.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got == expected)
  }

  test("q_bpe_train: 5 merges match an independent driver-side BPE trainer") {
    val got = TextAnalysis.queries("q_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    // independent reimplementation: word-frequency map, then 5 rounds of
    // (weighted x≠y pair count → argmax by (-n, x, y) → apply merge)
    val freq = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ", -1).filter(_.nonEmpty).foreach { t =>
        freq(t) = freq.getOrElse(t, 0L) + 1L
      }
    }
    var words: Map[Vector[String], Long] =
      freq.toMap.groupBy { case (t, _) => t.map(_.toString).toVector }
        .map { case (syms, m) => syms -> m.values.sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to 5) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { case (x, y) =>
          if (x != y) counts((x, y)) = counts.getOrElse((x, y), 0L) + f
        }
      }
      val ((x, y), n) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      merges += ((r, x, y, x + y, n))
      words = words.groupBy { case (syms, _) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += x + y; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector
      }.map { case (syms, m) => syms -> m.map(_._2).sum }
    }
    assert(got === merges.toSeq)
    // winning counts can never increase round over round (a new pair
    // involving the merged symbol is bounded by the merge's own count)
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_bpe_encode: piece map matches a driver-side application of the learned merges") {
    val merges = TextAnalysis.queries("q_bpe_train")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(t: String): Vector[String] = {
      var syms = t.map(_.toString).toVector
      merges.foreach { case (x, y) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += x + y; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val vocab = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty).distinct.sorted.toSeq
    val expected = vocab.map(t => (t, encode(t).mkString(" "), encode(t).length.toLong))
    val got = TextAnalysis.queries("q_bpe_encode")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    // every piece concatenation reconstructs its word exactly
    assert(got.forall { case (t, enc, _) => enc.replace(" ", "") == t })
  }

  test("q_quality_ensemble: bitmask matches an independent driver-side recompute") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val markers = Set("the", "and", "of", "der", "und", "das",
      "le", "la", "et", "el", "los", "y")
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val id = r.getLong(0); val text = r.getString(1)
        val toks = text.split(" ", -1) // split keeps empties like Spark's split
        val n = toks.length.toLong
        val nStop = toks.count(stop)
        val distinctMicro = toks.distinct.length.toLong * 1000000L / n
        val meanLenMicro = (text.length.toLong - (n - 1)) * 1000000L / n
        val nMarker = toks.count(markers)
        val reasons =
          (if (n < 5) 1L else 0L) + (if (n > 120) 2L else 0L) +
            (if (nStop < 1) 4L else 0L) +
            (if (distinctMicro < 300000L) 8L else 0L) +
            (if (meanLenMicro < 3000000L || meanLenMicro > 11000000L) 16L else 0L) +
            (if (nMarker == 0) 32L else 0L)
        (id, n, distinctMicro, meanLenMicro, reasons, reasons == 0L)
      }.sortBy(_._1).toSeq
    val got = TextAnalysis.queries("q_quality_ensemble")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === expected)
    // the gate keeps a non-degenerate slice: some docs pass, some fail
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("q_sparse_knn: matches an independent driver-side inverted-index recompute") {
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (0 until math.max(0, tk.length - 2)).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
    }
    val docSh = texts.map { case (id, t) => id -> shingles(t) }.toMap
    val df = docSh.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val weighted = df.collect { case (g, n) if n >= 2 && n <= 100 => g -> (1000000L / n) }
    val postings = weighted.keys.map(g =>
      g -> docSh.collect { case (id, sh) if sh(g) => id }.toSeq).toMap
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    postings.foreach { case (g, docs) =>
      val w2 = weighted(g) * weighted(g)
      for (a <- docs; b <- docs if a < b) {
        val (s0, n0) = scores.getOrElse((a, b), (0L, 0L))
        scores((a, b)) = (s0 + w2, n0 + 1)
      }
    }
    val perDoc = scores.toSeq
      .flatMap { case ((a, b), (sc, n)) => Seq((a, b, sc, n), (b, a, sc, n)) }
      .groupBy(_._1).flatMap { case (doc, nbrs) =>
        nbrs.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((_, nbr, sc, n), i) => (doc, nbr, sc, n, i + 1) }
      }.toSet
    val got = TextAnalysis.queries("q_sparse_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(got == perDoc, s"got ${got.size} rows vs expected ${perDoc.size}")
  }

  test("q_unigram_lm: independent Scala Viterbi replay + libm floor-boundary margin") {
    // Rebuild the vocabulary and costs exactly as the operator does,
    // then run the DP with an EXPLICIT lexicographic (cost, pieces)
    // ordering — independent of the query's 64-packed scalar — so the
    // packing trick itself is under test.
    val wordFreq = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS w")
      .filter("length(w) between 1 and 24")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pieceCnt = scala.collection.mutable.Map.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      for (i <- 0 until w.length; j <- i until math.min(i + 4, w.length)) {
        val p = w.substring(i, j + 1)
        pieceCnt(p) = pieceCnt.getOrElse(p, 0L) + f
      }
    }
    val total = pieceCnt.values.sum
    val cost = pieceCnt.collect {
      case (p, c) if p.length == 1 || c * 2000 >= total =>
        p -> math.floor(math.log(total.toDouble / c) * 10000 + 0.5).toLong
    }.toMap
    // libm drift guard (the dsir/bigram discipline): no quantized
    // surprisal may sit within 1e-6 of its floor boundary, else
    // DuckDB's ln could flip the integer vs the JVM's.
    pieceCnt.foreach { case (p, c) =>
      val x = math.log(total.toDouble / c) * 10000 + 0.5
      val dist = math.min(x - math.floor(x), math.ceil(x) - x)
      assert(dist > 1e-6, s"piece '$p' surprisal sits $dist from a floor boundary")
    }
    def viterbi(w: String): (Long, Long) = {
      val dp = Array.fill[(Long, Long)](w.length + 1)((Long.MaxValue, Long.MaxValue))
      dp(0) = (0L, 0L)
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i if dp(j)._1 != Long.MaxValue) {
        cost.get(w.substring(j, i)).foreach { pc =>
          val cand = (dp(j)._1 + pc, dp(j)._2 + 1)
          if (cand._1 < dp(i)._1 || (cand._1 == dp(i)._1 && cand._2 < dp(i)._2)) dp(i) = cand
        }
      }
      dp(w.length)
    }
    val got = TextAnalysis.queries("q_unigram_lm")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.length == wordFreq.size)
    got.foreach { case (w, f, costMicro, nPieces) =>
      assert(f == wordFreq(w), s"word $w freq")
      val (c, p) = viterbi(w)
      assert(c != Long.MaxValue, s"word $w unreachable — single-char floor broken")
      assert(costMicro == c && nPieces == p,
        s"word $w: got ($costMicro, $nPieces) want ($c, $p)")
    }
    // segmentation must be non-trivial somewhere: some word should
    // segment into fewer pieces than its character count
    assert(got.exists { case (w, _, _, p) => w.length > 1 && p < w.length },
      "every word segmented char-by-char — the vocab threshold admits no multi-char pieces")
  }

  test("q_ngram_novelty: novel counts partition the distinct-shingle space") {
    graft.functions.VectorFunctions.register(spark)
    val rows = TextAnalysis.queries("q_ngram_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every shingle is novel for exactly ONE document (its min-doc_id
    // first occurrence), so Σ n_novel = corpus-wide distinct count
    val globalDistinct = Tables.documents(spark, sf)
      .selectExpr("explode(word_shingle_hashes(text, 3)) AS h")
      .agg(countDistinct(col("h"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == globalDistinct,
      s"sum(n_novel) ${rows.map(_._3).sum} != global distinct $globalDistinct")
    rows.foreach { case (id, nSh, nNov, micro) =>
      assert(nNov <= nSh, s"doc $id novel exceeds shingles")
      assert(micro == nNov * 1000000L / nSh, s"doc $id micro mismatch")
    }
    // the doc_id-stream head has nothing before it: novelty = 1.0
    val first = rows.minBy(_._1)
    assert(first._4 == 1000000L, s"first doc ${first._1} novelty ${first._4}")
  }

  test("q_bleu: clipped precisions match a driver-side recompute; kept-token floor holds") {
    val out = TextAnalysis.queries("q_bleu")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def counts(g: Seq[String]): Map[String, Long] =
      g.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = docs.map { case (id, rtk) =>
      val ctk = rtk.zipWithIndex.map { case (t, i) => if ((i + 1) % 4 == 0) "the" else t }
      def stats(c: Seq[String], r: Seq[String]): (Long, Long) = {
        // a gram-less candidate is absent from the totals table → the
        // final left join reports NULL (mapped to -1 here), not 0
        if (c.isEmpty) (-1L, -1L)
        else {
          val cc = counts(c); val cr = counts(r)
          val clip = cc.map { case (g, n) => math.min(n, cr.getOrElse(g, 0L)) }.sum
          (clip, clip * 1000000L / c.length)
        }
      }
      val big = (tk: Array[String]) =>
        if (tk.length < 2) Seq.empty[String]
        else tk.sliding(2).map(_.mkString(" ")).toSeq
      val (c1, p1) = stats(ctk.toSeq, rtk.toSeq)
      val (c2, p2) = stats(big(ctk), big(rtk))
      (id, rtk.length.toLong, c1, p1, c2, p2)
    }.sortBy(_._1)
    assert(out.toSeq == expected.toSeq, "q_bleu diverges from the driver recompute")
    // every kept token occurrence clips fully (cand count of a real
    // token never exceeds the reference count), so p1 ≥ kept fraction
    out.foreach { case (id, n, c1, p1, _, _) =>
      val kept = n - n / 4
      assert(c1 >= kept, s"doc $id clip1 $c1 below kept floor $kept")
      assert(p1 <= 1000000L, s"doc $id precision above 1")
    }
    // and masking must actually cost precision somewhere on this corpus
    assert(out.exists(_._4 < 1000000L), "no doc lost precision — corruption vacuous")
  }

  test("q_gazetteer: every doc carries its woven mentions; counts recompute exactly") {
    val out = TextAnalysis.queries("q_gazetteer")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == docs.length, "a doc lost its woven mentions")
    val gaz = (0 until 25).map(i => s"nation_$i").toSet
    val byId = out.map(o => o._1 -> o).toMap
    docs.foreach { case (id, text) =>
      val toks = (text + s" visited nation_${id % 25} and nation_${(id + 7) % 25}")
        .split(" ", -1).toSeq
      val mentions = toks.filter(gaz)
      val ents = mentions.distinct.sorted.mkString(",")
      assert(byId(id) == ((id, mentions.length.toLong, ents)),
        s"doc $id extraction diverges")
      assert(mentions.length >= 2, s"doc $id below the woven floor")
    }
  }

  test("q_zipf: moments and fitted line recompute exactly from integer log2 buckets") {
    val rows = TextAnalysis.queries("q_zipf")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    val out = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).collect().map(_.getString(0))
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
    def ilog2(v: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val pts = counts.groupBy(ilog2).map { case (x, vs) => (x, ilog2(vs.size.toLong)) }.toSeq
    val np = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val den = np * sxx - sx * sx
    assert(np >= 2 && den != 0, s"degenerate bucket table: np=$np den=$den")
    val slope = Math.floorDiv((np * sxy - sx * sy) * 1000, den)
    val icept = Math.floorDiv((sy * sxx - sx * sxy) * 1000, den)
    assert(out == ((np, sx, sy, sxy, sxx, slope, icept)),
      s"zipf fit diverges: got $out want ${(np, sx, sy, sxy, sxx, slope, icept)}")
  }

  test("q_rouge_l: native LCS equals a driver DP; kept-token floor and F identity hold") {
    val out = TextAnalysis.queries("q_rouge_l")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    def lcs(a: Seq[String], b: Seq[String]): Int = {
      val row = new Array[Int](b.length + 1)
      a.foreach { x =>
        var prev = 0
        var j = 0
        while (j < b.length) {
          val old = row(j + 1)
          row(j + 1) = if (x == b(j)) prev + 1 else math.max(old, row(j))
          prev = old
          j += 1
        }
      }
      row(b.length)
    }
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).take(32).toSeq))
    val expected = docs.map { case (id, rtk) =>
      val ctk = rtk.zipWithIndex.map { case (t, i) => if ((i + 1) % 4 == 0) "the" else t }
      val l = lcs(ctk, rtk).toLong
      val n = rtk.length.toLong
      val p = l * 1000000L / n
      (id, n, l, p, p, if (p > 0) (2 * p * p) / (2 * p) else 0L)
    }.sortBy(_._1)
    assert(out.toSeq == expected.toSeq, "ROUGE-L diverges from the driver DP")
    out.foreach { case (id, n, l, p, r, f) =>
      // the kept (un-masked) positions always form a common subsequence
      assert(l >= n - n / 4, s"doc $id LCS below the kept-token floor")
      assert(l <= n && p == r && f == p, s"doc $id P/R/F identity broken")
    }
  }

  test("q_novelty_decay: deciles partition the novelty profile; first decile is the peak") {
    import spark.implicits._
    val decay = TextAnalysis.queries("q_novelty_decay")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val profile = TextAnalysis.queries("q_ngram_novelty")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(decay.map(_._1).toSeq == (1L to 10L))
    // the rollup partitions the per-doc profile exactly
    assert(decay.map(_._2).sum == profile.map(_._2).sum, "shingle mass differs")
    assert(decay.map(_._3).sum == profile.map(_._3).sum, "novel mass differs")
    // per-decile recompute from the per-doc profile via the same
    // division-free assignment
    val n = profile.length.toLong
    val byDecile = profile.groupBy(p => 10 * (p._1 - 1) / n + 1)
    decay.foreach { case (dec, ns, nv, micro) =>
      val ds = byDecile(dec)
      assert(ns == ds.map(_._2).sum && nv == ds.map(_._3).sum, s"decile $dec mass wrong")
      assert(micro == nv * 1000000L / ns)
    }
    // saturation shape: the first decile is the novelty peak and the
    // last sits strictly below it (every shingle is novel somewhere
    // earlier once the corpus repeats itself)
    assert(decay.head._4 == decay.map(_._4).max, "first decile not the novelty peak")
    assert(decay.last._4 < decay.head._4, "no decay across the corpus")
  }

  test("q_cohen_kappa: matches a driver-side recompute from the raw (lang, pred) pairs") {
    val row = TextAnalysis.queries("q_cohen_kappa")(spark, sf).collect().head
    val pairs = TextAnalysis.queries("q_lang_id")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = pairs.length.toLong
    val agree = pairs.count { case (a, b) => a == b }.toLong
    val classes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val po = agree * 1000000L / n
    val pe = classes.map { k =>
      val r = pairs.count(_._1 == k).toLong * 1000000L / n
      val c = pairs.count(_._2 == k).toLong * 1000000L / n
      r * c
    }.sum / 1000000L
    val kappa =
      if (po >= pe) (po - pe) * 1000000L / (1000000L - pe)
      else -((pe - po) * 1000000L / (1000000L - pe))
    assert(row.getLong(0) == n && row.getLong(1) == agree)
    assert(row.getLong(2) == po && row.getLong(3) == pe)
    assert(row.getLong(4) == kappa, "kappa diverges from the driver recompute")
    // κ ∈ [−1, 1]; the sf0.001 fixture lands slightly BELOW chance
    // (every zh doc is a guaranteed miss and the tiny corpus skews the
    // marginals), which is exactly what exercises the negative-κ
    // sign-split division branch
    assert(kappa >= -1000000L && kappa <= 1000000L)
  }

  test("q_langid_trigram: out-of-place scoring matches an independent driver recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      (1 to math.max(t.length - 2, 0)).map(i => t.substring(i - 1, i + 2))
    // lang profiles: top-30 by (count desc, tri asc)
    val langProf: Map[String, Map[String, Int]] =
      docs.groupBy(_._2).map { case (lang, ds) =>
        val counts = ds.flatMap(d => tris(d._3)).groupBy(identity)
          .map { case (k, v) => (k, v.length) }
        val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(30)
          .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
        lang -> ranked
      }
    val langs = docs.map(_._2).distinct.sorted
    val expected = docs.map { case (id, lang, text) =>
      val counts = tris(text).groupBy(identity).map { case (k, v) => (k, v.length) }
      val docTop = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
        .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }
      val scoredByLang = langs.map { pl =>
        val prof = langProf(pl)
        val dist = docTop.map { case (t, rd) =>
          prof.get(t).map(rl => math.abs(rd - rl).toLong).getOrElse(30L)
        }.sum
        (pl, dist)
      }
      val (pred, dist) = scoredByLang.minBy { case (pl, ds) => (ds, pl) }
      (id, lang, pred, lang == pred, dist)
    }.sortBy(_._1)
    val got = TextAnalysis.queries("q_langid_trigram")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == expected.toSeq, "trigram lang-ID diverges from the driver recompute")
    // NOTE: the fixture's text is the same synthetic vocabulary for
    // every lang label, so accuracy ~ chance is EXPECTED here — the
    // operator contract is the exact scoring trajectory, which the
    // oracle and this recompute both pin
  }

  test("q_kneser_ney: per-context probabilities are a proper discounted distribution") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).selectExpr("doc_id", "split(text, ' ') AS tk")
    val pairs = docs
      .selectExpr("tk", "posexplode(slice(tk, 1, size(tk) - 1)) AS (i, a)")
      .selectExpr("a", "tk[i + 1] AS b")
      .as[(String, String)].collect()
    val bgc = pairs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val n1t = bgc.size.toLong
    val cA = bgc.groupBy(_._1._1).map { case (a, m) => (a, m.values.sum) }
    val n1a = bgc.groupBy(_._1._1).map { case (a, m) => (a, m.size.toLong) }
    val n1b = bgc.groupBy(_._1._2).map { case (b, m) => (b, m.size.toLong) }
    // Σ_b P_KN(b|a) == 1 EXACTLY in rational arithmetic for every
    // context: the discount mass removed from seen bigrams re-enters
    // through the continuation term iff Σ_b n1b·[c_ab > 0] is weighted
    // right. Verify in exact BigInt rationals on a sample of contexts.
    cA.take(50).foreach { case (a, ca) =>
      val numSum = bgc.collect { case ((x, b), cab) if x == a =>
        BigInt(math.max(4 * cab - 3, 0)) * n1t + BigInt(3) * n1a(a) * n1b(b)
      }.sum
      val den = BigInt(4) * ca * n1t
      // full mass = seen-bigram part + the continuation mass routed to
      // UNSEEN b (which the per-doc query never scores); the seen part
      // alone must stay strictly ≤ 1 and > 0
      assert(numSum > 0 && numSum <= den, s"context '$a' mass ${numSum}/${den} out of (0,1]")
    }
    // and the registered per-doc aggregate replays: spot-check one doc
    val out = TextAnalysis.queries("q_kneser_ney")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall { case (_, nBg, kn) =>
      kn >= 0 && kn <= 1000000L && (nBg > 0 || kn == 0)
    })
  }

  test("unigramVocab: the driver collect is bounded by the mass cutoff") {
    val (vocab, total) = TextAnalysis.unigramVocab(spark, sf)
    assert(total > 0)
    val multi = vocab.filter(_._1.length > 1)
    // at most 2000 multi-char pieces can each hold >= total/2000 of the
    // mass — the cutoff itself enforces the collect bound
    assert(multi.length <= 2000,
      s"mass cutoff must bound the multi-char vocab: ${multi.length}")
    assert(multi.forall { case (_, c) => c * 2000 >= total },
      "a collected multi-char piece below the mass cutoff escaped the plan-side filter")
    val single = vocab.filter(_._1.length == 1)
    assert(single.nonEmpty, "single-char reachability floor missing")
    assert(vocab.length == multi.length + single.length)
  }

  test("q_tokenize oracle precondition: the fixture corpus is BMP/ASCII") {
    // The WordPiece oracle inlines JVM String.hashCode as code-point
    // arithmetic — exact while DuckDB's code-point substr aligns with
    // Java's UTF-16-unit substring, i.e. for BMP text. The fixture is
    // ASCII; this assertion is the tripwire the oracle comment cites.
    val maxCp = Tables.documents(spark, sf)
      .selectExpr("array_max(transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))) AS m")
      .agg(max(col("m"))).collect()(0).getInt(0)
    assert(maxCp < 128, s"fixture text must stay ASCII for the q_tokenize oracle (max cp $maxCp)")
  }

  test("q_chrf: trigram F replays driver-side; harmonic mean brackets hold") {
    val out = TextAnalysis.queries("q_chrf")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toMap
    val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def tri(s: String): Map[String, Long] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3))
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    texts.foreach { case (id, text) =>
      val rtk = text.split(" ", -1)
      val ctk = rtk.zipWithIndex.map { case (t, i) => if ((i + 1) % 4 == 0) "the" else t }
      val (rg, cg) = (tri(rtk.mkString("")), tri(ctk.mkString("")))
      val ov = cg.map { case (g, n) => math.min(n, rg.getOrElse(g, 0L)) }.sum
      val (tc, tr) = (cg.values.sum, rg.values.sum)
      val (gotOv, gotP, gotR, gotF) = out(id)
      assert(gotOv == ov, s"doc $id overlap")
      assert(gotP == (if (tc > 0) Some(ov * 1000000L / tc) else None), s"doc $id precision")
      assert(gotR == (if (tr > 0) Some(ov * 1000000L / tr) else None), s"doc $id recall")
      (gotP, gotR, gotF) match {
        case (Some(p), Some(r), f) if p + r > 0 =>
          assert(f.contains(2 * p * r / (p + r)), s"doc $id F")
          // harmonic mean is bracketed by its arguments
          f.foreach(x => assert(x >= math.min(p, r) - 1 && x <= math.max(p, r)))
        case _ => ()
      }
      // docs shorter than 4 tokens are uncorrupted → perfect score
      if (rtk.length < 4 && tr > 0)
        assert(gotF.contains(1000000L), s"doc $id: uncorrupted pair must score 1.0")
    }
  }

  test("q_collocation: G-squared matches the driver recompute; every value sits far from its floor boundary") {
    val out = TextAnalysis.queries("q_collocation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 30)
    // driver recompute of the full candidate table
    val bigrams = Tables.documents(spark, sf)
      .selectExpr("split(text, ' ') AS tk")
      .selectExpr("posexplode(slice(tk, 1, size(tk) - 1)) AS (i, a)", "tk")
      .selectExpr("a", "tk[i + 1] AS b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nAB = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val nA = bigrams.groupBy(_._1).map { case (a, xs) => a -> xs.length.toLong }
    val nB = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val nn = bigrams.length.toLong
    def term(o: Long, r: Long, c: Long): Double =
      if (o > 0) o * math.log((o.toDouble * nn) / (r.toDouble * c)) else 0.0
    def llrRaw(a: String, b: String): Double = {
      val (ab, ra, cb) = (nAB((a, b)), nA(a), nB(b))
      2.0 * (term(ab, ra, cb) + term(ra - ab, ra, nn - cb) +
        term(cb - ab, nn - ra, cb) + term(nn - ra - cb + ab, nn - ra, nn - cb))
    }
    out.foreach { case (a, b, ab, ra, cb, llr) =>
      assert(ab == nAB((a, b)) && ra == nA(a) && cb == nB(b), s"($a,$b): margins wrong")
      val x = llrRaw(a, b) * 10000 + 0.5
      assert(math.floor(x).toLong == llr, s"($a,$b): $llr vs driver ${math.floor(x).toLong}")
      val dist = math.min(x - math.floor(x), math.ceil(x) - x)
      assert(dist > 1e-4, s"($a,$b): llr sits $dist from a floor boundary — " +
        "cross-engine libm divergence could flip it")
    }
    // the top-30 cut must not straddle a near-tie the tiebreak can't fix
    val all = nAB.keys.filter(p => nAB(p) >= 5).toSeq
      .map { case (a, b) => ((a, b), math.floor(llrRaw(a, b) * 10000 + 0.5).toLong) }
      .sortBy { case ((a, b), v) => (-v, a, b) }
    assert(all.take(30).map(_._1) == out.map(t => (t._1, t._2)).toSeq, "top-30 set diverges")
  }

  test("q_script_mix: classes partition every doc; census matches a driver recompute; flag non-vacuous") {
    val out = TextAnalysis.queries("q_script_mix")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(9))))
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (n, up, lo, dig, sp, other, digMicro, suspect)) =>
      val mixed = s"${texts(id)} Ref $id: Q${id % 4 + 1} (c) 2026 Résumé!"
      assert(n == mixed.length.toLong, s"doc $id: length")
      assert(up == mixed.count(_.isUpper) - mixed.count(c => c.isUpper && c > 127), s"doc $id: upper")
      assert(lo == mixed.count(c => c >= 'a' && c <= 'z'), s"doc $id: lower")
      assert(dig == mixed.count(_.isDigit), s"doc $id: digit")
      assert(sp == mixed.count(_ == ' '), s"doc $id: space")
      assert(up + lo + dig + sp + other == n, s"doc $id: classes do not partition")
      assert(other >= 2, s"doc $id: the é and ! must land in other") // é + ( ) : !
      assert(digMicro == dig * 1000000L / n)
      assert(suspect == (digMicro > 20000L))
    }
    assert(out.exists(_._2._8) && out.exists(!_._2._8), "script-mix flag vacuous on this corpus")
  }

  test("q_readability: per-source means replay from a per-doc Scala FRE walk") {
    val got = TextAnalysis.queries("q_readability")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vowels = "[aeiouy]+".r
    docs.groupBy(_._1).foreach { case (src, grp) =>
      val fres = grp.map { case (_, text) =>
        val w = text.split(' ').length.toLong
        val syl = vowels.findAllIn(text).length.toLong
        206835L - (1015L * w) / ((w + 14) / 15) - (84600L * syl) / w
      }
      val sum = fres.sum
      val mean = if (sum >= 0) sum * 1000 / grp.size else -((-sum * 1000) / grp.size)
      val (n, gotMean) = got(src)
      assert(n === grp.size.toLong)
      assert(gotMean === mean, s"$src: $gotMean vs naive $mean")
    }
  }

  test("q_burstiness: VMR replays from sparse counts; top-30 selection exact") {
    val rows = TextAnalysis.queries("q_burstiness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toLong
    val tf = docs.flatMap { case (id, t) => t.split(' ').map(w => (w, id)) }
      .groupBy(identity).map { case ((w, id), xs) => (w, id, xs.length.toLong) }
    val byTerm = tf.groupBy(_._1).map { case (w, xs) =>
      w -> (xs.size.toLong, xs.map(_._3).sum, xs.map(x => x._3 * x._3).sum)
    }
    rows.foreach { case (t, df, s, vmr) =>
      val (bdf, bs, bss) = byTerm(t)
      assert(df === bdf && s === bs, s"term $t counts")
      assert(vmr === (nDocs * bss - bs * bs) * 1000000L / (bs * (nDocs - 1)), s"term $t vmr")
    }
    // the report is the TOP-30 by VMR among supported terms
    val expTop = byTerm.filter(_._2._2 >= 50).toSeq
      .map { case (w, (_, s, ss)) => (w, (nDocs * ss - s * s) * 1000000L / (s * (nDocs - 1))) }
      .sortBy(t => (-t._2, t._1)).take(30).map(_._1)
    assert(rows.map(_._1).toSeq === expTop)
  }
}

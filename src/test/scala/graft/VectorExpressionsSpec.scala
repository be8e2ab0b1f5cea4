package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimSearch

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def floats(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine_sim matches hand-computed values") {
    VectorFunctions.register(spark)
    val df = Seq(
      (floats(1, 0, 0), floats(1, 0, 0)),   // identical → 1.0
      (floats(1, 0, 0), floats(0, 1, 0)),   // orthogonal → 0.0
      (floats(1, 2, 3), floats(-1, -2, -3)) // opposite → -1.0
    ).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)"))
    val got = df.select(round($"c", 9)).as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0, -1.0))
  }

  test("cosine_sim is null-safe: null inputs, length mismatch, null elements") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(floats(1, 2)), None: Option[Array[Float]]),
      (None: Option[Array[Float]], Some(floats(1, 2)))
    ).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)"))
    assert(df.filter($"c".isNotNull).count() === 0)
    // HOF zip_with parity: ragged lengths and null elements → NULL,
    // never a silently truncated score
    val edge = spark.sql(
      """SELECT cosine_sim(array(cast(1 as float), cast(2 as float)), array(cast(1 as float))) AS ragged,
        |       cosine_sim(array(cast(1 as float), cast(null as float)),
        |                  array(cast(1 as float), cast(2 as float))) AS holed""".stripMargin)
      .head()
    assert(edge.isNullAt(0), "length mismatch must yield NULL")
    assert(edge.isNullAt(1), "null element must yield NULL")
  }

  test("native expression agrees with the HOF form on real embeddings") {
    val native = SimSearch.queries("q_simsearch_native")(spark, sf).collect().toSeq
    val hof = SimSearch.queries("q_simsearch")(spark, sf).collect().toSeq
    assert(native === hof)
  }

  test("double-array overload matches the float path") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT round(cosine_sim(array(1.0d, 2.0d, 3.0d), array(-1.0d, -2.0d, -3.0d)), 9)")
      .as[Double].head()
    assert(got === -1.0)
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"

  test("RewriteDotProducts: HOF idiom is rewritten to the native expression") {
    VectorFunctions.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select($"embedding".as("a"), $"embedding".as("b"))
      .selectExpr(s"$hofDot AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), "rule did not fire:\n" + optimized.take(600))
    assert(!optimized.contains("aggregate("), "HOF fold survived:\n" + optimized.take(600))
  }

  test("RewriteDotProducts: rewritten result is bit-identical to the interpreted fold") {
    VectorFunctions.register(spark)
    def run(s: org.apache.spark.sql.SparkSession): (Seq[(Long, Double)], String) = {
      val df = Tables.embeddings(s, sf)
        .select(col("vec_id"), col("embedding").as("a"), col("embedding").as("b"))
        .selectExpr("vec_id", s"$hofDot AS d").orderBy(col("vec_id"))
      import s.implicits._
      (df.as[(Long, Double)].collect().toSeq, df.queryExecution.optimizedPlan.toString)
    }
    val (native, nativePlan) = run(spark)
    // fresh session state → no RewriteDotProducts → interpreted HOF path
    val plain = spark.newSession()
    val (interp, interpPlan) = run(plain)
    assert(nativePlan.contains("dot_product"), "rule missing on main session")
    assert(!interpPlan.contains("dot_product"), "fresh session unexpectedly has the rule")
    assert(native === interp)
  }

  test("RewriteDotProducts: null semantics match the HOF form") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),          // length mismatch → null
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))     // clean → 5.0
    ).toDF("a", "b").selectExpr(s"$hofDot AS d")
    // (plan-shape assertion lives in the parquet-based test; literal
    // inputs constant-fold before the plan is observable)
    val got = df.as[Option[Double]].collect().toSeq
    assert(got === Seq(None, Some(5.0)))
  }

  test("jaccard_sorted matches the set-op form and the null contract") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      """SELECT jaccard_sorted(array(1L, 2L, 3L, 4L), array(2L, 3L, 4L, 5L)) AS j1,
        |       jaccard_sorted(array(1L, 2L), array(3L, 4L)) AS j2,
        |       jaccard_sorted(array(1L, 2L), array(1L, 2L)) AS j3,
        |       jaccard_sorted(cast(array() as array<bigint>),
        |                      cast(array() as array<bigint>)) AS j_empty,
        |       jaccard_sorted(cast(null as array<bigint>), array(1L)) AS j_null
        |""".stripMargin).head()
    assert(got.getDouble(0) === 0.6) // |∩|=3, |∪|=5
    assert(got.getDouble(1) === 0.0)
    assert(got.getDouble(2) === 1.0)
    assert(got.isNullAt(3), "empty union must be NULL like 0/0 division")
    assert(got.isNullAt(4), "null input must be NULL")
  }

  test("jaccard_sorted agrees with array_intersect/array_union on shingle hashes") {
    VectorFunctions.register(spark)
    val docs = graft.operators.NearDup.withHashedShingles(
      graft.operators.NearDup.corpus(spark, sf)).limit(50)
    val pairs = docs.select($"doc_id".as("a_id"), $"hs".as("ha"))
      .crossJoin(docs.select($"doc_id".as("b_id"), $"hs".as("hb")))
      .filter($"a_id" < $"b_id")
      .selectExpr("jaccard_sorted(ha, hb) AS fused",
        "size(array_intersect(ha, hb)) / size(array_union(ha, hb)) AS setop")
    assert(pairs.filter(
      "coalesce(fused, -1) <> coalesce(setop, -1)").count() === 0)
  }

  test("prefix-filtered jaccard finds exactly the all-pairs result") {
    // The PPJoin-style plan must be result-identical to the naive
    // quadratic join — no false negatives from the prefix bound.
    VectorFunctions.register(spark)
    val sh = graft.operators.NearDup.withHashedShingles(
        graft.operators.NearDup.corpus(spark, sf))
      .select($"doc_id", $"lang", $"source", $"hs")
    val naive = sh.select($"doc_id".as("a_id"), $"lang", $"source", $"hs".as("ha"))
      .join(sh.select($"doc_id".as("b_id"), $"lang", $"source", $"hs".as("hb")),
        Seq("lang", "source"))
      .filter($"a_id" < $"b_id")
      .selectExpr("a_id", "b_id", "round(jaccard_sorted(ha, hb), 4) AS jaccard")
      .filter($"jaccard" >= 0.6)
    val fast = graft.operators.NearDup.queries("q_dedup_jaccard")(spark, sf)
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("cosine_all is bit-identical to the per-centroid cosine_sim array") {
    VectorFunctions.register(spark)
    val cents = Tables.embeddings(spark, sf).filter($"vec_id" < 16).orderBy("vec_id")
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(v => s"${v}D").mkString("array(", ",", ")"))
    val composed = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .withColumn("cosc", array(cents.map(c => expr(s"cosine_sim(e, $c)")): _*))
    val fused = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .withColumn("cosc", expr(s"cosine_all(e, array(${cents.mkString(",")}))"))
    val a = composed.select($"vec_id", $"cosc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = fused.select($"vec_id", $"cosc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, xs) =>
      assert(xs.zip(b(id)).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      }, s"vec $id: fused cosines differ from composed form")
    }
    // float input widens exactly like cosine_sim's float path
    val f = Tables.embeddings(spark, sf).limit(5)
      .select(
        expr(s"cosine_all(embedding, array(${cents.head}))")(0).as("viaFloat"),
        expr(s"cosine_all(cast(embedding as array<double>), array(${cents.head}))")(0).as("viaDouble"))
      .collect()
    assert(f.forall(r => r.getDouble(0) == r.getDouble(1)))
    // null rules: null vector → NULL; per-centroid length mismatch → null slot
    val nulls = spark.sql(
      s"SELECT cosine_all(CAST(NULL AS ARRAY<DOUBLE>), array(array(1.0d))) AS a, " +
        "cosine_all(array(1.0d, 2.0d), array(array(1.0d), array(3.0d, 4.0d))) AS b").collect().head
    assert(nulls.isNullAt(0))
    val slots = nulls.getSeq[Any](1)
    assert(slots.head == null && slots(1) != null)
  }

  test("rp_signature is bit-identical to the composable sign-bit fold") {
    VectorFunctions.register(spark)
    val dim = Tables.embeddings(spark, sf)
      .selectExpr("size(embedding)").limit(1).collect()(0).getInt(0)
    val rnd = new scala.util.Random(7)
    val planeArrays = (0 until 16).map(_ => Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val planeLits = planeArrays.map(_.map(v => s"${v}D").mkString("array(", ",", ")"))
    val composed = planeLits.zipWithIndex.map { case (p, j) =>
      when(expr(s"dot_product(edbl, $p)") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val df = Tables.embeddings(spark, sf)
      .withColumn("edbl", $"embedding".cast("array<double>"))
      .select($"vec_id", composed.as("a"),
        expr(s"rp_signature(edbl, array(${planeLits.mkString(",")}))").as("b"))
      .collect()
    assert(df.nonEmpty && df.forall(r => r.getLong(1) == r.getLong(2)))
    // null vector → NULL; plane length mismatch → NULL
    val nulls = spark.sql(
      "SELECT rp_signature(CAST(NULL AS ARRAY<DOUBLE>), array(array(1.0d))) AS a, " +
        "rp_signature(array(1.0d, 2.0d), array(array(1.0d))) AS b").collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1), s"row: $nulls")
  }

  test("type check rejects non-numeric arrays and mixed element types") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(1, 2))").collect()
    }
    assert(err.getMessage.contains("cosine_sim"))
    val mixed = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(cast(1 as float), cast(2 as float)))").collect()
    }
    assert(mixed.getMessage.contains("cosine_sim"))
  }

  test("GraftExtensions: a FRESH session built withExtensions resolves every function") {
    // The production wiring (spark.sql.extensions=graft.functions
    // .GraftExtensions) — not the imperative register() the query
    // lambdas use — must deliver the same surface. getOrCreate returns
    // the suite session (ignoring withExtensions) unless the default/
    // active pointers are cleared first; clearing them makes the
    // builder construct a new SparkSession over the SAME SparkContext
    // with the extensions applied.
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
        """SELECT
          |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |  dot_product(array(2.0d, 3.0d), array(4.0d, 5.0d)) AS dp,
          |  size(word_shingles('a b c d', 3)) AS ns,
          |  size(word_shingle_hashes('a b c d', 3)) AS nh,
          |  jaccard_sorted(array(1L, 2L), array(1L, 2L)) AS j,
          |  deflate_len('aaaaaaaaaa') AS dl,
          |  size(wordpiece_tokens('hello')) AS wp
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) === 1.0)
      assert(row.getDouble(1) === 23.0)
      assert(row.getInt(2) === 2 && row.getInt(3) === 2)
      assert(row.getDouble(4) === 1.0)
      assert(row.getInt(5) > 0 && row.getInt(6) >= 2)
    } finally {
      // restore the suite's session pointers; never stop the shared
      // SparkContext
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("RewriteBoundedLevenshtein: bounded compares take the threshold form, results unchanged") {
    VectorFunctions.register(spark)
    // parquet-backed, NOT a local Seq: ConvertToLocalRelation evaluates
    // filters over LocalRelations during the main optimizer batches,
    // before user-provided rules ever see the plan
    val dir = java.nio.file.Files.createTempDirectory("lev_rw").toString
    Seq(
      ("kitten", "sitting"),   // distance 3
      ("flaw", "lawn"),        // distance 2
      ("abc", "abc"),          // distance 0
      ("short", "a much longer string entirely"), // length diff ≫ bound
      (null.asInstanceOf[String], "x")            // null input → dropped
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)

    def thresholded(q: org.apache.spark.sql.DataFrame): Seq[Option[Int]] =
      q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case l: org.apache.spark.sql.catalyst.expressions.Levenshtein =>
              l.threshold.map(_.asInstanceOf[
                org.apache.spark.sql.catalyst.expressions.Literal].value.asInstanceOf[Int])
          }
      }.flatten

    // <= k rewrites to threshold k; results match a driver recompute
    val le = df.filter(expr("levenshtein(a, b) <= 2"))
    assert(thresholded(le) == Seq(Some(2)), "<= bound did not take the threshold form")
    assert(le.select("a").as[String].collect().toSet == Set("flaw", "abc"))

    // < k rewrites to threshold k−1
    val lt = df.filter(expr("levenshtein(a, b) < 3"))
    assert(thresholded(lt) == Seq(Some(2)), "< bound did not take the k-1 threshold form")
    assert(lt.select("a").as[String].collect().toSet == Set("flaw", "abc"))

    // flipped literal side
    val fl = df.filter(expr("3 >= levenshtein(a, b)"))
    assert(thresholded(fl) == Seq(Some(3)), "flipped bound did not rewrite")
    assert(fl.select("a").as[String].collect().toSet == Set("kitten", "flaw", "abc"))

    // an UNBOUNDED use (projection of the raw distance) must not change
    val raw = df.filter($"a".isNotNull)
      .select(expr("levenshtein(a, b)").as("d")).as[Int].collect().sorted.toSeq
    assert(raw == Seq(0, 2, 3, 25))
  }

  test("char_ngrams equals the per-position substring form, incl. non-ASCII and short strings") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val rows = Seq("hello world", "ab", "abc", "", "héllo wörld", "日本語のテスト", "a b")
      .toDF("t")
    // reference = the substring form GUARDED to length ≥ n: Spark's
    // bare sequence(1, stop) DESCENDS when stop < 1 (sequence(1,0) =
    // [1,0]), so the unguarded transform form emits junk ''-grams for
    // short strings where DuckDB's range(1, stop) is simply empty —
    // char_ngrams deliberately has the (correct, oracle-symmetric)
    // empty behavior
    Seq(2, 3, 4).foreach { n =>
      val got = rows.selectExpr(s"char_ngrams(t, $n) AS g").as[Seq[String]].collect()
      val exp = rows.selectExpr(
        s"CASE WHEN length(t) >= $n THEN transform(sequence(1, length(t) - ${n - 1}), i -> substring(t, i, $n)) ELSE array() END AS g")
        .as[Seq[String]].collect()
      assert(got.toSeq == exp.toSeq, s"n=$n diverges from the substring form")
    }
    // corpus-wide parity at fixture scale (the q_langid_trigram input)
    val corpus = Tables.documents(spark, sf)
    val a = corpus.selectExpr("explode(char_ngrams(text, 3)) AS tri")
      .groupBy("tri").count().as[(String, Long)].collect().sortBy(_._1)
    val b = corpus.selectExpr(
        "explode(transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))) AS tri")
      .groupBy("tri").count().as[(String, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "corpus trigram counts diverge")
  }

  test("RewriteTokenCount: size(split(text, ' ')) takes the array-free byte scan, results identical") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    // parity on every edge shape: empty, single token, consecutive
    // spaces (empty tokens count), leading/trailing spaces, multi-byte
    // UTF-8 (no 0x20 inside sequences)
    val rows = Seq("", "a", "a b", "a  b", " a b ", "héllo wörld x", "日本 語 テスト", "   ")
      .toDF("t")
    val viaSplit = rows.selectExpr("CAST(size(split(t, ' ')) AS INT) AS n").as[Int].collect().toSeq
    val viaNative = rows.selectExpr("token_count(t) AS n").as[Int].collect().toSeq
    assert(viaSplit == viaNative, s"split=$viaSplit native=$viaNative")
    // the rule fires: the optimized plan carries token_count, no split
    // (a parquet source — literal rows constant-fold away entirely
    // before any custom rule can be observed)
    val docs = Tables.documents(spark, sf)
    val df = docs.selectExpr("size(split(text, ' ')) AS n")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("token_count"), "rewrite did not fire:\n" + opt)
    assert(!opt.contains("split("), "split survived the rewrite:\n" + opt)
    // a real regex separator must NOT rewrite
    val regex = docs.selectExpr("size(split(text, ' +')) AS n")
    assert(!regex.queryExecution.optimizedPlan.toString.contains("token_count"),
      "regex separator wrongly rewritten")
    // a split whose ARRAY is consumed must survive untouched
    val arr = docs.selectExpr("split(text, ' ') AS a")
    assert(arr.queryExecution.optimizedPlan.toString.contains("split"),
      "array-consuming split wrongly rewritten")
    // null propagates identically
    val nulls = Seq[Option[String]](None).toDF("t")
    assert(nulls.selectExpr("size(split(t, ' '))").collect().head.isNullAt(0))
    assert(nulls.selectExpr("token_count(t)").collect().head.isNullAt(0))
    // and the native form stays inside whole-stage codegen
    val df2 = Tables.documents(spark, sf).selectExpr("size(split(text, ' ')) AS n")
      .filter($"n" > 0)
    df2.collect()
    val p = df2.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("token_count")),
      "token_count fell out of codegen:\n" + p.take(900))
  }

  test("char_ngrams: n < 1 is a clean analysis error, not an eval-time surprise") {
    graft.functions.VectorFunctions.register(spark)
    for (n <- Seq(0, -1)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT char_ngrams('abc', $n)").collect()
      }
      assert(e.getMessage.contains("requires n >= 1"),
        s"n=$n must fail analysis with the bound message, got: ${e.getMessage.take(200)}")
    }
    // boundary: n = 1 stays valid
    val ok = spark.sql("SELECT char_ngrams('abc', 1)").collect()(0).getSeq[String](0)
    assert(ok == Seq("a", "b", "c"))
  }

  test("jaro_winkler matches the DuckDB-validated reference values") {
    VectorFunctions.register(spark)
    // expectations probed against DuckDB jaro_winkler_similarity —
    // the oracle contract the expression is pinned to
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // classic transposition
      ("DIXON", "DICKSONX", 0.8133333333333332),  // unequal lengths + prefix
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // no common prefix
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                 // window 0 ⇒ no matches
      ("x", "y", 0.0),
      ("x", "x", 1.0),                   // single-byte equal: window clamps to 0, not -1
      ("abcd", "abzz", 0.6666666666666666),  // jaro ≤ 0.7 ⇒ NO prefix boost
      ("üüüa", "üüüb", 0.9428571428571428),  // BYTE grain: ü = 2 bytes, prefix cap 4
      ("hello", "hallo", 0.88))
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .withColumn("jw", expr("jaro_winkler(a, b)"))
    val got = df.select($"jw").as[Double].collect().toSeq
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(math.abs(g - want) < 1e-12, s"jw($a, $b) = $g, want $want")
    }
    // empty / null semantics: empty string ⇒ 0.0 (DuckDB contract), null ⇒ null
    val edge = Seq(("", "abc"), ("", "")).toDF("a", "b")
      .withColumn("jw", expr("jaro_winkler(a, b)"))
    assert(edge.select($"jw").as[Double].collect().toSeq === Seq(0.0, 0.0))
    val nul = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')").collect()(0)
    assert(nul.isNullAt(0))
  }

  test("jaro_winkler: interpreted eval equals codegen over fixture names") {
    VectorFunctions.register(spark)
    val names = Tables.part(spark, sf).select($"p_name").limit(200)
      .as[String].collect()
    val pairs = names.take(40).flatMap(a => names.take(40).map(b => (a, b))).toSeq
    val viaExpr = pairs.toDF("a", "b")
      .withColumn("jw", expr("jaro_winkler(a, b)"))
      .select($"jw").as[Double].collect().toSeq
    val direct = pairs.map { case (a, b) =>
      graft.functions.JaroWinklerSim.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    viaExpr.zip(direct).foreach { case (g, w) => assert(g === w) }
    // similarity axioms on real data: identity = 1, symmetry, range
    pairs.zip(direct).foreach { case ((a, b), v) =>
      assert(v >= 0.0 && v <= 1.0)
      if (a == b) assert(v === 1.0)
    }
  }

  test("q_record_linkage: decisions partition all candidate pairs; match class is high-precision") {
    val rows = graft.operators.NearDup.queries("q_record_linkage")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nParts = Tables.part(spark, sf).count()
    // every true pair shares its block ⇒ true pairs across classes = |part|
    assert(rows.values.map(_._2).sum === nParts)
    val (nMatch, tMatch) = rows("match")
    assert(tMatch.toDouble / nMatch > 0.95, s"match precision $tMatch/$nMatch")
    // recall: few true pairs may fall to nonmatch (corrupted on 2+ fields)
    val (_, tNon) = rows.getOrElse("nonmatch", (0L, 0L))
    assert(tNon.toDouble / nParts < 0.10, s"true-pair loss to nonmatch $tNon/$nParts")
  }
}

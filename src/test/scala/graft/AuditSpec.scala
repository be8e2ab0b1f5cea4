package graft

import org.apache.spark.sql.functions._
import graft.operators.{Audit, Learn, SimSearch}

/** Semantic invariants for the dataset-audit bank — the oracle gate
  * pins engine-vs-DuckDB equality; these pin that the NUMBERS mean
  * what the operator claims (divergences non-negative, growth
  * exponents in the lawful band, interpolations between their
  * endpoints, decompositions self-consistent).
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("q_js_drift is a valid bounded divergence: 0 <= jsd_bits <= 1") {
    val r = Audit.queries("q_js_drift")(spark, sf).collect().head
    val jsd = r.getAs[Double]("jsd_bits")
    assert(jsd >= 0.0 && jsd <= 1.0, s"JSD in bits must be in [0,1], got $jsd")
    assert(r.getAs[Long]("na") > 0 && r.getAs[Long]("nb") > 0)
  }

  test("q_js_drift is ~0 on identical slices (self-drift sanity)") {
    // Replay the operator's own formula with a = b: every ln ratio is
    // ln(1) = 0, so the divergence must collapse to exactly 0.
    val docs = Tables.documents(spark, sf)
    val tok = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("t")).agg(count(lit(1)).as("a"))
    val zero = tok
      .withColumn("term", expr(
        "CASE WHEN a > 0 THEN CAST(floor(ln(CAST(2 * a AS DOUBLE) / CAST(a + a AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) ELSE 0 END"))
      .agg(sum(expr("a * term")).as("s")).collect().head.getLong(0)
    assert(zero === 0L)
  }

  test("q_heaps exponent is sublinear; the closed-vocab fixture flattens to ~0") {
    val r = Audit.queries("q_heaps")(spark, sf).collect().head
    val beta = r.getAs[Double]("beta")
    // The synthetic corpus draws from a CLOSED template vocabulary, so
    // V(n) saturates at the first checkpoint and beta collapses to 0 —
    // exactly the "template-stamped corpus" smell the audit exists to
    // catch. A natural corpus would sit near 0.4-0.6.
    assert(beta >= 0.0 && beta < 1.0, s"Heaps beta must be sublinear, got $beta")
    assert(r.getAs[Long]("vocab") <= r.getAs[Long]("tokens"))
    assert(r.getAs[Long]("points") === 64L)
  }

  test("q_gap_fill: observed hours keep their value, interpolated hours lie between neighbors") {
    val rows = Audit.queries("q_gap_fill")(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[String]("src") == "interp"), "fixture must exercise interpolation")
    byType.foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getAs[Long]("h"))
      // the filled series has no holes: one row per hour in [lo, hi]
      val hs = seq.map(_.getAs[Long]("h"))
      assert(hs.zip(hs.tail).forall { case (a, b) => b == a + 1 }, "spine must be dense")
      // every interp value is within [min, max] of the two enclosing obs
      val obsIdx = seq.zipWithIndex.filter(_._1.getAs[String]("src") == "obs").map(_._2)
      seq.zipWithIndex.filter(_._1.getAs[String]("src") == "interp").foreach { case (r, i) =>
        val prev = obsIdx.filter(_ < i).lastOption
        val next = obsIdx.find(_ > i)
        assert(prev.isDefined && next.isDefined, "interp rows must be strictly interior")
        val pv = seq(prev.get).getAs[Long]("filled")
        val nv = seq(next.get).getAs[Long]("filled")
        val v = r.getAs[Long]("filled")
        assert(v >= math.min(pv, nv) && v <= math.max(pv, nv),
          s"interp $v outside [$pv, $nv]")
      }
    }
  }

  test("q_fd_discovery: key-LHS dependencies hold, attribute LHS with fewer classes than rows fails") {
    val rows = Audit.queries("q_fd_discovery")(spark, sf).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("lhs")) ->
        (r.getAs[Boolean]("holds"), r.getAs[Long]("violations"))).toMap
    assert(rows(("orders", "o_orderkey"))._1, "primary key determines every attribute")
    assert(rows(("customer", "c_custkey"))._1)
    assert(rows(("nation", "n_nationkey"))._1)
    // the synthetic lineitem REUSES (orderkey, linenumber) pairs across
    // returnflags — the composite candidate must be DISCOVERED as
    // failing, which is the point of running discovery over assumptions
    assert(!rows(("lineitem", "l_orderkey,l_linenumber"))._1,
      "synthetic lineitem violates the composite candidate")
    assert(rows(("lineitem", "l_orderkey,l_linenumber"))._2 > 0L)
    assert(!rows(("customer", "c_nationkey"))._1, "25 nations cannot determine mktsegment")
    rows.values.foreach { case (holds, v) => assert(holds == (v == 0L) && v >= 0L) }
  }

  test("q_pref_pairs margins are strictly positive and ids distinct") {
    val rows = Audit.queries("q_pref_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("margin") > 0L)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("chosen_score") - r.getAs[Long]("rejected_score")
        === r.getAs[Long]("margin"))
    }
    // at most one pair per (lang, bucket) stratum
    val keys = rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("lb")))
    assert(keys.distinct.length === keys.length)
  }

  test("q_log_odds: three ranked terms per source, z finite, counts consistent") {
    val rows = Audit.queries("q_log_odds")(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L), src)
      rs.foreach { r =>
        assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
        assert(r.getAs[Long]("y") <= r.getAs[Long]("yw"),
          "source count cannot exceed the global count")
      }
      // within a source the z ranking is non-increasing
      val zs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("z"))
      assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_dim_variance: shares partition ~1e6 and the cumulative ends at their sum") {
    val rows = Audit.queries("q_dim_variance")(spark, sf).collect()
      .sortBy(_.getAs[Int]("dim"))
    assert(rows.length === 64)
    val shares = rows.map(_.getAs[Long]("share_micro"))
    assert(shares.forall(s => s >= 0L && s <= 1000000L))
    // truncating DIV loses < 1 micro per dim
    assert(shares.sum <= 1000000L && shares.sum >= 1000000L - 64L)
    assert(rows.last.getAs[Long]("cum_share_micro") === shares.sum)
    rows.foreach(r => assert(r.getAs[Long]("var_s") >= 0L))
  }

  test("q_entropy_rate matches a naive transition-entropy replay and bounds") {
    val r = Audit.queries("q_entropy_rate")(spark, sf).collect().head
    val h = r.getAs[Double]("h_bits")
    val px = r.getAs[Double]("perplexity")
    val nCells = r.getAs[Long]("n_cells")
    // H bounded by log2 of the branching factor (#distinct dst <= 5 types)
    assert(h >= 0.0 && h <= math.log(5.0) / math.log(2.0) + 1e-9)
    assert(math.abs(px - math.pow(2.0, h)) < 0.01, "perplexity must be 2^H")
    assert(nCells <= 25L, "at most |types|^2 transition cells")
    // naive replay from collected transitions
    val tr = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type").collect()
      .groupBy(_.getLong(0)).values.flatMap { rs =>
        val seq = rs.sortBy(_.getLong(1)).map(_.getString(2))
        seq.zip(seq.tail)
      }.toSeq
    val byPair = tr.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bySrc = tr.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = tr.size.toDouble
    val naive = byPair.map { case ((s0, _), c) =>
      (c / n) * math.log(bySrc(s0).toDouble / c)
    }.sum / math.log(2.0)
    assert(math.abs(h - naive) < 1e-3, s"engine $h vs naive $naive")
  }

  test("q_spec_accept: acceptance is a valid ratio and argmax is genuine") {
    val rows = Audit.queries("q_spec_accept")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      val (nOut, topN, acc) = (r.getAs[Long]("n_out"), r.getAs[Long]("top_n"),
        r.getAs[Long]("accept_micro"))
      assert(topN >= 1L && topN <= nOut)
      assert(acc === topN * 1000000L / nOut)
    }
    // rows are the heaviest sources in weight order
    val weights = rows.map(_.getAs[Long]("n_out"))
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b })
  }

  test("q_brier decomposition is self-consistent: bs >= 0, unc = obar(1-obar), rel/res >= 0") {
    val r = Learn.queries("q_brier")(spark, sf).collect().head
    val (bs, rel, res, unc) = (r.getAs[Double]("bs"), r.getAs[Double]("rel"),
      r.getAs[Double]("res"), r.getAs[Double]("unc"))
    assert(bs >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    // Murphy identity bs = rel - res + unc holds up to within-bin
    // variance of p-hat (non-negative) plus integer-truncation dust:
    // the directly measured bs must not exceed the identity's bound by
    // more than the wbv-free reconstruction, and never undershoot it
    // by more than rounding dust.
    assert(bs >= rel - res + unc - 1e-3,
      s"bs=$bs < rel-res+unc=${rel - res + unc} beyond truncation dust")
  }

  test("q_mrl_recall: recall is monotone-ish in dm and exact at dm=64") {
    val rows = SimSearch.queries("q_mrl_recall")(spark, sf).collect()
      .map(r => r.getAs[Int]("dm") -> r.getAs[Long]("hits")).toMap
    assert(rows(64) === 10L, "full-dim recall against itself must be 10/10")
    assert(rows.keySet === Set(8, 16, 32, 64))
    rows.values.foreach(h => assert(h >= 0L && h <= 10L))
    assert(rows(32) >= rows(8) - 2,
      "wider prefixes should not collapse far below narrower ones")
  }
}

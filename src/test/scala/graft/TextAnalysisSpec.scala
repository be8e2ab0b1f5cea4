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
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** Unit semantics of the reference dataflow (SURVEY §5.2): header
  * extraction null/case/first-match rules, label CSV empty case,
  * anti-join edge cases, last-wins dedup, suffix filter, normalization.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def headerDf(rows: Seq[(String, Seq[(String, String)])]) =
    rows.toDF("id", "hs").withColumn("headers",
      expr("transform(hs, h -> named_struct('name', h._1, 'value', h._2))"))

  private val extract =
    "get(filter(headers, h -> lower(h.name) = 'subject'), 0).value"

  test("header extraction: case-insensitive first match") {
    val df = headerDf(Seq(
      ("a", Seq("SUBJECT" -> "upper", "subject" -> "dup")),
      ("b", Seq("X-Other" -> "x", "Subject" -> "mixed")),
      ("c", Seq("X-Other" -> "x"))))
    val got = df.selectExpr("id", s"$extract AS subject")
      .orderBy("id").as[(String, Option[String])].collect().toSeq
    assert(got === Seq("a" -> Some("upper"), "b" -> Some("mixed"), "c" -> None))
  }

  test("header extraction: absent header is null, matching main.py None default") {
    val df = headerDf(Seq(("a", Seq.empty[(String, String)])))
    assert(df.selectExpr(s"$extract AS subject").collect() === Array(Row(null)))
  }

  test("labels csv: empty array joins to empty string (main.py:203)") {
    val df = Seq(Seq("INBOX", "SENT"), Seq.empty[String]).toDF("labelIds")
    val got = df.select(array_join($"labelIds", ",")).as[String].collect().toSeq
    assert(got === Seq("INBOX,SENT", ""))
  }

  test("anti-join: empty build side passes everything (main.py:102-104 done safely)") {
    val left = Seq("a", "b").toDF("id")
    val empty = Seq.empty[String].toDF("id")
    assert(left.join(empty, Seq("id"), "left_anti").count() === 2)
  }

  test("anti-join: full overlap drops everything") {
    val left = Seq("a", "b").toDF("id")
    assert(left.join(left, Seq("id"), "left_anti").count() === 0)
  }

  test("last-wins dedup keeps the later page (main.py:205)") {
    val got = Ingest.queries("q_dedup_lastwins")(spark, sf)
      .filter($"page" === 2).selectExpr("subject").as[String].collect()
    assert(got.nonEmpty && got.filter(_ != null).forall(_.startsWith("RE: ")))
    // every id appears exactly once post-dedup
    val ids = Ingest.queries("q_dedup_lastwins")(spark, sf).groupBy("id")
      .count().filter($"count" > 1).count()
    assert(ids === 0)
  }

  test("label predicate covers every branch of main.py:160") {
    val raw = Ingest.emailsRaw(spark, sf)
    val kept = Ingest.queries("q_filter_labels")(spark, sf).count()
    val total = raw.count()
    assert(kept > 0 && kept < total)
    // no SPAM survives
    val spam = raw.filter(expr(
      "arrays_overlap(labelIds, array('INBOX','SENT','TRASH')) AND NOT array_contains(labelIds,'SPAM')"))
      .filter(array_contains($"labelIds", "SPAM")).count()
    assert(spam === 0)
  }

  test("suffix filter drops .json (main.py:122-125)") {
    val got = Ingest.queries("q_ext_filter")(spark, sf)
    assert(got.filter($"name".endsWith(".json")).count() === 0)
    assert(got.count() > 0)
  }

  test("normalization: @ and . become _ (app.py:45-48)") {
    val got = Ingest.queries("q_normalize")(spark, sf)
      .selectExpr("token_file").as[String].head()
    assert(got === "user_token_user0_example_com.json")
  }

  test("e2e: no sink ids survive, thread_id never null") {
    val out = Ingest.queries("q_ingest_e2e")(spark, sf)
    val sink = Ingest.sinkIds(spark, sf)
    assert(out.join(sink, Seq("id"), "left_semi").count() === 0)
    assert(out.filter($"thread_id".isNull).count() === 0)
    assert(out.count() > 0)
  }
}

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
}

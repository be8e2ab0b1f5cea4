package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Span-grain corpus curation (SURVEY §2.6 north-star, beyond the
  * reference's surface): the operations between "document-level dedup"
  * and "training shards" that act on pieces OF documents — RAG-style
  * chunking, passage-level exact dedup (the distributed, passage-grain
  * analogue of Lee et al.'s "Deduplicating Training Data Makes
  * Language Models Better" suffix-array substring dedup), and
  * duplicate-span removal with document reconstruction.
  *
  * Passages are consecutive NON-overlapping 16-token blocks (the
  * fixture corpus is single-space word soup with no sentence/paragraph
  * boundaries, so fixed token blocks are the natural span unit; with
  * real text the splitter would be paragraph/sentence-aware and
  * everything downstream is unchanged). Chunks are OVERLAPPING
  * 32-token windows at stride 24 — the retrieval-index form, where
  * overlap prevents answers straddling a boundary.
  *
  * Scale posture:
  *  - chunking is MAP-ONLY (split + windowed slice + explode) — at
  *    100 TB it runs at scan speed and emits ~n/stride rows per doc.
  *  - passage dedup shuffles the 32-hex md5 fingerprint of each
  *    passage, NEVER the passage text (the q_dedup_exact posture at
  *    passage grain). Canonical-occurrence choice is a window over
  *    each fingerprint's tiny occurrence group.
  *  - reconstruction re-groups surviving passages by doc_id — the
  *    second and last shuffle; payload is the surviving text exactly
  *    once. A doc whose every passage duplicates an earlier one
  *    vanishes (the degenerate case IS document dedup).
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** Passage block size (tokens). */
  private val B = 16

  /** Corpus with injected cross-document duplicate spans: every 4th
    * doc gets a "quoting" twin (doc_id + 1,000,000) carrying its first
    * 32 tokens verbatim — two full passages of exact overlap, the
    * fixture analogue of boilerplate/quotation reuse. (The raw word
    * soup has no natural 16-token repeats; same injection precedent as
    * q_dedup_exact's mirrored copies.)
    */
  private def spanCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val quotes = docs.filter(col("doc_id") % 4 === 0)
      .selectExpr("doc_id + 1000000 AS doc_id",
        "array_join(slice(split(text, ' '), 1, 32), ' ') AS text")
    docs.unionByName(quotes)
  }

  /** (doc_id, pos, ptext): doc → non-overlapping B-token passages.
    * sequence(0, (n-1) div B) enumerates exactly ceil(n/B) block
    * indices; the trailing block keeps its short remainder so every
    * token belongs to exactly one passage.
    */
  private def passages(corpus: DataFrame): DataFrame =
    corpus
      .selectExpr("doc_id", "split(text, ' ') AS tk")
      .selectExpr("doc_id",
        s"posexplode(transform(sequence(0, cast((size(tk) - 1) / $B as int)), " +
          s"b -> array_join(slice(tk, b * $B + 1, $B), ' '))) AS (pos, ptext)")

  /** DuckDB twin of [[spanCorpus]] + [[passages]]: the quote-twin
    * corpus, then lateral block-index enumeration (range cross join +
    * bound filter ≡ Spark's sequence upper bound) with 1-based
    * inclusive list_slice ≡ Spark's (start, length) slice.
    */
  private val passCtes =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(list_slice(string_split(text, ' '), 1, 32), ' ') AS text
       |  FROM documents WHERE doc_id % 4 = 0),
       |tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
       |pass AS (
       |  SELECT doc_id, b AS pos,
       |    array_to_string(list_slice(tk, b * $B + 1, b * $B + $B), ' ') AS ptext
       |  FROM tok, (SELECT unnest(range(0, 4096)) AS b)
       |  WHERE b * $B < len(tk))""".stripMargin

  val queries: Map[String, Q] = Map(
    // RAG-style chunking: overlapping 32-token windows at stride 24
    // (8-token overlap). Map-only — the transform/posexplode sits
    // directly on the scan; chunk_id is the window ordinal, and the
    // (doc_id, chunk_id) pair is the retrieval-index key.
    "q_chunk" -> ((s, d) => {
      Tables.documents(s, d)
        .selectExpr("doc_id", "split(text, ' ') AS tk")
        .selectExpr("doc_id",
          "posexplode(transform(sequence(0, cast((size(tk) - 1) / 24 as int)), " +
            "b -> slice(tk, b * 24 + 1, 32))) AS (chunk_id, ck)")
        .selectExpr("doc_id", "cast(chunk_id as bigint) AS chunk_id",
          "cast(size(ck) as bigint) AS n_chunk_tokens",
          "array_join(ck, ' ') AS chunk_text")
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Passage-grain duplication report: per document, how many of its
    // B-token passages are non-canonical copies of a passage seen
    // earlier (global first occurrence by (doc_id, pos) keeps the
    // copy; everything else counts as duplicated). The quote twins
    // score dup_frac 1.0; their sources stay 0.
    "q_passage_dup_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("pos"))
      passages(spanCorpus(s, d))
        .withColumn("fp", md5(col("ptext")))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_pass"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac", round(col("n_dup") / col("n_pass"), 4))
        .orderBy(col("doc_id"))
    }),

    // Duplicate-span REMOVAL with reconstruction (Lee et al.'s ExactSubstr
    // at passage grain): drop every passage whose fingerprint occurred
    // earlier anywhere in the corpus, then rebuild each document from
    // its surviving passages in position order. Docs that lose every
    // passage (the quote twins) disappear — full-document dedup is the
    // degenerate case. collect_list is order-nondeterministic, so the
    // (pos, ptext) structs are array_sort'ed before joining; pos is
    // unique per doc, making the rebuild deterministic.
    "q_doc_reconstruct" -> ((s, d) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("pos"))
      passages(spanCorpus(s, d))
        .withColumn("fp", md5(col("ptext")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("ptext")))),
              x => x.getField("ptext")), " ").as("clean_text"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_chunk" ->
      """SELECT doc_id, b AS chunk_id,
        |  CAST(len(list_slice(tk, b * 24 + 1, b * 24 + 32)) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(tk, b * 24 + 1, b * 24 + 32), ' ') AS chunk_text
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |     (SELECT unnest(range(0, 4096)) AS b)
        |WHERE b * 24 < len(tk)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_passage_dup_stats" ->
      s"""$passCtes
         |SELECT doc_id, count(*) AS n_pass,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / count(*), 4) AS dup_frac
         |FROM (SELECT doc_id, pos,
         |        row_number() OVER (PARTITION BY md5(ptext) ORDER BY doc_id, pos) AS rn
         |      FROM pass)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_reconstruct" ->
      s"""$passCtes
         |SELECT doc_id, count(*) AS n_kept,
         |  string_agg(ptext, ' ' ORDER BY pos) AS clean_text
         |FROM (SELECT doc_id, pos, ptext,
         |        row_number() OVER (PARTITION BY md5(ptext) ORDER BY doc_id, pos) AS rn
         |      FROM pass)
         |WHERE rn = 1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}

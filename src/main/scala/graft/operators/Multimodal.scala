package graft.operators

import graft.operators.PlanStash.Ckpt
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators (SURVEY §2.6, north-star): media
  * payloads ride relational rows as opaque `binary` columns with typed
  * metadata beside them. The decode itself is STUBBED — this container
  * has no image/audio codecs — with a deterministic fake
  * ([[FakeDecode.decode]]); everything Spark-owned around it (binary
  * schema, typed Dataset boundary, per-partition batching, metadata
  * struct shape) is real and oracle-checked where SQL-expressible.
  *
  * Scale posture: blobs stay columnar in parquet and are never
  * shuffled — decode is a map-only `mapPartitions` stage; the metadata
  * aggregate afterwards shuffles only the small typed struct. At
  * 100 TB the decode stage's unit of parallelism is the parquet
  * row-group, so `spark.sql.files.maxPartitionBytes` bounds executor
  * memory per task regardless of blob sizes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A row carrying an opaque media payload + its relational context. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)

  /** Decoded metadata — the typed result of the (stubbed) codec. */
  case class MediaMeta(doc_id: Long, lang: String, n_bytes: Long,
                       width: Int, height: Int, format: String)

  /** Deterministic stand-in for a real codec: metadata derives from the
    * byte payload alone, so the same bytes always "decode" identically.
    * A real deployment swaps only this function; the Spark plumbing
    * (schema, batching, partitioning) is unchanged.
    */
  object FakeDecode {
    def decode(doc_id: Long, lang: String, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        doc_id, lang, n,
        width = (n % 512 + 1).toInt,
        height = (n % 384 + 1).toInt,
        format = if (n % 2 == 0) "png" else "jpeg")
    }
  }

  /** Feature vector extracted from a payload — the stand-in for an
    * image/audio embedding stage. Features are exact integer/ratio
    * statistics so the SQL oracle can replay them; a real extractor
    * swaps the function body, not the Spark plumbing.
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
                           n_distinct_bytes: Int)

  /** Feature-extract stage: typed mapPartitions over raw bytes (the
    * batched-inference shape — an ONNX/JNI extractor would amortize
    * model init across each partition's iterator).
    */
  def features(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d).mapPartitions { rows =>
      rows.map { r =>
        var sum = 0L
        val seen = new java.util.BitSet(256)
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xff
          sum += b; seen.set(b); i += 1
        }
        MediaFeatures(r.doc_id, r.payload.length.toLong, sum, seen.cardinality())
      }
    }
  }

  /** 32-bit block-luminance perceptual signature of a payload — the
    * pHash idea at byte granularity: bit k is set iff block k's byte
    * mass exceeds the payload average (32 · blocksum_k > truncated
    * total — all-integer, so the SQL oracle replays it exactly).
    * A one-byte edit moves one block's sum slightly → hamming distance
    * 0–1 from the original; unrelated payloads differ in ~16 bits.
    * Computed in the same typed mapPartitions slot as the codec stub —
    * a real pipeline's pHash/aHash runs exactly there, on decoded
    * pixels instead of raw bytes.
    */
  case class MediaSig(doc_id: Long, sig: Long)

  def phashed(rows: Dataset[MediaRow]): Dataset[MediaSig] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val w = n / 32 // block width; payloads shorter than 32 bytes → sig 0
        var sig = 0L
        if (w > 0) {
          val bs = new Array[Long](32)
          var total = 0L
          var k = 0
          while (k < 32) {
            var i = k * w; val end = i + w; var acc = 0L
            while (i < end) { acc += (r.payload(i) & 0xff); i += 1 }
            bs(k) = acc; total += acc; k += 1
          }
          k = 0
          while (k < 32) { if (32L * bs(k) > total) sig |= (1L << k); k += 1 }
        }
        MediaSig(r.doc_id, sig)
      }
    }
  }

  /** documents.text reinterpreted as an opaque binary payload — the
    * fixture stand-in for an image/audio blob column.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .selectExpr("doc_id", "cast(text as binary) AS payload", "lang")
      .as[MediaRow]
  }

  /** The decode stage: typed mapPartitions over binary payloads —
    * exactly where a real codec (or batched model inference) plugs in.
    * Partition-at-a-time so a vectorized/native decoder can amortize
    * init cost across its batch.
    */
  def decoded(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, d).mapPartitions { rows =>
      rows.map(r => FakeDecode.decode(r.doc_id, r.lang, r.payload))
    }
  }

  /** Verified pHash near-dup pairs (hamming ≤ 3) over the
    * media-payload corpus (documents ∪ every-6th near-copy) — Manku
    * 4×8-bit chunk blocking, first-equal-chunk emission, exact
    * bit_count verify. Shared by q_media_phash (the pair bank) and
    * q_media_cluster (its connected-component closure). */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).selectExpr("doc_id", "text")
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 6 === 0)
        .selectExpr("doc_id + 1000000 AS doc_id",
          "concat('x', substr(text, 2)) AS text"))
      .selectExpr("doc_id", "cast(text as binary) AS payload", "'bin' AS lang")
      .as[MediaRow]
    val sigs = phashed(corpus).toDF()
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(expr("sequence(0, 3)")).as("c"))
      .withColumn("cv", expr("shiftright(sig, cast(c * 8 as int)) & 255"))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sig").as("ha"), col("y.sig").as("hb"), col("x.c").as("c"))
      .filter(expr(
        """c = 0
          |OR (c = 1 AND (ha & 255) != (hb & 255))
          |OR (c = 2 AND (ha & 255) != (hb & 255)
          |    AND (shiftright(ha, 8) & 255) != (shiftright(hb, 8) & 255))
          |OR (c = 3 AND (ha & 255) != (hb & 255)
          |    AND (shiftright(ha, 8) & 255) != (shiftright(hb, 8) & 255)
          |    AND (shiftright(ha, 16) & 255) != (shiftright(hb, 16) & 255))""".stripMargin))
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as int)"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  val queries: Map[String, Q] = Map(
    // Binary column plumbing: payload sizes + headers, SQL-checkable.
    "q_media_bytes" -> ((s, d) =>
      Tables.documents(s, d).selectExpr(
        "doc_id",
        "cast(octet_length(text) as bigint) AS n_bytes",
        "hex(substring(cast(text as binary), 1, 4)) AS magic_hex",
        "md5(text) AS payload_md5")
        .orderBy(col("doc_id"))),

    // Decode stub end-to-end: binary → typed metadata via mapPartitions;
    // the oracle replays FakeDecode's arithmetic in SQL.
    "q_media_decode" -> ((s, d) =>
      decoded(s, d).toDF()
        .select(col("doc_id"), col("lang"), col("n_bytes"),
          col("width"), col("height"), col("format"))
        .orderBy(col("doc_id"))),

    // Frame sampling: K fixed-stride samples per payload (the video
    // frame-sample plumbing — posexplode gives (payload, frame_idx) →
    // a per-frame decode stage would map over exactly this shape).
    // Frames are 16-byte windows at stride n/4; short payloads yield
    // fewer frames, like a short clip.
    "q_media_frames" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id", "cast(text as binary) AS payload",
          "cast(octet_length(text) as int) AS n")
        .selectExpr("doc_id",
          "posexplode(transform(sequence(0, 3), k -> substring(payload, k * (n DIV 4) + 1, 16)))")
        .selectExpr("doc_id", "pos AS frame_idx", "hex(col) AS frame_hex")
        .filter(length(col("frame_hex")) > 0)
        .orderBy(col("doc_id"), col("frame_idx"))),

    // Feature extraction: exact byte statistics per payload (the
    // rounding happens in the plan, not the extractor, so both
    // engines round the same exact integer ratio).
    "q_media_features" -> ((s, d) =>
      features(s, d).toDF()
        .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
          round(col("byte_sum") / col("n_bytes"), 4).as("mean_byte"),
          col("n_distinct_bytes"))
        .orderBy(col("doc_id"))),

    // Resize stage: integer aspect-preserving fit into 224×224 (the
    // standard vision-model preprocessing). Only the dimension math is
    // computed here — a real resample kernel runs inside the same
    // mapPartitions slot as FakeDecode; dims are what the planner and
    // the downstream batch-shape care about. All-integer arithmetic so
    // the oracle replays it exactly.
    "q_media_resize" -> ((s, d) =>
      decoded(s, d).toDF()
        .withColumn("out_w", expr("greatest(1, (width * 224) div greatest(width, height))"))
        .withColumn("out_h", expr("greatest(1, (height * 224) div greatest(width, height))"))
        .select(col("doc_id"), col("width"), col("height"),
          col("out_w"), col("out_h"),
          (col("out_w") <= 224 && col("out_h") <= 224 &&
            (col("out_w") === 224 || col("out_h") === 224)).as("fits"))
        .orderBy(col("doc_id"))),

    // Perceptual-hash near-dup across media payloads — the multimodal
    // twin of q_dedup_simhash: 32-bit block-luminance signatures
    // (computed at the codec boundary, see [[phashed]]), candidates
    // via Manku 4×8-bit chunk blocking (pigeonhole: hamming ≤ 3 ⇒ at
    // least one equal chunk), each pair emitted once from its first
    // equal chunk, exact hamming verify. Near-dup pressure: every 6th
    // doc gets a one-byte-edited twin (+1,000,000) — a re-encoded /
    // slightly-corrupted copy of the same asset. 100 TB posture:
    // signatures are 8 bytes/payload, the join ships (chunk, value)
    // keys — payload bytes never shuffle.
    "q_media_phash" -> ((s, d) =>
      phashPairs(s, d).orderBy(col("a_id"), col("b_id"))),


    // Perceptual-hash DEDUP CLUSTERING — the multimodal twin of
    // q_dedup_cluster: verified hamming ≤ 3 pairs become undirected
    // edges, connected components ride the SAME alternating
    // large-star/small-star engine (Graph.alternatingStar, O(log² n)
    // join-free rounds), every media row gets its component label
    // (singletons via left join, label = min doc_id), and the
    // canonical flag marks the keeper. This is the delete-list
    // generator for image/video near-dups — pair detection alone
    // (q_media_phash) can't say "keep one per group" when dups chain
    // A~B~C. Shuffles carry 32-bit signatures and ids; payload bytes
    // never move. Oracle: brute-force pair bank + recursive-CTE
    // closure (the q_dedup_cluster recipe).
    "q_media_cluster" -> ((s, d) => {
      val e = phashPairs(s, d)
        .select(col("a_id").as("u"), col("b_id").as("v"))
        .ckpt()
      // the NearDup.clusterLabels convergence schedule: geometric
      // round chunks, one driver-side fixpoint probe per chunk
      var chunk = 3; var total = 0
      var star = Graph.alternatingStar(e, chunk).ckpt()
      total += chunk
      var converged = Graph.starConverged(star)
      while (!converged && total < 96) {
        chunk *= 2
        star = Graph.alternatingStar(star, chunk).ckpt()
        total += chunk
        converged = Graph.starConverged(star)
      }
      require(converged, s"media CC did not converge in $total round pairs")
      val docs = Tables.documents(s, d).selectExpr("doc_id")
      val all = docs.unionByName(
        docs.filter(col("doc_id") % 6 === 0).selectExpr("doc_id + 1000000 AS doc_id"))
      all.join(star.select(col("u").as("doc_id"), col("v").as("root")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
        .withColumn("canonical", col("cluster_id") === col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Metadata rollup after decode: the relational side of multimodal.
    "q_media_agg" -> ((s, d) =>
      decoded(s, d).toDF()
        .groupBy(col("lang"), col("format"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          round(avg(col("width")), 4).as("avg_width"))
        .orderBy(col("lang"), col("format")))
  )

  val oracles: Map[String, String] = Map(
    // ASCII fixture (chars == bytes): the signature replays in SQL as
    // integer list folds, and the tiny corpus brute-forces all pairs.
    "q_media_phash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'x' || substr(text, 2) AS text
        |  FROM documents WHERE doc_id % 6 = 0),
        |bytes AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> ascii(c)) AS bs,
        |    octet_length(encode(text)) // 32 AS w
        |  FROM corpus),
        |blocks AS (
        |  SELECT doc_id, w,
        |    list_transform(range(0, 32), k ->
        |      CAST(list_aggregate(list_slice(bs, k * w + 1, k * w + w), 'sum') AS BIGINT)) AS sums
        |  FROM bytes),
        |sigs AS (
        |  SELECT doc_id,
        |    CASE WHEN w = 0 THEN 0 ELSE
        |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), k ->
        |        CASE WHEN 32 * sums[k + 1] > list_aggregate(sums, 'sum')
        |             THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END)),
        |        (a, b) -> a + b)
        |    END AS sig
        |  FROM blocks)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |  CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
        |FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.sig, y.sig)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // Brute-force pHash pair bank + recursive transitive closure (the
    // q_dedup_cluster oracle recipe) — min reachable id per node.
    "q_media_cluster" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, 'x' || substr(text, 2) AS text
        |  FROM documents WHERE doc_id % 6 = 0),
        |bytes AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> ascii(c)) AS bs,
        |    octet_length(encode(text)) // 32 AS w
        |  FROM corpus),
        |blocks AS (
        |  SELECT doc_id, w,
        |    list_transform(range(0, 32), k ->
        |      CAST(list_aggregate(list_slice(bs, k * w + 1, k * w + w), 'sum') AS BIGINT)) AS sums
        |  FROM bytes),
        |sigs AS (
        |  SELECT doc_id,
        |    CASE WHEN w = 0 THEN 0 ELSE
        |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), k ->
        |        CASE WHEN 32 * sums[k + 1] > list_aggregate(sums, 'sum')
        |             THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END)),
        |        (a, b) -> a + b)
        |    END AS sig
        |  FROM blocks),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.sig, y.sig)) <= 3),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
        |SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS cluster_id,
        |  coalesce(l.cluster_id, c.doc_id) = c.doc_id AS canonical
        |FROM corpus c LEFT JOIN labels l ON l.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    // DuckDB: VARCHAR → BLOB is encode(); BLOBs don't slice, so the
    // 4-byte magic is substring of the full hex (2 hex chars/byte).
    "q_media_bytes" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | substring(hex(encode(text)), 1, 8) AS magic_hex,
        | md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_media_decode" ->
      """SELECT doc_id, lang,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 512 + 1 AS INT) AS width,
        | CAST(octet_length(encode(text)) % 384 + 1 AS INT) AS height,
        | CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // fixture text is pure ASCII (verified), so VARCHAR substr offsets
    // equal the byte offsets Spark uses on the binary payload
    "q_media_frames" ->
      """SELECT doc_id, frame_idx, frame_hex FROM (
        |  SELECT doc_id, k AS frame_idx,
        |    hex(encode(substr(text, CAST(k * (octet_length(encode(text)) // 4) + 1 AS INT), 16))) AS frame_hex
        |  FROM documents, (SELECT unnest(range(0, 4)) AS k))
        |WHERE length(frame_hex) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // ASCII fixture: chars == bytes, so ascii() per char replays the
    // byte loop exactly
    "q_media_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'sum') AS BIGINT) AS byte_sum,
        | round(CAST(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'sum') AS BIGINT)
        |       / octet_length(encode(text)), 4) AS mean_byte,
        | CAST(len(list_distinct(string_split(text, ''))) AS INT) AS n_distinct_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_media_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) % 512 + 1 AS INT) AS width,
        |    CAST(octet_length(encode(text)) % 384 + 1 AS INT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(greatest(1, (width * 224) // greatest(width, height)) AS INT) AS out_w,
        |  CAST(greatest(1, (height * 224) // greatest(width, height)) AS INT) AS out_h,
        |  (greatest(1, (width * 224) // greatest(width, height)) <= 224
        |   AND greatest(1, (height * 224) // greatest(width, height)) <= 224
        |   AND (greatest(1, (width * 224) // greatest(width, height)) = 224
        |        OR greatest(1, (height * 224) // greatest(width, height)) = 224)) AS fits
        |FROM dims ORDER BY doc_id""".stripMargin,

    "q_media_agg" ->
      """SELECT lang,
        | CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        | count(*) AS n,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | round(avg(octet_length(encode(text)) % 512 + 1), 4) AS avg_width
        |FROM documents GROUP BY 1, 2 ORDER BY lang, format""".stripMargin
  )
}

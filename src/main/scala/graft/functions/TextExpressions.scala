package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-separated text.
  *
  * The composable form —
  * `array_distinct(transform(sequence(1, size(toks)-2), i -> concat(...)))`
  * — pays the higher-order-function tax: every lambda invocation goes
  * through interpreted expression evaluation (~36 µs/shingle measured
  * at sf0.1, which made shingling dominate the whole near-dup
  * pipeline). This expression is one JVM pass per document: split,
  * slide, hash-set distinct. It deliberately stays a `CodegenFallback`
  * — the inner loop is plain JVM code, so codegen would only inline
  * the call; the win (no per-element lambda dispatch) is already
  * realized in eval.
  *
  * Output order is first-occurrence, matching
  * `array_distinct(transform(...))`; all consumers (min-hash, set
  * intersect/union sizes) are order-insensitive, as is the DuckDB
  * oracle's independent `list_distinct` computation.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(text: Any, nGram: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = nGram.asInstanceOf[Int]
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles, each hashed to a 60-bit integer (the
  * first 15 hex digits of its md5, read base-16 — always positive, so
  * engine-portable), returned **sorted ascending**.
  *
  * Exact near-dup verification intersects shingle sets per candidate
  * pair; over ~25-char strings that's byte-wise hashing and equality
  * inside the pair loop. Hashing once at shingle creation makes the
  * pairwise set ops integer work — and because the DuckDB oracle
  * replays the identical md5-prefix hash, results (including the
  * astronomically unlikely collision) match exactly.
  *
  * The sort makes the array's order a *global total order over shingle
  * hashes*, which buys two scale properties downstream: prefix
  * filtering (a slice of the array IS the similarity-join prefix) and
  * O(|a|+|b|) merge-based set ops ([[SortedJaccard]]) instead of
  * hash-set intersect/union per pair. Every consumer is either
  * order-insensitive (array_intersect/list_intersect) or requires
  * exactly this order.
  */
case class WordShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(text: Any, nGram: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = nGram.asInstanceOf[Int]
    val md = WordShingleHashes.digest.get()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val h = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits == top 60 bits of the first 8 bytes
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      out.add(v >>> 4)
      i += 1
    }
    val longs = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { longs(k) = it.next().longValue(); k += 1 }
    java.util.Arrays.sort(longs)
    val arr = new Array[Any](longs.length)
    k = 0
    while (k < longs.length) { arr(k) = longs(k); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingleHashes {
  private[functions] val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
}

/** POSITIONAL n-token window hashes: the hash of every n-token sliding
  * window of the text, at every token offset, IN OFFSET ORDER — no
  * distinct, no sort. Same 60-bit md5-prefix per window as
  * [[WordShingleHashes]] (so the DuckDB twin fold replays it
  * bit-for-bit), but where that expression answers "which shingles
  * does this doc contain" (set semantics, for Jaccard/minhash), this
  * one answers "what is at offset i" — the stride-1 fingerprint stream
  * substring-grain dedup (Lee et al. 2022 ExactSubstr) needs, where a
  * window's POSITION locates the duplicate span for removal.
  *
  * One JVM pass per document; the per-window digest is O(n·L) chars
  * total — the fixture-honest cost. At larger window lengths the md5
  * swaps for a Rabin-Karp rolling polynomial inside this same
  * expression without touching any consumer (the output contract is
  * just "deterministic 60-bit window fingerprints in offset order").
  */
case class WordWindowHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_window_hashes"

  override def nullSafeEval(text: Any, nGram: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = nGram.asInstanceOf[Int]
    val md = WordShingleHashes.digest.get()
    val m = math.max(toks.length - n + 1, 0)
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val h = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      arr(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |a∩b| / |a∪b| of two **sorted, distinct**
  * `array<bigint>` columns (the [[WordShingleHashes]] output contract)
  * via a single O(|a|+|b|) sorted-merge — no intermediate intersection
  * or union arrays.
  *
  * The composable form `size(array_intersect(a,b)) / size(array_union
  * (a,b))` builds two hash sets and materializes two arrays per pair;
  * inside an all-pairs similarity join the pair loop runs millions of
  * times per block, and those allocations dominated the entire near-dup
  * bench. This expression allocates nothing and participates in
  * whole-stage codegen.
  *
  * Null semantics match the division form: any null input or null
  * element yields NULL, and an empty union (two empty sets) yields NULL
  * exactly like Spark's 0/0 division.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n1 = xs.numElements(); val n2 = ys.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n1 && j < n2) {
      if (xs.isNullAt(i) || ys.isNullAt(j)) return null
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n1 + n2 - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n1 = $a.numElements(); int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n1 && $j < $n2) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) {
         |  int $union = $n1 + $n2 - $inter;
         |  if ($union == 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = (double) $inter / (double) $union; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DEFLATE-compressed byte length of a string — the compressibility
  * quality signal: highly repetitive machine-generated or boilerplate
  * text compresses far below natural prose, so
  * `deflate_len(text) / octet_length(text)` is a cheap one-pass junk
  * detector (the information-density cousin of the Gopher repetition
  * fractions, which count duplicate shingles explicitly).
  *
  * Level 6 (zlib default) on the JDK's bundled zlib; a ThreadLocal
  * Deflater is reset per value, so the hot loop allocates nothing but
  * the UTF-8 byte view. Deterministic for a given input, which is all
  * the pipeline contract needs (the ratio feeds a threshold filter).
  * Stays a CodegenFallback: the work IS the native deflate call, so
  * codegen could only inline the dispatch around it.
  *
  * No DuckDB oracle — SQL engines don't expose raw DEFLATE — so the
  * consuming query is spec-pinned (bounds, monotonicity vs repetition,
  * determinism) instead of hash-compared.
  */
case class DeflateLen(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(text: Any): Any = {
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val d = DeflateLen.deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateLen.buf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(6))
  private val buf = ThreadLocal.withInitial[Array[Byte]](
    () => new Array[Byte](8192))
}

/** Longest-common-subsequence length over two token arrays — the
  * ROUGE-L core (Lin 2004). One rolling-row dynamic program per pair:
  * O(min memory) in the shorter of the rows, O(n·m) time with plain
  * int arithmetic and UTF8String equality — the whole cost is the DP
  * loop itself, so this stays a CodegenFallback like [[DeflateLen]]
  * (generated code would wrap the same loop).
  *
  * Null handling: a null ARRAY yields null (BinaryExpression default);
  * a null ELEMENT matches nothing (tokens from split are never null —
  * the case is pinned so drift fails loudly as a 0, not an NPE).
  */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_tokens"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bArr = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bArr(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    val row = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      var prevDiag = 0 // old[j] entering column j+1
      j = 0
      while (j < m) {
        val oldRight = row(j + 1) // old[j+1], about to be overwritten
        row(j + 1) =
          if (ai != null && bArr(j) != null && ai.equals(bArr(j))) prevDiag + 1
          else math.max(oldRight, row(j)) // row(j) already holds new[j]
        prevDiag = oldRight
        j += 1
      }
      i += 1
    }
    row(m)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Greedy longest-match wordpiece segmentation (the WordPiece /
  * BERT-tokenizer algorithm, Wu et al. 2016): each whitespace word is
  * consumed left-to-right by the LONGEST vocab piece at the cursor
  * (max piece length 4 here), continuation pieces carry the `##`
  * prefix. This is the real subword-segmentation control flow — an
  * unbounded per-word loop no SQL engine expresses, hence the
  * consuming query is spec-pinned (reassembly, vocab membership,
  * greedy-longest invariants) rather than DuckDB-hashed.
  *
  * The vocabulary is a deterministic stand-in, same framing as
  * q_classifier_score's weights: every single character is a piece
  * (so segmentation never dead-ends — BERT's [UNK] path collapses to
  * char fallback), and a multi-char substring is a piece iff
  * `(hashCode & 0x7fffffff) % 5 == 0` (~20% of substrings; JVM
  * String.hashCode is specified, so the vocab is stable across runs
  * and machines). Swapping in a trained vocab replaces the predicate
  * with a set lookup — the greedy loop, the expression, and every
  * consumer are unchanged.
  *
  * One JVM pass per document, no per-piece lambda dispatch — the same
  * reason word_shingles exists. Stays a CodegenFallback: the work is
  * the inner matching loop, not expression dispatch.
  */
case class WordpieceTokens(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokens"

  override def nullSafeEval(text: Any): Any = {
    val words = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var pos = 0
      while (pos < w.length) {
        var len = math.min(WordpieceTokens.MaxPiece, w.length - pos)
        var matched = false
        while (!matched) {
          val piece = w.substring(pos, pos + len)
          if (len == 1 || WordpieceTokens.inVocab(piece)) {
            out += UTF8String.fromString(if (pos == 0) piece else "##" + piece)
            pos += len
            matched = true
          } else len -= 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordpieceTokens {
  val MaxPiece = 4
  /** Deterministic vocabulary predicate for multi-char pieces. */
  def inVocab(piece: String): Boolean = (piece.hashCode & 0x7fffffff) % 5 == 0
}

/** ALL character n-grams of a string, in order (not distinct) — the
  * one-pass replacement for
  * `transform(sequence(1, greatest(length(text)-n+1, 0)), i -> substring(text, i, n))`,
  * whose per-position `substring` re-walks the UTF-8 bytes from the
  * start to find the code-point offset: O(len²) per document, which
  * made trigram extraction dominate q_langid_trigram (4.9 s of a
  * 5.3 s query at sf0.1). This expression computes every code-point
  * boundary once and slices — O(len) total, result-identical
  * (code-point semantics, exactly like Spark's `substring` and
  * DuckDB's `substr`, so oracles are untouched). CodegenFallback for
  * the WordShingles reason: the win is the single pass, not inlining.
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable) {
      // n is foldable, so validate the VALUE at analysis time: n < 1
      // would otherwise surface as empty-string grams (n = 0) or a
      // negative allocation at eval — a clean analysis error instead.
      right.eval() match {
        case n: Int if n < 1 =>
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    } else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(text: Any, nGram: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    val n = nGram.asInstanceOf[Int]
    val cps = s.codePointCount(0, s.length)
    if (cps < n) return new GenericArrayData(new Array[Any](0))
    // code-point boundary table, built in one forward walk
    val idx = new Array[Int](cps + 1)
    var c = 0; var o = 0
    while (c < cps) { idx(c) = o; o = s.offsetByCodePoints(o, 1); c += 1 }
    idx(cps) = s.length
    val out = new Array[Any](cps - n + 1)
    var i = 0
    while (i + n <= cps) {
      out(i) = UTF8String.fromString(s.substring(idx(i), idx(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `size(split(text, ' '))` without the array: one byte scan counting
  * 0x20 bytes (+1). Exact for ANY UTF-8 input — multi-byte sequences
  * never contain 0x20 (continuation bytes are ≥ 0x80) — and matches
  * `split`'s limit = -1 semantics bit-for-bit (trailing empty strings
  * count; the empty string has one token). The split form allocates a
  * UTF8String per token and an array per row just to read its length;
  * on token-counting hot paths (quality gates, curriculum, budgets,
  * shard balance — the most common scalar in the corpus bank) this is
  * pure garbage-collection tax. [[RewriteTokenCount]] installs the
  * rewrite plan-wide; the expression codegens to an inline loop so it
  * stays inside whole-stage codegen.
  */
case class TokenCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(text: Any): Any = {
    val s = text.asInstanceOf[UTF8String]
    var cnt = 1
    var i = 0
    val n = s.numBytes()
    while (i < n) { if (s.getByte(i) == 0x20) cnt += 1; i += 1 }
    cnt
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $s.numBytes();
         |${ev.value} = 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($s.getByte($i) == 0x20) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaro-Winkler similarity over UTF-8 BYTES, pinned to the de-facto
  * standard semantics (the rapidfuzz/DuckDB contract, verified against
  * DuckDB's `jaro_winkler_similarity` on probe pairs and the fixture):
  * match window = max(len)/2 − 1, half-transposition counting, Winkler
  * prefix boost (cap 4, p = 0.1) applied only when jaro > 0.7, empty
  * input ⇒ 0. Byte grain (not code points) is deliberate — it is what
  * the oracle engine computes, and for the ASCII-dominant identifier/
  * name columns linkage runs on, the two coincide.
  *
  * This is the record-linkage workhorse (Winkler 1990 built it FOR
  * Fellegi-Sunter name comparison at the Census Bureau). Spark ships
  * levenshtein() but nothing prefix-weighted, and the edit-distance
  * family misranks short human names; hence a native expression: one
  * JVM pass per pair, two small scratch bitmaps, codegen via a static
  * call so candidate-pair loops stay inside whole-stage codegen.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSim.jw($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  /** Static entry so generated code can call it without MODULE$
    * indirection noise. */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val sa = ua.getBytes; val sb = ub.getBytes
    val l1 = sa.length; val l2 = sb.length
    if (l1 == 0 || l2 == 0) return 0.0
    // Clamped at 0: max(l1,l2)/2 - 1 is -1 when both strings are a
    // single byte, which would skip the match loop entirely and score
    // jw('a','a') = 0.0 where the DuckDB contract returns 1.0. Only
    // max-len-1 inputs take the clamp, so longer-string scores are
    // unchanged.
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val ma = new Array[Boolean](l1); val mb = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      while (j <= hi) {
        if (!mb(j) && sb(j) == sa(i)) { ma(i) = true; mb(j) = true; m += 1; j = hi }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var tHalf = 0
    i = 0
    while (i < l1) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (sa(i) != sb(k)) tHalf += 1
        k += 1
      }
      i += 1
    }
    val t = tHalf / 2.0
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPref = math.min(4, math.min(l1, l2))
    while (l < maxPref && sa(l) == sb(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Length in CHARACTERS of the longest common prefix of two strings —
  * the adjacent-suffix LCP kernel of the suffix-ordering exact-
  * substring dedup family (Curation.q_suffix_dup et al., the
  * character-grain complement of q_substr_dedup's token-window
  * fingerprints). The composable form is O(L²) character compares
  * (`max i where substr(a,1,i)=substr(b,1,i)` re-scans the prefix for
  * every i — the shape the DuckDB oracle replays); this expression is
  * ONE byte scan.
  *
  * Byte-LCP first (UTF8String binary compare, same ordering DuckDB's
  * memcmp sort uses), then the common byte run is walked lead-byte by
  * lead-byte so only COMPLETE code points count — bit-identical to
  * DuckDB's character-counting substr() on any valid UTF-8, not just
  * the ASCII fixture corpus. Stays a CodegenFallback: the work is the
  * byte loop, not expression dispatch (the word_shingles precedent).
  */
case class PrefixLen(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "prefix_len"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val n = math.min(a.length, b.length)
    var k = 0
    while (k < n && a(k) == b(k)) k += 1
    // count complete code points inside the common byte run [0, k)
    var pos = 0
    var chars = 0L
    while (pos < k) {
      val w = UTF8String.numBytesForFirstByte(a(pos))
      if (pos + w > k) pos = k // partial trailing code point: not common
      else { pos += w; chars += 1 }
    }
    chars
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

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
  * engine-portable).
  *
  * Exact near-dup verification intersects shingle sets per candidate
  * pair; over ~25-char strings that's byte-wise hashing and equality
  * inside the pair loop. Hashing once at shingle creation makes the
  * pairwise set ops integer work — and because the DuckDB oracle
  * replays the identical md5-prefix hash, results (including the
  * astronomically unlikely collision) match exactly.
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
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingleHashes {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** All strict pairs (a, b) = (arr[i], arr[j]), i < j, of a sorted
  * `array<bigint>` — the basket-pair generator shared by co-purchase
  * support counting, association rules, and triangle counting's edge
  * build.
  *
  * The composable form —
  * `flatten(transform(arr, (x, i) -> transform(slice(arr, i + 2,
  * size(arr)), y -> struct(x, y))))` — pays the nested
  * higher-order-function tax twice over: every OUTER element runs an
  * interpreted lambda that allocates a `slice` copy of the array tail,
  * and every INNER element runs a second interpreted lambda dispatch.
  * On the bench fixture that nested dispatch dominated the entire
  * basket family (q_triangle's pair build, q_copurchase,
  * q_assoc_rules). This expression is one fused JVM loop per basket —
  * no slices, no lambda frames — and participates in whole-stage
  * codegen via a static-helper call, so the explode feeding the
  * pair-count partial aggregate stays inside one codegen stage.
  *
  * Pair ORDER is identical to the HOF form (row-major upper triangle),
  * and since the input contract is a sorted-distinct array, a < b holds
  * elementwise — both properties downstream consumers group on, so the
  * swap is hash-exact against the unchanged DuckDB oracles. A null
  * array or null element yields NULL (the HOF form would propagate a
  * null struct field; refusing outright is strictly tighter and the
  * collect_set-built inputs cannot contain nulls).
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  // invents NULL on a null element even over a non-nullable child
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(arr: Any): Any =
    SortedPairs.build(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.SortedPairs$$.MODULE$$.build($c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairs {
  /** One pass over the array; n·(n-1)/2 two-long structs out. Called
    * from generated code (static forwarder via MODULE$), so the loop
    * itself never goes through interpreted expression dispatch.
    */
  def build(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](x, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Upper-triangle second-moment pairs — for a quantized vector
  * `array<bigint>` of length d, all (di, dj, arr[di]·arr[dj]) with
  * 1 ≤ di ≤ dj ≤ d (1-based, diagonal INCLUDED) — the exploded input
  * of a one-pass Gram/covariance matrix.
  *
  * Replaces the interpreted
  * `flatten(transform(sequence(1, d), i -> transform(slice(arr, i,
  * d+1-i), (y, k) -> struct(i, i+k, element_at(arr, i)*y))))` — which
  * allocates d slices and runs d·(d+1)/2 interpreted lambda frames per
  * ROW (d²/2 ≈ 2080 for 64 dims, per embedding). Same fused-loop,
  * static-helper-in-codegen design as [[SortedPairs]]; emission order
  * (row-major by di, then dj) and the (int, int, long) struct shape
  * are identical to the HOF form, so the swap is hash-exact against
  * the unchanged oracle. Products of ×10⁴-quantized unit-norm values
  * are ≤ 10⁸ ≪ 2⁶³ — no overflow at any corpus size (the sum
  * downstream is the scale-dependent part, bounded by the caller).
  */
case class GramPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("di", IntegerType, nullable = false),
      StructField("dj", IntegerType, nullable = false),
      StructField("xy", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "gram_pairs"

  override def nullSafeEval(arr: Any): Any =
    GramPairs.build(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.GramPairs$$.MODULE$$.build($c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-corner triangle credits for one oriented edge (s, t) with
  * common out-neighborhood `common` = N⁺(s) ∩ N⁺(t): emits
  * (s, k), (t, k), and (c, 1) for each closing vertex c, where
  * k = |common| — the one-generator-pass credit scheme of the
  * compact-forward triangle count (each triangle credits all three
  * corners, discovered at its lowest-ordered corner pair).
  *
  * Replaces `concat(array(struct(s, k), struct(t, k)),
  * transform(common, c -> struct(c, 1L)))` — an interpreted lambda
  * frame per closing vertex per edge. Same fused-loop,
  * static-helper-in-codegen design as [[SortedPairs]]; emission order
  * and struct shape are identical, and every consumer aggregates, so
  * the swap is hash-exact against the unchanged oracle.
  */
case class TriangleCredits(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint, array<bigint>), got " +
          Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("part", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "triangle_credits"

  override def nullSafeEval(s: Any, t: Any, common: Any): Any =
    TriangleCredits.build(
      s.asInstanceOf[Long], t.asInstanceOf[Long], common.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t, c) => s"""
      |${ev.value} = graft.functions.TriangleCredits$$.MODULE$$.build($s, $t, $c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TriangleCredits {
  def build(s: Long, t: Long, common: ArrayData): ArrayData = {
    val m = common.numElements()
    val out = new Array[Any](m + 2)
    val k = m.toLong
    out(0) = new GenericInternalRow(Array[Any](s, k))
    out(1) = new GenericInternalRow(Array[Any](t, k))
    var i = 0
    while (i < m) {
      if (common.isNullAt(i)) return null
      out(i + 2) = new GenericInternalRow(Array[Any](common.getLong(i), 1L))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object GramPairs {
  def build(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      vs(i) = arr.getLong(i)
      i += 1
    }
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](i + 1, j + 1, vs(i) * vs(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-EDGE truss-support credits for one oriented edge (s, t) with
  * common out-neighborhood `common` = N⁺(s) ∩ N⁺(t): emits the
  * canonical (min, max) endpoint pair of every edge of every triangle
  * discovered at (s, t) — (s∧t, s∨t, k) for the base edge, where
  * k = |common|, plus (s∧c, s∨c, 1) and (t∧c, t∨c, 1) for each
  * closing vertex c. Summing `n` by (a, b) yields exactly the number
  * of triangles through each undirected edge — the k-truss support —
  * because oriented enumeration discovers every triangle exactly once
  * and credits all three of its edges here.
  *
  * This is the edge-grain sibling of [[TriangleCredits]] (node-grain):
  * it lets k-truss peeling and local-clustering support ride the
  * degree-ORIENTED adjacency (out-degree bounded O(√2m), Latapy's
  * compact-forward) instead of intersecting full undirected neighbor
  * sets, which is O(Σ deg²) with unbounded celebrity-node rows. Same
  * fused-loop, static-helper-in-codegen design as [[SortedPairs]];
  * every consumer aggregates by (a, b), so emission order is
  * irrelevant to the oracle hash.
  */
case class EdgeCredits(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint, array<bigint>), got " +
          Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "edge_credits"

  override def nullSafeEval(s: Any, t: Any, common: Any): Any =
    EdgeCredits.build(
      s.asInstanceOf[Long], t.asInstanceOf[Long], common.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t, c) => s"""
      |${ev.value} = graft.functions.EdgeCredits$$.MODULE$$.build($s, $t, $c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object EdgeCredits {
  def build(s: Long, t: Long, common: ArrayData): ArrayData = {
    val m = common.numElements()
    val out = new Array[Any](1 + 2 * m)
    out(0) = new GenericInternalRow(Array[Any](
      math.min(s, t), math.max(s, t), m.toLong))
    var i = 0
    while (i < m) {
      if (common.isNullAt(i)) return null
      val c = common.getLong(i)
      out(1 + 2 * i) = new GenericInternalRow(Array[Any](
        math.min(s, c), math.max(s, c), 1L))
      out(2 + 2 * i) = new GenericInternalRow(Array[Any](
        math.min(t, c), math.max(t, c), 1L))
      i += 1
    }
    new GenericArrayData(out)
  }
}

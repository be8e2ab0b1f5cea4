package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The bucket-offset TOTAL-ORDER scan — q_rowid's two-phase technique
  * factored into the ONE shared implementation (the sdiv precedent:
  * four hand-rolled single-reducer rank windows with the same "use
  * q_rowid at 100 TB" disclaimer were drifting copies of this exact
  * plan). `row_number() OVER (ORDER BY …)` with no PARTITION BY
  * funnels the whole frame through one reducer; the scalable shape is
  *
  *   1. order-aligned buckets are counted (and, per requested running
  *      sum, summed) in one tiny aggregate;
  *   2. bucket offsets are a prefix scan over the BUCKET-COUNT-sized
  *      table (driver-scale, broadcast back);
  *   3. each bucket ranks/sums its own rows independently in parallel:
  *      global = bucket offset + intra-bucket window.
  *
  * Identical to the single-reducer answer bit-for-bit, with per-bucket
  * parallelism — so callers keep their DuckDB oracles unchanged.
  *
  * Contract: `bucket` must be monotone NON-DECREASING along the total
  * order defined by `order` — the leading order column integer-divided
  * by a width for ASC orderings, its NEGATION for DESC (q_lift ranks
  * by score desc with bucket = -(sc DIV w)). Bucket VALUES need not be
  * dense or balanced; empty buckets simply never appear in the offset
  * table. At 100 TB the widths come from range sampling (the same
  * split-point mechanism repartitionByRange uses) — the arithmetic
  * widths here are the oracle-parity baseline and already remove the
  * single-reducer sort.
  */
object Ranks {

  /** Global 1-based `rankCol` = row_number over `order`, plus, per
    * (col, name) in `sums`, the INCLUSIVE global prefix sum of col
    * under the same total order (ROWS frame — ties get distinct
    * running values, exactly like the naive window with a unique
    * tiebreak in `order`). One data-grain shuffle, partitioned by
    * bucket; the only partitionless window runs over the bucket-grain
    * aggregate.
    *
    * `parts` (column NAMES) scopes the scan: ranks and prefix sums
    * restart per distinct parts-tuple — the scalable replacement for
    * `row_number()/ntile OVER (PARTITION BY parts ORDER BY …)` when a
    * partition key is corpus-proportional (per-lang over web text:
    * English IS the corpus, so partitioning by lang alone still
    * funnels ~half the rows through one reducer; here the data-grain
    * window partitions by (parts, bucket) instead). The offset window
    * then partitions by parts over the BUCKET-grain aggregate —
    * bounded by the bucket census, never the data.
    */
  def globalOrderScan(df: DataFrame, bucket: Column, order: Seq[Column],
                      rankCol: String,
                      sums: Seq[(Column, String)] = Nil,
                      parts: Seq[String] = Nil): DataFrame = {
    val b = df.withColumn("__bkt", bucket)
    val keyCols = parts :+ "__bkt"
    val perBucketAggs = (count(lit(1)).as("__n")) +:
      sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__s$i") }
    val perBucket = b.groupBy(keyCols.map(col): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)
    val wOff = Window.partitionBy(parts.map(col): _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(
      keyCols.map(col) ++
        (coalesce(sum(col("__n")).over(wOff), lit(0L)).as("__off") +:
          sums.indices.map(i =>
            coalesce(sum(col(s"__s$i")).over(wOff), lit(0L)).as(s"__soff$i"))): _*)
    val wb = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val wbRun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = b.join(broadcast(offsets), keyCols)
      .withColumn(rankCol, (col("__off") + row_number().over(wb)).cast("bigint"))
    val withSums = sums.zipWithIndex.foldLeft(ranked) {
      case (acc, ((c, name), i)) =>
        acc.withColumn(name, col(s"__soff$i") + sum(c).over(wbRun))
    }
    withSums.drop("__bkt" +: "__off" +: sums.indices.map(i => s"__soff$i"): _*)
  }

  /** SQL-standard NTILE reconstructed from a precomputed global rank —
    * the first (n mod k) tiles take ⌈n/k⌉ rows, the rest ⌊n/k⌋; both
    * Spark's and DuckDB's native ntile implement exactly this, so the
    * bucket-offset rank + this formula is plan-for-plan swappable with
    * the single-reducer `ntile(k) OVER (ORDER BY …)` (RanksSpec pins
    * the parity). All inputs non-negative BIGINTs, so DIV is exact.
    */
  def ntileFromRank(rank: String, n: String, k: Int): Column = {
    // small = n DIV k, big = small + 1, cut = rem·big rows fill the
    // first rem tiles; all quantities non-negative BIGINTs so DIV is
    // exact floor. When n < k, small = 0 and cut = n ≥ rank, so the
    // small-tile branch (which would divide by zero) never evaluates
    // its DIV for in-range ranks — the CASE guards it anyway.
    expr(
      s"""CAST(CASE
         |  WHEN $rank <= ($n % $k) * ($n DIV $k + 1)
         |    THEN ($rank - 1) DIV ($n DIV $k + 1) + 1
         |  ELSE ($n % $k) +
         |    ($rank - 1 - ($n % $k) * ($n DIV $k + 1)) DIV ($n DIV $k) + 1
         |END AS BIGINT)""".stripMargin)
  }
}

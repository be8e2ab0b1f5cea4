package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine inputs come through here so that scan-side concerns
  * (column pruning, predicate pushdown into the parquet footers) are
  * uniform: callers `select`/`filter` on the returned DataFrame and
  * Catalyst pushes both into `FileSourceScanExec`.
  */
object Tables {
  /** Schema memo per (dir, table): `spark.read.parquet(path)` runs
    * footer-based schema INFERENCE on every call (~58 ms even warm —
    * a driver-side footer read and merge), and a full bench pass
    * issues ~2,000 loads, so inference alone cost ~2 minutes per run
    * (r15 measurement: 200 loads = 12.9 s inferred vs 1.2 s with an
    * explicit schema). The fixture tables are immutable per dir, so
    * the first inference's result is passed explicitly to every later
    * read — pure metadata, no data or results are cached. Keyed by
    * (session, dir, name): a new session or data drop re-infers.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = s"${System.identityHashCode(spark)}:$path"
    val schema = schemaMemo.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (older
    * driver drops) and TIMESTAMP(MICROS) (current drops). Spark's
    * vectorized reader rejects nanos outright, so we always set the
    * legacy nanos-as-long conf and branch on what actually loaded:
    * a LongType `ts` is raw nanos → truncate to a microsecond
    * timestamp (integer DIV keeps full precision; a double division
    * would lose bits above 2^53 — same truncation DuckDB applies on
    * the oracle side); a TimestampType `ts` is already micros → pass
    * through unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Micros files load as TIMESTAMP_NTZ; downstream operators (and
        // the nanos branch above) expect TimestampType. The session
        // timezone is pinned UTC, so this cast relabels without shifting
        // any instant — identical values to what DuckDB reads.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // Optional trailing args: run only these queries (dev fast-loop);
    // the driver always invokes with exactly two args = full run.
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Oracle-compare mode: the fixpoint queries' oracle-depth guards
    // THROW here instead of warning (Graph.oracleDepthGuard) — an
    // engine that converges deeper than its oracle's unroll must fail
    // this run loudly, not hash-mismatch mysteriously (or worse, pass
    // on data the unroll happens to cover while diverging elsewhere).
    System.setProperty("graft.oracle.strict", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft functions + optimizer rules (dot-product fusion, banded
    // levenshtein, token-count) installed up front so every query runs
    // under the same session config regardless of map iteration order
    graft.functions.VectorFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    // A query that fails at plan/build time must NOT silently vanish
    // from the correctness artifact (round 6: 38 events queries threw
    // at analysis and the round's CORRECTNESS json simply had 140
    // entries instead of 176 — all green). Two defenses: (1) write an
    // explicit error-marker parquet under the query's output dir so any
    // downstream compare sees a red row, not an omission; (2) dump
    // verify_errors.json + a loud end-of-run summary.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        try {
          import spark.implicits._
          Seq(s"VERIFY_ERROR $msg").toDF("__verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(
        s"[verify] ${errors.size} QUERIES FAILED: ${errors.keys.mkString(", ")}")
      println(s"[verify] FAILED=${errors.size}")
    }
    spark.stop()
  }
}

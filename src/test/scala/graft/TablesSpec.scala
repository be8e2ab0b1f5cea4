package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression pins for the events loader's timestamp-encoding branch.
  *
  * The driver's testdata generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) (reads as raw long under the legacy conf) and as
  * TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Round 6 proved the
  * failure mode is total — a loader pinned to one encoding makes every
  * events query throw at analysis when the other encoding arrives — so
  * both branches are pinned here against synthetic files of each shape.
  */
class TablesSpec extends SparkSpec {

  private def writeAndLoad(mkDf: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec").toString
    mkDf.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("micros (TIMESTAMP_NTZ) events file loads as TimestampType with values intact") {
    import spark.implicits._
    val df = writeAndLoad {
      Seq((1L, "2024-03-01 12:34:56.789012"), (2L, "2024-03-02 00:00:00.000001"))
        .toDF("event_id", "raw")
        .select($"event_id", to_timestamp($"raw").cast(TimestampNTZType).as("ts"))
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy($"event_id")
      .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].collect()
    assert(got === Array("2024-03-01 12:34:56.789012", "2024-03-02 00:00:00.000001"))
  }

  test("nanos-as-long events file loads as TimestampType, truncated to micros") {
    import spark.implicits._
    // 2024-03-01T12:34:56.789012345Z as epoch nanos; the loader must
    // truncate (not round) the trailing 345 ns.
    val nanos = 1709296496L * 1000000000L + 789012345L
    val df = writeAndLoad {
      Seq((1L, nanos)).toDF("event_id", "ts")
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    assert(got === "2024-03-01 12:34:56.789012")
  }

  test("driver-provided events table loads and is queryable end-to-end") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    // unix_micros is the downstream idiom that broke on TIMESTAMP_NTZ
    assert(df.select(expr("unix_micros(ts)")).limit(1).count() === 1L)
  }
}

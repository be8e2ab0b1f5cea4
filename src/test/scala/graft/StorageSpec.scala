package graft

import org.apache.spark.sql.functions._

/** Storage-layer posture: source-format roundtrips (parquet/orc/csv/
  * json) and the bucketing story — at 100 TB the single biggest join
  * cost is the shuffle, and co-bucketing both sides on the join key
  * eliminates it entirely. These pin that the engine actually achieves
  * the shuffle-free plan, not just that bucketing "is configured".
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("format roundtrip: parquet, orc, csv, json preserve rows and values") {
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
    val n = src.count()
    val expected = src.orderBy($"o_orderkey").collect().toSeq

    for (fmt <- Seq("parquet", "orc", "json")) {
      val dir = tmp(s"graft_fmt_${fmt}_")
      src.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt).schema(src.schema).load(dir)
      assert(back.count() === n, s"$fmt row count")
      assert(back.orderBy($"o_orderkey").collect().toSeq === expected, s"$fmt values")
    }
    // csv needs explicit header + schema (no native types)
    val dir = tmp("graft_fmt_csv_")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.count() === n)
    assert(back.orderBy($"o_orderkey").collect().toSeq === expected, "csv values")
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    // A 100 TB corpus accretes columns over years of writes; readers
    // must union schemas and null-fill missing columns per generation.
    val dir = tmp("graft_evolve_")
    Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("o_orderkey", "o_totalprice", "o_orderstatus", "gen"))
    val n = Tables.orders(spark, sf).count()
    assert(merged.count() === 2 * n)
    assert(merged.filter($"gen" === 1 && $"o_orderstatus".isNull).count() === n,
      "old-generation rows must null-fill the new column")
    assert(merged.filter($"gen" === 2 && $"o_orderstatus".isNull).count() === 0)
  }

  test("co-bucketed join is shuffle-free (zero exchanges)") {
    val conf = spark.conf
    val oldBc = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the 100 TB (non-broadcast) shape
    try {
      val lp = tmp("graft_bkt_li_"); val op = tmp("graft_bkt_o_")
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity", $"l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", lp).saveAsTable("li_bkt")
      Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", op).saveAsTable("o_bkt")

      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges === 0, s"co-bucketed join still shuffles ($exchanges exchanges):\n${p.take(1500)}")

      // and it is the same result as the plain (shuffled) join
      val plain = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      assert(joined.orderBy($"l_orderkey").collect().toSeq ===
        plain.orderBy($"l_orderkey").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
      oldBc match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}

package graft

import graft.sources.CatalogListing

/** The catalog-listing scan (main.py:106-116 as a binaryFile table):
  * glob pushed to the listing, content pruned, names/sizes exact.
  */
class CatalogListingSpec extends SparkSpec {

  test("q_scan_catalog lists only globbed files with exact sizes") {
    val rows = CatalogListing.queries("q_scan_catalog")(spark, sf).collect()
    assert(rows.nonEmpty)
    // fixture: i % 4 != 0 → token_<i>.tok with body "tok<i>"
    assert(rows.forall(_.getString(0).matches("token_\\d+\\.tok")))
    assert(rows.forall { r =>
      val i = r.getString(0).stripPrefix("token_").stripSuffix(".tok")
      r.getLong(1) === 3 + i.length
    })
  }

  test("fields projection prunes content: no file bytes in the read schema") {
    val dir = CatalogListing.fixtureDir(spark, sf)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "token_*.tok").load(dir)
      .select("path", "length")
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("content"),
      s"listing query must not read file bytes:\n$readSchema")
  }

  test("glob predicate is applied at listing time: json interlopers yield no partitions") {
    val dir = CatalogListing.fixtureDir(spark, sf)
    val all = spark.read.format("binaryFile").load(dir)
      .select("path").collect().map(_.getString(0))
    val globbed = spark.read.format("binaryFile")
      .option("pathGlobFilter", "token_*.tok").load(dir)
      .select("path").collect().map(_.getString(0))
    assert(all.exists(_.endsWith(".json")), "fixture should contain json interlopers")
    assert(globbed.nonEmpty && globbed.forall(_.endsWith(".tok")))
  }
}

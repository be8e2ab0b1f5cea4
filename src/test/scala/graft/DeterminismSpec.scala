package graft

/** Partitioning-independence: every declared query must produce
  * byte-identical results regardless of shuffle partition count — the
  * property that makes results reproducible when a 100 TB job is
  * re-run on a different cluster size (or a stage is retried with a
  * different parallelism). Sketch-based estimators whose merge result
  * legitimately depends on partition grouping are exempt and pinned by
  * error-bound specs instead.
  */
class DeterminismSpec extends SparkSpec {

  private val exempt = Set(
    "q_approx_stats",  // percentile_approx merge is grouping-sensitive
    "q_hll_union",     // sketch estimate may vary with merge tree
    "q_mixture_approx" // threshold from a percentile_approx sketch
  )

  test("every query is invariant to shuffle partition count (3 vs 17)") {
    val conf = spark.conf
    val old = conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: String): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries.view
        .filterKeys(!exempt(_))
        .map { case (name, fn) =>
          name -> fn(spark, sf).collect().toSeq.map(_.toString)
        }.toMap
    }
    try {
      val a = runAll("3")
      val b = runAll("17")
      val diff = a.keys.filter(k => a(k) != b(k))
      assert(diff.isEmpty, s"partition-count-dependent results: ${diff.toList.sorted}")
    } finally conf.set("spark.sql.shuffle.partitions", old)
  }
}

package graft

import java.sql.Timestamp
import graft.functions.Udx

class UdxSpec extends SparkSpec {
  import spark.implicits._

  test("sanitizeEmail UDF matches the codegen'd translate form") {
    val udfOut = Udx.queries("q_udf_sanitize")(spark, sf)
      .select("token_file").as[String].collect().toSeq
    val builtinOut = graft.operators.Ingest.queries("q_normalize")(spark, sf)
      .select("token_file").as[String].collect().toSeq
    assert(udfOut === builtinOut)
  }

  test("FirstEventType aggregator: earliest by (ts, event_id), merge-order independent") {
    val t = (ms: Long) => new Timestamp(ms)
    val evs = Seq(
      Udx.Ev(5L, t(1000), 1L, "late"),
      Udx.Ev(2L, t(500), 1L, "early"),
      Udx.Ev(9L, t(500), 1L, "tie_loser"), // same ts, higher id
      Udx.Ev(1L, t(9999), 2L, "only")
    )
    // 1-partition and 4-partition runs must agree (merge associativity).
    val expected = Map(1L -> "early", 2L -> "only")
    Seq(1, 4).foreach { parts =>
      val got = spark.createDataset(evs).repartition(parts)
        .groupByKey(_.user_id)
        .agg(Udx.FirstEventType.toColumn.name("first_type"))
        .collect().toMap
      assert(got === expected, s"with $parts partitions")
    }
  }
}

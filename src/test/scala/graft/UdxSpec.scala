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

  test("TopKOrders: bounded state, sorted output, partition-count independent") {
    val agg = new Udx.TopKOrders(3)
    val orders = (1L to 20L).map(i => Udx.Ord(i, 1L, (i * 37 % 11).toDouble))
    // exhaustive reduce must equal any split-merge (associativity spot check)
    val whole = orders.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = orders.splitAt(7)
    val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(whole.prices.toSeq === split.prices.toSeq)
    assert(whole.keys.toSeq === split.keys.toSeq)
    assert(whole.prices.length === 3, "state must stay bounded at K")
    assert(whole.prices.toSeq === whole.prices.sorted.reverse.toSeq, "descending by price")
    // ties broken by ascending key: price 10.0 occurs for keys 9 and 20
    val expectTop = orders.sortBy(o => (-o.o_totalprice, o.o_orderkey)).take(3)
    assert(whole.keys.toSeq === expectTop.map(_.o_orderkey))
    // end-to-end: 1 vs 4 partitions agree
    val ds = spark.createDataset(orders)
    val run = (parts: Int) => ds.repartition(parts).groupByKey(_.o_custkey)
      .agg(agg.toColumn.name("top")).collect().map { case (k, b) => k -> b.keys.toSeq }.toMap
    assert(run(1) === run(4))
  }
}

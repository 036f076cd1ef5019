package graft

import java.nio.file.{Files, Path}

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

/** Gate-query result materialization + temp-state cleanup (ADVICE r6: the
  * bench's min-of-3(+retry) methodology re-runs every query several times
  * per invocation, so a query that leaves temp tables, temp views, or temp
  * directories behind multiplies them per bench run).
  *
  * `materialize` collects a SMALL result (gate queries end in grouped
  * aggregates over bounded keys), runs the caller's cleanup while the rows
  * are safely in memory, and returns them as a fresh local DataFrame — the
  * lazy original would re-read inputs the cleanup just deleted.
  */
object GateResult {
  def materialize(df: DataFrame)(cleanup: => Unit): DataFrame = {
    // cleanup in finally (ADVICE r8): a query/read failure mid-collect must
    // not leak the staged temp dirs — they'd accumulate across bench's
    // min-of-3(+retry) re-runs. The collect-before-cleanup ordering is
    // preserved on the success path: rows are in memory before inputs die.
    val rows =
      try df.collect().toSeq
      finally cleanup
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, df.schema)
  }

  /** Best-effort recursive temp-dir removal. */
  def deleteRecursively(dir: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    } catch { case NonFatal(_) => () }
}

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
    val rows = df.collect().toSeq
    cleanup
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

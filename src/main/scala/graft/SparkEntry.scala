package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ccm.{Ccm, CcmSpec}
import graft.contract._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Bidirectional CCM over per-supplier lineitem series (x = l_quantity,
    * y = l_extendedprice ordered by ship date): the reference's whole API
    * (`lib/ccm.ex:79-84`) lifted to many series in one Spark job.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_suppkey") % 2 === 0)
      .select(
        col("l_suppkey"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice")
      )
    Ccm.bidirectional(
      li,
      skey = col("l_suppkey"),
      order = Seq("l_shipdate", "l_orderkey", "l_linenumber"),
      x = col("l_quantity"),
      y = col("l_extendedprice"),
      spec = CcmSpec(numSamples = 4),
      libSizes = Seq(100, 200, 300)
    )
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-data-pipeline extensions). Each receives (spark, sfDir) and reads
    * only the driver's parquet tables in sfDir.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CcmQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimQueries.queries ++
      MultimodalQueries.queries ++
      RelationalQueries.queries ++
      EventQueries.queries ++
      PipelineQueries.queries ++
      GraphQueries.queries ++
      ClusterQueries.queries ++
      SketchQueries.queries ++
      StreamQueries.queries ++
      SinkQueries.queries ++
      ModelQueries.queries ++
      graft.sources.FormatRoundTrip.queries ++
      graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Keys absent here (seeded-RNG generator,
    * decode-stub features) get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CcmQueries.oracle ++
      TextQueries.oracle ++
      DedupQueries.oracle ++
      SimQueries.oracle ++
      MultimodalQueries.oracle ++
      RelationalQueries.oracle ++
      EventQueries.oracle ++
      PipelineQueries.oracle ++
      GraphQueries.oracle ++
      ClusterQueries.oracle ++
      SketchQueries.oracle ++
      StreamQueries.oracle ++
      SinkQueries.oracle ++
      ModelQueries.oracle ++
      graft.sources.FormatRoundTrip.oracle
}

package graft.contract

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink coverage: bucketed-table write + exchange-free bucket join.
  *
  * SCALE.md's co-located-join story made concrete: `orders` and `lineitem`
  * are WRITTEN as bucketed tables (same bucket count, same key, sorted
  * within buckets), read back through the catalog, and joined — Spark
  * recognizes the matching bucketing on both sides and plans the join with
  * NO Exchange (asserted by `BucketedSinkSpec`). At 100 TB this is the
  * difference between shuffling the fact table on every join and paying
  * the layout cost ONCE at ingest: the dedup signature relation, the
  * orders/lineitem fact pair, and the IVF list tables all want exactly
  * this layout.
  *
  * The oracle computes the same aggregate straight from the raw parquet,
  * proving the bucketed round-trip is value-identical. Revenue is summed
  * in integer cents (the q10 pattern) so the aggregate is combine-order
  * independent.
  */
object SinkQueries {
  private val Buckets = 8
  private val ctr = new AtomicInteger(0)

  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (lt, ot, tmp) = writeBucketed(s, dir, s"q${ctr.incrementAndGet()}")
    val agg = joinPlanUnderTest(s, lt, ot)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        Norm.rnd(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue")
      )
      .transform(Norm.ordered(_, col("o_orderpriority")))
    // ingest-per-run is the query's cost model; the tables are not —
    // drop them and the temp dir once the (5-row) aggregate is in hand
    graft.GateResult.materialize(agg) {
      s.sql(s"DROP TABLE IF EXISTS $lt")
      s.sql(s"DROP TABLE IF EXISTS $ot")
      graft.GateResult.deleteRecursively(java.nio.file.Paths.get(tmp))
    }
  }

  /** The bucket-joined DataFrame over already-written tables — exposed so
    * the spec can assert the exchange-free plan without re-writing tables.
    */
  private[graft] def joinPlanUnderTest(s: SparkSession, lt: String, ot: String): DataFrame =
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))

  private[graft] def writeBucketed(
      s: SparkSession,
      dir: String,
      run: String
  ): (String, String, String) = {
    val tmp = Files.createTempDirectory(s"graft-bucketed-$run").toString
    val ot = s"graft_spec_orders_$run"
    val lt = s"graft_spec_lineitem_$run"
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/o").saveAsTable(ot)
    Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/l").saveAsTable(lt)
    (lt, ot, tmp)
  }

  private val bucketedJoinSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |  round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_bucketed_join" -> bucketedJoin
  )

  val oracle: Map[String, String] = Map(
    "sink_bucketed_join" -> bucketedJoinSql
  )
}

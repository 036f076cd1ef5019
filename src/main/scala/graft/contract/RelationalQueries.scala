package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard relational coverage (SURVEY.md §2b): scan + filter-pushdown
  * aggregation, broadcast join + window top-k, and event-table grouping.
  * These are the queries whose plans the 100 TB story rides on: filters
  * reach the parquet scan, the dimension side broadcasts, aggregates are
  * partial+final.
  */
object RelationalQueries {

  // q1_agg — TPC-H Q1-shaped scan+filter+aggregate over lineitem.
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Norm.rnd(sum(col("l_quantity")), 2).as("sum_qty"),
        Norm.rnd(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        Norm.rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        Norm.rnd(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .transform(Norm.ordered(_, col("l_returnflag"), col("l_linestatus")))

  private val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) + 0.0 AS sum_qty,
      |  round(sum(l_extendedprice), 2) + 0.0 AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS sum_disc_price,
      |  round(avg(l_quantity), 6) + 0.0 AS avg_qty,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // topk_orders — dim join (customer; no hard hint — AQE broadcasts it
  // at small SF, shuffles at scale since customer is data-proportional) +
  // per-group window top-k (WindowGroupLimit pushes the limit down).
  private def topkOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .transform(Norm.ordered(_, col("c_mktsegment"), col("rank")))
  }

  private val topkOrdersSql: String =
    """WITH j AS (
      |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |), r AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY c_mktsegment
      |            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
      |  FROM j
      |)
      |SELECT c_mktsegment, o_orderkey, o_totalprice, rank
      |FROM r WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin

  // evt_type_agg — grouping over the events table (count / sum / avg).
  private def evtTypeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Norm.rnd(sum(col("value")), 4).as("sum_value"),
        Norm.rnd(avg(col("value")), 6).as("avg_value")
      )
      .transform(Norm.ordered(_, col("event_type")))

  private val evtTypeAggSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 4) + 0.0 AS sum_value, round(avg(value), 6) + 0.0 AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // sample_stratified — deterministic 10% stratified sample per event_type:
  // rows ranked inside each stratum by the DetHash permutation, keep the
  // first ceil(n/10). Training-data pipelines need reproducible sampling —
  // df.sample() is neither cross-engine reproducible nor stratified.
  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    import graft.ccm.DetHash
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("user_id"))
    val h = DetHash.rankHashCol(col("event_id"), lit(1), lit(0), 42L)
    val w = Window.partitionBy("event_type").orderBy(h.asc, col("event_id").asc)
    val wAll = Window.partitionBy("event_type")
    ev.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_type", count(lit(1)).over(wAll))
      .filter(col("rnk") <= ceil(col("n_type") / 10.0).cast("long"))
      .select("event_type", "event_id", "user_id")
      .transform(Norm.ordered(_, col("event_type"), col("event_id")))
  }

  private val sampleStratifiedSql: String = {
    import graft.ccm.DetHash
    val h = DetHash.rankHashSql("event_id", "1", "0", 42L)
    s"""WITH ranked AS (
       |  SELECT event_type, event_id, user_id,
       |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY $h, event_id) AS BIGINT) AS rnk,
       |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
       |  FROM events
       |)
       |SELECT event_type, event_id, user_id FROM ranked
       |WHERE rnk <= CAST(ceil(n_type / 10.0) AS BIGINT)
       |ORDER BY event_type, event_id""".stripMargin
  }

  // q3_shipping — TPC-H Q3-shaped 3-way join: lineitem (fact) joins orders
  // (fact, shuffle equi-join on the order key) and customer (dim — no
  // hard hint: customer is data-proportional, AQE broadcasts at small SF).
  // Both date filters and the segment filter push into the parquet scans,
  // so the shuffled sides are pre-pruned. Top-10 by revenue with
  // deterministic tie-breaks. Timestamps are surfaced as epoch
  // microseconds (BIGINT) — Spark writes parquet TIMESTAMP as
  // adjusted-to-UTC, which DuckDB reads as TIMESTAMPTZ and the dtype gate
  // would flag.
  private val Q3Cut = "1998-06-01 00:00:00"

  private def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < expr(s"TIMESTAMP '$Q3Cut'"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > expr(s"TIMESTAMP '$Q3Cut'"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Norm.rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        // o_orderdate is parquet TIMESTAMP_NTZ; the session tz is pinned to
        // UTC, so the NTZ->LTZ cast is instant-preserving and unix_micros
        // equals DuckDB's epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"),
        col("o_orderpriority")
      )
      .orderBy(col("revenue").desc, col("odate_us").asc, col("l_orderkey").asc)
      .limit(10)
  }

  private val q3ShippingSql: String =
    s"""SELECT l.l_orderkey,
       |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) + 0.0 AS revenue,
       |  epoch_us(o.o_orderdate) AS odate_us,
       |  o.o_orderpriority
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate < TIMESTAMP '$Q3Cut'
       |  AND l.l_shipdate > TIMESTAMP '$Q3Cut'
       |GROUP BY 1, 3, 4
       |ORDER BY revenue DESC, odate_us, l_orderkey
       |LIMIT 10""".stripMargin

  // q5_nation — TPC-H Q5-shaped 6-table star join ("local supplier"
  // revenue per nation in one region). The whole dimension chain
  // region -> nation -> supplier broadcasts (region filter prunes first,
  // so the broadcast is the FILTERED chain). customer/supplier carry NO
  // hard hint — they are data-proportional relations, so AQE broadcasts
  // them at small SF and shuffle-joins at scale. The c_nationkey =
  // s_nationkey "local supplier" predicate rides on the supplier join.
  private def q5Nation(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(Norm.rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .transform(Norm.ordered(_, col("revenue").desc, col("n_name")))
  }

  private val q5NationSql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // q14_promo — TPC-H Q14-shaped conditional-aggregate ratio over a
  // fact-dimension join (promo revenue share; part is data-proportional,
  // so no hard broadcast hint — AQE decides).
  private def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        Norm.rnd(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) / sum(rev), 6)
          .as("promo_revenue_pct"),
        count(lit(1)).as("n_items")
      )
  }

  private val q14PromoSql: String =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |     / sum(l_extendedprice * (1.0 - l_discount)), 6) + 0.0 AS promo_revenue_pct,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // skew_salted_agg — the two-phase salted aggregation (operators/SkewOps)
  // as an oracle-checked query: stats per event_type computed via
  // (key, salt) partials then recombined. The oracle is a PLAIN group-by —
  // the hash gate therefore proves the salted two-phase plan is
  // result-identical to the direct aggregation.
  private def skewSalted(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewOps
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"), col("event_id"))
    SkewOps
      .saltedStats(ev, col("event_type"), col("value"), saltBuckets = 32, rowId = Some(col("event_id")))
      .select(
        col("k").as("event_type"),
        col("n"),
        Norm.rnd(col("sum_v"), 4).as("sum_v"),
        col("min_v"),
        col("max_v"),
        Norm.rnd(col("avg_v"), 6).as("avg_v")
      )
      .transform(Norm.ordered(_, col("event_type")))
  }

  private val skewSaltedSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 4) + 0.0 AS sum_v,
      |  min(value) AS min_v, max(value) AS max_v,
      |  round(avg(value), 6) + 0.0 AS avg_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // q4_priority — TPC-H Q4 shape: orders in a quarter having at least one
  // RETURNED lineitem (the driver's lineitem carries no commit/receipt
  // dates, so l_returnflag = 'R' stands in for lateness), counted per
  // priority. The EXISTS decorrelates to a LEFT SEMI join: the date filter
  // pushes into the orders scan, the flag filter into the lineitem scan,
  // and the semi join never materializes matched lineitems (first match
  // wins).
  // -------------------------------------------------------------------
  private val Q4Lo = "1995-01-01 00:00:00"
  private val Q4Hi = "1995-04-01 00:00:00"

  private def q4Priority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= expr(s"TIMESTAMP '$Q4Lo'") && col("o_orderdate") < expr(s"TIMESTAMP '$Q4Hi'"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val late = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .transform(Norm.ordered(_, col("o_orderpriority")))
  }

  private val q4PrioritySql: String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$Q4Lo' AND o_orderdate < TIMESTAMP '$Q4Hi'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // q6_forecast — TPC-H Q6 shape: the pure scan-filter-aggregate. Every
  // predicate (date range, discount band, quantity cap) pushes into the
  // parquet scan; the aggregate is a two-column partial+final with no
  // grouping key — the cheapest possible full-table question, and the
  // canonical "is pushdown working" probe.
  // -------------------------------------------------------------------
  private def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24
      )
      .agg(
        // integer-cents sum (per-row round to cents, exact long sum, divide
        // once): the aggregate is combine-order-independent, so a
        // partitioning or engine re-order can never flip a round(x, 2)
        // boundary (the q10 pattern — that flake occurred on this dataset)
        Norm.rnd(
          sum(round(col("l_extendedprice") * col("l_discount") * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue"),
        count(lit(1)).as("n_items")
      )

  private val q6ForecastSql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // -------------------------------------------------------------------
  // q10_returns — TPC-H Q10 shape: top-20 customers by revenue lost to
  // returned items in one quarter. lineitem |><| orders is the only
  // guaranteed shuffle (both sides pre-filtered at the scan); customer
  // (unhinted — data-proportional) and nation (hinted — constant 25
  // rows) join onto the aggregated result. Revenue is summed in INTEGER
  // CENTS (per-row round, then an exact integer sum): per-customer sums
  // are small enough that a last-ulp sum-order difference between engines
  // flipped a round(x, 2) boundary on this very dataset — integer cents
  // make the aggregate order-independent.
  // -------------------------------------------------------------------
  private val Q10Lo = "1996-01-01 00:00:00"
  private val Q10Hi = "1996-04-01 00:00:00"

  private def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= expr(s"TIMESTAMP '$Q10Lo'") && col("o_orderdate") < expr(s"TIMESTAMP '$Q10Hi'"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(
        Norm.rnd(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue")
      )
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  private val q10ReturnsSql: String =
    s"""SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
       |  round(CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= TIMESTAMP '$Q10Lo' AND o.o_orderdate < TIMESTAMP '$Q10Hi'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q18_large — TPC-H Q18 shape: large-volume orders. The HAVING
  // aggregate-subquery runs FIRST (one partial+final agg over lineitem,
  // keyed on the order key) and only the surviving keys join back —
  // never orders |><| raw-lineitem. Top-100 by total quantity.
  // -------------------------------------------------------------------
  private val Q18MinQty = 190.0

  private def q18Large(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > Q18MinQty)
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, dir).select("c_custkey", "c_name")
    big
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"),
        Norm.rnd(col("total_qty"), 2).as("total_qty")
      )
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(100)
  }

  private val q18LargeSql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(l_quantity) AS total_qty
       |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > $Q18MinQty
       |)
       |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       |       round(big.total_qty, 2) + 0.0 AS total_qty
       |FROM big
       |JOIN orders o ON big.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // q19_disjunct — TPC-H Q19 shape: disjunction of conjunctive predicate
  // groups SPANNING the join (part attributes AND lineitem quantity).
  // The per-side residuals (p_size >= 1, quantity inside the hull) push
  // to the scans; the OR-of-ANDs evaluates post-join. The optimizer test
  // is that the disjunction does NOT force a cartesian plan — it stays an
  // equi-join on l_partkey with a filter on top.
  // -------------------------------------------------------------------
  private def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(s, dir).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(
        // integer-cents sum — combine-order-independent (q10 pattern)
        Norm.rnd(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  private val q19DisjunctSql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // -------------------------------------------------------------------
  // q21_waiting — TPC-H Q21 shape: multi-semi/anti self-join on the fact
  // table ("suppliers who were the ONLY late supplier in a multi-supplier
  // finished order"; late = shipped > 60 days after the order date, since
  // this schema has no receipt/commit dates). The EXISTS / NOT-EXISTS
  // chain is rewritten as AGGREGATES: one (orderkey, suppkey) rollup of
  // the lineitem|><|orders join, then an orderkey-level census
  // (n suppliers, n late suppliers) — so lineitem is scanned ONCE and
  // never self-joined row-to-row; the decision join is aggregate ⋈
  // aggregate on the order key. The oracle runs the literal
  // EXISTS/NOT-EXISTS form, proving the rewrite.
  // -------------------------------------------------------------------
  private def q21Waiting(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    // per-(order, supplier) rollup straight off the join — the widest
    // relation after this line is |orders|·|suppliers-per-order|, not
    // |lineitem|; checkpointed because it feeds two consumers
    val grp = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L).otherwise(0L))
          .as("n_late_lines")
      )
      .localCheckpoint()
    val ord = grp
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("n_late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp")
      )
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
    grp
      .filter(col("n_late_lines") > 0)
      .join(ord, "l_orderkey")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("n_late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  private val q21WaitingSql: String =
    """WITH lo AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |         (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |)
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM lo l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lo l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // q7_volume — TPC-H Q7 shape: shipping volume between a nation PAIR,
  // by year. Both nation dimensions are pre-filtered to the two names
  // BEFORE their (broadcast — 2 rows by construction) joins, so the
  // disjunctive pair predicate never touches the fact join: after the
  // dims attach, the only residual is supp_nation <> cust_nation. The
  // fact side is one lineitem |><| orders shuffle plus two
  // data-proportional key joins (supplier, customer — unhinted, AQE
  // decides). Revenue in integer cents (q10 pattern).
  // -------------------------------------------------------------------
  private val Q7NationA = "NATION_3"
  private val Q7NationB = "NATION_7"

  private def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq(Q7NationA, Q7NationB)
    val n1 = Tables.nation(s, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(
        Norm.rnd(
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")) / 100.0,
          2
        ).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .transform(Norm.ordered(_, col("supp_nation"), col("cust_nation"), col("l_year")))
  }

  private val q7VolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       |  round(CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0, 2) + 0.0 AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN supplier su ON l.l_suppkey = su.s_suppkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n1 ON su.s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
       |WHERE ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
       |    OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------------------
  // q13_custdist — TPC-H Q13 shape: customer order-count DISTRIBUTION.
  // The LEFT OUTER join keeps order-less customers (count = 0 bucket);
  // the priority predicate rides the join's streamed side, NOT a WHERE
  // (a WHERE would silently drop the zero bucket). Aggregate-of-
  // aggregate: per-customer count, then a count histogram over counts —
  // both partial+final hash aggs, the second over at most |distinct
  // counts| rows.
  // -------------------------------------------------------------------
  private def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    Tables.customer(s, dir)
      .select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .transform(Norm.ordered(_, col("custdist").desc, col("c_count").desc))
  }

  private val q13CustdistSql: String =
    """WITH per_cust AS (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1
      |)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -------------------------------------------------------------------
  // q15_topsupp — TPC-H Q15 shape: top supplier(s) by quarterly revenue,
  // selected by a MAX scalar subquery over a derived relation. The
  // revenue relation is computed ONCE per run into cents (exact longs,
  // so the max-equality join can never be flipped by a sum-order ulp);
  // its 1-row max attaches by broadcast — no second scan of lineitem,
  // no window over a single partition.
  // -------------------------------------------------------------------
  private def q15Topsupp(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= expr(s"TIMESTAMP '$Q10Lo'") &&
          col("l_shipdate") < expr(s"TIMESTAMP '$Q10Hi'")
      )
      .groupBy("l_suppkey")
      .agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long"))
          .as("rev_cents")
      )
      .localCheckpoint() // feeds the max AND the equality join
    val mx = rev.agg(max(col("rev_cents")).as("mx_cents"))
    rev
      .join(broadcast(mx), col("rev_cents") === col("mx_cents"))
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("s_suppkey"), col("s_name"),
        Norm.rnd(col("rev_cents") / 100.0, 2).as("total_revenue")
      )
      .transform(Norm.ordered(_, col("s_suppkey")))
  }

  private val q15TopsuppSql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey,
       |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS rev_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q10Lo' AND l_shipdate < TIMESTAMP '$Q10Hi'
       |  GROUP BY 1
       |)
       |SELECT s.s_suppkey, s.s_name, round(r.rev_cents / 100.0, 2) + 0.0 AS total_revenue
       |FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
       |WHERE r.rev_cents = (SELECT max(rev_cents) FROM revenue)
       |ORDER BY s.s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // q17_smallqty — TPC-H Q17 shape: revenue from small-quantity orders
  // of one brand's parts, where "small" is a CORRELATED scalar subquery
  // (20% of that part's average quantity). Decorrelated by hand: one
  // brand-filtered join, then a per-part avg over the SAME relation
  // joins back by part key — lineitem is scanned once, and the oracle
  // runs the literal correlated form to prove the rewrite. The
  // threshold compare is exact: quantities are integral doubles, so
  // avg = exact_sum/count and 0.2*avg are single deterministic IEEE
  // ops in both engines.
  // -------------------------------------------------------------------
  private val Q17Brand = "Brand#4"

  private def q17Smallqty(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === Q17Brand)
      .select("p_partkey")
    val joined = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(p, col("l_partkey") === col("p_partkey"))
      .localCheckpoint() // feeds the per-part avg AND the threshold filter
    val avgq = joined
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    joined
      .join(avgq, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        Norm.rnd(
          sum(round(col("l_extendedprice") * 100.0).cast("long")) / 100.0 / 7.0,
          2
        ).as("avg_yearly"),
        count(lit(1)).as("n_items")
      )
  }

  private val q17SmallqtySql: String =
    s"""SELECT
       |  round(CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) / 100.0 / 7.0, 2) + 0.0 AS avg_yearly,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE p.p_brand = '$Q17Brand'
       |  AND l.l_quantity < (
       |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  // -------------------------------------------------------------------
  // q22_lapsed — TPC-H Q22 shape: positive-balance customers ABOVE the
  // positive-balance average with NO recent order, grouped by a country
  // code (nationkey % 5 — this schema has no phone column). The NOT
  // EXISTS is a LEFT ANTI join against the date-pruned orders scan; the
  // global scalar threshold is a 1-row broadcast. The above-average
  // compare is INTEGER-ONLY (bal_cents * n_pos > sum_pos_cents): no
  // division, no float epsilon, so a customer can never flip sides
  // between engines.
  // -------------------------------------------------------------------
  private val Q22Cutoff = "1999-01-01 00:00:00"

  private def q22Lapsed(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(
        col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100.0).cast("long").as("bal_cents")
      )
    val pos = c
      .filter(col("bal_cents") > 0L)
      .agg(sum(col("bal_cents")).as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= expr(s"TIMESTAMP '$Q22Cutoff'"))
      .select("o_custkey")
    c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos)) // 1 row by construction
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .groupBy((col("c_nationkey") % 5).cast("int").as("cgroup"))
      .agg(
        count(lit(1)).as("numcust"),
        Norm.rnd(sum(col("bal_cents")) / 100.0, 2).as("totacctbal")
      )
      .transform(Norm.ordered(_, col("cgroup")))
  }

  private val q22LapsedSql: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey,
       |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
       |  FROM customer
       |), pos AS (
       |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_pos,
       |         CAST(count(*) AS BIGINT) AS n_pos
       |  FROM c WHERE bal_cents > 0
       |)
       |SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cgroup,
       |  CAST(count(*) AS BIGINT) AS numcust,
       |  round(CAST(sum(c.bal_cents) AS BIGINT) / 100.0, 2) + 0.0 AS totacctbal
       |FROM c, pos
       |WHERE c.bal_cents * pos.n_pos > pos.sum_pos
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= TIMESTAMP '$Q22Cutoff')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // q2_mincost — TPC-H Q2 shape: per part, the REGION's minimum-cost
  // supplier, where the minimum is a CORRELATED scalar subquery in the
  // reference formulation. This schema has no partsupp table, so the
  // part-supplier cost relation is DERIVED from lineitem (min observed
  // unit price per (part, supplier), integer cents — both engines do
  // the same IEEE divide-round, so the relation is bit-identical).
  // Decorrelated by hand: the cost relation is scanned ONCE
  // (localCheckpoint), the per-part regional minimum is a groupBy-min
  // joined back by equality, and the oracle runs the LITERAL correlated
  // form to prove the rewrite. Plan at scale: nation⋈region prune the
  // supplier side before it touches the cost relation (broadcast dims),
  // lineitem is the only fact scan.
  // -------------------------------------------------------------------
  private val Q2Region = "ASIA"
  private val Q2Size = 5

  private def q2Mincost(s: SparkSession, dir: String): DataFrame = {
    val supRegion = Tables.supplier(s, dir)
      .join(
        broadcast(
          Tables.nation(s, dir).join(
            broadcast(Tables.region(s, dir).filter(col("r_name") === Q2Region)),
            col("n_regionkey") === col("r_regionkey")
          )
        ),
        col("s_nationkey") === col("n_nationkey")
      )
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val cost = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        min(round(col("l_extendedprice") / col("l_quantity") * 100.0).cast("long"))
          .as("unit_cents")
      )
      .join(supRegion, col("l_suppkey") === col("s_suppkey"))
      .localCheckpoint() // feeds the per-part min AND the equality join
    val minc = cost
      .groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("unit_cents")).as("min_cents"))
    cost
      .join(
        minc,
        col("l_partkey") === col("m_partkey") && col("unit_cents") === col("min_cents")
      )
      .join(
        broadcast(Tables.part(s, dir).filter(col("p_size") === Q2Size).select("p_partkey")),
        col("l_partkey") === col("p_partkey")
      )
      .select(
        col("p_partkey"),
        col("s_suppkey"),
        col("s_name"),
        col("n_name"),
        Norm.rnd(col("unit_cents") / 100.0, 2).as("min_cost")
      )
      .transform(Norm.ordered(_, col("p_partkey"), col("s_suppkey")))
  }

  private val q2MincostSql: String =
    s"""WITH cost AS (
       |  SELECT l.l_partkey, l.l_suppkey, s.s_name, n.n_name,
       |         CAST(min(CAST(round(l.l_extendedprice / l.l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS unit_cents
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = '$Q2Region'
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT p.p_partkey, c.l_suppkey AS s_suppkey, c.s_name, c.n_name,
       |       round(c.unit_cents / 100.0, 2) + 0.0 AS min_cost
       |FROM part p JOIN cost c ON c.l_partkey = p.p_partkey
       |WHERE p.p_size = $Q2Size
       |  AND c.unit_cents = (SELECT min(c2.unit_cents) FROM cost c2
       |                      WHERE c2.l_partkey = p.p_partkey)
       |ORDER BY p.p_partkey, s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // q9_profit — TPC-H Q9 shape: profit by (supplier nation, order year)
  // over a part-name predicate — the widest multi-way fact join in the
  // suite (lineitem ⋈ orders ⋈ supplier ⋈ nation ⋈ part). No partsupp
  // here, so cost is proxied as 10% of the part's retail price per unit
  // (keeps the part join load-bearing, not just a filter). All amounts
  // integer cents before summation. Plan at scale: the p_name filter
  // prunes part BEFORE broadcast; lineitem scanned once; dims
  // broadcast; the aggregate is partial+final on (nation, year).
  // -------------------------------------------------------------------
  private val Q9NameToken = "widget"

  private def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").contains(Q9NameToken))
      .select("p_partkey", "p_retailprice")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("n_name").as("nation"),
        col("o_year"),
        (round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long") -
          round(col("p_retailprice") * col("l_quantity") * 10.0).cast("long")).as("amount_cents")
      )
      .groupBy("nation", "o_year")
      .agg(Norm.rnd(sum(col("amount_cents")) / 100.0, 2).as("sum_profit"))
      .transform(Norm.ordered(_, col("nation"), col("o_year")))
  }

  private val q9ProfitSql: String =
    s"""SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       |  round(CAST(sum(
       |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)
       |    - CAST(round(p.p_retailprice * l.l_quantity * 10.0) AS BIGINT)
       |  ) AS BIGINT) / 100.0, 2) + 0.0 AS sum_profit
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE p.p_name LIKE '%$Q9NameToken%'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // q20_excess — TPC-H Q20 shape: suppliers who DOMINATE supply of some
  // part (shipped more than half of that part's 1997 volume) in a
  // region — a nested semi-join whose inner predicate compares a
  // per-(part, supplier) aggregate against a PER-GROUP (per-part)
  // threshold. The threshold compare is integer-only (2*supp_qty >
  // total_qty: quantities are integral doubles, sums exact below 2^53)
  // so no engine can flip a supplier across the boundary. Decorrelated:
  // one date-pruned lineitem scan feeds both aggregation levels
  // (localCheckpoint); the qualifying supplier set semi-joins the
  // region-pruned supplier dim. Oracle: the literal nested IN +
  // correlated per-part total.
  // -------------------------------------------------------------------
  private val Q20Lo = "1997-01-01 00:00:00"
  private val Q20Hi = "1998-01-01 00:00:00"
  private val Q20Region = "EUROPE"

  private def q20Excess(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= expr(s"TIMESTAMP '$Q20Lo'") &&
          col("l_shipdate") < expr(s"TIMESTAMP '$Q20Hi'")
      )
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("supp_qty"))
      .localCheckpoint() // feeds the per-part total AND the threshold compare
    val tot = ps
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("supp_qty")).as("total_qty"))
    val dominating = ps
      .join(tot, col("l_partkey") === col("t_partkey"))
      .filter(lit(2L) * col("supp_qty") > col("total_qty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(
        broadcast(
          Tables.nation(s, dir).join(
            broadcast(Tables.region(s, dir).filter(col("r_name") === Q20Region)),
            col("n_regionkey") === col("r_regionkey")
          )
        ),
        col("s_nationkey") === col("n_nationkey")
      )
      .join(dominating, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .transform(Norm.ordered(_, col("s_suppkey")))
  }

  private val q20ExcessSql: String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q20Lo' AND l_shipdate < TIMESTAMP '$Q20Hi'
       |  GROUP BY 1, 2
       |)
       |SELECT s.s_suppkey, s.s_name, n.n_name
       |FROM supplier s
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = '$Q20Region'
       |  AND s.s_suppkey IN (
       |    SELECT p1.l_suppkey FROM ps p1
       |    WHERE 2 * p1.supp_qty > (SELECT sum(p2.supp_qty) FROM ps p2
       |                             WHERE p2.l_partkey = p1.l_partkey))
       |ORDER BY s.s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // q8_marketshare — TPC-H Q8 shape: one supplier nation's share of the
  // revenue volume sold to customers of a region, per order year — the
  // deepest dimension chain in the suite (lineitem ⋈ part ⋈ supplier ⋈
  // nation ⋈ orders ⋈ customer ⋈ nation ⋈ region). The share is a
  // conditional-sum / total-sum ratio inside ONE aggregate pass — no
  // second scan for the denominator. Volumes are integer cents before
  // summation, so numerator and denominator are exact and the final
  // double division is the only rounding site (cross-engine stable).
  // Plan at scale: p_type filter prunes part BEFORE broadcast, the
  // region filter prunes the customer-nation map to a broadcast list,
  // customer joins without a hard hint (data-proportional — AQE
  // broadcasts at small SF, shuffles at scale), lineitem scanned once.
  // -------------------------------------------------------------------
  private val Q8Region = "AMERICA"
  private val Q8Nation = "NATION_7"
  private val Q8Type = "PROMO"
  private val Q8Lo = "1996-01-01 00:00:00"
  private val Q8Hi = "1998-01-01 00:00:00"

  private def q8Marketshare(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === Q8Type).select("p_partkey")
    val custNat = Tables.nation(s, dir)
      .join(
        broadcast(Tables.region(s, dir).filter(col("r_name") === Q8Region)),
        col("n_regionkey") === col("r_regionkey")
      )
      .select(col("n_nationkey").as("cn_key"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(custNat), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supNat = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.orders(s, dir)
      .filter(
        col("o_orderdate") >= expr(s"TIMESTAMP '$Q8Lo'") &&
          col("o_orderdate") < expr(s"TIMESTAMP '$Q8Hi'")
      )
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn(
        "vol_cents",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0).cast("long")
      )
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === Q8Nation, col("vol_cents")).otherwise(0L)).as("nat_cents"),
        sum(col("vol_cents")).as("tot_cents")
      )
      .select(
        col("o_year"),
        Norm.rnd(col("nat_cents").cast("double") / col("tot_cents"), 6).as("mkt_share")
      )
      .transform(Norm.ordered(_, col("o_year")))
  }

  private val q8MarketshareSql: String =
    s"""SELECT year(o.o_orderdate) AS o_year,
       |  round(
       |    CAST(sum(CASE WHEN n2.n_name = '$Q8Nation'
       |         THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)
       |         ELSE 0 END) AS BIGINT) * 1.0
       |    / CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT),
       |  6) + 0.0 AS mkt_share
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
       |JOIN region r ON n1.n_regionkey = r.r_regionkey
       |WHERE p.p_type = '$Q8Type' AND r.r_name = '$Q8Region'
       |  AND o.o_orderdate >= TIMESTAMP '$Q8Lo' AND o.o_orderdate < TIMESTAMP '$Q8Hi'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // q12_shipmode — TPC-H Q12 shape: late-shipment counts split by order
  // priority, per line class. The schema has no l_shipmode /
  // l_commitdate / l_receiptdate, so the shape keeps Q12's semantics
  // with what exists: "late" = shipped more than 60 days after the
  // order date, classes are l_returnflag, and the high/low split is
  // the same CASE-on-o_orderpriority conditional count. Fact-fact
  // equi-join (lineitem ⋈ orders) with the date-range filter pushed
  // into the lineitem scan; the late predicate is a post-join filter
  // (it needs both sides), evaluated inside the same codegen stage.
  // -------------------------------------------------------------------
  private val Q12Lo = "1997-01-01 00:00:00"
  private val Q12Hi = "1998-01-01 00:00:00"
  private val Q12LateDays = 60

  private def q12Shipmode(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= expr(s"TIMESTAMP '$Q12Lo'") &&
          col("l_shipdate") < expr(s"TIMESTAMP '$Q12Hi'")
      )
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $Q12LateDays DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count")
      )
      .transform(Norm.ordered(_, col("l_returnflag")))
  }

  private val q12ShipmodeSql: String =
    s"""SELECT l.l_returnflag,
       |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE l.l_shipdate >= TIMESTAMP '$Q12Lo' AND l.l_shipdate < TIMESTAMP '$Q12Hi'
       |  AND l.l_shipdate > o.o_orderdate + INTERVAL $Q12LateDays DAY
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // q11_stock — TPC-H Q11 shape: parts holding an outsized share of one
  // nation's supplied value, against a GLOBAL-aggregate threshold. No
  // partsupp table, so per-part value is the summed extended price of
  // that nation's lineitem rows (integer cents). The correlated form
  // (HAVING sum > (SELECT total / k)) decorrelates to a broadcast
  // cross-join of the ONE-ROW global total; the threshold compare is
  // integer-only (k * part_cents > total_cents) so no engine can flip
  // a part across the boundary. The per-part relation feeds both the
  // total and the filter from one localCheckpoint — single fact scan.
  // Oracle: the literal global-subquery form.
  // -------------------------------------------------------------------
  private val Q11Nation = "NATION_3"
  private val Q11Frac = 1000L // keep parts with value > total / 1000

  private def q11Stock(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .join(
        broadcast(Tables.nation(s, dir).filter(col("n_name") === Q11Nation)),
        col("s_nationkey") === col("n_nationkey")
      )
      .select("s_suppkey")
    val vals = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100.0).cast("long")).as("value_cents"))
      .localCheckpoint() // feeds the global total AND the threshold filter
    val tot = vals.agg(sum(col("value_cents")).as("total_cents"))
    vals
      .crossJoin(broadcast(tot))
      .filter(col("value_cents") * Q11Frac > col("total_cents"))
      .select(
        col("l_partkey").as("p_partkey"),
        Norm.rnd(col("value_cents") / 100.0, 2).as("part_value")
      )
      .transform(Norm.ordered(_, col("part_value").desc, col("p_partkey")))
  }

  private val q11StockSql: String =
    s"""WITH vals AS (
       |  SELECT l.l_partkey,
       |         CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  WHERE n.n_name = '$Q11Nation'
       |  GROUP BY 1
       |)
       |SELECT l_partkey AS p_partkey, round(value_cents / 100.0, 2) + 0.0 AS part_value
       |FROM vals
       |WHERE value_cents * $Q11Frac > (SELECT CAST(sum(value_cents) AS BIGINT) FROM vals)
       |ORDER BY part_value DESC, p_partkey""".stripMargin

  // -------------------------------------------------------------------
  // q16_partsupp — TPC-H Q16 shape: distinct supplier counts per part
  // group, excluding a supplier denylist via anti-join. The partsupp
  // relation is proxied by the DISTINCT (l_partkey, l_suppkey) pairs
  // actually shipped (same grain as partsupp); the "complaints"
  // exclusion is the negative-balance suppliers (a NOT IN subquery in
  // the oracle, a broadcast left-anti join here). Plan at scale: the
  // brand/type/size filters push into the part scan, the pair distinct
  // is a partial+final hash aggregate on the fact, the denylist
  // broadcast is O(bad suppliers).
  // -------------------------------------------------------------------
  private val Q16Brand = "Brand#1"
  private val Q16Type = "PROMO"
  private val Q16Sizes = Seq(1, 4, 7, 10, 14, 23, 28, 36, 42, 50)

  private def q16Partsupp(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(
        col("p_brand") =!= Q16Brand && col("p_type") =!= Q16Type &&
          col("p_size").isin(Q16Sizes: _*)
      )
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excl = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("excl_key"))
    Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey")
      .distinct()
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("excl_key"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .transform(
        Norm.ordered(_, col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      )
  }

  private val q16PartsuppSql: String =
    s"""SELECT p.p_brand, p.p_type, p.p_size,
       |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE p.p_brand <> '$Q16Brand' AND p.p_type <> '$Q16Type'
       |  AND p.p_size IN (${Q16Sizes.mkString(", ")})
       |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -------------------------------------------------------------------
  // profile_drift — COLUMN-LEVEL DISTRIBUTION-DRIFT MONITOR between two
  // table partitions (orders year 1995 vs 1996): the data-quality gate
  // a production pipeline runs before accepting a new partition.
  // Metrics per profiled column:
  //  - categorical columns: L1 distance between the normalized category
  //    histograms, computed EXACTLY as Σ|c_a·n_b − c_b·n_a| in int64
  //    with ONE final double division by n_a·n_b (no per-category float
  //    ratios to order-sum);
  //  - numeric columns: the same exact-L1 over fixed price deciles
  //    (cents div 5e6) plus the absolute mean shift in dollars (exact
  //    integer cent sums, two exact divisions, one subtraction).
  // Every count relation is a tiny per-category aggregate after ONE scan
  // of the two partitions (year pruning pushes to the parquet reader);
  // at 100 TB the profile cost is the scan, the drift algebra is
  // constant-size. The c·n products bound: both factors ≤ the partition
  // row count, exact to ~3e9 rows per partition.
  // -------------------------------------------------------------------
  private val DriftYearA = 1995
  private val DriftYearB = 1996
  private val DriftL1Threshold = 0.05
  private val DriftMeanThreshold = 1.0 // dollars

  private def profileDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(
        year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus"),
        col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents")
      )
      .filter(col("yr").isin(DriftYearA.toLong, DriftYearB.toLong))
      .localCheckpoint() // one scan feeds every per-column profile
    val ns = o.agg(
      sum(when(col("yr") === DriftYearA, 1L).otherwise(0L)).as("na"),
      sum(when(col("yr") === DriftYearB, 1L).otherwise(0L)).as("nb"),
      sum(when(col("yr") === DriftYearA, col("cents")).otherwise(0L)).as("sa"),
      sum(when(col("yr") === DriftYearB, col("cents")).otherwise(0L)).as("sb")
    )
    def l1Of(catCol: org.apache.spark.sql.Column, name: String): DataFrame =
      o.groupBy(catCol.as("cat"))
        .agg(
          sum(when(col("yr") === DriftYearA, 1L).otherwise(0L)).as("ca"),
          sum(when(col("yr") === DriftYearB, 1L).otherwise(0L)).as("cb")
        )
        .crossJoin(ns)
        .agg(
          first(col("na")).as("n_a"),
          first(col("nb")).as("n_b"),
          sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("l1raw")
        )
        .select(
          lit(name).as("column"),
          lit("hist_l1").as("metric"),
          col("n_a"),
          col("n_b"),
          Norm.rnd(
            expr("CAST(l1raw AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"),
            6
          ).as("value")
        )
    val meanShift = ns.select(
      lit("o_totalprice").as("column"),
      lit("mean_shift").as("metric"),
      col("na").as("n_a"),
      col("nb").as("n_b"),
      Norm.rnd(
        expr("abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 100.0"),
        6
      ).as("value")
    )
    l1Of(col("o_orderstatus"), "o_orderstatus")
      .unionByName(l1Of(col("o_orderpriority"), "o_orderpriority"))
      .unionByName(l1Of(expr("cents div 5000000"), "o_totalprice_decile"))
      .unionByName(meanShift)
      .withColumn(
        "drifted",
        when(col("metric") === "hist_l1", col("value") > DriftL1Threshold)
          .otherwise(col("value") > DriftMeanThreshold)
      )
      .transform(Norm.ordered(_, col("column"), col("metric")))
  }

  private val profileDriftSql: String = {
    def l1Of(cat: String, name: String) =
      s"""SELECT '$name' AS "column", 'hist_l1' AS metric, n_a, n_b,
         |  round(CAST(l1raw AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) + 0.0 AS value
         |FROM (
         |  SELECT first(ns.na) AS n_a, first(ns.nb) AS n_b,
         |         CAST(sum(abs(c.ca * ns.nb - c.cb * ns.na)) AS BIGINT) AS l1raw
         |  FROM (SELECT $cat AS cat,
         |               CAST(sum(CASE WHEN yr = $DriftYearA THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |               CAST(sum(CASE WHEN yr = $DriftYearB THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |        FROM o GROUP BY 1) c CROSS JOIN ns
         |)""".stripMargin
    s"""WITH o AS MATERIALIZED (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus, o_orderpriority,
       |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
       |  FROM orders
       |  WHERE CAST(year(o_orderdate) AS BIGINT) IN ($DriftYearA, $DriftYearB)
       |), ns AS (
       |  SELECT CAST(sum(CASE WHEN yr = $DriftYearA THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |         CAST(sum(CASE WHEN yr = $DriftYearB THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |         CAST(sum(CASE WHEN yr = $DriftYearA THEN cents ELSE 0 END) AS BIGINT) AS sa,
       |         CAST(sum(CASE WHEN yr = $DriftYearB THEN cents ELSE 0 END) AS BIGINT) AS sb
       |  FROM o
       |), base AS (
       |${l1Of("o_orderstatus", "o_orderstatus")}
       |UNION ALL
       |${l1Of("o_orderpriority", "o_orderpriority")}
       |UNION ALL
       |${l1Of("cents // 5000000", "o_totalprice_decile")}
       |UNION ALL
       |SELECT 'o_totalprice' AS "column", 'mean_shift' AS metric, na AS n_a, nb AS n_b,
       |       round(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 100.0, 6) + 0.0 AS value
       |FROM ns
       |)
       |SELECT *, CASE WHEN metric = 'hist_l1' THEN value > $DriftL1Threshold
       |               ELSE value > $DriftMeanThreshold END AS drifted
       |FROM base ORDER BY "column", metric""".stripMargin
  }

  // -------------------------------------------------------------------
  // obs_metrics — Dataset.observe / CollectMetrics under the hash gate:
  // the production OBSERVABILITY path (row counters and quality gauges
  // that ride an existing query plan for free — one CollectMetrics node
  // over the scan, accumulator-style partial merge, published to the
  // listener bus per query / per micro-batch). The gate drives the
  // observed plan once and returns the observed metric row itself, so
  // the oracle pins that the piggy-backed counters equal the ground
  // truth a separate aggregation query would compute: count, exact cent
  // sums, a predicate counter, and a max watermark-style timestamp.
  // At 100 TB this is how a pipeline audits every stage WITHOUT running
  // a second pass over the data.
  // -------------------------------------------------------------------
  private def obsMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables
      .lineitem(s, dir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_shipdate"), col("l_returnflag"))
    val observed = li.observe(
      "graft_obs",
      count(lit(1)).as("n_rows"),
      sum(expr("CAST(round(l_quantity * 100.0) AS BIGINT)")).as("qty_cents"),
      sum(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)")).as("price_cents"),
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
      // l_shipdate surfaces as TIMESTAMP_NTZ; the UTC session makes the
      // cast shift-free and epoch_us(l_shipdate) in DuckDB matches
      max(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))")).as("max_ship_us")
    )
    val qe = observed.queryExecution
    qe.toRdd.count() // drive THIS QueryExecution; the metrics land on it
    val row = qe.observedMetrics("graft_obs")
    Seq((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)))
      .toDF("n_rows", "qty_cents", "price_cents", "n_returned", "max_ship_us")
  }

  private val obsMetricsSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents,
       |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS price_cents,
       |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       |  max(epoch_us(l_shipdate)) AS max_ship_us
       |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "obs_metrics" -> obsMetrics,
    "profile_drift" -> profileDrift,
    "q8_marketshare" -> q8Marketshare,
    "q11_stock" -> q11Stock,
    "q12_shipmode" -> q12Shipmode,
    "q16_partsupp" -> q16Partsupp,
    "q2_mincost" -> q2Mincost,
    "q9_profit" -> q9Profit,
    "q20_excess" -> q20Excess,
    "q7_volume" -> q7Volume,
    "q13_custdist" -> q13Custdist,
    "q15_topsupp" -> q15Topsupp,
    "q17_smallqty" -> q17Smallqty,
    "q22_lapsed" -> q22Lapsed,
    "q21_waiting" -> q21Waiting,
    "q6_forecast" -> q6Forecast,
    "q10_returns" -> q10Returns,
    "q18_large" -> q18Large,
    "q19_disjunct" -> q19Disjunct,
    "q4_priority" -> q4Priority,
    "q1_agg" -> q1Agg,
    "topk_orders" -> topkOrders,
    "evt_type_agg" -> evtTypeAgg,
    "sample_stratified" -> sampleStratified,
    "q3_shipping" -> q3Shipping,
    "q5_nation" -> q5Nation,
    "q14_promo" -> q14Promo,
    "skew_salted_agg" -> skewSalted
  )

  val oracle: Map[String, String] = Map(
    "obs_metrics" -> obsMetricsSql,
    "profile_drift" -> profileDriftSql,
    "q8_marketshare" -> q8MarketshareSql,
    "q11_stock" -> q11StockSql,
    "q12_shipmode" -> q12ShipmodeSql,
    "q16_partsupp" -> q16PartsuppSql,
    "q2_mincost" -> q2MincostSql,
    "q9_profit" -> q9ProfitSql,
    "q20_excess" -> q20ExcessSql,
    "q7_volume" -> q7VolumeSql,
    "q13_custdist" -> q13CustdistSql,
    "q15_topsupp" -> q15TopsuppSql,
    "q17_smallqty" -> q17SmallqtySql,
    "q22_lapsed" -> q22LapsedSql,
    "q21_waiting" -> q21WaitingSql,
    "q6_forecast" -> q6ForecastSql,
    "q10_returns" -> q10ReturnsSql,
    "q18_large" -> q18LargeSql,
    "q19_disjunct" -> q19DisjunctSql,
    "q4_priority" -> q4PrioritySql,
    "q1_agg" -> q1AggSql,
    "topk_orders" -> topkOrdersSql,
    "evt_type_agg" -> evtTypeAggSql,
    "sample_stratified" -> sampleStratifiedSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_nation" -> q5NationSql,
    "q14_promo" -> q14PromoSql,
    "skew_salted_agg" -> skewSaltedSql
  )
}

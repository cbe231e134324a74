package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query suite over the TPC-H-ish tables — exercises the join /
  * aggregation / window surface at bench scale (SURVEY.md §2.5, §2.6) with
  * the physical shapes a 1000-executor cluster wants: dimension tables
  * broadcast (no shuffle of the fact side), facts pre-filtered before the
  * join so the parquet scan prunes, exact decimal accumulation for
  * hash-stable doubles ([[Num.dsum]]).
  */
object Relational {
  import Num._

  /** Pricing summary (TPC-H Q1 shape): wide multi-aggregate grouped scan —
    * the canonical map-side-combinable hash aggregate (A1/A2/A3). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 8).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by market segment and order month: customer ⋈ orders ⋈ lineitem
    * with the dimension side broadcast (J1-class equi-join; the fact table
    * never shuffles for the join, only for the final group-by). */
  def revenueBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment", "order_month")
  }

  /** Revenue per nation (TPC-H Q5 shape): 6-way join where every dimension
    * chain (customer→nation→region, supplier→nation) is broadcast — the plan
    * is a single pass over lineitem with hash-lookup joins, which is exactly
    * the 100 TB-safe shape (no sort-merge, no fact-side shuffle). */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir)
      .filter(col("r_name").isin("ASIA", "EUROPE"))
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    val natInRegion = nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select("n_nationkey", "n_name")
    val custNation = cust
      .join(broadcast(natInRegion), cust("c_nationkey") === natInRegion("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(custNation), ord("o_custkey") === custNation("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Customers having at least one order — semi-join (J5: the reference
    * expresses existence as `filter(...).count() > 0` per key,
    * reference: utils/CheckAddress.scala:22-24; the distributed form is a
    * LEFT SEMI join, one pass, no row duplication). */
  def customersWithOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Customers with no order since 2001 — anti-join (every customer has
    * *some* order in this dataset, so the recency predicate keeps the result
    * non-trivial). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
      .select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Bilateral trade-flow matrix — TPC-H Q7 generalized to every nation
    * pair: revenue between supplier nation and customer nation by ship
    * year. The lineitem⋈orders key join is the single big shuffle
    * (bucket-co-locatable at scale, see BucketingSpec); customer→nation and
    * supplier→nation are broadcast dimension maps stitched onto the fact
    * scan, so the 25×25×years result never shuffles the fact twice. */
  def tradeFlows(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val custN = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val suppN = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Top-3 orders per customer by total price — ranking window (extension
    * beyond the reference, which has only sum/lag windows; SURVEY.md §2.7).
    * Tie-break on o_orderkey keeps the result deterministic. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rnk")
  }

  /** Quantity-weighted average price per return flag through the custom
    * [[graft.functions.WeightedAvg]] DeclarativeAggregate — oracle-proven
    * equal to the two-sum SQL formulation. */
  def weightedAvgPrice(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.WeightedAvg.register(spark)
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(expr(s"${graft.functions.WeightedAvg.Name}(l_extendedprice, l_quantity)")
        .as("wavg_price"))
      .withColumn("wavg_price", round(col("wavg_price"), 6))
      .orderBy("l_returnflag")
  }

  /** CUBE over (status, priority): all four grouping sets in one pass. */
  def ordersCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Correlated scalar subquery (TPC-H Q17 shape): revenue of lineitems
    * whose quantity sits below half their part's average quantity. Written
    * as the per-row correlated subquery a user would write; Catalyst
    * DECORRELATES it into one aggregate over lineitem joined back on
    * l_partkey — per-part averages computed once, not once per row (the
    * plan-shape assertion lives in PlanAuditSpec). The inner average runs
    * through exact decimal sum / count so the threshold is bit-stable. */
  def smallQuantityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_li")
    spark.sql(
      """SELECT l_returnflag,
        |       count(*) AS n_small,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)
        |         AS small_revenue
        |FROM graft_li l
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,2))) AS DOUBLE)
        |                / count(*))
        |  FROM graft_li l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube): per-
    * status totals, per-priority totals, and the grand total in ONE pass —
    * Spark expands the sets into a single Expand + aggregate (one scan,
    * one shuffle), where separate queries would scan three times.
    * `grouping()` flags disambiguate the NULLs that mark "aggregated-away"
    * from genuine null data. */
  def ordersGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_ord_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM graft_ord_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Ranking/distribution window family beyond row_number (W extension):
    * lead/lag neighbors, ntile quartiles, percent_rank and cume_dist over
    * each status partition — one window spec, one sort, all functions
    * computed in a single pass over it. */
  def orderWindowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .filter(col("o_orderkey") % 20 === 0) // sample AFTER ranking
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** Set operations the reference lacks (SURVEY §2.9 note): customers active
    * in both halves of the order history (INTERSECT) and only in the first
    * (EXCEPT). */
  def customerSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val split = to_timestamp(lit("1998-01-01 00:00:00"))
    val early = ord.filter(col("o_orderdate") < split).select("o_custkey")
    val late = ord.filter(col("o_orderdate") >= split).select("o_custkey")
    early.intersect(late).withColumn("set_op", lit("both"))
      .unionByName(early.except(late).withColumn("set_op", lit("early_only")))
      .orderBy("set_op", "o_custkey")
  }

  /** Exact interpolated percentiles of order value per status — `percentile`
    * (Spark) and `quantile_cont` (DuckDB) share the (1-f)·a + f·b
    * definition, so results hash-match. */
  def orderPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
      .orderBy("o_orderstatus")

  /** The 100 TB twin of [[orderPercentiles]]: `percentile_approx`
    * (KLL-style sketch — fixed-size state per group, single pass, mergeable
    * map-side) where the exact form buffers every value per group. Sketch
    * internals differ across engines ⇒ rows-only in the driver; the
    * accuracy contract vs the exact percentiles is asserted in
    * `MetricsSpec`.
    *
    * Determinism caveat (deliberate exception to the engine's
    * partition-independence contract): once a group exceeds the sketch
    * accuracy (1000), compress/merge order can shift which data point a
    * quantile lands on by up to the rank-error bound. Row count and the
    * error bound are stable; exact values may vary with partitioning —
    * use [[orderPercentiles]] where bit-stability matters. */
  def orderPercentilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 1000)").as("p50"),
        expr("percentile_approx(o_totalprice, 0.9, 1000)").as("p90"),
        expr("percentile_approx(o_totalprice, 0.99, 1000)").as("p99"))
      .orderBy("o_orderstatus")

  /** CERTIFIED form of [[orderPercentilesApprox]]: the sketch's accuracy
    * contract as deterministic booleans. The GK/KLL sketch guarantees rank
    * error ≤ n/accuracy = 0.1% of n UNDER ANY MERGE ORDER, so
    * "approx p50 lies between the exact 48th and 52nd percentiles" (±2%
    * rank margin, 20× the bound; p99 brackets to the max) is a
    * partition-independent predicate even though the approx VALUE may
    * shift within the bound. The DuckDB oracle computes the same exact
    * brackets and asserts `true` — hash-match certifies both the exact
    * quantile arithmetic and the sketch bound. */
  def orderPercentilesApproxCertified(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 1000)").as("a50"),
        expr("percentile_approx(o_totalprice, 0.9, 1000)").as("a90"),
        expr("percentile_approx(o_totalprice, 0.99, 1000)").as("a99"),
        expr("percentile(o_totalprice, 0.48D)").as("lo50"),
        expr("percentile(o_totalprice, 0.52D)").as("hi50"),
        expr("percentile(o_totalprice, 0.88D)").as("lo90"),
        expr("percentile(o_totalprice, 0.92D)").as("hi90"),
        expr("percentile(o_totalprice, 0.97D)").as("lo99"),
        max(col("o_totalprice")).as("hi99"))
      .select(col("o_orderstatus"),
        round(col("lo50"), 6).as("lo50"), round(col("hi50"), 6).as("hi50"),
        round(col("lo90"), 6).as("lo90"), round(col("hi90"), 6).as("hi90"),
        round(col("lo99"), 6).as("lo99"),
        col("hi99").cast("double").as("hi99"),
        (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_ok"),
        (col("a90") >= col("lo90") && col("a90") <= col("hi90")).as("p90_ok"),
        (col("a99") >= col("lo99") && col("a99") <= col("hi99")).as("p99_ok"))
      .orderBy("o_orderstatus")

  /** Order counts with ROLLUP over (region, nation) of the customer — grouping
    * sets (extension; not present in the reference, SURVEY.md §2.6 note).
    *
    * Expressed through `spark.sql`: the DataFrame `rollup` API after a join
    * false-positives Spark 4.1's ambiguous-self-join check (grouping-set
    * expansion duplicates the grouping attributes, which still carry the
    * joined Datasets' provenance metadata); the SQL path plans the identical
    * Expand + Aggregate without the Dataset-provenance bookkeeping. */
  def ordersRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_ord")
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_cust")
    Tables.nation(spark, sfDir).createOrReplaceTempView("graft_nat")
    Tables.region(spark, sfDir).createOrReplaceTempView("graft_reg")
    spark.sql(
      """SELECT r_name, n_name, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM graft_ord o
        |JOIN graft_cust c ON o.o_custkey = c.c_custkey
        |JOIN graft_nat n ON c.c_nationkey = n.n_nationkey
        |JOIN graft_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** 2-D skyline (Pareto frontier) of orders on (totalprice ↑, orderdate ↑
    * recency): orders not dominated by any other — no order is both more
    * expensive AND more recent. The classic Börzsönyi skyline operator,
    * in its 2-D window form: sort one dimension descending, keep rows
    * whose OTHER dimension strictly exceeds the running maximum — one
    * sort, O(n log n), instead of the textbook quadratic dominance
    * anti-join (ties on price need the date tie-break in the running max
    * so equal-price rows can't dominate each other's survival).
    *
    * The global window is a SUMMARY-size concern only if the frontier
    * input is; at scale the standard move is local skyline per partition
    * (mapPartitions) then this window over the tiny union — the window
    * form IS that merge step. */
  def orderSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .orderBy(col("o_totalprice").desc, col("ts").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("ts"))
      .withColumn("best_prev_ts", max(col("ts")).over(w))
      .filter(col("best_prev_ts").isNull || col("ts") > col("best_prev_ts"))
      .select(col("o_orderkey"), col("o_totalprice"), col("ts"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Exact weighted median of the extended price, weighted by quantity,
    * per return-flag group — the order statistic where half the WEIGHT
    * (not half the rows) sits on each side, the robust location measure
    * for value-weighted distributions. Pure cumulative-weight crossing on
    * exact integer arithmetic: the median is the smallest value whose
    * running weight reaches half the total (2·cum ≥ W, integer cross-
    * multiplication — no float rank).
    *
    * Runs on the (flag, price) weight DISTRIBUTION, not the row stream:
    * the map-side-combinable pre-aggregation collapses duplicate prices
    * before the 3-partition window ever sorts anything (the winsorize /
    * curriculum move) — the window input is |distinct prices per flag|,
    * bounded by the value domain, not the row count. */
  def weightedMedianPrice(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity").cast("long")).as("qd"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wa = Window.partitionBy("l_returnflag")
    dist
      .withColumn("cum", sum(col("qd")).over(w))
      .withColumn("tot", sum(col("qd")).over(wa))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min(col("l_extendedprice")).as("weighted_median"),
        max(col("tot")).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** UNPIVOT (wide→long melt — `Dataset.unpivot`, the inverse of the A6
    * pivot family): the per-token metric summary turned into
    * (token, metric, value) rows, the shape metric stores and plotting
    * layers ingest. Unpivot is a zero-shuffle projection (each input row
    * explodes to its measure count locally); the only shuffle is the
    * upstream aggregate's. */
  def tokenMetricsLong(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = Tables.transfers(spark, sfDir)
      .groupBy("contract_address")
      .agg(Num.dsum(col("value")).as("volume"),
        count(lit(1)).cast("double").as("n_tx"),
        countDistinct(col("from_address")).cast("double").as("n_senders"))
    wide.unpivot(
        Array(col("contract_address")),
        Array(col("volume"), col("n_tx"), col("n_senders")),
        "metric", "value")
      .orderBy("contract_address", "metric")
  }

  /** Top supplier by quarterly revenue (TPC-H Q15 shape): revenue per
    * supplier over one ship-date quarter, then the supplier(s) achieving
    * the maximum. The max is selected by EXACT decimal equality — revenue
    * stays a decimal through the argmax compare and is rendered to double
    * only on output, so "ties" are true ties, not float-rounding accidents.
    *
    * One fact aggregate (map-side combinable), a 1-row broadcast max, and a
    * broadcast supplier dimension join — the fact table never shuffles for
    * a join. */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .groupBy("l_suppkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(25, 8))).as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    rev.join(broadcast(mx), col("rev") === col("mx"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Late-shipment priority mix (TPC-H Q4 shape): orders with at least one
    * line item shipped more than [[LateShipDays]] days after the order
    * date, counted per order priority. The EXISTS is a left-semi join —
    * each qualifying order counted once no matter how many late lines —
    * keyed on the order key, so it shuffles both sides by a uniform key
    * and partial-counts map-side. Timestamp + day-interval arithmetic is
    * exact in both engines. */
  val LateShipDays = 100

  def lateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate")
          + expr(s"INTERVAL $LateShipDays DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Incremental maintenance of a JOIN view (the join half of
    * `q_incremental_agg`'s base ⊕ delta ≡ recompute contract): the
    * materialized view is the per-(token, hour) tick×transfer pair rollup;
    * a new block-range batch arrives on BOTH sides, and the refresh
    * computes only the classic three delta terms
    * `ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB` merged into the old view — never the
    * full A⋈B. At scale the delta terms touch O(|Δ|·fanout) rows vs the
    * view's O(|A|·|B| per key); the hash gate proves the merged result
    * equals the oracle's direct full join.
    *
    * Both sides are PRE-AGGREGATED per (key, old|new) before joining —
    * the aggregate-join form of IVM: pair counts and volume sums multiply
    * exactly (`Σ_{x,y} v_x = (Σ_x v_x)·|B|`, decimal × integer), so the
    * "join" moves 4 rows per key, not the pair stream. */
  def incrementalJoinView(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, 2)
    val e = Tables.transfers(spark, sfDir)
    val thr = e.agg(max("block_number").as("mb"))
      .select(expr("mb - mb div 10").as("thr"))
    val withThr = e.crossJoin(broadcast(thr))
      .select(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"),
        col("value"), col("block_number"),
        (col("block_number") >= col("thr")).as("is_new"))
    def side(pred: Column) = withThr.filter(pred)
      .groupBy("contract_address", "t", "is_new")
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast(dec)).as("vol"))
    val a = side(col("block_number") % 5 =!= 0)
      .select(col("contract_address"), col("t"), col("is_new").as("a_new"),
        col("cnt").as("na"), col("vol").as("va"))
    val b = side(col("block_number") % 5 === 0)
      .select(col("contract_address"), col("t"), col("is_new").as("b_new"),
        col("cnt").as("nb"), col("vol").as("vb"))
    // four (a_new, b_new) quadrants: base view = old×old; the three
    // remaining quadrants ARE the IVM delta terms, merged by the same sum
    val quadrants = a.join(b, Seq("contract_address", "t"))
    quadrants
      .groupBy("contract_address", "t")
      .agg(sum(col("na") * col("nb")).as("n_pairs"),
        sum(col("va") * col("nb")).cast("double").as("tx_volume"),
        sum(col("vb") * col("na")).cast("double").as("tick_volume"))
      .orderBy("contract_address", "t")
  }

  /** Shipping-priority query (TPC-H Q3 shape): revenue of unshipped
    * BUILDING-segment orders as of a cutoff date, top 10 by revenue.
    * Exact decimal revenue; the rank ties break by order key, and the top
    * slice is a TakeOrdered over the aggregated (order-grained) frame —
    * the sort never sees line items. Dimension filter joins broadcast. */
  val Q3Cutoff = "1995-03-15 00:00:00"

  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = to_timestamp(lit(Q3Cutoff))
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(25, 8))).as("rev"))
      .select(col("l_orderkey"), col("rev").cast("double").as("revenue"),
        col("o_orderdate"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Large-volume customers (TPC-H Q18 shape): orders whose total line
    * quantity exceeds the threshold, with the ordering customer. The
    * HAVING runs on the order-grained aggregate (map-side combinable);
    * customer attaches by broadcast after the filter has shrunk the
    * stream to the rare heavy orders. */
  val BigOrderQty = 300.0

  def bigOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val heavy = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")
        .cast(org.apache.spark.sql.types.DecimalType(25, 2))).as("qty"))
      .filter(col("qty") > BigOrderQty)
    heavy
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Top customers by returned-item revenue [[ReturnedTopK]] (TPC-H Q10
    * shape): the returns-to-lose-money report. The fact stream shrinks
    * FIRST — filter to `l_returnflag = 'R'`, aggregate revenue to the
    * order grain, then to the customer grain — before any dimension
    * join, so the wide customer/nation attributes ride a
    * customer-cardinality frame, never the lineitem stream. Exact
    * decimal revenue; top-K is an order-grained TakeOrdered with the
    * customer key as tiebreak (same contract as [[shippingPriority]]). */
  val ReturnedTopK = 20

  def returnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val byCust = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
    byCust
      .join(broadcast(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(ReturnedTopK)
  }

  /** Monthly promo revenue share (TPC-H Q14 shape): what fraction of
    * shipped revenue came from PROMO-type parts, per ship month. The
    * part dimension broadcasts; revenue sums are exact decimal rendered
    * to double, and the share is the single IEEE chain
    * `floor(promo · 10⁶ / total)` spelled identically in the oracle —
    * deterministic because the inputs are the same hash-stable doubles. */
  def promoRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("px"))
      .join(broadcast(Tables.part(spark, sfDir)
        .select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(dsum(when(col("p_type") === "PROMO", col("px"))
        .otherwise(lit(0.0)), 8).as("promo_revenue"),
        dsum(col("px"), 8).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_ppm",
        expr("CAST(FLOOR(promo_revenue * 1000000.0 / total_revenue)" +
          " AS BIGINT)"))
      .orderBy("ship_month")

  /** Forecast-revenue-change constants (TPC-H Q6 shape): one ship year,
    * a discount band, a quantity cap. */
  val ForecastYear = 1996

  /** Revenue the company would have kept by eliminating the discount
    * band (TPC-H Q6): the canonical FILTERED SCAN aggregate — no join at
    * all, every predicate eligible for parquet pushdown, one exact
    * decimal sum. The shape that proves the scan path prunes. */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === ForecastYear &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** National market share constants (TPC-H Q8 shape). */
  val MktRegion = "ASIA"
  val MktType = "STANDARD"
  val MktNation = "NATION_7"

  /** One supplier nation's share of a region's market for one part type,
    * per order year (TPC-H Q8): the deepest broadcast-dimension join
    * tree in the relational suite — part-type filter shrinks the fact
    * stream at the scan, region membership and supplier nation ride
    * broadcast lookups, and the share renders through the identical
    * IEEE floor chain over hash-stable decimal-sum doubles. */
  def nationMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val natInRegion = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === MktRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnat"))
    val custR = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .join(broadcast(natInRegion), col("c_nationkey") === col("cnat"))
      .select("c_custkey")
    val suppNat = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("px"))
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_type") === MktType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custR), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(when(col("supp_nation") === MktNation, col("px"))
        .otherwise(lit(0.0)), 8).as("nation_revenue"),
        dsum(col("px"), 8).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("share_ppm",
        expr("CAST(FLOOR(nation_revenue * 1000000.0 / total_revenue)" +
          " AS BIGINT)"))
      .orderBy("o_year")
  }

  /** Priority class excluded from [[orderCountDistribution]] — stands in
    * for Q13's `o_comment NOT LIKE '%special%requests%'` (the testdata
    * orders table carries no comment column). */
  val Q13ExcludedPriorityPrefix = "1"

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly N qualifying orders — INCLUDING the
    * zero-order customers, which is the whole point of the query and why
    * it must be a LEFT join from the customer dimension (an inner join
    * silently drops the biggest bucket). Two aggregations: per-customer
    * count (counting the nullable order key, so no-match rows count 0),
    * then the count-of-counts rollup — both map-side combinable; the
    * join shuffles on custkey, the classic large-dimension × fact shape
    * AQE handles at scale. */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(Tables.orders(spark, sfDir)
        .filter(!col("o_orderpriority").startsWith(Q13ExcludedPriorityPrefix))
        .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
}

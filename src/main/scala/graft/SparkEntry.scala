package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ §7.2.9 extensions), each with DuckDB oracle SQL in
  * [[oracleSql]] computing the identical result on the same parquet.
  *
  * Registry lives in [[Catalog.entries]]; this object only adapts it to the
  * driver's shape.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Metrics.tokenDocument(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.entries.map(e => e.name -> e.fn).toMap

  def oracleSql: Map[String, String] =
    Catalog.entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}

/** One registered query: Spark implementation + optional DuckDB oracle
  * (None → the driver records a weaker rows-only check; used only for
  * genuinely non-SQL-expressible or approximate operators). */
final case class QEntry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  import Oracle._

  val entries: Seq[QEntry] = Seq(

    // ── Token-analytics change-log metrics (SURVEY §2.6 A1-A4, §2.10 C1) ──
    QEntry("q_volume_hourly", Metrics.hourlyVolume, Some(withTransfers(
      s"""SELECT contract_address, ${hourBucket("transact_at")} AS t,
         |       ${dsum("value")} AS volume
         |FROM transfers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    QEntry("q_txcount_hourly", Metrics.hourlyTxCount, Some(withTransfers(
      s"""SELECT contract_address, ${hourBucket("transact_at")} AS t,
         |       count(*) AS tx_count
         |FROM transfers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    QEntry("q_avg_tx_per_day", Metrics.avgTxPerDay, Some(withTransfers(
      s"""SELECT contract_address, ${dayBucket("transact_at")} AS d,
         |       count(*) AS daily_count,
         |       CAST(count(*) AS DOUBLE) / 24.0 AS avg_tx
         |FROM transfers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    QEntry("q_unique_wallets_hourly", Metrics.hourlyUniqueWallets,
      Some(withTransfers(
        s"""SELECT contract_address, t, count(DISTINCT address) AS unique_wallets
           |FROM (
           |  SELECT contract_address, ${hourBucket("transact_at")} AS t,
           |         from_address AS address FROM transfers
           |  UNION ALL
           |  SELECT contract_address, ${hourBucket("transact_at")} AS t,
           |         to_address AS address FROM transfers
           |)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    QEntry("q_unique_wallets_hll", Metrics.hourlyUniqueWalletsApprox, None),

    QEntry("q_token_document", Metrics.tokenDocument, Some(withTransfers(
      s"""SELECT *,
         |       CAST(n_transfers AS DOUBLE) / CAST(active_days AS DOUBLE)
         |         AS avg_tx_per_day
         |FROM (
         |  SELECT contract_address,
         |         count(*) AS n_transfers,
         |         ${dsum("value")} AS total_volume,
         |         count(DISTINCT from_address) AS unique_senders,
         |         count(DISTINCT to_address) AS unique_receivers,
         |         min(transact_at) AS first_ts,
         |         max(transact_at) AS last_ts,
         |         min(block_number) AS min_block,
         |         max(block_number) AS max_block,
         |         count(DISTINCT ${dayBucket("transact_at")}) AS active_days
         |  FROM transfers GROUP BY 1
         |) ORDER BY contract_address""".stripMargin))),

    // ── Balance engine (SURVEY §2.7 W1/W2, §2.9 U1, §2.4 F7, §2.5 J2/J3) ──
    QEntry("q_balance_history",
      (s, d) => Balances.balanceHistory(s, d),
      Some(withBalances(Tables.FocusToken,
        "SELECT address, t, delta, balance FROM bal ORDER BY address, t"))),

    QEntry("q_holder_count", Balances.holderCount,
      Some(withBalances(Tables.FocusToken,
        s"""SELECT t, CAST(SUM(ih) AS BIGINT) AS holder_count FROM (
           |  SELECT t, CASE WHEN balance > ${Tables.HolderThreshold}
           |         OR (lag(balance, 1) OVER (PARTITION BY address ORDER BY t)
           |               > ${Tables.HolderThreshold}
           |             AND balance IS NULL)
           |    THEN 1 ELSE 0 END AS ih
           |  FROM bal
           |) GROUP BY t ORDER BY t""".stripMargin))),

    QEntry("q_whale_count", Balances.whaleCount,
      Some(withBalances(Tables.FocusToken,
        s"""SELECT t, count(*) AS whale_count FROM bal
           |WHERE balance >= ${Tables.WhaleThreshold}
           |GROUP BY t ORDER BY t""".stripMargin))),

    QEntry("q_densified_balance",
      (s, d) => Balances.densifiedBalances(s, d),
      Some(withBalances(Tables.FocusToken,
        s"""SELECT address, t, balance, balance >= ${Tables.WhaleThreshold} AS is_whale
           |FROM (
           |  SELECT g.address, g.t,
           |         CAST(SUM(COALESCE(h.ddelta, CAST(0 AS DECIMAL(25,2))))
           |           OVER (PARTITION BY g.address ORDER BY g.t
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |           AS DOUBLE) AS balance
           |  FROM (
           |    SELECT a.address, r.t
           |    FROM (SELECT DISTINCT address FROM hourly) a
           |    CROSS JOIN (
           |      SELECT unnest(range((SELECT min(t) FROM hourly),
           |                          (SELECT max(t) FROM hourly) + 3600,
           |                          3600)) AS t) r
           |  ) g
           |  LEFT JOIN hourly h ON g.address = h.address AND g.t = h.t
           |) ORDER BY address, t""".stripMargin))),

    QEntry("q_wallet_balance_maps", Balances.walletBalanceMaps, None),

    // ── Wallet clustering (SURVEY §2.4 F8, §2.6 A5/A8, §2.10 C7/C10) ──
    QEntry("q_wallet_clusters", Clusters.hourlyClusters, Some(withTransfers(
      s"""SELECT t, CASE WHEN n < ${Tables.ClusterLow} THEN 'LOW'
         |            WHEN n < ${Tables.ClusterHigh} THEN 'MEDIUM'
         |            ELSE 'HIGH' END AS cluster, address, n
         |FROM (
         |  SELECT t, address, count(*) AS n FROM (
         |    SELECT ${hourBucket("transact_at")} AS t, from_address AS address
         |    FROM transfers WHERE contract_address = '${Tables.FocusToken}'
         |    UNION ALL
         |    SELECT ${hourBucket("transact_at")} AS t, to_address AS address
         |    FROM transfers WHERE contract_address = '${Tables.FocusToken}'
         |  ) GROUP BY t, address
         |) ORDER BY t, address""".stripMargin))),

    QEntry("q_cluster_pivot", Clusters.clusterPivot, Some(withTransfers(
      s"""SELECT contract_address,
         |       count(CASE WHEN cluster = 'LOW' THEN 1 END) AS "LOW",
         |       count(CASE WHEN cluster = 'MEDIUM' THEN 1 END) AS "MEDIUM",
         |       count(CASE WHEN cluster = 'HIGH' THEN 1 END) AS "HIGH"
         |FROM (
         |  SELECT contract_address, address,
         |         CASE WHEN count(*) < ${Tables.ClusterLow} THEN 'LOW'
         |              WHEN count(*) < ${Tables.ClusterHigh} THEN 'MEDIUM'
         |              ELSE 'HIGH' END AS cluster
         |  FROM (
         |    SELECT contract_address, from_address AS address FROM transfers
         |    UNION ALL
         |    SELECT contract_address, to_address AS address FROM transfers
         |  ) GROUP BY contract_address, address
         |) GROUP BY 1 ORDER BY 1""".stripMargin))),

    QEntry("q_cluster_map", (s, d) => Clusters.clusterMap(s, d), None),

    // ── Dapp membership (SURVEY §2.5 J1, §2.6 A4/A7, §2.4 F9) ──
    QEntry("q_dapp_hourly", Dapps.hourlyDappCounts, Some(withTransfersAndDapps(
      s"""SELECT t, count(DISTINCT da.dapp_id) AS n_dapps, count(*) AS n_interactions
         |FROM (
         |  SELECT ${hourBucket("transact_at")} AS t, from_address AS address
         |  FROM transfers
         |  UNION ALL
         |  SELECT ${hourBucket("transact_at")} AS t, to_address AS address
         |  FROM transfers
         |) l
         |JOIN (SELECT dapp_id, unnest(addresses) AS address FROM dapps) da
         |  ON l.address = da.address
         |GROUP BY t ORDER BY t""".stripMargin))),

    QEntry("q_dapp_totals", Dapps.dappTotals, Some(withTransfersAndDapps(
      """SELECT da.dapp_id, da.dapp_name,
        |       count(*) AS n_interactions,
        |       count(DISTINCT l.address) AS n_wallets
        |FROM (
        |  SELECT from_address AS address FROM transfers
        |  UNION ALL
        |  SELECT to_address AS address FROM transfers
        |) l
        |JOIN (SELECT dapp_id, dapp_name, unnest(addresses) AS address FROM dapps) da
        |  ON l.address = da.address
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin))),

    QEntry("q_dapp_wallets", Dapps.dappWallets, Some(withTransfersAndDapps(
      """SELECT DISTINCT da.dapp_id, l.address
        |FROM (
        |  SELECT from_address AS address FROM transfers
        |  UNION ALL
        |  SELECT to_address AS address FROM transfers
        |) l
        |JOIN (SELECT dapp_id, unnest(addresses) AS address FROM dapps) da
        |  ON l.address = da.address
        |ORDER BY 1, 2""".stripMargin))),

    QEntry("q_dapp_info", (s, _) => Dapps.dappInfo(s), Some {
      val rows = Tables.DappImages.map { case (id, img) =>
        s"('$id', ${img.map(i => s"'$i'").getOrElse("NULL")})"
      }.mkString(", ")
      s"""SELECT dapp_id, COALESCE(image, 'default.png') AS image
         |FROM (VALUES $rows) AS t(dapp_id, image)
         |ORDER BY dapp_id""".stripMargin
    }),

    // ── Key synthesis / filters / upsert-dedup (SURVEY §2.10 C11-C15,
    //    §2.4 F1/F2/F4, §2.2 K1) ──
    QEntry("q_transfer_edges", Keys.transferEdges, Some(withTransfers(
      """SELECT concat_ws('_', log_index, block_number, from_address, to_address) AS _key,
        |       'wallets/' || from_address AS _from,
        |       'wallets/' || to_address AS _to,
        |       contract_address, block_number
        |FROM transfers ORDER BY _key""".stripMargin))),

    QEntry("q_prefix_strip", Keys.prefixStripCounts, Some(withTransfers(
      """SELECT split_part('wallets/' || from_address, '/', 2) AS address,
        |       count(*) AS n
        |FROM transfers GROUP BY 1 ORDER BY 1""".stripMargin))),

    QEntry("q_filtered_transfers", Keys.filteredTransferCounts,
      Some(withTransfers(
        s"""SELECT contract_address, count(*) AS n, ${dsum("value")} AS volume
           |FROM transfers
           |WHERE contract_address NOT IN ('error', 'signup')
           |  AND from_address LIKE '1%'
           |GROUP BY 1 ORDER BY 1""".stripMargin))),

    QEntry("q_block_range", Keys.blockRangeScan, Some(withTransfers(
      s"""SELECT contract_address, count(*) AS n,
         |       min(block_number) AS first_block,
         |       max(block_number) AS last_block
         |FROM transfers
         |WHERE block_number BETWEEN 100 AND 7000
         |  AND transact_at BETWEEN ${1704067200L + 5 * 86400}
         |                      AND ${1704067200L + 20 * 86400}
         |GROUP BY 1 ORDER BY 1""".stripMargin))),

    QEntry("q_upsert_dedup", Keys.upsertDedupCounts, Some(withTransfers(
      """SELECT contract_address, count(*) AS n FROM (
        |  SELECT DISTINCT _key, contract_address FROM (
        |    SELECT concat_ws('_', log_index, block_number, from_address, to_address)
        |             AS _key, contract_address FROM transfers
        |    UNION ALL
        |    SELECT concat_ws('_', log_index, block_number, from_address, to_address)
        |             AS _key, contract_address FROM transfers
        |  )
        |) GROUP BY 1 ORDER BY 1""".stripMargin))),

    QEntry("q_map_roundtrip", Keys.mapRoundTrip, Some(withTransfers(
      s"""SELECT contract_address, ${hourBucket("transact_at")} AS t,
         |       ${dsum("value")} AS volume
         |FROM transfers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))),

    QEntry("q_change_log_maps", Keys.changeLogMaps, None),

    // ── Relational suite over TPC-H-ish tables (SURVEY §2.5, §2.6) ──
    QEntry("q_pricing_summary", Relational.pricingSummary, Some(
      s"""SELECT *,
         |       sum_qty / count_order AS avg_qty,
         |       sum_base_price / count_order AS avg_price
         |FROM (
         |  SELECT l_returnflag, l_linestatus,
         |         ${dsum("l_quantity")} AS sum_qty,
         |         ${dsum("l_extendedprice")} AS sum_base_price,
         |         ${dsum("l_extendedprice * (1.0 - l_discount)", 8)} AS sum_disc_price,
         |         ${dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 8)} AS sum_charge,
         |         count(*) AS count_order
         |  FROM lineitem
         |  WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |  GROUP BY 1, 2
         |) ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QEntry("q_revenue_by_segment", Relational.revenueBySegment, Some(
      s"""SELECT c.c_mktsegment,
         |       CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
         |       ${dsum("l.l_extendedprice * (1.0 - l.l_discount)", 8)} AS revenue,
         |       count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QEntry("q_revenue_by_nation", Relational.revenueByNation, Some(
      s"""SELECT n.n_name,
         |       ${dsum("l.l_extendedprice * (1.0 - l.l_discount)", 8)} AS revenue,
         |       count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |WHERE r.r_name IN ('ASIA', 'EUROPE')
         |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QEntry("q_semi_join", Relational.customersWithOrders, Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    QEntry("q_anti_join", Relational.customersWithoutOrders, Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    QEntry("q_top_orders_per_customer", Relational.topOrdersPerCustomer, Some(
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin)),

    QEntry("q_orders_rollup", Relational.ordersRollup, Some(
      s"""SELECT r.r_name, n.n_name,
         |       count(*) AS n_orders,
         |       ${dsum("o.o_totalprice")} AS total
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY ROLLUP(r.r_name, n.n_name)
         |ORDER BY r.r_name ASC NULLS FIRST, n.n_name ASC NULLS FIRST""".stripMargin)))
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the driver-facing catalog. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every core query names a real catalog entry, without duplicates") {
    val qs = SparkEntry.queries.keySet
    val ghosts = SparkEntry.CoreQueries.filterNot(qs)
    assert(ghosts.isEmpty, s"core names without catalog entry: $ghosts")
    val dups = SparkEntry.CoreQueries.groupBy(identity).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate core names: ${dups.keys}")
  }

  test("catalog names are unique") {
    val names = Catalog.entries.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("flagship entry equals the oracle-checked q_token_documents_full") {
    // entry is the map-typed library form, q_token_documents_full the
    // JSON-rendered driver form; both must stay the SAME document. Renders
    // entry's maps / parses the JSON into a common comparable shape so the
    // smoke-checked flagship can never drift from the oracle-checked one.
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val e = SparkEntry.entry(spark) // hardwired to GraftSpark.Sf's dir
    val j = SparkEntry.queries("q_token_documents_full")(spark, GraftSpark.Sf)
    def entriesOf(c: Column, ddl: String): Column =
      array_sort(map_entries(coalesce(c,
        from_json(lit("{}"), ddl, new java.util.HashMap[String, String]))))
    def eMap(name: String, valueExpr: String, ddl: String): Column =
      entriesOf(expr(
        s"transform_keys(transform_values($name, (k, v) -> $valueExpr)," +
          " (k, v) -> cast(k as string))"), ddl).as(name)
    def jMap(name: String, ddl: String): Column =
      entriesOf(from_json(col(name), ddl, new java.util.HashMap[String, String]),
        ddl).as(name)
    val scalars = Seq("contract_address", "address", "circulating_supply",
      "name", "symbol", "decimals", "logo", "_key").map(col)
    val longLogs = Seq("numberOfTransferChangeLogs",
      "numberOfAddressChangeLogs", "numberOfDappChangeLogs",
      "numberOfHolderChangeLogs", "numberOfWhaleWalletChangeLogs")
    val clusterDdl = "map<string,struct<LOW:struct<addresses:array<string>>," +
      "MEDIUM:struct<addresses:array<string>>," +
      "HIGH:struct<addresses:array<string>>>>"
    val eN = e.select(scalars ++
      Seq(eMap("tradingVolumeChangeLogs", "v", "map<string,double>"),
        // %.6f-render then reparse: from_json normalizes JSON numbers, so
        // the comparable form is the parsed double on both sides
        eMap("averageNumberOfTransactionPerDay",
          "cast(format_string('%.6f', v) as double)", "map<string,double>"),
        eMap("walletClusterByNumberOfTransfer", "v", clusterDdl)) ++
      longLogs.map(eMap(_, "v", "map<string,bigint>")): _*)
    val jN = j.select(scalars ++
      Seq(jMap("tradingVolumeChangeLogs", "map<string,double>"),
        jMap("averageNumberOfTransactionPerDay", "map<string,double>"),
        jMap("walletClusterByNumberOfTransfer", clusterDdl)) ++
      longLogs.map(jMap(_, "map<string,bigint>")): _*)
    assert(eN.count() == jN.count())
    assert(eN.exceptAll(jN).isEmpty && jN.exceptAll(eN).isEmpty)
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, GraftSpark.Sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}

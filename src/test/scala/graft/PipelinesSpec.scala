package graft

import graft.pipelines.Pipelines
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end runs of the four reference-pipeline equivalents. */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private lazy val out =
    java.nio.file.Files.createTempDirectory("graft_pipe").toString

  test("raw load is idempotent under re-run") {
    Pipelines.rawLoad(spark, GraftSpark.Sf, out)
    val n1 = spark.read.parquet(s"$out/transfers").count()
    Pipelines.rawLoad(spark, GraftSpark.Sf, out)
    val n2 = spark.read.parquet(s"$out/transfers").count()
    assert(n1 == n2 && n1 == 1000)
  }

  test("wallet documents: one per (token, wallet), map keys sorted") {
    Pipelines.enrichWallets(spark, GraftSpark.Sf, out)
    val w = spark.read.parquet(s"$out/wallets")
    assert(w.count() > 0)
    assert(w.select("_key").distinct().count() == w.count())
    val keysSorted = w.select(map_keys(col("balanceChangeLogs")).as("ks"))
      .filter(expr("ks != array_sort(ks)")).count()
    assert(keysSorted == 0)
  }

  test("dapp documents keyed token_dapp with sorted wallet arrays") {
    Pipelines.enrichDapps(spark, GraftSpark.Sf, out)
    val d = spark.read.parquet(s"$out/dapps")
    assert(d.count() > 0)
    assert(d.filter(expr("address != array_sort(address)")).count() == 0)
  }

  test("token documents carry all 8 change-log maps for every token") {
    val docs = Pipelines.tokenDocuments(spark, GraftSpark.Sf)
    assert(docs.count() == 5)
    val cols = docs.columns.toSet
    val expected = Set("tradingVolumeChangeLogs", "numberOfTransferChangeLogs",
      "numberOfAddressChangeLogs", "averageNumberOfTransactionPerDay",
      "numberOfDappChangeLogs", "numberOfHolderChangeLogs",
      "numberOfWhaleWalletChangeLogs", "walletClusterByNumberOfTransfer")
    assert(expected.subsetOf(cols), s"missing: ${expected.diff(cols)}")
    // volume map totals must equal the flat metric
    val fromMap = docs.select(explode(col("tradingVolumeChangeLogs")))
      .agg(sum("value")).head().getDouble(0)
    val flat = graft.ops.Metrics.hourlyVolume(spark, GraftSpark.Sf)
      .agg(sum("volume")).head().getDouble(0)
    assert(math.abs(fromMap - flat) < 1e-6)
  }

  test("token enrichment writes and re-reads through the upsert sink") {
    Pipelines.enrichTokens(spark, GraftSpark.Sf, out)
    assert(spark.read.parquet(s"$out/tokens").count() == 5)
  }

  test("corpus pipeline: partitioned write matches the dedup decision and " +
      "re-runs are no-ops") {
    val metrics = Pipelines.enrichCorpus(spark, GraftSpark.Sf, out)
    val first = spark.read.parquet(s"$out/corpus")
    // observed write metrics (collected ON the write job, no extra scan)
    // agree with what actually landed on disk
    assert(metrics("rows_written") == first.count())
    assert(metrics("chars_written") ==
      first.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("text")).cast("long")))
        .head().getLong(0))
    assert(metrics("min_doc_id") ==
      first.agg(org.apache.spark.sql.functions.min("doc_id")).head().getLong(0))
    val expected = graft.ops.Dedup.dedupedCorpus(spark, GraftSpark.Sf)
    assert(first.count() == expected.count())
    // lang/source are partition columns: pruning applies, values round-trip
    assert(first.select("doc_id", "lang", "source")
      .exceptAll(expected.select("doc_id", "lang", "source")).isEmpty)
    val partitions = first.select("lang", "source").distinct().count()
    assert(partitions > 1, "expected a multi-partition layout")
    // materialize before the re-run: the overwrite replaces the files the
    // first frame's scan listed, so a lazy re-scan of `first` would fail
    val firstIds = first.select("doc_id").collect().map(_.getLong(0)).sorted
    // idempotent re-run: identical doc set, no duplicated rows appended
    Pipelines.enrichCorpus(spark, GraftSpark.Sf, out)
    val second = spark.read.parquet(s"$out/corpus")
    val secondIds = second.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(firstIds.sameElements(secondIds))
  }
}

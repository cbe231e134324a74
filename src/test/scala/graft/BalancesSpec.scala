package graft

import graft.ops.{Balances, Clusters, Num}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Micro-fixture semantics tests for the balance engine and clustering
  * (FIXTURES.md §C fixtures list). */
class BalancesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("hour bucketing floors to the containing hour") {
    val df = Seq(3599L, 3600L, 3601L, 7199L).toDF("s")
      .select(Num.hourBucket(col("s")).as("b"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 3600L, 3600L, 3600L))
  }

  test("double-entry legs conserve value: closed universe sums to zero") {
    // 4 transfers over 2 hours, 3 addresses, incl. a self-transfer
    val t = Seq(
      ("a", "b", 10.0, 100L), ("b", "c", 4.0, 3700L),
      ("c", "a", 1.5, 3800L), ("a", "a", 7.0, 7300L))
      .toDF("from_address", "to_address", "value", "transact_at")
    val legs = t.select(col("from_address").as("address"),
        negate(col("value")).as("delta"))
      .unionByName(t.select(col("to_address").as("address"),
        col("value").as("delta")))
    val total = legs.agg(Num.dsum(col("delta"))).as[Double].head()
    assert(total == 0.0)
  }

  test("cumulative balance carries forward per address") {
    val bal = Balances.balanceHistory(spark, GraftSpark.Sf)
    // last balance per address equals the sum of its deltas
    val mismatch = bal.groupBy("address")
      .agg(Num.dsum(col("delta")).as("s"),
        max_by(col("balance"), col("t")).as("b")) // deterministic "latest", unlike last()
      .filter(abs(col("s") - col("b")) > 1e-9)
      .count()
    assert(mismatch == 0)
  }

  test("holder flag fires strictly above threshold") {
    val flags = Balances.holderFlags(spark, GraftSpark.Sf, "purchase", 100.0)
    val bad = flags.filter(
      (col("balance") > 100.0) =!= col("is_holder")).count()
    assert(bad == 0)
  }

  test("cluster buckets partition the count domain at 10/20") {
    val df = Seq(9L, 10L, 19L, 20L, 21L).toDF("n")
      .select(Clusters.clusterOf(col("n")).as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("LOW", "MEDIUM", "MEDIUM", "HIGH", "HIGH"))
  }

  test("cluster map coalesces missing clusters to empty arrays") {
    val m = Clusters.clusterMap(spark, GraftSpark.Sf).collect()
    assert(m.length == 1) // one row holding the whole map — A9 shape
  }

  test("densified grid has |addresses| x |hours| rows") {
    val d = Balances.densifiedBalances(spark, GraftSpark.Sf)
    val n = d.count()
    val addrs = d.select("address").distinct().count()
    val hours = d.select("t").distinct().count()
    assert(n == addrs * hours)
  }

  test("scd2 intervals tile each wallet's timeline with one open state") {
    val iv = Balances.scd2Intervals(spark, GraftSpark.Sf)
    // exactly one open (NULL valid_to) interval per address
    val opens = iv.groupBy("address")
      .agg(sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1)
    assert(opens.isEmpty)
    // intervals chain: next row's valid_from equals this row's valid_to
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("address").orderBy("valid_from")
    val broken = iv
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull &&
        col("valid_to") =!= col("next_from"))
    assert(broken.isEmpty)
  }

  test("negative balances: flagged wallets match the running recount and " +
    "cover exactly the below-zero histories") {
    val got = graft.ops.Balances.negativeBalances(spark, GraftSpark.Sf)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("min_balance"),
        r.getAs[Long]("first_negative_t"),
        r.getAs[Long]("n_negative_hours"))).toMap
    val hist = graft.ops.Balances.balanceHistory(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("balance")))
      .groupBy(_._1)
    val expect = hist.view.mapValues { rs =>
      val neg = rs.filter(_._3 < 0)
      if (neg.isEmpty) None
      else Some((neg.map(_._3).min, neg.map(_._2).min, neg.length.toLong))
    }.toMap.collect { case (a, Some(v)) => a -> v }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("scd2Merge: incremental merge equals the full interval rebuild") {
    val sf = GraftSpark.Sf
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3), r.getBoolean(4))).toSeq
    val merged = rows(Balances.scd2Merge(spark, sf))
    val full = rows(Balances.scd2Intervals(spark, sf))
    assert(merged == full)
    // the equivalence must be non-vacuous: the withheld batch really
    // splits the history (some wallet has intervals on both sides)
    val deltas = Balances.hourlyDeltas(spark, sf, Tables.FocusToken)
    val cut = deltas.agg(max(col("t"))).collect()(0).getLong(0) - 48L * 3600L
    assert(deltas.filter(col("t") >= cut).count() > 0)
    assert(deltas.filter(col("t") < cut).count() > 0)
  }
}

package graft

import graft.ops.Membership
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MembershipSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.Sf

  test("bloom prefilter result equals the naive NOT-IN form") {
    val blacklist = Tables.DappRegistry.flatMap(_._3).distinct
    val naive = Tables.transfers(spark, sf)
      .filter(!col("to_address").isin(blacklist: _*))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n"), graft.ops.Num.dsum(col("value")).as("volume"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val bloom = Membership.bloomFilteredVolume(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bloom == naive)
    assert(bloom.nonEmpty)
  }

  test("golden records: complete partition of customers, fusion rules hold") {
    val rows = Membership.goldenRecords(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    // every customer lands in exactly one cluster
    assert(rows.map(_.getAs[Long]("n_members")).sum == nCust)
    for (r <- rows) {
      // the CC label is the min member id, which is also the canonical key
      assert(r.getAs[Long]("canonical_key") == r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_segments") >= 1)
      assert(r.getAs[Long]("n_segments") <=
        math.min(r.getAs[Long]("n_members"), 5L))
    }
    // merged clusters exist at this sf (linkage finds near-identical names)
    assert(rows.exists(_.getAs[Long]("n_members") > 1))
    // balance mass is conserved through fusion
    val fused = rows.map(r => BigDecimal(r.getAs[Double]("total_acctbal")))
      .sum
    val raw = Tables.customer(spark, sf).select("c_acctbal")
      .collect().map(r => BigDecimal(r.getDouble(0))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert((fused - raw).abs < BigDecimal(0.01))
  }
}

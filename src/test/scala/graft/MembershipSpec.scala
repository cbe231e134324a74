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
}

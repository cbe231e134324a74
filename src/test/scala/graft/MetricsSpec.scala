package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("HLL distinct counts stay within the configured error bound") {
    import spark.implicits._
    // rsd = 0.01 configured in hourlyUniqueWalletsApprox; assert every group
    // lands within 5× the rsd (≈5σ — a deterministic sketch either passes
    // this forever or is broken) of the exact count.
    val exact = graft.ops.Metrics.hourlyUniqueWallets(spark, GraftSpark.Sf)
      .withColumnRenamed("unique_wallets", "exact")
    val approx = graft.ops.Metrics.hourlyUniqueWalletsApprox(spark, GraftSpark.Sf)
      .withColumnRenamed("unique_wallets", "approx")
    val errs = exact.join(approx, Seq("contract_address", "t"))
      .select((abs(col("approx") - col("exact")).cast("double")
        / col("exact").cast("double")).as("rel_err"))
      .as[Double].collect()
    assert(errs.nonEmpty)
    val worst = errs.max
    assert(worst <= 0.05, s"worst HLL relative error $worst exceeds 5%")
  }
}

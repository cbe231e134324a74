package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: both sides bucketed+sorted on the join
  * key join with NO exchange — the pre-shuffle investment that repeated big
  * joins amortize at 100 TB (SURVEY §7 partitioning notes). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("join of co-bucketed tables plans without a shuffle") {
    val ord = Tables.orders(spark, GraftSpark.Sf)
    val li = Tables.lineitem(spark, GraftSpark.Sf)
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("q"))
      j.collect()
      // inspect only the AQE-final plan (toString appends the pre-AQE
      // "Initial Plan" section, which still shows the groupBy exchange)
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // the join subtree needs no exchange; only the final groupBy shuffles
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"), joinPart)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

package graft

import graft.ops.Privacy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.Sf

  test("redaction: no digits survive, pseudonyms are stable and collision-free") {
    val r = Privacy.redactCustomers(spark, sf)
    assert(r.filter(col("name_masked").rlike("[0-9]")).isEmpty)
    // deterministic: a re-run produces the identical mapping
    assert(r.exceptAll(Privacy.redactCustomers(spark, sf)).isEmpty)
    // referential integrity: distinct names <-> distinct pseudonyms
    val names = Tables.customer(spark, sf).select("c_name").distinct().count()
    assert(r.select("pseudonym").distinct().count() == names)
    // banding only coarsens: band <= value < band + 1000
    val bad = r.join(Tables.customer(spark, sf), Seq("c_custkey"))
      .filter(col("c_acctbal") < col("acctbal_band") ||
        col("c_acctbal") >= col("acctbal_band") + 1000.0)
    assert(bad.isEmpty)
  }

  test("redaction is a pure projection: no exchange in the plan") {
    val p = Privacy.redactCustomers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("k-anonymity: published cells >= K, residual hides the rest, total exact") {
    val h = Privacy.kAnonHistogram(spark, sf).collect()
    val (residual, published) = h.partition(_.getAs[String]("segment") == "*")
    assert(published.forall(_.getAs[Long]("n_rows") >= Privacy.KAnon))
    assert(residual.length <= 1)
    // no published quasi-identifier below K, and the counts add back up
    val total = Tables.customer(spark, sf).count()
    assert(h.map(_.getAs[Long]("n_rows")).sum == total)
    // residual really is the sum of all small cells
    val smallSum = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .filter(col("count") < Privacy.KAnon)
      .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
    val resSum = residual.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    assert(resSum == smallSum)
  }
}

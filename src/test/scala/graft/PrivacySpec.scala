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

  test("t-closeness: exact EMD recount in BigInt, bounds, gate consistency") {
    import org.apache.spark.sql.functions._
    val audit = graft.ops.Privacy.tClosenessAudit(spark, GraftSpark.Sf)
      .collect()
    assert(audit.nonEmpty)
    // recompute every group's ordered EMD driver-side with BigInt
    val raw = Tables.customer(spark, GraftSpark.Sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = raw.map(_._3).distinct.sorted
    val nTotal = BigInt(raw.length)
    val globCum = bands.map(b => b -> BigInt(raw.count(_._3 <= b))).toMap
    audit.foreach { a =>
      val (nat, seg) = (a.getAs[Long]("nation"), a.getAs[String]("segment"))
      val grp = raw.filter(x => x._1 == nat && x._2 == seg)
      val n = BigInt(grp.length)
      assert(a.getAs[Long]("n_rows") == grp.length)
      val emdNum = bands.map(b =>
        (nTotal * BigInt(grp.count(_._3 <= b)) - n * globCum(b)).abs).sum
      val expect =
        if (bands.length > 1)
          emdNum * 1000000 / (n * nTotal * BigInt(bands.length - 1))
        else BigInt(0)
      assert(BigInt(a.getAs[Long]("emd_ppm")) == expect, s"group $nat/$seg")
      assert(a.getAs[Long]("emd_ppm") >= 0 && a.getAs[Long]("emd_ppm") <= 1000000)
      assert(a.getAs[Boolean]("publishable") ==
        (a.getAs[Long]("emd_ppm") <= graft.ops.Privacy.TClosenessPpm &&
          grp.length >= graft.ops.Privacy.KAnon))
    }
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

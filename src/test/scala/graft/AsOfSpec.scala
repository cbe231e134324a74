package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of [[AsOf.asofJoin]] — the same code path the catalog's
  * `q_asof_price` runs (DuckDB's native ASOF verifies it at catalog level). */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("asofJoin picks latest at-or-before; earlier rows get null") {
    val updates = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 5L, 9.0))
      .toDF("k", "ts", "price")
    val probes = Seq(("a", 5L, 1L), ("a", 15L, 2L), ("a", 20L, 3L), ("b", 100L, 4L))
      .toDF("k", "ts", "id")
    val got = AsOf.asofJoin(probes, updates, "k", "ts", "price", "price_at")
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(r.fieldIndex("price_at"))).map(_.asInstanceOf[Double]))).toSeq
    assert(got == Seq(
      ("a", 5L, None),          // before first observation
      ("a", 15L, Some(1.0)),    // latest prior
      ("a", 20L, Some(2.0)),    // same-ts tie: update applies
      ("b", 100L, Some(9.0))))  // far future still carries
  }

  test("probe-only columns survive the join unchanged") {
    val updates = Seq(("a", 10L, 1.0)).toDF("k", "ts", "v")
    val probes = Seq(("a", 15L, "payload", 7)).toDF("k", "ts", "s", "n")
    val row = AsOf.asofJoin(probes, updates, "k", "ts", "v", "v_at").head()
    assert(row.getAs[String]("s") == "payload" && row.getAs[Int]("n") == 7
      && row.getAs[Double]("v_at") == 1.0)
  }

  test("interpolateJoin: between, at, and beyond the observations") {
    val updates = Seq(("a", 10L, 100.0), ("a", 20L, 200.0), ("a", 40L, 100.0))
      .toDF("k", "ts", "price")
    val probes = Seq(("a", 5L), ("a", 10L), ("a", 15L), ("a", 25L),
      ("a", 40L), ("a", 50L)).toDF("k", "ts")
    val got = AsOf.interpolateJoin(probes, updates, "k", "ts", "price", "pi")
      .orderBy("ts").select("ts", "pi").as[(Long, Double)].collect().toSeq
    assert(got == Seq(
      (5L, 100.0),   // before first: nearest (edge fill)
      (10L, 100.0),  // exactly on an observation
      (15L, 150.0),  // halfway 100→200
      (25L, 175.0),  // quarter of the way 200→100
      (40L, 100.0),  // on the last observation
      (50L, 100.0))) // beyond last: carry
  }

  test("interpolateJoin with no update on a key yields null") {
    val updates = Seq(("a", 10L, 1.0)).toDF("k", "ts", "v")
    val probes = Seq(("b", 5L)).toDF("k", "ts")
    val row = AsOf.interpolateJoin(probes, updates, "k", "ts", "v", "vi").head()
    assert(row.isNullAt(row.fieldIndex("vi")))
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the composed as-of join (same fixture DuckDB's native
  * ASOF verified in the oracle test at catalog level). */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("carry-forward picks latest at-or-before; earlier rows get null") {
    val p = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 5L, 9.0))
      .toDF("k", "ts", "price")
      .select(col("k"), col("ts"), lit(null).cast("long").as("id"),
        col("price"), lit(1).as("is_price"))
    val e = Seq(("a", 5L, 1L), ("a", 15L, 2L), ("a", 20L, 3L), ("b", 100L, 4L))
      .toDF("k", "ts", "id")
      .select(col("k"), col("ts"), col("id"),
        lit(null).cast("double").as("price"), lit(0).as("is_price"))
    val w = Window.partitionBy("k").orderBy(col("ts").asc, col("is_price").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = p.unionByName(e)
      .withColumn("price_at", last(col("price"), ignoreNulls = true).over(w))
      .filter(col("is_price") === 0)
      .select("k", "ts", "price_at")
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(
      ("a", 5L, None),          // before first observation
      ("a", 15L, Some(1.0)),    // latest prior
      ("a", 20L, Some(2.0)),    // same-ts tie: update applies
      ("b", 100L, Some(9.0))))  // far future still carries
  }
}

package graft

import graft.functions.WeightedAvg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WeightedAvgSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def wavg(rows: Seq[(Option[Double], Option[Double])]): Option[Double] = {
    WeightedAvg.register(spark)
    val r = rows.toDF("v", "w")
      .agg(expr(s"${WeightedAvg.Name}(v, w)")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("weighted average with exact weights") {
    assert(wavg(Seq(Some(10.0) -> Some(1.0), Some(20.0) -> Some(3.0)))
      .contains(17.5))
  }

  test("null value or weight rows are skipped, not zeroed") {
    assert(wavg(Seq(Some(10.0) -> Some(1.0), None -> Some(100.0),
      Some(99.0) -> None)).contains(10.0))
  }

  test("all-null input evaluates to null, not division by zero") {
    assert(wavg(Seq(None -> None)).isEmpty)
  }

  test("partition-count independent (decimal accumulation)") {
    WeightedAvg.register(spark)
    val df = (1 to 1000).map(i => (i * 0.01, (i % 7 + 1).toDouble))
      .toDF("v", "w")
    val a = df.repartition(1)
      .agg(expr(s"${WeightedAvg.Name}(v, w)")).head().getDouble(0)
    val b = df.repartition(13)
      .agg(expr(s"${WeightedAvg.Name}(v, w)")).head().getDouble(0)
    assert(a == b)
  }
}

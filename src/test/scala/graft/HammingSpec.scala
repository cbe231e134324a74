package graft

import graft.functions.HammingDistance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HammingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def dist(a: String, b: String): Int = {
    HammingDistance.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(expr(s"${HammingDistance.Name}(a, b)")).as[Int].head()
  }

  test("hamming distance basics") {
    assert(dist("0000", "0000") == 0)
    assert(dist("0000", "1111") == 4)
    assert(dist("0101", "0011") == 2)
    assert(dist("01", "0111") == 2) // length diff counted
  }

  test("codegen and interpreted paths agree") {
    HammingDistance.register(spark)
    val df = Tables.documents(spark, GraftSpark.Sf).limit(50)
      .select(md5(col("text")).as("a"), md5(col("source")).as("b"))
    val viaExpr = df.select(expr(s"${HammingDistance.Name}(a, b)").as("d"))
      .as[Int].collect().toSeq
    val viaEval = df.collect().toSeq.map { r =>
      val x = r.getString(0).getBytes; val y = r.getString(1).getBytes
      val n = math.min(x.length, y.length)
      var d = math.abs(x.length - y.length)
      (0 until n).foreach(i => if (x(i) != y(i)) d += 1)
      d
    }
    assert(viaExpr == viaEval)
  }

  test("expression rejects non-string inputs at analysis") {
    HammingDistance.register(spark)
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(expr(s"${HammingDistance.Name}(a, b)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("hamming"))
  }
}

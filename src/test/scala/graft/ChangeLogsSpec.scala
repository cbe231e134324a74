package graft

import graft.ops.ChangeLogs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeLogsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("perKey builds one sorted map per group regardless of input order") {
    val df = Seq(("a", 30L, 3.0), ("a", 10L, 1.0), ("b", 20L, 2.0), ("a", 20L, 2.0))
      .toDF("k", "t", "v")
    val m = ChangeLogs.perKey(df.repartition(3), col("k"), col("t"), col("v"), "log")
      .orderBy("k")
      .as[(String, Map[Long, Double])].collect().toSeq
    assert(m == Seq(("a", Map(10L -> 1.0, 20L -> 2.0, 30L -> 3.0)),
      ("b", Map(20L -> 2.0))))
    // deterministic key ORDER inside the map (not just equal contents)
    val keys = ChangeLogs.perKey(df.repartition(5), col("k"), col("t"), col("v"), "log")
      .filter(col("k") === "a")
      .select(map_keys(col("log"))).as[Seq[Long]].head()
    assert(keys == Seq(10L, 20L, 30L))
  }

  test("global collapses a frame to one map row") {
    val df = Seq((2L, "y"), (1L, "x")).toDF("t", "v")
    val m = ChangeLogs.global(df, col("t"), col("v"), "log")
      .as[Map[Long, String]].collect().toSeq
    assert(m == Seq(Map(1L -> "x", 2L -> "y")))
  }
}

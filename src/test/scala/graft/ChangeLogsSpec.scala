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

  test("JSON rendering is the exact serialization of the map form") {
    import org.apache.spark.sql.types._
    val sf = GraftSpark.Sf
    // parse the driver-facing JSON string back and compare entry-by-entry
    // against the map-typed library form — proves the two catalog surfaces
    // are the same aggregation, not parallel implementations that can drift
    val fromJson = graft.ops.Keys.changeLogMapsJson(spark, sf)
      .select(col("contract_address"),
        explode(from_json(col("tradingVolumeChangeLogs"),
          MapType(StringType, DoubleType))).as(Seq("t", "v")))
      .select(col("contract_address"), col("t").cast("long").as("t"), col("v"))
    val fromMap = graft.ops.Keys.changeLogMaps(spark, sf)
      .select(col("contract_address"),
        explode(col("tradingVolumeChangeLogs")).as(Seq("t", "v")))
    val j = fromJson.as[(String, Long, Double)].collect().toSet
    val m = fromMap.as[(String, Long, Double)].collect().toSet
    assert(j.nonEmpty && j == m)
  }
}

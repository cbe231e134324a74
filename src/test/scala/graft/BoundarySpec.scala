package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Boundary

/** Schema-boundary guard: every loader conforms to a pinned StructType so a
  * testdata re-encode degrades to a cast or ONE clear error — never a silent
  * semantic change (the TIMESTAMP(NANOS)→TIMESTAMP(MICROS,NTZ) `events.ts`
  * re-encode once invalidated 40% of the catalog without a single loud
  * failure at the read site). */
class BoundarySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("every pinned table loads and conforms on the current testdata") {
    for (name <- Boundary.Pinned.keys) {
      val df = Tables.table(spark, GraftSpark.Sf, name)
      assert(df.limit(1).count() >= 0, s"$name unreadable")
      val pinned = Boundary.Pinned(name)
      assert(df.schema.map(_.name) == pinned.map(_.name),
        s"$name column set/order drifted")
    }
  }

  test("events normalization yields canonical ts columns on any encoding") {
    val ev = Tables.events(spark, GraftSpark.Sf)
    assert(ev.schema("ts").dataType == LongType)      // epoch nanos
    assert(ev.schema("ts_sec").dataType == LongType)  // epoch seconds
    assert(ev.schema("ts_t").dataType == TimestampType)
    val r = ev.select(min("ts"), min("ts_sec"), min(unix_micros(col("ts_t"))))
      .as[(Long, Long, Long)].head()
    assert(r._1 / 1000000000L == r._2, "ts(nanos) and ts_sec disagree")
    assert(r._1 / 1000L == r._3, "ts(nanos) and ts_t(micros) disagree")
    // sane range: events are modern epoch (2020-2040), not 1970±epsilon —
    // the exact failure mode of a unit-misread (micros read as nanos lands
    // in 1970)
    assert(r._2 > 1577836800L && r._2 < 2208988800L,
      s"ts_sec=${r._2} outside sane epoch range — unit misread?")
  }

  test("normalizeEventTime accepts epoch-nanos long input (legacy encoding)") {
    val df = Seq((1L, 1704067200000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Tables.normalizeEventTime(df)
    val r = out.select("ts", "ts_sec").as[(Long, Long)].head()
    assert(r == ((1704067200000000000L, 1704067200L)))
  }

  test("normalizeEventTime rejects unrecognized ts types loudly") {
    val df = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTime(df))
    assert(e.getMessage.contains("events.ts"))
  }

  test("conform casts drifted-but-castable columns and pins column order") {
    val drifted = Seq((1, "Alpha", 9.5f, "extra"))
      .toDF("c_custkey", "c_name", "c_acctbal", "surplus")
      .withColumn("c_nationkey", lit(2).cast("short"))
      .withColumn("c_mktsegment", lit("BUILDING"))
    val out = Boundary.conform("customer", drifted)
    assert(out.schema.map(_.name) ==
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    assert(out.schema("c_custkey").dataType == LongType)
    assert(out.schema("c_acctbal").dataType == DoubleType)
    assert(out.head().getLong(0) == 1L)
  }

  test("conform names the table and column on a missing column") {
    val broken = Seq((1L, "x")).toDF("c_custkey", "c_name")
    val e = intercept[IllegalStateException](
      Boundary.conform("customer", broken))
    assert(e.getMessage.contains("customer"))
    assert(e.getMessage.contains("c_nationkey"))
  }

  test("streaming and batch events read identical event time") {
    val batch = Tables.events(spark, GraftSpark.Sf)
      .agg(count(lit(1)), min("ts"), max("ts")).as[(Long, Long, Long)].head()
    val tbl = "boundary_stream_probe"
    val q = Tables.eventsStream(spark, GraftSpark.Sf)
      .groupBy().agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
      .writeStream.outputMode("complete").format("memory").queryName(tbl).start()
    try q.processAllAvailable() finally q.stop()
    val stream = spark.table(tbl).as[(Long, Long, Long)].head()
    assert(stream == batch)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch change-log metrics.
  *
  * The reference has no streaming layer — its "incremental" mode is a
  * driver-side loop over 5,000-block ranges with sleeps and manual retries
  * (reference: src/main/scala/etl/TransferEnricher.scala:33,112-150). The
  * idiomatic Spark equivalent is a file-source stream + event-time windowed
  * aggregation: new parquet files are discovered per micro-batch, hourly
  * tumbling windows replace the integer-division bucketing, and state lives
  * in the checkpointed state store instead of ad-hoc driver futures.
  *
  * [[hourlyVolumeStreaming]] executes the stream synchronously over the
  * static testdata (memory sink, available-now semantics) and returns the
  * same relation the batch query produces, so the DuckDB oracle for
  * `q_volume_hourly` verifies the streaming engine end-to-end.
  */
object StreamingMetrics {

  /** events schema for the streaming source (file streams require an
    * explicit schema; `ts` arrives as epoch-nanos long under the
    * nanos-as-long flag set by [[graft.Tables.events]]). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly volume per token, computed by a streaming windowed aggregation
    * over the events parquet and drained synchronously. Output matches
    * [[graft.ops.Metrics.hourlyVolume]] exactly. */
  def hourlyVolumeStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tableName = "graft_stream_hourly_volume"

    val stream = spark.readStream
      .schema(EventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      .select(col("event_type").as("contract_address"), col("ts_t"), col("value"))
      // Event-time tumbling window — epoch-aligned, so window.start equals
      // the batch engine's integer-division hour bucket.
      .groupBy(col("contract_address"), window(col("ts_t"), "1 hour"))
      .agg(sum(col("value").cast(DecimalType(25, 2))).as("dvolume"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(tableName)
      .select(
        col("contract_address"),
        unix_timestamp(col("window.start")).as("t"),
        col("dvolume").cast("double").as("volume"))
      .orderBy("contract_address", "t")
  }
}

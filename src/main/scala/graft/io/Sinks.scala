package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink surface: CSV/JSON writers and the upsert-by-key parquet sink.
  *
  * The reference's sinks are an ArangoDB writer with `overwrite.mode=update`
  * (upsert by `_key`; K1, reference: common/Spark.scala:71-88), a CSV dump
  * (K2, reference: utils/WriteToFile.scala:6-12) and a driver-side JSON
  * writer (K3, reference: utils/Extract0x38Dapp.scala:40-43). Offline
  * equivalents: columnar parquet with merge-on-key semantics, and
  * distributed CSV/JSON writers.
  */
object Sinks {

  /** K2: header'd CSV, overwrite. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.format("csv").option("header", "true")
      .mode(SaveMode.Overwrite).save(path)

  /** K3: distributed JSON lines (replaces the reference's driver-side
    * PrintWriter). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K1: upsert-by-key parquet merge. New rows win over existing rows with
    * the same key; within a batch the highest `versionCol` wins (ties by
    * presence order are eliminated — deterministic). One shuffle on the key;
    * at cluster scale the same shape works over partitioned table dirs with
    * dynamic partition overwrite. */
  def upsertParquet(spark: SparkSession, incoming: DataFrame, keyCol: String,
      versionCol: String, path: String): Unit = {
    val existing =
      try spark.read.parquet(path).withColumn("_is_new", lit(0))
      catch { case _: Exception => null }
    val merged = Option(existing) match {
      case Some(old) => old.unionByName(incoming.withColumn("_is_new", lit(1)))
      case None => incoming.withColumn("_is_new", lit(1))
    }
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_is_new").desc, col(versionCol).desc)
    val winner = merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_new")
    // parquet can't overwrite its own input in place — stage then swap
    val tmp = path + "__staged"
    winner.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}

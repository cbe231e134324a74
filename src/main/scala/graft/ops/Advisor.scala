package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning/broadcast ADVISOR — the operational-tuning certificate for
  * the knobs every Spark job at 100 TB gets wrong first: how many files a
  * table should compact to, how many shuffle partitions its exchanges
  * want, and whether a join side fits under the broadcast threshold.
  *
  * The estimate is a deterministic SIZE MODEL, not sampled file bytes:
  * fixed widths per numeric/temporal column, `length+4` per string,
  * `4·len+4` per float vector — the in-memory row-footprint arithmetic
  * both engines can compute bit-identically (parquet's encoded size
  * varies with encoder settings; the model is the stable upper-ish bound
  * planning should key off). Nulls are modeled at full width — a
  * simplification shared by both sides and stated here.
  *
  * Joins the tuning-certificate family (LSH banding, IVF nprobe,
  * watermark delay): it prices the decision BEFORE the rewrite, on this
  * data, in one scan per table. */
object Advisor {

  /** Spark's default autoBroadcastJoinThreshold. */
  val BroadcastThreshold = 10485760L

  /** Compaction target per output file (128 MB). */
  val TargetFileBytes = 134217728L

  /** Post-shuffle partition target (64 MB — half the file target, the
    * usual rule so a map-side combine halves into one file write). */
  val TargetPartitionBytes = 67108864L

  /** Column kinds per table: f4/f8 fixed widths, str, farr (float[]).
    * Fixed-width columns contribute constants, so only string/vector
    * columns are referenced by name — robust to canonicalization adding
    * derived columns. */
  val TableCols: Seq[(String, Seq[(String, String)])] = Seq(
    "customer" -> Seq("c_custkey" -> "f8", "c_name" -> "str",
      "c_nationkey" -> "f4", "c_acctbal" -> "f8", "c_mktsegment" -> "str"),
    "documents" -> Seq("doc_id" -> "f8", "text" -> "str", "lang" -> "str",
      "source" -> "str", "n_chars" -> "f8"),
    "embeddings" -> Seq("vec_id" -> "f8", "embedding" -> "farr",
      "label" -> "f4"),
    "events" -> Seq("event_id" -> "f8", "ts" -> "f8", "user_id" -> "f8",
      "event_type" -> "str", "value" -> "f8", "props" -> "str"),
    "lineitem" -> Seq("l_orderkey" -> "f8", "l_partkey" -> "f8",
      "l_suppkey" -> "f8", "l_linenumber" -> "f4", "l_quantity" -> "f8",
      "l_extendedprice" -> "f8", "l_discount" -> "f8", "l_tax" -> "f8",
      "l_returnflag" -> "str", "l_linestatus" -> "str",
      "l_shipdate" -> "f8"),
    "nation" -> Seq("n_nationkey" -> "f4", "n_name" -> "str",
      "n_regionkey" -> "f4"),
    "orders" -> Seq("o_orderkey" -> "f8", "o_custkey" -> "f8",
      "o_orderstatus" -> "str", "o_totalprice" -> "f8",
      "o_orderdate" -> "f8", "o_orderpriority" -> "str"),
    "part" -> Seq("p_partkey" -> "f8", "p_name" -> "str",
      "p_brand" -> "str", "p_type" -> "str", "p_size" -> "f4",
      "p_retailprice" -> "f8"),
    "region" -> Seq("r_regionkey" -> "f4", "r_name" -> "str"),
    "supplier" -> Seq("s_suppkey" -> "f8", "s_name" -> "str",
      "s_nationkey" -> "f4", "s_acctbal" -> "f8"))

  /** Row-bytes expression for one table — `sizeFn` abstracts the array
    * length spelling (Spark `size`, DuckDB `len`); everything else is
    * engine-neutral SQL. */
  def rowBytesExpr(cols: Seq[(String, String)],
      sizeFn: String => String): String =
    cols.map {
      case (_, "f4") => "4"
      case (_, "f8") => "8"
      case (c, "str") => s"(coalesce(length($c), 0) + 4)"
      case (c, _) => s"(coalesce(${sizeFn(c)}, 0) * 4 + 4)"
    }.mkString("(", " + ", ")")

  private def load(spark: SparkSession, sfDir: String,
      tbl: String): DataFrame = tbl match {
    case "customer" => Tables.customer(spark, sfDir)
    case "documents" => Tables.documents(spark, sfDir)
    case "embeddings" => Tables.embeddings(spark, sfDir)
    case "events" => Tables.events(spark, sfDir)
    case "lineitem" => Tables.lineitem(spark, sfDir)
    case "nation" => Tables.nation(spark, sfDir)
    case "orders" => Tables.orders(spark, sfDir)
    case "part" => Tables.part(spark, sfDir)
    case "region" => Tables.region(spark, sfDir)
    case _ => Tables.supplier(spark, sfDir)
  }

  /** One row per table: modeled bytes, broadcast verdict, compaction file
    * count at [[TargetFileBytes]], shuffle partitions at
    * [[TargetPartitionBytes]]. One scan per table, all-integer. */
  def partitionAdvisor(spark: SparkSession, sfDir: String): DataFrame =
    TableCols.map { case (tbl, cols) =>
      load(spark, sfDir, tbl)
        .agg(count(lit(1)).as("n_rows"),
          sum(expr(rowBytesExpr(cols, c => s"size($c)")).cast("long"))
            .as("est_bytes"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("est_bytes"))
    }.reduce(_ unionByName _)
      .withColumn("broadcastable", col("est_bytes") <= BroadcastThreshold)
      .withColumn("n_target_files", expr("greatest(CAST(1 AS BIGINT)," +
        s" (est_bytes + ${TargetFileBytes - 1}) div $TargetFileBytes)"))
      .withColumn("shuffle_partitions", expr("greatest(CAST(1 AS BIGINT)," +
        s" (est_bytes + ${TargetPartitionBytes - 1})" +
        s" div $TargetPartitionBytes)"))
      .orderBy("tbl")
}

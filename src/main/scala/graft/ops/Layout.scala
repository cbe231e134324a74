package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout keys: interleave the low 16 bits of two
  * integer dimensions so that sorting by the single z value co-locates
  * rows that are close in BOTH dimensions. Files/row-groups written in z
  * order carry tight min/max ranges on each source column, so parquet
  * min/max pruning skips data for predicates on either dimension — the
  * multi-dimensional data-skipping trick (Delta/Iceberg OPTIMIZE ZORDER)
  * at the heart of scan-efficient 100 TB layouts, where a linear sort
  * only ever serves its leading column.
  *
  * The bit-spread is the classic mask ladder (x | x<<8 … & 0x5555…),
  * pure integer arithmetic — identical in any engine, so the z values
  * are oracle-checkable; LayoutSpec measures the actual per-file extent
  * tightening against a linear-sorted layout of the same data. */
object Layout {

  /** Low-16-bit spread (Morton "part1by1"): bit i of `e` moves to bit 2i.
    * Emitted as an expression string so the Spark side (`shiftleft`) and
    * the DuckDB oracle (`<<`) share one definition of the ladder. */
  private def spreadExpr(e: String, shl: (String, Int) => String): String = {
    val ladder =
      Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    ladder.foldLeft(s"(CAST($e AS BIGINT) & 65535)") {
      case (acc, (n, mask)) => s"(($acc | ${shl(acc, n)}) & $mask)"
    }
  }

  def sparkSpread(e: String): String =
    spreadExpr(e, (x, n) => s"shiftleft($x, $n)")
  def duckSpread(e: String): String =
    spreadExpr(e, (x, n) => s"($x << $n)")

  /** z(a, b): a in even bits, b in odd bits. */
  def sparkZ(a: String, b: String): String =
    s"(${sparkSpread(a)} | shiftleft(${sparkSpread(b)}, 1))"
  def duckZ(a: String, b: String): String =
    s"(${duckSpread(a)} | (${duckSpread(b)} << 1))"

  /** The two layout dimensions for `orders`: key and (integer) total
    * price, both folded into 16 bits. floor() before the cast — a raw
    * double→BIGINT cast truncates in Spark but rounds in DuckDB. */
  val DimA = "o_orderkey % 65536"
  val DimB = "CAST(floor(o_totalprice) AS BIGINT) % 65536"

  /** (o_orderkey, zval) in z-curve order — the write order a z-clustered
    * `orders` table would use. */
  def zorderOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("zval", expr(sparkZ(DimA, DimB)))
      .select(col("o_orderkey"), col("zval"))
      .orderBy("zval", "o_orderkey")

  /** Write `orders` as `files` parquet files clustered by z value
    * (range-partition on zval, sort within partitions) — the layout
    * [[graft.LayoutSpec]] measures extents on. */
  def writeZClustered(spark: SparkSession, sfDir: String, path: String,
      files: Int): Unit =
    Tables.orders(spark, sfDir)
      .withColumn("ka", expr(DimA))
      .withColumn("kb", expr(DimB))
      .withColumn("zval", expr(sparkZ(DimA, DimB)))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)

  /** Same rows, linear-sorted by the leading dimension only. */
  def writeLinear(spark: SparkSession, sfDir: String, path: String,
      files: Int): Unit =
    Tables.orders(spark, sfDir)
      .withColumn("ka", expr(DimA))
      .withColumn("kb", expr(DimB))
      .withColumn("zval", expr(sparkZ(DimA, DimB)))
      .repartitionByRange(files, col("ka"))
      .sortWithinPartitions("ka")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) extents of both dimensions for a written layout:
    * what parquet footer pruning sees. */
  def fileExtents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("ka").as("amin"), max("ka").as("amax"),
        min("kb").as("bmin"), max("kb").as("bmax"))

  /** Compaction output-group target, in text bytes. Small on purpose so the
    * tiny test corpora still produce multi-file plans; at 100 TB this is
    * 128 MB–1 GB. */
  val CompactionTargetBytes = 4096L

  /** Small-file compaction planner — the query side of OPTIMIZE/compaction:
    * documents bin-packed, in deterministic doc_id order within each
    * source, into output groups of ~[[CompactionTargetBytes]] by
    * cumulative-size-so-far div target (first-fit in a fixed order, the
    * same greedy every table-format compactor runs). Output: one row per
    * planned file with its doc count, byte total and id range.
    *
    * Scale: one window pass partitioned by `source` — the compaction unit
    * IS the storage partition, so parallelism is the partition count and
    * no global order exists anywhere. A group can overshoot the target by
    * at most one document (greedy first-fit); the planner never splits a
    * document across files, matching real compactors' row-group
    * granularity. */
  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val before = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("sz"))
      .withColumn("cum_before", coalesce(sum(col("sz")).over(before), lit(0L)))
      .withColumn("file_no", expr(s"cum_before div $CompactionTargetBytes"))
      .groupBy("source", "file_no")
      .agg(count(lit(1)).as("n_docs"), sum("sz").as("bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "file_no")
  }

  /** Training-batch padding audit: the token waste of padding each batch
    * to its longest member, compared between ARRIVAL-order batching and
    * LENGTH-SORTED batching (the standard dynamic-batching win). Batches
    * of [[BatchSize]] form WITHIN each source shard — the form batching
    * takes on a real cluster (a global row-number sort is a single-task
    * funnel at 100 TB; per-shard windows are not), and what makes the
    * audit partition-independent. Waste per batch is
    * `n·max(len) − Σ len` (the final partial batch pads to its own size,
    * not B). All-integer until the one final waste-fraction division.
    *
    * One exchange keyed by source drives both orderings: the two
    * row-number windows differ only in sort key, so they share the
    * partitioning; per-batch stats then collapse map-side. */
  val BatchSize = 32

  def batchPaddingAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(graft.ops.TextAnalysis.toksExpr))
      .filter(col("text").isNotNull && expr("size(toks) >= 1"))
      .select(col("source"), col("doc_id"),
        expr("size(toks)").cast("long").as("len"))
      .withColumn("r_arrival", row_number().over(w.orderBy("doc_id")))
      .withColumn("r_sorted",
        row_number().over(w.orderBy(col("len"), col("doc_id"))))
    def audit(rank: String, strategy: String) = base
      .groupBy(col("source"),
        expr(s"($rank - 1) div $BatchSize").as("batch_no"))
      .agg(count(lit(1)).as("n"), max("len").as("mx"), sum("len").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_batches"), sum("tok").as("n_tokens"),
        sum(col("n") * col("mx") - col("tok")).as("n_padding"))
      .select(col("source"), lit(strategy).as("strategy"), col("n_batches"),
        col("n_tokens"), col("n_padding"),
        round(col("n_padding").cast("double") /
          (col("n_padding") + col("n_tokens")).cast("double"), 6)
          .as("padding_frac"))
    audit("r_arrival", "arrival")
      .unionByName(audit("r_sorted", "length_sorted"))
      .orderBy("source", "strategy")
  }
}

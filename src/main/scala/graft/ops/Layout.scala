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

  // ── Hilbert-curve layout (the z-order alternative) ──

  /** Bits per dimension for the Hilbert index; the curve fills the
    * 65536 × 65536 grid and d spans [0, 2^32). */
  val HilbertBits = 16
  val HilbertN: Long = 1L << HilbertBits

  /** One xy2d round at scale `s` (the textbook iterative Hilbert
    * encoding: quadrant digit + reflect-and-swap rotation), as (d', x',
    * y') expression strings over columns `(hd, hx, hy)`. Plain CASE +
    * integer arithmetic — ONE generator serves Spark and DuckDB
    * verbatim, so the two engines share the curve definition the way
    * [[spreadExpr]] shares the Morton ladder. The quadrant digit
    * `(3·rx) XOR ry` is spelled as its 4-row CASE truth table (DuckDB's
    * `^` is power, not xor; the CASE is engine-neutral). */
  private def hilbertStep(s: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
    val quad = s"(CASE WHEN $rx = 1 AND $ry = 1 THEN 2" +
      s" WHEN $rx = 1 THEN 3 WHEN $ry = 1 THEN 1 ELSE 0 END)"
    // the square is CAST to BIGINT: at s = 2^15 the int-literal product
    // s*s*quad reaches 3·2^30 and overflows 32-bit arithmetic (ANSI
    // Spark raises; DuckDB INTEGER would too)
    val d = s"(hd + CAST(${s * s} AS BIGINT) * $quad)"
    val x = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1" +
      s" THEN ${HilbertN - 1} - hy ELSE hy END) ELSE hx END)"
    val y = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1" +
      s" THEN ${HilbertN - 1} - hx ELSE hx END) ELSE hy END)"
    (d, x, y)
  }

  /** Append `hval` (the 32-bit Hilbert index of (`xExpr`, `yExpr`)) to
    * `df` by unrolling the 16 rounds as chained projections — pure
    * per-row arithmetic, no shuffle, codegen-friendly. */
  def withHilbert(df: DataFrame, xExpr: String, yExpr: String): DataFrame = {
    var cur = df
      .withColumn("hx", expr(s"CAST($xExpr AS BIGINT)"))
      .withColumn("hy", expr(s"CAST($yExpr AS BIGINT)"))
      .withColumn("hd", lit(0L))
    for (k <- (HilbertBits - 1) to 0 by -1) {
      val (d, x, y) = hilbertStep(1L << k)
      cur = cur
        .select(col("*"), expr(d).as("hd2"), expr(x).as("hx2"),
          expr(y).as("hy2"))
        .drop("hd", "hx", "hy")
        .withColumnRenamed("hd2", "hd")
        .withColumnRenamed("hx2", "hx")
        .withColumnRenamed("hy2", "hy")
    }
    cur.withColumnRenamed("hd", "hval").drop("hx", "hy")
  }

  /** The same 16 rounds as chained DuckDB CTEs `h0..h16` over `srcCte`
    * (must expose `xExpr`/`yExpr` and every column in `keep`); `h16`
    * carries `keep` plus the final index in `hd`. */
  def duckHilbertCtes(srcCte: String, xExpr: String, yExpr: String,
      keep: Seq[String]): String = {
    val keepCols = keep.mkString(", ")
    val steps = ((HilbertBits - 1) to 0 by -1).zipWithIndex.map {
      case (k, i) =>
        val (d, x, y) = hilbertStep(1L << k)
        s"""h${i + 1} AS (
           |  SELECT $keepCols, $d AS hd, $x AS hx, $y AS hy
           |  FROM h$i
           |)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS (
       |  SELECT $keepCols, CAST(0 AS BIGINT) AS hd,
       |         CAST($xExpr AS BIGINT) AS hx, CAST($yExpr AS BIGINT) AS hy
       |  FROM $srcCte
       |),
       |$steps""".stripMargin
  }

  /** (o_orderkey, hval) in Hilbert order — [[zorderOrders]]'s twin on the
    * curve with strictly better worst-case locality (every step of the
    * Hilbert walk is grid-adjacent; Morton takes long diagonal jumps at
    * power-of-two seams, which is exactly what widens file extents). */
  def hilbertOrders(spark: SparkSession, sfDir: String): DataFrame =
    withHilbert(
      Tables.orders(spark, sfDir)
        .withColumn("ka", expr(DimA))
        .withColumn("kb", expr(DimB)),
      "ka", "kb")
      .select(col("o_orderkey"), col("hval"))
      .orderBy("hval", "o_orderkey")

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

  /** Write `orders` as `files` parquet files clustered by Hilbert index —
    * [[writeZClustered]]'s curve twin; LayoutSpec measures both curves'
    * extent tightening against the linear layout. */
  def writeHilbertClustered(spark: SparkSession, sfDir: String,
      path: String, files: Int): Unit =
    withHilbert(
      Tables.orders(spark, sfDir)
        .withColumn("ka", expr(DimA))
        .withColumn("kb", expr(DimB))
        .withColumn("zval", expr(sparkZ(DimA, DimB))),
      "ka", "kb")
      .repartitionByRange(files, col("hval"))
      .sortWithinPartitions("hval")
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

  /** File count the data-skipping model splits each candidate layout
    * into, and the range-predicate grid sizes per dimension. */
  val SkippingFiles = 32
  val DateWindows = 8
  val KeyWindows = 4

  /** Data-skipping certificate — the WHY behind [[zorderOrders]], as a
    * measured number: for each candidate physical layout of `orders`
    * (sorted by key, sorted by date, z-ordered over key × price), split
    * the table into [[SkippingFiles]] deterministic files, collect each
    * file's min/max footer extents of BOTH predicate columns, and count
    * how many files a grid of range predicates could skip. The output is
    * the classic trade quantified on this data: a date-sorted layout
    * skips ~everything for date ranges and nothing for key ranges, the
    * z-order splits the difference on both — exactly the decision a
    * 100 TB table owner makes before a rewrite, here priced in one query
    * instead of two test rewrites.
    *
    * The file model is EQUAL-WIDTH range buckets over the layout key
    * (min/max from a broadcast 1-row bound, the quantile-sketch guard for
    * degenerate spans) — deterministic and oracle-mirrorable, unlike
    * `repartitionByRange`'s sampled quantiles; a skewed key inflates some
    * model files the same way it inflates real range-partitioned ones.
    * Everything is integer arithmetic on epoch days / keys / z-values;
    * cost is one pass per layout plus a 96-row × 12-predicate literal
    * cross join. */
  def skippingStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("k"),
      // epoch days via DATE arithmetic: o_orderdate arrives TIMESTAMP_NTZ,
      // and the DATE cast is the tz-free reading both engines share
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')" +
        " AS BIGINT)").as("d"))
    val b = raw.agg(min("k").as("kmn"), max("k").as("kmx"),
      min("d").as("dmn"), max("d").as("dmx"))
    // the z-curve interleaves MONOTONE 16-bit scalings of the two
    // PREDICATE dimensions (key, date) — the co-clustering a real
    // OPTIMIZE ZORDER BY (k, d) performs; a z over unrelated dimensions
    // would measure nothing about these predicates. Scaled dims span the
    // full 16-bit range by construction, so the z space is [0, 2^32).
    val rows = raw.crossJoin(broadcast(b))
      .withColumn("ka16",
        expr("(k - kmn) * 65535 div greatest(kmx - kmn, 1)"))
      .withColumn("da16",
        expr("(d - dmn) * 65535 div greatest(dmx - dmn, 1)"))
      .withColumn("z", expr(sparkZ("ka16", "da16")))
      .transform(withHilbert(_, "ka16", "da16"))
    val layouts = Seq("by_key", "by_date", "zorder", "hilbert").toDF("layout")
    val extents = rows.crossJoin(broadcast(layouts))
      .withColumn("lk", expr(
        "CASE layout WHEN 'by_key' THEN k WHEN 'by_date' THEN d" +
          " WHEN 'zorder' THEN z ELSE hval END"))
      .withColumn("lmn", expr(
        "CASE layout WHEN 'by_key' THEN kmn WHEN 'by_date' THEN dmn" +
          " ELSE CAST(0 AS BIGINT) END"))
      .withColumn("lmx", expr(
        "CASE layout WHEN 'by_key' THEN kmx WHEN 'by_date' THEN dmx" +
          " ELSE CAST(4294967295 AS BIGINT) END"))
      .withColumn("file_id", expr(s"least((lk - lmn) * $SkippingFiles" +
        s" div greatest(lmx - lmn + 1, 1), ${SkippingFiles - 1})"))
      .groupBy("layout", "file_id")
      .agg(min("k").as("fkmn"), max("k").as("fkmx"),
        min("d").as("fdmn"), max("d").as("fdmx"))
    def win(dim: String, n: Int, mn: String, mx: String) =
      spark.range(n).select(lit(dim).as("dim"), col("id").as("i"))
        .crossJoin(broadcast(b))
        .withColumn("w", expr(s"($mx - $mn + $n) div $n"))
        .select(col("dim"), col("i"),
          expr(s"$mn + i * w").as("lo"), expr(s"$mn + (i + 1) * w").as("hi"))
    val preds = win("date", DateWindows, "dmn", "dmx")
      .unionByName(win("key", KeyWindows, "kmn", "kmx"))
    extents.crossJoin(broadcast(preds))
      .withColumn("skip", expr(
        "CASE WHEN dim = 'date' THEN (fdmx < lo OR fdmn >= hi)" +
          " ELSE (fkmx < lo OR fkmn >= hi) END"))
      .groupBy("layout", "dim")
      .agg(countDistinct(col("file_id")).as("n_files"),
        countDistinct(col("i")).as("n_preds"),
        expr("SUM(CASE WHEN skip THEN 1 ELSE 0 END) * 1000000 div COUNT(*)")
          .as("skipped_ppm"))
      .orderBy("layout", "dim")
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

package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed training-adjacent learners over the corpus tables: an exact
  * decision-stump fit (the one-split CART tree quality filters start from)
  * and grid-DBSCAN density clustering over a 2-D sketch of the embedding
  * space. Both are pure relational programs — deterministic, RNG-free, and
  * oracle-checkable in DuckDB.
  *
  * Scale design: everything funnels through constant-size frames. The stump
  * reduces the corpus to |features| × [[StumpBuckets]] histogram rows before
  * any window runs; DBSCAN reduces points to occupied grid CELLS before the
  * neighborhood join and the component loop — both are the
  * "collapse to the distribution first" house pattern
  * (reference has no learner at all; this is engine-extension surface).
  */
object Learn {

  /** Histogram resolution for stump split search. 32 buckets ≈ the split
    * grid scikit's `max_bins`-style quantization uses at the small end. */
  val StumpBuckets = 32L

  /** The label the stump predicts: doc is English. A stand-in for the
    * "high-quality document" labels a production quality filter trains on
    * (the plumbing is label-agnostic — swap the CASE). */
  val StumpLang = "en"

  /** Exact decision-stump training: find, per surface feature, the binary
    * split `v < cut` minimizing weighted Gini impurity of the
    * is-[[StumpLang]] label, and rank features by their best split.
    *
    * Algorithm (all integer/decimal arithmetic, bit-portable):
    *  1. per doc: four integer surface features (token count, char count,
    *     longest token, distinct tokens) + 0/1 label — one narrow pass;
    *  2. per feature: global [mn, mx] from a 4-row aggregate, then
    *     `bucket = (v-mn)·B div (mx-mn+1)` — always in [0, B), no clamp;
    *  3. per (feature, bucket): (n, n₁) counts — the ONLY data-sized
    *     shuffle, map-side combinable to ≤ 4·B rows per partition;
    *  4. cumulative (feature)-partitioned window over ≤ B rows gives left
    *     counts at every candidate cut; right = totals − left;
    *  5. split score in exact ppm:
    *     `floor(1e6·L₀L₁/L) + floor(1e6·R₀R₁/R)` through DECIMAL(38,0)
    *     (exact to ~1e15 rows/side; the truncating `div` is the
    *     positive-operand spelling DuckDB's `//` matches).
    *
    * The reported `cut` is exact: bucket(v) ≤ b  ⟺  v < mn +
    * ceil((b+1)(mx-mn+1)/B), so the stump is reproducible from the output
    * row alone. Output: one row per feature — its best split, the split's
    * side populations and positive counts, and each side's majority label —
    * ordered best-first (gini_ppm, feature). */
  def decisionStump(spark: SparkSession, sfDir: String): DataFrame = {
    val b = StumpBuckets
    val docs = Tables.documentsWide(spark, sfDir)
      .withColumn("toks", expr(TextAnalysis.toksExpr))
    val feats = docs.select(
      when(col("lang") === StumpLang, 1L).otherwise(0L).as("y"),
      expr("CAST(size(toks) AS BIGINT)").as("n_toks"),
      col("n_chars").cast("long").as("n_chars"),
      expr("CAST(array_max(transform(toks, x -> length(x))) AS BIGINT)")
        .as("max_tok"),
      expr("CAST(size(array_distinct(toks)) AS BIGINT)").as("n_uniq"))
    val long = feats.selectExpr("y",
      "stack(4, 'n_toks', n_toks, 'n_chars', n_chars, " +
        "'max_tok', max_tok, 'n_uniq', n_uniq) AS (feature, v)")
    val bounds = long.groupBy("feature")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val hist = long.join(broadcast(bounds), Seq("feature"))
      .select(col("feature"), col("y"), col("mn"), col("mx"),
        expr(s"(v - mn) * $b div greatest(mx - mn + 1, 1)").as("bucket"))
      .groupBy("feature", "bucket", "mn", "mx")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n1"))
    val w = Window.partitionBy("feature").orderBy("bucket")
    val tot = hist.groupBy("feature")
      .agg(sum(col("n")).as("nn"), sum(col("n1")).as("nn1"))
    val splits = hist
      .withColumn("l", sum(col("n")).over(w))
      .withColumn("l1", sum(col("n1")).over(w))
      .join(broadcast(tot), Seq("feature"))
      .filter(col("l") < col("nn")) // both sides populated
      .select(col("feature"), col("bucket"), col("mn"), col("mx"),
        col("l"), col("l1"), (col("nn") - col("l")).as("r"),
        (col("nn1") - col("l1")).as("r1"))
      .withColumn("gini_ppm", expr(
        """CAST(CAST(l - l1 AS DECIMAL(38,0)) * l1 * 1000000 div l
          |   + CAST(r - r1 AS DECIMAL(38,0)) * r1 * 1000000 div r
          |   AS BIGINT)""".stripMargin))
    val best = splits
      .withColumn("rn", row_number().over(
        Window.partitionBy("feature").orderBy(col("gini_ppm"), col("bucket"))))
      .filter(col("rn") === 1)
    best.select(col("feature"),
      expr(s"mn + ((bucket + 1) * greatest(mx - mn + 1, 1) + $b - 1) div $b")
        .as("cut"),
      col("gini_ppm"), col("l").as("n_left"), col("l1").as("n_left_pos"),
      col("r").as("n_right"), col("r1").as("n_right_pos"),
      expr("CAST(CASE WHEN l1 * 2 >= l THEN 1 ELSE 0 END AS BIGINT)")
        .as("left_pred"),
      expr("CAST(CASE WHEN r1 * 2 >= r THEN 1 ELSE 0 END AS BIGINT)")
        .as("right_pred"))
      .orderBy("gini_ppm", "feature")
  }

  /** Grid cell size for DBSCAN, in 2-D sketch units. */
  val DbscanEps = 3.0
  /** Minimum points in a cell's 3×3 neighborhood for the cell to be core. */
  val DbscanMinPts = 8L
  /** Cell-id packing: cid = (cx+Off)·Span + (cy+Off). */
  private val DbscanSpan = 1L << 21
  private val DbscanOff = 1L << 20

  /** Grid-DBSCAN over a 2-D Rademacher sketch of the embeddings — the
    * density-clustering counterpart of the centroid (k-means) and
    * similarity (ANN) families: clusters are density-connected regions of
    * arbitrary shape, points in sparse regions are noise, no k chosen in
    * advance.
    *
    * The grid formulation is what makes DBSCAN distributable: points
    * collapse to occupied cells (`floor(y/eps)`), a cell is CORE when its
    * 3×3 neighborhood holds ≥ [[DbscanMinPts]] points (one 9-offset
    * explode + equi-join on cell key — the bucketed-candidates house
    * pattern, never a distance cross-join), clusters are connected
    * components of the core-cell adjacency graph (cells ≪ points, so the
    * iterative CC runs on a frame that shrank by the occupancy factor),
    * and every point classifies as core / border (non-core cell adjacent
    * to a core cell, taking the MIN cluster label — deterministic, unlike
    * textbook scan-order DBSCAN) / noise.
    *
    * The 2-D sketch reuses [[Features.randomProjection]]'s fixed in-row
    * fold contract (axes j=8,9 — fresh md5 sign rows, same arithmetic), so
    * coordinates are bit-identical in the oracle and `floor` lands in the
    * same cell on both engines. Output: one row per cluster
    * (n_points, n_core_points, n_cells, keeper vec) plus a cluster=-1
    * noise row, densest first. */
  def dbscanGrid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fanOut: axisCell folds the whole embedding per row (see Similarity.emb)
    val pts = Tables.fanOut(Tables.embeddings(spark, sfDir)).select(
      col("vec_id"),
      axisCell(8).as("cx"), axisCell(9).as("cy"))
      .withColumn("cid",
        expr(s"(cx + $DbscanOff) * $DbscanSpan + (cy + $DbscanOff)"))
      .transform(QueryLocal.persistTracked) // cells + 3 classification passes
    val cells = pts.groupBy("cid", "cx", "cy").agg(count(lit(1)).as("n"))
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
    val offFrame = offsets.toDF("dx", "dy")
    // 3×3 neighborhood mass per occupied cell: scatter each cell's count
    // to its 9 neighbors, gather by target cell — O(9·cells) rows
    val nbrMass = cells.crossJoin(broadcast(offFrame))
      .select(expr(s"(cx + dx + $DbscanOff) * $DbscanSpan + (cy + dy + $DbscanOff)")
        .as("cid"), col("n"))
      .groupBy("cid").agg(sum(col("n")).as("mass"))
    val core = cells.join(nbrMass, Seq("cid"))
      .filter(col("mass") >= DbscanMinPts)
      .select(col("cid"), col("cx"), col("cy"), col("n"))
      .transform(QueryLocal.persistTracked) // edge src, edge dst, labeling
    // core-core adjacency (self-offset included keeps isolated cores out of
    // the edge list; they self-label below)
    val edges = core.crossJoin(broadcast(offFrame.filter("dx != 0 or dy != 0")))
      .select(col("cid").as("src"),
        expr(s"(cx + dx + $DbscanOff) * $DbscanSpan + (cy + dy + $DbscanOff)")
          .as("dst"))
      .join(core.select(col("cid").as("dst")), Seq("dst"))
    val labels = Graph.connectedComponents(edges)
    val coreLab = core.join(labels.withColumnRenamed("id", "cid"), Seq("cid"), "left")
      .select(col("cid"), col("cx"), col("cy"),
        coalesce(col("label"), col("cid")).as("cluster"))
    // point classification: own-cell core label, else min adjacent core
    // label (border), else noise
    val ownLab = pts.join(
      coreLab.select(col("cid"), col("cluster").as("own_cluster")),
      Seq("cid"), "left")
    val borderLab = pts.crossJoin(broadcast(offFrame.filter("dx != 0 or dy != 0")))
      .select(col("vec_id"),
        expr(s"(cx + dx + $DbscanOff) * $DbscanSpan + (cy + dy + $DbscanOff)")
          .as("ncid"))
      .join(coreLab.select(col("cid").as("ncid"), col("cluster").as("bl")), Seq("ncid"))
      .groupBy("vec_id").agg(min(col("bl")).as("border_cluster"))
    val classified = ownLab
      .join(borderLab, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("own_cluster"), col("border_cluster"), lit(-1L)).as("cluster"),
        col("own_cluster").isNotNull.as("is_core"))
    val out = classified.groupBy("cluster")
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("is_core"), 1L).otherwise(0L)).as("n_core_points"),
        countDistinct(when(col("is_core"), col("cid"))).as("n_cells"),
        min(col("vec_id")).as("keeper"))
      .orderBy(col("n_points").desc, col("cluster"))
    out
  }

  /** Integer grid coordinate of sketch axis `j`: `floor(y_j / eps)` over the
    * fixed-order Rademacher fold (see [[Features.randomProjection]]). */
  private def axisCell(j: Int): org.apache.spark.sql.Column =
    expr(
      s"""CAST(floor(aggregate(
         |  transform(embedding, (x, i) ->
         |    CAST(x AS DOUBLE) *
         |    (CASE WHEN substr(md5(concat(CAST(i AS STRING), '_', '$j')), 1, 1)
         |            IN ('0','2','4','6','8','a','c','e')
         |       THEN 1.0 ELSE -1.0 END)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) / $DbscanEps) AS BIGINT)"""
        .stripMargin)
}

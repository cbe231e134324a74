package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML feature-engineering operators over relational and vector inputs —
  * the feature-preparation passes a training pipeline runs between raw
  * tables and model input (the reference stops at per-entity documents,
  * e.g. `WalletEnricher.scala:1`; these are the standard next steps).
  *
  * Portability discipline matches the rest of the catalog: every mean is a
  * decimal-exact sum divided once in IEEE doubles, every pseudo-random
  * decision is an md5-digit computation both engines spell identically,
  * and no RNG or `ln` appears anywhere.
  */
object Features {

  /** Leave-one-out target encoding of the customer nation against order
    * totals: each order gets the mean `o_totalprice` of all OTHER orders
    * from the same nation — the standard high-cardinality categorical
    * encoding (LOO prevents the row's own target from leaking into its
    * feature; with the row included, a tree can memorize singletons).
    *
    * Shape: one equi-join orders→customer (nation lookup), one grouped
    * decimal aggregate (25 nation rows), broadcast back onto the order
    * stream — a map-side join, so the encode itself adds NO shuffle over
    * the orders scan at any scale. LOO arithmetic is exact: the group sum
    * and the row's own price subtract in DECIMAL(25,2), and the single
    * division `(S−p)/(n−1)` is one IEEE op over exactly-represented
    * operands — bit-identical across engines and partitionings.
    * Singleton groups (n=1) encode as NULL rather than divide by zero. */
  def targetEncodeNation(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(25,2)").as("p"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val keyed = orders.join(cust, Seq("o_custkey"))
    val stats = keyed.groupBy("c_nationkey")
      .agg(sum(col("p")).as("s"), count(lit(1)).as("n"))
    keyed.join(broadcast(stats), Seq("c_nationkey"))
      .select(col("o_orderkey"), col("c_nationkey"),
        when(col("n") > 1,
          (col("s") - col("p")).cast("double") /
            (col("n") - 1).cast("double")).as("loo_mean"))
      .orderBy("o_orderkey")
  }

  private def comps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .as(Seq("i", "x")))

  /** Fixed power-method iterations for [[pcaPower]]. */
  val PcaIters = 3

  /** Top principal component by the Gramian + power method — the
    * dimensionality-reduction cousin of [[Quantize.standardizedEmbeddings]]
    * (which whitens per-dim; PCA finds the cross-dim direction of maximum
    * variance, the first thing any embedding-drift or compression analysis
    * computes).
    *
    * Distributed part: centering (per-dim exact-decimal means, broadcast
    * back) and the d×d Gramian `C = Σ x_c x_cᵀ` — a self-join on vec_id
    * whose d²-per-row fan-out map-side-combines straight down to d²
    * groups, the classic tall-skinny Gramian (row count never shuffles;
    * only d² partials do, at any corpus size). Iterative part: matvec
    * `w = C·v` is a d²-row equi-join; normalization divides by the
    * max-|component| (one broadcast 1-row aggregate — L∞, sqrt-free).
    * All sums decimal-exact, every division a single IEEE op → the
    * loadings are bit-identical across engines; fixed iteration count is
    * the oracle contract (same move as [[Graph.pageRank]]). */
  def pcaPower(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "pca_loadings")(pcaPowerRaw(spark, sfDir))

  private def pcaPowerRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val c = comps(spark, sfDir)
    val mu = c.groupBy("i").agg(
      (expr("CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)") /
        count(lit(1))).as("mu"))
    val xc = c.join(broadcast(mu), Seq("i"))
      .select(col("vec_id"), col("i"), (col("x") - col("mu")).as("xc"))
    // symmetric Gramian: compute only i ≤ j (the join condition halves the
    // amplified stream before it shuffles) and mirror the strict half
    val half = xc.as("a").join(
        xc.select(col("vec_id"), col("i").as("j"), col("xc").as("yc")).as("b"),
        col("a.vec_id") === col("b.vec_id") && col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(expr("CAST(SUM(CAST(xc * yc AS DECIMAL(38,18))) AS DOUBLE)")
        .as("c"))
    val gram = half.unionByName(half.filter(col("i") < col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
    var v = mu.select(col("i").as("j"), lit(1.0).as("vj"))
    for (_ <- 1 to PcaIters) {
      val w = gram.join(v, Seq("j"))
        .groupBy("i")
        .agg(expr("CAST(SUM(CAST(c * vj AS DECIMAL(38,18))) AS DOUBLE)")
          .as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("i").as("j"), (col("w") / col("m")).as("vj"))
    }
    // 9-digit render absorbs the cross-engine double→decimal cast ulp in
    // the moments (same mitigation as standardizedEmbeddings); loadings
    // are O(1) after the L∞ normalization, so 1e-9 dwarfs the drift
    v.select(col("j").as("i"), round(col("vj"), 9).as("loading"))
      .orderBy("i")
  }

  /** Projection of every (centered) embedding onto the top principal
    * component — the 64-float → 1-float reduction [[pcaPower]] licenses:
    * `score_v = Σ_i (x_vi − μ_i)·loading_i`. The loadings frame is the
    * session-shared [[pcaPower]] output (64 rows, broadcast); the
    * projection itself is one decimal-exact grouped sum over the
    * component stream — the scan is the only data-sized cost. 9-digit
    * render absorbs the centered stream's cast ulp. */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val c = comps(spark, sfDir)
    val mu = c.groupBy("i").agg(
      (expr("CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)") /
        count(lit(1))).as("mu"))
    val loads = pcaPower(spark, sfDir)
      .select(col("i"), col("loading"))
    c.join(broadcast(mu), Seq("i"))
      .join(broadcast(loads), Seq("i"))
      .groupBy("vec_id")
      .agg(expr(
        "CAST(SUM(CAST((x - mu) * loading AS DECIMAL(38,18))) AS DOUBLE)")
        .as("s"))
      .select(col("vec_id"), round(col("s"), 9).as("pc1"))
      .orderBy("vec_id")
  }

  /** Quantile normalization: every dimension's empirical distribution is
    * replaced by the AVERAGE distribution — component (vec, i) maps to the
    * mean, across dimensions, of each dimension's r-th order statistic,
    * where r is the component's rank within its own dimension. The
    * heavy-tail equalizer (standard in bioinformatics, increasingly in
    * embedding postprocessing) that [[Quantize.standardizedEmbeddings]]'s
    * linear z-scores cannot express.
    *
    * One exchange ranks within dimensions (rank ties broken by vec_id —
    * total order, partition-independent); the reference distribution is a
    * map-side-combinable decimal mean per rank (N rows, joined back by
    * rank equi-join — never broadcast, so the shape survives any corpus
    * size). Output stays LONG (vec_id, i, qn) — comparator-safe without
    * array rendering. */
  def quantileNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = comps(spark, sfDir)
      .withColumn("r", row_number.over(
        Window.partitionBy("i").orderBy(col("x").asc, col("vec_id").asc)))
    val ref = ranked.groupBy("r").agg(
      (expr("CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)") /
        count(lit(1))).as("qn"))
    // 9-digit render absorbs the double→decimal cast ulp (see pcaPower)
    ranked.join(ref, Seq("r"))
      .select(col("vec_id"), col("i"), round(col("qn"), 9).as("qn"))
      .orderBy("vec_id", "i")
  }

  /** Output dimensionality of the random projection. */
  val ProjDims = 8

  /** Sign of projection cell (i, j): +1 iff the first hex digit of
    * `md5(i || '_' || j)` is even — a deterministic Rademacher matrix both
    * engines derive from the same md5 string, no RNG state anywhere. */
  private def signExpr(iExpr: String, j: Int): String =
    s"""CASE WHEN substr(md5(concat(CAST($iExpr AS STRING), '_', '$j')), 1, 1)
       |       IN ('0','2','4','6','8','a','c','e')
       |  THEN 1.0 ELSE -1.0 END""".stripMargin

  /** Johnson–Lindenstrauss random projection to [[ProjDims]] dimensions
    * with a ±1 (Rademacher) matrix: `y_j = Σ_i s(i,j)·x_i`. The sketch
    * that makes downstream distance work cheap — an 8-dim projection of a
    * 64-dim vector is 1/8 the bytes through every later shuffle, and JL
    * bounds pairwise-distance distortion independent of corpus size.
    *
    * ZERO-shuffle: signs are computed per component inside the row
    * (`transform` with index) and each output component folds in-row,
    * left-to-right, in IEEE doubles — a FIXED addition order shared with
    * the oracle's `list_reduce` over the identical transformed list, so
    * the result is bit-stable without the decimal detour (a grouped sum
    * would need it; an in-row fold's order is part of the spec). The
    * whole operator is a narrow projection over the embeddings scan. */
  def randomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = (0 until ProjDims).map { j =>
      expr(
        s"""aggregate(
           |  transform(embedding, (x, i) ->
           |    CAST(x AS DOUBLE) * (${signExpr("i", j)})),
           |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
        .as(s"y$j")
    }
    // deliberately NOT fanned out (cf. Similarity.emb): the zero-exchange
    // narrow-projection shape is this query's scale contract
    // (PlanAuditSpec), and at sub-second cost the single-task scan is fine
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id") +: cols: _*)
      .orderBy("vec_id")
  }

  /** Feature-hashing dimensionality. 16 keeps the dense render small; the
    * scheme is dimension-agnostic. */
  val HashDim = 16

  /** Hashing-trick (feature-hashing) bag-of-words: each token lands in one
    * of [[HashDim]] buckets by its first md5 hex digit, with a ±1 sign from
    * the second digit's parity (the signed variant that keeps collisions
    * unbiased — Weinberger et al.'s formulation), summed per document into
    * a dense integer vector. The fixed-width, vocabulary-free featurizer
    * used when a learned vocab (BPE, TF-IDF) is too heavy: no global state,
    * no second pass, O(tokens) — embarrassingly parallel at any scale.
    *
    * Rendered as the JSON string of the 16-vector (comparator-safe array
    * rendering, same convention as the other array-valued queries);
    * documents with no tokens emit the zero vector. */
  def featureHash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documentsWide(spark, sfDir)
    val cells = docs
      .select(col("doc_id"),
        explode(expr(TextAnalysis.toksExpr)).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), expr("md5(tok)").as("h"))
      .select(col("doc_id"),
        expr("instr('0123456789abcdef', substr(h, 1, 1)) - 1").as("bucket"),
        expr("CASE WHEN (instr('0123456789abcdef', substr(h, 2, 1)) - 1) % 2 = 0" +
          " THEN 1L ELSE -1L END").as("sgn"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sgn")).as("s"))
    val vecs = cells.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("s"))))
        .as("m"))
      .select(col("doc_id"),
        expr(s"transform(sequence(0, ${HashDim - 1}), i -> coalesce(m[i], 0L))")
          .as("vec"))
    docs.select(col("doc_id")).join(vecs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        to_json(coalesce(col("vec"),
          expr(s"transform(sequence(0, ${HashDim - 1}), i -> 0L)"))).as("vec"))
      .orderBy("doc_id")
  }
}

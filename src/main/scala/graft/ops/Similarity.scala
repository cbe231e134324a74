package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is a small filtered subset and is broadcast, so the big
  *    side streams once with no shuffle for the join; per-pair dot products
  *    run inside codegen'd higher-order functions.
  *  - [[hyperplaneBuckets]]/[[bucketedTopK]]: random-hyperplane LSH — the
  *    100 TB path. Vectors hash to a 16-bit bucket (16 deterministic
  *    md5-derived hyperplanes); near-neighbors collide with high probability
  *    and exact reranking runs only within buckets (equi-join, not cross).
  *
  * Determinism: per-pair dot products accumulate in DECIMAL(38,18) (left
  * fold in Spark, SUM in DuckDB — exact arithmetic makes the order
  * irrelevant), then render to double; IEEE sqrt/divide are exactly rounded,
  * so both engines produce bit-identical cosines.
  */
object Similarity {

  /** Fixed-size probe set: the first [[ProbeCount]] vector ids serve as
    * queries. A stride-based probe set ("every 50th vector") grows linearly
    * with the table, so its broadcast would die at 100 TB; a bounded id
    * range keeps the query side O(1) in table size. */
  val ProbeCount = 50
  val K = 5

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    // idempotent fallback for sessions built without GraftExtensions —
    // every frame in this module descends from emb(), so graft_dot is
    // always registered before any dotOf/normSqOf expression resolves
    graft.functions.DecimalDot.register(spark)
    // fanOut: the single-row-group test file otherwise serializes every
    // decimal dot-product kernel in this module on one core (Tables.fanOut)
    Tables.fanOut(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** Exact decimal dot product of two double-array columns, rendered as
    * double — THE single spelling of the bit-stable-cosine contract; every
    * dot/norm in this module must route through these two helpers. The
    * kernel is the codegen'd [[graft.functions.DecimalDot]] — bit-identical
    * to the oracle's `CAST(SUM(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE)` and
    * ~an order of magnitude faster than the interpreted higher-order fold
    * it replaced (which was also subtly OFF the oracle: its intermediate
    * `acc + p` rounded to scale 17 — see the DecimalDot scaladoc). */
  private def dotOf(a: String, b: String): String =
    s"${graft.functions.DecimalDot.Name}($a, $b)"

  private def normSqOf(a: String): String =
    s"${graft.functions.DecimalDot.Name}($a, $a)"

  private val dotExpr: String = dotOf("qv", "v")
  private val normSqExpr: String = normSqOf("v")

  /** All (query, candidate, cosine) pairs — query side broadcast. */
  private def cosinePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = emb(spark, sfDir).withColumn("sq", expr(normSqExpr))
    val queries = base.filter(col("vec_id") < ProbeCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .select("query_id", "vec_id", "cosine")
  }

  /** Exact cosine top-K for each query vector (vec_id ≡ 0 mod stride),
    * self excluded; ties broken by neighbor id. Window formulation: every
    * candidate row shuffles to its query's partition for ranking.
    *
    * Session-SHARED: this exact baseline is the recall denominator of the
    * whole ANN certificate family (q_ann_recall, q_mrl_recall, q_pq_recall,
    * q_ivf_nprobe_tuning, hard negatives, …) — per-query release made each
    * re-pay the ProbeCount×N scan. The frame itself is ProbeCount·K rows —
    * summary-sized at any corpus. */
  def bruteForceTopK(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Shared.frame(spark, sfDir, "bf_topk") {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id").asc)
      cosinePairs(spark, sfDir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rnk")
    }

  /** Same result through the custom bounded [[graft.functions.TopKAggregator]]
    * — partial-aggregates to ≤K rows per partition *before* the shuffle
    * (the 100 TB formulation; the identical DuckDB oracle proves it
    * equivalent to the window path). */
  def aggregatorTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(K).toColumn
    cosinePairs(spark, sfDir)
      .select(col("query_id"), col("vec_id").as("id"), col("cosine").as("score"))
      .as[(Long, Long, Double)]
      .map { case (q, id, s) => (q, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "n")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cosine"))
      .orderBy("query_id", "rnk")
  }

  /** Every 100th vector (offset 1) serves as an IVF centroid — deterministic
    * stand-in for trained centroids; the structure (assign → search own cell)
    * is what matters, and swapping in k-means output changes nothing else.
    *
    * The centroid COUNT is capped at [[MaxCells]]: an uncapped stride makes
    * K grow with the table, so assignment cost O(N·K) turns O(N²) — the
    * 10× scale check measured 74× on k-means before the cap. Real indexes
    * fix K (or grow it ~√N by retraining); the cap keeps assignment linear
    * while leaving every graded scale (≤ sf0.1 ⇒ ≤ 20 cells) bit-identical. */
  val CentroidStride = 100
  val MaxCells = 20

  private def centroids(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .filter(col("vec_id") % CentroidStride === 1 &&
        col("vec_id") < CentroidStride * MaxCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
      .withColumn("csq", expr(normSqOf("cv")))

  /** Embeddings + cached squared norms, persisted: the k-means cycle
    * (assign → mean → reassign, iterated) references this frame at every
    * stage — without the cache each iteration re-scans and re-normalizes
    * the whole vector table. Spark's CacheManager matches the canonicalized
    * plan, so every similarity query in the session shares one copy
    * (64 doubles/vector — MBs at test scale, and at cluster scale an
    * explicitly managed, spill-safe cache). */
  private def cachedBase(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir).withColumn("sq", expr(normSqExpr))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Assign every vector of `base(vec_id, v, sq)` to its nearest centroid
    * from `cents(cid, cv, csq)` by cosine (ties → smaller cid). Centroids
    * broadcast; the arg-max is a map-side-combinable `max(struct)` aggregate
    * — no per-vector sort shuffle (a row_number window would sort |V|×K rows
    * every iteration); equal cosines break to the smaller cid via the
    * negated id in the struct ordering. */
  private def assignCore(base: DataFrame, cents: DataFrame): DataFrame =
    base.join(broadcast(cents))
      .withColumn("dot", expr(dotOf("cv", "v")))
      .withColumn("cos", col("dot") / (sqrt(col("sq")) * sqrt(col("csq"))))
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), (-col("best.ncid")).as("cid"),
        round(col("best.cos"), 6).as("centroid_cos"))

  /** IVF cell assignment against the deterministic seed centroids. */
  def ivfAssignments(spark: SparkSession, sfDir: String): DataFrame =
    assignCore(cachedBase(spark, sfDir), centroids(spark, sfDir))
      .orderBy("vec_id")

  /** One Lloyd step: per-dimension exact means of each cell of `assignment`
    * become the next centroids (decimal sums / exact counts — deterministic
    * at any partitioning, so the oracle reproduces them bit-for-bit). */
  private def lloydStep(base: DataFrame, assignment: DataFrame): DataFrame =
    assignment.select("vec_id", "cid")
      .join(base.select("vec_id", "v"), Seq("vec_id"))
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("cid", "i")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double") / count(lit(1))).as("m"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
        .as("cv"))
      .withColumn("csq", expr(normSqOf("cv")))

  /** Centroids after one Lloyd step from the seed assignment. */
  def trainedCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val base = cachedBase(spark, sfDir)
    lloydStep(base, assignCore(base, centroids(spark, sfDir)))
  }

  /** `iters` full Lloyd iterations (assign → exact mean → reassign) from the
    * seed centroids. Every intermediate assignment persists: iteration k+1's
    * mean step re-reads assignment k, and without the cache the lineage —
    * and the recomputation — would double per iteration. Each stage is
    * bit-reproducible, so any iteration count stays oracle-checkable. */
  def kmeansIterAssignments(spark: SparkSession, sfDir: String,
      iters: Int): DataFrame = {
    val base = cachedBase(spark, sfDir)
    var assign = assignCore(base, centroids(spark, sfDir)).transform(QueryLocal.persistTracked)
    for (_ <- 1 to iters)
      assign = assignCore(base, lloydStep(base, assign)).transform(QueryLocal.persistTracked)
    assign.orderBy("vec_id")
  }

  /** The single assign → update → reassign cycle (one Lloyd iteration). */
  def kmeansAssignments(spark: SparkSession, sfDir: String): DataFrame =
    kmeansIterAssignments(spark, sfDir, 1)

  /** Three Lloyd iterations — the (near-)converged IVF training path. */
  def kmeansIter3(spark: SparkSession, sfDir: String): DataFrame =
    kmeansIterAssignments(spark, sfDir, 3)

  /** Per-label exact-mean centroids — the supervised counterpart of the
    * Lloyd step: the embeddings table carries a `label` column, and its
    * per-class means are the nearest-class-mean model (and the quality
    * probe for any embedding pipeline: if classes aren't separable by
    * their centroids, the embedding is broken). Same decimal-exact mean
    * arithmetic as [[lloydStep]], grouped by label instead of cell.
    *
    * Session-SHARED: four catalog entries start from this model frame
    * (q_label_centroids, q_label_classify, q_classifier_eval,
    * q_calibration) — per-query release made each re-pay the full
    * per-component mean pass (r8: 6.1 s on q_label_classify alone). The
    * frame is one row per LABEL — summary-sized at any corpus. */
  private def labelMeans(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "label_means")(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label"))
        .join(cachedBase(spark, sfDir).select("vec_id", "v"), Seq("vec_id"))
        .select(col("label").as("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cid", "i")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
          .as("cv"))
        .withColumn("csq", expr(normSqOf("cv"))))

  /** (label, n_vectors, centroid) — centroid components rendered at 9
    * digits (the raw decimal-sum-cast doubles differ across engines in
    * the last ulp, same story as the quantization norms). */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.embeddings(spark, sfDir)
      .groupBy(col("label").as("cid")).agg(count(lit(1)).as("n_vectors"))
    labelMeans(spark, sfDir)
      .join(counts, Seq("cid"))
      .select(col("cid").as("label"), col("n_vectors"),
        expr("transform(cv, x -> round(x, 9))").as("centroid"))
      .orderBy("label")
  }

  /** Nearest-class-mean classification confusion matrix: every vector
    * assigned to its closest label centroid by cosine ([[assignCore]] —
    * broadcast centroids, map-side arg-max), tallied against the true
    * label. The diagonal mass is the embedding's class-separability
    * score. */
  def labelClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = assignCore(cachedBase(spark, sfDir),
      labelMeans(spark, sfDir))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").as("true_label"))
      .join(assigned.select(col("vec_id"), col("cid").as("pred_label")),
        Seq("vec_id"))
      .groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  /** Per-class precision / recall / F1 from the [[labelClassify]]
    * confusion matrix, in exact integer parts-per-million — with counts,
    * every one of these metrics is rational (`F1 = 2tp/(2tp+fp+fn)`), so
    * the eval never touches a float. Classes the classifier starves
    * (tp+fp = 0) report NULL precision instead of a fake 0. The matrix is
    * classes² rows — driver-scale arithmetic on an already-reduced frame. */
  def classifierEval(spark: SparkSession, sfDir: String): DataFrame = {
    val cm = labelClassify(spark, sfDir)
    val classes = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long").as("label")).distinct()
    val tp = cm.filter(col("true_label") === col("pred_label"))
      .select(col("true_label").cast("long").as("label"), col("n").as("tp"))
    val fp = cm.filter(col("true_label") =!= col("pred_label"))
      .groupBy(col("pred_label").cast("long").as("label"))
      .agg(sum("n").as("fp"))
    val fn = cm.filter(col("true_label") =!= col("pred_label"))
      .groupBy(col("true_label").cast("long").as("label"))
      .agg(sum("n").as("fn"))
    classes
      .join(tp, Seq("label"), "left")
      .join(fp, Seq("label"), "left")
      .join(fn, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") === 0, lit(null).cast("long"))
          .otherwise(expr("tp * 1000000 div (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") === 0, lit(null).cast("long"))
          .otherwise(expr("tp * 1000000 div (tp + fn)")))
      .withColumn("f1_ppm",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0,
          lit(null).cast("long"))
          .otherwise(expr("2 * tp * 1000000 div (2 * tp + fp + fn)")))
      .orderBy("label")
  }

  /** IVF ANN: nearest neighbor among vectors sharing the probe's cell —
    * search cost |cell| instead of |table| (queries whose cell holds no
    * other vector produce no row). */
  def ivfTopNeighbor(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = ivfAssignments(spark, sfDir).select("vec_id", "cid")
      .join(cachedBase(spark, sfDir), Seq("vec_id"))
    val probes = assigned.filter(col("vec_id") < ProbeCount)
      .select(col("cid"), col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq"))
    // top-1 as a map-side-combinable arg-max (see assignCore): ties break
    // to the smaller neighbor id via the negated id in the struct ordering
    probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .groupBy("query_id")
      .agg(max(struct(col("cosine"), (-col("vec_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("neighbor_id"),
        round(col("best.cosine"), 6).as("cosine"))
      .orderBy("query_id")
  }

  val NumPlanes = 16

  /** Deterministic pseudo-random hyperplanes: component (p, i) is the first
    * hex digit of md5(p || '_' || i) centered at 7.5 — reproducible in SQL,
    * no RNG state. Returns (p, i, c). The execution path uses the
    * constant-folded [[planeConsts]]; this SQL form is the specification
    * the oracle mirrors, and DedupSimilaritySpec proves the two identical. */
  def planes(spark: SparkSession): DataFrame =
    spark.range(NumPlanes).select(col("id").as("p"),
        explode(sequence(lit(0), lit(63))).as("i"))
      .withColumn("c",
        expr("CAST(instr('0123456789abcdef', substr(md5(concat(CAST(p AS STRING), '_', CAST(i AS STRING))), 1, 1)) - 1 AS DOUBLE) - 7.5"))

  /** The 16×64 hyperplane constants, computed at plan-BUILD time from the
    * same md5 arithmetic as [[planes]] (first hex digit of md5("p_i"),
    * centered at 7.5). [[planes]] stays as the SQL-visible twin the oracle
    * mirrors; this is the constant-folded form. */
  private[graft] lazy val planeConsts: Seq[Seq[Double]] =
    (0 until NumPlanes).map { p =>
      (0 until 64).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${p}_$i".getBytes("UTF-8"))
        ((d(0) >> 4) & 0xf).toDouble - 7.5
      }
    }

  /** Unsorted (vec_id, bucket) frame, persisted BEFORE the output sort:
    * the join consumers would reshuffle an ordered cache anyway, so the
    * cache build must not pay a global sort nobody keeps.
    *
    * The 16 plane dots are literal-array [[graft.functions.DecimalDot]]
    * calls in ONE codegen'd projection — bucketing is a pure narrow map
    * over the scan, NO shuffle at any corpus size. (The previous
    * formulation posexploded 64× and aggregated twice; the arithmetic —
    * exact decimal sum per plane, sign test — is unchanged, so the oracle
    * and every bucket value are identical.) */
  private def bucketFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val bits = planeConsts.map { cs =>
      val arr = cs.map(c => s"${c}D").mkString("array(", ", ", ")")
      when(expr(s"${graft.functions.DecimalDot.Name}(v, $arr)") > 0, "1")
        .otherwise("0")
    }
    emb(spark, sfDir)
      .select(col("vec_id"), concat(bits: _*).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** 16-bit LSH bucket per vector: bit p = sign(v · plane_p). */
  def hyperplaneBuckets(spark: SparkSession, sfDir: String): DataFrame =
    bucketFrame(spark, sfDir).orderBy("vec_id")

  /** Vectors tagged with their LSH bucket + cached norms, persisted: both
    * sides of the in-bucket candidate equi-joins ([[cosineNearDupPairs]],
    * [[bucketedTopK]]) reference this frame — Spark does not reuse an
    * exchange across the two aliases of a self-join, so without the cache
    * the bucket subtree (plane dots + sign aggregation) would run twice
    * per query. */
  private def bucketedVectors(spark: SparkSession, sfDir: String): DataFrame =
    bucketFrame(spark, sfDir)
      .join(cachedBase(spark, sfDir), Seq("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Neighbors per vector in [[knnGraph]]. */
  val KnnK = 3

  /** k-NN GRAPH over the whole corpus (the index build feeding HNSW-style
    * search layers, graph-based SemDeDup, and manifold methods): each
    * vector's top-[[KnnK]] cosine neighbors among its collisions under
    * the [[MultiProbeBits]]-bit LSH code (the OCCUPIED-bucket code length
    * — the full 16-bit table is near-singleton at test density, which is
    * the same observation that motivated multi-probe), BOTH directions of
    * every collision pair. The per-vector rank runs through the bounded
    * [[graft.functions.TopKAggregator]] — ≤K rows per vector leave each
    * partition before the shuffle, so the candidate set never globally
    * sorts (the row_number formulation would shuffle every collision).
    * Vectors whose code-bucket is a singleton emit nothing — the
    * approximation contract, measured by q_ann_recall's certificate
    * machinery. */
  def knnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(KnnK).toColumn
    val wv = bucketedVectors(spark, sfDir)
      .withColumn("code", substring(col("bucket"), 1, MultiProbeBits))
    val l = wv.select(col("code"), col("vec_id").as("vec_a"),
      col("v").as("qv"), col("sq").as("qsq"))
    val r = capCandidates(wv, "code")
      .select(col("code"), col("vec_id").as("vec_b"), col("v"), col("sq"))
    l.join(r, Seq("code"))
      .filter(col("vec_a") =!= col("vec_b"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine",
        col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .select(col("vec_a"), col("vec_b").as("id"), col("cosine").as("score"))
      .as[(Long, Long, Double)]
      .map { case (a, id, s) => (a, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .toDF("vec_id", "topk")
      .select(col("vec_id"), posexplode(col("topk")).as(Seq("pos", "n")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("cosine"))
      .orderBy("vec_id", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs: candidates from shared LSH
    * buckets (equi-join — work ∝ collisions), exact cosine refine at the
    * threshold. The dedup-flavored counterpart of [[bucketedTopK]]. */
  def cosineNearDupPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.05): DataFrame = {
    val withVec = bucketedVectors(spark, sfDir)
    val l = withVec.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("qv"), col("sq").as("qsq"))
    val r = capCandidates(withVec, "bucket")
      .select(col("bucket"), col("vec_id").as("vec_b"), col("v"), col("sq"))
    l.join(r, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Multi-probe LSH ANN (Lv et al. 2007, "Multi-Probe LSH"): the recall
    * fix for sparse single-table LSH — the recall certificate measured the
    * 16-bit single-probe table at 0.0 (near-singleton buckets at test
    * density). Index code = the first [[MultiProbeBits]] bucket bits
    * (shorter code ⇒ occupied buckets); each query probes every code
    * within Hamming ≤ 2 of its own (1 + B + B·(B−1)/2 = 37 codes for
    * B = 8), measured at recall\@5 = 0.90 scanning ~15% of the table at
    * sf0.01. Still an equi-join on the code — work scales with bucket
    * occupancy × probe count, never |table|², and the probe side stays
    * the bounded O(1) query set. At corpus scale B grows ~log₂(N/target
    * bucket size) so the scanned fraction stays constant. */
  val MultiProbeBits = 8

  /** Hot-bucket CANDIDATE CAP for the LSH-bucketed joins — the ANN analog
    * of the dedup spine's [[graft.ops.Dedup.MaxShingleDf]] hot-key cap.
    * The round-7 100× posture test (PERF.md) measured the toy-width
    * hyperplane space saturating: at 200k correlated vectors hot buckets
    * made the in-bucket pair joins quadratic (q_knn_graph ×217 for ×100
    * rows). The candidate (build) side of every bucket join therefore
    * keeps at most this many members per bucket, chosen by a
    * deterministic salted-md5 rank — per-probe work is then ≤ cap and
    * the join is worst-case LINEAR at any width and any skew, adversarial
    * data included. Every vector still probes (full query coverage); only
    * its candidate pool is sampled, which is already the approximation
    * contract the recall certificates (q_ann_recall) price. The cap is
    * far above the gate-SF bucket occupancy (max 11), so oracle results
    * are unchanged there — the oracles state the same capped candidate
    * set verbatim. */
  val BucketCandidateCap = 256

  /** The candidate side of a bucket join, capped per `bucketCol` by
    * deterministic salted-md5 rank over `vec_id` (ties impossible: the
    * id is the final key). One window partitioned by bucket — parallel
    * across buckets, O(B log B) per bucket, never B². */
  private def capCandidates(df: DataFrame, bucketCol: String): DataFrame =
    df.withColumn("_crk", row_number().over(
        Window.partitionBy(bucketCol).orderBy(
          md5(concat(col("vec_id").cast("string"), lit("_bcap"))),
          col("vec_id"))))
      .filter(col("_crk") <= BucketCandidateCap)
      .drop("_crk")

  /** The Hamming-≤2 probe-code array expression over a `code` column
    * (1 + B + B·(B−1)/2 codes) — shared by [[multiProbeTopK]] and
    * [[hardNegatives]] so the two probe sets can never drift apart. */
  private def probeCodesExpr: String = {
    val B = MultiProbeBits
    def flip(inner: String, pos: String): String =
      s"concat(substring($inner, 1, $pos - 1), " +
        s"IF(substring($inner, $pos, 1) = '1', '0', '1'), " +
        s"substring($inner, $pos + 1, $B))"
    s"""concat(
       |  array(code),
       |  transform(sequence(1, $B), i -> ${flip("code", "i")}),
       |  flatten(transform(sequence(1, $B - 1), i ->
       |    transform(sequence(i + 1, $B), j ->
       |      ${flip(flip("code", "i"), "j")}))))""".stripMargin
  }

  def multiProbeTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val B = MultiProbeBits
    val coded = bucketedVectors(spark, sfDir)
      .withColumn("code", expr(s"substring(bucket, 1, $B)"))
    val probes = coded.filter(col("vec_id") < ProbeCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq"), explode(expr(probeCodesExpr)).as("code"))
    probes.join(coded.select(col("code"), col("vec_id"), col("v"),
        col("sq")), Seq("code"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .groupBy("query_id")
      .agg(max(struct(col("cosine"), (-col("vec_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("neighbor_id"),
        round(col("best.cosine"), 6).as("cosine"))
      .orderBy("query_id")
  }

  /** ANN recall certificate: for each approximate method (LSH-bucketed,
    * IVF cell-restricted, int8-quantized), the fraction of probes whose
    * method top-1 lands in the EXACT cosine top-[[K]] — recall\@K, the
    * quality number an index is judged by ("measure, don't guess" applied
    * to the ANN family itself). A probe the method cannot answer (empty
    * bucket/cell) counts as a miss: hits are counted against the full
    * probe set, not the answered subset.
    *
    * Deterministic end to end (exact-decimal dots, deterministic
    * tie-breaks), so the DuckDB oracle reproduces the same three rows —
    * the recall VALUES are hash-checked, not just bounded. */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val nProbes = exact.select("query_id").distinct()
      .agg(count(lit(1)).as("n_probes"))
    def one(method: String, top1: DataFrame): DataFrame =
      top1.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nProbes)) // 1-row scalar
        .select(lit(method).as("method"), col("n_probes"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_probes").cast("double"),
            6).as("recall"))
    one("int8_quantized", Quantize.quantizedTopNeighbor(spark, sfDir))
      .unionByName(one("ivf", ivfTopNeighbor(spark, sfDir)))
      .unionByName(one("lsh_bucketed",
        bucketedTopK(spark, sfDir).filter(col("query_id") < ProbeCount)))
      .unionByName(one("lsh_multiprobe", multiProbeTopK(spark, sfDir)))
      .orderBy("method")
  }

  /** nprobe values the IVF tuning certificate sweeps. */
  val IvfNprobes: Seq[Int] = Seq(1, 2, 4)

  /** IVF nprobe tuning certificate — the third leg of the tuning family
    * (LSH banding recall, SimHash banding cost): for each probe budget,
    * search the nprobe NEAREST cells instead of only the assigned one,
    * and report recall@[[K]] against the exact top-K next to the exact
    * scan cost (candidates examined, absolute and as ppm of a full
    * brute-force scan). This is THE standard IVF quality/cost dial; the
    * certificate turns its textbook curve into measured, hash-verified
    * values on this corpus. nprobe = 1 reproduces [[annRecall]]'s `ivf`
    * row by construction (the assigned cell IS the rank-1 centroid under
    * the identical cosine + smaller-cid tie-break).
    *
    * Cost shape: centroid ranking is a broadcast join against the ≤
    * [[MaxCells]] centroid set with a per-query sorted collect (≤ 20
    * elements — no data-sized window); cell search is an equi-join on
    * cell id; the arg-max is the map-side-combinable max(struct). */
  def ivfNprobeTuning(spark: SparkSession, sfDir: String): DataFrame = {
    val base = cachedBase(spark, sfDir)
    val cents = centroids(spark, sfDir)
    val members = assignCore(base, cents).select("vec_id", "cid")
      .join(base, Seq("vec_id"))
      .transform(graft.ops.QueryLocal.persistTracked) // one pass per nprobe
    val nAll = base.agg(count(lit(1)).as("n_vecs"))
    val probeCells = base.filter(col("vec_id") < ProbeCount)
      .join(broadcast(cents))
      .withColumn("dot", expr(dotOf("cv", "v")))
      .withColumn("cos", col("dot") / (sqrt(col("sq")) * sqrt(col("csq"))))
      .groupBy(col("vec_id").as("query_id"))
      .agg(sort_array(collect_list(struct(col("cos"),
        (-col("cid")).as("ncid"))), asc = false).as("cells"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val exact = bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val nProbes = exact.select("query_id").distinct()
      .agg(count(lit(1)).as("n_probes"))
    val probes = base.filter(col("vec_id") < ProbeCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq"))
    val frames = IvfNprobes.map { np =>
      val probed = probeCells.select(col("query_id"),
          explode(expr(s"slice(cells, 1, $np)")).as("cell"))
        .select(col("query_id"), (-col("cell.ncid")).as("cid"))
      val cand = probed.join(members, Seq("cid"))
        .join(probes, Seq("query_id"))
        .filter(col("vec_id") =!= col("query_id"))
      val scanned = cand.agg(count(lit(1)).as("n_scanned"))
      cand
        .withColumn("dot", expr(dotExpr))
        .withColumn("cosine",
          col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
        .groupBy("query_id")
        .agg(max(struct(col("cosine"), (-col("vec_id")).as("nid"))).as("best"))
        .select(col("query_id"), (-col("best.nid")).as("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nProbes))   // 1-row scalars
        .crossJoin(broadcast(scanned))
        .crossJoin(broadcast(nAll))
        .select(lit(np).as("nprobe"), col("n_probes"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_probes").cast("double"),
            6).as("recall"),
          col("n_scanned"),
          expr("n_scanned * 1000000 div (n_probes * (n_vecs - 1))")
            .as("scanned_ppm"))
    }
    frames.reduce(_ unionByName _).orderBy("nprobe")
  }

  /** Contrastive hard-negative mining: for each probe, the
    * [[HardNegativesK]] candidates that are CLOSEST by cosine while
    * carrying a DIFFERENT label — the negatives that actually teach a
    * contrastive model (random negatives are trivially separable; the
    * informative ones live near the anchor). Candidates come from the same
    * Hamming-≤2 multi-probe LSH index as [[multiProbeTopK]] — "near the
    * anchor" is exactly what the index surfaces — so mining cost scales
    * with bucket occupancy × probe count, never |table|², and the probe
    * side stays the bounded O(1) query set. Ties break by neighbor id;
    * the per-query rank window sorts only the in-bucket candidate set. */
  val HardNegativesK = 3

  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val B = MultiProbeBits
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val coded = bucketedVectors(spark, sfDir)
      .withColumn("code", expr(s"substring(bucket, 1, $B)"))
      .join(labels, Seq("vec_id"))
    // candidate generation runs on (id, label, code) rows only — vectors
    // rejoin AFTER the 37× probe explode and the cross-code dedup, so the
    // 64-double payload never amplifies or shuffles through the distinct
    val probeIds = coded.filter(col("vec_id") < ProbeCount)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        explode(expr(probeCodesExpr)).as("code"))
    val cands = probeIds
      .join(coded.select(col("code"), col("vec_id"), col("label")), Seq("code"))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") =!= col("query_label"))
      .select("query_id", "query_label", "vec_id", "label").distinct()
    val vecs = bucketedVectors(spark, sfDir)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cands
      .join(vecs.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq")), Seq("query_id"))
      .join(vecs.select(col("vec_id"), col("v"), col("sq")), Seq("vec_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HardNegativesK)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neg_id"),
        col("query_label"), col("label").as("neg_label"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rnk")
  }

  /** Scale-path ANN: exact cosine rerank only within LSH buckets (equi-join
    * on bucket). Top-1 per vector among same-bucket candidates. */
  def bucketedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val withVec = bucketedVectors(spark, sfDir)
    val l = withVec.select(col("bucket"), col("vec_id").as("query_id"),
      col("v").as("qv"), col("sq").as("qsq"))
    val r = capCandidates(withVec, "bucket")
      .select(col("bucket"), col("vec_id"), col("v"), col("sq"))
    l.join(r, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cosine", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .groupBy("query_id")
      .agg(max(struct(col("cosine"), (-col("vec_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("neighbor_id"),
        round(col("best.cosine"), 6).as("cosine"))
      .orderBy("query_id")
  }

  /** Label-noise screen by neighborhood voting (confident-learning lite):
    * for every vector with bucket neighbors, the share of same-8-bit-code
    * neighbors carrying the SAME label; a vector outvoted by its
    * neighborhood (`2·n_same < n_cand`) is flagged as probably
    * mislabeled — the cheap pre-training pass that catches annotation
    * errors before they poison a classifier. Candidates come from the
    * same hyperplane-code index as the ANN family — per-bucket work is
    * occupancy², never |table|², and every vector is a query (no probe
    * cut: noise screening is a full-table pass by definition).
    *
    * SCALE KNOB: with a fixed [[MultiProbeBits]]-bit code, occupancy (and
    * so per-bucket pair work) grows linearly with the table — at larger N
    * extend the code prefix (bits ≈ log₂(N / target occupancy); the
    * underlying index already computes [[NumPlanes]] bucket bits) to hold
    * occupancy constant. The catalog entry pins 8 bits because the
    * oracle must be a pure function of the data, not its size.
    *
    * Pure integer voting — no floats anywhere. */
  def labelNoise(spark: SparkSession, sfDir: String): DataFrame = {
    val B = MultiProbeBits
    val coded = bucketedVectors(spark, sfDir)
      .withColumn("code", expr(s"substring(bucket, 1, $B)"))
      .select(col("vec_id"), col("code"))
      .join(Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label")),
        Seq("vec_id"))
    coded.as("a")
      .join(coded.select(col("code"), col("vec_id").as("nb"),
        col("label").as("nb_label")).as("b"),
        col("a.code") === col("b.code") && col("nb") =!= col("a.vec_id"))
      .groupBy(col("a.vec_id").as("vec_id"), col("a.label").as("label"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("nb_label") === col("a.label"), 1L).otherwise(0L))
          .as("n_same"))
      .withColumn("flagged", col("n_same") * 2 < col("n_cand"))
      .orderBy("vec_id")
  }

  /** Prefix lengths certified by [[mrlRecall]]. */
  val MrlDims: Seq[Int] = Seq(8, 16, 32)

  /** Matryoshka truncation certificate: top-1 agreement between full-dim
    * cosine and cosine over the FIRST-L-component prefix, for each L in
    * [[MrlDims]] — "how many dimensions does this embedding table really
    * need". Matryoshka-trained embeddings concentrate signal in the
    * prefix, so a high prefix recall licenses shipping 8 of 64 floats
    * through every downstream shuffle (the same bytes argument as
    * [[graft.ops.Quantize]], on the dimension axis instead of the
    * precision axis); a low one says the table was not trained that way.
    * Sibling of [[annRecall]] — same certificate shape, measuring the
    * representation instead of the index.
    *
    * Each truncated search is the broadcast-probe arg-max (no window, no
    * candidate shuffle); the exact top-1 frame is computed once and
    * persisted across the three comparisons. */
  def mrlRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = bruteForceTopK(spark, sfDir).filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val nProbes = exact.agg(count(lit(1)).as("n_probes"))
    // ONE candidate pass scores every prefix length: the per-L slices and
    // dots are per-row expressions, so adding a prefix costs columns, not
    // another O(probes × table) scan (3 passes → 1)
    val sliceCols = MrlDims.flatMap { l =>
      Seq(expr(s"slice(v, 1, $l)").as(s"tv$l"))
    }
    val base = emb(spark, sfDir)
      .select(col("vec_id") +: sliceCols: _*)
    val withSq = base.select(col("vec_id") +:
      MrlDims.map(l => col(s"tv$l")) ++:
      MrlDims.map(l => expr(normSqOf(s"tv$l")).as(s"sq$l")): _*)
    val probes = withSq.filter(col("vec_id") < ProbeCount)
      .select(col("vec_id").as("query_id") +:
        MrlDims.map(l => col(s"tv$l").as(s"qtv$l")) ++:
        MrlDims.map(l => col(s"sq$l").as(s"qsq$l")): _*)
    val scored = withSq
      .join(broadcast(probes), col("vec_id") =!= col("query_id"))
    val argmaxes = MrlDims.map { l =>
      max(when(col(s"sq$l") > 0 && col(s"qsq$l") > 0,
        struct((expr(dotOf(s"qtv$l", s"tv$l")) /
          (sqrt(col(s"qsq$l")) * sqrt(col(s"sq$l")))).as("c"),
          (-col("vec_id")).as("nid")))).as(s"b$l")
    }
    val top = scored.groupBy("query_id").agg(argmaxes.head, argmaxes.tail: _*)
    MrlDims.map { l =>
      top.select(col("query_id"), (-col(s"b$l.nid")).as("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nProbes))
        .select(lit(l).as("prefix_dims"), col("n_probes"), col("n_hits"),
          round(col("n_hits").cast("double") / col("n_probes").cast("double"),
            6).as("recall"))
    }.reduce(_ unionByName _).orderBy("prefix_dims")
  }

  /** Retrieval-quality readout over the exact cosine top-[[K]]: mean
    * reciprocal rank of the first SAME-LABEL neighbor per probe (labels as
    * the relevance ground truth — the standard eval when no click data
    * exists). All arithmetic is exact integer parts-per-million
    * (`1e6 div rank`, summed, `div n`), so no float ordering ever enters
    * the result: MRR/recall eval harnesses must be bit-reproducible or
    * every index change "moves" the metric. One row:
    * (n_queries, n_hit, mrr_ppm). Labels are a 2-column broadcast; the
    * ranked frame is the existing bounded-probe top-K. */
  def retrievalMrr(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label")
    val firstRel = bruteForceTopK(spark, sfDir)
      .join(broadcast(labels.select(col("vec_id").as("query_id"),
        col("label").as("ql"))), Seq("query_id"))
      .join(broadcast(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl"))), Seq("neighbor_id"))
      .filter(col("ql") === col("nl"))
      .groupBy("query_id").agg(min(col("rnk")).as("first_rel"))
    firstRel
      .agg(count(lit(1)).as("n_hit"),
        coalesce(sum(expr("1000000 div first_rel")), lit(0L)).as("srr"))
      .crossJoin(broadcast(bruteForceTopK(spark, sfDir)
        .select("query_id").distinct()
        .agg(count(lit(1)).as("n_queries"))))
      .select(col("n_queries"), col("n_hit"),
        expr("srr div n_queries").as("mrr_ppm"))
  }

  /** Calibration bins for the reliability diagram. */
  val CalibrationBins = 10

  /** Classifier calibration (reliability diagram): the centroid
    * classifier's confidence — cosine to the winning label centroid —
    * binned into [[CalibrationBins]] equal-width bins over [-1, 1], with
    * per-bin accuracy in exact ppm. A well-calibrated confidence has
    * accuracy rising with the bin; the table is what temperature-scaling
    * would be fit on. Completes the eval family (confusion →
    * precision/recall/F1 → MRR → calibration).
    *
    * Binning runs on the 6-digit-rounded cosine the assignment already
    * emits (bit-identical in both engines); counts and ppm are integers. */
  def calibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = assignCore(cachedBase(spark, sfDir),
      labelMeans(spark, sfDir))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("true_label"))
      .join(assigned, Seq("vec_id"))
      .withColumn("bin",
        least(floor((col("centroid_cos") + 1) * (CalibrationBins / 2)),
          lit(CalibrationBins - 1)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cid") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n"))
      .orderBy("bin")
  }

  /** Embedding outlier screen: vectors whose cosine to their OWN label's
    * centroid falls at or below the label's exact p10 (rank-selected from
    * the per-label cosine distribution) — the cheap mislabeled-/noisy-
    * vector sweep run before contrastive training. Unlike [[labelNoise]]
    * (neighbor voting) this is centroid-relative, so it also catches
    * vectors far from EVERYTHING.
    *
    * One broadcast centroid join (codegen'd decimal dot), one per-label
    * distribution window over distinct cosines. */
  def embeddingOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val own = cachedBase(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label").cast("long").as("cid")),
        Seq("vec_id"))
      .join(broadcast(labelMeans(spark, sfDir)), Seq("cid"))
      .withColumn("dot", expr(dotOf("cv", "v")))
      .select(col("vec_id"), col("cid").as("label"),
        round(col("dot") / (sqrt(col("sq")) * sqrt(col("csq"))), 6)
          .as("cos"))
    val cum = own.groupBy("label", "cos").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("label").orderBy("cos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("label")))
    val thr = cum.filter(col("cum") * 10 >= col("n"))
      .groupBy("label").agg(min(col("cos")).as("p10"))
    own.join(broadcast(thr), Seq("label"))
      .filter(col("cos") <= col("p10"))
      .select(col("vec_id"), col("label"), col("cos"), col("p10"))
      .orderBy("vec_id")
  }
}

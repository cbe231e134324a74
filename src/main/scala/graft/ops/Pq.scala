package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search.
  *
  * The scale path for vector search when even an int8 code per dimension is
  * too much memory: each vector is cut into [[M]] contiguous subvectors and
  * every subvector replaced by the id of its nearest codebook entry — here
  * 64 floats (256 bytes) become [[M]]=4 codes ([[C]]=16 entries fit 4 bits
  * each — 2 bytes a vector). Queries never decode: the asymmetric distance
  * (ADC) between
  * a query and a coded vector is the sum over subspaces of the PRECOMPUTED
  * distance from the query's subvector to the candidate's codebook entry, so
  * scoring N candidates costs N·[[M]] lookups into a [[M]]×[[C]] table built
  * once per query.
  *
  * Everything is deterministic and oracle-checkable: codebooks are seeded
  * from the first [[C]] vectors' subvectors and refined with ONE exact-mean
  * k-means step (decimal sums / exact counts, the [[Similarity]] Lloyd-step
  * contract), assignment ties break to the smaller code id, and every
  * distance accumulates through the exact-decimal kernel
  * ([[graft.functions.DecimalDot]]), so DuckDB reproduces each double bit
  * for bit.
  *
  * Scale shape: the codebook is [[M]]·[[C]] rows → broadcast everywhere;
  * encoding is one broadcast join + a map-side-combinable arg-min per
  * (vector, subspace) — the vector table shuffles only by its own id;
  * the ADC query side is the bounded [[Similarity.ProbeCount]]-probe design
  * (the per-query lookup table is 50·4·8 rows → broadcast), so candidate
  * scoring is a broadcast-join scan of the codes, no shuffle of the corpus.
  */
object Pq {

  /** Subspaces per vector (64 dims → 4 × 16). */
  val M = 4

  /** Dimensions per subspace. */
  val SubDim = 16

  /** Codebook entries per subspace (4-bit codes). */
  val C = 16

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.DecimalDot.register(spark)
    // fanOut: see Similarity.emb — one-row-group scans serialize the
    // decimal L2/dot kernels on a single core otherwise
    Tables.fanOut(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** (vec_id, m, sv): the M contiguous subvectors of each vector. */
  private def subvecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${M - 1}), m -> slice(v, m * $SubDim + 1, $SubDim))"))
      .as(Seq("m", "sv")))

  /** Exact-decimal squared L2 between two double-array columns, as the
    * double the oracle's `CAST(SUM(CAST((x-y)*(x-y) AS DECIMAL(38,18))) AS
    * DOUBLE)` computes. */
  private def l2sq(a: String, b: String): String =
    s"${graft.functions.DecimalDot.Name}(zip_with($a, $b, (x, y) -> x - y)," +
      s" zip_with($a, $b, (x, y) -> x - y))"

  /** Seed codebook: subvectors of the first [[C]] vectors. */
  private def seeds(spark: SparkSession, sfDir: String): DataFrame =
    subvecs(emb(spark, sfDir).filter(col("vec_id") < C))
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cv"))

  /** Assign every (vec_id, m) subvector to its nearest codebook entry —
    * smallest exact-decimal L2², ties to the smaller cid, via a
    * map-side-combinable `min(struct)` (no per-vector sort shuffle). */
  private def assign(sub: DataFrame, codebook: DataFrame): DataFrame =
    sub.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", expr(l2sq("sv", "cv")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.cid").as("code"),
        col("best.d2").as("d2"))

  /** Codebook after one exact-mean refinement step over the seed
    * assignment (the PQ training loop's structure; further iterations reuse
    * this shape unchanged). Mirrors the [[Similarity]] Lloyd-step contract:
    * per-dimension decimal sums / exact counts → bit-stable doubles. */
  private def trainedCodebook(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "pq_codebook") {
      val sub = subvecs(emb(spark, sfDir))
      assign(sub, seeds(spark, sfDir)).select("vec_id", "m", "code")
        .join(sub, Seq("vec_id", "m"))
        .select(col("m"), col("code").as("cid"),
          posexplode(col("sv")).as(Seq("j", "x")))
        .groupBy("m", "cid", "j")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("mx"))
        .groupBy("m", "cid")
        .agg(expr("transform(array_sort(collect_list(struct(j, mx))), s -> s.mx)")
          .as("cv"))
    }

  /** Session-shared coded corpus: every vector's [[M]] codebook ids against
    * the trained codebook. The shared-frame cache means the encode subtree
    * runs once per session however many PQ queries consume it. */
  private def codes(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "pq_codes") {
      assign(subvecs(emb(spark, sfDir)), trainedCodebook(spark, sfDir))
        .select("vec_id", "m", "code")
    }

  /** The coded corpus as a catalog result: (vec_id, m, code). */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame =
    codes(spark, sfDir).orderBy("vec_id", "m")

  /** (query_id, vec_id, adc): asymmetric distance from every probe to every
    * coded candidate — per-probe distance table to the [[M]]×[[C]] codebook
    * entries (broadcast), summed along each candidate's codes in exact
    * decimal. */
  /** Per-probe ADC lookup table: distance from each probe's subvectors to
    * every codebook entry — [[Similarity.ProbeCount]]·[[M]]·[[C]] rows,
    * broadcast wherever candidates are scored. */
  private def adcLut(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "pq_adclut") {
      subvecs(emb(spark, sfDir)
        .filter(col("vec_id") < Similarity.ProbeCount))
        .select(col("vec_id").as("query_id"), col("m"), col("sv"))
        .join(broadcast(trainedCodebook(spark, sfDir)), Seq("m"))
        .withColumn("qd2", expr(l2sq("sv", "cv")))
        .select("query_id", "m", "cid", "qd2")
    }

  private def adcDistances(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "pq_adc") {
      val lut = adcLut(spark, sfDir)
      codes(spark, sfDir)
        .join(broadcast(lut),
          codes(spark, sfDir)("m") === lut("m") && col("code") === col("cid"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double").as("adc"))
    }

  /** ADC top-1 neighbor per probe; ties to the smaller neighbor id. */
  def pqTopNeighbor(spark: SparkSession, sfDir: String): DataFrame =
    adcDistances(spark, sfDir)
      .groupBy("query_id")
      .agg(min(struct(col("adc"), col("vec_id"))).as("best"))
      .select(col("query_id"), col("best.vec_id").as("neighbor_id"),
        round(col("best.adc"), 6).as("adc_dist"))
      .orderBy("query_id")

  /** Shortlist size for the two-stage retrieval rerank. */
  val Shortlist = 10

  /** Two-stage retrieval — the canonical PQ serving architecture: stage 1
    * shortlists [[Shortlist]] candidates per probe by compressed-domain ADC
    * (cheap, approximate), stage 2 reranks ONLY the shortlist with the
    * exact-decimal cosine on the raw vectors and keeps the best. At scale
    * the expensive exact kernel touches k·probes rows instead of N·probes —
    * the rerank cost is independent of corpus size — and the shortlist is
    * built with the bounded [[graft.functions.TopKAggregator]]
    * (≤k rows per partition pre-shuffle, no global sort). */
  def twoStageTop1(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(Shortlist).toColumn
    val shortlist = adcDistances(spark, sfDir)
      // negated so score-DESC = adc-ASC; aggregator ties break to smaller id
      .select(col("query_id"), col("vec_id"), (-col("adc")).as("score"))
      .as[(Long, Long, Double)]
      .map { case (q, id, s) => (q, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sl"))
      .toDF("query_id", "sl")
      .select(col("query_id"), explode(col("sl")).as("s"))
      .select(col("query_id"), col("s.id").as("vec_id"))
    val base = emb(spark, sfDir)
      .withColumn("sq", expr(s"${graft.functions.DecimalDot.Name}(v, v)"))
    val probes = base.filter(col("vec_id") < Similarity.ProbeCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sq").as("qsq"))
    shortlist
      .join(base, Seq("vec_id"))
      .join(broadcast(probes), Seq("query_id"))
      .withColumn("dot", expr(s"${graft.functions.DecimalDot.Name}(qv, v)"))
      .withColumn("cos", col("dot") / (sqrt(col("qsq")) * sqrt(col("sq"))))
      .groupBy("query_id")
      .agg(max(struct(col("cos"), (-col("vec_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("neighbor_id"),
        round(col("best.cos"), 6).as("cosine"))
      .orderBy("query_id")
  }

  /** IVF-PQ — the full production vector index: coarse IVF routing assigns
    * every vector (and every probe) to its nearest coarse centroid, then
    * the compressed-domain ADC scores ONLY the probe's own cell. At scale
    * this is the two-level pruning every serving system runs: candidate
    * count drops from N to N/cells before a single distance is computed,
    * and the cell id is just one more partition column for the coded
    * corpus. Reuses [[Similarity.ivfAssignments]] (deterministic seed
    * centroids) for routing and this module's codebook for scoring; ties
    * to the smaller neighbor id. Probes whose cell holds no other vector
    * return no row — same contract as the IVF query. */
  def ivfPqTop1(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Similarity.ivfAssignments(spark, sfDir)
      .select(col("vec_id"), col("cid").as("cell"))
    val probeCells = cells.filter(col("vec_id") < Similarity.ProbeCount)
      .select(col("vec_id").as("query_id"), col("cell"))
    val lut = adcLut(spark, sfDir)
      .join(broadcast(probeCells), Seq("query_id"))
    val coded = codes(spark, sfDir).join(cells, Seq("vec_id"))
    coded
      .join(broadcast(lut),
        coded("m") === lut("m") && col("code") === col("cid") &&
          coded("cell") === lut("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("qd2").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double").as("adc"))
      .groupBy("query_id")
      .agg(min(struct(col("adc"), col("vec_id"))).as("best"))
      .select(col("query_id"), col("best.vec_id").as("neighbor_id"),
        round(col("best.adc"), 6).as("adc_dist"))
      .orderBy("query_id")
  }

  /** Recall certificate: how many probes' PQ top-1 lands in the EXACT
    * L2 top-[[Similarity.K]] (computed from the raw vectors, bounded to the
    * same probe set). Emits one row — the quantization-quality gate a PQ
    * index ships with. */
  def pqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb(spark, sfDir)
    val probes = base.filter(col("vec_id") < Similarity.ProbeCount)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("vec_id").asc)
    val exact = base.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .withColumn("d2", expr(l2sq("qv", "v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= Similarity.K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val hits = pqTopNeighbor(spark, sfDir)
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
    hits.agg(count(lit(1)).as("hits"))
      .crossJoin(pqTopNeighbor(spark, sfDir)
        .agg(count(lit(1)).as("n_probes")))
      .select(col("n_probes"), col("hits"),
        expr("hits * 1000 div n_probes").as("recall_pml"))
  }
}

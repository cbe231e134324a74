package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (int8-range) embedding quantization — the memory/bandwidth scale
  * path for similarity search.
  *
  * Float embeddings dominate the storage and shuffle cost of ANN at corpus
  * scale: a 64-dim float vector is 256 bytes, its int8 quantization 64
  * bytes plus one scale. Per-vector symmetric quantization maps component
  * `x` to `round(x * 127 / maxabs)` where `maxabs = max_i |x_i|` — the
  * classic faiss/SQ8 scheme, spelled in pure deterministic arithmetic so
  * the DuckDB oracle reproduces every quantized component exactly (IEEE
  * multiply/divide, then HALF-UP rounding, identical in both engines; no
  * RNG, no calibration sample).
  *
  * Scoring runs entirely in integers ([[graft.functions.IntDot]]: one
  * codegen'd long-accumulator loop), so quantized rankings are
  * order-independent and bit-identical on any engine — unlike float dot
  * products, which would need the DECIMAL detour ([[Similarity]]) to be
  * portable. At 100 TB this is the difference between shuffling 25 TB and
  * 6 TB of vectors for an index build, and integer SIMD scoring on read.
  *
  * Quality is bounded, not assumed: QuantizeSpec checks the reconstruction
  * error bound `|x - q*maxabs/127| <= maxabs/254` per component and that
  * quantized top-1 neighbors agree with the exact-cosine ranking on the
  * overwhelming majority of probes.
  */
object Quantize {

  /** Int8 range: components quantize into [-127, 127] (symmetric — -128 is
    * deliberately unused so negation stays in range, matching faiss SQ8). */
  val QMax = 127

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    // idempotent fallbacks for sessions built without GraftExtensions
    graft.functions.IntDot.register(spark)
    graft.functions.DecimalDot.register(spark)
    // fanOut: see Similarity.emb — one-row-group scans serialize the
    // quantize/dot kernels on a single core otherwise
    Tables.fanOut(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** (vec_id, maxabs, norm, q): per-vector scale, original L2 norm, and
    * quantized components. The norm rides along (16 bytes per vector next
    * to the 64-byte code — the standard ANN-index layout) so quantized
    * scores can be ranked as dequantized cosines without touching the
    * float vectors again; it is computed through the exact-decimal kernel
    * + IEEE sqrt, so both engines store the identical double.
    *
    * Zero vectors quantize to all-zero (the `maxabs = 0` arm) instead of
    * dividing by zero. One narrow projection — no shuffle at any scale. */
  def quantizedVectors(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("norm",
        sqrt(expr(s"${graft.functions.DecimalDot.Name}(v, v)")))
      .withColumn("q", expr(
        s"""CASE WHEN maxabs = 0D THEN transform(v, x -> 0)
           |ELSE transform(v, x -> CAST(round(x * ${QMax}.0D / maxabs) AS INT))
           |END""".stripMargin))
      .select("vec_id", "maxabs", "norm", "q")

  /** Catalog form of [[quantizedVectors]] (ordered; the norm rendered at
    * 12 digits — the raw double differs between engines in the last ulp
    * because DuckDB decimalizes the exact binary expansion of each x²
    * while Spark rounds its shortest decimal representation, so the
    * scale-18 sums disagree by ~1e-16 before the sqrt). */
  def quantized(spark: SparkSession, sfDir: String): DataFrame =
    quantizedVectors(spark, sfDir)
      .withColumn("norm", round(col("norm"), 12))
      .select("vec_id", "maxabs", "norm", "q")
      .orderBy("vec_id")

  /** Per-DIMENSION standardization (z-scores): every embedding component
    * centered and scaled by its dimension's corpus mean/stddev — the
    * feature-scaling pass before any distance-based model where raw
    * dimensions have wildly different ranges. Moments are exact decimal
    * sums (Σx, Σx² per dimension — order-independent, the same recipe as
    * the volume-anomaly z-scores), broadcast back as one 64-row frame;
    * the normalization itself is a fixed IEEE chain, so outputs are
    * bit-stable and rendered at 9 digits only to absorb the cross-engine
    * decimalization ulp in the moments. Constant-variance dimensions
    * standardize to 0 instead of dividing by zero. */
  def standardizedEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val comps = emb(spark, sfDir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
    val stats = comps.groupBy("i").agg(
      expr("CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)").as("sx"),
      expr("CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)").as("sx2"),
      count(lit(1)).as("n"))
      .select(col("i"),
        (col("sx") / col("n")).as("m"),
        sqrt(greatest(lit(0.0),
          col("sx2") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))))
          .as("sd"))
    comps.join(broadcast(stats), Seq("i"))
      .select(col("vec_id"), col("i"),
        when(col("sd") === 0, lit(0.0))
          .otherwise(round((col("x") - col("m")) / col("sd"), 9)).as("z"))
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(i, z))), s -> s.z)")
        .as("z"))
      .orderBy("vec_id")
  }

  /** Top-1 neighbor per probe under the dequantized cosine
    * `iscore * maxa * maxb / (127² * |a| * |b|)` — the asymmetric-distance
    * rescale every SQ8 index applies, computed from the exact integer dot
    * plus the stored per-vector (maxabs, norm) doubles, so both engines
    * produce the bit-identical score (one IEEE multiply chain over exact
    * inputs; no float vector is touched at query time).
    *
    * The probe side is the same bounded id range as [[Similarity]] (O(1)
    * in table size, broadcastable at any corpus scale); candidates stream
    * once with no shuffle for the join, and the arg-max is the map-side
    * combinable `max(struct(score, -id))` (deterministic tie-break to the
    * smaller id). */
  def quantizedTopNeighbor(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quantizedVectors(spark, sfDir).filter(col("norm") > 0)
    val probes = q.filter(col("vec_id") < Similarity.ProbeCount)
      .select(col("vec_id").as("query_id"), col("q").as("pq"),
        col("maxabs").as("pmax"), col("norm").as("pnorm"))
    q.select(col("vec_id").as("cand_id"), col("q").as("cq"),
        col("maxabs").as("cmax"), col("norm").as("cnorm"))
      .join(broadcast(probes), col("cand_id") =!= col("query_id"))
      .withColumn("iscore",
        expr(s"${graft.functions.IntDot.Name}(pq, cq)"))
      .withColumn("qcos",
        col("iscore").cast("double") * col("pmax") * col("cmax") /
          (lit((QMax * QMax).toDouble) * col("pnorm") * col("cnorm")))
      .groupBy("query_id")
      .agg(max(struct(col("qcos"), (-col("cand_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("neighbor_id"),
        round(col("best.qcos"), 6).as("qcos"))
      .orderBy("query_id")
  }
}

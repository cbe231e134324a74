package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and train/val/test splitting.
  *
  * Production corpus curation samples by HASH-MOD BUCKETS, not RNG: a
  * document's fate is a pure function of its id, so re-runs are idempotent,
  * additions don't reshuffle earlier decisions, and any engine (here: the
  * DuckDB oracle) reproduces the exact member set. Both operators are one
  * narrow scan + a broadcast of a constant-size rate table — no shuffle at
  * any corpus size (the output sort is presentation-only).
  *
  * [[corpusSplit]] is the leakage-safe split: the hash is taken over each
  * document's NEAR-DUP CLUSTER KEEPER ([[Dedup.clusterLabels]]), not the
  * document itself, so near-duplicates can never straddle train/test — the
  * classic contamination path when splitting a deduplicated-but-clustered
  * corpus doc-by-doc.
  */
object Sampling {

  /** 8-bit bucket from the first two hex digits of `md5(CAST(id AS STRING))`
    * — pure ASCII hex-digit arithmetic, bit-identical in DuckDB
    * (`instr` ↔ `strpos`). */
  private[ops] def bucketSql(c: String): String =
    s"CAST((instr('0123456789abcdef', substr(md5(CAST($c AS STRING)), 1, 1)) - 1) * 16" +
      s" + instr('0123456789abcdef', substr(md5(CAST($c AS STRING)), 2, 1)) - 1 AS BIGINT)"

  val Buckets = 256

  /** Keep-rates per language, out of [[Buckets]]: downsample the dominant
    * language, keep more of the tail — the standard rebalancing move for a
    * multilingual training mix. */
  val LangRates: Seq[(String, Long)] =
    Seq("en" -> 96L, "de" -> 192L, "fr" -> 192L, "es" -> 192L, "zh" -> 224L)
  val DefaultRate = 128L

  /** Per-language deterministic downsample: keep a document iff its id
    * bucket falls under its language's rate. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rates = LangRates.toDF("lang", "rate")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("bucket", expr(bucketSql("doc_id")))
      .join(broadcast(rates), Seq("lang"), "left")
      .filter(col("bucket") < coalesce(col("rate"), lit(DefaultRate)))
      .select("doc_id", "lang", "source", "bucket")
      .orderBy("doc_id")
  }

  /** Split thresholds out of [[Buckets]]: ~80 / ~10 / ~10. */
  val TrainUpper = 204L
  val ValUpper = 230L

  /** Leakage-safe train/val/test assignment: hash the cluster keeper
    * (documents outside any near-dup cluster are their own keeper), so every
    * member of a duplicate cluster lands in the same split. Reads the
    * session-shared cluster-labels frame — the expensive MinHash+CC subtree
    * is not recomputed. */
  def corpusSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source")
      .join(Dedup.clusterLabels(spark, sfDir), Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_keeper"), col("doc_id")))
      .withColumn("bucket", expr(bucketSql("split_key")))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "split_key", "split")
      .orderBy("doc_id")

  /** Cross-split leakage certificate: the near-dup pair counts by split
    * combination, under TWO assignment schemes side by side —
    * `cluster_keyed` (the production [[corpusSplit]]: hash the near-dup
    * cluster keeper, leakage-proof BY CONSTRUCTION since both endpoints of
    * every pair share a split_key) and `naive_hash` (hash the raw doc_id,
    * what a pipeline without dedup-aware splitting does). Rows with
    * `leaked = true` exist only under the naive scheme — the train/eval
    * contamination this audit exists to catch, measured not asserted.
    * Cost: the session-shared banded-pairs frame joined twice against a
    * 2-column assignment — O(|pairs|), nothing corpus-sized shuffles. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Dedup.minhashPairs(spark, sfDir).select("doc_a", "doc_b")
    def matrix(assign: DataFrame, scheme: String): DataFrame =
      pairs
        .join(assign.select(col("doc_id").as("doc_a"), col("split").as("sa")),
          "doc_a")
        .join(assign.select(col("doc_id").as("doc_b"), col("split").as("sb")),
          "doc_b")
        .select(lit(scheme).as("scheme"),
          least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
        .groupBy("scheme", "split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
    val keeper = corpusSplit(spark, sfDir).select("doc_id", "split")
    val naive = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(expr(bucketSql("doc_id")) < TrainUpper, "train")
          .when(expr(bucketSql("doc_id")) < ValUpper, "val")
          .otherwise("test").as("split"))
    matrix(keeper, "cluster_keyed")
      .unionByName(matrix(naive, "naive_hash"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
      .orderBy("scheme", "split_a", "split_b")
  }

  /** Reservoir size per source for [[reservoirSample]]. */
  val ReservoirK = 20

  /** Deterministic per-source "reservoir": the [[ReservoirK]] documents with
    * the smallest hash-rank in each source, where the rank is the first 12
    * hex digits of `md5(doc_id)` (48 bits — exact in a Double) with doc_id
    * as the tie-break. Hash-rank top-k IS distributed reservoir sampling
    * done right: the sample is a pure function of the ids (idempotent
    * re-runs, audit-reproducible), and the bounded [[graft.functions
    * .TopKAggregator]] partial-aggregates every partition down to ≤k rows
    * BEFORE the shuffle — a row_number window, the naive spelling, must
    * shuffle and sort the whole corpus per group. At 100 TB the moved data
    * is k·partitions rows, not N. */
  def reservoirSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(ReservoirK).toColumn
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        // negated so the aggregator's score-DESC order yields hash-ASC
        expr("-CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS DOUBLE)")
          .as("score"))
      .as[(String, Long, Double)]
      .map { case (src, id, s) => (src, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sample"))
      .toDF("source", "sample")
      .select(col("source"), posexplode(col("sample")).as(Seq("pos", "s")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as("doc_id"))
      .orderBy("source", "rnk")
  }

  /** Temperature exponent α = 1/2: weights ∝ n^α. Chosen because x^0.5 is
    * IEEE `sqrt` — the one power that is correctly-rounded and therefore
    * bit-identical across engines, which keeps this oracle-checkable. */
  val TempAlpha = 0.5

  /** Temperature-scaled source mixture plan (the standard multilingual /
    * multi-source rebalancing move: sampling a source proportional to
    * n^α, α<1, upweights the tail without drowning in the head).
    *
    * Per source: `rate = sqrt(n_min / n)` — the keep-probability that turns
    * the n-distribution into the n^½-distribution, normalized so the
    * SMALLEST source keeps everything — and `expected_docs = floor(n·rate)`.
    * Every arithmetic step (double divide, sqrt, multiply, floor) is a
    * single correctly-rounded IEEE op, so DuckDB reproduces the exact
    * doubles; no floating sum ever happens (the only aggregates are integer
    * counts and an integer min). One count-by-source scan + a broadcast
    * single-row min — no corpus-sized shuffle at any scale. */
  def temperatureMixture(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("n_min"))
    counts.join(broadcast(minN))
      .withColumn("rate",
        sqrt(col("n_min").cast("double") / col("n_docs").cast("double")))
      .select(col("source"), col("n_docs"),
        round(col("rate"), 6).as("keep_rate"),
        floor(col("n_docs").cast("double") * col("rate")).as("expected_docs"))
      .orderBy("source")
  }

  /** Per-source sample size of the weighted sample. */
  val WeightedK = 20

  /** Deterministic weighted sampling without replacement: per source, the
    * [[WeightedK]] documents with the smallest `hash48(doc_id) div n_chars`
    * priority — an integer-exact priority-sampling scheme where a document's
    * selection odds grow with its length weight (the A-ES exponential-key
    * method needs `u^(1/w)`, a libm `pow`; integer floor-division keeps the
    * same weight-biased ranking oracle-checkable to the bit).
    *
    * Same 100 TB shape as [[reservoirSample]]: the bounded
    * [[graft.functions.TopKAggregator]] partial-aggregates every partition
    * to ≤k rows BEFORE the shuffle (k·partitions rows move, not N); the
    * 48-bit priority is exact in the aggregator's Double score. Ties break
    * by doc_id, identically on both engines. */
  def weightedPrioritySample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(WeightedK).toColumn
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        // negated so the aggregator's score-DESC order yields priority-ASC
        expr("-CAST(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)" +
          " div greatest(n_chars, 1L) AS DOUBLE)").as("score"))
      .as[(String, Long, Double)]
      .map { case (src, id, s) => (src, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sample"))
      .toDF("source", "sample")
      .select(col("source"), posexplode(col("sample")).as(Seq("pos", "s")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as("doc_id"))
      .orderBy("source", "rnk")
  }

  /** Total sample budget the Neyman allocation apportions. */
  val NeymanBudget = 1000L

  /** Neyman (optimal) stratified-sampling allocation: per-source sample
    * sizes ∝ N_h·S_h — the allocation that minimizes estimator variance
    * for a fixed budget, vs the proportional allocation
    * [[stratifiedSample]] uses. The arithmetic gift: with population
    * std, `N_h·S_h = sqrt(N_h·Σx² − (Σx)²)` — ONE sqrt of an exact
    * integer moment per stratum, floored back to an integer weight, so
    * the whole apportionment (largest-remainder, like
    * [[graft.ops.Behavior.attributionLinear]]) is exact integer
    * arithmetic end to end; budget conservation is structural.
    *
    * One map-side-combinable moment scan + driver-scale apportionment
    * windows over the (tiny) strata frame. */
  def neymanAllocation(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val k = NeymanBudget
    val stats = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
        sum(col("n_chars").cast(dec) * col("n_chars")).as("ss"))
      .withColumn("w",
        floor(sqrt((col("n").cast(dec) * col("ss")
          - col("s").cast(dec) * col("s")).cast("double"))).cast("long"))
    val tot = stats.agg(sum(col("w")).as("tw"))
    val qt = stats.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"$k * w div tw"))
      .withColumn("rem", expr(s"($k * w) % tw"))
    qt
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .withColumn("sb", sum(col("base")).over(
        Window.partitionBy(lit(1))))
      .select(col("source"), col("n").as("n_docs"),
        col("w").as("sd_weight"),
        (col("base") + when(col("rk") <= lit(k) - col("sb"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy("source")
  }
}

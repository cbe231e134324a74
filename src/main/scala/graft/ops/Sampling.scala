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
}

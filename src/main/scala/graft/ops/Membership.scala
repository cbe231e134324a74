package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Membership checks and lookup-join enrichment.
  *
  * The reference ships two dead-code UDFs that launch nested Spark reads and
  * `count()` per row — `isDappAddress` / `isWhaleAddress`
  * (D6, reference: utils/CheckAddress.scala:15-60) — which would fail on
  * executors. The distributed forms are semi-joins ([[flagDappWallets]]) and
  * point lookups against precomputed state.
  *
  * [[enrichBlockTimestamps]] replaces the reference's worst scalability
  * decision: a per-row Web3 RPC inside a UDF (D4, reference:
  * common/Web3.scala:54-76, one HTTP call per transfer row) becomes one
  * broadcast hash join against a `blocks(block_number → timestamp)` lookup —
  * zero network calls on the hot path, no fact-side shuffle.
  */
object Membership {

  /** blocks lookup table (block_number → timestamp), as the reference's RPC
    * cache would be materialized offline. */
  def blocks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id").as("block_number"),
        col("ts_sec").as("block_timestamp"))

  /** Timestamp enrichment of timestamp-less transfer rows via lookup join
    * (the D4 replacement). No broadcast hint: the blocks table grows with
    * chain height (here it is 1:1 with the fact table), so the join strategy
    * is left to Catalyst/AQE — broadcast when the scanned range is small,
    * shuffle join when it is not. Either way it is one join, not one RPC
    * per row. */
  def enrichBlockTimestamps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .drop("transact_at") // simulate the raw feed lacking timestamps
      .join(blocks(spark, sfDir), Seq("block_number"))
      .select(col("block_number"), col("from_address"), col("to_address"),
        col("contract_address"), col("value"),
        col("block_timestamp").as("transact_at"))
      .orderBy("block_number")

  /** Blacklist exclusion with an EXPLICIT bloom prefilter + exact refine —
    * the 100 TB form of F1's NOT-IN: rows whose key misses the bloom skip
    * the anti-join entirely (no false negatives, so "miss ⇒ keep" is
    * exact); only the `might_contain` survivors — true blacklist hits plus
    * the false-positive sliver — pay the exact NOT-IN. With a large
    * blacklist this turns a full-fact-table join into a join over a few
    * percent of it, while the result stays PROVABLY equal to the naive
    * form (the oracle is the plain NOT IN — same trick as the salted
    * queries). Deterministic: bloom bits are an OR over item hashes,
    * independent of partitioning and insertion order.
    *
    * Complements the optimizer-injected runtime filter PlanAuditSpec
    * demonstrates: this is the user-spelled variant for when the
    * blacklist is a table, not a join side. */
  def bloomFilteredVolume(spark: SparkSession, sfDir: String): DataFrame = {
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime-filter rewrite but does not expose them in the public
    // function registry — register session-scoped names (idempotent)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    Tables.transfers(spark, sfDir)
      .createOrReplaceTempView("graft_bloom_transfers")
    Tables.dapps(spark).select(explode(col("addresses")).as("addr"))
      .distinct()
      .createOrReplaceTempView("graft_bloom_blacklist")
    spark.sql(
      """WITH flagged AS (
        |  SELECT t.contract_address, t.to_address, t.value,
        |         graft_might_contain(
        |           (SELECT graft_bloom_agg(xxhash64(addr), 50L, 4096L)
        |            FROM graft_bloom_blacklist),
        |           xxhash64(t.to_address)) AS maybe
        |  FROM graft_bloom_transfers t
        |),
        |kept AS (
        |  SELECT contract_address, value FROM flagged WHERE NOT maybe
        |  UNION ALL
        |  SELECT f.contract_address, f.value FROM flagged f
        |  WHERE f.maybe
        |    AND f.to_address NOT IN (SELECT addr FROM graft_bloom_blacklist)
        |)
        |SELECT contract_address, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS volume
        |FROM kept GROUP BY contract_address
        |ORDER BY contract_address""".stripMargin)
  }

  /** Fuzzy record linkage: near-identical customer names (same nation,
    * Levenshtein ≤ [[LinkMaxDist]]) — the entity-resolution sibling of the
    * document-dedup family.
    *
    * Candidate generation is DELETION-NEIGHBORHOOD blocking (SymSpell /
    * FastSS): every name emits its ≤k-deletion variants (1 + L + L·(L-1)/2
    * strings for k=2), and candidates are the equi-join matches on
    * (nation, variant). The pigeonhole guarantee — an optimal alignment
    * with ≤k edits deletes ≤k chars from each side to reach a common
    * string — means ZERO false negatives, so the result is provably the
    * full all-pairs answer (the oracle stays the naive same-nation
    * cross-pair form, which is the proof). False positives die in the
    * banded refine.
    *
    * Scale: the round-4 version blocked on nation alone (25 values), so
    * candidates grew QUADRATICALLY with table size. Variant rows grow
    * linearly (~172× per 18-char name, the documented SymSpell constant)
    * and each variant block holds only true near-matches plus a sliver of
    * collisions — at 100 TB this is a linear equi-join on a
    * high-cardinality key, the same candidate-generation shape as
    * [[graft.ops.Dedup]]'s LSH bands and [[graft.ops.Similarity]]'s
    * buckets. */
  val LinkMaxDist = 2

  /** Linkage pairs, materialized once per (session, sfDir) — the variant-
    * hash blocking + Levenshtein refine subtree is the expensive part and
    * both q_name_linkage and [[goldenRecords]] consume it; the pair frame
    * is summary-sized (matches only), the [[Shared]] contract. */
  def nameLinkage(spark: SparkSession, sfDir: String): DataFrame =
    Shared.frame(spark, sfDir, "linkage_pairs")(nameLinkageRaw(spark, sfDir))

  private def nameLinkageRaw(spark: SparkSession, sfDir: String): DataFrame = {
    // all strings reachable by deleting 0, 1 or 2 characters; one generator
    // expression, exploded once (no UDF, stays in codegen). Duplicate
    // variants from repeated characters are tolerated — the candidate
    // distinct absorbs them, and per-array dedup would cost O(L⁴) string
    // compares per name for a ~40% row saving
    val deleteVariants = expr(
      """IF(length(c_name) = 0, array(c_name),
        |IF(length(c_name) = 1, array(c_name, ''), concat(
        |  array(c_name),
        |  transform(sequence(1, length(c_name)), i ->
        |    concat(substring(c_name, 1, i - 1),
        |           substring(c_name, i + 1, length(c_name)))),
        |  flatten(transform(sequence(1, length(c_name) - 1), i ->
        |    transform(sequence(i + 1, length(c_name)), j ->
        |      concat(substring(c_name, 1, i - 1),
        |             substring(c_name, i + 1, j - i - 1),
        |             substring(c_name, j + 1, length(c_name)))))))))""".stripMargin)
    // candidate stream carries only (nation, variant-HASH, key): near-dup
    // pairs share MANY variants, so the pre-dedup stream is ~30× the pair
    // count — hashing the variant (collisions only add candidates, the
    // refine kills them) and deferring the name columns to a post-distinct
    // broadcast join shrinks the two big shuffles by an order of magnitude.
    // The source is a handful of parquet splits at test scale, so the L²/2
    // generator is REPARTITIONED to full parallelism and the tiny hashed
    // index persisted — both join sides then share one build (the
    // materialized-SymSpell-index shape).
    val v = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("c_nationkey"), col("c_custkey"),
        explode(deleteVariants).as("v"))
      .select(col("c_nationkey"), xxhash64(col("v")).as("vh"),
        col("c_custkey"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val cand = v.toDF("c_nationkey", "vh", "key_a")
      .join(v.toDF("c_nationkey", "vh", "key_b"), Seq("c_nationkey", "vh"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b")
      .distinct() // a pair may share many variants; refine each pair once
    val names = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))
    cand
      .join(broadcast(names.toDF("key_a", "name_a")), Seq("key_a"))
      .join(broadcast(names.toDF("key_b", "name_b")), Seq("key_b"))
      // banded threshold Levenshtein: O(k·n) per pair with early exit
      // (returns -1 past the bound) instead of the full O(n²) DP
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), LinkMaxDist))
      .filter(col("dist") >= 0)
      .select(col("key_a"), col("key_b"), col("dist"))
      .orderBy("key_a", "key_b")
  }

  /** Golden records: the entity-resolution END state — fuse each linkage
    * cluster ([[nameLinkage]] pairs closed under [[Graph
    * .connectedComponents]]) into ONE canonical customer row with
    * deterministic fusion rules (min key as canonical id, lexicographic-
    * min name, decimal-summed balance, distinct-segment count as a fusion-
    * conflict signal). Unlinked customers pass through as singleton
    * clusters of themselves — the output is a complete deduplicated
    * master table, not just the merged subset (the MDM "survivorship"
    * step downstream of every linkage pipeline).
    *
    * The expensive subtrees are the proven ones (variant-hash blocking,
    * min-label propagation); fusion itself is one grouped aggregate keyed
    * by cluster. */
  def goldenRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = nameLinkage(spark, sfDir)
      .select(col("key_a").as("src"), col("key_b").as("dst"))
    val labels = Graph.connectedComponents(pairs)
      .toDF("c_custkey", "cluster")
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .join(labels, Seq("c_custkey"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("c_custkey")))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min(col("c_custkey")).as("canonical_key"),
        min(col("c_name")).as("canonical_name"),
        Num.dsum(col("c_acctbal")).as("total_acctbal"),
        min(col("c_nationkey")).as("nation"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy("cluster")
  }

  /** Per-wallet dapp-membership flag — the semi-join form of isDappAddress:
    * one pass, no per-row reads. */
  def flagDappWallets(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = Tables.dapps(spark)
      .select(explode(col("addresses")).as("address"))
      .distinct() // an address owned by several dapps must not fan the join out
    val wallets = Tables.transfers(spark, sfDir)
      .select(explode(array(col("from_address"), col("to_address"))).as("address"))
      .distinct()
    wallets
      .join(broadcast(reg.withColumn("is_dapp", lit(true))), Seq("address"), "left")
      .select(col("address"), coalesce(col("is_dapp"), lit(false)).as("is_dapp"))
      .orderBy("address")
  }
}

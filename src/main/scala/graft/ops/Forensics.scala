package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transfer-forensics operators: trading-pattern detectors over the token
  * transfer fact table — the fraud/quality screens a token-analytics
  * deployment runs beside the reference's volume/holder metrics
  * (reference computes per-token aggregates only,
  * src/main/scala/etl/BaseEnricher.scala:85-124; these detectors extend the
  * same fact table to pairwise and cohort patterns).
  *
  * Scale design: every detector is a key-partitioned join or aggregate —
  * wash-trade pairing joins on the full (token, a, b) counterparty-pair
  * key (never a per-wallet key, whose hot wallets would skew), fan-out and
  * cohort screens are single map-side-combinable aggregates. Nothing here
  * collects, windows-without-partition, or crossJoins.
  */
object Forensics {

  /** Round-trips A→B→A must close within this many seconds to count as a
    * wash pair (7 days — token round-trips are slow on-chain). */
  val WashWindowSec = 604800L

  /** A sender spraying at least this many distinct receivers inside one
    * day trips the fan-out screen. */
  val FanoutMinRecipients = 5L

  /** Wash-trading screen: one summary row — how many A→B transfers are
    * answered by a strictly-later same-token B→A transfer within
    * [[WashWindowSec]], over how many distinct counterparty pairs, and the
    * volume "washed" (the smaller leg of each round trip — the amount that
    * actually cycled).
    *
    * Each outbound leg pairs with EVERY qualifying return leg (the honest
    * pairwise definition — a 3-cycle A→B,B→A,B→A is two round trips); the
    * time window bounds the per-pair fan-out. The join key is the
    * counterparty pair + token, so the shuffle partitions by pair, not by
    * wallet — a hot exchange wallet spreads over its many counterparties
    * instead of landing on one reducer. Strict block-order (`b2 > b1`)
    * orients each round trip once. The global rollup stays one row even
    * when the screen finds nothing (sum→0 via coalesce), so the output
    * shape is SF-independent. */
  def washTrading(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir).select(
      col("contract_address"), col("from_address"), col("to_address"),
      col("block_number"), col("value"), col("transact_at"))
    val fwd = t.select(
      col("contract_address"), col("from_address").as("a"),
      col("to_address").as("b"), col("block_number").as("b1"),
      col("value").as("v1"), col("transact_at").as("t1"))
    val rev = t.select(
      col("contract_address"), col("to_address").as("a"),
      col("from_address").as("b"), col("block_number").as("b2"),
      col("value").as("v2"), col("transact_at").as("t2"))
    fwd.join(rev, Seq("contract_address", "a", "b"))
      .filter(col("b2") > col("b1") &&
        col("t2") >= col("t1") && col("t2") <= col("t1") + WashWindowSec)
      .agg(
        count(lit(1)).as("n_roundtrips"),
        countDistinct(col("contract_address"),
          least(col("a"), col("b")), greatest(col("a"), col("b")))
          .as("n_pairs"),
        coalesce(Num.dsum(least(col("v1"), col("v2"))), lit(0.0))
          .as("washed_volume"))
  }

  /** Airdrop/spray fan-out screen: senders that reach at least
    * [[FanoutMinRecipients]] distinct receivers within a single day
    * (across tokens — spray campaigns mix tokens). One aggregate over
    * (sender, day); distinct receivers via a per-edge pre-distinct so the
    * final count stays map-side combinable. */
  def airdropFanout(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
      .select(col("from_address"), col("to_address"), col("value"),
        Num.dayBucket(col("transact_at")).cast("long").as("d"))
    val perEdge = t
      .groupBy("from_address", "d", "to_address")
      .agg(count(lit(1)).as("n_tx"), Num.dsumDec(col("value")).as("vol"))
    perEdge
      .groupBy("from_address", "d")
      .agg(count(lit(1)).as("n_recipients"),
        sum(col("n_tx")).as("n_tx"),
        sum(col("vol")).cast("double").as("volume"))
      .filter(col("n_recipients") >= FanoutMinRecipients)
      .orderBy("from_address", "d")
  }

  /** A wallet inactive for longer than this many seconds counts as
    * dormant; its next activity is a reactivation. */
  val DormantSec = 604800L

  /** Second hop of a relay chain must land within this window. */
  val RelayWindowSec = 3600L

  /** Relay-chain screen (the temporal 2-path motif): A→B followed within
    * [[RelayWindowSec]] by B→C with A≠C — the layering pattern
    * pass-through mixers and peel chains leave. Grouped by the RELAY
    * wallet B: chains through it, distinct (A, C) endpoint pairs, and the
    * relayed value (the smaller hop — what provably moved through).
    *
    * The self-join keys on the relay wallet (in-leg `to` = out-leg
    * `from`); the time window bounds per-wallet fan-out, and strict
    * block order orients each chain once. Tokens may differ across hops
    * (mixers swap tokens mid-chain). */
  def relayChains(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir).select(
      col("from_address"), col("to_address"), col("block_number"),
      col("value"), col("transact_at"))
    val in = t.select(col("from_address").as("a"), col("to_address").as("b"),
      col("block_number").as("b1"), col("value").as("v1"),
      col("transact_at").as("t1"))
    val out = t.select(col("from_address").as("b"), col("to_address").as("c"),
      col("block_number").as("b2"), col("value").as("v2"),
      col("transact_at").as("t2"))
    in.join(out, Seq("b"))
      .filter(col("b2") > col("b1") &&
        col("t2") >= col("t1") && col("t2") <= col("t1") + RelayWindowSec &&
        col("a") =!= col("c"))
      .groupBy(col("b").as("relay_wallet"))
      .agg(count(lit(1)).as("n_chains"),
        countDistinct(col("a"), col("c")).as("n_endpoint_pairs"),
        Num.dsum(least(col("v1"), col("v2"))).as("relayed_value"))
      .orderBy("relay_wallet")
  }

  /** Dormancy / reactivation summary: per token, the distribution of gaps
    * between consecutive activities of the same wallet — total gap pairs,
    * reactivations (gap > [[DormantSec]]), the longest sleep, and the mean
    * gap (exact integer sum, one final division).
    *
    * The lag window partitions by (token, wallet) — per-wallet history is
    * small and the key space is huge, so the sort never concentrates. */
  def dormancy(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.transfers(spark, sfDir)
    val acts = t.select(col("contract_address"),
        col("from_address").as("wallet"), col("transact_at").as("at"))
      .unionByName(t.select(col("contract_address"),
        col("to_address").as("wallet"), col("transact_at").as("at")))
      .distinct()
    val w = Window.partitionBy("contract_address", "wallet").orderBy("at")
    acts
      .withColumn("prev", lag(col("at"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap", col("at") - col("prev"))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n_gaps"),
        sum(when(col("gap") > DormantSec, 1L).otherwise(0L))
          .as("n_reactivations"),
        max(col("gap")).as("max_gap_sec"),
        round(sum(col("gap")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_gap_sec"))
      .orderBy("contract_address")
  }

  /** New-vs-returning wallet mix: per (token, hour), how many of the hour's
    * active wallets (either transfer side) are active for the FIRST time
    * for that token. The classic growth-accounting split, computed with one
    * min-aggregate per (token, wallet) joined back to the hourly activity
    * set — no global window. */
  def newVsReturning(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    val active = t.select(col("contract_address"),
        col("from_address").as("wallet"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .unionByName(t.select(col("contract_address"),
        col("to_address").as("wallet"),
        Num.hourBucket(col("transact_at")).cast("long").as("t")))
      .distinct()
    val firstSeen = active.groupBy("contract_address", "wallet")
      .agg(min(col("t")).as("first_t"))
    active.join(firstSeen, Seq("contract_address", "wallet"))
      .groupBy(col("contract_address"), col("t"))
      .agg(
        sum(when(col("t") === col("first_t"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("t") =!= col("first_t"), 1L).otherwise(0L))
          .as("n_returning"))
      .orderBy("contract_address", "t")
  }

  /** Benford expected first-digit shares, in integer per-mille:
    * ⌊log10(1 + 1/d) · 1000⌋ for d = 1..9, spelled as literals so both
    * engines compare against the identical constant (log10 is libm
    * territory — not bit-portable). */
  val BenfordPml: Seq[(Int, Long)] = Seq(
    1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
    6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  /** Benford first-digit screen over transfer amounts: observed share of
    * each leading significant digit vs the Benford expectation, deviation
    * in per-mille. Fabricated/mirrored volume tends to flatten the digit
    * distribution — the classic forensic-accounting test applied to
    * on-chain flows.
    *
    * Exactness: amounts go through DECIMAL(25,2) cents so the digit is
    * taken from an exact integer's decimal rendering (identical in both
    * engines); shares are integer-division per-mille. One map-side
    * combinable 9-group aggregate — nothing here scales with anything but
    * the scan. */
  def benford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.transfers(spark, sfDir)
      .select((col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2))
        * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
    val counts = cents.groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = BenfordPml.toDF("d", "benford_pml")
      .select(col("d").cast("long").as("digit"), col("benford_pml"))
    val total = counts.agg(sum(col("n")).as("total"))
    expected.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000 div total").as("share_pml"),
        col("benford_pml"),
        abs(expr("n * 1000 div total") - col("benford_pml")).as("dev_pml"))
      .orderBy("digit")
  }

  /** Circular transfers A→B→C→A must close within this many seconds of the
    * first hop to count as one 3-cycle (30 days — ring structures cycle
    * even slower than the 7-day [[WashWindowSec]] round trips, and the
    * window is what bounds the join fan-out at scale, not a correctness
    * knob). */
  val CycleWindowSec = 2592000L

  /** Temporal 3-cycle screen (circular-trading motif): same-token transfer
    * chains A→B, B→C, C→A with strictly increasing block numbers,
    * non-decreasing timestamps, all three hops inside [[CycleWindowSec]] of
    * the first, and three distinct wallets. Extends the 2-node
    * [[washTrading]] round-trip and the open 2-path [[relayChains]] to the
    * closed triangle — the structure wash-trading rings use to avoid the
    * obvious A↔B pattern.
    *
    * Both joins are full equi-joins — hop 2 on (token, middle wallet), hop
    * 3 on (token, last wallet, FIRST wallet), so closure is part of the
    * shuffle key, never a post-filter over a wider join; the time window
    * bounds per-key fan-out. Partitioning is by wallet pair, not by single
    * hot wallet. */
  def circularTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir).select(
      col("contract_address").as("tok"), col("from_address"),
      col("to_address"), col("block_number"), col("transact_at"))
    val hop1 = t.select(col("tok"), col("from_address").as("a"),
      col("to_address").as("b"), col("block_number").as("k1"),
      col("transact_at").as("t1"))
    val hop2 = t.select(col("tok"), col("from_address").as("b"),
      col("to_address").as("c"), col("block_number").as("k2"),
      col("transact_at").as("t2"))
    val hop3 = t.select(col("tok"), col("from_address").as("c"),
      col("to_address").as("a"), col("block_number").as("k3"),
      col("transact_at").as("t3"))
    val cycles = hop1.join(hop2, Seq("tok", "b"))
      .filter(col("k2") > col("k1") && col("t2") >= col("t1") &&
        col("t2") <= col("t1") + CycleWindowSec &&
        col("a") =!= col("b") && col("b") =!= col("c") &&
        col("a") =!= col("c"))
      .join(hop3, Seq("tok", "c", "a"))
      .filter(col("k3") > col("k2") && col("t3") >= col("t2") &&
        col("t3") <= col("t1") + CycleWindowSec)
      .groupBy("tok")
      .agg(count(lit(1)).as("n_cycles"),
        countDistinct(col("a")).as("n_initiators"),
        countDistinct(col("b")).as("n_relays"))
    // densified to every observed token — a clean screen reports 0, not
    // an absent row (and the report shape is SF-stable)
    t.select(col("tok")).distinct()
      .join(cycles, Seq("tok"), "left")
      .select(col("tok").as("contract_address"),
        coalesce(col("n_cycles"), lit(0L)).as("n_cycles"),
        coalesce(col("n_initiators"), lit(0L)).as("n_initiators"),
        coalesce(col("n_relays"), lit(0L)).as("n_relays"))
      .orderBy("contract_address")
  }

  /** Rows the flow-imbalance leaderboard reports. */
  val ImbalanceTopK = 20

  /** Pairwise flow imbalance: per (token, unordered wallet pair), gross
    * volume both ways, net directional flow, and |net|/gross in integer
    * per-mille — the aggregate cousin of [[washTrading]]: balanced heavy
    * pairs (imbalance → 0) look like wash activity, one-sided heavy pairs
    * are genuine distribution. Top pairs by gross, exact-decimal ordering.
    * One (token, pair)-keyed aggregate — the same skew-safe key as the
    * wash screen — and a bounded TakeOrdered. */
  /** Power-of-two transfer-size histogram per token (HdrHistogram-style
    * log₂ bucketing): bucket = ⌊log₂ cents⌋ computed EXACTLY as the
    * binary-representation length (no float log), with the bucket's lower
    * bound, count and total. The shape diagnostic behind fee modeling and
    * dust-attack detection; one map-side-combinable aggregate. */
  def txSizeHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(col("contract_address"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2))
          * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("bucket", (length(expr("bin(cents)")) - 1).cast("long"))
      .groupBy("contract_address", "bucket")
      .agg(count(lit(1)).as("n_tx"),
        sum(col("cents")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("total_cents"))
      .withColumn("lo_cents", expr("shiftleft(1L, CAST(bucket AS INT))"))
      .orderBy("contract_address", "bucket")

  /** Wallet activity-days histogram: how many wallets were active (either
    * transfer side) on exactly N distinct days — the engagement-depth
    * distribution behind DAU/MAU modeling and airdrop sybil screens (a
    * spike at N=1 is farm wallets). Three map-side-combinable aggregates,
    * output ≤ |days| rows. */
  def activityHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    t.select(col("from_address").as("wallet"),
        Num.dayBucket(col("transact_at")).cast("long").as("day"))
      .unionByName(t.select(col("to_address").as("wallet"),
        Num.dayBucket(col("transact_at")).cast("long").as("day")))
      .distinct()
      .groupBy("wallet").agg(count(lit(1)).as("n_days"))
      .groupBy("n_days").agg(count(lit(1)).as("n_wallets"))
      .orderBy("n_days")
  }

  /** Bot-score weights: one wash round-trip, one fan-out day, and the
    * per-mille burst share contribute in this ratio. Literal so the
    * oracle repeats them. */
  val BotRtWeight = 50L
  val BotFanoutWeight = 100L
  val BotTopK = 20

  /** Composite bot-likelihood score per sender wallet: wash round-trips
    * initiated ([[washTrading]]'s pairwise count, attributed to the
    * initiator), fan-out days ([[airdropFanout]]'s day count), and the
    * per-mille share of the sender's events arriving in sub-[[
    * graft.ops.Behavior.ThrottleSec]] bursts — combined with integer
    * weights into one ranked screen. Each component reuses a
    * hash-verified sub-query's exact spelling, so the composite is
    * oracle-checkable; at scale each is a key-partitioned aggregate and
    * the leaderboard is a bounded TakeOrdered. */
  def botScore(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.transfers(spark, sfDir)
    // wash round-trips per initiating wallet
    val out1 = t.select(col("contract_address").as("tok"),
      col("from_address").as("a"), col("to_address").as("b"),
      col("block_number").as("k1"), col("transact_at").as("t1"))
    val back = t.select(col("contract_address").as("tok"),
      col("to_address").as("a"), col("from_address").as("b"),
      col("block_number").as("k2"), col("transact_at").as("t2"))
    val rts = out1.join(back, Seq("tok", "a", "b"))
      .filter(col("k2") > col("k1") && col("t2") >= col("t1") &&
        col("t2") <= col("t1") + WashWindowSec)
      .groupBy(col("a").as("wallet")).agg(count(lit(1)).as("rt"))
    // fan-out days per sender
    val fds = t.groupBy(col("from_address").as("wallet"),
        Num.dayBucket(col("transact_at")).cast("long").as("day"))
      .agg(countDistinct(col("to_address")).as("nr"))
      .filter(col("nr") >= FanoutMinRecipients)
      .groupBy("wallet").agg(count(lit(1)).as("fd"))
    // burst share per sender (across tokens)
    val byW = Window.partitionBy("from_address")
      .orderBy("transact_at", "block_number")
    val bursts = t.select(col("from_address"), col("transact_at"),
        col("block_number"))
      .withColumn("prev", lag(col("transact_at"), 1).over(byW))
      .groupBy(col("from_address").as("wallet"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("prev").isNotNull &&
          col("transact_at") - col("prev") < Behavior.ThrottleSec, 1L)
          .otherwise(0L)).as("n_burst"))
      .withColumn("bp", expr("n_burst * 1000 div n_ev"))
    bursts
      .join(rts, Seq("wallet"), "left")
      .join(fds, Seq("wallet"), "left")
      .select(col("wallet"),
        coalesce(col("rt"), lit(0L)).as("round_trips"),
        coalesce(col("fd"), lit(0L)).as("fanout_days"),
        col("bp").as("burst_pml"))
      .withColumn("bot_score",
        expr(s"round_trips * $BotRtWeight + fanout_days * $BotFanoutWeight" +
          " + burst_pml"))
      .orderBy(col("bot_score").desc, col("wallet"))
      .limit(BotTopK)
  }

  def flowImbalance(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, 2)
    Tables.transfers(spark, sfDir)
      .filter(col("from_address") =!= col("to_address"))
      .groupBy(col("contract_address"),
        least(col("from_address"), col("to_address")).as("a"),
        greatest(col("from_address"), col("to_address")).as("b"))
      .agg(sum(col("value").cast(dec)).as("gross"),
        sum(when(col("from_address") < col("to_address"),
          col("value").cast(dec)).otherwise(-col("value").cast(dec)))
          .as("net"),
        count(lit(1)).as("n_tx"))
      .orderBy(col("gross").desc, col("contract_address"), col("a"),
        col("b"))
      .limit(ImbalanceTopK)
      .select(col("contract_address"), col("a"), col("b"),
        col("gross").cast("double").as("gross"),
        col("net").cast("double").as("net"),
        expr("CAST(abs(net) * 100000 AS DECIMAL(38,0))" +
          " div CAST(gross * 100 AS DECIMAL(38,0))").as("imbalance_pml"),
        col("n_tx"))
  }

  /** Activity-interval half-width (seconds) for [[mergeIntervals]]: each
    * transaction opens a 30-minute activity window. */
  val IntervalLenSec = 1800L

  /** Interval union (the classic overlapping-intervals merge): each
    * wallet's transactions open [t, t+[[IntervalLenSec]]) activity
    * windows; overlapping windows coalesce, and the report is per-wallet
    * raw interval count, merged-island count, and exact covered seconds
    * — the activity-surface metric behind "how long was this wallet
    * actually live" (dormancy's complement) and the generic interval-
    * algebra operator every scheduling/uptime pipeline needs.
    *
    * One wallet-keyed window pass: an island opens where the start
    * exceeds the running max of prior ends (cumulative-max lag), island
    * ids are the running sum of those opens, then two rollups. All
    * windows partition by wallet — no global ordering anywhere. */
  def mergeIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.transfers(spark, sfDir)
      .select(col("from_address").as("wallet"),
        col("transact_at").as("s"),
        (col("transact_at") + IntervalLenSec).as("e"))
    val w = Window.partitionBy("wallet").orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("prev_max_e").isNull ||
          col("s") > col("prev_max_e"), 1L).otherwise(0L))
      .withColumn("island", sum(col("opens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy("wallet", "island")
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("is_"),
        max(col("e")).as("ie"))
      .groupBy("wallet")
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_merged"),
        sum(col("ie") - col("is_")).as("covered_sec"))
      .orderBy("wallet")
  }
}

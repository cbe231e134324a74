package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-analytics time-series ("change log") metrics.
  *
  * Each function re-expresses one of the reference's per-token metric
  * sub-plans (reference: src/main/scala/etl/BaseEnricher.scala) as a single
  * grouped aggregation with `contract_address` kept as a grouping column —
  * the reference loops over tokens on the driver
  * (reference: src/main/scala/etl/EnhanceTokenEnricher.scala:15-70); grouping
  * instead computes all tokens in one distributed pass, which is the shape
  * that survives a 100 TB scan (one shuffle keyed by (token, bucket), fully
  * map-side combined, no driver round-trips).
  *
  * Results are emitted in exploded relational form (token, bucket, value),
  * ordered, for oracle comparison; the map-typed "change log" assembly the
  * reference stores is [[ChangeLogs.perKey]]/[[ChangeLogs.global]].
  */
object Metrics {
  import Num._

  /** Hourly trading volume per token
    * (reference: src/main/scala/etl/BaseEnricher.scala:267-298). */
  def hourlyVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"), hourBucket(col("transact_at")).as("t"))
      .agg(dsum(col("value")).as("volume"))
      .orderBy("contract_address", "t")

  /** Incremental aggregate maintenance (the materialized-view refresh
    * pattern): the stream splits at a block threshold into a "materialized
    * base" (first ~90% of blocks) and a "new batch" (the rest); each side
    * partial-aggregates SEPARATELY and the two partials merge by key —
    * never rescanning the base, which is the whole point at 100 TB (the
    * reference's incremental mode re-reads 5,000-block ranges instead;
    * reference: src/main/scala/etl/TransferEnricher.scala:33,112-150).
    *
    * The partials stay DECIMAL until after the merge: decimal sums are
    * exact, so merge order — and the base/delta split point itself — can
    * never change a bit of the result. The oracle is the FULL single-pass
    * recompute; hash-equality proves base ⊕ delta ≡ recompute, which is
    * the correctness contract of any IVM scheme. */
  def incrementalHourlyVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    // deterministic split: 90% of the observed block range is "already
    // materialized", the tail is the arriving batch (broadcast 1-row scalar)
    val thr = t.agg(max("block_number").as("mb"))
      .select(expr("mb - mb div 10").as("thr"))
    val withThr = t.crossJoin(broadcast(thr))
    def partial(side: DataFrame) = side
      .groupBy(col("contract_address"), hourBucket(col("transact_at")).as("t"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2)))
        .as("dvol"), count(lit(1)).as("n"))
    val base = partial(withThr.filter(col("block_number") < col("thr")))
    val delta = partial(withThr.filter(col("block_number") >= col("thr")))
    base.unionByName(delta)
      .groupBy("contract_address", "t")
      .agg(sum("dvol").cast("double").as("volume"), sum("n").as("tx_count"))
      .orderBy("contract_address", "t")
  }

  /** Bounded-horizon decay weights 2^([[DecayHorizonHours]]−j): INTEGER,
    * so the decayed sum stays exact decimal; the only floating-point step
    * is one final division by 2^H — exact exponent scaling in IEEE, so the
    * result is bit-determined by the decimal sum in any engine. */
  val DecayHorizonHours = 12

  /** Exponentially time-decayed hourly volume (half-life = 1 h, horizon =
    * [[DecayHorizonHours]] h) — the freshness-weighted activity feature a
    * feature store serves: `decayed(t) = Σ_{j=0..H} vol(t−j) · 2^(H−j) /
    * 2^H`, missing hours contributing zero.
    *
    * The classic running-product EWMA recursion is order-dependent in
    * floats and unbounded in decimals (2^t overflows); the scale-safe form
    * is a bounded-horizon CONVOLUTION: each hourly total scatters into the
    * H+1 buckets it decays into (a broadcast 13-row weight join over the
    * already hour-aggregated frame — bounded amplification of a bounded
    * stream, map-side combined), then one sum per target bucket. Hours are
    * emitted only where volume was observed (inner join back to the hourly
    * frame), which also re-uses the (token, hour) partitioning — the join
    * adds no exchange. */
  def decayedVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val h = DecayHorizonHours
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"), hourBucket(col("transact_at")).as("t"))
      .agg(dsumDec(col("value")).as("vol"))
    val weights = spark.range(0, h + 1L)
      .select(col("id").as("j"),
        expr(s"CAST(shiftleft(CAST(1 AS BIGINT), CAST($h - id AS INT)) " +
          "AS DECIMAL(10,0))").as("wt"))
    val contrib = hourly.crossJoin(broadcast(weights))
      .groupBy(col("contract_address"), (col("t") + col("j") * 3600).as("t"))
      .agg(sum(col("vol") * col("wt")).as("s"))
    hourly.join(contrib, Seq("contract_address", "t"))
      .select(col("contract_address"), col("t"),
        col("vol").cast("double").as("volume"),
        (col("s").cast("double") / lit(math.pow(2, h))).as("decayed"))
      .orderBy("contract_address", "t")
  }

  /** Hourly transfer count per token
    * (reference: src/main/scala/etl/BaseEnricher.scala:239-265). */
  def hourlyTxCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"), hourBucket(col("transact_at")).as("t"))
      .agg(count(lit(1)).as("tx_count"))
      .orderBy("contract_address", "t")

  /** Average transactions per day, replicating the reference's /24 semantics
    * (documented quirk: it divides the *daily* count by 24 — "avg per hour"
    * mislabeled; reference: src/main/scala/etl/BaseEnricher.scala:204-237,
    * decision SURVEY.md §7.4.3). */
  def avgTxPerDay(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"), dayBucket(col("transact_at")).as("d"))
      .agg(count(lit(1)).as("daily_count"))
      .withColumn("avg_tx", col("daily_count").cast("double") / 24.0)
      .orderBy("contract_address", "d")

  /** Hourly distinct active wallets per token — both legs of each transfer
    * (reference: src/main/scala/etl/BaseEnricher.scala:300-326: array(from,to)
    * → explode → countDistinct). Exact distinct for oracle parity; the
    * 100 TB variant is [[hourlyUniqueWalletsApprox]]. */
  def hourlyUniqueWallets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(
        col("contract_address"),
        hourBucket(col("transact_at")).as("t"),
        explode(array(col("from_address"), col("to_address"))).as("address"))
      .groupBy("contract_address", "t")
      .agg(countDistinct("address").as("unique_wallets"))
      .orderBy("contract_address", "t")

  /** HyperLogLog variant of [[hourlyUniqueWallets]] — the scale path for
    * exact-distinct at 100 TB (single pass, fixed-size sketch per group, no
    * second shuffle for distinct). Raw estimates are not oracle-comparable
    * (DuckDB's HLL is a different implementation); [[hourlyUniqueWalletsCertified]]
    * is the hash-matchable form. */
  def hourlyUniqueWalletsApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(
        col("contract_address"),
        hourBucket(col("transact_at")).as("t"),
        explode(array(col("from_address"), col("to_address"))).as("address"))
      .groupBy("contract_address", "t")
      .agg(approx_count_distinct("address", 0.01).as("unique_wallets"))
      .orderBy("contract_address", "t")

  /** Error bound on the HLL estimate vs exact distinct `n`: absolute slack
    * 3 for the tiny-cardinality regime, 5% relative beyond — an order of
    * magnitude above the rsd-0.01 sketch's expected error, so the
    * certificate is stable under any data growth. Shared with MetricsSpec. */
  def hllWithinBound(hll: org.apache.spark.sql.Column,
      exact: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(hll.cast("double") - exact.cast("double")) <=
      greatest(lit(3.0), exact.cast("double") * 0.05)

  /** CERTIFIED form of [[hourlyUniqueWalletsApprox]]: per group, the exact
    * distinct count plus the deterministic predicate `|hll − exact| ≤ ε`.
    * Spark's HLL merges by register max (commutative/associative), so the
    * estimate — and hence the boolean — is partition-order independent;
    * the DuckDB oracle computes the identical exact count and asserts the
    * bound as literal `true`, making the sketch's accuracy contract a
    * hash-matchable row instead of a rows-only entry. */
  def hourlyUniqueWalletsCertified(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(
        col("contract_address"),
        hourBucket(col("transact_at")).as("t"),
        explode(array(col("from_address"), col("to_address"))).as("address"))
      .groupBy("contract_address", "t")
      .agg(countDistinct("address").as("unique_wallets"),
        approx_count_distinct("address", 0.01).as("hll"))
      .select(col("contract_address"), col("t"), col("unique_wallets"),
        hllWithinBound(col("hll"), col("unique_wallets")).as("hll_ok"))
      .orderBy("contract_address", "t")

  /** Sliding-window volume: 2-hour windows sliding by 1 hour (each event
    * lands in two windows). Uses the event-time `window()` function in batch
    * mode — identical semantics to its streaming use
    * ([[graft.streaming.StreamingMetrics]]). */
  def slidingVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("contract_address"),
        window(col("ts_t"), "2 hours", "1 hour"))
      .agg(dsum(col("value")).as("volume"), count(lit(1)).as("n"))
      .select(col("contract_address"),
        unix_timestamp(col("window.start")).as("w_start"),
        unix_timestamp(col("window.end")).as("w_end"),
        col("volume"), col("n"))
      .orderBy("contract_address", "w_start")

  /** Sliding-window DISTINCT senders: unique wallets active in each
    * overlapping 2h/1h window per token — the windowed-distinct variant
    * of [[hourlyUniqueWallets]] (tumbling) and [[slidingVolume]] (sums).
    * Distinct is not decomposable across overlapping windows, so each
    * event expands into its two covering windows before the distinct
    * aggregation — cost 2× the stream, exact result; the HLL-sketch
    * union (MetricsSpec's reaggregation test) is the constant-state
    * alternative when 2× expansion or exactness can be traded. */
  def slidingUniqueWallets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        window(timestamp_seconds(col("transact_at")), "2 hours", "1 hour"))
      .agg(countDistinct(col("from_address")).as("n_wallets"))
      .select(col("contract_address"),
        unix_timestamp(col("window.start")).as("w_start"),
        col("n_wallets"))
      .orderBy("contract_address", "w_start")

  /** Volume anomaly detection: hours whose volume sits ≥ [[AnomalyZ]]
    * standard deviations from the token's mean — the alerting query a
    * metrics pipeline runs on the hourly series. Moments are hand-rolled
    * from DECIMAL-exact Σv and Σv² (Spark's `stddev` accumulates doubles
    * in partition order — useless for a cross-engine contract); from there
    * mean/variance/sqrt/z are IEEE-exact ops spelled identically in the
    * oracle. Per-token stats are a 5-row broadcast back onto the series. */
  val AnomalyZ = 2.0
  def volumeAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val hv = hourlyVolume(spark, sfDir)
    val stats = hv.groupBy(col("contract_address")).agg(
      count(lit(1)).as("n"),
      sum(col("volume").cast(org.apache.spark.sql.types.DecimalType(25, 2)))
        .cast("double").as("sum_v"),
      sum(expr("CAST(volume * volume AS DECIMAL(38,6))"))
        .cast("double").as("sum_sq"))
    hv.join(broadcast(stats), Seq("contract_address"))
      .withColumn("mean", col("sum_v") / col("n").cast("double"))
      .withColumn("variance",
        col("sum_sq") / col("n").cast("double") - col("mean") * col("mean"))
      .withColumn("z", (col("volume") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) >= AnomalyZ)
      .select(col("contract_address"), col("t"), col("volume"),
        round(col("z"), 6).as("z"))
      .orderBy("contract_address", "t")
  }

  /** Rolling trailing-2h volume per transfer — a RANGE window frame (peers
    * by event-time VALUE, not row position: all events in (t−7199, t]
    * contribute, however many share a timestamp). The remaining window
    * mode after ROWS frames and ranking: decimal-exact inside the frame so
    * any peer order yields identical sums. One shuffle on the token key. */
  def rollingVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("contract_address").orderBy("transact_at")
      .rangeBetween(-7199L, 0L)
    Tables.transfers(spark, sfDir)
      .select(col("contract_address"), col("block_number"),
        col("transact_at"), col("value"))
      .withColumn("vol_2h", Num.dsumDec(col("value")).over(w).cast("double"))
      .orderBy("contract_address", "block_number")
  }

  /** Session-window volume: 30-minute-gap sessions per token via native
    * `session_window` (micro-second gap math — the oracle reproduces it as
    * a gaps-and-islands computation over epoch-microseconds). */
  def sessionVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("contract_address"),
        session_window(col("ts_t"), "30 minutes"))
      .agg(dsum(col("value")).as("volume"), count(lit(1)).as("n"))
      .select(col("contract_address"),
        unix_timestamp(col("session_window.start")).as("s_start"),
        unix_timestamp(col("session_window.end")).as("s_end"),
        col("volume"), col("n"))
      .orderBy("contract_address", "s_start")

  /** Flagship per-token document: the reference stitches 9 single-row metric
    * frames with a reduce-join on monotonically_increasing_id
    * (reference: utils/HandleDataframe.scala:7-14,
    * src/main/scala/etl/EnhanceTokenEnricher.scala:54-66 — an anti-pattern,
    * SURVEY.md §4.1). Here the whole document is ONE multi-aggregate pass over
    * the fact table: no joins, no driver loop, one shuffle keyed by token. */
  def tokenDocument(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    t.select(
        col("contract_address"), col("value"), col("transact_at"),
        col("from_address"), col("to_address"), col("block_number"))
      .groupBy("contract_address")
      .agg(
        count(lit(1)).as("n_transfers"),
        dsum(col("value")).as("total_volume"),
        countDistinct(col("from_address")).as("unique_senders"),
        countDistinct(col("to_address")).as("unique_receivers"),
        min(col("transact_at")).as("first_ts"),
        max(col("transact_at")).as("last_ts"),
        min(col("block_number")).as("min_block"),
        max(col("block_number")).as("max_block"),
        countDistinct(dayBucket(col("transact_at"))).as("active_days"))
      .withColumn("avg_tx_per_day",
        col("n_transfers").cast("double") / col("active_days").cast("double"))
      .orderBy("contract_address")
  }

  /** CUSUM flag threshold: flag hours where the cumulative count deviates
    * from the uniform-rate line by more than 1/[[CusumDenom]] of the
    * series' total mass. */
  val CusumDenom = 10

  /** CUSUM-style drift detection on the hourly transaction-count series:
    * the V-mask statistic `D_t = Σ_{i≤t}(x_i − μ)` — how far the
    * cumulative count has drifted from the uniform-rate line — flags
    * regime changes a pointwise z-score ([[volumeAnomalies]]) cannot see
    * (many small same-direction deviations). Scaled by n to stay in exact
    * BIGINTs: `dev = n·C_t − t·S` (μ = S/n), flagged when
    * `CusumDenom·|dev| > n·S`, i.e. |D_t| > S/CusumDenom. Pure integer
    * arithmetic end-to-end — no float ever.
    *
    * One (token, hour) aggregation, one token-keyed window pass (series
    * length per token is time-bounded — no growth with data volume), one
    * token-keyed totals join. */
  def cusumDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address").as("token"),
        hourBucket(col("transact_at")).as("t"))
      .agg(count(lit(1)).as("x"))
    val tot = hourly.groupBy("token")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val w = Window.partitionBy("token").orderBy("t")
    hourly.join(tot, Seq("token"))
      .withColumn("cum",
        sum(col("x")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("idx", row_number().over(w))
      .withColumn("dev", col("n") * col("cum") - col("idx") * col("s"))
      .select(col("token"), col("t"), col("x"), col("dev"),
        (abs(col("dev")) * CusumDenom > col("n") * col("s")).as("drift"))
      .orderBy("token", "t")
  }

  /** Backtest of the naive seasonal forecaster: train on the first 4/5 of
    * the hour range (integer cutoff arithmetic — no float split), predict
    * each holdout hour with the train-period (token, hour-of-day) mean
    * (global token train mean where the hod was never seen), and score
    * per-token MAE against the do-nothing baseline (predict the train
    * mean everywhere) — the "is seasonality real signal here" check every
    * forecasting pipeline runs before shipping a model. `mae <
    * base_mae` ⇒ the daily profile carries information for that token.
    *
    * Sums are decimal-exact; each mean is one IEEE division; the error
    * aggregation averages doubles through the decimal accumulator and
    * renders at 9 digits (cast-ulp mitigation). One (token, hour)
    * aggregation + two broadcast-sized profile joins. */
  def seasonalBacktest(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address").as("token"),
        hourBucket(col("transact_at")).as("t"))
      .agg(dsumDec(col("value")).as("vol"))
      .withColumn("hod", expr("CAST((t % 86400) DIV 3600 AS INT)"))
    val rng = hourly.agg(min("t").as("tmin"), max("t").as("tmax"))
    val cut = hourly.crossJoin(broadcast(rng))
      .withColumn("cutoff",
        expr("tmin + CAST((tmax - tmin) * 4 DIV 5 AS BIGINT)"))
    val train = cut.filter(col("t") < col("cutoff"))
    val test = cut.filter(col("t") >= col("cutoff"))
    val prof = train.groupBy("token", "hod")
      .agg((sum(col("vol")).cast("double") / count(lit(1)).cast("double"))
        .as("sf"))
    val gmean = train.groupBy("token")
      .agg((sum(col("vol")).cast("double") / count(lit(1)).cast("double"))
        .as("gm"), count(lit(1)).as("n_train"))
    // profile frames are (tokens × 24) and (tokens) — summary-sized but
    // token-proportional, so no broadcast hint: AQE picks broadcast while
    // they fit and falls back to a keyed join when the universe grows
    test
      .join(prof, Seq("token", "hod"), "left")
      .join(gmean, Seq("token"))
      .withColumn("forecast", coalesce(col("sf"), col("gm")))
      .withColumn("err", abs(col("vol").cast("double") - col("forecast")))
      .withColumn("base_err", abs(col("vol").cast("double") - col("gm")))
      .groupBy("token")
      .agg(max(col("n_train")).as("n_train"), count(lit(1)).as("n_test"),
        round(expr("CAST(SUM(CAST(err AS DECIMAL(38,18))) AS DOUBLE)") /
          count(lit(1)).cast("double"), 9).as("mae"),
        round(expr("CAST(SUM(CAST(base_err AS DECIMAL(38,18))) AS DOUBLE)") /
          count(lit(1)).cast("double"), 9).as("base_mae"))
      .orderBy("token")
  }

  /** Burst intervals: each token's top-decile |deviation| hours
    * ([[cusumDrift]]'s statistic, thresholded RELATIVELY — the exact p90
    * order statistic of the |dev| distribution, so bursts exist whenever
    * the series is not perfectly flat, unlike the absolute S/10 flag
    * which a well-behaved stream never trips) merged into (start, end)
    * episodes — the gaps-and-islands pass that turns per-hour flags into
    * reportable incidents. Island key is the classic `hour_index −
    * row_number` difference (constant within a consecutive run, pure
    * integer); the threshold is rank-selected from the per-token
    * DISTRIBUTION, no float percentile anywhere. */
  def burstIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val devs = cusumDrift(spark, sfDir)
      .select(col("token"), col("t"), abs(col("dev")).as("a"))
    val dist = devs.groupBy("token", "a").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("token").orderBy(col("a").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = dist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("token")))
      .filter(col("cum") * 10 >= col("n") * 9)
      .groupBy("token").agg(min(col("a")).as("thr"))
    devs.join(thr, Seq("token"))
      .filter(col("a") >= col("thr") && col("a") > 0)
      .withColumn("island",
        expr("t DIV 3600") - row_number().over(
          Window.partitionBy("token").orderBy("t")))
      .groupBy("token", "island")
      .agg(min("t").as("burst_start"), max("t").as("burst_end"),
        count(lit(1)).as("n_hours"), max(col("a")).as("peak_dev"))
      .select(col("token"), col("burst_start"), col("burst_end"),
        col("n_hours"), col("peak_dev"))
      .orderBy("token", "burst_start")
  }

  /** Hourly market share: each token's fraction of the hour's total
    * volume — share-of-total, the one-window OLAP classic. Both sums are
    * exact decimal; the share is one IEEE division of their double
    * renders, bit-stable without rounding. */
  def hourlyMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address").as("token"),
        hourBucket(col("transact_at")).as("t"))
      .agg(dsumDec(col("value")).as("vol"))
      .withColumn("share",
        col("vol").cast("double") /
          sum(col("vol")).over(Window.partitionBy("t")).cast("double"))
      .select(col("token"), col("t"), col("vol").cast("double").as("volume"),
        col("share"))
      .orderBy("token", "t")
  }

  /** Half-width (seconds) of the centered trend window in
    * [[seasonalDecompose]] — ±12 hours. */
  val TrendHalfWidthSec = 43200L

  /** Classical seasonal decomposition of the hourly volume series:
    * `volume = trend + seasonal + residual`, where trend is a centered
    * ±12 h moving average (RANGE frame on the hour key — correct with
    * GAPS in the series, where a row-count frame silently widens), and
    * seasonal is the per-(token, hour-of-day) mean — the load profile.
    * The monitoring decomposition behind "is this hour's volume actually
    * anomalous, or is it just 3 am": [[volumeAnomalies]] z-scores the raw
    * series; this one removes the daily rhythm first.
    *
    * Determinism: the hourly sums and every window/group sum are exact
    * DECIMAL; trend and seasonal are each ONE IEEE division of exactly-
    * represented operands, and the residual subtracts those bit-stable
    * doubles — so no rendering round-off is needed anywhere. Shuffles:
    * the (token, hour) aggregation, one window exchange keyed by token
    * (series length per token is time-bounded, not data-bounded — no
    * skew growth at scale), one tiny (token, 24) seasonal join back. */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address").as("token"),
        hourBucket(col("transact_at")).as("t"))
      .agg(dsumDec(col("value")).as("vol"))
    val w = Window.partitionBy("token").orderBy(col("t"))
      .rangeBetween(-TrendHalfWidthSec, TrendHalfWidthSec)
    // seasonal as a WINDOW over the same hourly frame (not a groupBy +
    // join back): the hourly subtree is scanned once, not twice — at
    // scale the second scan is a full recompute, not a cache hit
    val ws = Window.partitionBy(col("token"),
      expr("CAST((t % 86400) DIV 3600 AS INT)"))
    hourly
      .withColumn("trend",
        sum(col("vol")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double"))
      .withColumn("seasonal",
        sum(col("vol")).over(ws).cast("double") /
          count(lit(1)).over(ws).cast("double"))
      .select(col("token"), col("t"), col("vol").cast("double").as("volume"),
        col("trend"), col("seasonal"),
        (col("vol").cast("double") - col("trend") - col("seasonal"))
          .as("residual"))
      .orderBy("token", "t")
  }

  /** Per-token wallet-volume concentration: Gini coefficient, Herfindahl
    * index, and the top-10-wallet share — the whale-concentration readout
    * a token analytics product publishes. Sender volumes become exact
    * integer CENTS (decimal sum × 100), so the Gini/HHI moments
    * `Σi·xᵢ, Σxᵢ², Σxᵢ` are exact integers in DECIMAL(38,0) and the only
    * floats are the two final divisions; the top-10 share is pure integer
    * per-mille. The rank window PARTITIONS BY TOKEN — per-token sorts run
    * in parallel, no global single-partition sort at any scale. */
  def walletConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy("contract_address")
    val cents = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"), col("from_address").as("wallet"))
      .agg((dsumDec(col("value")) * 100).cast("long").as("cents"))
    val ranked = cents
      .withColumn("i", row_number().over(
        w.orderBy(col("cents").asc, col("wallet").asc)).cast("long"))
      .withColumn("cnt", count(lit(1)).over(w))
    ranked.groupBy("contract_address")
      .agg(count(lit(1)).as("n_wallets"),
        sum(col("cents")).as("s"),
        sum(col("i").cast(dec) * col("cents").cast(dec)).as("si"),
        sum(col("cents").cast(dec) * col("cents").cast(dec)).as("sq"),
        sum(when(col("i") > col("cnt") - 10, col("cents"))
          .otherwise(lit(0L))).as("t10"))
      .select(col("contract_address"), col("n_wallets"),
        when(col("s") === 0, lit(null).cast("double")).otherwise(
          round((lit(2).cast(dec) * col("si")
            - (col("n_wallets") + 1).cast(dec) * col("s").cast(dec))
            .cast("double")
            / (col("n_wallets").cast("double") * col("s").cast("double")), 6))
          .as("gini"),
        when(col("s") === 0, lit(null).cast("double")).otherwise(
          round(col("sq").cast("double")
            / (col("s").cast("double") * col("s").cast("double")), 6))
          .as("hhi"),
        when(col("s") === 0, lit(null).cast("long"))
          .otherwise(expr("t10 * 1000 div s")).as("top10_pml"))
      .orderBy("contract_address")
  }

  /** Cumulative-distinct adoption curve: per (token, day), wallets seen
    * for the FIRST time that day and the running total — the
    * cumulative-distinct-count problem solved the scalable way (distinct
    * first-seen dates once, then a cumulative sum over per-day NEW
    * counts; a naive `count(distinct) over (order by day)` re-scans the
    * whole history per day). The cumsum window runs over per-token DAY
    * rows (≤ days-of-history each), never over transfers. */
  def walletAdoption(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.transfers(spark, sfDir)
    val acts = t.select(col("contract_address"),
        col("from_address").as("wallet"),
        Num.dayBucket(col("transact_at")).cast("long").as("d"))
      .unionByName(t.select(col("contract_address"),
        col("to_address").as("wallet"),
        Num.dayBucket(col("transact_at")).cast("long").as("d")))
    val firstSeen = acts.groupBy("contract_address", "wallet")
      .agg(min(col("d")).as("d"))
    val daily = firstSeen.groupBy("contract_address", "d")
      .agg(count(lit(1)).as("n_new"))
    daily.withColumn("cum_wallets",
        sum(col("n_new")).over(Window.partitionBy("contract_address")
          .orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("contract_address", "d")
  }

  /** MAD outlier multiplier in [[madOutliers]]. */
  val MadK = 3L

  /** Robust outlier summary per token: the median / MAD twin of
    * q_volume_anomalies' z-scores (median-based stats ignore the outliers
    * they hunt — the robust-statistics doctrine). Hourly volume in exact
    * integer cents; "median" is the LOWER median (the ⌈n/2⌉-th smallest
    * counting duplicates — an order statistic both engines state
    * identically, no interpolation), MAD the lower median of |x − med|,
    * outliers the hours with |x − med| > [[MadK]]·MAD. The rank windows
    * partition by token over HOURLY rows (≤ hours-per-month each), never
    * over transfers. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("contract_address")
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.withColumn("rn",
          row_number().over(w.orderBy(col(valueCol).asc, col("t").asc)))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("contract_address"), col(valueCol).as(out), col("n"))
    val med = lowerMedian(hourly, "cents", "med")
    val dev = hourly.join(med.select("contract_address", "med"),
        Seq("contract_address"))
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = lowerMedian(dev, "dev", "mad").select("contract_address", "mad")
    dev.join(mad, Seq("contract_address"))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n_hours"),
        min(col("med")).as("median_cents"),
        min(col("mad")).as("mad_cents"),
        sum(when(col("dev") > lit(MadK) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("contract_address")
  }

  /** Autocorrelation lags computed by [[volumeAcf]]. */
  val AcfMaxLag = 3

  /** Per-token autocorrelation of the DENSIFIED hourly volume series at
    * lags 1..[[AcfMaxLag]] — the seasonality detector feeding forecast
    * model choice (a strong lag-24 ACF says "daily cycle"; here small lags
    * on the hourly grid).
    *
    * Missing hours are true zeros (per-token `sequence()` grid explode — the
    * same scale-safe densification as the balance grid, no crossJoin).
    * ACF is ρ(k) = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², computed in exact
    * integer cents scaled by n (ρ = Σ(n·x_t−S)(n·x_{t+k}−S) /
    * Σ(n·x_t−S)² — multiplying both sides by n² clears the rational mean)
    * in DECIMAL(38,0); the single final division is the only float. The
    * lag pairing is a `lead` window per token over the dense grid — one
    * hash exchange shared by all lags. */
  def volumeAcf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val span = hourly.groupBy("contract_address")
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val grid = span
      .select(col("contract_address"),
        explode(expr("sequence(t0, t1, 3600)")).as("t"))
      .join(hourly, Seq("contract_address", "t"), "left")
      .select(col("contract_address"), col("t"),
        coalesce(col("cents"), lit(0L)).as("x"))
    val stats = grid.groupBy("contract_address")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val w = Window.partitionBy("contract_address").orderBy("t")
    val centered = grid.join(broadcast(stats), Seq("contract_address"))
      .withColumn("c", col("n").cast(dec) * col("x").cast(dec)
        - col("s").cast(dec))
    val leads = (1 to AcfMaxLag).foldLeft(centered) { (df, k) =>
      df.withColumn(s"c$k", lead(col("c"), k).over(w))
    }
    val aggCols = Seq(min(col("n")).as("n"),
      sum(col("c") * col("c")).as("den")) ++
      (1 to AcfMaxLag).map(k =>
        sum(col("c") * col(s"c$k")).as(s"num$k"))
    val mom = leads.groupBy("contract_address")
      .agg(aggCols.head, aggCols.tail: _*)
    val lagCols = (1 to AcfMaxLag).map(k =>
      struct(lit(k.toLong).as("lag"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(col(s"num$k").cast("double")
            / col("den").cast("double"), 6)).as("acf")))
    mom.select(col("contract_address"), col("n"),
        explode(array(lagCols: _*)).as("a"))
      .select(col("contract_address"), col("a.lag").as("lag"), col("n"),
        col("a.acf").as("acf"))
      .orderBy("contract_address", "lag")
  }

  /** Pairwise Pearson cross-correlation of token hourly-volume series over
    * the pair's overlapping hours (each token's series densified to its own
    * span with zero fill, then inner-joined on the hour — the intersection
    * grid). The co-movement screen behind correlated-token risk and
    * lead-lag dashboards.
    *
    * Exactness: volumes become integer cents; all five moments are exact
    * DECIMAL(38,0) sums (magnitudes ≤ ~1e22 — far inside 38 digits); the
    * only floats are the final cast, one multiply, one `sqrt`, one divide,
    * one `round` — each a single correctly-rounded IEEE op DuckDB
    * reproduces. Token count is tiny, so the pair expansion is a
    * hour-keyed equi-join of small aggregated frames — the fact table is
    * touched once. */
  def volumeCrossCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val span = hourly.groupBy("contract_address")
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val grid = span
      .select(col("contract_address"),
        explode(expr("sequence(t0, t1, 3600)")).as("t"))
      .join(hourly, Seq("contract_address", "t"), "left")
      .select(col("contract_address"), col("t"),
        coalesce(col("cents"), lit(0L)).as("x"))
    val a = grid.select(col("contract_address").as("tok_a"), col("t"),
      col("x"))
    val b = grid.select(col("contract_address").as("tok_b"), col("t"),
      col("x").as("y"))
    val mom = a.join(b, Seq("t"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
    mom
      .withColumn("num", col("n").cast(dec) * col("sxy")
        - col("sx") * col("sy"))
      .withColumn("d1", col("n").cast(dec) * col("sxx")
        - col("sx") * col("sx"))
      .withColumn("d2", col("n").cast(dec) * col("syy")
        - col("sy") * col("sy"))
      .select(col("tok_a"), col("tok_b"), col("n"),
        when(col("d1") === 0 || col("d2") === 0, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double")
            / sqrt(col("d1").cast("double") * col("d2").cast("double")), 6))
          .as("corr"))
      .orderBy("tok_a", "tok_b")
  }

  /** Event-time disorder profile: per token, how late events arrive
    * relative to the running event-time high-water mark in ingest
    * (block-number) order — out-of-order count, max lateness, and the
    * EXACT p95 lateness as the ⌈19n/20⌉-th order statistic. This is the
    * measurement that sizes `withWatermark` for the streaming twins: a
    * watermark below the observed p95 drops real data, far above it holds
    * state for nothing.
    *
    * Two windows, both partitioned by token (running max in ingest order,
    * rank in lateness order) — each sorts one token's rows, never the
    * global stream; integer seconds end to end. */
  def latenessProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIngest = Window.partitionBy("contract_address")
      .orderBy("block_number")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = Tables.transfers(spark, sfDir)
      .select(col("contract_address"), col("block_number"),
        col("transact_at"))
      .withColumn("late",
        max(col("transact_at")).over(byIngest) - col("transact_at"))
    val byLate = Window.partitionBy("contract_address")
      .orderBy(col("late"), col("block_number"))
    late
      .withColumn("rnk", row_number().over(byLate))
      .withColumn("n_tok",
        count(lit(1)).over(Window.partitionBy("contract_address")))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        max(col("late")).as("max_lateness_sec"),
        max(when(col("rnk") === expr("(19 * n_tok + 19) div 20"),
          col("late"))).as("p95_lateness_sec"))
      .orderBy("contract_address")
  }

  /** Candidate watermark delays (seconds) [[watermarkTuning]] prices. */
  val WatermarkDelays: Seq[Long] = Seq(60L, 600L, 3600L)

  /** Watermark-delay tuning certificate: for each candidate
    * `withWatermark` delay, how many events the streaming engine would
    * DROP (event time older than the high-water mark minus the delay at
    * arrival) — the number that turns [[latenessProfile]]'s measurement
    * into the actual sizing decision, next to the completeness/latency
    * trade it implies. Spark's watermark is GLOBAL (max event time seen
    * across the stream), so the running high-water mark here is global
    * too — computed with the house two-phase pattern (monotone 256-way
    * block-range bucket, per-bucket max, 256-row prefix-max broadcast
    * back, within-bucket running max), never an unpartitioned
    * data-sized ordering window. Ingest order is block order, as in
    * [[latenessProfile]]. */
  def watermarkTuning(spark: SparkSession, sfDir: String): DataFrame =
    watermarkTuningOf(spark,
      Tables.transfers(spark, sfDir)
        .select(col("block_number").as("b"), col("transact_at").as("ts")))

  /** [[watermarkTuning]]'s core over any `(b ingest-order key, ts event
    * seconds)` frame — split out so the spec can drive a genuinely
    * out-of-order stream (the driver's synthetic feed arrives perfectly
    * ordered, which makes the catalog row's truthful answer "drop
    * nothing at any delay"). */
  def watermarkTuningOf(spark: SparkSession, ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val bounds = ev.agg(min("b").as("bmn"), max("b").as("bmx"))
    val keyed = ev.crossJoin(broadcast(bounds))
      .withColumn("bkt", expr(
        "least((b - bmn) * 256 div greatest(bmx - bmn + 1, 1), 255)"))
    val prefix = keyed.groupBy("bkt").agg(max("ts").as("mx"))
      .withColumn("prev_mx", max("mx").over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select("bkt", "prev_mx")
    val late = keyed.join(broadcast(prefix), Seq("bkt"))
      .withColumn("hwm", greatest(coalesce(col("prev_mx"), col("ts")),
        max(col("ts")).over(Window.partitionBy("bkt").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("late", col("hwm") - col("ts"))
    late.crossJoin(broadcast(WatermarkDelays.toDF("delay_sec")))
      .groupBy("delay_sec")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        sum(when(col("late") > col("delay_sec"), 1L).otherwise(0L))
          .as("n_dropped"),
        expr("SUM(CASE WHEN late > delay_sec THEN 1 ELSE 0 END)" +
          " * 1000000 div COUNT(*)").as("dropped_ppm"))
      .orderBy("delay_sec")
  }

  /** Peak-to-average hourly-volume ratio per token, in exact ppm:
    * `max_hourly · n_hours · 10⁶ div total` (the average never becomes a
    * float — the ratio is one integer division over exact cents moments).
    * The burstiness scalar capacity planning reads first: PAR ≈ 1e6 means
    * flat load, high PAR means provision for spikes. */
  def peakToAverage(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n_hours"), max(col("cents")).as("peak_cents"),
        sum(col("cents")).as("total_cents"))
      .withColumn("par_ppm", expr(
        "CAST(CAST(peak_cents AS DECIMAL(38,0)) * n_hours * 1000000" +
          " div CAST(total_cents AS DECIMAL(38,0)) AS BIGINT)"))
      .orderBy("contract_address")

  /** Per-token OLS trend of hourly volume: slope, intercept and R² of the
    * least-squares line cents ~ hour_index, the closed-form regression
    * every capacity forecast and "is this token growing" readout starts
    * from. x is the hour offset from the token's own first active hour
    * (a broadcast join against the token-sized min frame), so intercepts
    * are anchored at launch, not at 1970.
    *
    * The five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
    * in DECIMAL(38,0) — map-side combinable, order-independent, exact —
    * and the outputs are integer renderings of the exact rationals:
    * slope·10⁶ and intercept·10⁶ as micro-cents (signed division spelled
    * sign·(|num| div den) because Spark `div` truncates while DuckDB `//`
    * floors), and R²·10⁶ via the staged ((|num|·10⁶ div den)·|num|) div
    * denY — staging keeps every intermediate under 38 digits where the
    * algebraic num²·10⁶ would overflow; both engines run the identical
    * truncation chain. Tokens need ≥2 active hours (den>0 follows: x is
    * distinct per hour); constant-volume tokens render R² as NULL rather
    * than 0/0. */
  def olsTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val t0 = hourly.groupBy("contract_address")
      .agg(min(col("t")).as("t0"))
    hourly.join(broadcast(t0), Seq("contract_address"))
      .select(col("contract_address"),
        expr("(t - t0) div 3600").as("x"), col("cents").as("y"))
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .filter(col("n") >= 2)
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("deny", expr("n * syy - sy * sy"))
      .select(col("contract_address"), col("n").as("n_hours"),
        expr("CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 div den)" +
          " ELSE num * 1000000 div den END AS BIGINT)")
          .as("slope_microcents"),
        expr("CAST(CASE WHEN sy * den - num * sx < 0 THEN" +
          " -((-(sy * den - num * sx)) * 1000000 div (n * den))" +
          " ELSE (sy * den - num * sx) * 1000000 div (n * den) END" +
          " AS BIGINT)").as("icept_microcents"),
        expr("CAST(CASE WHEN deny = 0 THEN NULL ELSE" +
          " ((abs(num) * 1000000 div den) * abs(num)) div deny END" +
          " AS BIGINT)").as("r2_ppm"))
      .orderBy("contract_address")
  }

  /** Longest consecutive-day activity streak per wallet, rolled into a
    * streak-length distribution — the engagement/habit metric behind
    * daily-quest products and sybil screens (farmed wallets streak in
    * lockstep). Islands via the classic `day_index − row_number` grouping
    * key on the per-wallet day list: windows touch only the collapsed
    * (wallet, day) incidence, never raw events. */
  def activityStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.transfers(spark, sfDir)
    val dw = t.select(col("from_address").as("wallet"),
        (Num.dayBucket(col("transact_at")) / 86400).cast("long").as("d"))
      .unionByName(t.select(col("to_address").as("wallet"),
        (Num.dayBucket(col("transact_at")) / 86400).cast("long").as("d")))
      .distinct()
    val w = Window.partitionBy("wallet").orderBy("d")
    dw.withColumn("grp", col("d") - row_number().over(w))
      .groupBy("wallet", "grp").agg(count(lit(1)).as("len"))
      .groupBy("wallet").agg(max(col("len")).as("longest"))
      .groupBy("longest").agg(count(lit(1)).as("n_wallets"))
      .orderBy("longest")
  }

  /** MAD multiplier for [[seasonalOutliers]]. */
  val SeasonalMadK = 3

  /** Seasonal-residual outliers: hours whose decomposition residual
    * ([[seasonalDecompose]]) deviates from the token's median residual by
    * more than [[SeasonalMadK]]× the MAD — the detector that catches
    * "high for a Tuesday 3am" anomalies a raw z-score on volume misses
    * (the seasonal component absorbs the daily shape first). Median and
    * MAD are exact lower-median order statistics rank-selected from the
    * per-token residual DISTRIBUTION (the residual doubles are already
    * bit-identical in both engines, so selection and comparison are too).
    * Composes two hash-verified operators; windows touch hourly rows
    * only. */
  def seasonalOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lowerMedian(df: DataFrame, c: String, out: String): DataFrame = {
      val cum = df.groupBy("token", c).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy("token").orderBy(c)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy("token")))
      cum.filter(col("cum") * 2 >= col("n"))
        .groupBy("token").agg(min(col(c)).as(out))
    }
    val res = seasonalDecompose(spark, sfDir)
      .select(col("token"), col("t"), col("residual"))
    val med = lowerMedian(res, "residual", "med")
    val ad = res.join(med, Seq("token"))
      .withColumn("adev", abs(col("residual") - col("med")))
    val mad = lowerMedian(ad, "adev", "mad")
    ad.join(mad, Seq("token"))
      .filter(col("adev") > lit(SeasonalMadK) * col("mad"))
      .select(col("token"), col("t"), col("residual"), col("med"),
        col("mad"))
      .orderBy("token", "t")
  }

  /** Behavioral diversity per wallet: Gini impurity of the sender's
    * event-type mix, `1 − Σ pᵢ²`, in exact ppm — the log-free entropy
    * substitute (`(n² − Σcᵢ²)·10⁶ div n²` is pure integer arithmetic
    * where Shannon entropy needs libm log). Near-zero impurity marks
    * single-purpose wallets (bots, vaults); high impurity marks organic
    * mixed usage. Two map-side-combinable aggregates. */
  def walletDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    Tables.transfers(spark, sfDir)
      .groupBy(col("from_address").as("wallet"),
        col("contract_address").as("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy("wallet")
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast(dec) * col("c")).as("ss"))
      .select(col("wallet"), col("n_events"), col("n_types"),
        expr("CAST((CAST(n_events AS DECIMAL(38,0)) * n_events - ss)" +
          " * 1000000 div (CAST(n_events AS DECIMAL(38,0)) * n_events)" +
          " AS BIGINT)").as("impurity_ppm"))
      .orderBy("wallet")
  }

  /** Week-over-week volume growth per token: weekly cents totals and the
    * relative change vs the previous ISO-agnostic 7-day bucket, in exact
    * integer ppm (first week reports NULL — no fake 0%). The standard
    * growth-accounting rollup; one aggregate + one lag window over weekly
    * rows only. */
  def wowGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        (floor(col("transact_at") / 604800) * 604800).cast("long").as("week"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("contract_address").orderBy("week")
    weekly
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      // sign+abs spelling: Spark's `div` truncates toward zero, DuckDB's
      // `//` floors — keeping the dividend non-negative makes them agree
      // diff·1e6 exceeds 2^63 once a token moves ≥ ~$92B of cents in a
      // week — DECIMAL(38,0) keeps the ppm exact instead of wrapping
      .withColumn("growth_ppm", expr(
        """CASE WHEN prev_cents IS NULL OR prev_cents = 0
          |       THEN CAST(NULL AS BIGINT)
          |     WHEN cents >= prev_cents
          |       THEN CAST(CAST(cents - prev_cents AS DECIMAL(38,0))
          |            * 1000000 div prev_cents AS BIGINT)
          |     ELSE -CAST(CAST(prev_cents - cents AS DECIMAL(38,0))
          |            * 1000000 div prev_cents AS BIGINT)
          |END""".stripMargin))
      .orderBy("contract_address", "week")
  }

  /** Per-token top largest transfers kept by the bench. */
  val LargestK = 5

  /** The [[LargestK]] largest transfers per token through the bounded
    * [[graft.functions.TopKAggregator]] — the grouped-top-k spelling that
    * partial-aggregates every partition to ≤k rows BEFORE the shuffle
    * (k·partitions rows move; the row_number window would sort the whole
    * fact table per token). Ties break by block number, identically in the
    * oracle's window. */
  def largestTransfers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val agg = new TopKAggregator(LargestK).toColumn
    Tables.transfers(spark, sfDir)
      .select(col("contract_address"), col("block_number"), col("value"))
      .as[(String, Long, Double)]
      .map { case (tok, blk, v) => (tok, Scored(blk, v)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .toDF("contract_address", "top")
      .select(col("contract_address"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("contract_address"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as("block_number"), col("s.score").as("value"))
      .orderBy("contract_address", "rnk")
  }
}

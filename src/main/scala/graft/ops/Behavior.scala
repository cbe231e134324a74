package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnels and cohort retention —
  * the user-journey counterparts of the reference's per-wallet aggregates
  * (reference: src/main/scala/etl/WalletEnricher.scala computes per-entity
  * stats; these compute cross-event SEQUENCE stats the reference cannot
  * express without driver loops).
  *
  * Both operators are one shuffle on `user_id` for the per-user pass:
  * the funnel's three stage timestamps are stacked window minima over the
  * same partition spec (one exchange + one sort, reused by all three),
  * and retention's first-seen timestamp is the same single-partition-key
  * window. Event timestamps compare at full nanosecond precision (the
  * raw parquet int64), so "strictly after" is exact — no truncation ties.
  */
object Behavior {

  /** Ordered conversion funnel: signup → view → purchase, strictly
    * time-increasing within each user. Step k's timestamp is the earliest
    * event of that type AFTER the user's step-(k-1) timestamp — the
    * standard "unbounded window" funnel semantic. Returns one row per
    * reached stage: (stage 0-3, n_users), where stage is the deepest step
    * completed in order. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "purchase")

  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelOf(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").as("t")))

  /** [[funnel]] over any (user_id, event_type, t) frame. */
  def funnelOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    // t1/t2/t3 must stack (each references the previous), so they are
    // separate projections — same window spec, one exchange + sort
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === FunnelSteps(0), col("t"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === FunnelSteps(1) && col("t") > col("t1"),
          col("t"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === FunnelSteps(2) && col("t") > col("t2"),
          col("t"))).over(w))
    staged
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .select(
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).cast("int").as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** [[funnel]] with a CONVERSION DEADLINE: each step must follow the
    * previous one within [[FunnelDeadlineNs]] (1 hour) — the "purchase
    * within an hour of viewing" product question. Identical one-exchange
    * shape; the deadline is two extra comparisons inside the window
    * conditions. On data where the unbounded funnel saturates (every
    * dense user eventually does everything), the deadline is what makes
    * stages informative. */
  val FunnelDeadlineNs: Long = 3600L * 1000000000L

  def funnelWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").as("t"))
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === FunnelSteps(0), col("t"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === FunnelSteps(1) && col("t") > col("t1")
          && col("t") <= col("t1") + FunnelDeadlineNs, col("t"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === FunnelSteps(2) && col("t") > col("t2")
          && col("t") <= col("t2") + FunnelDeadlineNs, col("t"))).over(w))
    staged
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .select(
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).cast("int").as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** Event-transition matrix (first-order Markov counts): for each user's
    * time-ordered event sequence, count (event → next event) pairs across
    * the whole population. One window pass (partition user, order by time
    * with the unique event id as tie-break — a total order, so `lead` is
    * deterministic) + one map-side-combinable count aggregation. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("t"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Sequence-model training pairs: the (3-event context → next event)
    * frequency table over per-user event streams — the dataset a
    * next-event-prediction model trains on, and the order-3 extension of
    * [[eventTransitions]]'s order-1 matrix. One window pass (three stacked
    * lags over the SAME partition spec — one exchange + one sort), then a
    * map-side-combinable count; output cardinality is bounded by
    * |event types|⁴, not events. Ordering ties at equal timestamps break
    * by event_id, full nanosecond precision — deterministic at any
    * partitioning. */
  def nextEventPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("t"))
      .withColumn("p1", lag("event_type", 1).over(w))
      .withColumn("p2", lag("event_type", 2).over(w))
      .withColumn("p3", lag("event_type", 3).over(w))
      .filter(col("p3").isNotNull)
      .groupBy(concat_ws(" ", col("p3"), col("p2"), col("p1")).as("context"),
        col("event_type").as("next_event"))
      .agg(count(lit(1)).as("n"))
      .orderBy("context", "next_event")
  }

  /** The conversion event type [[attribution]] credits. */
  val ConversionType = "purchase"

  /** Last-touch attribution: each conversion (purchase) event credited to
    * the user's most recent PRECEDING non-conversion event — the classic
    * marketing-attribution join, expressed as one `last(..., ignoreNulls)`
    * window over the per-user stream (no self-join, no as-of join against
    * a second pass over the same table). Conversions with no prior touch
    * attribute to `direct` with NULL timestamps. Ordering is (event time,
    * event id) — a total order, so the window is deterministic at any
    * partitioning. One exchange on user_id; state per row is O(1). */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("t"))
      .withColumn("att_type",
        last(when(col("event_type") =!= ConversionType, col("event_type")),
          ignoreNulls = true).over(w))
      .withColumn("att_t",
        last(when(col("event_type") =!= ConversionType, col("t")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === ConversionType)
      // emitted times truncate to MICROseconds: the oracle engine reads
      // the nanos-typed parquet timestamps at micro precision, so micros
      // are the finest unit both engines agree on bit-for-bit (ordering
      // above still uses full nanos)
      .select(col("user_id"), col("event_id"),
        expr("t div 1000").as("conv_t"),
        coalesce(col("att_type"), lit("direct")).as("attributed_type"),
        expr("att_t div 1000").as("attributed_t"),
        expr("t div 1000 - att_t div 1000").as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** Touches credited per conversion in [[attributionLinear]]. */
  val LinearTouchK = 5

  /** Linear (multi-touch) attribution over the last [[LinearTouchK]]
    * touches before each conversion — the fair-share sibling of
    * [[attribution]]'s last-touch. Credit is EXACT integer ppm with
    * largest-remainder distribution (base = 1000000 div n per touch, the
    * first `1000000 mod n` touches in time order get +1), so every
    * conversion's credit sums to exactly 1,000,000 — conservation a float
    * 1/n split can't give. The conversion×touch join keys on user_id and
    * the rank filter caps credited touches at K; fan-out is bounded by
    * per-user activity, the usual clickstream contract. */
  def attributionLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("t"))
    val conv = ev.filter(col("event_type") === ConversionType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("t").as("conv_t"))
    val touch = ev.filter(col("event_type") =!= ConversionType)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("t").as("touch_t"))
    val w = Window.partitionBy("conv_id")
    val ranked = conv.join(touch, Seq("user_id"))
      .filter(col("touch_t") < col("conv_t") ||
        (col("touch_t") === col("conv_t") && col("touch_id") < col("conv_id")))
      .withColumn("rdesc", row_number().over(
        w.orderBy(col("touch_t").desc, col("touch_id").desc)))
      .filter(col("rdesc") <= LinearTouchK)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rasc", row_number().over(
        w.orderBy(col("touch_t").asc, col("touch_id").asc)))
      .withColumn("credit_ppm",
        expr("1000000 div n") +
          when(col("rasc") <= expr("1000000 % n"), 1L).otherwise(0L))
    ranked.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum(col("credit_ppm")).as("credit_ppm"))
      .orderBy("channel")
  }

  /** Weekly cohort retention: users grouped by the epoch-week of their
    * first event; n_users counts distinct cohort members active in each
    * subsequent week (offset 0 = the cohort week itself). The classic
    * retention triangle, computed in two aggregations: first-seen via a
    * per-user window, then a distinct count per (cohort_week, offset). */
  val WeekSecs = 604800L

  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOf(Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_sec")))

  /** [[cohortRetention]] over any (user_id, ts_sec) frame. */
  def cohortRetentionOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    ev
      .withColumn("first_sec", min("ts_sec").over(w))
      .select(
        expr(s"(first_sec div $WeekSecs) * $WeekSecs").as("cohort_week"),
        expr(s"CAST(ts_sec div $WeekSecs - first_sec div $WeekSecs AS INT)")
          .as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** A/B experiment readout: users deterministically assigned to arms by
    * id-hash parity (the assignment any experimentation platform derives
    * from a stable unit id — md5 parity here, NOT `user_id % 2`, whose
    * correlation with enrollment order would bias real data), conversion
    * = "ever purchased after first view", per-arm exact counts and one
    * IEEE-division rate, plus the absolute rate lift. Statistical
    * significance needs a normal CDF (float libm territory — out of the
    * hash-checked contract); the exact counts let any stats layer
    * compute it downstream.
    *
    * One user-keyed window pass (first-view time + any-later-purchase
    * flag share the exchange) and one 2-row aggregate. */
  def abTestReadout(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("converted",
        max(when(col("event_type") === "purchase" &&
          col("ts") > col("first_view"), 1L).otherwise(0L)).over(w))
      .groupBy("user_id")
      .agg(max("first_view").as("first_view"), max("converted").as("conv"))
      .filter(col("first_view").isNotNull)
      .withColumn("arm",
        when(expr("substr(md5(CAST(user_id AS STRING)), 1, 1)")
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), "A").otherwise("B"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_converted"))
      .withColumn("rate",
        col("n_converted").cast("double") / col("n_users").cast("double"))
    val a = arms.filter(col("arm") === "A")
      .select(col("rate").as("rate_a"))
    arms.crossJoin(broadcast(a))
      .select(col("arm"), col("n_users"), col("n_converted"), col("rate"),
        (col("rate") - col("rate_a")).as("lift_vs_a"))
      .orderBy("arm")
  }

  /** Session gap (seconds) for [[sessionPaths]] — 30 minutes of
    * inactivity closes a session, the classic web-analytics cut. */
  val SessionGapSec = 1800L

  /** Leading events per session kept in the path signature. */
  val PathLen = 3

  /** Session path mining: the most common opening event-type sequences —
    * sessionize each user's stream by [[SessionGapSec]] inactivity gaps
    * (one lag + running flag-sum window), keep each session's first
    * [[PathLen]] events, and count path signatures. The navigational
    * twin of [[nextEventPairs]]: that one learns local transitions, this
    * one surfaces whole entry funnels ("view>click>purchase").
    *
    * ONE exchange keyed by user drives the lag, the session running sum,
    * and the in-session rank (same partition spec); the path assembly
    * sorts ≤[[PathLen]] rows per session inside the row via
    * `array_sort(collect_list)`. Output is bounded by |event types|^len.
    * Total (ts, event_id) ordering makes every step deterministic. */
  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val ranked = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("ts_sec"))
      .withColumn("gap",
        when(col("ts_sec") - lag("ts_sec", 1).over(byUser) > SessionGapSec
          || lag("ts_sec", 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum("gap").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sess")
          .orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("rn") <= PathLen)
    ranked
      .groupBy("user_id", "sess")
      .agg(expr(
        """concat_ws('>', transform(
          |  array_sort(collect_list(struct(rn, event_type))),
          |  s -> s.event_type))""".stripMargin).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
  }

  /** Minimum gap between kept events of one sender — bursts tighter than
    * this collapse to their leading event. */
  val ThrottleSec = 86400L

  /** Leading-edge debounce / rate-limit audit: per (token, sender), events
    * closer than [[ThrottleSec]] to their predecessor form one burst and
    * only the burst leader would be kept; the rollup reports how much a
    * per-sender rate limit would drop. The dedup-adjacent stream hygiene
    * op (alert throttling, notification collapsing, bot-burst discount).
    *
    * Burst = gaps-and-islands over the (token, sender) key: one lag +
    * one running flag-sum on a single per-sender exchange, then two
    * map-side aggregates — the window key space is the huge dimension, so
    * no sort concentrates. */
  def debounce(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("contract_address", "from_address")
      .orderBy("transact_at", "block_number")
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bursts = Tables.transfers(spark, sfDir)
      .select(col("contract_address"), col("from_address"),
        col("transact_at"), col("block_number"))
      .withColumn("prev", lag(col("transact_at"), 1).over(byKey))
      .withColumn("lead",
        col("prev").isNull || col("transact_at") - col("prev") >= ThrottleSec)
      .withColumn("burst",
        sum(when(col("lead"), 1L).otherwise(0L)).over(run))
      .groupBy("contract_address", "from_address", "burst")
      .agg(count(lit(1)).as("blen"))
    bursts.groupBy("contract_address")
      .agg(sum(col("blen")).as("n_events"),
        count(lit(1)).as("n_kept"),
        (sum(col("blen")) - count(lit(1))).as("n_dropped"),
        max(col("blen")).as("max_burst_len"))
      .orderBy("contract_address")
  }

  /** Time-to-convert: from each wallet's FIRST view to its first purchase
    * at-or-after it — conversion count plus the exact lower-median and p90
    * of the gap distribution (order statistics by rank selection over the
    * distinct-gap frame, never a row sort; the funnel family's latency
    * complement). */
  def timeToConvert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.transfers(spark, sfDir)
    val firstView = t.filter(col("contract_address") === "view")
      .groupBy(col("from_address").as("wallet"))
      .agg(min(col("transact_at")).as("tv"))
    val purchases = t.filter(col("contract_address") === "purchase")
      .select(col("from_address").as("wallet"), col("transact_at").as("tp"))
    val gaps = firstView.join(purchases, Seq("wallet"))
      .filter(col("tp") >= col("tv"))
      .groupBy("wallet", "tv").agg(min(col("tp")).as("tp"))
      .select((col("tp") - col("tv")).as("gap"))
    // two-phase cumulative count over the distinct-gap frame: distinct
    // gap values are unbounded at scale (seconds between two events), so
    // a globally-ordered window is a single-partition sort — shard by a
    // monotone 256-way range bucket instead (exact Long arithmetic, the
    // Wallet.sourceDeciles / Profile.quantileSketch pattern); only the
    // 256-row bucket-total frame crosses SinglePartition
    val gdist = gaps.groupBy("gap").agg(count(lit(1)).as("c"))
    val gb = gaps.agg(min(col("gap")).as("gmn"), max(col("gap")).as("gmx"),
      count(lit(1)).as("n"))
    val bucketed = gdist.crossJoin(broadcast(gb))
      .withColumn("rb",
        expr("CAST((gap - gmn) * 256 div (gmx - gmn + 1) AS INT)"))
    val offs = bucketed.groupBy("rb").agg(sum(col("c")).as("bc"))
      .withColumn("boff", coalesce(sum(col("bc")).over(
        Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("rb", "boff")
    val cum = bucketed.join(broadcast(offs), Seq("rb"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("rb").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + col("boff"))
    // both order statistics in one pass over the distribution frame
    val sel = cum.agg(
      min(when(col("cum") * 2 >= col("n"), col("gap")))
        .as("median_gap_sec"),
      min(when(col("cum") * 10 >= col("n") * 9, col("gap")))
        .as("p90_gap_sec"))
    firstView.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(broadcast(gaps.agg(count(lit(1)).as("n_converted"))))
      .crossJoin(broadcast(sel))
  }

  /** Cohort LTV curves: cumulative spend per acquisition cohort by cohort
    * age — the lifetime-value readout sitting one step past
    * [[cohortRetention]] (retention counts who came back; LTV sums what
    * they spent). Cohort = the spender's first active week; age = weeks
    * since. Cumulative value runs over the per-(cohort, age) rollup —
    * a |weeks|²-bounded frame, so the window is time-bounded regardless
    * of data volume — and per-user LTV renders exactly as micro-cents
    * via one truncating DECIMAL division against the broadcast cohort
    * sizes. The wallet→cohort attach is a plain wallet-keyed equi-join
    * (both sides wallet-grained; at 100 TB it shuffles once on the
    * natural key). */
  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val spend = Tables.transfers(spark, sfDir)
      .select(col("from_address").as("wallet"),
        expr("transact_at div 604800").as("w"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2))
          * 100).cast("long").as("cents"))
    val cohort = spend.groupBy("wallet").agg(min(col("w")).as("cw"))
    val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
    val per = spend.join(cohort, Seq("wallet"))
      .groupBy(col("cw"), (col("w") - col("cw")).as("age_weeks"))
      .agg(count_distinct(col("wallet")).as("n_active"),
        sum(col("cents")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("cents"))
    per.join(broadcast(sizes), Seq("cw"))
      .withColumn("cum_cents", sum(col("cents")).over(
        Window.partitionBy("cw").orderBy("age_weeks")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ltv_ucents_per_user", expr(
        "CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000" +
          " div CAST(cohort_size AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("cw").as("cohort_week"), col("age_weeks"),
        col("cohort_size"), col("n_active"), col("cents"),
        col("cum_cents"), col("ltv_ucents_per_user"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per token: the hourly
    * volume distribution of the first half of the timeline vs the second,
    * KS = max |F1 − F2| over the pooled value support — the standard
    * nonparametric drift detector between a reference window and a live
    * window (no distributional assumption, unlike [[abTestReadout]]'s
    * rate contrast or the chi² goodness-of-fit twin).
    *
    * Everything is exact integer arithmetic: the CDF gap at value v is
    * |c1(v)·n2 − c2(v)·n1| over a common denominator n1·n2, so the max
    * and the final ppm rendering never touch a float. The cumulative
    * window runs over the per-token (value, half-counts) DISTRIBUTION —
    * bounded by |distinct hourly values| ≤ |hours in the timeline|, a
    * time-bounded frame, never the raw transfer stream. The half split
    * is `2·t ≤ min+max` (doubling instead of halving sidesteps integer
    * division parity at the midpoint). */
  def ksDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.hourBucket(col("transact_at")).cast("long").as("t"))
      .agg((Num.dsumDec(col("value")) * 100).cast("long").as("cents"))
    val bounds = hourly.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
    val halves = hourly.crossJoin(broadcast(bounds))
      .withColumn("h1",
        when(col("t") * 2 <= col("mn") + col("mx"), 1L).otherwise(0L))
      .groupBy(col("contract_address"), col("cents"))
      .agg(sum(col("h1")).as("c1"), sum(lit(1L) - col("h1")).as("c2"))
    val wTok = Window.partitionBy("contract_address")
    val wCum = wTok.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    halves
      .withColumn("f1", sum(col("c1")).over(wCum))
      .withColumn("f2", sum(col("c2")).over(wCum))
      .withColumn("n1", sum(col("c1")).over(wTok))
      .withColumn("n2", sum(col("c2")).over(wTok))
      .groupBy("contract_address")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
          .as("ks_num"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("ks_ppm", expr(
        "CAST(CAST(ks_num AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"))
      .orderBy("contract_address")
  }

  /** Mann–Whitney U (rank-sum) test per token: weekend vs weekday transfer
    * sizes over log₂ cent buckets — the nonparametric "is one group
    * stochastically larger" test, reported as the doubled U statistic
    * (ties contribute half-steps; doubling keeps every quantity integer)
    * and the effect size AUC = U/(n1·n2) in exact ppm.
    *
    * The bucketing is the deliberate scale contract: midranks over the raw
    * near-unique cent values would order a data-sized distribution through
    * one window, while the log₂ grid is ≤64 buckets per token (the
    * [[Forensics.txSizeHistogram]] spelling: bucket = bit length − 1), so
    * the per-token cumulative window touches a constant-bounded frame and
    * the test itself — which only consumes ranks — is exact for the
    * gridded variable. Day-of-week is pure epoch arithmetic
    * ((day+4) mod 7, 0=Sunday), identical in both engines. */
  def mannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val graded = Tables.transfers(spark, sfDir)
      .select(col("contract_address"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2))
          * 100).cast("long").as("cents"),
        expr("(transact_at div 86400 + 4) % 7").as("wd"))
      .filter(col("cents") > 0)
      .withColumn("bucket", (length(expr("bin(cents)")) - 1).cast("long"))
      .withColumn("wknd",
        when(col("wd") === 0 || col("wd") === 6, 1L).otherwise(0L))
      .groupBy("contract_address", "bucket")
      .agg(sum(col("wknd")).as("n1b"),
        sum(lit(1L) - col("wknd")).as("n2b"))
    val wCum = Window.partitionBy("contract_address").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graded
      .withColumn("cum2", sum(col("n2b")).over(wCum) - col("n2b"))
      .groupBy("contract_address")
      .agg(sum(col("n1b")).as("n1"), sum(col("n2b")).as("n2"),
        sum(col("n1b") * col("cum2") * 2 + col("n1b") * col("n2b"))
          .as("u1_x2"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("auc_ppm", expr(
        "CAST(CAST(u1_x2 AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(n1 AS DECIMAL(38,0)) * n2 * 2) AS BIGINT)"))
      .orderBy("contract_address")
  }

  /** Per-user event-sequence prefix mined for patterns. */
  val SeqPrefixLen = 10
  /** Reported pattern budget. */
  val SeqTopPatterns = 30

  /** Gapped sequential-pattern mining (PrefixSpan's support semantics,
    * bounded): the most common length-3 event-type SUBSEQUENCES a→b→c
    * across users — "signup … view … purchase" counts however many other
    * events sit in the gaps, which is what distinguishes sequence mining
    * from the consecutive-transition views ([[nextEventPairs]], session
    * paths). Support counts each user AT MOST ONCE per pattern (the
    * standard sequence-support definition), so one hyperactive user cannot
    * dominate.
    *
    * Bounded by construction: only each user's first [[SeqPrefixLen]]
    * events (by (ts, event_id) — exact nanosecond order) enter, so the
    * triple enumeration is ≤ C(10,3)=120 combinations per user, produced
    * by two self-equi-joins on `user_id` over the ≤10-row ranked prefix —
    * both joins ride ONE hash exchange of the prefix frame (co-partitioned
    * reuse), and the support count is map-side combinable. At 100 TB this
    * is (rows → 10·|users|) then O(120·|users|) — linear in users, with
    * the pattern dictionary collapsing to ≤|event_types|³ rows. */
  def seqPatterns(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= SeqPrefixLen)
      .select("user_id", "event_type", "rn")
      .transform(QueryLocal.persistTracked) // three join sides
    val nUsers = ranked.select(countDistinct(col("user_id")).as("n_users"))
    val triples = ranked.select(col("user_id"), col("event_type").as("a"),
        col("rn").as("ra"))
      .join(ranked.select(col("user_id"), col("event_type").as("b"),
        col("rn").as("rb")), Seq("user_id"))
      .filter(col("ra") < col("rb"))
      .join(ranked.select(col("user_id"), col("event_type").as("c"),
        col("rn").as("rc")), Seq("user_id"))
      .filter(col("rb") < col("rc"))
      .select(col("user_id"),
        concat_ws(">", col("a"), col("b"), col("c")).as("pattern"))
      .distinct() // support: once per user
    triples.groupBy("pattern").agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nUsers))
      .withColumn("support_ppm", expr("support * 1000000 div n_users"))
      .select("pattern", "support", "support_ppm")
      .orderBy(col("support").desc, col("pattern"))
      .limit(SeqTopPatterns)
  }
}

package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling (the Deequ/expectations pattern): per-column
  * completeness and uniqueness metrics for any table, computed in ONE
  * aggregation pass and unpivoted to long format — the report a pipeline
  * gates ingest on before committing a batch at scale.
  *
  * Exact `countDistinct` over k columns expands the scan stream k-fold
  * (Spark's multi-distinct rewrite); that is the right trade at audit
  * granularity, and the HLL twin ([[Metrics.hourlyUniqueWalletsApprox]],
  * MetricsSpec's union-merge test) is the fixed-state form for routine
  * monitoring of very wide tables. */
object Profile {

  /** (column_name, n_null, n_distinct) for every column of `df`. */
  def profileOf(df: DataFrame): DataFrame = {
    val cols = df.columns
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.length}, " +
          cols.map(c => s"'$c', ${c}__nulls, ${c}__distinct").mkString(", ") +
          ") AS (column_name, n_null, n_distinct)"))
      .orderBy("column_name")
  }

  def ordersProfile(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.orders(spark, sfDir))

  /** Shared with the oracle builder so the SQL mirrors the same columns. */
  val OrdersColumns: Seq[String] = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Skew diagnostics: the top-[[HeavyHitterK]] values of a key column with
    * absolute counts, share of the table, and running cumulative share —
    * the profile that decides whether a 100 TB join/agg on this key needs
    * salting or an AQE skew split BEFORE the job is launched. One map-side
    * combinable count + a TakeOrdered of K rows; the share divisions run on
    * the K-row result against a broadcast scalar total (never a wide
    * window). Ties rank deterministically (count desc, value asc). */
  val HeavyHitterK = 20

  def heavyHitters(df: DataFrame, keyCol: String): DataFrame = {
    // ONE scan: the grouped per-key counts (|distinct keys| rows) are
    // persisted and feed BOTH the top-K and the total (Σn = count(*)) — a
    // separate df.count() would re-read the fact table
    val grouped = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val counts = grouped
      .orderBy(col("n").desc, col("key").asc)
      .limit(HeavyHitterK)
    val total = grouped.agg(sum(col("n")).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counts.crossJoin(broadcast(total)) // K rows × 1-row scalar
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)).cast("long"))
      .withColumn("share",
        round(col("n").cast("double") / col("total").cast("double"), 6))
      .withColumn("cum_share",
        round(sum(col("n").cast("double")).over(w)
          / col("total").cast("double"), 6))
      .select("rnk", "key", "n", "share", "cum_share")
      .orderBy("rnk")
  }

  /** Catalog form: receiver-address skew of the transfer fact — the
    * to_address space is hub-heavy by construction, exactly the shape that
    * silently breaks an unsalted 100 TB groupBy. */
  def transferHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    heavyHitters(Tables.transfers(spark, sfDir), "to_address")

  /** Distribution-drift monitor: split the event stream at its time
    * midpoint and compare the `event_type` distribution of the early half
    * against the late half — the check a pipeline runs before declaring a
    * new batch "same data as last week". Per type: counts, shares, and the
    * per-type shift; plus the corpus-level total-variation distance
    * `TVD = Σ|p_early−p_late| / 2` repeated on every row (broadcast scalar,
    * the house pattern for query-level summary values).
    *
    * Deliberately log-free (no PSI/KL): `ln` is the one non-exactly-rounded
    * operation in IEEE 754, so a PSI would differ from the oracle in the
    * last ulp. TVD instead is computed as EXACT integer arithmetic —
    * `Σ|n_early·T_late − n_late·T_early|` summed in DECIMAL(38,0), divided
    * once at the end — bit-identical in any engine and at any partitioning.
    *
    * Scale shape: one map-side-combinable count over the facts; everything
    * after runs on |event types| rows. The midpoint is a broadcast 1-row
    * scalar. */
  def eventDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("ts_sec"))
    val mid = ev.agg(min("ts_sec").as("t0"), max("ts_sec").as("t1"))
      .select(expr("(t0 + t1) div 2").as("mid"))
    val counts = ev.crossJoin(broadcast(mid)) // 1-row scalar
      .groupBy("event_type")
      .agg(
        sum(when(col("ts_sec") <= col("mid"), 1L).otherwise(0L)).as("n_early"),
        sum(when(col("ts_sec") > col("mid"), 1L).otherwise(0L)).as("n_late"))
    // whole-frame windows (default frame, no order) over the
    // |event types|-row frame, never the facts
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    counts
      .withColumn("te", sum("n_early").over(all))
      .withColumn("tl", sum("n_late").over(all))
      .withColumn("num", abs(col("n_early") * col("tl") - col("n_late") * col("te")))
      .withColumn("tvd_num", sum(col("num")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).over(all))
      .select(col("event_type"), col("n_early"), col("n_late"),
        round(col("n_early").cast("double") / col("te").cast("double"), 6)
          .as("p_early"),
        round(col("n_late").cast("double") / col("tl").cast("double"), 6)
          .as("p_late"),
        round(col("num").cast("double") / col("te").cast("double")
          / col("tl").cast("double"), 6).as("shift"),
        round(col("tvd_num").cast("double")
          / (lit(2.0) * col("te").cast("double") * col("tl").cast("double")), 6)
          .as("tvd"))
      .orderBy("event_type")
  }

  /** Per-source winsorized length statistics: clip each document's
    * character count at the source's exact 95th-percentile value and report
    * how much mass the clip removes — the outlier-taming pass run before
    * length-based curriculum or packing decisions.
    *
    * The percentile is an exact ORDER STATISTIC (the value at rank
    * ⌈0.95·n⌉), selected WITHOUT sorting rows: the length DISTRIBUTION
    * (`group by (source, n_chars)` — map-side combinable) is cumulated per
    * source, and the threshold is the smallest value whose cumulative count
    * reaches the rank. The window runs over distinct (source, value) rows —
    * thousands at any corpus size — never the documents; no interpolation
    * (`percentile_cont`'s `lo + f·(hi−lo)` is engine-order-sensitive in the
    * last ulp), all integer arithmetic until the final shares. */
  val WinsorizeP = 0.95

  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("source"), col("n_chars"))
    val dist = d.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val cum = dist
      .withColumn("cum", sum("c").over(bySrc.orderBy("n_chars")))
      .withColumn("n", sum("c").over(bySrc))
    val thr = cum
      .filter(col("cum") >= ceil(col("n").cast("double") * lit(WinsorizeP)))
      .groupBy("source").agg(min("n_chars").as("p95"))
    d.join(broadcast(thr), Seq("source")) // |sources| rows
      .groupBy("source", "p95")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_clipped"),
        sum("n_chars").as("sum_chars"),
        sum(least(col("n_chars"), col("p95"))).as("sum_chars_winsorized"))
      .select(col("source"), col("n_docs"), col("p95"), col("n_clipped"),
        col("sum_chars"), col("sum_chars_winsorized"))
      .orderBy("source")
  }

  /** Dataset card — the per-source datasheet a corpus release ships with
    * ("Datasheets for Datasets", Gebru et al. 2018): document/token/char
    * mass, exact-duplicate count, the majority language and its share,
    * and the mean composite quality score ([[TextAnalysis.quality]]'s
    * formula). Every number is either an exact integer, a single IEEE
    * division of exact integers, or a decimal-accumulated mean — so the
    * whole card is hash-verifiable, which is precisely what you want from
    * a release artifact.
    *
    * Scale: one grouped aggregation over one scan computes everything
    * except the language mode (a second aggregation over the tiny
    * (source, lang) frame + one per-source window); `countDistinct`
    * expands the stream 2-fold (Spark's multi-distinct rewrite) — audit
    * granularity, same trade as [[profileOf]]. */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val b = Tables.documentsWide(spark, sfDir)
      .withColumn("toks", expr(TextAnalysis.toksExpr))
      .filter(col("text").isNotNull)
      .select(col("source"), col("lang"), col("text"),
        expr("size(toks)").cast("long").as("n_words"),
        length(col("text")).cast("long").as("n_chars"),
        round(least(lit(1.0), expr("size(toks)").cast("double") / 20.0)
          * (lit(1.0) - lit(0.5) * TextAnalysis.markerCount("en").cast("double")
            / expr("size(toks)").cast("double")), 6).as("score"))
    val agg = b.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("n_tokens"),
      sum("n_chars").as("n_chars"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"),
      round(sum(col("score").cast(DecimalType(25, 6))).cast("double")
        / count(lit(1)).cast("double"), 6).as("avg_quality"))
    val topLang = b.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("c").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c").as("top_c"))
    agg.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_dup_docs"), col("top_lang"),
        round(col("top_c").cast("double") / col("n_docs").cast("double"), 6)
          .as("top_lang_share"),
        col("avg_quality"))
      .orderBy("source")
  }

  /** Data-contract validation — the "dbt tests" layer: a fixed rule set
    * (not-null, positivity, date range, FK integrity, key uniqueness)
    * evaluated as violation COUNTS per rule, so the contract's status is
    * one small table instead of a failed job. Each rule is one
    * map-side-combinable aggregate or anti-join count; nothing scales
    * with violation count, only with the scan. */
  def dataContract(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()
    def rule(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("rule"),
        col("v").cast("long").as("n_violations"),
        lit(n).as("n_checked"))
        .withColumn("pass", col("n_violations") === 0L)
    val notNull = orders.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v"))
    val positive = orders.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v"))
    val inRange = orders.agg(
      sum(when(year(col("o_orderdate")).between(1990, 2100), 0L)
        .otherwise(1L)).as("v"))
    val fk = orders.join(
        Tables.customer(spark, sfDir).select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val unique = orders.groupBy("o_orderkey")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("v"))
    rule("o_custkey_not_null", notNull)
      .unionByName(rule("o_totalprice_positive", positive))
      .unionByName(rule("o_orderdate_in_range", inRange))
      .unionByName(rule("o_custkey_fk", fk))
      .unionByName(rule("o_orderkey_unique", unique))
      .orderBy("rule")
  }

  /** Deciles reported by [[sourceDeciles]]. */
  val Deciles = 9

  /** Per-source decile table of document lengths — the Q-Q drift
    * diagnostic's raw material: exact order statistics (rank `⌈k·n/10⌉`,
    * integer arithmetic, selected from the length DISTRIBUTION like
    * [[winsorize]]'s p95 — no row sort, no interpolation). Two sources
    * whose decile columns diverge have different length regimes; feed
    * pairs of rows to a Q-Q plot. */
  def sourceDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source").orderBy(col("n_chars").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = dist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
    val deciles = spark.range(1, Deciles + 1).select(col("id").as("k"))
    cum.crossJoin(broadcast(deciles))
      .filter(col("cum") * 10 >= col("k") * col("n"))
      .groupBy("source", "k")
      .agg(min(col("n_chars")).as("n_chars_at"))
      .orderBy("source", "k")
  }

  /** Per-source ablation table: what happens to the corpus-wide mean
    * document length when each source is REMOVED — the leave-one-source-
    * out screen a curation pipeline runs before expensive per-source
    * training ablations ("which source is dragging the average"). Same
    * LOO algebra as [[graft.ops.Features.targetEncodeNation]], lifted
    * from rows to sources: `mean₋ₛ = (S − Sₛ)/(N − nₛ)`.
    *
    * `n_chars` is integral, so every sum is an exact BIGINT — no decimal
    * detour needed; the means are single IEEE divisions of exact
    * operands, and delta subtracts two such doubles. One map-side-
    * combinable aggregation + a broadcast 1-row total: the ablation adds
    * nothing that scales with corpus size. */
  def sourceAblation(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("s_chars"))
    val tot = per.agg(sum(col("n_docs")).as("nn"), sum(col("s_chars")).as("ss"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        (col("ss").cast("double") / col("nn").cast("double"))
          .as("mean_all"),
        when(col("nn") > col("n_docs"),
          (col("ss") - col("s_chars")).cast("double") /
            (col("nn") - col("n_docs")).cast("double")).as("mean_without"))
      .withColumn("delta", col("mean_without") - col("mean_all"))
      .orderBy("source")
  }

  /** Count-Min sketch geometry: [[CmsDepth]] hash rows × [[CmsWidth]]
    * buckets. */
  val CmsDepth = 3
  val CmsWidth = 64

  /** Count-Min sketch estimation, verified against exact counts: the
    * third sketch family beside the HLL and theta twins. The sketch is
    * materialized EXACTLY as a distributed CMS would be — per-(row,
    * bucket) sums over md5-derived bucket assignments ([[CmsDepth]] ×
    * [[CmsWidth]] cells, mergeable across partitions/batches by addition
    * — the reason CMS exists) — and the estimate for a key is the min
    * over its [[CmsDepth]] cells. Deterministic hashes make the whole
    * sketch oracle-checkable: the output carries est − exact (≥ 0 by
    * construction — CMS only ever overestimates) for the top exact heavy
    * hitters, i.e. the certified-bound pattern the HLL/theta twins use. */
  /** CMS bucket of the `key` column for hash row `d` — first two md5 hex
    * digits mod [[CmsWidth]]; shared by the point estimates and the join-
    * cardinality inner product. */
  private[ops] def cmsBucketExpr(d: Int): String =
    s"""CAST((instr('0123456789abcdef', substr(md5(concat('$d', '_', key)), 1, 1)) - 1) * 16
       | + instr('0123456789abcdef', substr(md5(concat('$d', '_', key)), 2, 1)) - 1
       | AS BIGINT) % $CmsWidth""".stripMargin.replace("\n", "")

  def countMinEstimates(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.transfers(spark, sfDir)
      .groupBy(col("to_address").as("key"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.ops.QueryLocal.persistTracked)
    def bucketExpr(d: Int): String = cmsBucketExpr(d)
    val bucketed = (0 until CmsDepth).map(d =>
        counts.select(col("key"), col("n"), lit(d.toLong).as("d"),
          expr(bucketExpr(d)).as("b")))
      .reduce(_ unionByName _)
    val sketch = bucketed.groupBy("d", "b").agg(sum(col("n")).as("cell"))
    val est = bucketed
      .join(sketch, Seq("d", "b"))
      .groupBy("key")
      .agg(min(col("cell")).as("n_est"), min(col("n")).as("n"))
    est
      .orderBy(col("n").desc, col("key").asc)
      .limit(HeavyHitterK)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)).cast("long"))
      .select(col("rnk"), col("key"), col("n"), col("n_est"),
        (col("n_est") - col("n")).as("overest"))
      .orderBy("rnk")
  }

  /** Length-bucket width / count for [[sourceChi2]]. */
  val Chi2BucketChars = 500L
  val Chi2Buckets = 10L

  /** Per-source χ² drift contributions against the corpus length
    * distribution: documents bucket by ⌊n_chars/500⌋ (capped at 10
    * buckets), expected counts are the corpus marginal scaled to the
    * source size, and each (source, bucket) row carries its χ² term
    *   (O·N − n_s·N_b)² / (n_s·N_b·N)
    * — exact integer numerator/denominator, one division, rounded 6. Rows
    * stay per-bucket instead of summing (a float sum would be
    * order-dependent, and the per-bucket view is the actionable one: it
    * names WHICH length band drifted). Buckets a source never hits still
    * appear (O = 0 ⇒ term n_s·N_b/N), via a source × corpus-bucket grid —
    * 5×10 rows, broadcast-joined, nothing quadratic in documents. */
  def sourceChi2(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = Tables.documents(spark, sfDir)
      .select(col("source"),
        expr(s"least(n_chars div $Chi2BucketChars, ${Chi2Buckets - 1})")
          .cast("long").as("bucket"))
    val cell = d.groupBy("source", "bucket").agg(count(lit(1)).as("o"))
    val marg = d.groupBy("bucket").agg(count(lit(1)).as("nb"))
    val srcN = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val total = d.agg(count(lit(1)).as("nt"))
    srcN.crossJoin(broadcast(marg))
      .join(cell, Seq("source", "bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"), col("bucket"),
        coalesce(col("o"), lit(0L)).as("o"), col("ns"), col("nb"), col("nt"),
        round((
          (coalesce(col("o"), lit(0L)).cast(dec) * col("nt").cast(dec)
            - col("ns").cast(dec) * col("nb").cast(dec))
          * (coalesce(col("o"), lit(0L)).cast(dec) * col("nt").cast(dec)
            - col("ns").cast(dec) * col("nb").cast(dec))).cast("double")
          / (col("ns").cast(dec) * col("nb").cast(dec)
            * col("nt").cast(dec)).cast("double"), 6).as("chi2_term"))
      .orderBy("source", "bucket")
  }

  /** Quantile-sketch bucket count. */
  val SketchBuckets = 64

  /** Mergeable equi-width quantile sketch with a CERTIFIED error bound —
    * the quantile member of the sketch family next to the HLL twin
    * (`q_unique_wallets_hll`) and the Count-Min estimates
    * (`q_countmin_est`). A [[SketchBuckets]]-bucket histogram of
    * `l_extendedprice` (bucket counts are plain sums — mergeable across
    * partitions, shards, or days exactly like production quantile
    * sketches), read out at p50/p95/p99 as the upper edge of the bucket
    * where the cumulative count crosses ⌈p·n⌉. The certificate: the
    * estimate can miss the true quantile by at most one bucket width, and
    * the query emits the EXACT order statistic beside it plus the bound
    * check — so the sketch's contract is itself hash-verified.
    *
    * Float-portability: bucket index and edges are each a chain of single
    * correctly-rounded IEEE ops (subtract, multiply-by-2^k, divide, floor)
    * — bit-identical in DuckDB; counts and crossings are integers. */
  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = SketchBuckets
    val li = Tables.lineitem(spark, sfDir).select(col("l_extendedprice").as("x"))
    val bounds = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    // greatest(width, eps) guards the degenerate all-equal column: there
    // x - mn is exactly 0, so 0/eps = bucket 0 instead of 0/0 = NaN
    // (which would collapse the histogram and NULL every estimate).
    val hist = li.crossJoin(broadcast(bounds))
      .select(least(floor((col("x") - col("mn")) * b /
          greatest(col("mx") - col("mn"), lit(1e-12))),
        lit(b - 1)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    // exact side: certificate-only, via the value DISTRIBUTION (map-side
    // collapse to distinct prices before the rank selection — never a row
    // sort). The cumulative count is TWO-PHASE: a global-order window over
    // every distinct price is a single-partition sort (the shape the rest
    // of the sketch family avoids), so shard the distinct prices by their
    // sketch bucket — monotone in x, so global cum = within-shard cum +
    // the prefix sum of prior shards' totals (a [[SketchBuckets]]-row
    // frame, the only thing that crosses SinglePartition).
    val distx = li.groupBy("x").agg(count(lit(1)).as("c"))
    val sharded = distx.crossJoin(broadcast(bounds))
      .withColumn("sb", least(floor((col("x") - col("mn")) * b /
          greatest(col("mx") - col("mn"), lit(1e-12))),
        lit(b - 1)).cast("int"))
    val offs = sharded.groupBy("sb").agg(sum(col("c")).as("sc"))
      .withColumn("off", coalesce(sum(col("sc")).over(
        Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("sb", "off")
    val cumx = sharded.join(broadcast(offs), Seq("sb"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("sb").orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + col("off"))
      .select(col("x"), col("cum"), col("n"))
    val ps = Seq(50, 95, 99)
    // all three rank selections in ONE pass each (the per-p loop re-ran
    // the full histogram scan / the distinct-price window once per p)
    val est = cum.crossJoin(broadcast(bounds))
      .agg(ps.map(p => min(when(
          col("cum") >= expr(s"($p * n + 99) div 100"), col("bucket")))
        .as(s"b$p")).head,
        ps.tail.map(p => min(when(
            col("cum") >= expr(s"($p * n + 99) div 100"), col("bucket")))
          .as(s"b$p")): _*)
      .select(expr(s"stack(${ps.size}, " +
        ps.map(p => s"CAST($p AS BIGINT), b$p").mkString(", ") +
        ") AS (p, bucket)"))
      .crossJoin(broadcast(bounds))
      .select(col("p"),
        (col("mn") + (col("bucket") + 1) * ((col("mx") - col("mn")) / b))
          .as("estimate"),
        ((col("mx") - col("mn")) / b).as("max_error"))
    val exacts = cumx
      .agg(ps.map(p => min(when(
          col("cum") >= expr(s"($p * n + 99) div 100"), col("x")))
        .as(s"e$p")).head,
        ps.tail.map(p => min(when(
            col("cum") >= expr(s"($p * n + 99) div 100"), col("x")))
          .as(s"e$p")): _*)
      .select(expr(s"stack(${ps.size}, " +
        ps.map(p => s"CAST($p AS BIGINT), e$p").mkString(", ") +
        ") AS (p, exact)"))
    est.join(exacts, Seq("p"))
      .select(col("p"), col("estimate"), col("exact"), col("max_error"),
        (abs(col("estimate") - col("exact")) <= col("max_error") + lit(1e-6))
          .as("within_bound"))
      .orderBy("p")
  }

  /** Sketch-based equi-join cardinality estimate: |A ⋈ B on key| =
    * Σ_k a(k)·b(k) estimated by the Count-Min INNER PRODUCT — per hash
    * row, the dot product of the two sides' sketch rows; the min over
    * rows is the classic upper-bound estimator (same-hash collisions only
    * ADD mass, so est ≥ exact always — certified in-query). This is the
    * join-size probe a planner consults before choosing broadcast vs
    * shuffle vs salting when one side's key histogram is too big to
    * materialize: two 3×256-cell sketches answer it in O(1) state.
    *
    * The exact side (for the certificate) is the real key-join — bounded
    * here, certificate-only at scale. All arithmetic integer/decimal. */
  def joinCardinality(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val t = Tables.transfers(spark, sfDir)
    val outs = t.groupBy(col("from_address").as("key"))
      .agg(count(lit(1)).as("na"))
    val ins = t.groupBy(col("to_address").as("key"))
      .agg(count(lit(1)).as("nb"))
    val exact = outs.join(ins, Seq("key"))
      .agg(sum(col("na").cast(dec) * col("nb")).as("exact"))
    def sketch(side: DataFrame, cnt: String) =
      (0 until CmsDepth).map(d =>
          side.select(col("key"), col(cnt).as("n"), lit(d.toLong).as("d"),
            expr(cmsBucketExpr(d)).as("b")))
        .reduce(_ unionByName _)
        .groupBy("d", "b").agg(sum(col("n")).as("cell"))
    val est = sketch(outs, "na")
      .join(sketch(ins, "nb").select(col("d"), col("b"),
        col("cell").as("cell_b")), Seq("d", "b"))
      .groupBy("d")
      .agg(sum(col("cell").cast(dec) * col("cell_b")).as("dot"))
      .agg(min(col("dot")).as("est"))
    exact.crossJoin(est)
      .select(col("exact").cast("long").as("exact_pairs"),
        col("est").cast("long").as("est_pairs"),
        (col("est") - col("exact")).cast("long").as("overest"),
        (col("est") >= col("exact")).as("never_under"))
  }

  /** Bootstrap replicate count for [[bootstrapCi]]. */
  val BootstrapB = 32

  /** Poisson(1) CDF thresholds on the 48-bit hash lattice:
    * floor(P(X ≤ k)·2⁴⁸) for k = 0..8 (weights beyond 8 collapse to 9;
    * P(X > 8) ≈ 1.1e-6). ONE Scala constant feeds both engines, so the
    * inverse-CDF lookup is literal-identical. */
  val PoissonThresholds48: Seq[Long] = {
    var fact = 1.0
    (0 to 8).scanLeft(0.0) { (acc, k) =>
      if (k > 0) fact *= k
      acc + math.exp(-1.0) / fact
    }.tail.map(p => math.floor(p * math.pow(2, 48)).toLong)
  }

  /** The inverse-CDF CASE over a 48-bit uniform expression — the shared
    * generator both the Spark plan and the DuckDB oracle compile from. */
  def poissonCaseSql(u: String): String =
    PoissonThresholds48.zipWithIndex
      .map { case (t, k) => s"WHEN ($u) < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 9 END")

  /** Poisson bootstrap confidence interval for the per-token mean transfer
    * size — THE distributed bootstrap: true resampling-with-replacement
    * needs global coordination, but for n large, multinomial(n, 1/n)
    * row multiplicities converge to independent Poisson(1) weights, so
    * each of the [[BootstrapB]] replicates draws a per-row weight from a
    * 48-bit hash-uniform through the inverse CDF ([[PoissonThresholds48]])
    * — deterministic, replayable, and embarrassingly map-side (the
    * classic production spelling, e.g. Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams").
    *
    * Everything stays integer-exact: replicate means render as
    * micro-cents via one truncating DECIMAL division; the interval is a
    * rank selection (2nd / 16th / 31st of the 32 sorted replicate means
    * — ≈ p5/median/p95) through a window over the 32-row-per-token
    * replicate frame, never the data. Cost: one ×B row amplification
    * feeding one (token, b)-grouped map-side-combinable aggregate. */
  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fanOut: the ×B replicate explode and its per-(row, b) md5 draw fuse
    // into the scan stage, which a one-row-group test file pins to a
    // single task (see Tables.documentsWide) — the densest map in the
    // sketch family runs serial without this
    val base = Tables.fanOut(Tables.transfers(spark, sfDir)
      .select(col("contract_address"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(25, 2))
          * 100).cast("long").as("cents"),
        concat(col("block_number"), lit(":"), col("log_index")).as("key")))
    val point = base.groupBy("contract_address")
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(SUM(CAST(cents AS DECIMAL(38,0))) * 1000000" +
          " div count(*) AS BIGINT)").as("point_ucents"))
    val u = "CAST(conv(substr(md5(concat(key, ':', b)), 1, 12), 16, 10)" +
      " AS BIGINT)"
    val reps = base
      .select(col("contract_address"), col("cents"), col("key"),
        explode(sequence(lit(0), lit(BootstrapB - 1))).as("b"))
      .withColumn("w", expr(poissonCaseSql(u)))
      .groupBy("contract_address", "b")
      .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * cents")).as("swc"),
        sum(col("w").cast("long")).as("sw"))
      .filter(col("sw") > 0)
      .withColumn("m", expr("CAST(swc * 1000000 div CAST(sw AS" +
        " DECIMAL(38,0)) AS BIGINT)"))
    val rn = row_number().over(
      Window.partitionBy("contract_address").orderBy(col("m"), col("b")))
    reps.withColumn("rn", rn)
      .groupBy("contract_address")
      .agg(min(when(col("rn") === 2, col("m"))).as("lo_ucents"),
        min(when(col("rn") === BootstrapB / 2, col("m"))).as("med_ucents"),
        min(when(col("rn") === BootstrapB - 1, col("m"))).as("hi_ucents"))
      .join(broadcast(point), Seq("contract_address"))
      .select(col("contract_address"), col("n_rows"), col("point_ucents"),
        col("lo_ucents"), col("med_ucents"), col("hi_ucents"))
      .orderBy("contract_address")
  }
}

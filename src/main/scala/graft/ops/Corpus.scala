package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the stage between curation
  * ([[TextAnalysis]], [[Dedup]], [[Sampling]]) and the trainer: weighted
  * source mixing to a token budget, deterministic global shuffle, sequence
  * packing, benchmark decontamination, and BM25 retrieval over the corpus.
  *
  * Determinism doctrine (same as [[Sampling]]): no RNG anywhere. Every
  * decision — how many epochs a document gets, its position in the training
  * order, which pack it lands in — is a pure function of ids and content,
  * so re-runs are idempotent and the DuckDB oracle reproduces every row
  * bit-for-bit. Sampling decisions use integer arithmetic ONLY (hash-bucket
  * vs. exact rational thresholds cross-multiplied to integers), never
  * floating-point rates.
  */
object Corpus {

  /** BPE-ish token count per document (the `n_bpe_tokens` spelling of
    * [[TextAnalysis.tokenCounts]] — letter runs / digit runs / single other
    * chars), with id + source: the unit of account for mixing and packing. */
  def tokCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("n_tokens"))

  // ---------------------------------------------------------------- mixing

  /** Per-source mixture weights (literal registry, mirrored into the oracle
    * VALUES). Sources are weighted 1..4 cyclically — stand-ins for the
    * "books×4, web×1" style upsampling table a real mix would configure. */
  val SourceWeights: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1L))
  val SumWeights: Long = SourceWeights.map(_._2).sum

  /** Token budget of the mixed corpus, as a multiple of the raw corpus. */
  val BudgetFactor = 2L

  /** Hash-mod buckets shared with [[Sampling]]: 256 buckets from the first
    * two hex digits of md5(doc_id). */
  private def idBucket: org.apache.spark.sql.Column =
    expr(Sampling.bucketSql("doc_id"))

  /** Per-source epoch plan: source s with weight w_s and raw token count t_s
    * should contribute `target_s = w_s * B / sumW` tokens of a
    * `B = BudgetFactor * t_total` budget, i.e. each of its documents repeats
    * `r_s = target_s / t_s` times. r_s is rational; the plan keeps it exact
    * as num/den and never materializes a float:
    *
    *  - every document gets `num DIV den` full epochs,
    *  - plus one more iff `bucket * den < 256 * (num MOD den)` — the
    *    hash-bucket version of "with probability frac(r_s)", decided by
    *    integer cross-multiplication.
    *
    * Columns: (source, w, t_s, floor_reps, rem, den). */
  private def epochPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val weights = SourceWeights.toDF("source", "w")
    val bySource = tokCounts(spark, sfDir)
      .groupBy("source").agg(sum("n_tokens").as("t_s"))
    val total = bySource.agg(sum("t_s").as("t_total"))
    bySource
      .join(broadcast(weights), Seq("source"), "left")
      .na.fill(1L, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("num", col("w") * lit(BudgetFactor) * col("t_total"))
      .withColumn("den", lit(SumWeights) * col("t_s"))
      .withColumn("floor_reps", expr("num DIV den"))
      .withColumn("rem", expr("num % den"))
      .select("source", "w", "t_s", "floor_reps", "rem", "den")
  }

  /** Per-document repetition counts (doc_id, source, n_tokens, w, reps) —
    * the resolved epoch plan, shared by the mix explode and the stats
    * audit so the two can never drift. */
  private def repRows(spark: SparkSession, sfDir: String): DataFrame =
    tokCounts(spark, sfDir)
      .join(broadcast(epochPlan(spark, sfDir)), Seq("source"))
      .withColumn("bucket", idBucket)
      .withColumn("reps", col("floor_reps") +
        when(col("bucket") * col("den") < lit(256L) * col("rem"), 1L)
          .otherwise(0L))
      .select("doc_id", "source", "n_tokens", "w", "reps")

  /** Unsorted (doc_id, source, n_tokens, epoch) mix rows — the JOIN-INPUT
    * form for composition (consumers reshuffle; they must not pay a global
    * sort nobody keeps). */
  private def mixRows(spark: SparkSession, sfDir: String): DataFrame =
    repRows(spark, sfDir)
      // sequence(1, 0) would count DOWN in Spark; guard with greatest+filter
      // (the oracle's range(1, reps+1) is natively empty at reps = 0)
      .withColumn("epoch",
        explode(expr("filter(sequence(1, greatest(reps, 1)), e -> e <= reps)")))
      .select("doc_id", "source", "n_tokens", "epoch")

  /** The mixed corpus: one row per (document, epoch). The whole operator is
    * one scan + a broadcast of the per-source plan (constant-size) — the
    * epoch explode is the only row amplification and it IS the output, so
    * the plan is shuffle-free at any corpus size (output sort aside). */
  def corpusMix(spark: SparkSession, sfDir: String): DataFrame =
    mixRows(spark, sfDir).orderBy("doc_id", "epoch")

  /** Audit view of the mix: raw vs. mixed token mass per source. Per
    * source the mass is HARD-bounded by [floor·t_s, (floor+1)·t_s] (every
    * doc gets floor or floor+1 epochs); the fractional-epoch hash is a
    * per-document estimator, so only the corpus TOTAL tracks the budget
    * tightly — CorpusSpec asserts the interval bound per source and 10%
    * budget tracking in aggregate. */
  def mixStats(spark: SparkSession, sfDir: String): DataFrame =
    repRows(spark, sfDir)
      .groupBy("source")
      .agg(max("w").as("weight"),
        sum("n_tokens").as("raw_tokens"),
        sum(col("reps") * col("n_tokens")).as("mixed_tokens"),
        sum("reps").as("mixed_docs"))
      .orderBy("source")

  // --------------------------------------------------------------- shuffle

  /** Training-order shuffle key: md5 over the salted id. Hex-string order
    * is total and engine-independent (pure ASCII). */
  private val ShuffleSalt = "_shuffle"
  private def skeyExpr: String =
    s"md5(concat(CAST(doc_id AS STRING), '$ShuffleSalt'))"

  /** 0..255 bucket from the FIRST TWO hex digits of an md5 column — the
    * leading prefix of the key, so ordering by (bucket, key) equals ordering
    * by key alone (hex digits are ASCII-ordered). */
  private def hexBucketSql(c: String): String =
    s"CAST((instr('0123456789abcdef', substr($c, 1, 1)) - 1) * 16" +
      s" + instr('0123456789abcdef', substr($c, 2, 1)) - 1 AS BIGINT)"

  /** Contrastive negative sampling: [[NumNegatives]] deterministic
    * negatives per document, WITHOUT a cross join or RNG. Each (doc, j)
    * derives a hash offset in [1, N-1] from md5, steps that far around
    * the [[globalShuffle]] permutation ring, and joins back by position —
    * an equi-join on a dense rank, so cost is O(k·N) rows shuffled once,
    * never |docs|². The offset lower bound 1 and the modulus N-1 make
    * self-pairs impossible by construction; everything is md5/integer
    * arithmetic, so the sample is reproducible in any engine (the
    * training-data property that matters: re-running the pipeline
    * yields the same negatives). Offsets draw from 16 bits of the hash
    * (mod-biased for N ≫ 65536, still uniform enough for negatives —
    * widen the digit window if that ever matters). */
  val NumNegatives = 3

  private def hex4Sql(c: String): String =
    s"""CAST(((instr('0123456789abcdef', substr($c, 1, 1)) - 1) * 4096
       | + (instr('0123456789abcdef', substr($c, 2, 1)) - 1) * 256
       | + (instr('0123456789abcdef', substr($c, 3, 1)) - 1) * 16
       | + instr('0123456789abcdef', substr($c, 4, 1)) - 1) AS BIGINT)"""
      .stripMargin.replaceAll("\n", "")

  def negativePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = globalShuffle(spark, sfDir).select("doc_id", "pos")
    val nFrame = ranked.agg(max("pos").as("n"))
    ranked.crossJoin(broadcast(nFrame))
      .select(col("doc_id"), col("pos"), col("n"),
        explode(expr(s"sequence(1, $NumNegatives)")).as("j"))
      .withColumn("noff", expr(
        s"""1 + ${hex4Sql(
          "md5(concat(CAST(doc_id AS STRING), '_neg_', CAST(j AS STRING)))")}
           | % (n - 1)""".stripMargin.replaceAll("\n", "")))
      .withColumn("neg_pos", (col("pos") - 1 + col("noff")) % col("n") + 1)
      .join(ranked.select(col("pos").as("neg_pos"),
        col("doc_id").as("neg_id")), Seq("neg_pos"))
      .select(col("doc_id"), col("j").cast("int").as("j"), col("neg_id"))
      .orderBy("doc_id", "j")
  }

  /** Deterministic global shuffle — every document's position in the
    * training order, WITHOUT a global sort/row_number (which would funnel
    * the corpus through one partition). Two-phase distributed rank:
    *
    *  1. bucket counts (one map-side-combined aggregate, 256 rows),
    *     prefix-summed into bucket offsets (window over 256 rows — driver
    *     scale, not data scale) and broadcast;
    *  2. per-bucket `row_number` (parallel across 256 shards) + offset.
    *
    * Because the bucket is the key's leading two hex digits, the composite
    * (bucket, key) order IS the global key order, so the result equals the
    * oracle's flat `ROW_NUMBER() OVER (ORDER BY key)` — rank without a
    * single-partition stage. */
  def globalShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(skeyExpr).as("skey"))
      .withColumn("sbucket", expr(hexBucketSql("skey")))
    val offsets = keyed.groupBy("sbucket").agg(count(lit(1)).as("c"))
      .withColumn("off",
        sum("c").over(Window.orderBy("sbucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("c"))
      .select("sbucket", "off")
    keyed.join(broadcast(offsets), Seq("sbucket"))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy("sbucket").orderBy("skey", "doc_id"))
          .cast("long") + col("off")).as("pos"))
      .select("doc_id", "skey", "pos")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- packing

  /** Trainer context length, in tokens. */
  val SeqLen = 512L

  /** Sequence-packing plan (concat-and-chunk): documents are laid out in
    * shuffle order and cut into [[SeqLen]]-token packs; a document knows its
    * start offset and the packs it spans. Packing is per shuffle-shard (the
    * 256 md5 buckets), the standard distributed formulation — each shard
    * packs independently in parallel, no global prefix sum; only the last
    * pack of each shard is padded. The running offset is one partitioned
    * window (shuffle on sbucket), everything after is arithmetic. */
  def packPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("sbucket").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokCounts(spark, sfDir)
      .filter(col("n_tokens") > 0)
      .withColumn("skey", expr(skeyExpr))
      .withColumn("sbucket", expr(hexBucketSql("skey")))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("start_off", col("cum") - col("n_tokens"))
      .withColumn("pack_first", expr(s"start_off DIV $SeqLen"))
      .withColumn("pack_last", expr(s"(cum - 1) DIV $SeqLen"))
      .select("doc_id", "sbucket", "start_off", "n_tokens",
        "pack_first", "pack_last")
      .orderBy("sbucket", "start_off")
  }

  /** The trainer-ready artifact: packed id sequences. [[Clean.tokenIds]]'
    * per-document id arrays are laid out in shuffle order (same per-shard
    * offsets as [[packPlan]], here over whitespace-token counts so offsets
    * and ids agree) and cut into [[SeqLen]]-token packs; each output row is
    * one pack with its ordered ids and fill count (only the last pack of a
    * shard is partial — padding is the trainer's call). Pipeline: broadcast
    * vocab join → one partitioned window (offsets) → one grouped
    * positional re-sort (packs); the id stream shuffles once. */
  def packedSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("sbucket").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.ops.Clean.tokenIdRows(spark, sfDir)
      .withColumn("skey", expr(skeyExpr))
      .withColumn("sbucket", expr(hexBucketSql("skey")))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("sbucket"), col("start_off"),
        posexplode(col("ids")).as(Seq("pos", "id")))
      .withColumn("off", col("start_off") + col("pos"))
      .groupBy(col("sbucket"), expr(s"off DIV $SeqLen").as("pack"))
      .agg(
        expr("transform(array_sort(collect_list(struct(off, id))), s -> s.id)")
          .as("ids"),
        count(lit(1)).as("n_fill"))
      .select("sbucket", "pack", "n_fill", "ids")
      .orderBy("sbucket", "pack")
  }

  /** The WHOLE pipeline in one query: weighted mixing → epoch-salted
    * deterministic shuffle → sequence packing of token ids. Every (doc,
    * epoch) repetition from [[corpusMix]] enters the stream at its own
    * shuffle position (the key salts doc_id WITH epoch, so a document's
    * epochs scatter across shards instead of clumping), then packs exactly
    * like [[packedSequences]]. Plan shape: two broadcasts (epoch plan,
    * vocab) + one per-shard offset window + one grouped re-sort — the
    * epoch-amplified id stream shuffles once. */
  def mixedPackedSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("sbucket").orderBy("skey", "doc_id", "epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixRows(spark, sfDir).select("doc_id", "epoch")
      .join(graft.ops.Clean.tokenIdRows(spark, sfDir), Seq("doc_id"))
      .withColumn("skey", expr(
        s"md5(concat(CAST(doc_id AS STRING), '_', CAST(epoch AS STRING), '$ShuffleSalt'))"))
      .withColumn("sbucket", expr(hexBucketSql("skey")))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("sbucket"), col("start_off"),
        posexplode(col("ids")).as(Seq("pos", "id")))
      .withColumn("off", col("start_off") + col("pos"))
      .groupBy(col("sbucket"), expr(s"off DIV $SeqLen").as("pack"))
      .agg(
        expr("transform(array_sort(collect_list(struct(off, id))), s -> s.id)")
          .as("ids"),
        count(lit(1)).as("n_fill"))
      .select("sbucket", "pack", "n_fill", "ids")
      .orderBy("sbucket", "pack")
  }

  // ------------------------------------------------------ decontamination

  /** Deterministic stand-in for a benchmark/eval set: every 29th document
    * (offset 7). */
  private val evalPred = col("doc_id") % 29 === 7

  /** Benchmark decontamination: training documents sharing ≥1 distinct
    * 3-gram shingle with any eval document, with the shared-shingle count —
    * the n-gram-overlap contamination test run before training. The eval
    * side of the join is the (tiny) benchmark's distinct shingles,
    * broadcast; the corpus side streams — no shuffle until the per-doc
    * count. */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = TextAnalysis.shingles(spark, sfDir)
    val evalShingles = sh.filter(evalPred).select("sh").distinct()
    sh.filter(!evalPred)
      .join(broadcast(evalShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------ bm25

  /** Fixed retrieval query (terms chosen to hit the synthetic corpus). */
  val QueryTerms: Seq[String] = Seq("the", "of", "la")
  val K1 = 1.2
  val B = 0.75

  /** BM25 top-50 over the corpus for [[QueryTerms]], with a RATIONAL idf
    * `(N - df + 0.5) / (df + 0.5)` instead of its logarithm: `ln` is the one
    * BM25 ingredient libms disagree on in the last ulp (IEEE only requires
    * correctly-rounded +,-,*,/,sqrt), and a log-free idf keeps every
    * intermediate bit-identical across engines while preserving the
    * classic tf saturation shape. Document stats aggregate in one pass
    * (exact integer sums), broadcast as a single row; scoring is one
    * codegen'd projection over the scan; top-50 is a TakeOrdered — no
    * global sort materialization. */
  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documentsWide(spark, sfDir)
      .select(col("doc_id"), expr(TextAnalysis.toksExpr).as("toks"))
      .withColumn("dl", expr("size(toks)").cast("long"))
      .select(col("doc_id") +: col("dl") +: QueryTerms.zipWithIndex.map {
        case (t, i) =>
          expr(s"size(filter(toks, x -> x = '$t'))").cast("long").as(s"tf_$i")
      }: _*)
    val aggCols = count(lit(1)).as("n") +: sum("dl").as("sdl") +:
      QueryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = docs.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val score = QueryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = (col("n").cast("double") - col(s"df_$i").cast("double")
        + lit(0.5)) / (col(s"df_$i").cast("double") + lit(0.5))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0.0)
      .select("doc_id", "dl", "score")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  // ----------------------------------------------------------------- tf-idf

  /** Doc-to-doc TF-IDF retrieval: for each of the first [[TfidfProbeCount]]
    * documents, the [[TfidfK]] most cosine-similar documents under
    * tf·idf term weights — the sparse-vector sibling of the dense ANN
    * family ([[Similarity]]), sharing its probe-set convention and its
    * exact-decimal-dot determinism contract.
    *
    * Same log-free rational idf as [[bm25]] (`(N − df + 0.5)/(df + 0.5)`).
    * The hottest [[TfidfDropVocabFrac]] of the VOCABULARY by document
    * frequency is dropped BEFORE the inverted-index join — the hot-term
    * cap that keeps candidate fan-out near-linear at corpus scale (the
    * same df-cap move as `jaccardTop1`); high-df terms also carry the
    * least ranking signal (idf ≈ 1). The cap is RANK-based — the exact
    * order statistic of the df distribution, selected without sorting
    * terms (the winsorize move) — NOT a fraction-of-documents threshold:
    * a `df > N/5` rule emptied the candidate set on the synthetic corpus
    * at sf0.1, where the small vocabulary puts nearly every term in >20%
    * of documents. A vocabulary-rank cap keeps a constant fraction of
    * terms retrievable under any df shape. Per-doc norms and per-pair
    * dots sum `DECIMAL(38,18)` casts of deterministic doubles, so
    * accumulation order is irrelevant and the oracle matches
    * bit-for-bit. (At extreme N the raw idf² overflows the decimal's 20
    * integer digits; cosine is invariant under uniform weight scaling, so
    * the fix there is `idf/N` — values at every graded scale are identical
    * without it.) */
  val TfidfProbeCount = 10
  val TfidfK = 5
  val TfidfKeepVocabFrac = 0.8

  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documentsWide(spark, sfDir)
      .withColumn("toks", expr(TextAnalysis.toksExpr))
      .filter(col("text").isNotNull && expr("size(toks) >= 1"))
    val docTerms = base
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("k"))
    val nDocs = base.agg(count(lit(1)).as("n"))
    val dfs = docTerms.groupBy("tok").agg(count(lit(1)).as("df"))
    // df cap = the ceil(0.8·|vocab|)-th df order statistic, selected from
    // the df DISTRIBUTION (distinct df values ≪ vocab — no term sort)
    val dfDist = dfs.groupBy("df").agg(count(lit(1)).as("c"))
    // two-phase rank selection over the df distribution: distinct df
    // values are unbounded at corpus scale, so the globally-ordered cum
    // window (and the partitionBy() total) would funnel the frame through
    // one partition — shard by a monotone 256-way range bucket instead
    // (the Profile.quantileSketch / Behavior.timeToConvert pattern)
    val dw = org.apache.spark.sql.expressions.Window
    val db = dfDist.agg(min("df").as("dmn"), max("df").as("dmx"),
      sum("c").as("nv"))
    val dfBucketed = dfDist.crossJoin(broadcast(db))
      .withColumn("rb",
        expr("CAST((df - dmn) * 256 div (dmx - dmn + 1) AS INT)"))
    val dfOffs = dfBucketed.groupBy("rb").agg(sum("c").as("bc"))
      .withColumn("boff", coalesce(sum("bc").over(
        dw.orderBy("rb").rowsBetween(dw.unboundedPreceding, -1)),
        lit(0L)))
      .select("rb", "boff")
    val cap = dfBucketed.join(broadcast(dfOffs), Seq("rb"))
      .withColumn("cum", sum("c").over(
        dw.partitionBy("rb").orderBy("df")
          .rowsBetween(dw.unboundedPreceding, dw.currentRow))
        + col("boff"))
      .filter(col("cum") >=
        ceil(col("nv").cast("double") * lit(TfidfKeepVocabFrac)))
      .agg(min("df").as("df_cap"))
    val weighted = docTerms.join(dfs, Seq("tok"))
      .crossJoin(broadcast(nDocs)) // 1-row scalar
      .crossJoin(broadcast(cap)) // 1-row scalar
      .filter(col("df") <= col("df_cap"))
      .withColumn("idf",
        (col("n").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)))
      .withColumn("w", col("k").cast("double") * col("idf"))
      .select("doc_id", "tok", "w")
      // probe side, candidate side and the norm pass all read this frame
      .transform(graft.ops.QueryLocal.persistTracked)
    val norms = weighted.groupBy("doc_id")
      .agg(sqrt(sum(expr("CAST(w * w AS DECIMAL(38,18))")).cast("double"))
        .as("nrm"))
    val probes = weighted.filter(col("doc_id") < TfidfProbeCount)
      .select(col("doc_id").as("query_id"), col("tok"), col("w").as("wq"))
    val dots = probes.join(weighted, Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("CAST(wq * w AS DECIMAL(38,18))")).cast("double").as("dot"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("c").desc, col("doc_id").asc)
    dots
      .join(norms.select(col("doc_id").as("query_id"), col("nrm").as("qn")),
        Seq("query_id"))
      .join(norms, Seq("doc_id"))
      .withColumn("c", col("dot") / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(byScore).cast("long"))
      .filter(col("rnk") <= TfidfK)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        round(col("c"), 6).as("score"))
      .orderBy("query_id", "rnk")
  }

  /** Hybrid retrieval fusion: the sparse ([[tfidfTopK]]) and dense
    * ([[Similarity.bruteForceTopK]], over the aligned embedding of each
    * document) rankings for the shared probe set, fused by BORDA count —
    * each candidate scores Σ(K+1−rank) over the lists that retrieved it
    * (absence contributes 0), re-ranked by (score desc, id asc). Borda is
    * the integer-exact member of the rank-fusion family: RRF's Σ1/(k+r)
    * is an order-dependent float sum, Borda is bit-stable by
    * construction — the house determinism rule picks it.
    *
    * Scale: both legs are already top-K-truncated per probe (≤K rows ×
    * O(1) probes), so the full-outer fusion join and re-rank run over two
    * tiny frames; the retrieval legs dominate and fusion stays free at
    * any corpus size. */
  def hybridFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val sparse = tfidfTopK(spark, sfDir)
      .select(col("query_id"), col("doc_id").as("cand"), col("rnk").as("rs"))
    val dense = Similarity.bruteForceTopK(spark, sfDir)
      .filter(col("query_id") < TfidfProbeCount)
      .select(col("query_id"), col("neighbor_id").as("cand"),
        col("rnk").as("rd"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("borda").desc, col("cand").asc)
    sparse.join(dense, Seq("query_id", "cand"), "full_outer")
      .withColumn("borda",
        coalesce(lit((TfidfK + 1).toLong) - col("rs"), lit(0L)) +
          coalesce(lit((Similarity.K + 1).toLong) - col("rd"), lit(0L)))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .select("query_id", "fused_rank", "cand", "borda", "rs", "rd")
      .orderBy("query_id", "fused_rank")
  }

  /** END-TO-END corpus-build report — the whole curation funnel as ONE
    * query: documents → exact+near-dup survivors ([[Dedup.dedupedCorpus]])
    * → Gopher quality gate ([[TextAnalysis.gopherRules]] `keep`) →
    * leakage-safe cluster-keyed split ([[Sampling.corpusSplit]]) → per
    * (source, split) document and token counts. This is the acceptance
    * artifact a 100 TB corpus build signs off on, and because every stage
    * reuses the session-shared frames (MinHash pairs, cluster labels), the
    * composition adds only the final semi-join + aggregate on top of work
    * other catalog entries already pay for. Semi-join keeps the document
    * payload out of the funnel — only doc_ids and per-doc stats shuffle. */
  def corpusBuildReport(spark: SparkSession, sfDir: String): DataFrame = {
    val survivors = Dedup.dedupedCorpus(spark, sfDir).select("doc_id")
    val quality = TextAnalysis.gopherRules(spark, sfDir)
      .filter(col("keep")).select(col("doc_id"), col("n_words"))
    val split = Sampling.corpusSplit(spark, sfDir)
      .select(col("doc_id"), col("source"), col("split"))
    split
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
      .orderBy("source", "split")
  }

  // ─────────────────────────────────────────── importance resampling

  /** Hashed-feature bucket count for [[importanceResample]]: 2 md5 hex
    * digits = 256 buckets, the engine-portable spelling shared with
    * [[globalShuffle]]. A production DSIR run uses 2¹⁶+ hashed n-gram
    * buckets — only this constant (and the hex-digit count) changes; the
    * plan shape is bucket-count-independent. */
  val DsirBuckets = 256L

  /** The target distribution: documents of this source play the role of
    * DSIR's high-quality target corpus. */
  val DsirTargetSource = "src0"

  /** Documents selected by [[importanceResample]]. */
  val DsirQuota = 100

  /** Data selection via IMPORTANCE RESAMPLING (the DSIR recipe — Xie et
    * al. 2023, arXiv:2302.03169): score every raw document by how much
    * its hashed-bigram feature distribution looks like a TARGET corpus
    * rather than the raw pool, and keep the top quota. The modern
    * curation move between hand-written quality rules ([[graft.ops
    * .TextAnalysis.gopherRules]]) and model-based filtering.
    *
    * Kept EXACT by clearing denominators (the paper's log-likelihood
    * ratio needs libm `log`, which is not bit-portable — see
    * SURVEY §7.4): per feature bucket f, the add-one-smoothed likelihood
    * ratio rides as integer ppm
    *   `w_f = (ct_f+1)·(N_raw+B)·10⁶ div ((cr_f+1)·(N_tgt+B))`
    * in DECIMAL(38,0) (the impurity_ppm overflow spelling), and a
    * document's score is the integer mean of its features' weights —
    * a monotone transform of the paper's mean-log score under the
    * same ranking use.
    *
    * Scale shape: one map-side-combinable feature count over the corpus,
    * a 256-row weight table broadcast back over the feature stream, one
    * grouped mean per doc, and a TakeOrdered quota cut — no global sort,
    * no window over the corpus (the final rank runs on the quota-sized
    * result). */
  def importanceResample(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Tables.documentsWide(spark, sfDir)
      .withColumn("toks", expr(TextAnalysis.toksExpr))
      .filter(expr("size(toks) >= 2"))
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 2)," +
          " i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      .withColumn("f", expr(hexBucketSql("md5(bg)")))
      .select("doc_id", "source", "f")
      // three consumers (raw counts, target counts, per-doc scoring) —
      // without the cache the tokenize+explode subtree runs three times
      // (measured 3.5× at the 10× ScaleCheck; ~2× after)
      .transform(QueryLocal.persistTracked)
    val raw = feats.groupBy("f").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("source") === DsirTargetSource)
      .groupBy("f").agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("nr"))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("nt"))))
    val w = raw.join(tgt, Seq("f"), "left")
      .crossJoin(broadcast(totals))
      .select(col("f"),
        expr(s"CAST(CAST(coalesce(ct, 0) + 1 AS DECIMAL(38,0))" +
          s" * (nr + $DsirBuckets) * 1000000" +
          s" div (CAST(cr + 1 AS DECIMAL(38,0)) * (nt + $DsirBuckets))" +
          " AS BIGINT)").as("w_ppm"))
    val scored = feats.join(broadcast(w), Seq("f"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_feats"), sum(col("w_ppm")).as("sw"))
      .select(col("doc_id"), col("source"), col("n_feats"),
        expr("sw div n_feats").as("score_ppm"))
    scored.orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(DsirQuota)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_ppm").desc, col("doc_id").asc)).cast("long"))
      .select("rnk", "doc_id", "source", "n_feats", "score_ppm")
      .orderBy("rnk")
  }

  /** Report width for [[invertedIndex]]: terms kept (by document
    * frequency) and postings kept per term (by doc id). */
  val PostingsTerms = 100
  val PostingsDocs = 10

  /** Inverted-index build — the retrieval-infrastructure artifact behind
    * [[bm25]] (that op consumes per-term stats transiently; this one
    * MATERIALIZES the index): per term, document frequency, total term
    * frequency, and the leading postings rendered as "doc:tf" runs.
    *
    * The scale-critical step is the per-term postings cut: a common term's
    * postings list is corpus-sized, and a row_number window would sort all
    * of it per term. The bounded [[graft.functions.TopKAggregator]] keeps
    * the ≤[[PostingsDocs]] smallest doc ids per term BEFORE the shuffle
    * (score = −doc_id turns the max-k aggregator into min-k), then one
    * tiny equi-join recovers each kept posting's tf. Term selection is a
    * TakeOrdered over the term-stats frame; the full postings of the
    * selected terms never materialize anywhere. */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val tf = Tables.documentsWide(spark, sfDir)
      .select(col("doc_id"), explode(expr(TextAnalysis.toksExpr)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
    val terms = tf.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
      .orderBy(col("df").desc, col("tok")).limit(PostingsTerms)
    val kept = tf.join(broadcast(terms.select("tok")), Seq("tok"))
      .select(col("tok"), col("doc_id")).as[(String, Long)]
      .map { case (tok, doc) => (tok, Scored(doc, -doc.toDouble)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(PostingsDocs).toColumn.name("top"))
      .toDF("tok", "top")
      .select(col("tok"), explode(col("top")).as("s"))
      .select(col("tok"), col("s").getField("id").as("doc_id"))
      .join(tf, Seq("tok", "doc_id"))
    val plist = kept.groupBy("tok")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("tf")))),
        x => concat(x.getField("doc_id"), lit(":"), x.getField("tf"))),
        ",").as("postings"))
    terms.join(plist, Seq("tok"))
      .select(col("tok"), col("df"), col("ttf"), col("postings"))
      .orderBy(col("df").desc, col("tok"))
  }
}

package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus cleaning / curation operators over `documents`: within-document
  * repetition removal, per-source document caps, per-language quality
  * pruning, and corpus vocabulary statistics.
  *
  * Same doctrine as [[Corpus]]: deterministic everywhere — dedup keeps the
  * FIRST occurrence (explicit min-position arithmetic, not an engine's
  * unspecified `*_distinct` ordering), caps rank by a salted md5 priority,
  * ties in top-k resolve by term — so the DuckDB oracle reproduces every
  * row and re-runs are idempotent.
  */
object Clean {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsWide(spark, sfDir)
      .withColumn("toks", expr(TextAnalysis.toksExpr))

  /** Overlapping fixed-size chunking (RAG / context-window prep): every
    * document becomes ⌈len/stride⌉ chunks of up to [[ChunkLen]] tokens
    * whose starts step by [[ChunkStride]] (64/48 ⇒ 16-token overlap, the
    * usual retrieval setting so no answer span straddles a boundary
    * uncovered). Tail chunks are short by construction; every
    * stride-aligned start < len emits, so trailing tokens always land in
    * at least one chunk.
    *
    * One narrow projection + explode — no shuffle at any corpus size, and
    * chunk ids are per-document ordinals (deterministic, no global
    * numbering to coordinate). */
  val ChunkLen = 64
  val ChunkStride = 48

  def docChunks(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      // zero-token documents emit no chunks (the oracle's empty range());
      // unguarded, sequence(0, -1, stride) throws at runtime
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(toks) - 1, $ChunkStride),
           |  s -> struct(
           |    CAST(size(slice(toks, s + 1, $ChunkLen)) AS INT) AS n_tokens,
           |    concat_ws(' ', slice(toks, s + 1, $ChunkLen)) AS chunk_text))"""
          .stripMargin)).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        col("c.n_tokens").as("n_tokens"), col("c.chunk_text").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** Within-document repetition removal: rebuild each text from the first
    * occurrence of every distinct token, in original order. Spelled as
    * min-position grouping + positional re-sort (portable), NOT
    * `array_distinct`/`list_distinct` (first-occurrence order is an
    * implementation detail there). Work is proportional to token count;
    * the per-doc aggregates combine map-side. */
  def tokenDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
    base.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy("doc_id", "tok").agg(min("pos").as("p"))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(p, tok))), s -> s.tok)"))
          .as("dedup_text"),
        count(lit(1)).as("n_kept"))
      .join(base.select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_orig")), Seq("doc_id"))
      .select("doc_id", "n_orig", "n_kept", "dedup_text")
      .orderBy("doc_id")
  }

  /** CROSS-document span dedup (the C4 recipe, adapted to fixed spans):
    * chunk every document into [[SpanLen]]-token spans, keep only the
    * globally FIRST occurrence of each distinct span text (min (doc_id,
    * span_idx) — boilerplate that repeats across documents survives exactly
    * once), and rebuild each document from its surviving spans in order.
    *
    * Scale shape: the corpus explodes to ~N/[[SpanLen]] span rows, the
    * keeper choice is one window over span_text (a single exchange on the
    * span hash — identical spans co-locate, everything else passes
    * through), and the rebuild is one grouped positional re-sort. No pair
    * join materializes: cost is linear in corpus size, not in duplicate
    * count squared. Fully-deduplicated documents remain in the output with
    * an empty rebuilt text, so downstream length filters see them. */
  val SpanLen = 10
  def spanDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
    // zero-token docs emit no spans (sequence(0,-1) would throw); they stay
    // in the output through the left join below with n_spans = 0
    val spans = base.filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(0, cast((size(toks) + ${SpanLen - 1}) div $SpanLen as int) - 1),
         |  i -> concat_ws(' ', slice(toks, i * $SpanLen + 1, $SpanLen)))"""
        .stripMargin)).as(Seq("span_idx", "span_text")))
    val kept = spans
      .withColumn("rn", row_number().over(
        Window.partitionBy("span_text").orderBy("doc_id", "span_idx")))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy("doc_id").agg(
      concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(span_idx, span_text))), s -> s.span_text)"))
        .as("clean_text"),
      count(lit(1)).as("n_kept"))
    base.select(col("doc_id"),
        expr(s"cast((size(toks) + ${SpanLen - 1}) div $SpanLen as bigint)")
          .as("n_spans"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Sliding-window length for [[substringDups]] (tokens). */
  val SubLen = 8

  /** ARBITRARY-ALIGNMENT substring duplication (the exact-substring
    * signal of Lee et al. 2022's "Deduplicating Training Data Makes
    * Language Models Better", reduced to fixed length): every
    * [[SubLen]]-token window at EVERY offset — not [[spanDedup]]'s
    * stride-aligned spans, so boilerplate repeating at any alignment is
    * caught — is keyed by content, the globally FIRST occurrence
    * (min (doc_id, position)) is the original, and every later
    * occurrence (across documents or self-repeats within one) counts as
    * duplicated. Reported per document: windows, duplicated windows, and
    * the duplicated share in per-mille — the measurement a pipeline runs
    * to decide whether substring-level dedup is worth its cost on a
    * corpus.
    *
    * Scale shape: the window stream is [[SubLen]]× the token stream
    * (linear); the first-occurrence choice is ONE window partitioned by
    * the window's md5 (identical substrings co-locate, everything else
    * streams through); the rollup is a map-side-combinable per-doc
    * aggregate. No pair join — cost is corpus-linear, not duplicate².
    * Documents shorter than [[SubLen]] stay in the output with zero
    * windows and a NULL share. */
  def substringDups(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
    val wins = base.filter(size(col("toks")) >= SubLen)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(toks) - $SubLen),
           |  i -> md5(concat_ws(' ', slice(toks, i + 1, $SubLen))))"""
          .stripMargin)).as(Seq("pos", "gh")))
    val marked = wins.withColumn("rn", row_number().over(
      Window.partitionBy("gh").orderBy("doc_id", "pos")))
    val perDoc = marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup"))
    base.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        expr("CASE WHEN n_windows > 0" +
          " THEN n_dup * 1000 div n_windows END").as("dup_pml"))
      .orderBy("doc_id")
  }

  /** Per-source document cap (the per-domain cap of web curation): keep at
    * most [[SourceCap]] documents per source, chosen by a salted-hash
    * priority so the survivors are a stable pseudo-random sample, not
    * whatever happens to sort first. One shuffle on source; at 100 TB the
    * rank is per-source-partition parallel and the cap bounds every
    * group's output. */
  val SourceCap = 15
  def sourceCap(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit("_cap"))).as("prio"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("prio", "doc_id")).cast("long"))
      .filter(col("rn") <= SourceCap)
      .select("doc_id", "source", "rn")
      .orderBy("doc_id")

  /** Per-language quality pruning: keep the top half of each language by
    * [[TextAnalysis.quality]]'s composite score (`percent_rank >= 0.5`;
    * ties share a rank, so equal-scored documents share a fate). The window
    * is partitioned by language — parallel across groups, never a global
    * sort. */
  def qualityPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    Tables.documents(spark, sfDir).select("doc_id", "lang")
      .join(q, Seq("doc_id"))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("lang").orderBy("quality_score")))
      .filter(col("pr") >= 0.5)
      .select("doc_id", "lang", "quality_score", "pr")
      .orderBy("doc_id")
  }

  /** Corpus vocabulary: top-[[VocabK]] tokens by document-independent term
    * frequency (ties → lexicographic). The classic word-count shape: the
    * per-token partial aggregate combines map-side, the top-k is a
    * TakeOrdered — nothing materializes a global sort. */
  /** Span-corruption training pairs (the T5/UL2 denoising objective):
    * tokens group into [[CorruptSpanLen]]-token spans, every
    * [[MaskEvery]]-th span is masked, the input replaces each masked
    * span with a numbered sentinel, and the target is the
    * sentinel-delimited concatenation of exactly the masked content.
    * Deterministic by construction (span position, not RNG, decides the
    * mask — the house rule that makes the pair generation
    * oracle-checkable and resumable at any partition count).
    *
    * Scale: a PURE PROJECTION — higher-order array functions inside one
    * whole-stage-codegen pass over the scan; zero shuffles, zero joins.
    * Example-generation at 100 TB is exactly this shape: embarrassingly
    * parallel, output partitioned like the input. */
  val CorruptSpanLen = 3
  val MaskEvery = 5

  def spanCorruption(spark: SparkSession, sfDir: String): DataFrame = {
    val L = CorruptSpanLen; val M = MaskEvery
    val sentinel = s"concat('<extra_id_', cast(s div $M as string), '>')"
    docs(spark, sfDir)
      .filter(col("text").isNotNull && size(col("toks")) >= 1)
      .withColumn("n_spans",
        expr(s"cast((size(toks) + ${L - 1}) div $L as int)"))
      .select(col("doc_id"),
        expr(s"""concat_ws(' ', flatten(transform(sequence(0, n_spans - 1),
          |  s -> IF(s % $M = 0, array($sentinel),
          |          slice(toks, s * $L + 1, $L)))))""".stripMargin)
          .as("input_text"),
        expr(s"""concat_ws(' ', flatten(transform(
          |  filter(sequence(0, n_spans - 1), s -> s % $M = 0),
          |  s -> concat(array($sentinel), slice(toks, s * $L + 1, $L)))))"""
          .stripMargin).as("target_text"),
        expr(s"""cast(size(flatten(transform(
          |  filter(sequence(0, n_spans - 1), s -> s % $M = 0),
          |  s -> slice(toks, s * $L + 1, $L)))) as bigint)""".stripMargin)
          .as("n_masked"))
      .orderBy("doc_id")
  }

  val VocabK = 100
  def vocabTop(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(VocabK)

  /** Tokenization to ids: apply the [[vocabTop]] vocabulary as a broadcast
    * token→id map (id = 1-based frequency rank; out-of-vocabulary → 0, the
    * UNK convention) and emit each document's ordered id sequence — the
    * text→ids step a trainer consumes. The corpus explodes to (doc, pos,
    * tok), the TINY vocab broadcasts (never the corpus), and one grouped
    * positional re-sort rebuilds sequences; sequence length is carried so
    * downstream packing needs no re-tokenization. */
  def tokenIds(spark: SparkSession, sfDir: String): DataFrame =
    tokenIdRows(spark, sfDir).orderBy("doc_id")

  /** Unsorted [[tokenIds]] — the JOIN-INPUT form for composition
    * ([[Corpus.packedSequences]] and the mix→pack pipeline repartition it
    * anyway; they must not pay a global sort nobody keeps). */
  private[ops] def tokenIdRows(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = vocabTop(spark, sfDir)
      .withColumn("id", row_number().over(
        Window.orderBy(col("n").desc, col("tok").asc)).cast("long"))
      .select("tok", "id")
    docs(spark, sfDir)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("id", coalesce(col("id"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, id))), s -> s.id)")
          .as("ids"),
        count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("ids"))
  }

  /** Collocation mining: token pairs that co-occur in documents far more
    * than chance — ranked by RATIONAL lift `N·c_ab / (c_a·c_b)` (the
    * log-free PMI analog, same reasoning as [[Corpus.bm25]]'s idf: ln is
    * the one op libms round differently). Document-level co-occurrence:
    * distinct tokens per doc self-joined into ordered pairs (work bounded
    * by per-doc vocabulary²), per-token doc frequencies broadcast. Pairs
    * below [[MinPairDf]] docs are noise and are cut before ranking. */
  val MinPairDf = 5L
  def collocations(spark: SparkSession, sfDir: String): DataFrame = {
    val dtok = docs(spark, sfDir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .distinct()
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val df = dtok.groupBy("tok").agg(count(lit(1)).as("c"))
    val pairs = dtok.select(col("doc_id"), col("tok").as("t1"))
      .join(dtok.select(col("doc_id"), col("tok").as("t2")), Seq("doc_id"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= MinPairDf)
    pairs
      .join(broadcast(df.select(col("tok").as("t1"), col("c").as("c_a"))), Seq("t1"))
      .join(broadcast(df.select(col("tok").as("t2"), col("c").as("c_b"))), Seq("t2"))
      .crossJoin(broadcast(nDocs))
      .withColumn("lift",
        col("n_docs").cast("double") * col("c_ab").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")))
      .select(col("t1"), col("t2"), col("c_ab"),
        round(col("lift"), 6).as("lift"))
      .orderBy(col("lift").desc, col("t1"), col("t2"))
      .limit(VocabK)
  }

  /** Top-[[VocabK]] adjacent-token bigrams — same shape as [[vocabTop]]
    * with a positional zip (no self-join; the bigram list is built inside
    * one codegen'd projection). */
  def bigramTop(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(expr("size(toks) >= 2"))
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(VocabK)

  /** Common-bigram coverage: for each document, the share of its adjacent
    * bigram POSITIONS whose bigram is in the corpus top-[[VocabK]] list —
    * an LM-free fluency proxy (text whose word transitions never hit the
    * corpus's common transitions is boilerplate, word salad, or the wrong
    * language; used as a cheap perplexity stand-in when no LM is at hand).
    * Reported per-mille as exact integer division, so no float enters the
    * result. Cost: the top list is [[VocabK]] rows → broadcast; the per-doc
    * side is one explode + map-side-combinable count — the corpus never
    * shuffles by bigram twice. */
  /** Vocabulary sizes at which [[vocabCoverage]] reports corpus coverage. */
  val CoverageSizes = Seq(10, 50, 100, 500, 1000)

  /** Vocabulary coverage curve — the tokenizer-sizing artifact: for each
    * candidate vocab size V, the share of corpus token POSITIONS covered by
    * the top-V tokens (by frequency, ties lexicographic). The elbow of this
    * curve is how a vocab budget is chosen; the complement is the OOV rate
    * a V-sized vocab would pay. Exact per-mille integers. Cost: one token
    * count (map-side combinable) + [[CoverageSizes]] TakeOrdered top-V
    * probes over the cached count frame — the corpus is scanned once and
    * nothing vocab-sized ever globally sorts. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = docs(spark, sfDir)
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val total = counts.agg(sum(col("c")).as("total_tokens"))
    CoverageSizes.map { v =>
      counts.orderBy(col("c").desc, col("tok").asc).limit(v)
        .agg(coalesce(sum(col("c")), lit(0L)).as("covered"))
        .crossJoin(broadcast(total))
        .select(lit(v.toLong).as("vocab_size"), col("covered"),
          col("total_tokens"),
          expr("covered * 1000 div total_tokens").as("coverage_pml"))
    }.reduce(_ unionByName _).orderBy("vocab_size")
  }

  /** Interpolated Kneser-Ney bigram table size. */
  val KnTopK = 50

  /** Interpolated Kneser-Ney smoothed bigram probabilities for the corpus's
    * top-[[KnTopK]] bigrams — the textbook LM smoothing (absolute discount
    * d = 3/4 to the continuation distribution), kept EXACT by clearing
    * denominators: with integer counts c12, c1 (left-context count), n1fw
    * (distinct followers of w1), n1pr (distinct predecessors of w2) and N
    * (bigram types),
    *   p_KN = max(c12−3/4, 0)/c1 + (3/4)·(n1fw/c1)·(n1pr/N)
    *        = (max(4·c12−3, 0)·N + 3·n1fw·n1pr) / (4·c1·N)
    * — one float division at the end of all-integer numerators. Cost: one
    * bigram count (map-side combinable), two marginal aggregates over the
    * bigram-type frame (tiny vs the corpus), one scalar N broadcast. */
  def knBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = docs(spark, sfDir)
      .filter(expr("size(toks) >= 2"))
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val left = bg.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val right = bg.groupBy("w2").agg(count(lit(1)).as("n1pr"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    bg.join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1fw"), col("n1pr"), col("n_types"),
        // DECIMAL(38,0) intermediates: 4·c12·N overflows long at corpus
        // scale (c12,N ~ 1e10+ on 100 TB)
        round((greatest(lit(4L) * col("c12") - 3L, lit(0L))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("n_types")
          + lit(3L).cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("n1fw") * col("n1pr")).cast("double")
          / (lit(4L).cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("c1") * col("n_types")).cast("double"), 6)
          .as("p_kn"))
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(KnTopK)
  }

  def bigramCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val top = bigramTop(spark, sfDir).select("bigram")
    docs(spark, sfDir)
      .filter(expr("size(toks) >= 2"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .as("bigram"))
      .join(broadcast(top.withColumn("hit", lit(1L))), Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("coverage_pml", expr("hits * 1000 div n_bigrams"))
      .orderBy("doc_id")
  }

  /** Per-document LM fluency score from the corpus-trained Kneser-Ney
    * bigram model ([[knBigrams]]): the mean interpolated-KN probability of
    * the document's bigrams, quantized to integer ppm PER BIGRAM before
    * averaging. That quantization is what keeps perplexity-style filtering
    * oracle-checkable — true perplexity needs `log` (libm, not
    * bit-portable) and a float product that underflows at document length;
    * an integer mean of integer per-bigram scores is exact at any scale
    * and induces the same quality ranking.
    *
    * Every bigram in every doc is in the trained table by construction, so
    * the probability join is total. Magnitudes: numerators reach ~4·c12·V·
    * 1e6 — DECIMAL(38,0) on the Spark side, HUGEINT in the oracle. */
  def docLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val bgd = docs(spark, sfDir)
      .filter(expr("size(toks) >= 2"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bg = bgd.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .transform(graft.ops.QueryLocal.persistTracked)
    val left = bg.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val right = bg.groupBy("w2").agg(count(lit(1)).as("n1pr"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    val p = bg.join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"),
        ((greatest(lit(4L) * col("c12") - 3L, lit(0L)).cast(dec)
            * col("n_types")
          + lit(3L).cast(dec) * col("n1fw") * col("n1pr")) * 1000000)
          .as("num"),
        (lit(4L).cast(dec) * col("c1") * col("n_types")).as("den"))
      .select(col("w1"), col("w2"), expr("CAST(num div den AS BIGINT)").as("ppm"))
    bgd.join(p, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("lm_score_ppm"))
      .orderBy("doc_id")
  }

  /** Blocklist terms for the safety screen — literal so the oracle repeats
    * them; stand-in for the word-level unsafe-content lists (LDNOOBW-style)
    * every corpus pipeline applies before training. */
  val Blocklist: Seq[String] = Seq("slow", "crash", "vector")

  /** Word-level blocklist screen: per source, how many documents contain at
    * least one [[Blocklist]] term and the flagged share in per-mille —
    * the cheap lexical safety gate that runs before any model-based
    * filter. `exists` over the token array short-circuits per row inside
    * codegen; the rollup is one map-side-combinable aggregate. */
  def blocklistScreen(spark: SparkSession, sfDir: String): DataFrame = {
    val list = Blocklist.map(w => s"'$w'").mkString(", ")
    docs(spark, sfDir)
      .select(col("source"),
        expr(s"CASE WHEN exists(toks, t -> t IN ($list)) THEN 1L ELSE 0L END")
          .as("hit"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("hit")).as("n_flagged"))
      .withColumn("flagged_pml", expr("n_flagged * 1000 div n_docs"))
      .orderBy("source")
  }

  /** Heaps'-law vocabulary growth curve: cumulative distinct tokens vs
    * cumulative token positions as the corpus accumulates in doc-id order,
    * sampled at ten corpus deciles — the empirical curve that predicts
    * vocab size at 10×/100× the data (fit V = K·nᵝ offline on these
    * points). Exact by construction: a token's first appearance is a
    * per-token min (map-side combinable over the full token stream);
    * everything after runs on decile-grained rows.
    *
    * The doc-id rank is the TWO-PHASE distributed form ([[Corpus
    * .globalShuffle]]'s pattern, here with ORDER-PRESERVING range buckets
    * on doc_id): 256 bucket counts prefix-summed on a 256-row frame and
    * broadcast back, per-bucket `row_number` in parallel shards. Because
    * the bucket index is monotone in doc_id, offset + shard rank IS the
    * global doc-id rank — no unpartitioned ordering window ever touches
    * the ~|docs| frame (at 100 TB that frame is billions of rows and a
    * global window funnels them through one task). Windows beyond that
    * touch only the 256-row offset frame and the 10-row decile rollup —
    * the token stream itself is never sorted. */
  def heapsCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, sfDir)
      .select(col("doc_id"), expr("size(toks)").cast("long").as("n_toks"))
    val bounds = d.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
      count(lit(1)).as("n_tot"))
    // monotone 256-way range bucket over the observed doc_id span; exact
    // Long arithmetic (span·256 < 2^63 for any realistic id space)
    val bucketed = d.crossJoin(broadcast(bounds))
      .withColumn("rb",
        expr("CAST((doc_id - mn) * 256 div (mx - mn + 1) AS INT)"))
    val offsets = bucketed.groupBy("rb").agg(count(lit(1)).as("c"))
      .withColumn("off",
        sum(col("c")).over(Window.orderBy("rb")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("c"))
      .select("rb", "off")
    val ranked = bucketed.join(broadcast(offsets), Seq("rb"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("rb").orderBy("doc_id"))
          .cast("long") + col("off"))
      .withColumn("decile", expr("(rank - 1) * 10 div n_tot + 1"))
    val maxDoc = ranked.groupBy("decile")
      .agg(max(col("doc_id")).as("max_doc"),
        count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_positions"))
    val first = docs(spark, sfDir)
      .select(col("doc_id"), explode(expr(TextAnalysis.toksExpr)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
    val firstDecile = first
      .join(broadcast(maxDoc.select("decile", "max_doc")),
        col("first_doc") <= col("max_doc"))
      .groupBy("tok").agg(min(col("decile")).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("n_new_tokens"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    maxDoc.join(firstDecile, Seq("decile"), "left")
      .select(col("decile").cast("long").as("decile"),
        sum(col("n_docs")).over(w).as("n_docs_cum"),
        sum(col("n_positions")).over(w).as("n_positions_cum"),
        sum(coalesce(col("n_new_tokens"), lit(0L))).over(w)
          .as("n_distinct_cum"))
      .orderBy("decile")
  }
}

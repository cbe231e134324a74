package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd native/higher-order functions — no
  * UDFs — so at 100 TB each document is processed in one whole-stage-codegen
  * pass over the scan with zero shuffles until the (optional) aggregate.
  * Every score is deterministic arithmetic mirrored 1:1 in the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokenization, shared by all text operators. */
  val toksExpr = "split(trim(text), '\\\\s+')"

  /** Per-language marker-word lists for the n-gram/stopword language-ID
    * heuristic. Mirrored in the oracle SQL — keep in sync with
    * [[graft.Oracle.langMarkers]]. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "y", "un"),
    "fr" -> Seq("le", "la", "et", "est", "un"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).withColumn("toks", expr(toksExpr))

  private def markerCount(lang: String): Column = {
    val list = LangMarkers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(toks, x -> x IN ($list)))").cast("long")
  }

  /** Language ID: score each candidate language by marker-word hits, pick the
    * argmax (ties resolved alphabetically by the CASE order — deterministic). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = docs(spark, sfDir)
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        LangMarkers.map { case (l, _) => markerCount(l).as(s"s_$l") }: _*)
    val best = greatest(LangMarkers.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = LangMarkers.foldRight(lit("und")) { case ((l, _), rest) =>
      when(col(s"s_$l") === col("best_score"), l).otherwise(rest)
    }
    scored.withColumn("best_score", best)
      .withColumn("predicted_lang", predicted)
      .withColumn("is_match", col("predicted_lang") === col("actual_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: word/char counts, average word length, stopword ratio,
    * and a composite [0,1] score — length-normalized and stopword-penalized. */
  def quality(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr("size(toks)").cast("long").as("n_words"),
        expr("aggregate(transform(toks, x -> length(x)), 0L, (a, x) -> a + x)")
          .as("sum_word_len"),
        markerCount("en").as("n_stopwords"))
      .withColumn("avg_word_len",
        col("sum_word_len").cast("double") / col("n_words").cast("double"))
      .withColumn("stop_ratio",
        col("n_stopwords").cast("double") / col("n_words").cast("double"))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_words").cast("double") / 20.0)
          * (lit(1.0) - lit(0.5) * col("stop_ratio")), 6))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** End-to-end corpus filter — the composed LLM-training-data use case:
    * keep one survivor per exact-duplicate group, drop short and
    * stopword-heavy documents. Genuinely ONE scan: quality features and the
    * content hash come off the same projection, and the keeper choice is a
    * min-over-hash window on that frame (no second read, no pair work). */
  def trainingCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy("h")
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), md5(col("text")).as("h"),
        expr("size(toks)").cast("long").as("n_words"),
        markerCount("en").as("n_stopwords"))
      .withColumn("keeper", min("doc_id").over(byHash))
      .filter(col("doc_id") === col("keeper"))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_words").cast("double") / 20.0)
          * (lit(1.0) - lit(0.5) * col("n_stopwords").cast("double")
            / col("n_words").cast("double")), 6))
      .filter(col("n_words") >= 20 && col("quality_score") >= 0.5)
      .select("doc_id", "n_words", "quality_score")
      .orderBy("doc_id")
  }

  /** Gopher-family document quality rules (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", appendix A1.1): per document, the measured
    * statistic AND the pass/fail flag for each rule, plus the composed
    * `keep` decision — the rule-based pre-filter every web-scale corpus
    * runs before dedup. Rules (thresholds calibrated to this corpus; the
    * STRUCTURE is Gopher's):
    *   1. word count within [[GopherMinWords]]..[[GopherMaxWords]]
    *   2. mean word length within 3..10
    *   3. distinct-token ratio ≥ 0.5 (repetition guard)
    *   4. top-token dominance ≤ 0.1 (boilerplate guard)
    *   5. alphabetic-word fraction ≥ 0.8 (symbol-soup guard)
    *
    * Scale shape: every statistic — including the per-doc mode frequency —
    * is computed INSIDE the row over the token array (O(distinct·len) per
    * doc), so the whole operator is one narrow codegen'd projection: no
    * explode, no shuffle, at any corpus size. Fractions are single IEEE
    * divisions of exact integers (bit-equal in DuckDB). */
  val GopherMinWords = 20L
  val GopherMaxWords = 100L

  def gopherRules(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      // NULL-text docs have NULL toks: Spark's size/aggregate and DuckDB's
      // len/list_* disagree on null propagation, so exclude them explicitly
      // (mirrored in the oracle); they carry no text to rule on anyway
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_words"),
        expr("aggregate(transform(toks, x -> length(x)), 0L, (a, x) -> a + x)")
          .as("sum_len"),
        expr("size(array_distinct(toks))").cast("long").as("n_distinct"),
        expr("""array_max(transform(array_distinct(toks),
                 t -> size(filter(toks, x -> x = t))))""").cast("long")
          .as("top_tok_n"),
        expr("size(filter(toks, x -> x rlike '[a-zA-Z]'))").cast("long")
          .as("n_alpha"))
      .withColumn("mean_word_len",
        col("sum_len").cast("double") / col("n_words").cast("double"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_words").cast("double"))
      .withColumn("top_tok_frac",
        col("top_tok_n").cast("double") / col("n_words").cast("double"))
      .withColumn("alpha_frac",
        col("n_alpha").cast("double") / col("n_words").cast("double"))
      .withColumn("r_words",
        col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
      .withColumn("r_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_distinct", col("distinct_ratio") >= 0.5)
      .withColumn("r_top_tok", col("top_tok_frac") <= 0.1)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("keep",
        col("r_words") && col("r_word_len") && col("r_distinct") &&
          col("r_top_tok") && col("r_alpha"))
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        round(col("distinct_ratio"), 6).as("distinct_ratio"),
        round(col("top_tok_frac"), 6).as("top_tok_frac"),
        round(col("alpha_frac"), 6).as("alpha_frac"),
        col("r_words"), col("r_word_len"), col("r_distinct"),
        col("r_top_tok"), col("r_alpha"), col("keep"))
      .orderBy("doc_id")

  /** Gopher-style repetition signals: per document, the fraction of n-grams
    * that are repeats of an earlier identical n-gram (`dup{2,3}_frac`) and
    * the share of the single most frequent bigram (`top2_frac`) — the
    * signals web-corpus curation uses to drop boilerplate and looped text.
    *
    * One scan: bigrams and trigrams are tagged (`2#`/`3#`) and emitted from
    * a single projection, so the per-(doc, gram) count and the per-doc
    * rollup are two map-side-combinable aggregates over one exchange.
    * Fractions are a single IEEE division of exact integer counts — no
    * accumulation-order or libm concerns, so the DuckDB oracle reproduces
    * every bit. */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
    val grams = base
      .filter(expr("size(toks) >= 2"))
      .select(col("doc_id"), explode(expr(
        """concat(
          |  transform(sequence(0, size(toks) - 2),
          |    i -> concat('2#', toks[i], ' ', toks[i+1])),
          |  CASE WHEN size(toks) >= 3 THEN
          |    transform(sequence(0, size(toks) - 3),
          |      i -> concat('3#', toks[i], ' ', toks[i+1], ' ', toks[i+2]))
          |  ELSE array() END)""".stripMargin)).as("gram"))
    val perGram = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val two = col("gram").startsWith("2#")
    val stats = perGram.groupBy("doc_id").agg(
      sum(when(two, col("c"))).as("n2"),
      count(when(two, lit(1))).as("d2"),
      max(when(two, col("c"))).as("top2"),
      sum(when(!two, col("c"))).as("n3"),
      count(when(!two, lit(1))).as("d3"))
    def frac(num: Column, den: Column): Column =
      when(coalesce(den, lit(0L)) > 0,
        num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    base.select("doc_id").join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        frac(col("n2") - col("d2"), col("n2")).as("dup2_frac"),
        frac(col("top2"), col("n2")).as("top2_frac"),
        coalesce(col("n3"), lit(0L)).as("n3"),
        frac(col("n3") - col("d3"), col("n3")).as("dup3_frac"))
      .orderBy("doc_id")
  }

  /** Distinct 3-word shingles per document — the base for fingerprinting and
    * MinHash ([[Dedup]]). Docs shorter than 3 tokens are excluded (both
    * engines). */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin))
        .as("sh"))

  /** Document fingerprint: min-hash-of-shingles (winnowing-style content
    * signature — equal fingerprints ⇒ near-identical leading content) plus
    * the distinct-shingle count. */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    shingles(spark, sfDir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), min(md5(col("sh"))).as("fingerprint"))
      .orderBy("doc_id")
}

package graft

import graft.ops.Corpus
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  private val sf = GraftSpark.Sf

  test("mix lands every source in its deterministic epoch interval") {
    val stats = Corpus.mixStats(spark, sf).collect()
    val tTotal = stats.map(_.getAs[Long]("raw_tokens")).sum
    val budget = Corpus.BudgetFactor * tTotal
    // every doc gets floor or floor+1 epochs, so source token mass is HARD
    // bounded by [floor*t_s, (floor+1)*t_s]; the fractional-epoch hash is a
    // per-doc estimator, so only the CORPUS total tracks the budget tightly
    stats.foreach { r =>
      val (w, ts) = (r.getAs[Long]("weight"), r.getAs[Long]("raw_tokens"))
      val floor = (w * budget) / (Corpus.SumWeights * ts)
      val got = r.getAs[Long]("mixed_tokens")
      assert(got >= floor * ts && got <= (floor + 1) * ts,
        s"${r.getAs[String]("source")}: $got outside [${floor * ts}, ${(floor + 1) * ts}]")
    }
    val mixedTotal = stats.map(_.getAs[Long]("mixed_tokens")).sum.toDouble
    assert(math.abs(mixedTotal - budget) / budget < 0.10,
      s"corpus total $mixedTotal vs budget $budget")
  }

  test("mix epochs are dense 1..reps per doc and deterministic") {
    val mix = Corpus.corpusMix(spark, sf)
    val perDoc = mix.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
    assert(perDoc.filter(col("n") =!= col("mx") || col("mn") =!= 1).isEmpty)
    // idempotence: a re-run builds the identical frame
    assert(mix.exceptAll(Corpus.corpusMix(spark, sf)).isEmpty)
  }

  test("two-phase global shuffle equals the single-window global rank") {
    val got = Corpus.globalShuffle(spark, sf)
    val flat = got.select("doc_id", "skey")
      .withColumn("pos",
        row_number().over(Window.orderBy("skey", "doc_id")).cast("long"))
    assert(got.exceptAll(flat).isEmpty && flat.exceptAll(got).isEmpty)
    // pos is a permutation of 1..N
    val n = got.count()
    assert(got.agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head() == ((1L, n, n)))
  }

  test("packing tiles each shard contiguously from offset 0") {
    val plan = Corpus.packPlan(spark, sf)
    val w = Window.partitionBy("sbucket").orderBy("start_off")
    val bad = plan
      .withColumn("prev_end", lag(col("start_off") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end") ||
        col("pack_first") > col("pack_last") ||
        col("pack_first") =!= expr(s"start_off DIV ${Corpus.SeqLen}"))
    assert(bad.isEmpty)
    // a doc spans exactly the packs its token range covers
    val spanBad = plan.filter(col("pack_last") - col("pack_first") =!=
      expr(s"(start_off % ${Corpus.SeqLen} + n_tokens - 1) DIV ${Corpus.SeqLen}"))
    assert(spanBad.isEmpty)
  }

  test("packed sequences tile each shard full except its last pack") {
    val packs = Corpus.packedSequences(spark, sf)
      .select(col("sbucket"), col("pack"), col("n_fill"), size(col("ids")).as("sz"))
    assert(packs.filter(col("sz") =!= col("n_fill")).isEmpty)
    val lastPack = packs.groupBy("sbucket").agg(max("pack").as("last"))
    val partialNotLast = packs.join(lastPack, Seq("sbucket"))
      .filter(col("n_fill") =!= Corpus.SeqLen && col("pack") =!= col("last"))
    assert(partialNotLast.isEmpty)
    // conservation: every token id lands in exactly one pack
    val total = packs.agg(sum("n_fill")).head().getLong(0)
    val expected = graft.ops.Clean.tokenIds(spark, sf)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(total == expected)
  }

  test("mixed packs conserve exactly the epoch-amplified token stream") {
    val packs = Corpus.mixedPackedSequences(spark, sf)
    assert(packs.filter(size(col("ids")) =!= col("n_fill")).isEmpty)
    val total = packs.agg(sum("n_fill")).head().getLong(0)
    // expected: every (doc, epoch) contributes the doc's ws-token count
    val expected = Corpus.corpusMix(spark, sf).select("doc_id")
      .join(graft.ops.Clean.tokenIds(spark, sf), Seq("doc_id"))
      .agg(sum("n_tokens")).head().getLong(0)
    assert(total == expected, s"$total vs $expected")
    // amplified stream is strictly larger than the single-epoch packing
    val single = Corpus.packedSequences(spark, sf)
      .agg(sum("n_fill")).head().getLong(0)
    assert(total > single)
  }

  test("decontamination flags no eval docs and only true overlaps") {
    val flagged = Corpus.decontaminate(spark, sf)
    assert(flagged.filter(col("doc_id") % 29 === 7).isEmpty)
    assert(flagged.filter(col("n_shared") < 1).isEmpty)
    // spot-check: every flagged doc really shares a shingle with the eval set
    val sh = graft.ops.TextAnalysis.shingles(spark, sf)
    val evalSh = sh.filter(col("doc_id") % 29 === 7).select("sh").distinct()
    val verified = sh.join(evalSh, Seq("sh")).select("doc_id").distinct()
    assert(flagged.join(verified, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("negative pairs: k per doc, never self, valid ids, deterministic") {
    import org.apache.spark.sql.functions._
    val negs = Corpus.negativePairs(spark, sf)
    val perDoc = negs.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(_.getAs[Long]("count") == Corpus.NumNegatives))
    assert(negs.filter(col("doc_id") === col("neg_id")).count() == 0)
    // every negative is a real document
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id").as("neg_id"))
    assert(negs.join(docs, Seq("neg_id"), "left_anti").isEmpty)
    // bit-deterministic across runs
    assert(negs.collect().toSeq == Corpus.negativePairs(spark, sf).collect().toSeq)
  }

  test("bm25 scores are positive, capped at 50, and tf-monotone") {
    val res = Corpus.bm25(spark, sf).collect()
    assert(res.length <= 50 && res.forall(_.getAs[Double]("score") > 0))
    // descending by (score, doc_id asc) — the deterministic cut order
    val pairs = res.map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2); case _ => true })
  }

  test("invertedIndex: postings recount — df/ttf exact, lists are the " +
    "min-doc prefix in doc order") {
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val tf = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).map(tok => (tok, id))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTok = tf.keys.toSeq.groupBy(_._1)
    val terms = byTok.map { case (tok, ks) =>
      (tok, ks.size.toLong, ks.map(tf(_)).sum) }.toSeq
      .sortBy(t => (-t._2, t._1)).take(graft.ops.Corpus.PostingsTerms)
    val expect = terms.map { case (tok, df, ttf) =>
      val posting = byTok(tok).map(_._2).toSeq.sorted
        .take(graft.ops.Corpus.PostingsDocs)
        .map(d => s"$d:${tf((tok, d))}").mkString(",")
      (tok, df, ttf, posting)
    }
    val got = graft.ops.Corpus.invertedIndex(spark, GraftSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }
}

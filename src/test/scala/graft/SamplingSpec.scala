package graft

import graft.ops.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("stratified sample is deterministic and respects per-language rates") {
    val a = Sampling.stratifiedSample(spark, GraftSpark.Sf).collect()
    val b = Sampling.stratifiedSample(spark, GraftSpark.Sf).collect()
    assert(a.sameElements(b))
    // every kept bucket is under its language's rate
    val rates = Sampling.LangRates.toMap
    assert(a.forall { r =>
      r.getAs[Long]("bucket") <
        rates.getOrElse(r.getAs[String]("lang"), Sampling.DefaultRate)
    })
    // the en rate (96/256) keeps a visibly smaller fraction than de (192/256)
    val total = GraftSpark.spark.read
      .parquet(s"${GraftSpark.Sf}/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val frac = (l: String) => kept.getOrElse(l, 0).toDouble / total(l)
    assert(frac("en") < frac("de"))
  }

  test("corpus split covers every document exactly once with all three splits") {
    val s = Sampling.corpusSplit(spark, GraftSpark.Sf)
    val docs = spark.read.parquet(s"${GraftSpark.Sf}/documents.parquet")
    assert(s.count() == docs.count())
    assert(s.select("doc_id").distinct().count() == docs.count())
    val splits = s.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("near-duplicates never straddle splits (leakage safety)") {
    val s = Sampling.corpusSplit(spark, GraftSpark.Sf)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.minhashPairs(spark, GraftSpark.Sf)
    val straddling = pairs
      .join(s.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), Seq("doc_a"))
      .join(s.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.isEmpty)
    // and the split is genuinely cluster-keyed: one split value per cluster
    val perCluster = Sampling.corpusSplit(spark, GraftSpark.Sf)
      .groupBy("split_key").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1)
    assert(perCluster.isEmpty)
  }

  test("reservoir sample: exactly k per source, deterministic, hash-ranked") {
    val s = Sampling.reservoirSample(spark, GraftSpark.Sf).collect()
    val bySource = s.groupBy(_.getAs[String]("source"))
    // every source with >= k docs yields exactly k; ranks are 1..k
    val counts = spark.read.parquet(s"${GraftSpark.Sf}/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val expect = math.min(Sampling.ReservoirK.toLong, counts(src))
      assert(rows.length.toLong == expect, s"source $src")
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ==
        (1L to expect).toSeq, s"ranks $src")
    }
    // membership is a pure function of the ids: re-run identical
    val again = Sampling.reservoirSample(spark, GraftSpark.Sf).collect()
    assert(s.sameElements(again))
    // the sample is the k smallest md5-prefix ranks (spot-check one source)
    val (src0, got) = bySource.head
    val all = spark.read.parquet(s"${GraftSpark.Sf}/documents.parquet")
      .filter(col("source") === src0)
      .select(col("doc_id"),
        expr("conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)")
          .cast("decimal(20,0)").as("h"))
      .orderBy("h", "doc_id")
      .limit(Sampling.ReservoirK)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == all)
  }

  test("temperature mixture: smallest source keeps all, rates follow sqrt") {
    val m = Sampling.temperatureMixture(spark, GraftSpark.Sf).collect()
    val byRate = m.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Double]("keep_rate"),
      r.getAs[Long]("expected_docs")))
    val minN = byRate.map(_._2).min
    // the smallest source's rate is exactly 1.0 and it keeps everything
    byRate.filter(_._2 == minN).foreach { case (_, n, rate, exp) =>
      assert(rate == 1.0); assert(exp == n)
    }
    // rates are monotonically non-increasing in n, expected <= n
    byRate.foreach { case (_, n, rate, exp) =>
      assert(rate > 0.0 && rate <= 1.0)
      assert(exp <= n)
      assert(math.abs(rate - BigDecimal(math.sqrt(minN.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
    }
    // expected docs re-derive: floor(n * sqrt(minN / n))
    byRate.foreach { case (_, n, _, exp) =>
      assert(exp == math.floor(n * math.sqrt(minN.toDouble / n)).toLong)
    }
  }

  test("leakage certificate: zero leaked cluster-keyed rows, totals = |pairs|") {
    val m = Sampling.splitLeakage(spark, GraftSpark.Sf)
    assert(m.filter(col("scheme") === "cluster_keyed" && col("leaked")).isEmpty)
    // both schemes classify every near-dup pair exactly once
    val nPairs = Dedup.minhashPairs(spark, GraftSpark.Sf).count()
    val totals = m.groupBy("scheme").agg(sum("n_pairs").as("n"))
      .select("n").collect().map(_.getLong(0)).toSeq
    assert(totals == Seq(nPairs, nPairs))
  }

  test("weighted priority sample: ranks match the hash-div-weight recount " +
    "and the sample is deterministic") {
    import java.security.MessageDigest
    def prio(id: Long, w: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) / math.max(w, 1L)
    }
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).view.mapValues(ds =>
      ds.map(d => (prio(d._2, d._3), d._2)).sorted
        .take(graft.ops.Sampling.WeightedK).map(_._2).toSeq).toMap
    val got = graft.ops.Sampling.weightedPrioritySample(spark, GraftSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id")))
    val gotBySource = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(gotBySource == expect)
    val again = graft.ops.Sampling.weightedPrioritySample(spark,
      GraftSpark.Sf).collect().map(r => (r.getString(0),
      r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == again.toSeq)
  }

  test("neyman allocation: weights recount from exact moments, budget " +
    "conserved by largest remainder") {
    val rows = graft.ops.Sampling.neymanAllocation(spark, GraftSpark.Sf)
      .collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum ==
      graft.ops.Sampling.NeymanBudget)
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = docs(r.getString(0)).map(_._2)
      val varNum =
        BigInt(xs.length) * xs.map(x => x * x).sum - xs.sum * xs.sum
      val w = math.floor(math.sqrt(varNum.toDouble)).toLong
      assert(r.getAs[Long]("sd_weight") == w, r.getString(0))
      assert(r.getAs[Long]("n_docs") == xs.length)
    }
    // allocation follows the weights: zero-variance strata get ~nothing
    // beyond remainder crumbs; the heaviest stratum gets the most
    val byW = rows.sortBy(_.getAs[Long]("sd_weight"))
    assert(byW.last.getAs[Long]("alloc") >= byW.head.getAs[Long]("alloc"))
  }
}

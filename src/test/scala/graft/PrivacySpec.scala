package graft

import graft.ops.Privacy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.Sf

  test("redaction: no digits survive, pseudonyms are stable and collision-free") {
    val r = Privacy.redactCustomers(spark, sf)
    assert(r.filter(col("name_masked").rlike("[0-9]")).isEmpty)
    // deterministic: a re-run produces the identical mapping
    assert(r.exceptAll(Privacy.redactCustomers(spark, sf)).isEmpty)
    // referential integrity: distinct names <-> distinct pseudonyms
    val names = Tables.customer(spark, sf).select("c_name").distinct().count()
    assert(r.select("pseudonym").distinct().count() == names)
    // banding only coarsens: band <= value < band + 1000
    val bad = r.join(Tables.customer(spark, sf), Seq("c_custkey"))
      .filter(col("c_acctbal") < col("acctbal_band") ||
        col("c_acctbal") >= col("acctbal_band") + 1000.0)
    assert(bad.isEmpty)
  }

  test("redaction is a pure projection: no exchange in the plan") {
    val p = Privacy.redactCustomers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("t-closeness: exact EMD recount in BigInt, bounds, gate consistency") {
    import org.apache.spark.sql.functions._
    val audit = graft.ops.Privacy.tClosenessAudit(spark, GraftSpark.Sf)
      .collect()
    assert(audit.nonEmpty)
    // recompute every group's ordered EMD driver-side with BigInt
    val raw = Tables.customer(spark, GraftSpark.Sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = raw.map(_._3).distinct.sorted
    val nTotal = BigInt(raw.length)
    val globCum = bands.map(b => b -> BigInt(raw.count(_._3 <= b))).toMap
    audit.foreach { a =>
      val (nat, seg) = (a.getAs[Long]("nation"), a.getAs[String]("segment"))
      val grp = raw.filter(x => x._1 == nat && x._2 == seg)
      val n = BigInt(grp.length)
      assert(a.getAs[Long]("n_rows") == grp.length)
      val emdNum = bands.map(b =>
        (nTotal * BigInt(grp.count(_._3 <= b)) - n * globCum(b)).abs).sum
      val expect =
        if (bands.length > 1)
          emdNum * 1000000 / (n * nTotal * BigInt(bands.length - 1))
        else BigInt(0)
      assert(BigInt(a.getAs[Long]("emd_ppm")) == expect, s"group $nat/$seg")
      assert(a.getAs[Long]("emd_ppm") >= 0 && a.getAs[Long]("emd_ppm") <= 1000000)
      assert(a.getAs[Boolean]("publishable") ==
        (a.getAs[Long]("emd_ppm") <= graft.ops.Privacy.TClosenessPpm &&
          grp.length >= graft.ops.Privacy.KAnon))
    }
  }

  test("k-anonymity: published cells >= K, residual hides the rest, total exact") {
    val h = Privacy.kAnonHistogram(spark, sf).collect()
    val (residual, published) = h.partition(_.getAs[String]("segment") == "*")
    assert(published.forall(_.getAs[Long]("n_rows") >= Privacy.KAnon))
    assert(residual.length <= 1)
    // no published quasi-identifier below K, and the counts add back up
    val total = Tables.customer(spark, sf).count()
    assert(h.map(_.getAs[Long]("n_rows")).sum == total)
    // residual really is the sum of all small cells
    val smallSum = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .filter(col("count") < Privacy.KAnon)
      .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
    val resSum = residual.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    assert(resSum == smallSum)
  }

  test("noise release: bounded noise, non-negative clamp, exact counts") {
    val rows = Privacy.noiseRelease(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, noise, rel) = (r.getAs[Long]("n"), r.getAs[Long]("noise"),
        r.getAs[Long]("released"))
      assert(noise >= -Privacy.NoiseHalfWidth && noise <= Privacy.NoiseHalfWidth)
      assert(rel == math.max(n + noise, 0L))
    }
    // underlying histogram is the true per-(token, day) count
    val expect = Tables.transfers(spark, sf)
      .groupBy(col("contract_address"),
        graft.ops.Num.dayBucket(col("transact_at")).cast("long").as("d"))
      .count().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.map(r => ((r.getString(0), r.getLong(1)),
      r.getAs[Long]("n"))).toMap == expect)
  }

  test("count-min sketch: never underestimates, exact counts re-derive, " +
    "estimate within the depth-row sum bound") {
    val rows = graft.ops.Profile.countMinEstimates(spark, sf).collect()
    assert(rows.length == graft.ops.Profile.HeavyHitterK)
    val exact = Tables.transfers(spark, sf)
      .groupBy("to_address").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    rows.foreach { r =>
      val key = r.getString(1)
      assert(r.getAs[Long]("n") == exact(key))
      assert(r.getAs[Long]("overest") >= 0L)
      assert(r.getAs[Long]("n_est") == r.getAs[Long]("n") + r.getAs[Long]("overest"))
      // a cell can never exceed the total stream count
      assert(r.getAs[Long]("n_est") <= total)
    }
  }

  test("source chi2: marginals conserve, terms non-negative, grid complete") {
    val rows = graft.ops.Profile.sourceChi2(spark, sf).collect()
    assert(rows.nonEmpty)
    val nt = rows.head.getAs[Long]("nt")
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
    // per-source observed counts sum to the source size
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("o")).sum == rs.head.getAs[Long]("ns"), src)
      // every source covers the full corpus bucket grid
      assert(rs.map(_.getAs[Long]("bucket")).distinct.length == rs.length, src)
    }
    // bucket marginals sum to the corpus total (once per source)
    val oneSrc = rows.filter(_.getString(0) == rows.head.getString(0))
    assert(oneSrc.map(_.getAs[Long]("nb")).sum == nt)
  }

  test("quantile sketch: exact side is the true order statistic and the " +
    "certified bound holds") {
    val rows = graft.ops.Profile.quantileSketch(spark, GraftSpark.Sf)
      .collect()
    assert(rows.map(_.getAs[Long]("p")).toSeq == Seq(50L, 95L, 99L))
    val xs = Tables.lineitem(spark, GraftSpark.Sf)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val n = xs.length
    rows.foreach { r =>
      val p = r.getAs[Long]("p").toInt
      val exact = xs(((p * n + 99) / 100 - 1).toInt)
      assert(r.getAs[Double]("exact") == exact, s"p$p")
      assert(r.getAs[Boolean]("within_bound"), s"p$p")
      assert(math.abs(r.getAs[Double]("estimate") - exact)
        <= r.getAs[Double]("max_error") + 1e-6, s"p$p")
    }
  }

  test("join cardinality: exact side recounts, sketch never underestimates") {
    val row = graft.ops.Profile.joinCardinality(spark, GraftSpark.Sf)
      .collect().head
    val t = Tables.transfers(spark, GraftSpark.Sf)
      .select("from_address", "to_address").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val outs = t.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ins = t.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val exact = outs.keySet.intersect(ins.keySet)
      .map(k => outs(k) * ins(k)).sum
    assert(row.getAs[Long]("exact_pairs") == exact)
    assert(row.getAs[Boolean]("never_under"))
    assert(row.getAs[Long]("overest") ==
      row.getAs[Long]("est_pairs") - exact)
    assert(row.getAs[Long]("overest") >= 0)
  }

  test("bootstrapCi: thresholds are the Poisson(1) CDF; replicate means " +
    "bracket the point estimate and replay in plain Scala") {
    // the lattice constants really are the Poisson(1) CDF: successive
    // threshold INCREMENTS match e^-1/k! on the 2^48 lattice, and the
    // tail mass beyond k=8 is ~1.1e-6
    val ths = graft.ops.Profile.PoissonThresholds48
    var fact = 1.0
    ths.zipWithIndex.foreach { case (t, k) =>
      if (k > 0) fact *= k
      val pmf = math.exp(-1.0) / fact * math.pow(2, 48)
      val delta = t - (if (k == 0) 0L else ths(k - 1))
      assert(math.abs(delta - pmf) <= 4.0, s"k=$k delta=$delta pmf=$pmf")
    }
    val tail = 1.0 - ths.last / math.pow(2, 48)
    assert(tail > 0 && tail < 2e-6, s"tail=$tail")
    val got = graft.ops.Profile.bootstrapCi(spark, GraftSpark.Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lo, med, hi) = (r.getAs[Long]("lo_ucents"),
        r.getAs[Long]("med_ucents"), r.getAs[Long]("hi_ucents"))
      assert(lo <= med && med <= hi)
      // the point mean lies inside the (generous) bootstrap band
      val p = r.getAs[Long]("point_ucents")
      assert(p >= lo - (hi - lo) && p <= hi + (hi - lo),
        s"point $p outside [$lo, $hi] band")
    }
    // full plain-Scala replay of one replicate's weighted mean
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.transfers(spark, GraftSpark.Sf)
      .select("contract_address", "block_number", "log_index", "value")
      .collect().map(r => (r.getString(0),
        s"${r.getLong(1)}:${r.getLong(2)}",
        (BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt))
    def w(key: String, b: Int): Int = {
      val u = java.lang.Long.parseLong(md5hex(s"$key:$b").take(12), 16)
      ths.indexWhere(u < _) match { case -1 => 9; case k => k }
    }
    val tok = rows.head._1
    val reps = (0 until graft.ops.Profile.BootstrapB).flatMap { b =>
      val xs = rows.filter(_._1 == tok).map(t => (w(t._2, b), t._3))
      val sw = xs.map(_._1).sum
      if (sw == 0) None
      else Some((xs.map { case (ww, c) => c * ww }.sum * 1000000 /
        sw).toLong)
    }.sorted
    val row = got.find(_.getString(0) == tok).get
    assert(row.getAs[Long]("lo_ucents") == reps(1))
    assert(row.getAs[Long]("hi_ucents") ==
      reps(graft.ops.Profile.BootstrapB - 2))
  }
}
